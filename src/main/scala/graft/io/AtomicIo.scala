package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

/** The commit-primitive seam under every table-maintenance protocol
  * ([[PartCommit]], [[StagedSwap]], [[Marks]]): what those protocols
  * actually need from the filesystem is narrower than "rename", and
  * which primitive is SAFE differs by backend.
  *
  *   - POSIX/HDFS-class filesystems give ATOMIC rename (file and
  *     directory), so "stage + rename into place" is a correct commit
  *     point, and small-file publication must go through tmp + rename
  *     (a plain create is visible while half-written).
  *   - Object stores (s3a/gs/abfs/oss) do NOT: a "rename" is a
  *     client-side copy + delete — per-object copies are atomic PUTs,
  *     but a multi-object (directory) rename has arbitrarily long
  *     partial states and no rollback. Conversely, a plain `create` IS
  *     all-or-nothing there (the object appears only when the PUT
  *     completes), so small-file publication needs no tmp dance.
  *
  * This object answers "which world am I in" per FileSystem (keyed by
  * URI scheme, overridable per scheme via the Hadoop conf key
  * `graft.fs.<scheme>.atomic-rename` — also how the test shim opts
  * out) and provides the two primitives the protocols build on:
  * all-or-nothing small-file publication and content copying (the
  * rename replacement for the non-atomic world — always copy, never
  * move, so a replay still finds its source intact).
  *
  * UNKNOWN schemes default to NON-atomic: the marker/copy protocols
  * are correct on both worlds (rename is just cheaper), so the safe
  * default costs IO, never correctness. Reference scope: the
  * reference's storage factory swaps a local backend for an S3 one
  * behind one interface (`utils/storage_factory.py:235-449`); this is
  * the Spark-side equivalent at the commit-protocol layer.
  */
object AtomicIo {

  /** Filesystems whose rename(src, dst) is atomic for files AND
    * directories. Everything else (s3a, s3, gs, abfs, wasb, oss,
    * cos, …) is treated as copy+delete.
    */
  private val AtomicSchemes =
    Set("file", "hdfs", "viewfs", "webhdfs", "swebhdfs", "local")

  def confKey(scheme: String): String = s"graft.fs.$scheme.atomic-rename"

  /** Does this filesystem's rename have all-or-nothing semantics?
    * Conf override first (`graft.fs.<scheme>.atomic-rename`), then the
    * known-atomic scheme set, then the safe default (false).
    */
  def renameIsAtomic(fs: FileSystem): Boolean = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    val explicit = Option(fs.getConf).flatMap(c => Option(c.get(confKey(scheme))))
    explicit match {
      case Some(v) => v.trim.equalsIgnoreCase("true")
      case None    => AtomicSchemes(scheme)
    }
  }

  /** Publish a SMALL file with all-or-nothing visibility: readers see
    * the complete new content or (for a fresh path) nothing — never a
    * half-written file. Atomic-rename world: tmp + rename (the Marks
    * discipline). Object-store world: a direct create — the object
    * appears atomically when the PUT completes, and an overwrite PUT
    * replaces the old object atomically.
    */
  def publishFile(fs: FileSystem, dst: Path, bytes: Array[Byte]): Unit =
    if (renameIsAtomic(fs)) {
      val tmp = new Path(dst.getParent, dst.getName + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      fs.delete(dst, false)
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(s"cannot publish $dst")
    } else {
      val out = fs.create(dst, true)
      try out.write(bytes) finally out.close()
    }

  /** [[publishFile]] for content too large to buffer as one array
    * (e.g. a bloom filter sized for 10⁸ ids): the caller streams into
    * the handed OutputStream and the complete result publishes
    * all-or-nothing. The tmp name is attempt-unique, so CONCURRENT
    * writers of the same dst (task retry racing a zombie attempt,
    * speculative execution) never interleave on one file — each
    * attempt renames its own complete tmp over dst (idempotent: every
    * attempt writes the same logical content), and an abandoned tmp
    * is swept by the next publish to the same dst. Object-store world:
    * a direct create, atomic at PUT completion, last-writer-wins.
    */
  def publishStream(fs: FileSystem, dst: Path)
                   (body: java.io.OutputStream => Unit): Unit =
    if (renameIsAtomic(fs)) {
      val glob = new Path(dst.getParent, dst.getName + ".tmp-*")
      Option(fs.globStatus(glob)).getOrElse(Array.empty)
        .foreach(st => fs.delete(st.getPath, false)) // abandoned attempts
      val tmp = new Path(dst.getParent,
        dst.getName + ".tmp-" + java.util.UUID.randomUUID().toString)
      val out = fs.create(tmp, true)
      try body(out) finally out.close()
      fs.delete(dst, false)
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(s"cannot publish $dst")
    } else {
      val out = fs.create(dst, true)
      try body(out) finally out.close()
    }

  /** Copy one file (overwriting any existing dst). Stream copy through
    * the client — a production object-store deployment would swap in
    * the FS's server-side copy; the protocol above only needs "dst is
    * complete afterwards, src untouched".
    */
  def copyFile(fs: FileSystem, src: Path, dst: Path): Unit = {
    val in = fs.open(src)
    try {
      val out = fs.create(dst, true)
      try {
        val buf = new Array[Byte](1 << 16)
        var n = in.read(buf)
        while (n >= 0) {
          if (n > 0) out.write(buf, 0, n)
          n = in.read(buf)
        }
      } finally out.close()
    } finally in.close()
  }

  /** Recursively copy the CONTENTS of `srcDir` into `dstDir`
    * (created if absent), overwriting name collisions, leaving the
    * source intact. Idempotent: a replay after a mid-copy crash
    * re-copies complete files over themselves and finishes the rest.
    */
  def copyDirContents(fs: FileSystem, srcDir: Path, dstDir: Path): Unit = {
    fs.mkdirs(dstDir)
    fs.listStatus(srcDir).foreach { st =>
      val dst = new Path(dstDir, st.getPath.getName)
      if (st.isDirectory) copyDirContents(fs, st.getPath, dst)
      else copyFile(fs, st.getPath, dst)
    }
  }
}
