package graft.io

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** Test-only filesystem with OBJECT-STORE semantics over local disk
  * (scheme `simfs` — registered via `fs.simfs.impl`), for proving the
  * [[PartCommit]]/[[StagedSwap]] copy-mode protocols under the
  * semantics s3a/gs actually provide:
  *
  *   - `simfs` is NOT in [[AtomicIo]]'s atomic-rename scheme set, so
  *     every protocol automatically takes its marker/copy path;
  *   - rename of an IN-SCOPE path is executed as per-file copy +
  *     delete (the object-store client behavior) and RECORDED —
  *     the copy-mode protocols must never rename in scope, and the
  *     spec asserts the counter stays zero; out-of-scope renames
  *     (Spark's own `_temporary` task-commit machinery) delegate to
  *     the real local rename so the write path stays stock;
  *   - CRASH INJECTION: every mutation (create/delete/rename) under
  *     the armed scope prefix ticks a global counter; from the armed
  *     op number onward, every mutation throws [[SimFs.SimCrash]] —
  *     modeling process death, not a single transient error (a dead
  *     process performs no further IO). `_temporary` paths are out of
  *     scope so the matrix enumerates PROTOCOL windows, not Spark
  *     task-commit internals (a crash inside the stage write is
  *     covered by the window at the first post-write protocol op,
  *     plus a dedicated partial-stage test).
  *
  * Single-JVM statics: under `local[*]` driver and executors share
  * the JVM, so injection reaches task-side IO too; under
  * `local-cluster` masters only driver-side protocol ops can crash
  * (executor JVMs have their own disarmed statics), which still
  * covers every protocol window — the windows are all driver-side.
  */
class SimFs extends RawLocalFileSystem {
  override def getScheme: String = "simfs"
  override def getUri: URI = URI.create("simfs:///")

  private def inScope(p: Path): Boolean = {
    val s = p.toUri.getPath
    val sc = SimFs.scopePrefix
    sc != null && s.startsWith(sc) && !s.contains("_temporary") &&
      !s.contains(".spark-staging")
  }

  private def tick(op: String, p: Path): Unit =
    if (inScope(p)) SimFs.tick(op, p.toString)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    tick("create", f)
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  // RawLocalFileSystem's permissionless create variant does NOT route
  // through the permission one (both call a private helper), and
  // FileSystem.create(Path, boolean) — the AtomicIo/Marks/SchemaFile
  // path — dispatches HERE; without this override every protocol
  // create was invisible to the crash matrices (found by the r15
  // gen-matrix op journal)
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    tick("create", f)
    super.create(f, overwrite, bufferSize, replication, blockSize,
      progress)
  }

  override def createNonRecursive(f: Path, permission: FsPermission,
                                  flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag],
                                  bufferSize: Int, replication: Short,
                                  blockSize: Long,
                                  progress: Progressable): FSDataOutputStream = {
    tick("create", f)
    super.createNonRecursive(f, permission, flags, bufferSize,
      replication, blockSize, progress)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    tick("delete", p)
    super.delete(p, recursive)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    if (!inScope(src)) return super.rename(src, dst)
    // object-store rename: per-object copy (each an atomic PUT, here a
    // counted create) then source delete — arbitrarily long partial
    // states under crash, exactly what the copy-mode protocols must
    // never depend on
    SimFs.renamesInScope.incrementAndGet()
    SimFs.tick("rename", s"$src -> $dst")
    val st = try getFileStatus(src) catch {
      case _: java.io.FileNotFoundException => return false
    }
    if (st.isFile) AtomicIo.copyFile(this, src, dst)
    else AtomicIo.copyDirContents(this, src, dst)
    delete(src, true)
    true
  }
}

object SimFs {
  final class SimCrash(msg: String) extends java.io.IOException(msg)

  @volatile private[io] var scopePrefix: String = _
  @volatile private var failFrom: Long = Long.MaxValue
  private val ops = new AtomicLong(0)
  val renamesInScope = new AtomicLong(0)

  /** Count in-scope mutations from zero; the `failFrom`-th and every
    * later one throws (process-death model). `Long.MaxValue` = armed
    * scope, no crash.
    */
  /** In-scope mutation journal since the last [[arm]] — lets a matrix
    * spec see WHICH ops its windows cover (debugging aid; bounded by
    * the protocols' own op counts).
    */
  val opLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  def arm(prefix: String, failFrom: Long = Long.MaxValue): Unit = {
    scopePrefix = prefix
    ops.set(0)
    opLog.clear()
    this.failFrom = failFrom
  }

  def disarm(): Unit = failFrom = Long.MaxValue

  def opCount: Long = ops.get()

  private[io] def tick(op: String, p: String): Unit = {
    val n = ops.incrementAndGet()
    opLog.add(s"#$n $op $p")
    if (n >= failFrom)
      throw new SimCrash(s"simulated crash at mutation #$n: $op $p")
  }
}
