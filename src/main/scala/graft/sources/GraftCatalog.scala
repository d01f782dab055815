package graft.sources

import java.util

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Column, Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 catalog plugin — the third Spark extension surface alongside
  * the repo's optimizer rules/strategy ([[graft.extensions
  * .GraftExtensions]]) and the [[SyntheticDocs]] TableProvider: tables
  * addressable from PURE SQL, no `read.format` plumbing:
  *
  *   spark.conf: spark.sql.catalog.graft = graft.sources.GraftCatalog
  *   SELECT count(*) FROM graft.synth.docs_500
  *
  * The `synth` namespace exposes `docs_<rows>` virtual tables backed
  * by [[SyntheticDocs.SynthTable]], so every pushdown the provider
  * implements (column pruning, range→partition pruning, COUNT(*)
  * from metadata) works identically through the catalog path. Being
  * generated, the namespace is infinite — `listTables` advertises a
  * few canonical sizes.
  *
  * The `data` namespace exposes the harness parquet tables
  * ([[graft.model.Tables.all]]) of the scale-factor directory named
  * by the catalog option `dir`:
  *
  *   spark.conf: spark.sql.catalog.graft.dir = /root/testdata/sf0.01
  *   SELECT l_returnflag, sum(l_quantity) FROM graft.data.lineitem …
  *
  * Each table is Spark's own DSv2 `ParquetTable`, so the full file-
  * source pushdown surface (filters, column pruning, partition
  * pruning, aggregate pushdown) applies identically to the SQL-text
  * path — SqlParitySpec pins ≥10 declared queries hash-equal between
  * their DataFrame form and pure `spark.sql` text through this
  * catalog.
  *
  * The `stored` namespace (catalog option `storedDir`) exposes the
  * engine's MAINTAINED artifacts — MinHash signature tables
  * ([[graft.operators.Dedup.writeSignatures]]) and vector/PQ indexes
  * ([[graft.operators.Similarity.writeVectorIndex]], addressed as
  * nested namespaces: `graft.stored.vidx.vectors`) — as plain parquet
  * DSv2 tables with directory-inferred partition columns, so a pure
  * SQL `WHERE sig_part IN (…)` or `WHERE cell = …` prunes at the
  * partition level exactly like the DataFrame point-read path
  * (SqlParitySpec pins band-join and point-read hash parity).
  *
  * The `versioned` namespace is the WRITABLE exception: tables are
  * [[graft.io.Versioned]] manifest logs under the catalog option
  * `versionedDir` — `CREATE TABLE` bootstraps an empty v0 commit,
  * `INSERT INTO`/`INSERT OVERWRITE`/`df.writeTo` commit through the
  * log (atomic manifest publish, snapshot isolation, time travel),
  * `DROP TABLE` deletes the log. See [[VersionedTable]].
  *
  * Everything else is read-only by design: create/alter/drop/rename
  * throw — the harness corpus is immutable input, the synthetic one
  * has no state at all.
  */
class GraftCatalog extends TableCatalog {
  private var catalogName: String = _
  private var dataDir: Option[String] = None
  private var versionedDir: Option[String] = None
  private var storedDir: Option[String] = None
  // ≤18 digits so `.toLong` can't overflow — a longer digit run is
  // "no such table", not a NumberFormatException out of loadTable
  private val DocsName = "docs_(\\d{1,18})".r

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    dataDir = Option(options.get("dir"))
    versionedDir = Option(options.get("versionedDir"))
    storedDir = Option(options.get("storedDir"))
  }

  private def spark = org.apache.spark.sql.SparkSession.active
  private def vPath(t: String) = s"${versionedDir.get}/$t"
  // A table exists only once a manifest is PUBLISHED: a torn state
  // where _manifests/ was created but the crash hit before the v0
  // rename must read as "no such table" (re-creatable), not a listed
  // table whose every access throws out of Versioned.snapshot.
  private def vExists(t: String): Boolean = versionedDir.isDefined &&
    graft.io.Versioned.versions(spark, vPath(t)).nonEmpty

  override def name(): String = catalogName

  override def listTables(namespace: Array[String]): Array[Identifier] =
    namespace match {
      case Array("synth") =>
        Array(1000L, 100000L, 10000000L).map(n =>
          Identifier.of(namespace, s"docs_$n"))
      case Array("data") if dataDir.isDefined =>
        graft.model.Tables.all.toArray.map(Identifier.of(namespace, _))
      case Array("versioned") if versionedDir.isDefined =>
        val root = new org.apache.hadoop.fs.Path(versionedDir.get)
        val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!f.exists(root)) Array.empty
        else f.listStatus(root).filter(_.isDirectory).map(_.getPath.getName)
          .filter(vExists).map(Identifier.of(namespace, _))
      case ns if ns.headOption.contains("stored") && storedDir.isDefined
          && ns.tail.forall(safeSegment) =>
        // list the directories one level below graft.stored[.sub…];
        // a directory is a table if parquet lives directly in it
        // (partitioned layouts like sig_part=N count), a sub-namespace
        // if its artifacts nest (a vector index's centroids/vectors)
        val root = new org.apache.hadoop.fs.Path(
          (storedDir.get +: ns.tail).mkString("/"))
        val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!f.exists(root)) Array.empty
        else f.listStatus(root).filter(_.isDirectory)
          .filter(d => !d.getPath.getName.startsWith("_"))
          .filter(d => isStoredTable(f, d.getPath))
          .map(d => Identifier.of(ns, d.getPath.getName))
      case _ => throw new NoSuchNamespaceException(namespace)
    }

  override def loadTable(ident: Identifier): Table =
    (ident.namespace(), ident.name()) match {
      case (Array("synth"), DocsName(n)) =>
        new SyntheticDocs.SynthTable(n.toLong, parts = 8)
      case (Array("versioned"), t) if vExists(t) =>
        new VersionedTable(vPath(t), s"$catalogName.versioned.$t")
      case (Array("data"), t)
          if dataDir.isDefined && graft.model.Tables.all.contains(t) =>
        org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
          s"$catalogName.data.$t",
          org.apache.spark.sql.SparkSession.active,
          CaseInsensitiveStringMap.empty(),
          Seq(s"${dataDir.get}/$t.parquet"),
          None,
          classOf[org.apache.spark.sql.execution.datasources
            .parquet.ParquetFileFormat])
      // maintained STORED artifacts — signature tables
      // (Dedup.writeSignatures: hash-partitioned on sig_part), vector/
      // PQ indexes (Similarity.writeVectorIndex: centroids + a
      // cell-partitioned vectors dir, addressed as nested namespaces,
      // e.g. graft.stored.vidx.vectors) — as plain parquet DSv2
      // tables: partition columns are directory-inferred, so pure-SQL
      // WHERE sig_part/cell filters prune at the partition level
      // exactly like the DataFrame point-read path (SqlParitySpec).
      case (ns, t) if ns.headOption.contains("stored") &&
          storedDir.isDefined && storedExists(ns.tail :+ t) =>
        org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable(
          (s"$catalogName" +: ns :+ t).mkString("."),
          org.apache.spark.sql.SparkSession.active,
          CaseInsensitiveStringMap.empty(),
          Seq((storedDir.get +: ns.tail :+ t).mkString("/")),
          None,
          classOf[org.apache.spark.sql.execution.datasources
            .parquet.ParquetFileFormat])
      case _ => throw new NoSuchTableException(ident)
    }

  // Identifier segments become PATH segments under storedDir, and SQL
  // backtick-quoting admits arbitrary characters — refuse separators
  // and dot-dot so `graft.stored.`..`.etc` can never resolve outside
  // the configured root (the RemoteJdbc lesson: validate at the
  // boundary, not in the happy path).
  private def safeSegment(s: String): Boolean =
    s.nonEmpty && s != ".." && s != "." &&
      !s.contains('/') && !s.contains('\\') && !s.contains('\u0000')

  /** A stored dir READS as a parquet table: parquet files directly
    * inside, or a partitioned layout (`k=v` subdirs). A
    * nested-artifact dir (a vector index's centroids/vectors) is a
    * sub-namespace, not a table — resolving it as one would only
    * schema-error later; listTables and loadTable apply the SAME
    * predicate so a loadable table is exactly a listed one.
    */
  private def isStoredTable(f: org.apache.hadoop.fs.FileSystem,
                            d: org.apache.hadoop.fs.Path): Boolean =
    f.listStatus(d).exists { c =>
      (c.isFile && c.getPath.getName.endsWith(".parquet")) ||
        (c.isDirectory && c.getPath.getName.contains("="))
    }

  private def storedExists(rel: Seq[String]): Boolean =
    rel.forall(safeSegment) && !rel.last.startsWith("_") && {
      val p = new org.apache.hadoop.fs.Path(
        (storedDir.get +: rel).mkString("/"))
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      f.exists(p) && f.getFileStatus(p).isDirectory && isStoredTable(f, p)
    }

  override def createTable(ident: Identifier, columns: Array[Column],
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    ident.namespace() match {
      case Array("versioned") if versionedDir.isDefined =>
        // Spark's standard DDL exceptions, not bare require: the
        // analyzer (and IF NOT EXISTS handling) matches on these
        if (partitions.nonEmpty)
          throw new UnsupportedOperationException(
            "versioned tables do not support partitioning transforms")
        if (vExists(ident.name()))
          throw new org.apache.spark.sql.catalyst.analysis
            .TableAlreadyExistsException(ident)
        // Versioned logs are parquet-backed manifest logs: a `USING
        // csv` or TBLPROPERTIES we cannot honor must REFUSE, not
        // appear to succeed. Spark itself injects bookkeeping keys
        // (owner, comment) on every CREATE — those are benign.
        properties.forEach { (k, v) =>
          val kl = k.toLowerCase(java.util.Locale.ROOT)
          val ok = kl == "owner" || kl == "comment" ||
            (kl == "provider" && v.equalsIgnoreCase("parquet"))
          if (!ok) throw new UnsupportedOperationException(
            s"versioned tables are parquet-backed manifest logs; " +
              s"unsupported table property: $k=$v")
        }
        val schema = org.apache.spark.sql.types.StructType(columns.map(c =>
          org.apache.spark.sql.types.StructField(
            c.name(), c.dataType(), c.nullable())))
        // bootstrap: an empty v0 overwrite pins the declared schema in
        // the manifest, so the first INSERT is an ordinary append
        val empty = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        graft.io.Versioned.commit(spark, vPath(ident.name()), empty,
          "overwrite")
        new VersionedTable(vPath(ident.name()),
          s"$catalogName.versioned.${ident.name()}")
      case _ =>
        throw new UnsupportedOperationException(
          "only the versioned namespace is writable")
    }

  override def alterTable(ident: Identifier,
                          changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")

  override def dropTable(ident: Identifier): Boolean =
    ident.namespace() match {
      case Array("versioned") if vExists(ident.name()) =>
        val p = new org.apache.hadoop.fs.Path(vPath(ident.name()))
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
      case _ => false
    }

  override def renameTable(oldIdent: Identifier,
                           newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")
}
