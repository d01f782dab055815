package graft.sources

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.Versioned

/** The [[graft.io.Versioned]] table log as a DSv2 TABLE — the WRITE
  * half of the catalog surface (everything else in the catalog is
  * read-only by design): pure-SQL `INSERT INTO` / `INSERT OVERWRITE`
  * and `df.writeTo(...)` commit through the manifest log, so every
  * SQL write gets the log's transactional contract for free —
  * atomic publish (readers see the previous manifest or the new one,
  * never a torn table), snapshot isolation, time travel, vacuum.
  *
  * Write protocol: the V1 fallback (`V1Write` → `InsertableRelation`,
  * the supported DSv2 bridge JDBC uses). The task-level commit
  * protocol is DELEGATED to [[Versioned.commit]]: executors write
  * parquet into the commit's private temp dir through Spark's own
  * committer, and the transaction point is the single atomic manifest
  * rename — a failed job leaves only an unpublished temp/orphan dir
  * that the next commit or vacuum clears. Append vs truncate maps to
  * the log's `append`/`overwrite` modes; schema-evolution union and
  * type-conflict refusal come with it.
  *
  * Reads delegate to Spark's own parquet DSv2 table over the
  * manifest's FILE LIST under the COMMIT-TIME schema — the full
  * file-source pushdown surface (filters, pruning, aggregates)
  * applies to the snapshot scan unchanged.
  */
final class VersionedTable(path: String, tableName: String)
    extends Table with SupportsRead with SupportsWrite {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = tableName

  override def schema(): StructType =
    Versioned.snapshot(spark, path)._2.getOrElse(new StructType())

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = {
    val (files, schema) = Versioned.snapshot(spark, path)
    val pq = org.apache.spark.sql.execution.datasources.v2.parquet
      .ParquetTable(tableName, spark, CaseInsensitiveStringMap.empty(),
        files, schema,
        classOf[org.apache.spark.sql.execution.datasources.parquet
          .ParquetFileFormat])
    pq.newScanBuilder(options)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      private var mode = "append"
      override def truncate(): WriteBuilder = { mode = "overwrite"; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame,
                                overwrite: Boolean): Unit = {
              val m = if (overwrite) "overwrite" else mode
              Versioned.commit(data.sparkSession, path, data, m)
              ()
            }
          }
      }
    }
}
