package graft.sources

import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 synthetic-corpus source — the tier-(c) CUSTOM SOURCE
  * demonstration (the exec-operator counterpart is
  * [[graft.plans.GroupedTopKPlan]]): a deterministic document
  * generator exposed as a real Spark table with
  *
  *   - column pruning: `SupportsPushDownRequiredColumns` — an
  *     unprojected `text` column is never even GENERATED, the analogue
  *     of parquet ReadSchema pruning;
  *   - filter → PARTITION pushdown: `doc_id` range predicates shrink
  *     the id interval before `planInputPartitions`, so out-of-range
  *     splits are never created (the analogue of partition pruning —
  *     at 100 TB this is the difference between 8 tasks and 8000);
  *   - deterministic content from pure integer arithmetic on the row
  *     id, so a DuckDB `generate_series` mirror reproduces every cell
  *     bit-for-bit (`q_synthetic_source`).
  *
  * Usage: `spark.read.format("graft.sources.SyntheticDocs")
  * .option("rows", n).option("parts", p).load()`.
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticDocs.SynthTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("parts", "8").toInt)
}

object SyntheticDocs {

  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("source", StringType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  /** Cell generators — the single definition both the reader and the
    * oracle SQL derive from. Pure integer arithmetic on the row id.
    */
  def genSource(id: Long): String = "src" + (id % 20)
  def genNChars(id: Long): Long = 50 + (id * 7919) % 200
  def genText(id: Long): String =
    (0 until 30).map(j => "w" + ((id * 131 + j * 7) % 5000)).mkString(" ")

  /** DuckDB mirror of one row's cells, for oracle construction. */
  def oracleSelectList: String =
    """id AS doc_id, 'src' || (id % 20) AS source,
      |  50 + (id * 7919) % 200 AS n_chars,
      |  array_to_string(list_transform(generate_series(0, 29),
      |    j -> 'w' || ((id * 131 + j * 7) % 5000)), ' ') AS text""".stripMargin

  final class SynthTable(rows: Long, parts: Int)
      extends Table with SupportsRead {
    override def name(): String = s"graft_synthetic_docs($rows)"
    override def schema(): StructType = SyntheticDocs.schema
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap)
        : ScanBuilder = new SynthScanBuilder(rows, parts)
  }

  final class SynthScanBuilder(rows: Long, parts: Int)
      extends ScanBuilder
      with SupportsPushDownFilters with SupportsPushDownRequiredColumns
      with SupportsPushDownAggregates {
    private var lo: Long = 0L
    private var hi: Long = rows // exclusive
    private var pushed: Array[Filter] = Array.empty
    private var required: StructType = SyntheticDocs.schema
    private var pushedAggs: Seq[String] = Nil

    /** COUNT(*) / MIN(doc_id) / MAX(doc_id) with no grouping are
      * answered ARITHMETICALLY from the pruned range — zero rows
      * generated, zero read: the synthetic analogue of parquet
      * answering count/min/max from footer statistics (doc_id is the
      * monotone generator key, so min = lo and max = hi − 1 by
      * construction). COMPLETE pushdown (not partial): the returned
      * row IS the final answer. Any other aggregate, or any grouping,
      * declines the pushdown and Spark aggregates the generated rows.
      */
    override def supportCompletePushDown(aggregation: Aggregation): Boolean =
      aggregation.groupByExpressions.isEmpty &&
        aggregation.aggregateExpressions.nonEmpty &&
        aggregation.aggregateExpressions.forall {
          case _: CountStar => true
          case m: Min => isDocId(m.column)
          case m: Max => isDocId(m.column)
          case _ => false
        }
    private def isDocId(
        e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
      e match {
        case f: NamedReference =>
          f.fieldNames.toSeq == Seq("doc_id")
        case _ => false
      }
    override def pushAggregation(aggregation: Aggregation): Boolean = {
      if (!supportCompletePushDown(aggregation)) return false
      pushedAggs = aggregation.aggregateExpressions.toSeq.map {
        case _: CountStar => "count"
        case _: Min => "min"
        case _: Max => "max"
      }
      true
    }

    /** doc_id range predicates tighten [lo, hi); everything else stays
      * with Spark (returned as post-scan residuals).
      */
    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      val (accepted, residual) = filters.partition {
        case GreaterThanOrEqual("doc_id", v: Long) => lo = lo.max(v); true
        case GreaterThan("doc_id", v: Long) => lo = lo.max(v + 1); true
        case LessThan("doc_id", v: Long) => hi = hi.min(v); true
        case LessThanOrEqual("doc_id", v: Long) => hi = hi.min(v + 1); true
        case EqualTo("doc_id", v: Long) =>
          lo = lo.max(v); hi = hi.min(v + 1); true
        case _ => false
      }
      pushed = accepted
      residual
    }
    override def pushedFilters(): Array[Filter] = pushed

    override def pruneColumns(requiredSchema: StructType): Unit =
      required = requiredSchema

    override def build(): Scan =
      if (pushedAggs.nonEmpty)
        new MetaScan(math.max(lo, 0L), math.min(hi, rows), pushedAggs)
      else new SynthScan(rows, lo, hi, parts, required)
  }

  final case class SynthPartition(start: Long, end: Long)
      extends InputPartition

  /** Single-row, single-partition scan carrying the precomputed
    * aggregate answers for the pruned [lo, hi) range: count = hi − lo,
    * min = lo, max = hi − 1 (min/max null on an empty range — global
    * agg semantics).
    */
  final class MetaScan(lo: Long, hi: Long, aggs: Seq[String])
      extends Scan with Batch {
    private val count = math.max(0L, hi - lo)
    override def readSchema(): StructType =
      StructType(aggs.zipWithIndex.map {
        case ("count", i) => StructField(s"agg$i", LongType, nullable = false)
        case (_, i) => StructField(s"agg$i", LongType, nullable = true)
      })
    override def toBatch: Batch = this
    override def description(): String =
      s"GraftSyntheticDocs pushed-aggs=${aggs.mkString(",")} " +
        s"range=[$lo,$hi) count=$count"
    override def planInputPartitions(): Array[InputPartition] =
      Array(SynthPartition(0L, 1L))
    override def createReaderFactory(): PartitionReaderFactory = {
      val cells: Array[Any] = aggs.map {
        case "count" => count: Any
        case "min" => if (count > 0) (lo: Any) else null
        case "max" => if (count > 0) (hi - 1: Any) else null
      }.toArray
      new MetaReaderFactory(cells)
    }
  }

  /** Standalone (serializable) factory — an inner anonymous class
    * would capture the non-serializable Scan via `$outer`.
    */
  final class MetaReaderFactory(cells: Array[Any])
      extends PartitionReaderFactory {
    override def createReader(p: InputPartition)
        : PartitionReader[InternalRow] =
      new PartitionReader[InternalRow] {
        private var emitted = false
        override def next(): Boolean =
          if (emitted) false else { emitted = true; true }
        override def get(): InternalRow =
          new GenericInternalRow(cells)
        override def close(): Unit = ()
      }
  }

  final class SynthScan(rows: Long, lo: Long, hi: Long, parts: Int,
                        required: StructType) extends Scan with Batch {
    override def readSchema(): StructType = required
    override def toBatch: Batch = this
    override def description(): String =
      s"GraftSyntheticDocs range=[$lo,$hi) cols=${required.fieldNames.mkString(",")}"

    /** Splits cover ONLY the pushed range, at the FULL table's split
      * granularity (rows/parts) — so range pushdown reduces the split
      * COUNT, exactly like partition pruning drops directories: a 1%
      * range over `parts` splits plans ~1% of them, not `parts`
      * slivers.
      */
    override def planInputPartitions(): Array[InputPartition] = {
      if (hi <= lo) return Array.empty
      val per = math.max(1L, (rows + parts - 1) / parts)
      val out = ArrayBuffer.empty[InputPartition]
      var s = lo
      while (s < hi) {
        out += SynthPartition(s, math.min(s + per, hi))
        s += per
      }
      out.toArray
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new SynthReaderFactory(required)
  }

  final class SynthReaderFactory(required: StructType)
      extends PartitionReaderFactory {
    override def createReader(partition: InputPartition)
        : PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[SynthPartition]
      new SynthReader(p.start, p.end, required)
    }
  }

  final class SynthReader(start: Long, end: Long, required: StructType)
      extends PartitionReader[InternalRow] {
    // one generator per REQUIRED column: pruned columns cost nothing
    private val gens: Array[Long => Any] = required.fieldNames.map {
      case "doc_id" => (id: Long) => id
      case "source" => (id: Long) => UTF8String.fromString(genSource(id))
      case "n_chars" => (id: Long) => genNChars(id)
      case "text" => (id: Long) => UTF8String.fromString(genText(id))
      case other => throw new IllegalArgumentException(s"unknown column $other")
    }
    private var id = start - 1
    override def next(): Boolean = { id += 1; id < end }
    override def get(): InternalRow =
      new GenericInternalRow(gens.map(g => g(id)).asInstanceOf[Array[Any]])
    override def close(): Unit = ()
  }
}
