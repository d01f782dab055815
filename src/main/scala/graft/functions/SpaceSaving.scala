package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Space-Saving heavy hitters as a typed [[Aggregator]] — the
  * tier-(b) extension form (typed TypedColumn/Aggregator) alongside
  * the repo's tier-(b) native Expressions and tier-(c) GroupedTopK
  * plan. Metwally et al.'s algorithm (ICDT 2005, public): keep at most
  * `capacity` counters; an unseen item evicts the minimum counter and
  * inherits its count (as overestimation error).
  *
  * Why at scale: exact token frequency is a full groupBy over the
  * corpus vocabulary (billions of keys at 100 TB); this aggregates in
  * O(capacity) memory per partition and MERGES (sum matching counters,
  * re-truncate), so it runs as one partial-agg pass, no key shuffle —
  * the frequency sketch a curation pipeline uses to find stopwords /
  * boilerplate candidates cheaply.
  *
  * Guarantees — SINGLE-SKETCH (one partition's stream):
  *   - if distinct items ≤ capacity, counts are EXACT;
  *   - any item with true count > N/capacity is guaranteed present;
  *   - reported count ≥ true count (overestimates by ≤ min-counter).
  * The distributed MERGE path (sum matching counters, re-truncate) is
  * strictly weaker: an item evicted in one partition's sketch but kept
  * in another's surfaces with only its partial count — so merged
  * reported counts can UNDER-estimate, and an over-threshold item can
  * in principle be truncated away if its mass was scattered as
  * eviction error across partitions (the standard caveat for merged
  * Space-Saving without per-counter error bounds, cf. Agarwal et al.,
  * "Mergeable Summaries"). Merged output is also NOT deterministic
  * across partitionings (truncation depends on partial order). An
  * approximation contract, spec-verified rather than oracle-hashed;
  * pair with the exact [[graft.operators.TextOps.topTerms]] when
  * bit-stable or guaranteed output is required.
  */
object SpaceSaving {

  /** (item → (count, error)); error is the inherited overestimate. */
  type Sketch = Map[String, (Long, Long)]

  def add(sketch: Sketch, item: String, by: Long, capacity: Int): Sketch =
    sketch.get(item) match {
      case Some((c, e)) => sketch.updated(item, (c + by, e))
      case None if sketch.size < capacity =>
        sketch.updated(item, (by, 0L))
      case None =>
        val (minItem, (minC, _)) = sketch.minBy { case (k, (c, _)) => (c, k) }
        (sketch - minItem).updated(item, (minC + by, minC))
    }

  def merge(a: Sketch, b: Sketch, capacity: Int): Sketch = {
    val m = mutable.Map.from(a)
    b.foreach { case (k, (c, e)) =>
      val (c0, e0) = m.getOrElse(k, (0L, 0L))
      m.update(k, (c0 + c, e0 + e))
    }
    // re-truncate: keep the `capacity` largest (deterministic
    // tie-break on the item so merges of equal sketches are stable)
    m.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(capacity).toMap
  }

  final class TopItems(capacity: Int)
      extends Aggregator[String, Sketch, Seq[(String, Long)]] {
    override def zero: Sketch = Map.empty
    override def reduce(s: Sketch, item: String): Sketch =
      add(s, item, 1L, capacity)
    override def merge(a: Sketch, b: Sketch): Sketch =
      SpaceSaving.merge(a, b, capacity)
    override def finish(s: Sketch): Seq[(String, Long)] =
      s.toSeq.map { case (k, (c, _)) => (k, c) }
        .sortBy { case (k, c) => (-c, k) }
    override def bufferEncoder: Encoder[Sketch] =
      Encoders.kryo[Sketch]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
  }

  def topItems(capacity: Int): TopItems = new TopItems(capacity)
}
