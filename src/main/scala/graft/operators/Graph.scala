package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain edge-list DataFrames — the
  * layer above [[Dedup.connectedComponents]]: once a near-dup pair
  * graph exists, centrality over it ranks cluster "canonical"
  * candidates (the doc most-connected inside a duplicate neighborhood
  * is usually the best representative to keep).
  *
  * No GraphX: an edge list + vertex frame keeps everything in
  * DataFrames (Catalyst-optimized joins/aggs, AQE skew handling) and
  * every iteration shuffles on the vertex id only — the same
  * partitioning each round, so at scale the shuffle is co-partitioned
  * after the first materialization.
  */
object Graph {

  /** Deterministic PageRank in integer MICRO-units (per-node mass
    * 1,000,000; damping 0.85):
    *
    *   rank'(v) = 150000 + (850000 · Σ_{(u,v)∈E} (rank(u) div deg(u)))
    *              div 1000000
    *
    * Every operation is 64-bit integer arithmetic with truncating
    * division — bit-identical on ANY engine, unlike float PageRank
    * whose cross-partition addition order leaks into the result. The
    * price is ≤1 ppm truncation loss per hop, irrelevant for ranking.
    *
    * Overflow: a node's in-sum is bounded by total graph mass
    * ≈ |V|·10⁶ (a hub can absorb all of it), so the naive
    * `(850000·sum) div 10⁶` would wrap a signed 64-bit long at only
    * ~10⁷ vertices. The implementation instead splits the product —
    * `850000·(sum div 10⁶) + (850000·(sum mod 10⁶)) div 10⁶` — which
    * is value-identical for the non-negative sums here (850000·10⁶ is
    * an exact multiple of the divisor) but keeps every intermediate
    * ≤ 850000·|V| + 8.5·10¹¹, safe past ~9·10¹² vertices — beyond any
    * practical corpus.
    *
    * Fixed `iters` rather than convergence-tolerance keeps work
    * identical across runs (and lets an unrolled-CTE oracle mirror it
    * exactly). Per round: one join + one groupBy, both keyed on vertex
    * id; the tiny rank frame is localCheckpoint-bounded like
    * [[Dedup.connectedComponents]]'s loop state.
    *
    * `edges` is DIRECTED (src → dst); pass both directions for an
    * undirected graph. Nodes with no out-edges simply contribute
    * nothing (their mass evaporates — the classic dangling-node
    * simplification); isolated nodes settle at 150000.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, idCol: String,
               srcCol: String, dstCol: String, iters: Int = 3): DataFrame = {
    val deg = edges.groupBy(col(srcCol)).agg(count(lit(1)).as("__deg"))
    // (src, dst, deg) is consumed every round — materialize once
    val ed = edges.select(col(srcCol), col(dstCol)).join(deg, srcCol)
      .transform(graft.Checkpoints.stabilize)
    val verts = nodes.select(col(idCol).as("__v")).transform(graft.Checkpoints.stabilize)
    var ranks = verts.withColumn("rank_ppm", lit(1000000L))
    for (_ <- 0 until iters) {
      val contrib = ed
        .join(ranks, col(srcCol) === col("__v"))
        .select(col(dstCol).as("__dst"),
          expr("rank_ppm div __deg").as("__c"))
        .groupBy("__dst").agg(sum("__c").as("__in"))
      ranks = verts
        .join(contrib, col("__v") === col("__dst"), "left")
        .select(col("__v"),
          // split product: identical value, hub-proof (see scaladoc)
          (lit(150000L) +
            expr("850000 * (coalesce(__in, 0L) div 1000000)") +
            expr("(850000 * (coalesce(__in, 0L) % 1000000)) div 1000000"))
            .as("rank_ppm"))
        .transform(graft.Checkpoints.stabilize)
    }
    ranks.select(col("__v").as(idCol), col("rank_ppm"))
  }

  /** Per-vertex triangle counts over an UNDIRECTED graph given as
    * canonical pairs (`aCol < bCol`, one row per edge) — the
    * cluster-density diagnostic next to connected components: a
    * triangle-dense near-dup component is a genuine duplicate cluster,
    * a triangle-free chain is usually transitive noise worth
    * re-verifying. Output: (vertex, degree, n_triangles).
    *
    * Classic two-path + closure join, entirely on the canonical
    * orientation: wedges (a<b<c) come from joining edges on the middle
    * vertex, the closing edge (a,c) is a second equi-join, so each
    * triangle is found exactly once — no ×6 overcount, no post-dedup.
    * All joins are vertex-keyed shuffles; the edge frame is reused
    * three times so it is checkpoint-stabilized once. At 100 TB the
    * candidate-pair graphs this runs over are LSH-band-bounded, and
    * the canonical orientation caps each join's fan-out by the
    * max FORWARD degree (the classic mitigation for hub vertices).
    */
  def triangleCounts(pairs: DataFrame, aCol: String, bCol: String): DataFrame = {
    val e = pairs.select(col(aCol).as("a"), col(bCol).as("b")).distinct()
      .transform(graft.Checkpoints.stabilize)
    val deg = e.select(col("a").as("v"))
      .unionAll(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("degree"))
    val wedges = e.join(e.select(col("a").as("b"), col("b").as("c")), "b")
    val tri = wedges.join(e.select(col("a"), col("b").as("c")), Seq("a", "c"))
      .select("a", "b", "c")
    val tv = tri.select(col("a").as("v"))
      .unionAll(tri.select(col("b").as("v")))
      .unionAll(tri.select(col("c").as("v")))
      .groupBy("v").agg(count(lit(1)).as("n_triangles"))
    deg.join(tv, Seq("v"), "left")
      .select(col("v").as("vertex"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
