package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.Similarity

/** Similarity-search queries over `embeddings` (64-dim float vectors):
  * brute-force cosine top-k (the correctness baseline), IVF-probed
  * top-k (cell = the table's cluster label), and random-hyperplane
  * LSH top-k. DuckDB oracles mirror Spark's sequential-fold dot
  * product as an explicit left-associated addition chain, so the
  * doubles are bit-identical before rounding.
  */
object SimilarityQueries {
  type Q = (SparkSession, String) => DataFrame

  /** queries = every 50th vector: small, broadcastable query set. */
  private val QueryFilter = "vec_id % 50 = 0"
  private[queries] val Dim = 64
  private val ProjDim = 16
  private val K = 3
  private val NumPlanes = 8
  private val NumSeeds = 10
  private val SemThreshold = 0.35
  private val PqSub = 8      // PQ subspaces
  private val PqSubDim = 8   // dims per subspace (8×8 = Dim)
  private val PqCodes = 16   // codewords per subspace

  private def queriesDf(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(expr(QueryFilter))

  val queries: Map[String, Q] = Map(
    "q_cosine_topk" -> ((s, d) =>
      Similarity.bruteForceTopK(queriesDf(s, d), Tables.embeddings(s, d),
        "vec_id", "embedding", K)
        .orderBy("query_id", "rank")),

    "q_ann_ivf" -> ((s, d) =>
      Similarity.ivfTopK(queriesDf(s, d), Tables.embeddings(s, d),
        "vec_id", "embedding", "label", K)
        .orderBy("query_id", "rank")),

    "q_ann_lsh" -> ((s, d) =>
      Similarity.lshTopK(queriesDf(s, d), Tables.embeddings(s, d),
        "vec_id", "embedding", Dim, NumPlanes, K)
        .orderBy("query_id", "rank")),

    // product-quantization ADC top-k with the deterministic seed
    // codebook (codeword c of subspace m = subvector of vec_id c) —
    // the oracle-checkable PQ path; Lloyd-refined codebooks and their
    // recall are spec territory, like the kmeans loop
    "q_ann_pq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cb = Similarity.pqSeedCodebook(e, "vec_id", "embedding",
        PqSub, PqSubDim, PqCodes)
      val codes = Similarity.pqEncode(e, "vec_id", "embedding", cb,
        PqSub, PqSubDim)
      Similarity.pqTopK(queriesDf(s, d), codes, "vec_id", "embedding",
          cb, PqSub, PqSubDim, K)
        .orderBy("query_id", "rank")
    }),

    // IVFADC: coarse cell (the table's label column, as q_ann_ivf)
    // prunes candidates via an equi-join, PQ codes score the survivors
    // — the composition that keeps ADC off the full corpus at scale
    "q_ann_ivfpq" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cb = Similarity.pqSeedCodebook(e, "vec_id", "embedding",
        PqSub, PqSubDim, PqCodes)
      val codes = Similarity.pqEncode(e, "vec_id", "embedding", cb,
          PqSub, PqSubDim)
        .join(e.select("vec_id", "label"), "vec_id")
      Similarity.ivfPqTopK(queriesDf(s, d), codes, "vec_id", "embedding",
          "label", cb, PqSub, PqSubDim, K)
        .orderBy("query_id", "rank")
    }),

    // k-means assignment step against deterministic seed centroids
    // (the k smallest vec_ids) — the exact, oracle-checkable half of
    // Similarity.kmeans; the iterative loop is spec-verified
    "q_kmeans_assign" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cent = e.filter(col("vec_id") < NumSeeds)
        .select(col("vec_id").as("cluster"),
          col("embedding").cast("array<double>").as("cv"))
      Similarity.assignToCentroids(e, "vec_id", "embedding", cent)
        .orderBy("vec_id")
    }),

    // contrastive hard negatives: top-k most-similar WRONG-label
    // vectors per query (the negatives that carry gradient signal)
    "q_hard_negatives" -> ((s, d) =>
      Similarity.hardNegatives(queriesDf(s, d), Tables.embeddings(s, d),
        "vec_id", "embedding", "label", K)
        .orderBy("query_id", "rank")),

    // per-cluster top-3 characteristic terms: k-means assignment over
    // embeddings joined to the aligned documents, labeled by tf-idf
    "q_cluster_labels" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cent = e.filter(col("vec_id") < NumSeeds)
        .select(col("vec_id").as("cluster"),
          col("embedding").cast("array<double>").as("cv"))
      val assigned = Similarity.assignToCentroids(e, "vec_id", "embedding",
        cent)
        .select(col("vec_id").as("doc_id"), col("cluster"))
      val labeled = Tables.documents(s, d).join(assigned, "doc_id")
      graft.operators.TextOps.topTerms(labeled, "doc_id", "text",
        "cluster", k = 3)
        .orderBy("cluster", "rk")
    }),

    // centroid-distance outliers: vectors beyond their cluster's p90
    "q_embed_outliers" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cent = e.filter(col("vec_id") < NumSeeds)
        .select(col("vec_id").as("cluster"),
          col("embedding").cast("array<double>").as("cv"))
      Similarity.centroidOutliers(e, "vec_id", "embedding", cent, q = 0.9)
        .orderBy("vec_id")
    }),

    // maintained IVF index lifecycle: write even vectors under frozen
    // centroids, append the odd batch, query the STORED index — the
    // vector sibling of q_sig_lifecycle (probe-cell partition pruning
    // is plan-asserted in SimilaritySpec)
    "q_ann_lifecycle" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cent = e.filter(col("vec_id") < NumSeeds)
        .select(col("vec_id").as("cluster"),
          col("embedding").cast("array<double>").as("cv"))
      val path = Scratch.fresh(s"vecindex_${Scratch.tag(d)}/idx")
      Similarity.writeVectorIndex(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", cent, path)
      Similarity.appendVectorIndex(e.filter(col("vec_id") % 2 =!= 0),
        "vec_id", "embedding", path)
      Similarity.queryVectorIndex(s, path, queriesDf(s, d),
        "vec_id", "embedding", K)
        .orderBy("query_id", "rank")
    }),

    // re-index under cell drift: the even half is indexed under the
    // frozen seed centroids, then a DRIFTED batch (the odd vectors
    // reversed — same norms, decorrelated directions) is appended and
    // piles into whatever cells happen to be nearest; the rebuild
    // re-seeds from the CURRENT corpus (hash-uniform arg-min sample —
    // deterministic, drift-responsive) and atomically swaps the whole
    // index. Output = every vector's cell before and after; the oracle
    // replays both assignments from scratch
    "q_ann_reindex" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cent = e.filter(col("vec_id") < NumSeeds)
        .select(col("vec_id").as("cluster"),
          col("embedding").cast("array<double>").as("cv"))
      val path = Scratch.fresh(s"reidx_${Scratch.tag(d)}/idx")
      Similarity.writeVectorIndex(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", cent, path)
      Similarity.appendVectorIndex(
        e.filter(col("vec_id") % 2 =!= 0)
          .select(col("vec_id"), reverse(col("embedding")).as("embedding")),
        "vec_id", "embedding", path)
      // snapshot the pre-rebuild layout: the frame is lazy and the
      // swap replaces the files it would read
      val before = Similarity.readVectorIndex(s, path)
        .select(col("vec_id"), col("cell").as("cell_old"))
        .localCheckpoint()
      Similarity.reindexVectorIndex(s, path, "vec_id", "embedding",
        Similarity.hashSeeds(Similarity.readVectorIndex(s, path),
          "vec_id", "embedding", NumSeeds))
      val after = Similarity.readVectorIndex(s, path)
        .select(col("vec_id"), col("cell").as("cell_new"))
      before.join(after, "vec_id")
        .select("vec_id", "cell_old", "cell_new")
        .orderBy("vec_id")
    }),

    // multi-probe IVF: queries probe their 2 nearest k-means cells
    // (the recall knob — boundary queries recover neighbors filed
    // just across the cell line for 2× scan cost, never a full scan);
    // corpus stays single-cell, ivfTopK merges candidates per query
    "q_ann_multiprobe" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cent = e.filter(col("vec_id") < NumSeeds)
        .select(col("vec_id").as("cluster"),
          col("embedding").cast("array<double>").as("cv"))
      val corpus = Similarity.assignToCentroids(e, "vec_id", "embedding",
          cent)
        .select(col("vec_id"), col("cluster").as("cell"))
        .join(e.select("vec_id", "embedding"), "vec_id")
      val probes = Similarity.assignProbeCells(queriesDf(s, d), "vec_id",
          "embedding", cent, nprobe = 2)
        .select(col("vec_id"), col("cell"))
        .join(e.select("vec_id", "embedding"), "vec_id")
      Similarity.ivfTopK(probes, corpus, "vec_id", "embedding", "cell", K)
        .orderBy("query_id", "rank")
    }),

    // residual IVFADC: PQ over v − centroid(cell) — within a probed
    // cell the residual L2 IS the original L2 (shared centroid
    // cancels), but residuals have smaller spread, so the same
    // codebook budget quantizes with less error (spec-measured)
    "q_ann_ivfpq_res" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cent = e.filter(col("vec_id") < NumSeeds)
        .select(col("vec_id").as("cluster"),
          col("embedding").cast("array<double>").as("cv"))
      // residual frame feeds codebook, codes, and queries
      val res = Similarity.residuals(e, "vec_id", "embedding", cent)
        .localCheckpoint()
      val cb = Similarity.pqSeedCodebook(res, "vec_id", "rv",
        PqSub, PqSubDim, PqCodes)
      val codes = Similarity.pqEncode(res, "vec_id", "rv", cb,
          PqSub, PqSubDim)
        .join(res.select("vec_id", "cell"), "vec_id")
      Similarity.ivfPqTopK(res.filter(expr(QueryFilter)), codes,
          "vec_id", "rv", "cell", cb, PqSub, PqSubDim, K)
        .orderBy("query_id", "rank")
    }),

    // stored IVFADC (PQ) index lifecycle: create from half the corpus
    // under frozen seed centroids + seed codebook, append the other
    // half, query the STORE — probe cells' code files only, no corpus
    // float vector ever read at query time
    "q_pq_lifecycle" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cent = e.filter(col("vec_id") < NumSeeds)
        .select(col("vec_id").as("cluster"),
          col("embedding").cast("array<double>").as("cv"))
      val cb = Similarity.pqSeedCodebook(e, "vec_id", "embedding",
        PqSub, PqSubDim, PqCodes)
      val path = Scratch.fresh(s"pqindex_${Scratch.tag(d)}/idx")
      Similarity.writePqIndex(e.filter(col("vec_id") % 2 === 0),
        "vec_id", "embedding", cent, cb, PqSub, PqSubDim, path)
      Similarity.appendPqIndex(e.filter(col("vec_id") % 2 =!= 0),
        "vec_id", "embedding", path)
      Similarity.queryPqIndex(s, path, queriesDf(s, d),
        "vec_id", "embedding", K)
        .orderBy("query_id", "rank")
    }),

    // cluster-balanced diversity sample: sqrt-budget most-central
    // members per k-means cell — flattens dominant topics, keeps rare
    // ones represented (deterministic seed centroids as above)
    "q_diversity_sample" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cent = e.filter(col("vec_id") < NumSeeds)
        .select(col("vec_id").as("cluster"),
          col("embedding").cast("array<double>").as("cv"))
      Similarity.diversitySample(e, "vec_id", "embedding", cent,
        maxPerCluster = 64)
        .orderBy("vec_id")
    }),

    // semantic dedup: within a k-means cell, drop any vector with a
    // smaller-id neighbor at cosine >= threshold (greedy min-id
    // survivor, same policy as q_dedup_corpus). The cell is the block
    // key — pairs are cell-local, never corpus × corpus.
    "q_semantic_dedup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val cent = e.filter(col("vec_id") < NumSeeds)
        .select(col("vec_id").as("cluster"),
          col("embedding").cast("array<double>").as("cv"))
      // embeddings stay float through the id-join and the cell-blocked
      // self-join (half the shuffle bytes); the pairwise cosine below
      // is rewritten to the double-widening native expression
      val assigned = Similarity.assignToCentroids(e, "vec_id", "embedding", cent)
        .select(col("vec_id"), col("cluster"))
        .join(e.select(col("vec_id"), col("embedding").as("v")), "vec_id")
        .localCheckpoint() // feeds both pair sides + the survivor anti-join
      val a = assigned.select(col("vec_id").as("id_a"), col("cluster"),
        col("v").as("va"))
      val b = assigned.select(col("vec_id").as("id_b"), col("cluster"),
        col("v").as("vb"))
      val losers = a.join(b, Seq("cluster"))
        .filter(col("id_a") < col("id_b"))
        .filter(round(Similarity.cosine(col("va"), col("vb")), 6) >= SemThreshold)
        .select(col("id_b").as("vec_id")).distinct()
      assigned.join(losers, Seq("vec_id"), "left_anti")
        .select(col("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),

    // embedding-cosine near-dup pairs, blocked by the cluster label
    // int8 quantization of the whole embedding table; vector rendered
    // csv so the compare is on exact integers (plus the double scale,
    // rounded like every float column in this module)
    "q_embed_quantize" -> ((s, d) =>
      Similarity.quantizeInt8(Tables.embeddings(s, d), "embedding")
        .select(col("vec_id"), round(col("q_scale"), 9).as("q_scale"),
          concat_ws(",", transform(col("q_vec"), _.cast("string")))
            .as("q_vec_csv"))
        .orderBy("vec_id")),

    "q_embed_neardup" -> ((s, d) => {
      val e = Tables.embeddings(s, d).select(col("vec_id"), col("label"),
        col("embedding").as("v"))
      val a = e.select(col("vec_id").as("id_a"), col("label"), col("v").as("va"))
      val b = e.select(col("vec_id").as("id_b"), col("label"), col("v").as("vb"))
      a.join(b, "label").filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(Similarity.cosine(col("va"), col("vb")), 6).as("cos_sim"))
        .filter(col("cos_sim") >= 0.35)
        .orderBy("id_a", "id_b")
    }),

    // int8 coarse search (integer dot on quantized vectors) + exact
    // float rescore of the top-10 candidates
    "q_ann_int8" -> ((s, d) =>
      Similarity.int8RescoreTopK(queriesDf(s, d), Tables.embeddings(s, d),
        "vec_id", "embedding", K, candidates = 10)
        .orderBy("query_id", "rank")),

    // matryoshka search: coarse rank by the FIRST 16 of 64 dims
    // (MRL-style prefix), exact full-dim rescore of the top-10
    "q_ann_matryoshka" -> ((s, d) =>
      Similarity.matryoshkaTopK(queriesDf(s, d), Tables.embeddings(s, d),
        "vec_id", "embedding", prefixDim = 16, K, candidates = 10)
        .orderBy("query_id", "rank")),

    // MMR diverse top-5: greedy rel − λ·max-sim-to-selected over the
    // top-20 relevance candidates, query = vec 0
    "q_mmr_select" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val qv = e.filter(col("vec_id") === 0L)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0)
      Similarity.mmrTopK(e.filter(col("vec_id") =!= 0L), "vec_id",
        "embedding", qv, k = 5, lambda = 0.5, candidates = 20)
        .orderBy("rank")
    }),

    // sparse all-pairs cosine over shared TOKENS (documents table, no
    // embeddings): inverted-index join, df-capped, integer-thresholded
    "q_sparse_simjoin" -> ((s, d) =>
      Similarity.sparseCosinePairs(Tables.documents(s, d), "doc_id",
        "text", dfCap = 50, tNum = 1, tDen = 2)
        .orderBy("id_a", "id_b")),

    // Johnson–Lindenstrauss 64→16 random projection: every projected
    // coordinate hash-checked against the oracle's literal sign matrix
    "q_random_proj" -> ((s, d) =>
      Similarity.randomProject(Tables.embeddings(s, d), "embedding",
          Dim, ProjDim)
        .select(col("vec_id") +: (0 until ProjDim).map(j =>
          round(element_at(col("proj"), j + 1), 6).as(f"p$j%02d")): _*)
        .orderBy("vec_id")),

    // brute-force ANN in the PROJECTED space — the 4×-cheaper
    // candidate-generation tier (rerank against full vectors happens
    // exactly as in q_ann_int8's rescore stage)
    "q_ann_proj" -> ((s, d) => {
      val proj = Similarity.randomProject(Tables.embeddings(s, d),
        "embedding", Dim, ProjDim).select(col("vec_id"), col("proj"))
      Similarity.bruteForceTopK(proj.filter(expr(QueryFilter)), proj,
          "vec_id", "proj", K)
        .orderBy("query_id", "rank")
    }),
  )

  // ---- oracle SQL ----

  /** Left-associated dot-product chain: a[1]*b[1] + a[2]*b[2] + …
    * == Spark's aggregate(zip_with(a,b,*), 0.0, +) fold order
    * (0.0 + x == x exactly for finite x).
    */
  private def dotSqlN(a: String, b: String, n: Int): String =
    (1 to n).map(i => s"$a[$i]*$b[$i]").mkString(" + ")

  private def dotSql(a: String, b: String): String = dotSqlN(a, b, Dim)

  private[queries] def cosSqlN(a: String, b: String, n: Int): String =
    s"(${dotSqlN(a, b, n)}) / (sqrt(${dotSqlN(a, a, n)}) * sqrt(${dotSqlN(b, b, n)}))"

  private def cosSql(a: String, b: String): String = cosSqlN(a, b, Dim)

  /** Left-associated JL projection chain: v[1]·s(j,0) + v[2]·s(j,1) +
    * … — mirrors Similarity.randomProject's native dot against the
    * SAME projComponent sign constants.
    */
  private def projChainSql(j: Int, v: String): String =
    (0 until Dim).map(i =>
      s"$v[${i + 1}]*(${Similarity.projComponent(j, i)}.0)").mkString(" + ")

  private val vecsCte =
    "vecs AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)"

  /** LSH bucket: sum over planes of (proj_i >= 0 ? 2^i : 0), proj_i =
    * Σ_j v[j]·w(i,j) in index order — mirrors Similarity.lshBucket.
    */
  private def bucketSql(v: String): String =
    (0 until NumPlanes).map { i =>
      val proj = (0 until Dim)
        .map(j => s"$v[${j + 1}]*(${Similarity.planeComponent(i, j)}.0)")
        .mkString(" + ")
      s"CASE WHEN ($proj) >= 0 THEN ${1L << i} ELSE 0 END"
    }.mkString(" + ")

  private def topkSql(joinCond: String, extraCtes: String = ""): String =
    s"""WITH $vecsCte$extraCtes,
       |q AS (SELECT vec_id AS query_id, label AS q_label, v AS qv
       |  FROM vecs WHERE $QueryFilter),
       |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
       |    ${cosSql("q.qv", "c.v")} AS cos
       |  FROM q JOIN vecs c ON $joinCond)
       |SELECT query_id,
       |  CAST(row_number() OVER w AS INT) AS rank,
       |  neighbor_id, round(cos, 6) AS cos_sim
       |FROM scored
       |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
       |QUALIFY row_number() OVER w <= $K
       |ORDER BY query_id, rank""".stripMargin

  /** Left-associated squared-L2 chain mirroring Similarity.l2Sq. */
  private def l2SqSql(a: String, b: String): String =
    (1 to Dim).map(i => s"($a[$i]-$b[$i])*($a[$i]-$b[$i])").mkString(" + ")

  /** Per-subspace squared-L2 chain: subspace `m` of full vector `a`
    * vs the SAME offsets of codeword-source vector `b` (the seed
    * codebook stores whole seed vectors; subspace m reads components
    * m·subDim+1 … m·subDim+subDim). Left-associated — mirrors
    * Similarity.pqSubDist's fold order exactly.
    */
  private def pqL2Sql(a: String, b: String, m: Int): String =
    (1 to PqSubDim).map { i =>
      val j = m * PqSubDim + i
      s"($a[$j]-$b[$j])*($a[$j]-$b[$j])"
    }.mkString(" + ")

  /** Shared PQ oracle: encode every vector (per-subspace nearest seed
    * codeword, ties to the lowest code), build each query's
    * micro-unit ADC LUT, score candidates by the integer LUT sum.
    * `cellJoin` restricts the candidate set (the IVFADC variant adds
    * `AND l.q_label = e.label`); "" is the plain compressed full scan.
    */
  /** Per-subspace squared-L2 between RESIDUALS: each term subtracts
    * both sides' centroid components in place — one-subtraction-per-
    * element, the same doubles Spark's precomputed zip_with residual
    * arrays hold.
    */
  private def pqResL2Sql(a: String, b: String, m: Int): String =
    (1 to PqSubDim).map { i =>
      val j = m * PqSubDim + i
      s"(($a.v[$j]-$a.cv[$j])-($b.v[$j]-$b.cv[$j]))" +
        s"*(($a.v[$j]-$a.cv[$j])-($b.v[$j]-$b.cv[$j]))"
    }.mkString(" + ")

  private def pqSql(cellJoin: String, rel: String = "vecs",
                    cellExpr: String = "label",
                    extraCtes: String = "",
                    seedsSql: String = "",
                    dist: (String, String, Int) => String = null): String = {
    val seeds = if (seedsSql.nonEmpty) seedsSql else
      s"pqseeds AS (SELECT vec_id AS code, v FROM vecs WHERE vec_id < $PqCodes)"
    val d2 = if (dist != null) dist
      else (a: String, b: String, m: Int) => pqL2Sql(s"$a.v", s"$b.v", m)
    val enc = (0 until PqSub).map { m =>
      s"""SELECT vec_id, label, $m AS m, code FROM (
         |  SELECT e.vec_id, e.$cellExpr AS label, s.code, row_number() OVER (
         |      PARTITION BY e.vec_id
         |      ORDER BY ${d2("e", "s", m)}, s.code) AS rn
         |  FROM $rel e CROSS JOIN pqseeds s) WHERE rn = 1""".stripMargin
    }.mkString("\nUNION ALL\n")
    val lut = (0 until PqSub).map { m =>
      s"""SELECT q.vec_id AS query_id, q.$cellExpr AS q_label, $m AS m, s.code,
         |  CAST(CAST(${d2("q", "s", m)} AS DECIMAL(18,6))
         |       * 1000000 AS BIGINT) AS d
         |FROM $rel q CROSS JOIN pqseeds s WHERE q.$QueryFilter""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $vecsCte,$extraCtes
       |$seeds,
       |enc AS ($enc),
       |qlut AS ($lut),
       |scored AS (SELECT l.query_id, e.vec_id AS neighbor_id,
       |    CAST(SUM(l.d) AS BIGINT) AS adc_micro
       |  FROM enc e JOIN qlut l ON l.m = e.m AND l.code = e.code
       |  WHERE l.query_id <> e.vec_id $cellJoin GROUP BY 1, 2)
       |SELECT query_id, CAST(row_number() OVER w AS INT) AS rank,
       |  neighbor_id, adc_micro
       |FROM scored
       |WINDOW w AS (PARTITION BY query_id ORDER BY adc_micro, neighbor_id)
       |QUALIFY row_number() OVER w <= $K
       |ORDER BY query_id, rank""".stripMargin
  }

  private val centCte =
    s"cent AS (SELECT vec_id AS cluster, v AS cv FROM vecs WHERE vec_id < $NumSeeds)"

  private val assignedCte =
    s"""assigned AS (
       |  SELECT vec_id, cluster, v FROM (
       |    SELECT vecs.vec_id, cent.cluster, vecs.v,
       |      row_number() OVER (PARTITION BY vecs.vec_id
       |        ORDER BY ${l2SqSql("v", "cv")}, cent.cluster) AS rn
       |    FROM vecs CROSS JOIN cent) WHERE rn = 1)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_kmeans_assign" ->
      s"""WITH $vecsCte, $centCte
         |SELECT vec_id, cluster, round(d2, 6) AS dist2 FROM (
         |  SELECT vecs.vec_id, cent.cluster,
         |    ${l2SqSql("v", "cv")} AS d2,
         |    row_number() OVER (PARTITION BY vecs.vec_id
         |      ORDER BY ${l2SqSql("v", "cv")}, cent.cluster) AS rn
         |  FROM vecs CROSS JOIN cent)
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "q_hard_negatives" -> topkSql("q.q_label <> c.label"),

    "q_cluster_labels" -> {
      val toksSql = graft.functions.Portable.tokensSql("d.text")
      s"""WITH $vecsCte, $centCte, $assignedCte,
         |lab AS (SELECT d.doc_id, a.cluster, d.text FROM documents d
         |  JOIN assigned a ON a.vec_id = d.doc_id),
         |toks AS (SELECT lab.doc_id, lab.cluster, unnest($toksSql) AS tok
         |  FROM lab JOIN documents d ON d.doc_id = lab.doc_id),
         |tf AS (SELECT cluster, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
         |dfreq AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks
         |  GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM lab),
         |scored AS (SELECT t.cluster, t.tok, t.tf, d.df,
         |    round(CAST(t.tf AS DOUBLE) * n.n / d.df, 6) AS score
         |  FROM tf t JOIN dfreq d USING (tok) CROSS JOIN n),
         |r AS (SELECT *, row_number() OVER (PARTITION BY cluster
         |    ORDER BY score DESC, tok) AS rk FROM scored)
         |SELECT cluster, tok, tf, df, score, CAST(rk AS INT) AS rk
         |FROM r WHERE rk <= 3 ORDER BY cluster, rk""".stripMargin
    },

    "q_embed_outliers" ->
      s"""WITH $vecsCte, $centCte,
         |a0 AS (SELECT vec_id, cluster, round(d2, 6) AS dist2 FROM (
         |  SELECT vecs.vec_id, cent.cluster,
         |    ${l2SqSql("v", "cv")} AS d2,
         |    row_number() OVER (PARTITION BY vecs.vec_id
         |      ORDER BY ${l2SqSql("v", "cv")}, cent.cluster) AS rn
         |  FROM vecs CROSS JOIN cent) WHERE rn = 1),
         |cuts AS (SELECT cluster, round(quantile_cont(dist2, 0.9), 6)
         |    AS cutoff FROM a0 GROUP BY 1)
         |SELECT a.vec_id, a.cluster, a.dist2, c.cutoff
         |FROM a0 a JOIN cuts c USING (cluster)
         |WHERE a.dist2 > c.cutoff ORDER BY a.vec_id""".stripMargin,

    "q_ann_lifecycle" ->
      s"""WITH $vecsCte, $centCte, $assignedCte,
         |q AS (SELECT a.vec_id AS query_id, a.cluster, a.v AS qv
         |  FROM assigned a WHERE a.$QueryFilter),
         |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ${cosSql("q.qv", "c.v")} AS cos
         |  FROM q JOIN assigned c
         |    ON c.cluster = q.cluster AND c.vec_id <> q.query_id)
         |SELECT query_id,
         |  CAST(row_number() OVER w AS INT) AS rank,
         |  neighbor_id, round(cos, 6) AS cos_sim
         |FROM scored
         |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
         |QUALIFY row_number() OVER w <= $K
         |ORDER BY query_id, rank""".stripMargin,

    // replay both layouts from scratch: old cells under the frozen
    // seed centroids over the drifted corpus (evens + reversed odds),
    // new cells under the hash-arg-min re-seed of that same corpus
    "q_ann_reindex" -> {
      val h = graft.functions.Portable.hash32Sql("CAST(vec_id AS VARCHAR)")
      s"""WITH $vecsCte,
         |corpus AS (
         |  SELECT vec_id, v FROM vecs WHERE vec_id % 2 = 0
         |  UNION ALL
         |  SELECT vec_id, list_reverse(v) FROM vecs WHERE vec_id % 2 <> 0),
         |$centCte,
         |old AS (SELECT vec_id, CAST(cluster AS INT) AS cell_old FROM (
         |  SELECT c.vec_id, ct.cluster,
         |    row_number() OVER (PARTITION BY c.vec_id
         |      ORDER BY ${l2SqSql("c.v", "ct.cv")}, ct.cluster) AS rn
         |  FROM corpus c CROSS JOIN cent ct) WHERE rn = 1),
         |seeds AS (SELECT CAST($h % $NumSeeds AS INT) AS cluster,
         |    arg_min(v, vec_id) AS cv
         |  FROM corpus GROUP BY 1),
         |new_ AS (SELECT vec_id, CAST(cluster AS INT) AS cell_new FROM (
         |  SELECT c.vec_id, sd.cluster,
         |    row_number() OVER (PARTITION BY c.vec_id
         |      ORDER BY ${l2SqSql("c.v", "sd.cv")}, sd.cluster) AS rn
         |  FROM corpus c CROSS JOIN seeds sd) WHERE rn = 1)
         |SELECT o.vec_id, o.cell_old, n.cell_new
         |FROM old o JOIN new_ n USING (vec_id)
         |ORDER BY o.vec_id""".stripMargin
    },

    "q_diversity_sample" ->
      s"""WITH $vecsCte, $centCte,
         |asg AS (SELECT vec_id, cluster, round(d2, 6) AS dist2 FROM (
         |  SELECT vecs.vec_id, cent.cluster,
         |    ${l2SqSql("v", "cv")} AS d2,
         |    row_number() OVER (PARTITION BY vecs.vec_id
         |      ORDER BY ${l2SqSql("v", "cv")}, cent.cluster) AS rn
         |  FROM vecs CROSS JOIN cent) WHERE rn = 1),
         |sizes AS (SELECT cluster, count(*) AS c_size FROM asg
         |  GROUP BY cluster),
         |ranked AS (SELECT vec_id, cluster, dist2, row_number()
         |    OVER (PARTITION BY cluster ORDER BY dist2, vec_id) AS rn
         |  FROM asg)
         |SELECT r.vec_id, r.cluster, s.c_size,
         |  r.rn AS rank_in_cluster, r.dist2
         |FROM ranked r JOIN sizes s USING (cluster)
         |WHERE r.rn <= least(CAST(ceil(sqrt(s.c_size)) AS BIGINT), 64)
         |ORDER BY r.vec_id""".stripMargin,

    "q_semantic_dedup" ->
      s"""WITH $vecsCte, $centCte, $assignedCte
         |SELECT s.vec_id, s.cluster FROM assigned s
         |WHERE NOT EXISTS (
         |  SELECT 1 FROM assigned o
         |  WHERE o.cluster = s.cluster AND o.vec_id < s.vec_id
         |    AND round(${cosSql("o.v", "s.v")}, 6) >= $SemThreshold)
         |ORDER BY s.vec_id""".stripMargin,

    "q_embed_quantize" ->
      s"""WITH $vecsCte,
         |m AS (SELECT vec_id, v,
         |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS q_scale
         |  FROM vecs)
         |SELECT vec_id, round(q_scale, 9) AS q_scale,
         |  CASE WHEN q_scale = 0
         |    THEN array_to_string(list_transform(v, x -> 0), ',')
         |    ELSE array_to_string(list_transform(v, x ->
         |      GREATEST(-127, LEAST(127,
         |        CAST(floor(x / q_scale + 0.5) AS INT)))), ',')
         |  END AS q_vec_csv
         |FROM m ORDER BY vec_id""".stripMargin,

    "q_cosine_topk" -> topkSql("q.query_id <> c.vec_id"),

    "q_ann_ivf" -> topkSql("q.q_label = c.label AND q.query_id <> c.vec_id"),

    "q_ann_multiprobe" ->
      s"""WITH $vecsCte, $centCte, $assignedCte,
         |probe AS (SELECT vec_id, cluster FROM (
         |  SELECT vecs.vec_id, cent.cluster,
         |    row_number() OVER (PARTITION BY vecs.vec_id
         |      ORDER BY ${l2SqSql("v", "cv")}, cent.cluster) AS rn
         |  FROM vecs CROSS JOIN cent WHERE vecs.$QueryFilter)
         |  WHERE rn <= 2),
         |q AS (SELECT p.vec_id AS query_id, p.cluster, v.v AS qv
         |  FROM probe p JOIN vecs v ON v.vec_id = p.vec_id),
         |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ${cosSql("q.qv", "c.v")} AS cos
         |  FROM q JOIN assigned c
         |    ON c.cluster = q.cluster AND c.vec_id <> q.query_id)
         |SELECT query_id,
         |  CAST(row_number() OVER w AS INT) AS rank,
         |  neighbor_id, round(cos, 6) AS cos_sim
         |FROM scored
         |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
         |QUALIFY row_number() OVER w <= $K
         |ORDER BY query_id, rank""".stripMargin,

    "q_ann_pq" -> pqSql(""),

    "q_ann_ivfpq" -> pqSql("AND l.q_label = e.label"),

    // residual IVFADC: enc/lut read residual components inline
    // ((v[j]−cv[j]) per side — the same doubles Spark's zip_with
    // arrays hold); av joins each vector to its cell's centroid and
    // is MATERIALIZED (16 UNION-ALL references, the q_pq_lifecycle
    // lesson)
    "q_ann_ivfpq_res" -> pqSql("AND l.q_label = e.label",
      rel = "av", cellExpr = "cluster",
      extraCtes = s" $centCte, " +
        assignedCte.replaceFirst(
          "assigned AS \\(", "assigned AS MATERIALIZED (") +
        ",\nav AS MATERIALIZED (SELECT a.vec_id, a.cluster, a.v, c.cv\n" +
        "  FROM assigned a JOIN cent c ON c.cluster = a.cluster),",
      seedsSql =
        s"pqseeds AS (SELECT vec_id AS code, v, cv FROM av WHERE vec_id < $PqCodes)",
      dist = (a, b, m) => pqResL2Sql(a, b, m)),

    // stored IVFADC index ≡ recompute: k-means cell assignment under
    // the frozen centroids + PQ encode under the frozen codebook, ADC
    // within the query's cell. assigned is MATERIALIZED: the per-
    // subspace UNION ALL branches reference it 16×, and inlining the
    // cross-join-of-64-term-chains that many times OOMs the oracle
    "q_pq_lifecycle" -> pqSql("AND l.q_label = e.label",
      rel = "assigned", cellExpr = "cluster",
      extraCtes = s" $centCte, ${assignedCte.replaceFirst(
        "assigned AS \\(", "assigned AS MATERIALIZED (")},"),

    "q_embed_neardup" ->
      s"""WITH $vecsCte
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  round(${cosSql("a.v", "b.v")}, 6) AS cos_sim
         |FROM vecs a JOIN vecs b
         |  ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE round(${cosSql("a.v", "b.v")}, 6) >= 0.35
         |ORDER BY id_a, id_b""".stripMargin,

    "q_ann_lsh" -> {
      val b =
        s""",
           |bucketed AS (SELECT vec_id, label, v, ${bucketSql("v")} AS bucket
           |  FROM vecs)""".stripMargin
      s"""WITH $vecsCte$b,
         |q AS (SELECT vec_id AS query_id, v AS qv, bucket
         |  FROM bucketed WHERE $QueryFilter),
         |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ${cosSql("q.qv", "c.v")} AS cos
         |  FROM q JOIN bucketed c
         |    ON q.bucket = c.bucket AND q.query_id <> c.vec_id)
         |SELECT query_id,
         |  CAST(row_number() OVER w AS INT) AS rank,
         |  neighbor_id, round(cos, 6) AS cos_sim
         |FROM scored
         |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
         |QUALIFY row_number() OVER w <= $K
         |ORDER BY query_id, rank""".stripMargin
    },

    // mirror of Similarity.int8RescoreTopK(k=3, candidates=10):
    // quantize exactly as q_embed_quantize, integer dot chain (int
    // addition is associative — no fold-order concern), approx =
    // (qs*cs)*idot left-assoc like Spark, two QUALIFY rank stages
    "q_ann_int8" -> {
      val qvec = (v: String, s: String) =>
        s"""CASE WHEN $s = 0 THEN list_transform($v, x -> 0)
           |    ELSE list_transform($v, x -> GREATEST(-127, LEAST(127,
           |      CAST(floor(x / $s + 0.5) AS INT)))) END""".stripMargin
      val idot = (1 to Dim).map(i => s"CAST(q.qq[$i] AS BIGINT)*c.qq[$i]")
        .mkString(" + ")
      s"""WITH $vecsCte,
         |qz AS (SELECT vec_id, v,
         |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS s
         |  FROM vecs),
         |qq AS (SELECT vec_id, v, s, ${qvec("v", "s")} AS qq FROM qz),
         |q AS (SELECT vec_id AS query_id, v AS qv, s AS qs, qq
         |  FROM qq WHERE $QueryFilter),
         |cand AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    q.qv, c.v AS cv
         |  FROM q JOIN qq c ON q.query_id <> c.vec_id
         |  QUALIFY row_number() OVER (PARTITION BY q.query_id
         |    ORDER BY (q.qs * c.s) * ($idot) DESC, c.vec_id) <= 10)
         |SELECT query_id,
         |  CAST(row_number() OVER w AS INT) AS rank,
         |  neighbor_id, round(${cosSql("qv", "cv")}, 6) AS cos_sim
         |FROM cand
         |WINDOW w AS (PARTITION BY query_id
         |  ORDER BY ${cosSql("qv", "cv")} DESC, neighbor_id)
         |QUALIFY row_number() OVER w <= $K
         |ORDER BY query_id, rank""".stripMargin
    },

    "q_ann_matryoshka" ->
      s"""WITH $vecsCte,
         |q AS (SELECT vec_id AS query_id, v AS qv
         |  FROM vecs WHERE $QueryFilter),
         |cand AS (SELECT q.query_id, c.vec_id AS neighbor_id, q.qv,
         |    c.v AS cv
         |  FROM q JOIN vecs c ON q.query_id <> c.vec_id
         |  QUALIFY row_number() OVER (PARTITION BY q.query_id
         |    ORDER BY ${cosSqlN("q.qv", "c.v", 16)} DESC, c.vec_id) <= 10)
         |SELECT query_id,
         |  CAST(row_number() OVER w AS INT) AS rank,
         |  neighbor_id, round(${cosSql("qv", "cv")}, 6) AS cos_sim
         |FROM cand
         |WINDOW w AS (PARTITION BY query_id
         |  ORDER BY ${cosSql("qv", "cv")} DESC, neighbor_id)
         |QUALIFY row_number() OVER w <= $K
         |ORDER BY query_id, rank""".stripMargin,

    // mirror of Similarity.mmrTopK(k=5, λ=0.5, C=20): each greedy
    // round is one MATERIALIZED CTE (1 row), cross-joined into the
    // next round's max-sim term; single-sim rounds skip GREATEST to
    // match Spark's two-operand arithmetic exactly
    "q_mmr_select" -> {
      val K2 = 5
      def round(r: Int): String = {
        val prev = (1 until r).map(i => s"m$i")
        val sims = prev.map(p => s"(${cosSql("c.v", s"$p.v")})")
        val maxSim =
          if (sims.size == 1) sims.head
          else s"GREATEST(${sims.mkString(", ")})"
        val notin = prev.map(p => s"$p.vec_id").mkString(", ")
        s"""m$r AS MATERIALIZED (SELECT c.vec_id, c.v,
           |  c.rel - 0.5 * $maxSim AS mmr
           |  FROM cand c, ${prev.mkString(", ")}
           |  WHERE c.vec_id NOT IN ($notin)
           |  QUALIFY row_number() OVER (
           |    ORDER BY c.rel - 0.5 * $maxSim DESC, c.vec_id) = 1)""".stripMargin
      }
      val rounds = (2 to K2).map(round).mkString(",\n")
      val out = (1 to K2)
        .map(r => s"SELECT CAST($r AS INT) AS rank, vec_id, round(mmr, 6) AS mmr FROM m$r")
        .mkString("\nUNION ALL ")
      s"""WITH $vecsCte,
         |q AS (SELECT v AS qv FROM vecs WHERE vec_id = 0),
         |scored AS (SELECT c.vec_id, c.v, ${cosSql("c.v", "q.qv")} AS rel
         |  FROM vecs c, q WHERE c.vec_id <> 0),
         |cand AS MATERIALIZED (SELECT vec_id, v, rel FROM scored
         |  QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id) <= 20),
         |m1 AS MATERIALIZED (SELECT vec_id, v, rel AS mmr FROM cand
         |  QUALIFY row_number() OVER (ORDER BY rel DESC, vec_id) = 1),
         |$rounds
         |$out
         |ORDER BY rank""".stripMargin
    },

    // mirror of Similarity.sparseCosinePairs(dfCap=50, t=1/2); the
    // membership test is the same integer inequality (HUGEINT so the
    // squares can't wrap), only the reported cos touches doubles
    "q_sparse_simjoin" ->
      s"""WITH tf AS (SELECT id, token, count(*) AS tf FROM (
         |    SELECT doc_id AS id,
         |      unnest(${graft.functions.Portable.tokensSql("text")}) AS token
         |    FROM documents) WHERE len(token) > 0 GROUP BY 1, 2),
         |kept AS (SELECT token FROM tf GROUP BY token
         |  HAVING count(*) <= 50),
         |p AS (SELECT tf.* FROM tf JOIN kept USING (token)),
         |norms AS (SELECT id, sum(tf*tf) AS norm2 FROM p GROUP BY id),
         |dots AS (SELECT a.id AS id_a, b.id AS id_b,
         |    CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
         |  FROM p a JOIN p b ON a.token = b.token AND a.id < b.id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, dot,
         |  round(dot / sqrt(CAST(na.norm2 * nb.norm2 AS DOUBLE)), 6) AS cos
         |FROM dots
         |JOIN norms na ON na.id = id_a
         |JOIN norms nb ON nb.id = id_b
         |WHERE 4 * CAST(dot AS HUGEINT) * dot
         |      >= CAST(na.norm2 AS HUGEINT) * nb.norm2
         |ORDER BY id_a, id_b""".stripMargin,

    "q_random_proj" ->
      s"""WITH $vecsCte
         |SELECT vec_id,
         |  ${(0 until ProjDim).map(j =>
              s"round(${projChainSql(j, "v")}, 6) AS p${"%02d".format(j)}")
              .mkString(",\n  ")}
         |FROM vecs ORDER BY vec_id""".stripMargin,

    "q_ann_proj" ->
      s"""WITH $vecsCte,
         |proj AS (SELECT vec_id, list_value(
         |    ${(0 until ProjDim).map(j => s"(${projChainSql(j, "v")})")
              .mkString(",\n    ")}) AS pv
         |  FROM vecs),
         |q AS (SELECT vec_id AS query_id, pv AS qv
         |  FROM proj WHERE $QueryFilter),
         |scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
         |    ${cosSqlN("q.qv", "c.pv", ProjDim)} AS cos
         |  FROM q JOIN proj c ON q.query_id <> c.vec_id)
         |SELECT query_id,
         |  CAST(row_number() OVER w AS INT) AS rank,
         |  neighbor_id, round(cos, 6) AS cos_sim
         |FROM scored
         |WINDOW w AS (PARTITION BY query_id ORDER BY cos DESC, neighbor_id)
         |QUALIFY row_number() OVER w <= $K
         |ORDER BY query_id, rank""".stripMargin,
  )
}
