package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.model.Tables
import graft.operators.Sketches

/** Sketch queries over the `documents` token stream: HyperLogLog
  * per-source distinct-token counts (next to the exact count, so the
  * sketch error is itself hash-pinned) and Count-Min frequency
  * estimates for the corpus's top tokens. Every register/counter both
  * engines compute is bit-identical ([[Portable.hash32]] + integer
  * rank arithmetic + dyadic-exact double sums), so the DuckDB oracle
  * checks the ESTIMATES, not just plumbing.
  */
object SketchQueries {
  type Q = (SparkSession, String) => DataFrame

  private val TopN = 20

  private def toks(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("text").isNotNull && length(trim(col("text"))) > 0)
      .select(col("source"), explode(Portable.tokens(col("text"))).as("tok"))

  val queries: Map[String, Q] = Map(
    // per-source HLL distinct-token estimate next to the exact count
    "q_hll_distinct" -> ((s, d) => {
      val t = toks(s, d)
      val exact = t.groupBy("source")
        .agg(countDistinct(col("tok")).as("exact_distinct"))
      exact.join(Sketches.hllDistinct(t, "source", "tok"), "source")
        .select("source", "exact_distinct", "hll_estimate")
        .orderBy("source")
    }),

    // CMS frequency estimates for the exact top-20 tokens: n_est ≥
    // n_true always (one-sided error), equality for true heavy hitters
    "q_cms_topk" -> ((s, d) => {
      val t = toks(s, d)
      val top = t.groupBy("tok").agg(count(lit(1)).as("n_true"))
        .orderBy(col("n_true").desc, col("tok")).limit(TopN)
      top.join(Sketches.cmsEstimate(Sketches.cmsSketch(t, "tok"), top, "tok"),
          "tok")
        .select("tok", "n_true", "n_est")
        .orderBy(col("n_true").desc, col("tok"))
    }),

    // KMV pairwise vocabulary overlap: union + Jaccard ESTIMATES for
    // every source pair next to the exact values — the composable
    // distinct sketch (HLL can't intersect)
    "q_kmv_overlap" -> ((s, d) =>
      Sketches.kmvOverlap(toks(s, d), "source", "tok")
        .orderBy("ga", "gb")),

    // Fast-AGMS join-size estimate per source pair next to the exact
    // Σ n_a·n_b — the sketch that prices a planned token-keyed
    // blocked join's output volume from 256 longs per group instead
    // of running the join
    "q_ams_joinsize" -> ((s, d) =>
      Sketches.amsJoinSize(toks(s, d), "source", "tok")
        .orderBy("ga", "gb")),

    // trailing-7-day distinct users from window-merged HLL registers:
    // per-day register tables (the stored artifact any window width
    // can re-merge) max-merge over the calendar range frame; the
    // exact rolling distinct sits beside the estimate
    "q_hll_sliding" -> ((s, d) =>
      Sketches.hllSlidingDistinct(Tables.events(s, d), "ts", "user_id", 7)
        .orderBy("day")),

    // per-source F2 (second moment) from the same AMS sketch — the
    // skew indicator: F2/n² is the collision mass a shuffle keyed on
    // tok would funnel into one partition
    "q_ams_f2" -> ((s, d) =>
      Sketches.amsSelfJoinSize(toks(s, d), "source", "tok")
        .orderBy("source")),

    // the shard-merge path: per-source registers merged by max into
    // ONE corpus-level estimate, next to the exact global distinct —
    // mergeability is what lets 100 TB of shard sketches answer
    // corpus questions without a re-scan
    "q_hll_union" -> ((s, d) => {
      val t = toks(s, d)
      val merged = Sketches.hllEstimateFromRegisters(
        Sketches.hllMergeRegisters(
          Sketches.hllRegisters(t, "source", "tok")),
        Seq.empty)
      t.agg(countDistinct(col("tok")).as("exact_distinct"))
        .crossJoin(merged)
    }),

    // log₂-histogram quantile bounds per source (p50/p90/p99 of doc
    // length), next to the exact order statistics — the mergeable
    // quantile sketch whose answer provably sandwiches the truth
    // (the exact companion is the oracle yardstick; production reads
    // the bounds and drops that sort)
    "q_log_quantiles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d).filter(col("n_chars").isNotNull)
      val bounds = Sketches.logQuantileBounds(docs, "source", "n_chars")
      val w = Window.partitionBy("source").orderBy("n_chars")
      val ranked = docs.select(col("source"), col("n_chars"))
        .withColumn("r", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      val exact = ranked.groupBy("source").agg(
        min(when(col("r") * 100 >= col("n") * 50, col("n_chars")))
          .as("exact_p50"),
        min(when(col("r") * 100 >= col("n") * 90, col("n_chars")))
          .as("exact_p90"),
        min(when(col("r") * 100 >= col("n") * 99, col("n_chars")))
          .as("exact_p99"))
      bounds.join(exact, "source").orderBy("source")
    }),

    // bounded-error mergeable quantile sketch (hash-ordered bottom-m
    // compactor, m = 64 so the sample path is genuinely exercised at
    // sf0.01): estimates BESIDE the exact order statistics, plus the
    // group count — the sketch error is itself hash-pinned
    "q_sketch_quantiles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d).filter(col("n_chars").isNotNull)
      val sk = Sketches.quantileSketch(docs, "source", "doc_id",
        "n_chars", m = QsM)
      val est = Sketches.sketchQuantiles(sk, "source")
      val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
      val ranked = docs.select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("r", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      val exact = ranked.groupBy("source").agg(
        max(col("n")).as("n"),
        min(when(col("r") * 100 >= col("n") * 50, col("n_chars")))
          .as("exact_p50"),
        min(when(col("r") * 100 >= col("n") * 90, col("n_chars")))
          .as("exact_p90"),
        min(when(col("r") * 100 >= col("n") * 99, col("n_chars")))
          .as("exact_p99"))
      est.join(exact, "source")
        .select("source", "n", "est_p50", "est_p90", "est_p99",
          "exact_p50", "exact_p90", "exact_p99")
        .orderBy("source")
    }),

    // KS drift BETWEEN SKETCHES: the even/odd doc halves' n_chars
    // distributions compared through their m-row sketches only — the
    // batch-over-batch drift check that never re-scans a batch
    "q_sketch_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d).filter(col("n_chars").isNotNull)
      // batch split must be independent of source (source = id mod 20
      // in the harness data, so id parity is DEGENERATE — one empty
      // slice per source): alternate BLOCKS of ids instead
      val ska = Sketches.quantileSketch(
        docs.filter(expr("(doc_id div 20) % 2 = 0")),
        "source", "doc_id", "n_chars", m = QsM)
      val skb = Sketches.quantileSketch(
        docs.filter(expr("(doc_id div 20) % 2 = 1")),
        "source", "doc_id", "n_chars", m = QsM)
      Sketches.sketchKsDrift(ska, skb, "source")
        .orderBy("group")
    }),

    // stored-sketch LIFECYCLE — the production shape of the mergeable
    // quantile sketch at 100 TB: ingest batch 1's sketch is COMMITTED
    // to a versioned table, batch 2 arrives, the stored sketch is read
    // back, merged with batch 2's sketch, and re-committed; estimates
    // come from the STORE, never from re-scanning earlier batches.
    // Because merge ≡ direct is exact set equality, the oracle simply
    // replays the direct sketch over the whole corpus (plus the
    // per-source sample size, pinning the store content's shape).
    "q_sketch_lifecycle" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val path = Scratch.fresh(s"skl_${Scratch.tag(d)}/sk")
      val docs = Tables.documents(s, d).filter(col("n_chars").isNotNull)
      val b1 = docs.filter(col("doc_id") % 2 === 0)
      val b2 = docs.filter(col("doc_id") % 2 =!= 0)
      graft.io.Versioned.commit(s, path,
        Sketches.quantileSketch(b1, "source", "doc_id", "n_chars", QsM))
      val stored = graft.io.Versioned.read(s, path)
      val merged = Sketches.quantileSketchMerge(stored,
        Sketches.quantileSketch(b2, "source", "doc_id", "n_chars", QsM),
        "source", QsM)
      graft.io.Versioned.commit(s, path, merged, mode = "overwrite")
      val finalSk = graft.io.Versioned.read(s, path)
      val est = Sketches.sketchQuantiles(finalSk, "source")
      val ns = finalSk.groupBy("source").agg(count(lit(1)).as("n_sample"))
      val w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
      val ranked = docs.select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("r", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("source")))
      val exact = ranked.groupBy("source").agg(
        max(col("n")).as("n"),
        min(when(col("r") * 100 >= col("n") * 50, col("n_chars")))
          .as("exact_p50"),
        min(when(col("r") * 100 >= col("n") * 90, col("n_chars")))
          .as("exact_p90"),
        min(when(col("r") * 100 >= col("n") * 99, col("n_chars")))
          .as("exact_p99"))
      est.join(ns, "source").join(exact, "source")
        .select("source", "n", "n_sample", "est_p50", "est_p90",
          "est_p99", "exact_p50", "exact_p90", "exact_p99")
        .orderBy("source")
    }),

    // distinct-count MAINTAINED view (the third stored-aggregate
    // member, after sum/count and min/max): per-nation distinct parts
    // supplied as a stored HLL register block, then one CDC batch —
    // deletes (dirty only the groups whose register witnesses they
    // remove), a key-update wave, and inserts. Registers are a
    // deterministic max-fold, so the refresh must land bit-equal to
    // the oracle's full re-sketch of the new snapshot.
    "q_incr_distinct" -> ((s, d) => {
      import graft.operators.MaintainedDistinct
      val li = Tables.lineitem(s, d)
      def rows(f: DataFrame): DataFrame = f
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("nk"), col("k"))
      val path = Scratch.fresh(s"mdv_${Scratch.tag(d)}/view")
      val oldF = li.filter(col("l_orderkey") % 13 =!= 0)
        .withColumn("k", col("l_partkey").cast("string"))
      MaintainedDistinct.write(rows(oldF), Seq("nk"), "k", path)
      val removed = rows(oldF.filter(
        col("l_orderkey") % 7 === 0 || col("l_orderkey") % 11 === 0))
      val added = rows(oldF
          .filter(col("l_orderkey") % 7 === 0 &&
            col("l_orderkey") % 11 =!= 0)
          .withColumn("k", (col("l_partkey") + 5000000L).cast("string")))
        .unionByName(rows(li.filter(col("l_orderkey") % 13 === 0)
          .withColumn("k", col("l_partkey").cast("string"))))
      val newRows = rows(li.filter(col("l_orderkey") % 11 =!= 0 ||
          col("l_orderkey") % 13 === 0)
        .withColumn("k",
          when(col("l_orderkey") % 7 === 0 &&
              col("l_orderkey") % 11 =!= 0 &&
              col("l_orderkey") % 13 =!= 0,
            col("l_partkey") + 5000000L)
            .otherwise(col("l_partkey")).cast("string")))
      MaintainedDistinct.deltaRefresh(s, path, removed, added,
        Seq("nk"), "k", batchId = 1L) { dirty =>
        // fact-side recompute of exactly the dirty groups
        newRows.join(broadcast(dirty), Seq("nk"), "left_semi")
      }
      MaintainedDistinct.readEstimates(s, path, Seq("nk"))
        .orderBy("nk")
    }),

    // quantile-sketch MAINTAINED view (the fourth stored-aggregate
    // member): per-nation bottom-m price sample stored on disk, one
    // CDC batch — deletes that hit sample members dirty their group
    // (the next-smallest rank lives in the facts), non-member deletes
    // and all inserts fold by the merge ≡ direct identity. The sample
    // is a pure set function of the keys, so the refresh must land
    // row-equal to the oracle's full re-sketch of the new snapshot.
    "q_incr_quantile" -> ((s, d) => {
      import graft.operators.MaintainedSample
      val li = Tables.lineitem(s, d)
      def rows(f: DataFrame): DataFrame = f
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_nationkey").as("nk"), col("k"), col("v"))
      def keyed(f: DataFrame): DataFrame = f.withColumn("k",
        concat_ws("-", col("l_orderkey"), col("l_linenumber")))
      val path = Scratch.fresh(s"msv_${Scratch.tag(d)}/view")
      val oldF = keyed(li.filter(col("l_orderkey") % 13 =!= 0))
        .withColumn("v", col("l_extendedprice"))
      MaintainedSample.write(rows(oldF), "nk", "k", "v", path, QsM)
      val removed = rows(oldF.filter(
        col("l_orderkey") % 7 === 0 || col("l_orderkey") % 11 === 0))
      val added = rows(oldF
          .filter(col("l_orderkey") % 7 === 0 &&
            col("l_orderkey") % 11 =!= 0)
          .withColumn("v", col("l_extendedprice") + 1.0))
        .unionByName(rows(keyed(li.filter(col("l_orderkey") % 13 === 0))
          .withColumn("v", col("l_extendedprice"))))
      val newRows = rows(keyed(li.filter(col("l_orderkey") % 11 =!= 0 ||
          col("l_orderkey") % 13 === 0))
        .withColumn("v",
          when(col("l_orderkey") % 7 === 0 &&
              col("l_orderkey") % 11 =!= 0 &&
              col("l_orderkey") % 13 =!= 0,
            col("l_extendedprice") + 1.0)
            .otherwise(col("l_extendedprice"))))
      MaintainedSample.deltaRefresh(s, path, removed, added,
        "nk", "k", "v", QsM, batchId = 1L) { dirty =>
        newRows.join(broadcast(dirty), Seq("nk"), "left_semi")
      }
      val sk = MaintainedSample.read(s, path)
      val ns = sk.groupBy("nk").agg(count(lit(1)).as("n_sample"))
      ns.join(Sketches.sketchQuantiles(sk, "nk"), "nk")
        .select("nk", "n_sample", "est_p50", "est_p90", "est_p99")
        .orderBy("nk")
    })
  )

  private val QsM = 64

  private val toksCte =
    s"""toks AS (SELECT source, unnest(${Portable.tokensSql("text")}) AS tok
       |  FROM documents
       |  WHERE text IS NOT NULL AND length(trim(text)) > 0)""".stripMargin

  private val RhoMax = 32 - Sketches.HllB + 1 // all-zero word rank
  private val M = Sketches.HllM

  val oracleSql: Map[String, String] = Map(
    "q_hll_distinct" ->
      s"""WITH $toksCte,
         |h AS (SELECT source, ${Portable.hash32Sql("tok")} AS hv FROM toks),
         |reg AS (SELECT source, hv % $M AS bucket,
         |    max(CASE WHEN hv // $M > 0
         |        THEN $RhoMax - length(bin(hv // $M)) ELSE $RhoMax END) AS m
         |  FROM h GROUP BY 1, 2),
         |est AS (SELECT source, count(*) AS present,
         |    sum(1.0 / CAST(1::BIGINT << m AS DOUBLE)) AS s_present
         |  FROM reg GROUP BY 1),
         |ex AS (SELECT source, count(DISTINCT tok) AS exact_distinct
         |  FROM toks GROUP BY 1)
         |SELECT e.source, x.exact_distinct,
         |  round(${Sketches.HllAlpha * M * M} /
         |    (($M - present) + s_present), 4) AS hll_estimate
         |FROM est e JOIN ex x ON e.source = x.source
         |ORDER BY e.source""".stripMargin,

    "q_cms_topk" -> {
      val D = Sketches.CmsDepth
      val W = Sketches.CmsWidth
      // disjoint 8-bit slices of one 60-bit digest, like cmsBucket
      def bucket(dExpr: String, hExpr: String) =
        s"($hExpr >> (8 * $dExpr)) & ${W - 1}"
      s"""WITH $toksCte,
         |counts AS (SELECT tok, count(*) AS n_true FROM toks GROUP BY tok),
         |top AS (SELECT tok, ${Portable.hash60Sql("tok")} AS hv, n_true
         |  FROM counts ORDER BY n_true DESC, tok LIMIT $TopN),
         |hashed AS (SELECT ${Portable.hash60Sql("tok")} AS hv FROM toks),
         |sk AS (SELECT r.d, ${bucket("r.d", "hv")} AS bucket,
         |    count(*) AS cnt
         |  FROM hashed CROSS JOIN range(0, $D) r(d) GROUP BY 1, 2),
         |est AS (SELECT t.tok, min(s.cnt) AS n_est
         |  FROM top t CROSS JOIN range(0, $D) r(d)
         |  JOIN sk s ON s.d = r.d AND s.bucket = ${bucket("r.d", "t.hv")}
         |  GROUP BY t.tok)
         |SELECT t.tok, t.n_true, e.n_est
         |FROM top t JOIN est e ON t.tok = e.tok
         |ORDER BY t.n_true DESC, t.tok""".stripMargin
    },

    "q_kmv_overlap" -> {
      val k = Sketches.KmvK
      s"""WITH $toksCte,
         |dt AS (SELECT DISTINCT source, tok FROM toks),
         |hs AS (SELECT DISTINCT source, ${Portable.hash32Sql("tok")} AS hv
         |  FROM dt),
         |sk AS (SELECT source, hv,
         |    row_number() OVER (PARTITION BY source ORDER BY hv) AS rk
         |  FROM hs QUALIFY rk <= $k),
         |g AS (SELECT DISTINCT source FROM sk),
         |prs AS (SELECT a.source AS ga, b.source AS gb
         |  FROM g a JOIN g b ON a.source < b.source),
         |pv AS (SELECT p.ga, p.gb, s.hv,
         |    max(CASE WHEN s.source = p.ga THEN 1 ELSE 0 END) AS in_a,
         |    max(CASE WHEN s.source = p.gb THEN 1 ELSE 0 END) AS in_b
         |  FROM prs p JOIN sk s ON s.source = p.ga OR s.source = p.gb
         |  GROUP BY 1, 2, 3),
         |mg AS (SELECT ga, gb, hv, in_a, in_b,
         |    row_number() OVER (PARTITION BY ga, gb ORDER BY hv) AS rk
         |  FROM pv QUALIFY rk <= $k),
         |ka AS (SELECT ga, gb, CAST(count(*) AS BIGINT) AS n,
         |    max(hv) AS kth,
         |    CAST(sum(in_a * in_b) AS BIGINT) AS in_both
         |  FROM mg GROUP BY 1, 2),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz
         |  FROM dt GROUP BY 1),
         |it AS (SELECT a.source AS ga, b.source AS gb,
         |    CAST(count(*) AS BIGINT) AS ec
         |  FROM dt a JOIN dt b ON a.tok = b.tok AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT ka.ga, ka.gb,
         |  CAST(coalesce(it.ec, 0) AS BIGINT) AS exact_common,
         |  CAST(sa.sz + sb.sz - coalesce(it.ec, 0) AS BIGINT) AS exact_union,
         |  round(CAST(coalesce(it.ec, 0) AS DOUBLE)
         |    / (sa.sz + sb.sz - coalesce(it.ec, 0)), 6) AS exact_jaccard,
         |  round(CAST(in_both AS DOUBLE) / n, 6) AS kmv_jaccard,
         |  round(CASE WHEN n < $k THEN CAST(n AS DOUBLE)
         |    ELSE ${(k - 1).toDouble} * 4294967296.0 / kth END, 4)
         |    AS kmv_union
         |FROM ka
         |JOIN sz sa ON sa.source = ka.ga
         |JOIN sz sb ON sb.source = ka.gb
         |LEFT JOIN it ON it.ga = ka.ga AND it.gb = ka.gb
         |ORDER BY ka.ga, ka.gb""".stripMargin
    },

    "q_ams_joinsize" -> {
      val bkts = Sketches.AmsBuckets
      s"""WITH $toksCte,
         |hh AS (SELECT source, ${Portable.hash60Sql("tok")} AS h FROM toks),
         |x AS (SELECT source, (h >> 1) % $bkts AS b,
         |    CAST(sum((h & 1) * 2 - 1) AS BIGINT) AS xv
         |  FROM hh GROUP BY 1, 2),
         |est AS (SELECT xa.source AS ga, xb.source AS gb,
         |    CAST(sum(xa.xv * xb.xv) AS BIGINT) AS ams_est
         |  FROM x xa JOIN x xb ON xa.b = xb.b AND xa.source < xb.source
         |  GROUP BY 1, 2),
         |tf AS (SELECT source, tok, count(*) AS n FROM toks GROUP BY 1, 2),
         |ex AS (SELECT a.source AS ga, b.source AS gb,
         |    CAST(sum(a.n * b.n) AS BIGINT) AS exact_join_size
         |  FROM tf a JOIN tf b ON a.tok = b.tok AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT est.ga, est.gb, est.ams_est,
         |  coalesce(ex.exact_join_size, 0) AS exact_join_size
         |FROM est
         |LEFT JOIN ex ON ex.ga = est.ga AND ex.gb = est.gb
         |ORDER BY est.ga, est.gb""".stripMargin
    },

    "q_hll_sliding" -> {
      val wd = 7
      s"""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
         |    CAST(user_id AS VARCHAR) AS k
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |h AS (SELECT day, ${Portable.hash32Sql("k")} AS hv FROM daily),
         |reg AS (SELECT day, hv % $M AS bucket,
         |    max(CASE WHEN hv // $M > 0
         |        THEN $RhoMax - length(bin(hv // $M)) ELSE $RhoMax END) AS m
         |  FROM h GROUP BY 1, 2),
         |days AS (SELECT DISTINCT day FROM daily),
         |grid AS (SELECT d.day, b.bucket, r.m,
         |    date_diff('day', DATE '1970-01-01', d.day) AS epoch
         |  FROM days d CROSS JOIN range(0, $M) b(bucket)
         |  LEFT JOIN reg r ON r.day = d.day AND r.bucket = b.bucket),
         |mg AS (SELECT day, bucket,
         |    max(m) OVER (PARTITION BY bucket ORDER BY epoch
         |      RANGE BETWEEN ${wd - 1} PRECEDING AND CURRENT ROW) AS mw
         |  FROM grid),
         |est AS (SELECT day,
         |    sum(CASE WHEN mw IS NOT NULL THEN 1 ELSE 0 END) AS present,
         |    sum(CASE WHEN mw IS NOT NULL
         |        THEN 1.0 / CAST(1::BIGINT << mw AS DOUBLE)
         |        ELSE 0.0 END) AS s_present
         |  FROM mg GROUP BY 1),
         |dk AS (SELECT DISTINCT day, k FROM daily),
         |ex AS (SELECT g.day,
         |    CAST(count(DISTINCT f.k) AS BIGINT) AS exact_distinct
         |  FROM days g JOIN dk f
         |    ON f.day <= g.day AND f.day >= g.day - ${wd - 1}
         |  GROUP BY 1)
         |SELECT CAST(est.day AS VARCHAR) AS day, ex.exact_distinct,
         |  round(${Sketches.HllAlpha * M * M} /
         |    (($M - present) + s_present), 4) AS hll_estimate
         |FROM est JOIN ex USING (day)
         |ORDER BY est.day""".stripMargin
    },

    "q_ams_f2" -> {
      val bkts = Sketches.AmsBuckets
      s"""WITH $toksCte,
         |hh AS (SELECT source, ${Portable.hash60Sql("tok")} AS h FROM toks),
         |x AS (SELECT source, (h >> 1) % $bkts AS b,
         |    CAST(sum((h & 1) * 2 - 1) AS BIGINT) AS xv
         |  FROM hh GROUP BY 1, 2),
         |est AS (SELECT source, CAST(sum(xv * xv) AS BIGINT) AS f2_est
         |  FROM x GROUP BY 1),
         |tf AS (SELECT source, tok, count(*) AS n FROM toks GROUP BY 1, 2),
         |ex AS (SELECT source, CAST(sum(n * n) AS BIGINT) AS f2_exact
         |  FROM tf GROUP BY 1)
         |SELECT est.source, est.f2_est, ex.f2_exact
         |FROM est JOIN ex USING (source)
         |ORDER BY source""".stripMargin
    },

    "q_hll_union" ->
      s"""WITH $toksCte,
         |h AS (SELECT source, ${Portable.hash32Sql("tok")} AS hv FROM toks),
         |reg AS (SELECT source, hv % $M AS bucket,
         |    max(CASE WHEN hv // $M > 0
         |        THEN $RhoMax - length(bin(hv // $M)) ELSE $RhoMax END) AS m
         |  FROM h GROUP BY 1, 2),
         |mg AS (SELECT bucket, max(m) AS m FROM reg GROUP BY 1),
         |est AS (SELECT count(*) AS present,
         |    sum(1.0 / CAST(1::BIGINT << m AS DOUBLE)) AS s_present
         |  FROM mg),
         |ex AS (SELECT count(DISTINCT tok) AS exact_distinct FROM toks)
         |SELECT ex.exact_distinct,
         |  round(${Sketches.HllAlpha * M * M} /
         |    (($M - present) + s_present), 4) AS hll_estimate
         |FROM est, ex""".stripMargin,

    "q_log_quantiles" -> {
      def qb(p: Int) =
        s"min(CASE WHEN cum * 100 >= total * $p THEN bucket END) AS p${p}_b"
      def bound(p: Int) =
        s"""CASE WHEN p${p}_b > 0
           |    THEN (CAST(1 AS BIGINT) << (p${p}_b - 1)) ELSE 0 END
           |    AS p${p}_lo,
           |  (CAST(1 AS BIGINT) << p${p}_b) - 1 AS p${p}_hi""".stripMargin
      def ex(p: Int) =
        s"min(CASE WHEN r * 100 >= n * $p THEN n_chars END) AS exact_p$p"
      s"""WITH base AS (SELECT source, n_chars FROM documents
         |  WHERE n_chars IS NOT NULL AND n_chars >= 0),
         |hist AS (SELECT source,
         |    CASE WHEN n_chars > 0 THEN length(bin(n_chars)) ELSE 0 END
         |      AS bucket,
         |    count(*) AS cnt
         |  FROM base GROUP BY 1, 2),
         |c AS (SELECT source, bucket,
         |    CAST(sum(cnt) OVER (PARTITION BY source ORDER BY bucket)
         |      AS BIGINT) AS cum,
         |    CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS total
         |  FROM hist),
         |q AS (SELECT source, ${qb(50)}, ${qb(90)}, ${qb(99)}
         |  FROM c GROUP BY source),
         |rk AS (SELECT source, n_chars,
         |    CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars)
         |      AS BIGINT) AS r,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
         |  FROM base),
         |exq AS (SELECT source, ${ex(50)}, ${ex(90)}, ${ex(99)}
         |  FROM rk GROUP BY source)
         |SELECT q.source,
         |  ${bound(50)},
         |  ${bound(90)},
         |  ${bound(99)},
         |  exact_p50, exact_p90, exact_p99
         |FROM q JOIN exq USING (source)
         |ORDER BY q.source""".stripMargin
    },

    "q_sketch_quantiles" -> {
      def est(p: Int) =
        s"min(CASE WHEN sr * 100 >= sm * $p THEN v END) AS est_p$p"
      def ex(p: Int) =
        s"min(CASE WHEN r * 100 >= n * $p THEN n_chars END) AS exact_p$p"
      s"""WITH qbase AS (SELECT source, doc_id, n_chars FROM documents
         |  WHERE n_chars IS NOT NULL),
         |qsk AS (SELECT source, doc_id, n_chars AS v FROM (
         |    SELECT source, doc_id, n_chars,
         |      row_number() OVER (PARTITION BY source
         |        ORDER BY ${Portable.hash32Sql("CAST(doc_id AS VARCHAR)")},
         |          CAST(doc_id AS VARCHAR)) AS rk
         |    FROM qbase) WHERE rk <= $QsM),
         |qsr AS (SELECT source, v,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY v, CAST(doc_id AS VARCHAR)) AS BIGINT) AS sr,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS sm
         |  FROM qsk),
         |qest AS (SELECT source, ${est(50)}, ${est(90)}, ${est(99)}
         |  FROM qsr GROUP BY source),
         |qrk AS (SELECT source, n_chars,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY n_chars, doc_id) AS BIGINT) AS r,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
         |  FROM qbase),
         |qex AS (SELECT source, max(n) AS n, ${ex(50)}, ${ex(90)}, ${ex(99)}
         |  FROM qrk GROUP BY source)
         |SELECT source, n, est_p50, est_p90, est_p99,
         |  exact_p50, exact_p90, exact_p99
         |FROM qest JOIN qex USING (source)
         |ORDER BY source""".stripMargin
    },

    "q_sketch_drift" -> {
      def skCte(name: String, pred: String) =
        s"""$name AS (SELECT source, n_chars AS v FROM (
           |    SELECT source, doc_id, n_chars,
           |      row_number() OVER (PARTITION BY source
           |        ORDER BY ${Portable.hash32Sql("CAST(doc_id AS VARCHAR)")},
           |          CAST(doc_id AS VARCHAR)) AS rk
           |    FROM qbase WHERE $pred) WHERE rk <= $QsM)""".stripMargin
      s"""WITH qbase AS (SELECT source, doc_id, n_chars FROM documents
         |  WHERE n_chars IS NOT NULL),
         |${skCte("ska", "(doc_id // 20) % 2 = 0")},
         |${skCte("skb", "(doc_id // 20) % 2 = 1")},
         |kpts AS (SELECT grp, v, CAST(sum(sa) AS BIGINT) AS na,
         |    CAST(sum(sb) AS BIGINT) AS nb
         |  FROM (SELECT source AS grp, v, 1 AS sa, 0 AS sb FROM ska
         |        UNION ALL
         |        SELECT source AS grp, v, 0 AS sa, 1 AS sb FROM skb)
         |  GROUP BY 1, 2),
         |kc AS (SELECT grp, v,
         |    sum(na) OVER (PARTITION BY grp ORDER BY v
         |      ROWS UNBOUNDED PRECEDING) AS ca,
         |    sum(nb) OVER (PARTITION BY grp ORDER BY v
         |      ROWS UNBOUNDED PRECEDING) AS cb,
         |    sum(na) OVER (PARTITION BY grp) AS ta,
         |    sum(nb) OVER (PARTITION BY grp) AS tb
         |  FROM kpts)
         |SELECT grp AS "group", CAST(ta AS BIGINT) AS n_a,
         |  CAST(tb AS BIGINT) AS n_b,
         |  CASE WHEN ta = 0 OR tb = 0 THEN NULL
         |    ELSE CAST(1000000 * max(abs(ca * tb - cb * ta)) // (ta * tb)
         |      AS BIGINT) END AS ks_ppm
         |FROM kc GROUP BY grp, ta, tb ORDER BY "group"""".stripMargin
    },

    // lifecycle ≡ direct: the merge property is the contract, so the
    // oracle replays the DIRECT sketch over the whole corpus and adds
    // the per-source sample size the store must hold
    "q_sketch_lifecycle" -> {
      def est(p: Int) =
        s"min(CASE WHEN sr * 100 >= sm * $p THEN v END) AS est_p$p"
      def ex(p: Int) =
        s"min(CASE WHEN r * 100 >= n * $p THEN n_chars END) AS exact_p$p"
      s"""WITH qbase AS (SELECT source, doc_id, n_chars FROM documents
         |  WHERE n_chars IS NOT NULL),
         |qsk AS (SELECT source, doc_id, n_chars AS v FROM (
         |    SELECT source, doc_id, n_chars,
         |      row_number() OVER (PARTITION BY source
         |        ORDER BY ${Portable.hash32Sql("CAST(doc_id AS VARCHAR)")},
         |          CAST(doc_id AS VARCHAR)) AS rk
         |    FROM qbase) WHERE rk <= $QsM),
         |qns AS (SELECT source, count(*) AS n_sample FROM qsk GROUP BY 1),
         |qsr AS (SELECT source, v,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY v, CAST(doc_id AS VARCHAR)) AS BIGINT) AS sr,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS sm
         |  FROM qsk),
         |qest AS (SELECT source, ${est(50)}, ${est(90)}, ${est(99)}
         |  FROM qsr GROUP BY source),
         |qrk AS (SELECT source, n_chars,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY n_chars, doc_id) AS BIGINT) AS r,
         |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
         |  FROM qbase),
         |qex AS (SELECT source, max(n) AS n, ${ex(50)}, ${ex(90)}, ${ex(99)}
         |  FROM qrk GROUP BY source)
         |SELECT source, n, n_sample, est_p50, est_p90, est_p99,
         |  exact_p50, exact_p90, exact_p99
         |FROM qest JOIN qns USING (source) JOIN qex USING (source)
         |ORDER BY source""".stripMargin
    },

    // full re-sketch of the NEW snapshot — refresh ≡ recompute is the
    // maintained-distinct contract; register/estimate SQL shared with
    // q_hll_distinct
    "q_incr_distinct" ->
      s"""WITH newf AS (SELECT l_suppkey,
         |    CAST(CASE WHEN l_orderkey % 7 = 0 AND l_orderkey % 11 <> 0
         |              AND l_orderkey % 13 <> 0
         |         THEN l_partkey + 5000000
         |         ELSE l_partkey END AS VARCHAR) AS k
         |  FROM lineitem WHERE l_orderkey % 11 <> 0 OR l_orderkey % 13 = 0),
         |j AS (SELECT s_nationkey AS nk, k
         |  FROM newf JOIN supplier ON l_suppkey = s_suppkey),
         |h AS (SELECT nk, ${Portable.hash32Sql("k")} AS hv FROM j),
         |reg AS (SELECT nk, hv % $M AS bucket,
         |    max(CASE WHEN hv // $M > 0
         |        THEN $RhoMax - length(bin(hv // $M)) ELSE $RhoMax END) AS m
         |  FROM h GROUP BY 1, 2),
         |est AS (SELECT nk, count(*) AS present,
         |    sum(1.0 / CAST(1::BIGINT << m AS DOUBLE)) AS s_present
         |  FROM reg GROUP BY 1),
         |cnt AS (SELECT nk, count(*) AS n FROM j GROUP BY 1)
         |SELECT c.nk,
         |  round(${Sketches.HllAlpha * M * M} /
         |    (($M - present) + s_present), 4) AS hll_estimate, c.n
         |FROM cnt c JOIN est e ON c.nk = e.nk
         |ORDER BY c.nk""".stripMargin,

    // full re-sketch of the NEW snapshot — refresh ≡ recompute is the
    // maintained-sample contract; sketch/estimate SQL shared with
    // q_sketch_lifecycle. The j2 CTE replays the view's SET semantics:
    // the sample is of KEYS (one row per (group, key), min-v
    // canonical) — the harness lineitem carries duplicate
    // (orderkey, linenumber) pairs, so this is load-bearing
    "q_incr_quantile" -> {
      def est(p: Int) =
        s"min(CASE WHEN sr * 100 >= sm * $p THEN v END) AS est_p$p"
      s"""WITH newf AS (SELECT l_suppkey,
         |    CAST(l_orderkey AS VARCHAR) || '-' ||
         |      CAST(l_linenumber AS VARCHAR) AS k,
         |    CASE WHEN l_orderkey % 7 = 0 AND l_orderkey % 11 <> 0
         |              AND l_orderkey % 13 <> 0
         |         THEN l_extendedprice + 1.0
         |         ELSE l_extendedprice END AS v
         |  FROM lineitem WHERE l_orderkey % 11 <> 0 OR l_orderkey % 13 = 0),
         |j0 AS (SELECT s_nationkey AS nk, k, v
         |  FROM newf JOIN supplier ON l_suppkey = s_suppkey),
         |j AS (SELECT nk, k, min(v) AS v FROM j0 GROUP BY 1, 2),
         |sk AS (SELECT nk, k, v FROM (
         |    SELECT nk, k, v,
         |      row_number() OVER (PARTITION BY nk
         |        ORDER BY ${Portable.hash32Sql("k")}, k) AS rk
         |    FROM j) WHERE rk <= $QsM),
         |ns AS (SELECT nk, count(*) AS n_sample FROM sk GROUP BY 1),
         |sr AS (SELECT nk, v,
         |    CAST(row_number() OVER (PARTITION BY nk ORDER BY v, k)
         |      AS BIGINT) AS sr,
         |    CAST(count(*) OVER (PARTITION BY nk) AS BIGINT) AS sm
         |  FROM sk),
         |est AS (SELECT nk, ${est(50)}, ${est(90)}, ${est(99)}
         |  FROM sr GROUP BY nk)
         |SELECT n.nk, n.n_sample, est_p50, est_p90, est_p99
         |FROM ns n JOIN est e ON n.nk = e.nk
         |ORDER BY n.nk""".stripMargin
    },
  )
}
