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
    })
  )

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
    }
  )
}
