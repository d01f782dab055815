package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.Mining

/** Pattern-mining queries: market-basket frequent pairs over
  * `lineitem` baskets and the 2-D Pareto frontier (skyline) over
  * `part`. The oracle for the skyline is the SEMANTIC definition (a
  * quadratic NOT EXISTS dominance check) — deliberately independent of
  * the engine's two-phase bucket-pruned algorithm, so the gate checks
  * the algebra, not a mirror of the implementation.
  */
object MiningQueries {
  type Q = (SparkSession, String) => DataFrame

  private val MinItemSupp = 20L
  private val MinPairSupp = 2L

  val queries: Map[String, Q] = Map(
    // frequent item pairs with confidence / lift (ppm integer units);
    // top 100 under a total order so the LIMIT is deterministic
    "q_itemsets" -> ((s, d) =>
      Mining.frequentPairs(Tables.lineitem(s, d), "l_orderkey", "l_partkey",
          MinItemSupp, MinPairSupp)
        .orderBy(col("pair_supp").desc, col("item_a"), col("item_b"))
        .limit(100)),

    // Pareto frontier of parts: no other part both cheaper-or-equal
    // AND larger-or-equal with one strict
    "q_skyline" -> ((s, d) =>
      Mining.skyline2d(
          Tables.part(s, d).select("p_partkey", "p_retailprice", "p_size"),
          "p_retailprice", "p_size")
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_size", "p_partkey"))
  )

  val oracleSql: Map[String, String] = Map(
    "q_itemsets" ->
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
         |    FROM lineitem),
         |s AS (SELECT item, CAST(count(*) AS BIGINT) AS supp FROM b
         |  GROUP BY 1 HAVING count(*) >= $MinItemSupp),
         |f AS (SELECT b.basket, b.item, s.supp FROM b JOIN s USING (item)),
         |n AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
         |  FROM b),
         |p AS (SELECT a.item AS item_a, c.item AS item_b,
         |    CAST(count(*) AS BIGINT) AS pair_supp,
         |    max(a.supp) AS supp_a, max(c.supp) AS supp_b
         |  FROM f a JOIN f c ON a.basket = c.basket AND a.item < c.item
         |  GROUP BY 1, 2 HAVING count(*) >= $MinPairSupp)
         |SELECT item_a, item_b, pair_supp, supp_a, supp_b,
         |  CAST(1000000 * pair_supp // supp_a AS BIGINT) AS conf_ab_ppm,
         |  CAST(1000000 * pair_supp // supp_b AS BIGINT) AS conf_ba_ppm,
         |  CAST(1000000 * pair_supp * n.n_baskets // (supp_a * supp_b)
         |    AS BIGINT) AS lift_ppm
         |FROM p, n
         |ORDER BY pair_supp DESC, item_a, item_b
         |LIMIT 100""".stripMargin,

    "q_skyline" ->
      """SELECT p.p_partkey, p.p_retailprice, p.p_size
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_retailprice <= p.p_retailprice
        |    AND q.p_size >= p.p_size
        |    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
        |ORDER BY p.p_retailprice, p.p_size, p.p_partkey""".stripMargin
  )
}
