package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-first parity surface: pure `spark.sql` texts for declared
  * queries, addressing the harness tables through the
  * [[graft.sources.GraftCatalog]] `data` namespace (`graft.data.*`)
  * — no `spark.read` plumbing anywhere. SqlParitySpec pins each text
  * row-identical to its DataFrame form, so a SQL-only user of the
  * engine gets the same answers the programmatic API gives.
  *
  * Dialect notes: these are Spark-SQL renderings of the same logic
  * the DuckDB oracle runs (strftime → date_format is the only
  * translation the core set needs); the seven TPC-H subquery texts
  * are dialect-shared already and render from the SAME
  * [[CoreQueries.tpchTextSql]] strings the declared queries and the
  * oracle execute — 20 parity texts in all.
  */
object SqlQueries {

  // first-bound dir per session: Spark instantiates a catalog ONCE
  // and ignores later conf changes, so silently accepting a different
  // sfDir would return data from the old one
  private val boundDirs = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, String]())

  /** Point the `graft` catalog at a scale-factor directory. The
    * catalog binds `dir` at FIRST use in a session (Spark caches
    * catalog instances) — one sfDir per session, same contract as
    * the memoized subtrees. A different sfDir in the same session
    * fails LOUDLY instead of silently serving the old directory.
    */
  def configure(spark: SparkSession, sfDir: String): Unit = {
    val prev = boundDirs.putIfAbsent(spark, sfDir)
    require(prev == null || prev == sfDir,
      s"graft catalog already bound to $prev in this session; " +
        s"cannot rebind to $sfDir (one sfDir per session)")
    spark.conf.set("spark.sql.catalog.graft",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.dir", sfDir)
  }

  /** Run a parity query by name through the catalog. */
  def run(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark, sfDir)
    spark.sql(sql(name))
  }

  private def t(n: String) = s"graft.data.$n"

  val sql: Map[String, String] = Map(
    "q_scan" ->
      s"""SELECT l_orderkey, l_linenumber, l_quantity FROM ${t("lineitem")}
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_drop" ->
      s"""SELECT p_partkey, p_name, p_type, p_size FROM ${t("part")}
         |ORDER BY p_partkey""".stripMargin,

    "q_filter_null" ->
      s"""SELECT c_custkey, c_name, c_mktsegment FROM ${t("customer")}
         |WHERE c_mktsegment IS NOT NULL AND c_mktsegment <> ''
         |ORDER BY c_custkey""".stripMargin,

    "q_having" ->
      s"""SELECT l_suppkey, l_partkey, COUNT(l_quantity) AS n_obs
         |FROM ${t("lineitem")} GROUP BY 1, 2
         |HAVING COUNT(l_quantity) >= 3
         |ORDER BY l_suppkey, l_partkey""".stripMargin,

    "q_anti" ->
      s"""WITH sparse AS (
         |  SELECT l_suppkey, l_partkey FROM ${t("lineitem")}
         |  GROUP BY 1, 2 HAVING COUNT(l_quantity) < 3)
         |SELECT l.l_orderkey, l.l_linenumber, l.l_suppkey, l.l_partkey
         |FROM ${t("lineitem")} l
         |WHERE NOT EXISTS (SELECT 1 FROM sparse s
         |  WHERE s.l_suppkey = l.l_suppkey AND s.l_partkey = l.l_partkey)
         |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,

    "q_groupcount" ->
      s"""SELECT l_suppkey, COUNT(l_extendedprice) AS n_price,
         |       COUNT(*) AS n_rows
         |FROM ${t("lineitem")} GROUP BY 1 ORDER BY l_suppkey""".stripMargin,

    "q_distinctcount" ->
      s"""SELECT COUNT(DISTINCT l_suppkey) AS n_supp,
         |       COUNT(DISTINCT l_partkey) AS n_part
         |FROM ${t("lineitem")}""".stripMargin,

    "q_spine" ->
      s"""SELECT DISTINCT date_format(l_shipdate, 'yyyy-MM-dd') AS ship_date,
         |       l_suppkey
         |FROM (SELECT * FROM ${t("lineitem")}
         |      WHERE l_shipdate < TIMESTAMP '1998-01-01'
         |      UNION ALL
         |      SELECT * FROM ${t("lineitem")}
         |      WHERE l_shipdate >= TIMESTAMP '1998-01-01')
         |ORDER BY ship_date, l_suppkey""".stripMargin,

    "q_leftjoin" ->
      s"""SELECT sp.ship_date, sp.l_suppkey, s.s_name
         |FROM (SELECT DISTINCT date_format(l_shipdate, 'yyyy-MM-dd')
         |        AS ship_date, l_suppkey FROM ${t("lineitem")}) sp
         |LEFT JOIN ${t("supplier")} s ON sp.l_suppkey = s.s_suppkey
         |ORDER BY sp.ship_date, sp.l_suppkey""".stripMargin,

    "q_topk" ->
      s"""WITH sparse AS (
         |  SELECT l_suppkey, l_partkey FROM ${t("lineitem")}
         |  GROUP BY 1, 2 HAVING COUNT(l_quantity) < 3)
         |SELECT l.l_suppkey, COUNT(*) AS n_eliminated
         |FROM ${t("lineitem")} l
         |WHERE EXISTS (SELECT 1 FROM sparse s
         |  WHERE s.l_suppkey = l.l_suppkey AND s.l_partkey = l.l_partkey)
         |GROUP BY 1 ORDER BY n_eliminated DESC, l.l_suppkey
         |LIMIT 5""".stripMargin,

    "q_drift" ->
      s"""WITH cells AS (SELECT source AS slice, lang AS category,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM ${t("documents")} GROUP BY 1, 2),
         |rt AS (SELECT category, sum(n) AS rt FROM cells GROUP BY 1),
         |ct AS (SELECT slice, sum(n) AS ct FROM cells GROUP BY 1),
         |tot AS (SELECT sum(n) AS tot FROM cells),
         |dense AS (SELECT ct.slice, rt.category,
         |    COALESCE(c.n, 0L) AS n, rt.rt, ct.ct
         |  FROM rt CROSS JOIN ct
         |  LEFT JOIN cells c ON c.slice <=> ct.slice
         |    AND c.category <=> rt.category)
         |SELECT slice, category, n,
         |  round(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
         |    / (SELECT CAST(tot AS DOUBLE) FROM tot), 6) AS expected,
         |  round((CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
         |      / (SELECT CAST(tot AS DOUBLE) FROM tot))
         |    * (CAST(n AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
         |      / (SELECT CAST(tot AS DOUBLE) FROM tot))
         |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE)
         |      / (SELECT CAST(tot AS DOUBLE) FROM tot)), 6) AS chi2_term
         |FROM dense ORDER BY slice, category""".stripMargin,

    "q_ks_drift" ->
      s"""WITH pts AS (SELECT event_type AS grp, value AS v,
         |    sum(CASE WHEN dayofmonth(ts) <= 15 THEN 1L ELSE 0L END) AS na,
         |    sum(CASE WHEN dayofmonth(ts) > 15 THEN 1L ELSE 0L END) AS nb
         |  FROM ${t("events")} WHERE value IS NOT NULL GROUP BY 1, 2),
         |c AS (SELECT grp, v,
         |    sum(na) OVER (PARTITION BY grp ORDER BY v
         |      ROWS UNBOUNDED PRECEDING) AS ca,
         |    sum(nb) OVER (PARTITION BY grp ORDER BY v
         |      ROWS UNBOUNDED PRECEDING) AS cb,
         |    sum(na) OVER (PARTITION BY grp) AS ta,
         |    sum(nb) OVER (PARTITION BY grp) AS tb
         |  FROM pts)
         |SELECT grp AS `group`, ta AS n_a, tb AS n_b,
         |  CASE WHEN ta = 0 OR tb = 0 THEN CAST(NULL AS BIGINT)
         |    ELSE 1000000L * max(abs(ca * tb - cb * ta)) div (ta * tb)
         |  END AS ks_ppm
         |FROM c GROUP BY grp, ta, tb ORDER BY `group`""".stripMargin,

    "q_tpch_q3" ->
      s"""SELECT l_orderkey,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
         |           * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
         |    AS revenue,
         |  date_format(o_orderdate, 'yyyy-MM-dd') AS o_orderdate,
         |  o_orderpriority
         |FROM ${t("customer")}
         |JOIN ${t("orders")} ON c_custkey = o_custkey
         |JOIN ${t("lineitem")} ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1996-03-15'
         |  AND l_shipdate > TIMESTAMP '1996-03-15'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin,

  ) ++ CoreQueries.tpchTextNames
    .map(n => n -> CoreQueries.tpchTextSql(n, t)).toMap
}
