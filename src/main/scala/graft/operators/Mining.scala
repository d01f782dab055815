package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pattern-mining operators: market-basket co-occurrence (frequent
  * item pairs with confidence/lift) and the 2-D Pareto frontier
  * (skyline). Both are classic analytics the reference pipeline never
  * had but any warehouse-grade engine ships.
  *
  * Scale shapes:
  *   - `frequentPairs` never joins item×item globally — the pair join
  *     is keyed on the BASKET id, so the shuffle is bounded by basket
  *     size squared per basket (per-basket work), and an item-support
  *     prefilter shrinks the frame BEFORE the self-join (the Apriori
  *     downward-closure step: a pair can only be frequent if both
  *     items are). Support frames are item-cardinality-sized; with AQE
  *     on they broadcast when small and degrade to shuffle joins at
  *     huge vocabularies instead of OOMing (no explicit hint, the
  *     [[Features]] pattern).
  *   - `skyline2d` prunes with a bounded price-bucket frame first
  *     (integer cents, cross-engine exact) so the exact dominance pass
  *     runs over the small surviving candidate set, never all rows.
  *
  * All derived metrics are INTEGER micro-units (ppm) — order-free
  * integer arithmetic is bit-exact on any engine, where a float
  * confidence would drift with partition order.
  */
object Mining {

  /** Frequent item-pair mining (the 2-itemset slice of Apriori) over a
    * basket/item fact table.
    *
    * support(i)   = # distinct baskets containing i
    * support(a,b) = # distinct baskets containing both
    * confidence(a→b) ppm = 10⁶·supp(a,b) div supp(a)
    * lift ppm          = 10⁶·supp(a,b)·N div (supp(a)·supp(b))
    *
    * Items below `minItemSupport` are pruned BEFORE pair generation
    * (downward closure); pairs below `minPairSupport` are dropped
    * after counting. Pair keys are ordered (item_a < item_b) so each
    * unordered pair appears once.
    */
  def frequentPairs(df: DataFrame, basketCol: String, itemCol: String,
      minItemSupport: Long, minPairSupport: Long): DataFrame = {
    val baskets = df.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
    val supp = baskets.groupBy("item")
      .agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= minItemSupport)
    // total basket universe (for lift) — 1-row aggregate, rides the
    // plan as a cross join, never collected
    val nBaskets = baskets.select(countDistinct(col("basket")).as("n_baskets"))
    val freq = baskets.join(supp, "item")
    val pairs = freq.select(col("basket"), col("item").as("item_a"),
        col("supp").as("supp_a"))
      .join(freq.select(col("basket"), col("item").as("item_b"),
        col("supp").as("supp_b")), "basket")
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("pair_supp"),
        // supp_a/supp_b are functionally determined by the group key;
        // max is the deterministic way to carry them through
        max(col("supp_a")).as("supp_a"), max(col("supp_b")).as("supp_b"))
      .filter(col("pair_supp") >= minPairSupport)
    pairs.crossJoin(nBaskets)
      .select(col("item_a"), col("item_b"), col("pair_supp"),
        col("supp_a"), col("supp_b"),
        expr("1000000L * pair_supp div supp_a").as("conf_ab_ppm"),
        expr("1000000L * pair_supp div supp_b").as("conf_ba_ppm"),
        expr("1000000L * pair_supp * n_baskets div (supp_a * supp_b)")
          .as("lift_ppm"))
  }

  /** 2-D skyline (Pareto frontier): rows where no other row has
    * `minCol` ≤ ours AND `maxCol` ≥ ours with at least one strict.
    * Duplicated (min,max) points all survive (no strict dominator).
    *
    * Two phases:
    *   1. bucket prune — bucket rows by integer cents of `minCol`
    *     (price-range/`bucketCents` buckets, a BOUNDED frame); the
    *     running strict-prefix max of `maxCol` over earlier buckets
    *     dominates everything at-or-below it, so any row whose value
    *     it reaches is provably dominated and dropped row-locally
    *     after an AQE-broadcast join of the bucket cutoffs. Every true
    *     skyline row survives (a dominator in an earlier bucket has
    *     strictly lower `minCol`).
    *   2. exact pass — over the SURVIVORS only (bucket-frame-bounded,
    *     not corpus-bounded): group to distinct `minCol` values, then
    *     one ordered prefix-max window over that small frame decides
    *     strict dominance exactly.
    *
    * The global window in phase 2 runs over the pruned candidate set —
    * the same TakeOrdered-then-rank discipline the top-k family uses.
    */
  def skyline2d(df: DataFrame, minCol: String, maxCol: String,
      bucketCents: Long = 100L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withBucket = df.withColumn("__bkt",
      expr(s"CAST(floor($minCol * 100) AS BIGINT) div $bucketCents"))
    val bw = Window.orderBy("__bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cutoffs = withBucket.groupBy("__bkt")
      .agg(max(col(maxCol)).as("__bmax"))
      .withColumn("__prefix_max", max(col("__bmax")).over(bw))
      .select("__bkt", "__prefix_max")
    val survivors = withBucket.join(cutoffs, "__bkt")
      .filter(col("__prefix_max").isNull || col("__prefix_max") < col(maxCol))
      .drop("__bkt", "__prefix_max")
    // exact dominance over the pruned frame: per-distinct-minCol group
    // max, then a strict-prefix max over groups ordered by minCol
    val gw = Window.orderBy("__m").rowsBetween(Window.unboundedPreceding, -1)
    val groups = survivors.groupBy(col(minCol).as("__m"))
      .agg(max(col(maxCol)).as("__gmax"))
      .withColumn("__pmax", max(col("__gmax")).over(gw))
    survivors.join(groups, col(minCol) === col("__m"))
      .filter((col("__pmax").isNull || col("__pmax") < col(maxCol)) &&
        col("__gmax") <= col(maxCol))
      .drop("__m", "__gmax", "__pmax")
  }
}
