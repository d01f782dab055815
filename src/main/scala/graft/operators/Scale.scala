package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-path join utilities: bucketed co-located joins (no shuffle at
  * read time) and salted joins for skewed keys. These are the knobs a
  * 100 TB deployment turns that the small-SF harness can only
  * demonstrate structurally — tests assert on the PLANS (no exchange /
  * salt fan-out correctness), not on wall-clock.
  */
object Scale {

  /** Write `df` as a bucketed+sorted table: a join between two tables
    * bucketed the same way on the join keys runs WITHOUT a shuffle on
    * either side (SortMergeJoin reads co-located buckets directly).
    * Bucket count is a layout decision: pick so each bucket is
    * 100–500 MB at production scale.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // a previous SESSION may have left the managed location on disk
    // while this session's in-memory catalog has no such table —
    // saveAsTable(Overwrite) then fails with LOCATION_ALREADY_EXISTS;
    // drop both the entry and any stale directory first
    // unqualified names only: Spark lowercases the managed location
    // and a db-qualified name lives under <db>.db/ — both would break
    // the stale-dir computation below, so fail loudly instead
    require(!table.contains(".") && table == table.toLowerCase,
      s"writeBucketed needs an unqualified lowercase table name, got '$table'")
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket keys — shuffle-free
    * when both sides were written by [[writeBucketed]] with the same
    * numBuckets.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)

  /** Join types whose semantics survive right-side replication: a
    * replicated right row only ever MATCHES (inner/left/semi) or
    * PROVES EXISTENCE (anti) — it is never emitted unmatched. Under
    * right/full outer, an unmatched right row would surface once per
    * salt value (saltFactor duplicates), so those are rejected.
    */
  private val saltSafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross")

  /** Salted equi-join for a skewed LEFT side: the left's hot keys are
    * spread over `saltFactor` sub-keys; the (small) right side is
    * replicated `saltFactor`× via an exploded salt column, so every
    * sub-key finds its match. Use when AQE's skew-join splitting isn't
    * enough (e.g. one key is >> a single partition). Right side grows
    * by saltFactor — keep it the dimension side.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltSafeJoinTypes.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin corrupts '$joinType': unmatched right rows replicate " +
        s"saltFactor times; use inner/left/left_semi/left_anti, or swap " +
        "the sides so the skewed side is on the left")
    val salted = left.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Bloom-pruned equi-join: build a [[graft.functions.Bloom]] sketch
    * of the small side's join keys (bits-per-key, so key sets far past
    * the broadcast-hash threshold still ride the plan as one literal)
    * and filter the BIG side row-locally BEFORE its shuffle — the
    * runtime-filter pattern that turns "shuffle 100 TB, then join
    * against 1 % of it" into "scan-prune to ~1 %, shuffle that". False
    * positives pass the filter and are removed by the join itself, so
    * results are exactly the plain join's (the oracle for the pruned
    * form IS the plain join). Only join types that cannot keep
    * unmatched big-side rows are accepted: pruning under left/full
    * outer would drop rows the join must null-extend.
    */
  def bloomPrunedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                      smallKey: String, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left_semi", "leftsemi")
        .contains(joinType.toLowerCase.replace(" ", "")),
      s"bloomPrunedJoin under '$joinType' would drop big-side rows the " +
        "join must keep; use inner or left_semi")
    val (words, mBits, numHashes) =
      graft.functions.Bloom.buildSized(small.select(smallKey), smallKey)
    // qualify the join keys via their own frames: bare col(name) on
    // both sides resolves ambiguously when bigKey == smallKey (the
    // natural same-name call), failing analysis
    val pruned = big.filter(graft.functions.Bloom.mightContain(
      col(bigKey), words, mBits, numHashes))
    pruned.join(small, pruned(bigKey) === small(smallKey), joinType)
  }

  /** Global dense row numbers (1..n in `orderCols` order) WITHOUT the
    * single-partition global window. `row_number() OVER (ORDER BY …)`
    * moves the whole table through one task — the classic 100 TB
    * scale-killer (Spark itself warns "Moving all data to a single
    * partition"). The distributed shape is sort + zipWithIndex:
    * range-repartition on the order keys (global sort, each partition
    * holds a contiguous key range), then one lightweight count job
    * computes per-partition offsets and a map stamps offset+local
    * index. Two jobs, no single-task stage, no shuffle beyond the
    * range exchange the sort needs anyway.
    *
    * RDD zipWithIndex is the deliberate tier-(d) choice here: the
    * per-partition "count then stamp" is genuinely imperative, and the
    * declarative alternative (window over spark_partition_id) both
    * re-shuffles and leans on a non-deterministic column.
    *
    * CALLER CONTRACT: `orderCols` must be a total order (include a
    * unique tie-break column) — ids are then identical on any engine,
    * any partitioning. Null ordering follows Spark's defaults (NULLS
    * FIRST on ASC, NULLS LAST on DESC); an oracle on another engine
    * must spell that placement out explicitly — DuckDB's defaults are
    * the opposite on ASC.
    */
  def denseIds(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column],
               idCol: String = "id"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(idCol,
          org.apache.spark.sql.types.LongType, nullable = false))
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Range-shard layout planner: the explicit, auditable form of what
    * `repartitionByRange` decides by sampling. Builds a per-KEY shard
    * map so that shard `s` holds keys whose cumulative row count lands
    * in `[s·N/numShards, (s+1)·N/numShards)` — all rows of one key
    * always land in one shard (range-partitioning's contract), so
    * shard sizes are balanced up to the heaviest single key.
    *
    * Scale shape: one groupBy(key) histogram with map-side combine,
    * then a cumulative sum over the DISTINCT-KEY frame only — a
    * window over key-cardinality rows, not corpus rows. CALLER
    * CONTRACT: the key must be bounded-cardinality (a length bucket,
    * a date, a quantized score — the keys one range-partitions
    * training shards by); for unique keys quantize first or use
    * repartitionByRange's sampling. Null keys are excluded (Spark and
    * other engines order nulls differently; a layout key should not
    * be null anyway). All arithmetic is integer (cum·numShards div
    * total) — deterministic on any engine.
    *
    * Returns the key→shard map: (key, shard, rows for that key).
    */
  private def shardedHist(df: DataFrame, keyCol: String, weight: Column,
                          numShards: Int): DataFrame = {
    require(numShards >= 1, "numShards must be >= 1")
    val base = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol), weight.cast("long").as("__w"))
    val hist = base.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__cnt"), sum("__w").as("__wsum"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(keyCol))
    val totals = hist.agg(sum("__cnt").as("__total"))
    hist
      .withColumn("__cum", sum(col("__cnt")).over(w))
      .crossJoin(broadcast(totals))
      .withColumn("shard",
        expr(s"((__cum - __cnt) * $numShards) div __total").cast("int"))
  }

  def keyShardMap(df: DataFrame, keyCol: String,
                  numShards: Int): DataFrame =
    shardedHist(df, keyCol, lit(0L), numShards)
      .select(col(keyCol), col("shard"), col("__cnt").as("key_rows"))

  /** Per-shard stats for a [[keyShardMap]] layout: rows, distinct
    * keys, key range, and a summed weight column (token counts —
    * what a training-shard writer balances by eye). One histogram
    * shuffle; corpus rows are touched exactly once.
    */
  def shardPlan(df: DataFrame, keyCol: String, weightCol: String,
                numShards: Int): DataFrame =
    shardedHist(df, keyCol, col(weightCol), numShards)
      .groupBy("shard")
      .agg(sum("__cnt").as("n_rows"),
        count(lit(1)).as("n_keys"),
        min(col(keyCol)).as("min_key"),
        max(col(keyCol)).as("max_key"),
        sum("__wsum").as("total_weight"))
      .orderBy("shard")

  /** Row-local shard assignment: join each row to its key's shard.
    * The map is key-cardinality-sized — broadcast tier for any
    * reasonable layout key.
    */
  def assignShards(df: DataFrame, keyCol: String,
                   shardMap: DataFrame): DataFrame =
    df.join(broadcast(shardMap.select(col(keyCol), col("shard"))),
      Seq(keyCol), "left")

  /** Skew diagnostic: the top-N heaviest join/shuffle keys with their
    * row share and a suggested salt factor (⌈key count / mean key
    * count⌉ — the replication needed to level that key's partition to
    * the average). Run this BEFORE picking [[saltedJoin]]'s
    * saltFactor or trusting AQE to split a hot partition.
    *
    * Cost: one groupBy on the key (map-side combinable) + a scalar
    * aggregate broadcast back over the counts — no driver collect, so
    * it is safe to point at a 100 TB fact table. Ties order by key
    * ascending for a deterministic report.
    */
  def skewReport(df: DataFrame, keyCol: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(sum("cnt").as("__total"),
      count(lit(1)).as("__n_keys"))
    counts.crossJoin(broadcast(stats))
      .select(col(keyCol), col("cnt"),
        round(col("cnt").cast("double") / col("__total"), 6).as("row_share"),
        ceil(col("cnt").cast("double") * col("__n_keys") / col("__total"))
          .cast("long").as("suggested_salt"))
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(topN)
  }
}
