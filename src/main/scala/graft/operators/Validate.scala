package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling and constraint checking — the Deequ-style
  * (Schelter et al., "Automating Large-Scale Data Quality
  * Verification", VLDB 2018) validation layer a pipeline runs before
  * trusting an ingest batch. Constraint checks are ONE aggregation
  * pass (each violation count an agg expression in a single
  * `df.agg(...)`); profiling runs one column-pruned branch per
  * profiled column instead, because exact multi-column distincts in
  * one agg force an N× Expand of every input row (see [[profile]]).
  * Results are relational either way (one row per column / per
  * constraint).
  */
object Validate {

  /** Per-column profile: null count, exact distinct count (of non-null
    * values, SQL `count(DISTINCT c)` semantics) and min/max rendered
    * as strings (computed on the NATIVE type — casting first would
    * make "10" < "9" — and stringified after).
    *
    * One branch PER COLUMN, not one wide multi-distinct agg: N exact
    * `countDistinct`s in a single agg make Spark plan an Expand that
    * replicates every input row N× before the shuffle (measured 5.4 s
    * for 4 columns of sf0.1 lineitem; this form: 1.4 s). Each branch
    * scans ONLY its column (parquet-pruned), combines map-side to its
    * distinct values, and derives all four measures from that tiny
    * keyed frame — at 100 TB the difference between N narrow
    * one-column passes and an N×-inflated full-width shuffle.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.map { c =>
      df.groupBy(col(c).as("__v")).agg(count(lit(1)).as("__cnt"))
        .agg(
          coalesce(sum(when(col("__v").isNull, col("__cnt"))
            .otherwise(0L)), lit(0L)).as("null_count"),
          count(when(col("__v").isNotNull, 1L)).as("n_distinct"),
          min(col("__v")).cast("string").as("min_val"),
          max(col("__v")).cast("string").as("max_val"))
        .select(lit(c).as("column_name"), col("null_count"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
  }

  /** One declarative expectation over a frame. `violations` is the agg
    * expression counting offending rows — extend by adding cases.
    */
  sealed trait Constraint {
    def name: String
    def violations: Column
  }
  /** No NULLs in `c`. */
  final case class NotNull(c: String) extends Constraint {
    val name = s"not_null($c)"
    def violations: Column = sum(when(col(c).isNull, 1L).otherwise(0L))
  }
  /** `cols` form a unique key. Violations = extra copies beyond the
    * first of each distinct tuple (struct-wrapped, so NULL fields
    * participate in the key instead of vanishing from the count).
    */
  final case class Unique(cols: Seq[String]) extends Constraint {
    val name = s"unique(${cols.mkString(",")})"
    def violations: Column =
      count(lit(1)) - countDistinct(struct(cols.map(col): _*))
  }
  /** Non-null values of `c` fall in [lo, hi]; NULLs are NotNull's job. */
  final case class InRange(c: String, lo: Double, hi: Double)
      extends Constraint {
    val name = s"in_range($c,$lo,$hi)"
    def violations: Column =
      sum(when(col(c).isNotNull && !col(c).between(lo, hi), 1L)
        .otherwise(0L))
  }
  /** Non-null values of `c` are members of `allowed`. */
  final case class OneOf(c: String, allowed: Seq[String])
      extends Constraint {
    val name = s"one_of($c)"
    def violations: Column =
      sum(when(col(c).isNotNull && !col(c).isin(allowed: _*), 1L)
        .otherwise(0L))
  }

  /** Evaluate every constraint in one scan: a row per constraint with
    * its violation count and verdict. Gate an ingest with
    * `check(...).filter(!$"passed").isEmpty`.
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "check needs at least one constraint")
    val aggs = constraints.zipWithIndex.map { case (k, i) =>
      coalesce(k.violations.cast("long"), lit(0L)).as(s"__viol_$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(constraints.zipWithIndex.map { case (k, i) =>
        struct(
          lit(k.name).as("constraint"),
          col(s"__viol_$i").as("violations"),
          (col(s"__viol_$i") === 0L).as("passed"))
      }: _*)).as("c"))
      .select("c.*")
  }

  /** One-pass sketch profile — the 100 TB twin of [[profile]]: null
    * count, HLL distinct ESTIMATE, and native-type min/max for EVERY
    * column in a SINGLE aggregation over one scan. [[profile]]'s
    * exact distincts cost one column-pruned pass per column (the
    * Expand trap rules out a single multi-distinct agg); here each
    * column's 64 HLL registers are 64 `max` agg expressions, so C
    * columns profile in ONE pass with no row inflation — at 100 TB
    * the difference between C scans and one is the whole job. All
    * aggs combine map-side (shuffle = one row per map partition);
    * per-column register blocks from shards merge by max, the HLL
    * contract. Estimate error is the standard ±1.04/√64 ≈ 13 %.
    *
    * Values hash via their STRING rendering — profile int/string
    * columns (like [[profile]], whose min/max stringification has the
    * same engine-portability bound; double renderings differ).
    *
    * `portable = false` swaps the md5-prefix digest for seeded
    * xxhash64 on the NATIVE value (the [[graft.functions.Bloom]]
    * precedent): ~2× on the scan (no string render, no md5, no
    * base-16 conv) at the cost of oracle replayability — same
    * estimator, different register contents; the spec pins both
    * paths against exact counts.
    */
  def profileSketch(df: DataFrame, cols: Seq[String],
                    portable: Boolean = true): DataFrame = {
    import Sketches.{HllB, HllM, HllAlpha}
    require(cols.nonEmpty, "profileSketch needs at least one column")
    // bucket and rank materialized ONCE per row (projected columns) —
    // inlining the md5/bin into each of the 64 register aggs
    // recomputes them 64× per row (no CSE across aggregate
    // expressions; measured 8.4 s → 1.6 s at sf0.1 for 4 columns).
    // Nulls propagate through the digest, so a null value reaches no
    // register and no explicit isNotNull guard is needed.
    val hashed = df.select(col("*") +: cols.flatMap { c =>
      val h =
        if (portable)
          graft.functions.Portable.hash32(col(c).cast("string"))
        else // keep 32 bits so rho's word width matches the md5 path;
          // xxhash64 IGNORES null children (returns the seed hash)
          // rather than propagating null like md5 — guard explicitly
          // so a NULL value reaches no register on either path
          when(col(c).isNotNull,
            xxhash64(lit(0x5EED), col(c)).bitwiseAND(lit(0xFFFFFFFFL)))
      Seq((h % HllM).as(s"__b_$c"),
        Sketches.rho(shiftright(h, HllB)).as(s"__rho_$c"))
    }: _*)
    // each column's register block is ONE array-buffered typed
    // aggregate ([[Sketches.HllRegisterBlock]]) — 64 separate max()
    // exprs per column blow the codegen field limit and fall into the
    // interpreted aggregate (measured 5.7 s vs ~1 s at sf0.1 × 4 cols)
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
        min(col(c)).cast("string").as(s"__lo_$c"),
        max(col(c)).cast("string").as(s"__hi_$c"),
        Sketches.hllRegisterBlock(
          coalesce(col(s"__b_$c"), lit(-1L)),
          coalesce(col(s"__rho_$c"), lit(-1)))
          .as(s"__regs_$c"))
    }
    val one = hashed.agg(aggs.head, aggs.tail: _*)
    // close each column's estimate from its register block: the
    // 2^-register terms are dyadic with ≤ 33 mantissa bits total, so
    // the double sum is EXACT in any order (engine-portable; and
    // pow(2.0, n) is an exact IEEE power for n ≤ 27 — no libm drift)
    val rows = cols.map { c =>
      val live = filter(col(s"__regs_$c"), r => r > 0)
      val present = size(live)
      val sPresent = aggregate(live, lit(0.0),
        (acc, r) => acc + lit(1.0) / pow(lit(2.0), r.cast("double")))
      struct(lit(c).as("column_name"),
        col(s"__n_$c").as("null_count"),
        round(lit(HllAlpha * HllM * HllM) /
          ((lit(HllM) - present).cast("double") + sPresent), 4)
          .as("distinct_est"),
        col(s"__lo_$c").as("min_val"),
        col(s"__hi_$c").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Benford per-mille expectations for first significant digits 1–9:
    * round(1000·log10(1+1/d)) as fixed integer literals — no libm call
    * anywhere, so every engine agrees exactly.
    */
  val BenfordPermille: Seq[Int] = Seq(301, 176, 125, 97, 79, 67, 58, 51, 46)

  /** First-significant-digit distribution audit (Benford's law) for a
    * positive monetary column: per (group, digit), the observed count,
    * the group row count, the expected per-mille, and the ‰-scaled
    * absolute deviation |1000·obs − n·permille| — all integers, so the
    * report is bit-exact on any engine. Fabricated or unit-mangled
    * numeric feeds show up as digit-1 depletion long before any range
    * constraint fires.
    *
    * Digit extraction stays in the exact integer domain: cents =
    * floor(100·value) (floor of a double is exact IEEE), first char of
    * the BIGINT's decimal string — never log10 on doubles, whose
    * boundary rounding differs per libm. One scan, one groupBy on
    * (group, digit) ≤ 9 rows per group — the shuffle is
    * report-sized at any input size.
    */
  def benford(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val cents = floor(col(valueCol) * 100).cast("long")
    val d0 = df.select(col(groupCol), cents.as("__cents"))
      .filter(col("__cents") > 0)
      .select(col(groupCol),
        substring(col("__cents").cast("string"), 1, 1).cast("int").as("digit"))
    val obs = d0.groupBy(col(groupCol), col("digit"))
      .agg(count(lit(1)).as("obs"))
    val n = d0.groupBy(col(groupCol)).agg(count(lit(1)).as("n"))
    obs.join(n, groupCol)
      .withColumn("exp_permille",
        element_at(typedLit(BenfordPermille), col("digit")))
      .withColumn("dev",
        abs(lit(1000L) * col("obs") - col("n") * col("exp_permille")))
  }

  /** Schema evolution diff between two parquet snapshots of a table —
    * the pre-flight a lake pipeline runs before swapping a new batch
    * in: per column, its status (`unchanged`/`added`/`removed`/
    * `retyped`) and a compatibility verdict for readers of the OLD
    * schema: `ok` (unchanged, or an added nullable column old readers
    * ignore), `widened` (int→bigint, float→double — value-preserving),
    * `break` (removed, or any other retype). Schemas are parquet
    * FOOTER metadata — reading them touches no data files, so this is
    * a driver-side metadata probe by construction, the same class as
    * a catalog lookup, at any table size.
    */
  def schemaDiff(spark: org.apache.spark.sql.SparkSession,
                 oldPath: String, newPath: String): DataFrame = {
    val o = spark.read.parquet(oldPath).schema
      .map(f => f.name -> f.dataType.catalogString).toMap
    val n = spark.read.parquet(newPath).schema
      .map(f => f.name -> f.dataType.catalogString).toMap
    val widening = Set("tinyint->smallint", "tinyint->int", "tinyint->bigint",
      "smallint->int", "smallint->bigint", "int->bigint", "float->double")
    val rows = (o.keySet ++ n.keySet).toSeq.sorted.map { c =>
      (o.get(c), n.get(c)) match {
        case (Some(t), Some(t2)) if t == t2 => (c, "unchanged", t, t2, "ok")
        case (Some(t), Some(t2)) =>
          (c, "retyped", t, t2,
            if (widening.contains(s"$t->$t2")) "widened" else "break")
        case (Some(t), None) => (c, "removed", t, null, "break")
        case (None, Some(t2)) => (c, "added", null, t2, "ok")
        case (None, None) => throw new IllegalStateException(c)
      }
    }
    import spark.implicits._
    rows.toDF("column", "status", "old_type", "new_type", "compat")
  }
}
