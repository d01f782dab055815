package graft.expressions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.Portable
import graft.model.Tables

/** The native [[CdcChunks]] expression must reproduce the former
  * declarative boundary+slice pipeline BYTE-FOR-BYTE — same chunks,
  * same lengths — on the real corpus and on the edge fixtures (empty
  * text, shorter-than-window docs, null text through cdcDedup's
  * wrapper), so the swap is a pure CPU win with the DuckDB oracle
  * untouched.
  */
class CdcParitySpec extends SparkSpec {

  private val (w, divisor) = (3, 4)

  /** The pre-r13 declarative form, kept verbatim as the parity
    * reference.
    */
  private def oldChunks(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val base = df.select(col(idCol),
      Portable.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    val bounds = concat(
      when(col("__n") >= w,
        filter(sequence(lit(w), col("__n")),
          i => Portable.hash32(
            array_join(slice(col("__toks"), i - (w - 1), lit(w)), " "))
            % divisor === 0 && i < col("__n")))
        .otherwise(array().cast("array<int>")),
      array(col("__n")))
    def startOf(i: org.apache.spark.sql.Column) = when(i === 0, lit(1))
      .otherwise(element_at(col("__bounds"), i) + 1)
    base.withColumn("__bounds", bounds)
      .select(col(idCol),
        zip_with(col("__bounds"),
          sequence(lit(0), size(col("__bounds")) - 1),
          (end, i) => array_join(
            slice(col("__toks"), startOf(i), end - startOf(i) + 1), " "))
          .as("blocks"),
        zip_with(col("__bounds"),
          sequence(lit(0), size(col("__bounds")) - 1),
          (end, i) => end - startOf(i) + 1).as("blens"))
  }

  private def newChunks(df: DataFrame, idCol: String,
                        textCol: String): DataFrame =
    df.select(col(idCol),
      CdcExpressions.cdcChunks(Portable.tokens(col(textCol)), w, divisor)
        .as("__c"))
      .select(col(idCol), col("__c.blocks").as("blocks"),
        col("__c.blens").as("blens"))

  private def collectMap(df: DataFrame)
      : Map[Long, (Seq[String], Seq[Int])] =
    df.collect().map(r => r.getLong(0) ->
      ((r.getSeq[String](1), r.getSeq[Int](2)))).toMap

  test("native chunks ≡ declarative chunks on the corpus") {
    val docs = Tables.documents(spark, sf)
    val o = collectMap(oldChunks(docs, "doc_id", "text"))
    val n = collectMap(newChunks(docs, "doc_id", "text"))
    // NOTE: the clue is evaluated eagerly — keep it total
    assert(o.nonEmpty && o == n,
      o.keys.find(k => n.get(k) != Some(o(k)))
        .map(k => s"doc $k: old=${o(k)} new=${n.get(k)}")
        .getOrElse("key sets diverged"))
    // the fixture must exercise real boundaries, not the n<w fallback
    assert(o.values.exists(_._1.size > 1), "no content boundary hit")
  }

  test("edge shapes: empty text, sub-window docs, exact window") {
    import spark.implicits._
    val docs = Seq(
      (1L, ""), (2L, "one"), (3L, "one two"), (4L, "one two three"),
      (5L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"))
      .toDF("doc_id", "text")
    val o = collectMap(oldChunks(docs, "doc_id", "text"))
    val n = collectMap(newChunks(docs, "doc_id", "text"))
    assert(o == n, s"old=$o new=$n")
  }

  test("cdcDedup output unchanged, including a null-text doc") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text")
      .unionByName(Seq((-1L, null: String)).toDF("doc_id", "text"))
    val got = graft.operators.Dedup
      .cdcDedup(docs, "doc_id", "text", w, divisor, minTokens = 2)
      .filter(col("doc_id") === -1L)
      .select("text_clean", "n_spans", "n_cut")
      .head()
    // the oracle's outer-join shape counts a null-text doc as ONE
    // (null) span rebuilt to '' — pinned here so the native path
    // keeps the accidental-but-contractual legacy behavior
    assert(got.getString(0) == "" && got.getLong(1) == 1L &&
      got.getLong(2) == 0L, got.toString)
  }

  test("the expression stays inside whole-stage codegen") {
    val df = newChunks(Tables.documents(spark, sf), "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    // codegen'd operators render as "*(stageId) Op" in the tree
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"cdc_chunks must not break codegen:\n$plan")
  }
}
