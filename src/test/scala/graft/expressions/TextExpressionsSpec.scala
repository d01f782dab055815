package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextOps

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("nfcNormalize composes decomposed sequences, passes NFC through") {
    val rows = Seq(
      ("a", "café"), // e + combining acute → é
      ("b", "caf\u00e9"), // already composed
      ("c", "plain ascii"),
      ("d", null),
    ).toDF("id", "s")
      .select($"id", TextExpressions.nfcNormalize($"s").as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows("a") == "caf\u00e9", "decomposed must compose")
    assert(rows("a") == rows("b"))
    assert(rows("c") == "plain ascii")
    assert(rows("d") == null, "null propagates")
  }

  test("nfcNormalize survives codegen over a parquet-backed scan") {
    // parquet source forces the whole-stage-codegen path (a local
    // relation would be constant-folded through the interpreted eval)
    val docs = graft.model.Tables.documents(spark, sf).limit(10)
    val out = docs.select(
      TextExpressions.nfcNormalize(concat($"text", lit(" café")))
        .as("n"))
      .collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getString(0).endsWith(" caf\u00e9")))
  }

  test("stripHtml and redactPii clean a worked example") {
    val dirty = "See <a href='x'>link</a>  now. Mail bob@corp.io or " +
      "+1 (555) 123-4567, host 192.168.0.1 end"
    val clean = Seq(dirty).toDF("s")
      .select(TextOps.redactPii(TextOps.stripHtml($"s")).as("c"))
      .as[String].head()
    assert(clean == "See link now. Mail [EMAIL] or [PHONE], " +
      "host [IP] end", clean)
  }

  test("piiCount counts matches") {
    val n = Seq("a@b.co and c@d.org").toDF("s")
      .select(TextOps.piiCount($"s", TextOps.emailPattern)).as[Int].head()
    assert(n == 2)
  }

  test("multiOccCount == the replace-based occCount formula, per needle") {
    val texts = Seq("aaa bb the the cat", "的的的 und sch", "", "xyz",
      "ababab")
    val needles = Seq("aa", "the", "的", "ab", " und ", "zz")
    val df = texts.toDF("s")
      .select(TextExpressions.multiOccCount(
        concat(lit(" "), $"s", lit(" ")), needles).as("m") +:
        needles.zipWithIndex.map { case (nd, i) =>
          TextOps.occCount(concat(lit(" "), $"s", lit(" ")), nd)
            .cast("int").as(s"o$i")
        }: _*)
    df.collect().foreach { r =>
      val fused = r.getSeq[Int](0)
      val refs = needles.indices.map(i => r.getInt(i + 1))
      assert(fused == refs, s"fused $fused != replace-based $refs")
    }
    // null text stays null
    val n = Seq[Option[String]](None).toDF("s")
      .select(TextExpressions.multiOccCount($"s", Seq("x")).as("m"))
      .head()
    assert(n.isNullAt(0))
    // greedy non-overlapping: "aaa" has ONE "aa" (like replace)
    val g = Seq("aaa").toDF("s")
      .select(TextExpressions.multiOccCount($"s", Seq("aa")))
      .head().getSeq[Int](0)
    assert(g == Seq(1), s"got $g")
  }
}
