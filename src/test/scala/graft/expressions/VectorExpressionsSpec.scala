package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Similarity

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.1, -0.2, 0.3), Seq(-0.4, 0.5, -0.6)),
    (3L, Seq(1e-7, 2e7, 3.14159), Seq(2.71828, -1e-9, 42.0)),
  ).toDF("id", "a", "b")

  test("native dot product matches the HOF fold bit-for-bit") {
    val rows = vecs.select(
      VectorExpressions.dotProduct($"a", $"b").as("native"),
      Similarity.dot($"a", $"b").as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"native=${r.getDouble(0)} hof=${r.getDouble(1)}"))
  }

  test("native cosine matches the HOF shape bit-for-bit") {
    val rows = vecs.select(
      VectorExpressions.cosineSim($"a", $"b").as("native"),
      Similarity.cosine($"a", $"b").as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("SQL functions are registered via GraftExtensions") {
    vecs.createOrReplaceTempView("vx")
    val r = spark.sql(
      "SELECT dot_product(a, b) AS d, cosine_sim(a, b) AS c FROM vx WHERE id = 1")
      .head()
    assert(r.getDouble(0) == 32.0)
    assert(math.abs(r.getDouble(1) - 32.0 / (math.sqrt(14) * math.sqrt(77))) < 1e-15)
  }

  test("length mismatch and null elements yield null") {
    val bad = Seq(
      (Seq(1.0, 2.0), Seq(1.0)),
      (Seq(1.0, Double.NaN), Seq(1.0, 2.0))).toDF("a", "b")
    val r1 = bad.select(VectorExpressions.dotProduct($"a", $"b")).collect()
    assert(r1(0).isNullAt(0), "length mismatch → null")
    assert(!r1(1).isNullAt(0), "NaN is a value, not null")
    // no implicit coercion without ExpectsInputTypes: args must
    // already be array<double> (decimal literals would fail analysis)
    val withNull = spark.sql(
      "SELECT dot_product(array(1.0D, cast(null as double)), array(1.0D, 2.0D))")
      .head()
    assert(withNull.isNullAt(0), "null element → null")
  }

  test("float32 leg: raw array<float> embeddings ≡ the double cast, bit-for-bit") {
    // embeddings.parquet stores array<float> — the float path scans and
    // shuffles HALF the bytes of the historical cast-to-double-at-scan
    // approach. The expressions widen per ELEMENT (float→double is
    // exact), so results are bit-identical to the double leg.
    val emb = graft.model.Tables.embeddings(spark, sf)
    assert(emb.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, true),
      "fixture must exercise the genuine float scan")
    val both = emb.select(
      VectorExpressions.dotProduct($"embedding", $"embedding").as("f"),
      VectorExpressions.dotProduct(
        $"embedding".cast("array<double>"),
        $"embedding".cast("array<double>")).as("d"),
      VectorExpressions.cosineSim($"embedding", $"embedding").as("cf"),
      VectorExpressions.cosineSim(
        $"embedding".cast("array<double>"),
        $"embedding".cast("array<double>")).as("cd"))
      .collect()
    both.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "float dot ≡ double dot")
      assert(r.getDouble(2) == r.getDouble(3), "float cosine ≡ double cosine")
    }
  }

  test("float32 leg: mixed float/double sides and SQL registration") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0)))
      .toDF("f", "d")
    val r = df.select(
      VectorExpressions.dotProduct($"f", $"d").as("fd"),
      VectorExpressions.dotProduct($"d", $"f").as("df"),
      VectorExpressions.cosineSim($"f", $"f").as("ff")).head()
    assert(r.getDouble(0) == 32.0 && r.getDouble(1) == 32.0)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-15)
  }

  test("float32 leg: brute-force top-k ranking identical on float and double") {
    val emb = graft.model.Tables.embeddings(spark, sf)
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("q"))
    def topk(cast: Boolean) = {
      val (e, q) = if (cast)
        (emb.select($"vec_id", $"embedding".cast("array<double>").as("v")),
          queries.select($"query_id", $"q".cast("array<double>").as("q")))
      else (emb.select($"vec_id", $"embedding".as("v")), queries)
      e.crossJoin(broadcast(q))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id",
          VectorExpressions.cosineSim($"v", $"q").as("sim"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
            .orderBy($"sim".desc, $"vec_id")))
        .filter($"rank" <= 10)
        .select("query_id", "rank", "vec_id", "sim")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
    }
    assert(topk(cast = false) == topk(cast = true))
  }

  test("optimizer rule rewrites the HOF pattern to DotProduct") {
    // parquet-backed source: a local relation would be constant-folded
    // before the plan can be inspected
    val emb = graft.model.Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
    val df = emb.select(Similarity.dot($"v", $"v").as("d"))
    val optimized = df.queryExecution.optimizedPlan
    val found = optimized.expressions.exists(_.exists {
      case _: DotProduct => true
      case _ => false
    })
    assert(found, s"expected DotProduct in:\n$optimized")
    // the rewritten plan agrees with the interpreted HOF on real data
    val both = emb.limit(5).select(Similarity.dot($"v", $"v").as("hof"),
      VectorExpressions.dotProduct($"v", $"v").as("native")).collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }
}
