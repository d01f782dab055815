package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), 0),
    (2L, Array(0.9f, 0.1f, 0.0f), 0),  // close to 1
    (3L, Array(0.0f, 1.0f, 0.0f), 1),  // orthogonal to 1
    (4L, Array(-1.0f, 0.0f, 0.0f), 1), // opposite of 1
  ).toDF("vec_id", "embedding", "label")

  test("brute-force top-k orders by cosine, excludes self") {
    val r = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 1L), vecs, "vec_id", "embedding", 3)
      .orderBy("rank")
      .select("neighbor_id").as[Long].collect()
    assert(r.toSeq == Seq(2L, 3L, 4L), s"got ${r.toSeq}")
  }

  test("cosine values are exact for known vectors") {
    val r = Similarity.bruteForceTopK(
      vecs.filter($"vec_id" === 1L), vecs, "vec_id", "embedding", 3)
      .orderBy("rank").select("cos_sim").as[Double].collect()
    assert(math.abs(r(1) - 0.0) < 1e-9, "orthogonal → 0")
    assert(math.abs(r(2) + 1.0) < 1e-9, "opposite → -1")
  }

  test("ivf probes only the query's cell") {
    val r = Similarity.ivfTopK(
      vecs.filter($"vec_id" === 1L), vecs, "vec_id", "embedding", "label", 3)
      .select("neighbor_id").as[Long].collect()
    assert(r.toSeq == Seq(2L), "only same-label (cell 0) neighbors probed")
  }

  test("lsh buckets separate opposite vectors, keep near ones") {
    val r = Similarity.lshTopK(
      vecs.filter($"vec_id" === 1L), vecs, "vec_id", "embedding",
      dim = 3, numPlanes = 4, k = 3)
      .select("neighbor_id").as[Long].collect()
    assert(r.contains(2L), "near-identical vector must share the bucket")
    assert(!r.contains(4L), "opposite vector must hash to another bucket")
  }
}
