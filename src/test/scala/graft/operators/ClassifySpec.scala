package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the distributed batch-perceptron trainer ([[Classify]]) to a
  * sequential in-test replay of the same recurrence: the join/groupBy
  * formulation must produce bit-identical weights, margins, and votes
  * to a single-threaded loop over the same feature sets — on real
  * corpus data, not a toy fixture — plus determinism under
  * repartitioning and the empty-doc exclusion contract.
  */
class ClassifySpec extends SparkSpec {

  private lazy val docs =
    spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")

  private val Buckets = 256
  private val Epochs = 3

  /** (doc → feature-bucket set, doc → ±1 label) pulled through the
    * SAME feature/label extraction the trainer uses, so the replay
    * tests the training recurrence itself, not tokenization.
    */
  private lazy val (feat, labels) = {
    val f = Classify.hashedFeatures(docs, "doc_id", "text", Buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (d, bs) => d -> bs.map(_._2).toSet }
    val l = Classify.weakLabels(docs, "doc_id", "text", minStop = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (f, l)
  }

  /** Sequential reference: the literal batch-perceptron recurrence. */
  private def replayWeights(epochs: Int): Map[Long, Long] = {
    var w = Map.empty[Long, Long].withDefaultValue(0L)
    for (_ <- 1 to epochs) {
      val mis = labels.filter { case (d, y) =>
        y * feat(d).toSeq.map(w).sum <= 0
      }
      val delta = mis.toSeq
        .flatMap { case (d, y) => feat(d).toSeq.map(b => (b, y)) }
        .groupBy(_._1).map { case (b, ys) => b -> ys.map(_._2).sum }
      w = (w.keySet ++ delta.keySet)
        .map(b => b -> (w(b) + delta.getOrElse(b, 0L))).toMap
        .withDefaultValue(0L)
    }
    w
  }

  test("trainPerceptron ≡ sequential replay (weights, real corpus)") {
    assert(labels.nonEmpty && labels.values.toSet == Set(1L, -1L),
      "fixture must contain both classes for the test to mean anything")
    val dist = Classify
      .trainPerceptron(docs, "doc_id", "text", Buckets, Epochs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ref = replayWeights(Epochs)
    // representations may differ in explicit-zero rows; values may not
    assert(dist.filter(_._2 != 0L) == ref.filter(_._2 != 0L))
  }

  test("perceptronQuality ≡ sequential replay (margins, votes, agrees)") {
    val w = replayWeights(Epochs).withDefaultValue(0L)
    val expected = labels.map { case (d, y) =>
      val margin = feat(d).toSeq.map(w).sum
      val pred = if (margin > 0) 1L else -1L
      (d, y, margin, pred, if (pred == y) 1 else 0)
    }.toSet
    val got = Classify
      .perceptronQuality(docs, "doc_id", "text", Buckets, Epochs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSet
    assert(got == expected)
  }

  test("training is partitioning-invariant (integer batch updates)") {
    val a = Classify
      .trainPerceptron(docs, "doc_id", "text", Buckets, Epochs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Classify
      .trainPerceptron(docs.repartition(7), "doc_id", "text",
        Buckets, Epochs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a.filter(_._2 != 0L) == b.filter(_._2 != 0L))
  }

  test("null/blank docs are excluded end-to-end") {
    import spark.implicits._
    val d = Seq((1L, "the cat is in a hat"), (2L, null.asInstanceOf[String]),
      (3L, "   \t")).toDF("doc_id", "text")
    val out = Classify.perceptronQuality(d, "doc_id", "text", 64, 2)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L))
  }

  test("marginGateEval ≡ sequential replay: epoch-1 train weights, mean cut, held-out confusion") {
    val meta = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), Curation.hashBucket(col("doc_id")).as("b"),
        col("source"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2))))
      .toMap
    val isTrain = (d: Long) => meta(d)._1 < 80
    assert(labels.keys.exists(isTrain) && labels.keys.exists(!isTrain(_)),
      "split must put labeled docs on both sides")
    // epoch 1 on the train subset: w1[b] = Σ y over train docs with b
    val w = labels.toSeq.filter(p => isTrain(p._1))
      .flatMap { case (d, y) => feat(d).toSeq.map(b => (b, y)) }
      .groupBy(_._1).map { case (b, ys) => b -> ys.map(_._2).sum }
      .withDefaultValue(0L)
    // threshold: TRAIN mean margin via integer cross-multiply
    val trainMargins = labels.keys.filter(isTrain).toSeq
      .map(d => feat(d).toSeq.map(w).sum)
    val (n, s) = (trainMargins.size.toLong, trainMargins.sum)
    val expected = labels.toSeq.collect { case (d, y) if !isTrain(d) =>
      val m = feat(d).toSeq.map(w).sum
      val pred = if (BigInt(m) * n >= BigInt(s)) 1L else -1L
      (meta(d)._2, y, pred)
    }.groupBy(_._1).map { case (src, rows) =>
      src -> (rows.size.toLong,
        rows.count(r => r._3 == 1 && r._2 == 1).toLong,
        rows.count(r => r._3 == 1 && r._2 == -1).toLong,
        rows.count(r => r._3 == -1 && r._2 == -1).toLong,
        rows.count(r => r._3 == -1 && r._2 == 1).toLong)
    }
    val withSource = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "source")
    val got = Classify.marginGateEval(withSource, "doc_id", "text",
        "source", Buckets, minStop = 2, trainPct = 80)
      .collect().map { r =>
        assert(r.getAs[Long]("correct") ==
          r.getAs[Long]("tp") + r.getAs[Long]("tn"))
        assert(r.getAs[Long]("n_docs") ==
          r.getAs[Long]("tp") + r.getAs[Long]("fp") +
            r.getAs[Long]("tn") + r.getAs[Long]("fn"))
        r.getAs[String]("source") -> (r.getAs[Long]("n_docs"),
          r.getAs[Long]("tp"), r.getAs[Long]("fp"),
          r.getAs[Long]("tn"), r.getAs[Long]("fn"))
      }.toMap
    assert(got == expected)
    // the confusion must not be the degenerate all-one-column shape
    // the raw perceptron sign produces (the reason the gate exists)
    val tot = got.values.toSeq
    assert(tot.map(_._2).sum + tot.map(_._4).sum > 0, "some kept, some cut")
    assert(tot.map(_._2).sum > 0 && tot.map(_._4).sum > 0,
      s"gate must keep some and cut some held-out docs: $got")
  }

  test("per-epoch job count does not grow with corpus size (stabilized lineage)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    import java.util.concurrent.atomic.AtomicInteger
    def countJobs(n: Long): Int = {
      // distributively generated corpus: no driver-side data
      val docs = spark.range(n).select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 10).map(j =>
          concat(lit("w"), pmod(hash(col("id") * lit(31 + j)), lit(500)))): _*)
          .as("text"))
      val counter = new AtomicInteger
      val l = new SparkListener {
        override def onJobStart(jobStart: SparkListenerJobStart): Unit = {
          counter.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        Classify.trainPerceptron(docs, "doc_id", "text", 64, Epochs).collect()
        // listener delivery is async: poll until the count stops moving
        var prev = -1; var cur = counter.get(); var spins = 0
        while (cur != prev && spins < 100) {
          Thread.sleep(100); prev = cur; cur = counter.get(); spins += 1
        }
        cur
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val small = countJobs(500)
    val big = countJobs(5000)
    assert(small > 0)
    // flat modulo AQE wobble; lineage growth would multiply, not add
    assert(big <= small + 2,
      s"job count grew with corpus size: $small -> $big")
  }

  test("epoch 1 learns the per-bucket class-presence difference") {
    // with w0 = 0 every doc is misclassified, so w1[b] must equal
    // Σ_{docs containing b} y — the analytically known first step
    val w1 = Classify
      .trainPerceptron(docs, "doc_id", "text", Buckets, epochs = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expected = feat.toSeq
      .flatMap { case (d, bs) => bs.toSeq.map(b => (b, labels(d))) }
      .groupBy(_._1).map { case (b, ys) => b -> ys.map(_._2).sum }
    assert(w1.filter(_._2 != 0L) == expected.filter(_._2 != 0L))
  }

  test("calibration: accounts for every labeled doc, pos_share rises with margin") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val cal = Classify.calibration(d, "doc_id", "text",
      buckets = 1024, epochs = 1, minStop = 2, step = 256, clamp = 16)
      .collect()
    val labeled = Classify.weakLabels(d, "doc_id", "text", 2).count()
    assert(cal.map(_.getLong(1)).sum == labeled,
      "every labeled doc lands in exactly one bucket")
    assert(cal.length >= 3, s"margin spread should fill buckets: ${cal.length}")
    // the ranker property: high-margin buckets are purer in positive
    // labels than low-margin buckets (weighted tail means)
    val sorted = cal.sortBy(_.getLong(0))
    def share(rows: Seq[org.apache.spark.sql.Row]) =
      rows.map(_.getLong(2)).sum.toDouble / rows.map(_.getLong(1)).sum
    val k = sorted.length / 3
    assert(share(sorted.takeRight(k).toSeq) > share(sorted.take(k).toSeq),
      "top-margin tercile must be purer than bottom tercile")
    // n_agree never exceeds n_docs; pos buckets within [0,1]
    assert(cal.forall(r => r.getLong(3) <= r.getLong(1)))
  }
}
