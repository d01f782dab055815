package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Zipfian-corpus behavior: real corpora carry a mega duplicate
  * cluster and head tokens, not the uniform replication ScaleUp's
  * default mode produces. These tests pin, with MEASURED shuffle
  * volumes, that the banding machinery degrades the way the design
  * says it does — quadratic ONLY in band-bucket size, shuffling band
  * keys and ids (never text), with the exact-dup collapse available
  * to cap the bucket before near-dup banding. The sf1-skew bench leg
  * (README) is the wall-clock record; this is the structural pin.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private val Mega = 200 // mega-cluster members
  private val Rest = 800 // singleton docs

  private def skewedDocs = {
    val mega = spark.range(Mega).select(col("id").as("doc_id"),
      lit("graft mega cluster shared body with enough tokens to " +
        "shingle repeatably across every member").as("text"))
    val singles = spark.range(Mega, Mega + Rest).select(
      col("id").as("doc_id"),
      concat(lit("unique document body number "), col("id"),
        lit(" with distinct trailing tokens t"), col("id") * 7,
        lit(" u"), col("id") * 13).as("text"))
    mega.unionByName(singles)
  }

  test("mega-cluster banding: quadratic only in bucket size, ids-only shuffle") {
    val docs = skewedDocs.localCheckpoint()
    val sigs = Dedup.minhashSignatures(
      Dedup.docShingles(docs, "doc_id", "text", 3, dedup = false),
      "doc_id").localCheckpoint()
    val pairs = Dedup.lshCandidatePairs(sigs, "doc_id")
    val s = graft.plans.ShuffleAudit.measure(pairs)
    val megaPairs = Mega.toLong * (Mega - 1) / 2
    // the mega cluster's pairs must actually be proposed …
    assert(pairs.count() >= megaPairs,
      s"banding must propose the mega cluster's $megaPairs pairs")
    // … and the shuffle stays within the analytic bound: both join
    // sides carry docs×bands keyed rows, and the pair-distinct carries
    // at most bands× the quadratic bucket content (map-side combine
    // can only shrink it). A regression that exploded work corpus-wide
    // (e.g. keying on less than the full band) trips this ceiling.
    val bandRows = (Mega + Rest).toLong * graft.functions.Portable.NumBands
    val ceiling = 2 * bandRows +
      2 * graft.functions.Portable.NumBands * megaPairs
    assert(s.shuffleRecords > 0 && s.shuffleRecords <= ceiling,
      s"band self-join shuffle must stay bucket-bounded: $s vs $ceiling")
    // ids and band keys only — the 90-char texts never shuffle: with
    // ~100 bytes/doc of text, text leakage would add ≥ bandRows×100
    assert(s.shuffleBytes < bandRows * 100,
      s"shuffle must carry band keys + ids, never text: $s")
  }

  test("exact collapse caps the mega bucket before near-dup banding") {
    val docs = skewedDocs.localCheckpoint()
    // the composition that scales: identical texts collapse to their
    // min-id representative FIRST, so banding sees ONE mega member
    val reps = Dedup.exactDedup(docs, "doc_id", "text")
      .localCheckpoint()
    assert(reps.count() == 1 + Rest,
      "exact dedup must collapse the mega cluster to one rep")
    val sigs = Dedup.minhashSignatures(
      Dedup.docShingles(reps, "doc_id", "text", 3, dedup = false),
      "doc_id")
    val pairs = Dedup.lshCandidatePairs(sigs, "doc_id")
    assert(pairs.filter(col("id_a") < Mega && col("id_b") < Mega)
      .count() == 0,
      "no intra-mega pairs should survive the collapse")
    // end-to-end: dedupCorpus keeps exactly one mega member
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text")
      .filter(col("doc_id") < Mega).count()
    assert(kept == 1L, s"exactly one mega member must survive, got $kept")
  }

  test("head tokens: capped shingle tf bounds the head's expansion") {
    // one doc whose text repeats a head token pathologically: the
    // weighted family's unary expansion must stay ≤ cap × distinct
    val doc = Seq((1L, ("zzhead " * 500) + "tail body here"))
      .toDF("doc_id", "text")
    val ctf = Dedup.cappedShingleFreqs(doc, "doc_id", "text")
    val maxCtf = ctf.agg(max("ctf")).head.getLong(0)
    assert(maxCtf <= Dedup.WtfCap,
      s"tf cap must bound head shingles: $maxCtf > ${Dedup.WtfCap}")
  }

  test("grouped top-k partial on zipfian keys: prunes the head, forwards the tail") {
    // the r13 verdict's ask: the adaptive-skip constants were tuned on
    // the dedup family — pin the partial's behavior on the zipf shape
    // a real corpus has (few huge groups + a mass of singletons), with
    // MEASURED volumes rather than wall-clock (wall-clock asserts flip
    // suites on scheduler luck — the round-5 lesson).
    val k = 3
    val heavyKeys = 10L
    val heavyRows = 3000L // 30k head rows
    val singles = 30000L  // 30k singleton groups
    // interleave head and tail by hashing position so the partial's
    // 8k-row sample window sees the true key mix, not a sorted prefix
    val heavy = spark.range(heavyKeys * heavyRows)
      .select((col("id") % heavyKeys).as("g"), (col("id") * 7 % 1000).as("v"))
    val tail = spark.range(singles)
      .select((col("id") + heavyKeys).as("g"), (col("id") % 1000).as("v"))
    val rows = heavy.unionByName(tail)
      .withColumn("__r", pmod(hash(col("g"), col("v")), lit(1000)))
      .repartition(2, col("__r")).drop("__r") // 2 parts ≈ 30k rows each
      .localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("g"))
    val topk = rows.withColumn("rn",
        org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") <= k)
    val stats = graft.plans.ShuffleAudit.measure(topk)
    val exec = topk.queryExecution.executedPlan
    assert(exec.toString.contains("GroupedTopKPartial"))
    val total = heavyKeys * heavyRows + singles
    // the head prunes to ≤ parts × heavyKeys × k rows; the singleton
    // mass must cross the exchange once each — so the measured shuffle
    // sits near (singles + small head residue), well under the input
    assert(stats.shuffleRecords <= singles + 2 * heavyKeys * k + 1000,
      s"zipf head must prune map-side: $stats vs input $total")
    assert(stats.shuffleRecords >= singles,
      s"every singleton group's row must cross: $stats")
    // with kept/seen ≈ 0.5 < SkipRatio the partial must NOT degrade —
    // pruning pays on this mix, the cap exists for key-per-row data
    val numSkipped = graft.plans.ShuffleAudit.flatten(exec).collect {
      case p: graft.plans.GroupedTopKPartialExec =>
        p.metrics("numSkipped").value
    }.sum
    assert(numSkipped == 0,
      s"zipf mix must keep pruning (kept/seen ≈ 0.5): skipped $numSkipped")
    // exactness on the skewed mix: every heavy group yields k rows,
    // every singleton yields 1
    val outRows = graft.plans.ShuffleAudit.flatten(exec).collect {
      case p: graft.plans.GroupedTopKExec => p.metrics("numOutputRows").value
    }.sum
    assert(outRows == heavyKeys * k + singles,
      s"expected ${heavyKeys * k + singles} rows, got $outRows")
  }
}
