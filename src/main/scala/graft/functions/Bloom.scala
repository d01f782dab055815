package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter over a key column — the broadcast-sketch
  * membership gate for 100 TB semi-joins.
  *
  * Why not a broadcast hash semi-join? A hash set of the key *strings*
  * is bytes-per-key; the bloom is BITS per key (~10 bits/key at 1% fp),
  * so key sets far past the broadcast threshold still fit in every
  * executor as one plan literal. Why not Spark's runtime bloom
  * pruning (`spark.sql.optimizer.runtime.bloomFilter.enabled`)? That
  * fires only on equi-join shapes the optimizer picks, and its
  * `BloomFilterAggregate` bits are JVM-internal; this one is explicit
  * and composable with row-local HOFs (`exists` over a shingle array
  * needs no join at all).
  *
  * Hashing: seeded `xxhash64` — codegen'd and an order of magnitude
  * cheaper than the repo's md5-prefix portable hash. Cross-engine bit
  * portability is deliberately NOT claimed: the filter is a pruning
  * sketch whose passes are verified exactly downstream, so the only
  * determinism that matters is build-probe agreement within the run —
  * and xxhash64 is stable for Spark regardless of partitioning. (The
  * exactness-checked oracles for bloom-pruned operators are the
  * EXACT-path SQL, never the bits.)
  *
  * Contract: NO false negatives ever (an inserted key always passes);
  * false positives at the classic (1-e^{-kn/m})^k rate — callers must
  * treat a pass as "candidate", not "member", and verify exactly
  * (see `Curation.decontaminateBloom`). Bits are packed into 64-bit
  * words EXECUTOR-side (groupBy word index + bit_or), so at most
  * mBits/64 one-long rows ever reach the driver — driver memory is
  * genuinely mBits/8 bytes of sketch (plus Row overhead on ≤ 2²²
  * words at the 2²⁸ cap), never a function of the key count.
  */
object Bloom {

  /** k bit positions for a value: seeded xxhash64 mod mBits (pmod —
    * xxhash64 is signed).
    */
  def bitPositions(c: Column, mBits: Int, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      pmod(xxhash64(lit(i), c), lit(mBits.toLong))
    }: _*)

  /** Build the filter from a key frame: one exploded projection, one
    * groupBy on the WORD index with a `bit_or` of single-bit masks —
    * duplicates OR away executor-side (no distinct needed), partial
    * aggregation combines map-side, and the driver collects at most
    * mBits/64 `(word_index, word)` rows — the packed sketch itself,
    * never the keys and never one row per bit.
    */
  def build(keys: DataFrame, keyCol: String, mBits: Int,
            numHashes: Int): Array[Long] = {
    val words = new Array[Long]((mBits + 63) / 64)
    keys
      .select(explode(bitPositions(col(keyCol), mBits, numHashes)).as("p"))
      .groupBy(shiftright(col("p"), 6).as("w"))
      .agg(bit_or(call_function("shiftleft", lit(1L),
        pmod(col("p"), lit(64L)).cast("int"))).as("bits"))
      .collect()
      .foreach { r => words(r.getLong(0).toInt) = r.getLong(1) }
    words
  }

  /** Count the keys, size the filter, build it: mBits = the next power
    * of two ≥ 10 bits/key (capped at 2²⁸ = 32 MB of literal) with 7
    * hashes — the textbook ~1% fp configuration. Use this instead of
    * guessing mBits: an undersized filter silently degenerates to
    * pass-everything (correct results, zero pruning). Returns
    * (words, mBits, numHashes) for the matching probes.
    */
  def buildSized(keys: DataFrame, keyCol: String): (Array[Long], Int, Int) = {
    val n = math.max(1L, keys.count())
    var m = 1024L
    while (m < n * 10 && m < (1L << 28)) m <<= 1
    val numHashes = 7
    (build(keys, keyCol, m.toInt, numHashes), m.toInt, numHashes)
  }

  /** Row-local membership probe against a built filter: true iff every
    * seeded bit is set. The bitset rides the plan as one array<bigint>
    * literal (mBits/8 bytes), so the probe broadcasts for free and
    * stays inside codegen — usable in `filter`, in `exists(...)` over
    * an array column, anywhere a Column goes. Variable-distance shift
    * via the SQL `shiftrightunsigned` (the Scala wrapper only takes
    * literal shifts, and the ARITHMETIC shift would sign-extend words
    * whose bit 63 is set — `-1 % 2 = -1`, a false negative).
    */
  def mightContain(c: Column, words: Array[Long], mBits: Int,
                   numHashes: Int): Column = {
    val w = lit(words)
    forall(bitPositions(c, mBits, numHashes), p =>
      call_function("shiftrightunsigned",
        element_at(w, (p / 64).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(lit(1L)) === 1)
  }
}
