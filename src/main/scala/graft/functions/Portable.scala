package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic primitives.
  *
  * Every hash/shingle/signature the dedup and similarity operators use
  * must be computable bit-identically by the DuckDB oracle, so each
  * primitive here exists twice: a Spark `Column` form and a DuckDB SQL
  * string form, generated from the SAME constants. md5 is the only
  * hash both engines share; a 32-bit prefix of it (8 hex chars) fits a
  * BIGINT with headroom for the (a*h+b) mod p permutation arithmetic
  * (a,b,h < 2^31 keeps a*h+b < 2^63).
  *
  * The reference has no content hashing at all (its dedup surface is
  * pandas drop_duplicates, steps/step5_create_views.py:324); these
  * primitives exist for the training-data-pipeline extensions
  * (MinHash/SimHash near-dup, fingerprinting) that the north star
  * requires beyond reference parity.
  */
object Portable {

  /** Mersenne prime 2^31-1: modulus of the MinHash permutation family. */
  val P: Long = 2147483647L

  /** Number of MinHash permutations and LSH banding layout (4 bands of
    * 4 rows: detects pairs from ~0.45 Jaccard up with high recall).
    */
  val NumPerms = 16
  val NumBands = 4
  val RowsPerBand: Int = NumPerms / NumBands

  /** Fixed permutation coefficients, derived from a Weyl-style
    * sequence so they are reproducible literals (no RNG): odd, nonzero,
    * < P. Used verbatim on both engines.
    *
    * Overflow headroom: h < 2^32 (md5 prefix) and a,b < 2^31, so
    * a·h + b < (2^31−1)(2^32−1) + 2^31 < 2^63 — fits a Long.
    */
  val As: IndexedSeq[Long] =
    (1 to NumPerms).map(j => ((2654435761L * j) % P) | 1L)
  val Bs: IndexedSeq[Long] =
    (1 to NumPerms).map(j => ((40503L * j * j + 2246822519L * j) % P) | 1L)
  // `(x % P) | 1` CAN yield exactly P (≡ 0 mod P) when x % P == P-1,
  // which would make that permutation constant (a·h ≡ 0) and silently
  // inflate every Jaccard estimate by 1/NumPerms. The current 16
  // coefficients verifiably miss that case; this guard keeps any
  // future NumPerms/constant change honest.
  require((As ++ Bs).forall(c => c > 0 && c < P),
    "degenerate MinHash coefficient (multiple of P)")

  // ---- 32-bit md5-prefix hash ----

  /** Spark: first 8 hex chars of md5 as a bigint in [0, 2^32). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** DuckDB SQL for [[hash32]]. */
  def hash32Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 8) AS BIGINT)"

  // ---- 60-bit md5-prefix hash ----
  //
  // 60, not 64: the value stays strictly positive, so every downstream
  // shift/band/SUM is sign-safe on any engine (bit 63 would flip the
  // sign under BIGINT). The wide form exists for signature spaces that
  // must stay sparse at corpus scale — e.g. SimHash bands: 4×8-bit
  // bands saturate at ~256 values each once the corpus dwarfs the key
  // space, 4×15-bit bands hold ~32k values each.

  /** Spark: first 15 hex chars of md5 as a bigint in [0, 2^60). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB SQL for [[hash60]]. */
  def hash60Sql(e: String): String =
    s"CAST('0x' || substr(md5($e), 1, 15) AS BIGINT)"

  // ---- whitespace tokenization ----

  /** Explicit whitespace class instead of `\s`: Java's `\s` includes
    * vertical tab U+000B but RE2's (DuckDB's) does not, so a corpus
    * containing one VT would tokenize differently per engine and break
    * the bit-identical contract. The class below is character-for-
    * character identical on both.
    */
  private val WsClassJava = "[ \\t\\n\\r\\f\\u000B]+"
  private val WsClassRe2 = "[ \\t\\n\\r\\f\\x{0B}]+"

  /** Spark: whitespace tokens of a trimmed string column. */
  def tokens(c: Column): Column = split(trim(c), WsClassJava)

  /** DuckDB SQL for [[tokens]]. */
  def tokensSql(e: String): String =
    s"regexp_split_to_array(trim($e), '$WsClassRe2')"

  // ---- k-word shingles ----

  /** Spark: k-word shingles (space-joined) of a token array column.
    * Empty when the doc has fewer than k tokens.
    *
    * PERF: pass a MATERIALIZED column (project [[tokens]] with a
    * select first), never the tokens expression inline — the lambda
    * body references `toks` via element_at, and higher-order functions
    * are interpreted, so an inline split(...) tree is re-evaluated per
    * element (~10× slowdown measured: 8 s → 0.8 s on 260k shingles).
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) >= k,
      transform(sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (0 until k).map(o => element_at(toks, i + o + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** DuckDB SQL for [[shingles]] over a token-array expression
    * (DuckDB lists are 1-indexed).
    */
  def shinglesSql(toksE: String, k: Int): String = {
    val parts = (0 until k).map(o => s"$toksE[i+$o]").mkString(" || ' ' || ")
    s"CASE WHEN len($toksE) >= $k THEN " +
      s"list_transform(generate_series(1, len($toksE) - ${k - 1}), i -> $parts) " +
      s"ELSE [] END"
  }

  // ---- MinHash permutation ----

  /** Spark: j-th permuted hash of an already-hashed value column. */
  def perm(h: Column, j: Int): Column = (lit(As(j)) * h + lit(Bs(j))) % P

  /** DuckDB SQL for [[perm]]. */
  def permSql(hE: String, j: Int): String = s"(${As(j)} * $hE + ${Bs(j)}) % $P"
}
