package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd bloom probe over an array column — "does ANY element of
  * this array hit the filter?".
  *
  * The declarative form, `exists(arr, s -> forall(bitPositions(s),
  * p -> bitSet(p)))`, is correct but every HOF layer (ArrayExists,
  * ArrayForAll, the per-element CreateArray of positions) runs on
  * CodegenFallback — interpreted, allocating, ~6 s over sf0.1's train
  * split. This is the same tier-(b) move as [[DotProduct]]: one fused
  * loop, zero allocation, whole-stage codegen.
  *
  * Bit positions replicate `xxhash64(lit(i), s) pmod mBits` exactly
  * (seed 42 → hashInt(i) → hashUTF8String), so filters BUILT with
  * [[graft.functions.Bloom.build]]'s DataFrame path probe identically
  * here — the no-false-negatives spec pins that agreement.
  *
  * Null elements never match (a null shingle is not a member); a null
  * array yields null.
  */
case class BloomAnyContain(child: Expression, words: Array[Long],
                           mBits: Int, numHashes: Int)
    extends UnaryExpression with Serializable {

  override def prettyName: String = "bloom_any_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }

  override def dataType: DataType = BooleanType

  private def hitsAll(s: UTF8String): Boolean = {
    var h = 0
    while (h < numHashes) {
      val pos = java.lang.Math.floorMod(
        XXH64.hashUTF8String(s, XXH64.hashInt(h, 42L)), mBits.toLong).toInt
      if (((words(pos >> 6) >>> (pos & 63)) & 1L) == 0L) return false
      h += 1
    }
    true
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && hitsAll(arr.getUTF8String(i))) return true
      i += 1
    }
    false
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val pos = ctx.freshName("pos")
      val all = ctx.freshName("all")
      val xxh = classOf[XXH64].getName
      s"""
         |final int $n = $arr.numElements();
         |${ev.value} = false;
         |for (int $i = 0; $i < $n && !${ev.value}; $i++) {
         |  if ($arr.isNullAt($i)) continue;
         |  final org.apache.spark.unsafe.types.UTF8String $s =
         |    $arr.getUTF8String($i);
         |  boolean $all = true;
         |  for (int $h = 0; $h < $numHashes && $all; $h++) {
         |    final int $pos = (int) java.lang.Math.floorMod(
         |      $xxh.hashUTF8String($s, $xxh.hashInt($h, 42L)),
         |      ${mBits}L);
         |    $all = (($wordsRef[$pos >> 6] >>> ($pos & 63)) & 1L) != 0L;
         |  }
         |  if ($all) { ${ev.value} = true; }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : BloomAnyContain = copy(child = newChild)
}

/** Fused tokenize → k-shingle → bloom-probe over the RAW TEXT column:
  * true iff ANY k-word shingle of the doc might be in the filter.
  *
  * Why fuse all three: passing `shingles(tokens(text), k)` to
  * [[BloomAnyContain]] hits the repo's documented HOF trap — the
  * lambda re-evaluates the inline `split()` per element (O(tokens²)),
  * and pre-projecting the token array is fragile because predicate
  * pushdown substitutes the alias right back into the filter
  * condition. Here tokenization runs ONCE per row in a tight loop.
  *
  * Token/shingle semantics replicate `Portable.tokens`/`shingles`
  * EXACTLY (Spark `trim` strips U+0020 only; Java split with limit -1
  * keeps leading/trailing empties; `concat_ws(" ")` joins) — required
  * for correctness, because a shingle this probe misses that the
  * exact semi-join would produce is a false negative, i.e. missed
  * contamination. The agreement is spec-pinned against the HOF form
  * on real corpus data.
  */
case class BloomShingleContain(child: Expression, k: Int,
                               words: Array[Long], mBits: Int,
                               numHashes: Int)
    extends UnaryExpression with Serializable {

  override def prettyName: String = "bloom_shingle_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got $t")
  }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    BloomShingleContain.anyShingleHits(
      input.asInstanceOf[UTF8String].toString, k, words, mBits, numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val wordsRef = ctx.addReferenceObj("bloomWords", words, "long[]")
      val cls = BloomShingleContain.getClass.getName.stripSuffix("$")
      s"""
         |${ev.value} = $cls.anyShingleHits($s.toString(), $k, $wordsRef,
         |  $mBits, $numHashes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : BloomShingleContain = copy(child = newChild)
}

object BloomShingleContain {
  // identical whitespace class to Portable.WsClassJava
  private val Ws = java.util.regex.Pattern.compile("[ \\t\\n\\r\\f\\u000B]+")

  /** Shared by interpreted eval and codegen. Spark-`trim` (U+0020
    * only), Java split limit -1, space-joined k-grams, seeded-xxhash64
    * bloom probe with early exit.
    */
  def anyShingleHits(str: String, k: Int, words: Array[Long], mBits: Int,
                     numHashes: Int): Boolean = {
    var b = 0
    var e = str.length
    while (b < e && str.charAt(b) == ' ') b += 1
    while (e > b && str.charAt(e - 1) == ' ') e -= 1
    val toks = Ws.split(str.substring(b, e), -1)
    if (toks.length < k) return false
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - k) {
      sb.setLength(0)
      var o = 0
      while (o < k) {
        if (o > 0) sb.append(' ')
        sb.append(toks(i + o))
        o += 1
      }
      val s = UTF8String.fromString(sb.toString)
      var all = true
      var h = 0
      while (all && h < numHashes) {
        val pos = java.lang.Math.floorMod(
          XXH64.hashUTF8String(s, XXH64.hashInt(h, 42L)),
          mBits.toLong).toInt
        all = ((words(pos >> 6) >>> (pos & 63)) & 1L) != 0L
        h += 1
      }
      if (all) return true
      i += 1
    }
    false
  }
}

object BloomExpressions {
  /** True iff ANY element of `arr` (array<string>) might be in the
    * bloom filter. Codegen'd fused loop; see [[BloomAnyContain]].
    * Routes through the SQL registry (`GraftExtensions` must be
    * installed, as everywhere in this engine); the bitset travels as
    * an array<bigint> literal the registry builder unwraps once at
    * resolution — NOT per row.
    */
  def bloomAnyContain(arr: Column, words: Array[Long], mBits: Int,
                      numHashes: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("bloom_any_contain", arr, lit(words), lit(mBits),
      lit(numHashes))
  }

  /** True iff any k-word shingle of `text` might be in the filter.
    * Fused native tokenize+shingle+probe; see [[BloomShingleContain]].
    */
  def bloomShingleContain(text: Column, k: Int, words: Array[Long],
                          mBits: Int, numHashes: Int): Column = {
    import org.apache.spark.sql.functions.lit
    call_function("bloom_shingle_contain", text, lit(k), lit(words),
      lit(mBits), lit(numHashes))
  }
}
