package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of a token array in ONE native pass — the
  * tier-(b) rewrite of [[graft.operators.Dedup.cdcDedup]]'s hot
  * prelude. The declarative form spends its time in two interpreted
  * higher-order functions per document: a `filter(sequence(w, n))`
  * whose lambda slices + re-joins the w-token window and md5-hashes
  * the resulting string at EVERY position, then a `zip_with` that
  * slices + re-joins every chunk. Semantics are pinned byte-for-byte
  * (CdcParitySpec): a boundary falls after token i (1-based, i < n)
  * whenever the first 32 md5 bits of the space-joined w-token window
  * ending at i are ≡ 0 mod `divisor` — exactly
  * `Portable.hash32(array_join(slice(toks, i-w+1, w), ' ')) % divisor
  * = 0`, which is also what the DuckDB oracle computes — so swapping
  * this in changes no result anywhere. The win is mechanical: token
  * bytes are extracted once per document, each window hash is one
  * incremental MessageDigest update over those byte slices (no string
  * rebuild, no per-element lambda dispatch), and chunk strings are
  * assembled once at the end.
  *
  * Returns `struct<blocks: array<string>, blens: array<int>>` — the
  * per-document chunk texts and their token counts, the exact shape
  * [[graft.operators.Dedup]]'s keep-first tail consumes.
  */
case class CdcChunks(child: Expression, w: Int, divisor: Int)
    extends UnaryExpression with Serializable {
  require(w >= 1 && divisor >= 1, "w and divisor must be >= 1")

  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }

  override def dataType: DataType = CdcChunks.outType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[ArrayData], w, divisor)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.CdcChunks.compute($c, $w, $divisor);")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  val outType: StructType = StructType(Seq(
    StructField("blocks", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("blens", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Space = Array[Byte](' ')

  /** Static worker the generated code calls. One pass: window hashes
    * over pre-extracted token bytes decide the boundary END positions
    * (1-based i in [w, n), plus n itself), then each chunk's tokens
    * are joined once.
    */
  def compute(toks: ArrayData, w: Int, divisor: Int): InternalRow = {
    val n = toks.numElements()
    val ts = new Array[UTF8String](n)
    val tb = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      ts(i) = toks.getUTF8String(i)
      tb(i) = ts(i).getBytes
      i += 1
    }
    // boundary end positions, 1-based, strictly below n; n appended
    val bounds = new java.util.ArrayList[Integer]()
    if (n >= w) {
      val digest = mdLocal.get()
      var e = w
      while (e < n) {
        digest.reset()
        var j = e - w
        while (j < e) {
          if (j > e - w) digest.update(Space)
          digest.update(tb(j))
          j += 1
        }
        val h = digest.digest()
        // first 32 md5 bits as an unsigned value — Portable.hash32
        val v = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
          ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
        if (v % divisor == 0) bounds.add(e)
        e += 1
      }
    }
    bounds.add(n)
    val m = bounds.size()
    val blocks = new Array[AnyRef](m)
    val blens = new Array[Int](m)
    var k = 0
    var prev = 0 // 0-based inclusive start of the next chunk
    val sep = UTF8String.fromBytes(Space)
    while (k < m) {
      val end = bounds.get(k) // 0-based exclusive
      blens(k) = end - prev
      blocks(k) =
        if (end == prev) UTF8String.EMPTY_UTF8
        else UTF8String.concatWs(sep,
          java.util.Arrays.copyOfRange(ts.asInstanceOf[Array[AnyRef]],
            prev, end).asInstanceOf[Array[UTF8String]]: _*)
      prev = end
      k += 1
    }
    InternalRow(new GenericArrayData(blocks), new GenericArrayData(blens))
  }
}

/** Column-API entry point via the registered SQL function — requires
  * [[graft.extensions.GraftExtensions]] on the session.
  */
object CdcExpressions {
  def cdcChunks(toks: Column, w: Int, divisor: Int): Column =
    call_function("cdc_chunks", toks,
      org.apache.spark.sql.functions.lit(w),
      org.apache.spark.sql.functions.lit(divisor))
}
