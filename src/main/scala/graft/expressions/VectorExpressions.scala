package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native vector arithmetic for the similarity-search path.
  *
  * Spark's declarative form — `aggregate(zip_with(a, b, _*_), 0d, _+_)`
  * — is correct but runs on `CodegenFallback` (both ZipWith and
  * ArrayAggregate are interpreted per element, with a lambda-variable
  * write per step and an intermediate product array). These
  * expressions are the tier-(b) custom-Catalyst path from the build
  * rules: one fused, codegen'd loop over the two arrays, no
  * allocation.
  *
  * Semantics match the declarative form bit-for-bit: sequential
  * left-to-right fold (i = 0..n-1), `dot/(sqrt(dot_aa)*sqrt(dot_bb))`
  * shape for cosine — so DuckDB oracles built for the HOF form remain
  * valid verbatim.
  */
abstract class VectorBinaryExpression extends BinaryExpression
    with Serializable {
  // checkInputDataTypes instead of ExpectsInputTypes: AbstractDataType
  // is private[sql], so a third-party expression validates manually.
  // Each side is independently array<double> OR array<float> — the
  // float leg halves embedding bytes on every ANN / semantic-dedup
  // scan and shuffle (what embedding models actually emit); arithmetic
  // always accumulates in double, so float≡double ranking holds to
  // within per-element widening.
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType | FloatType, _),
            ArrayType(DoubleType | FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<double>/array<float> arguments, got $l and $r")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Interpreted-path element read, widened to double. */
  protected def elem(e: Expression, a: ArrayData, i: Int): Double =
    elemType(e) match {
      case FloatType => a.getFloat(i).toDouble
      case _ => a.getDouble(i)
    }

  /** Codegen element read, widened to double. */
  protected def elemCode(e: Expression, arr: String, i: String): String =
    elemType(e) match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
}

/** Sequential-fold dot product; null if lengths differ or any element
  * is null (mirrors zip_with's null propagation discipline strictly
  * enough for our pipelines, where vectors are dense).
  */
case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += elem(left, x, i) * elem(right, y, i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${elemCode(left, x, i)} * ${elemCode(right, y, i)};
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity with the exact arithmetic shape
  * `dot / (sqrt(dot_aa) * sqrt(dot_bb))`, single fused loop computing
  * all three accumulators.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = elem(left, x, i)
      val yi = elem(right, y, i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xi = ${elemCode(left, x, i)};
         |    final double $yi = ${elemCode(right, y, i)};
         |    $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points via the registered SQL functions (the
  * Column↔Expression bridge is private[sql] in Spark 4) — requires
  * [[graft.extensions.GraftExtensions]] on the session.
  */
object VectorExpressions {
  def dotProduct(a: Column, b: Column): Column =
    call_function("dot_product", a, b)

  def cosineSim(a: Column, b: Column): Column =
    call_function("cosine_sim", a, b)
}
