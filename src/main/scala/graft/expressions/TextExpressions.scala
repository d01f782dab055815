package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native, codegen'd expression.
  *
  * Spark has no built-in normalizer, and a Scala UDF would pay
  * serialization + break whole-stage codegen. `java.text.Normalizer`
  * is already on every JVM executor, so the generated code calls it
  * directly inside the codegen span — the same tier-(b) pattern as
  * [[DotProduct]]. The quick-check in `Normalizer.isNormalized` makes
  * the already-NFC fast path (virtually all real text) a scan without
  * allocation.
  *
  * DuckDB mirrors this exactly via `nfc_normalize(...)`, so the
  * operator is oracle-checkable bit-for-bit.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with Serializable {

  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) {
      input
    } else {
      UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |final String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** One-pass multi-needle occurrence counter: counts NON-OVERLAPPING
  * occurrences of every literal needle in a single traversal setup —
  * one `toString` materialization and N `indexOf` scans, versus the
  * `replace`-based portable form's N full string COPIES per row
  * (25 marker needles × corpus text = gigabytes of churn at sf0.1;
  * measured 2× on q_langid). Count semantics are exactly
  * `(len(s) − len(replace(s, needle, ''))) / len(needle)` — the
  * left-to-right greedy non-overlapping count the oracle's replace
  * formula computes — so swapping this in changes no result anywhere.
  *
  * Needles arrive as a LITERAL array and are unwrapped once at
  * resolution ([[graft.extensions.GraftExtensions]]); the generated
  * code is one static call, keeping the codegen method tiny no matter
  * how many needles.
  */
case class MultiOccCount(child: Expression, needles: Seq[String])
    extends UnaryExpression with Serializable {
  // Seq, not Array: case-class equality must be STRUCTURAL or two
  // separately-built instances never canonicalize equal — killing
  // subexpression elimination, exchange reuse, and plan-keyed memo
  // hits for any plan containing this expression
  require(needles.nonEmpty && needles.forall(_.nonEmpty),
    "multi_occ_count needles must be non-empty strings")

  private lazy val needleArr: Array[String] = needles.toArray

  override def prettyName: String = "multi_occ_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got $t")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    MultiOccCount.count(input.asInstanceOf[UTF8String], needleArr)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val ref = ctx.addReferenceObj("needles", needleArr,
        "java.lang.String[]")
      s"${ev.value} = graft.expressions.MultiOccCount.count($c, $ref);"
    })

  override protected def withNewChildInternal(newChild: Expression): MultiOccCount =
    copy(child = newChild)
}

object MultiOccCount {
  /** Static worker the generated code calls. */
  def count(s: UTF8String,
            needles: Array[String]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString
    val out = new Array[Int](needles.length)
    var i = 0
    while (i < needles.length) {
      val n = needles(i)
      // defense in depth: an empty needle would never advance idx
      var idx = if (n.isEmpty) -1 else str.indexOf(n)
      var c = 0
      while (idx >= 0) {
        c += 1
        idx = str.indexOf(n, idx + n.length) // greedy non-overlapping
      }
      out(i) = c
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Column-API entry point via the registered SQL function — requires
  * [[graft.extensions.GraftExtensions]] on the session.
  */
object TextExpressions {
  def nfcNormalize(c: Column): Column = call_function("nfc_normalize", c)

  def multiOccCount(c: Column, needles: Seq[String]): Column =
    call_function("multi_occ_count", c,
      org.apache.spark.sql.functions.lit(needles.toArray))
}
