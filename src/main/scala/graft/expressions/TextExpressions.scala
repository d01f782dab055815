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

/** Column-API entry point via the registered SQL function — requires
  * [[graft.extensions.GraftExtensions]] on the session.
  */
object TextExpressions {
  def nfcNormalize(c: Column): Column = call_function("nfc_normalize", c)
}
