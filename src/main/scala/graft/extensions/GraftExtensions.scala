package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.expressions.{CosineSimilarity, DotProduct, NfcNormalize}

/** Catalyst rule: rewrite the declarative dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the fused, codegen'd [[DotProduct]] — queries stay written
  * against stock Spark HOFs (portable, oracle-mirrorable) and the
  * optimizer supplies the fast path. Bit-exact: both forms fold
  * left-to-right in index order, and 0.0 + x == x.
  *
  * Matches only the exact shape (multiply lambda, 0.0 seed, add
  * accumulator, identity finish) — anything else is left alone.
  */
object NativeDotProductRule extends Rule[LogicalPlan] {

  private object DotProductPattern {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(x1: NamedLambdaVariable, y1: NamedLambdaVariable, _), Seq(x2, y2), _)),
          Literal(0.0, _),
          LambdaFunction(Add(acc1: NamedLambdaVariable, v1: NamedLambdaVariable, _), Seq(acc2, v2), _),
          LambdaFunction(fin: NamedLambdaVariable, Seq(fin2), _))
          if x1.exprId == x2.asInstanceOf[NamedLambdaVariable].exprId &&
            y1.exprId == y2.asInstanceOf[NamedLambdaVariable].exprId &&
            acc1.exprId == acc2.asInstanceOf[NamedLambdaVariable].exprId &&
            v1.exprId == v2.asInstanceOf[NamedLambdaVariable].exprId &&
            fin.exprId == fin2.asInstanceOf[NamedLambdaVariable].exprId =>
        Some((a, b))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DotProductPattern(a, b) => DotProduct(a, b)
    }
}

/** SparkSessionExtensions entry point: SQL-registered native functions
  * (`dot_product`, `cosine_sim`) + the dot-product rewrite rule.
  * Activate with
  * `spark.sql.extensions=graft.extensions.GraftExtensions` or
  * `builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => NfcNormalize(args.head)))
    ext.injectOptimizerRule(_ => NativeDotProductRule)
    // opt-in: spark.graft.pivotRewrite=true (see JoinChainToPivotRule)
    ext.injectOptimizerRule(_ => JoinChainToPivotRule)
    // per-group top-k: row_number window + rank filter → bounded-heap
    // operator (graft.plans.GroupedTopK); exact-shape match, always on
    ext.injectOptimizerRule(_ => graft.plans.GroupedTopKRule)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
  }
}
