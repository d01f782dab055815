package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.expressions.{BloomAnyContain, BloomShingleContain, CosineSimilarity, DotProduct, NfcNormalize}

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
    ext.injectFunction((
      new FunctionIdentifier("bloom_any_contain"),
      new ExpressionInfo(classOf[BloomAnyContain].getName,
        "bloom_any_contain"),
      (args: Seq[Expression]) => {
        // bitset + sizing arrive as literals (see BloomExpressions);
        // unwrap ONCE at resolution so the expression holds a plain
        // long[] — never per-row literal traversal
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.catalyst.util.ArrayData
        (args(1), args(2), args(3)) match {
          case (Literal(w: ArrayData, _), Literal(m: Int, _),
                Literal(k: Int, _)) =>
            BloomAnyContain(args(0), w.toLongArray(), m, k)
          case other => throw new IllegalArgumentException(
            s"bloom_any_contain(arr, bits, mBits, numHashes) needs " +
              s"literal bits/sizes, got $other")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_shingle_contain"),
      new ExpressionInfo(classOf[BloomShingleContain].getName,
        "bloom_shingle_contain"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.catalyst.util.ArrayData
        (args(1), args(2), args(3), args(4)) match {
          case (Literal(k: Int, _), Literal(w: ArrayData, _),
                Literal(m: Int, _), Literal(nh: Int, _)) =>
            BloomShingleContain(args(0), k, w.toLongArray(), m, nh)
          case other => throw new IllegalArgumentException(
            s"bloom_shingle_contain(text, k, bits, mBits, numHashes) " +
              s"needs literal k/bits/sizes, got $other")
        }
      }))
    ext.injectOptimizerRule(_ => NativeDotProductRule)
    // opt-in: spark.graft.pivotRewrite=true (see JoinChainToPivotRule)
    ext.injectOptimizerRule(_ => JoinChainToPivotRule)
    // per-group top-k: row_number window + rank filter → bounded-heap
    // operator (graft.plans.GroupedTopK); exact-shape match, always on
    ext.injectOptimizerRule(_ => graft.plans.GroupedTopKRule)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
  }
}
