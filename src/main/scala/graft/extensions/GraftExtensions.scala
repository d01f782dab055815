package graft.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.expressions.{BloomAnyContain, BloomShingleContain, CdcChunks, CosineSimilarity, DotProduct, MultiOccCount, NfcNormalize}

/** Catalyst rule: rewrite the declarative dot-product pattern
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)
  *
  * into the fused, codegen'd [[DotProduct]] — queries stay written
  * against stock Spark HOFs (portable, oracle-mirrorable) and the
  * optimizer supplies the fast path.
  *
  * Float legs are covered too: when either array is `array<float>`,
  * the analyzer wraps the lambda variables in `Cast(_, double)` (mixed
  * sides — inside the multiply; float×float — around the aggregate's
  * element variable, with the product computed in FLOAT). The rewrite
  * maps all of these to [[DotProduct]], which widens each ELEMENT to
  * double before multiplying. For double and mixed inputs that is
  * bit-exact with the HOF fold; for float×float it deliberately
  * UPGRADES the per-element product from float to double precision —
  * the arithmetic every oracle (and the double leg) defines. Keeping
  * float arrays through the plan while the rule guarantees double
  * arithmetic is what lets ANN operators shuffle 4-byte elements.
  *
  * Matches only the exact shape (multiply lambda, 0.0 seed, add
  * accumulator, identity finish) — anything else is left alone.
  */
object NativeDotProductRule extends Rule[LogicalPlan] {

  /** A lambda variable, bare or widened `float → double` by coercion. */
  private object WidenedVar {
    def unapply(e: Expression): Option[NamedLambdaVariable] = e match {
      case v: NamedLambdaVariable => Some(v)
      case Cast(v: NamedLambdaVariable, DoubleType, _, _) => Some(v)
      case _ => None
    }
  }

  private object DotProductPattern {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(Multiply(WidenedVar(x1), WidenedVar(y1), _), Seq(x2, y2), _)),
          Literal(0.0, _),
          LambdaFunction(Add(acc1: NamedLambdaVariable, WidenedVar(v1), _), Seq(acc2, v2), _),
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
      new FunctionIdentifier("multi_occ_count"),
      new ExpressionInfo(classOf[MultiOccCount].getName, "multi_occ_count"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.util.ArrayData
        import org.apache.spark.sql.types.{ArrayType, StringType}
        // any FOLDABLE string-array works: a Literal from the Scala
        // API, or the CreateArray that SQL text `array('a','b')`
        // parses to — both eval() to ArrayData at resolution time
        args(1) match {
          case e if e.foldable && (e.dataType match {
            case ArrayType(StringType, _) => true
            case _ => false
          }) =>
            val a = e.eval()
            require(a != null,
              "multi_occ_count: needle array must not be null")
            MultiOccCount(args(0),
              a.asInstanceOf[ArrayData].toObjectArray(StringType)
                .map(_.toString).toSeq)
          case other => throw new IllegalArgumentException(
            s"multi_occ_count(text, needles) needs a foldable string " +
              s"needle array, got $other")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        (args(1), args(2)) match {
          case (Literal(w: Int, _), Literal(d: Int, _)) =>
            CdcChunks(args(0), w, d)
          case other => throw new IllegalArgumentException(
            s"cdc_chunks(toks, w, divisor) needs literal int w/divisor, " +
              s"got $other")
        }
      }))
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
