package graft.extensions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.First
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule for the reference's N-sequential-left-join view
  * pattern (SURVEY.md §4 "possible custom additions"): a chain
  *
  *   ((spine ⟕ A₁) ⟕ A₂) … ⟕ Aₙ      n ≥ 2
  *
  * where every right side Aᵢ is an Aggregate grouped EXACTLY on its
  * join keys (so each join is 1:≤1 and the rewrite is semantics-
  * preserving, including null-key and missing-key behavior), becomes
  *
  *   spine ⟕ pivot( A₁ ∪tag A₂ ∪tag … )
  *
  * — one join and one union-aggregate instead of n joins. Every
  * original output attribute (each Aᵢ's keys AND measure) is rebuilt
  * as first(when(tag = i, …), ignoreNulls) with its ORIGINAL exprId,
  * so unmatched members still yield NULLs exactly like the left joins
  * did and downstream references resolve untouched.
  *
  * Opt-in via `spark.graft.pivotRewrite=true`: the engine's own view
  * assembly already emits the pivot shape directly
  * (graft.operators.Relational.wideViewPivot); this rule exists for
  * plans a user writes join-by-join. Kept off by default so the
  * q_multijoin ≡ q_pivot differential check continues to compare two
  * genuinely different plans.
  */
object JoinChainToPivotRule extends Rule[LogicalPlan] {

  /** One peeled chain link: the aggregate member and its join keys
    * (left attr in spine, right attr in the aggregate's output).
    */
  private case class Link(agg: Aggregate, keyPairs: Seq[(Attribute, Attribute)])

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** Decompose a join condition into attr = attr pairs oriented as
    * (left-side attr, right-side attr); None if anything else appears.
    */
  private def keyPairsOf(cond: Expression, leftOut: AttributeSet,
                         rightOut: AttributeSet)
      : Option[Seq[(Attribute, Attribute)]] = {
    val pairs = splitConjuncts(cond).map {
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if leftOut.contains(l) && rightOut.contains(r) => Some((l, r))
      case EqualTo(l: AttributeReference, r: AttributeReference)
          if rightOut.contains(l) && leftOut.contains(r) => Some((r, l))
      case _ => None
    }
    if (pairs.forall(_.isDefined)) Some(pairs.flatten) else None
  }

  /** An Aggregate usable as a chain member: the join keys must map —
    * through the aggregate's output list, which typically ALIASES the
    * grouping attributes — onto exactly the full set of grouping
    * expressions (uniqueness per join key ⇒ the left join is 1:≤1).
    */
  private def eligibleMember(agg: Aggregate,
                             rightKeys: Seq[Attribute]): Boolean = {
    val underlying: Map[ExprId, Expression] = agg.aggregateExpressions.map {
      case a @ Alias(child, _) => a.exprId -> child
      case other => other.exprId -> (other: Expression)
    }.toMap
    val groupIds = agg.groupingExpressions.flatMap {
      case a: AttributeReference => Some(a.exprId)
      case _ => None
    }
    if (groupIds.size != agg.groupingExpressions.size) return false
    val keyGroupIds = rightKeys.map(k => underlying.get(k.exprId) match {
      case Some(a: AttributeReference) if groupIds.contains(a.exprId) =>
        Some(a.exprId)
      case _ => None
    })
    keyGroupIds.forall(_.isDefined) &&
      keyGroupIds.flatten.toSet == groupIds.toSet &&
      rightKeys.map(_.exprId).distinct.size == rightKeys.size
  }

  /** Peel a left-outer aggregate-join chain bottom-up. Returns the
    * spine and the links in join order once no deeper match exists.
    * Descends through pure attribute Projects (ColumnPruning inserts
    * them between joins).
    */
  private def peel(plan: LogicalPlan): (LogicalPlan, Seq[Link]) = plan match {
    case Join(left, agg: Aggregate, LeftOuter, Some(cond), _) =>
      keyPairsOf(cond, left.outputSet, agg.outputSet) match {
        case Some(pairs) if pairs.nonEmpty &&
            // distinct LEFT keys too: spine.k = m.k1 AND spine.k = m.k2
            // would collapse to one mapping and silently drop an
            // equality constraint in the rebuilt join
            pairs.map(_._1.exprId).distinct.size == pairs.size &&
            eligibleMember(agg, pairs.map(_._2)) =>
          val (spine, below) = peel(left)
          // every left key must come from the shared spine, and every
          // link must use the same left key set in the same order
          val sameKeys = below.isEmpty ||
            below.head.keyPairs.map(_._1.exprId) == pairs.map(_._1.exprId)
          if (sameKeys && pairs.map(_._1).forall(spine.outputSet.contains))
            (spine, below :+ Link(agg, pairs))
          else (plan, Nil)
        case _ => (plan, Nil)
      }
    case p @ Project(list, child)
        if list.forall(_.isInstanceOf[AttributeReference]) =>
      val (spine, links) = peel(child)
      if (links.nonEmpty) (spine, links) else (p, Nil)
    case other => (other, Nil)
  }

  private def rewrite(top: LogicalPlan, spine: LogicalPlan,
                      links: Seq[Link]): LogicalPlan = {
    val leftKeys = links.head.keyPairs.map(_._1)
    val m = leftKeys.size

    // union branches: each member projected to [k_0..k_{m-1}, member
    // outputs as a fixed-width payload, tag]. Payload width = max
    // member output arity; a slot's union type is the first member
    // type seen for it, other members cast (per-member originals are
    // restored by the pivot's final cast), absent slots null literals.
    val payloadWidth = links.map(_.agg.output.size).max
    val slotTypes = (0 until payloadWidth).map { j =>
      links.flatMap(l => l.agg.output.lift(j)).map(_.dataType).headOption
        .getOrElse(org.apache.spark.sql.types.NullType)
    }
    val castBranches = links.zipWithIndex.map { case (Link(agg, pairs), i) =>
      val keyByLeft = pairs.map { case (l, r) => l.exprId -> r }.toMap
      val keyCols = leftKeys.zipWithIndex.map { case (lk, j) =>
        Alias(Cast(keyByLeft(lk.exprId), lk.dataType), s"__k$j")()
      }
      val payload = (0 until payloadWidth).map { j =>
        val e: Expression = agg.output.lift(j) match {
          case Some(a) if a.dataType == slotTypes(j) => a
          case Some(a) => Cast(a, slotTypes(j))
          case None => Literal(null, slotTypes(j))
        }
        Alias(e, s"__p$j")()
      }
      Project(keyCols ++ payload :+ Alias(Literal(i, IntegerType), "__tag")(),
        agg)
    }
    val union = Union(castBranches)
    val uKeys = union.output.take(m)
    val uPayload = union.output.slice(m, m + payloadWidth)
    val uTag = union.output.last

    // pivot aggregate: group on the common keys; every original member
    // output attribute is first(when(tag = i, slot)) with its original
    // exprId — unmatched members become NULL, like the left join
    val pivoted = links.zipWithIndex.flatMap { case (Link(agg, _), i) =>
      agg.output.zipWithIndex.map { case (orig, j) =>
        val picked = If(EqualTo(uTag, Literal(i, IntegerType)),
          uPayload(j), Literal(null, slotTypes(j)))
        val firstAgg: Expression = First(picked, ignoreNulls = true)
          .toAggregateExpression()
        val restored =
          if (slotTypes(j) == orig.dataType) firstAgg
          else Cast(firstAgg, orig.dataType)
        Alias(restored, orig.name)(exprId = orig.exprId)
      }
    }
    val pivot = Aggregate(uKeys, (uKeys: Seq[NamedExpression]) ++ pivoted,
      union)

    val joinCond = leftKeys.zip(uKeys)
      .map { case (l, k) => EqualTo(l, k): Expression }
      .reduce(And)
    val joined = Join(spine, pivot, LeftOuter, Some(joinCond), JoinHint.NONE)
    // trim to exactly the replaced node's output (drops the __k keys)
    Project(top.output, joined)
  }

  /** Members must agree on the output TYPE at every payload slot:
    * coercing member 2's double through member 1's decimal slot and
    * back would silently round — when slots disagree, the chain keeps
    * its joins.
    */
  private def slotTypesAligned(links: Seq[Link]): Boolean = {
    val width = links.map(_.agg.output.size).max
    (0 until width).forall { j =>
      links.flatMap(_.agg.output.lift(j)).map(_.dataType).distinct.size <= 1
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.pivotRewrite", "false").toBoolean)
      plan
    else plan.transformDown {
      case j: Join =>
        val (spine, links) = peel(j)
        if (links.size >= 2 && slotTypesAligned(links))
          rewrite(j, spine, links)
        else j
    }
}
