package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Last}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: recognize the window-idiom backward as-of pattern and
  * rewrite it into the native [[AsOfJoinNode]], so users writing the
  * idiomatic "union the streams, carry the last marker row forward"
  * form get the O(n+m) merge-join exec for free (the same
  * user-writes-the-idiom, engine-supplies-the-native-operator contract
  * as [[graft.functions.VecDotNormRewrite]]).
  *
  * By the time optimizer rules run, the analyzer has hoisted each
  * `last(CASE WHEN type = 'marker' THEN v END) IGNORE NULLS` into a
  * `_w0` projection below its Window, and multiple withColumn windows
  * stay as separate Window nodes with interleaved Projects. So the rule
  * matches a Filter over an alternating Window/Project CHAIN and
  * resolves every project alias transitively down to the chain's base:
  * {{{
  *   Filter(typeCol = 'purchase' [AND ...],
  *     Window([last(_w0, true) OVER (PARTITION BY key ORDER BY t [,tb]
  *              ROWS UNBOUNDED PRECEDING..CURRENT ROW) AS out], ...
  *       Project([... CASE WHEN typeCol = 'marker' THEN v END AS _w0], ...
  *         base)))
  * }}}
  * becomes
  * {{{
  *   Project(<original output, window outs re-aliased>,
  *     AsOfJoin(Filter(typeCol = 'purchase' [AND ...], base),
  *              Project([key', t', v'...], Filter(typeCol = 'marker', base)),
  *              key = key', t' <= t))
  * }}}
  * which plans as one shuffle per side + a linear partition-local merge
  * instead of shuffling the unioned stream through window buffers.
  *
  * Exactness: the filter marker and window marker must be DIFFERENT
  * literals on the same column, so left rows never contribute to the
  * carried value. Extra orderSpec columns beyond the time — the
  * tiebreakers a user writes to pin a total order across rows tied on
  * (key, time) — are carried into [[AsOfJoinNode]] as lexicographic
  * tiebreak columns, so the as-of merge compares the SAME
  * (time, tie1, …) tuple the window sorted by and the rewrite stays
  * exact even when a marker row ties a filtered row on (key, time).
  * Tiebreakers that are not ascending-nulls-first or don't resolve to
  * base columns decline the rewrite rather than approximate it.
  *
  * Guards (any miss ⇒ no rewrite, negative-case-tested in
  * AsOfJoinSpec): every window expression in the chain is the
  * last-ignoreNulls-case-when shape over one shared
  * (marker, key, time, ties); a single partition key resolving to a
  * base attribute; ascending LongType time; ascending-nulls-first
  * deterministic tiebreakers; deterministic projections only; the
  * filter predicate and all carried values resolve to base columns (no
  * window output feeding another window or the filter).
  */
object AsOfWindowRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** One matched window output: original alias + the as-of quadruple
    * (+ the orderSpec tail as resolved tiebreak expressions). */
  private case class AsOfOut(
      alias: Alias,
      typeAttr: Attribute,
      typeLit: Literal,
      partKey: Attribute,
      timeExpr: Expression,
      ties: Seq[Expression],
      value: Expression)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, top: Window) =>
      rewrite(cond, top).getOrElse(f)
  }

  private def rewrite(cond: Expression, top: Window): Option[LogicalPlan] = {
    // 1. peel the Window/Project chain down to its base
    val chain = mutable.ArrayBuffer[LogicalPlan]()
    var cur: LogicalPlan = top
    var peeling = true
    while (peeling) cur match {
      case w: Window if w.windowExpressions.nonEmpty =>
        chain += w; cur = w.child
      case p: Project if p.projectList.forall(_.deterministic) =>
        chain += p; cur = p.child
      case _ => peeling = false
    }
    val base = cur

    // 2. walk bottom-up resolving project aliases to base expressions and
    //    matching every window expression against the as-of shape
    val defs = mutable.HashMap[ExprId, Expression]()
    val windowIds = mutable.HashSet[ExprId]()
    val outs = mutable.ArrayBuffer[AsOfOut]()
    def subst(e: Expression): Expression = e.transformUp {
      case a: Attribute if defs.contains(a.exprId) => defs(a.exprId)
    }
    for (layer <- chain.reverseIterator) layer match {
      case p: Project =>
        p.projectList.foreach {
          case a: Alias => defs(a.exprId) = subst(a.child)
          case _ => // pass-through attribute
        }
      case w: Window =>
        w.windowExpressions.foreach {
          case a @ Alias(
              WindowExpression(
                AggregateExpression(Last(lastChild, true), _, false, None, _),
                WindowSpecDefinition(Seq(pk0), orderSpec,
                  SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)
              if orderSpec.nonEmpty && orderSpec.head.direction == Ascending &&
                // tiebreakers: user-pinned total order across (key,time)
                // ties — carried into the join, so they must be the
                // default ascending-nulls-first the merge reproduces
                orderSpec.tail.forall(so =>
                  so.direction == Ascending && so.nullOrdering == NullsFirst) =>
            val ties = orderSpec.tail.map(so => subst(so.child))
            val out = (subst(lastChild), subst(pk0), subst(orderSpec.head.child)) match {
              case (CaseWhen(Seq((c, value)), None), pk: Attribute, time) =>
                c match {
                  case EqualTo(ta: Attribute, tl: Literal) =>
                    Some(AsOfOut(a, ta, tl, pk, time, ties, value))
                  case EqualTo(tl: Literal, ta: Attribute) =>
                    Some(AsOfOut(a, ta, tl, pk, time, ties, value))
                  case _ => None
                }
              case _ => None
            }
            if (out.isEmpty) return None
            outs += out.get
            windowIds += a.exprId
          case _ => return None
        }
    }
    if (outs.isEmpty) return None

    // 3. coherence + safety guards
    val head = outs.head
    val coherent = outs.forall(o =>
      o.typeAttr.exprId == head.typeAttr.exprId &&
        o.typeLit.semanticEquals(head.typeLit) &&
        o.partKey.exprId == head.partKey.exprId &&
        o.timeExpr.semanticEquals(head.timeExpr) &&
        o.ties.length == head.ties.length &&
        o.ties.zip(head.ties).forall { case (x, y) => x.semanticEquals(y) })
    if (!coherent) return None
    if (head.timeExpr.dataType != LongType || !head.timeExpr.deterministic) return None
    val baseIds = base.outputSet
    if (!head.typeAttr.references.subsetOf(baseIds) ||
      !head.partKey.references.subsetOf(baseIds) ||
      !head.timeExpr.references.subsetOf(baseIds)) return None
    if (!head.ties.forall(t => t.deterministic && t.references.subsetOf(baseIds)))
      return None
    if (!outs.forall(o => o.value.deterministic && o.value.references.subsetOf(baseIds)))
      return None
    val condSub = subst(cond)
    if (!condSub.deterministic || !condSub.references.subsetOf(baseIds)) return None
    // the filter must pin the marker column to a DIFFERENT literal than
    // the window marker — that disjointness makes dropping the left rows
    // from the carried-value stream safe
    val pinned = splitConjunctivePredicates(condSub).collectFirst {
      case EqualTo(a: Attribute, l: Literal) if a.exprId == head.typeAttr.exprId => l
      case EqualTo(l: Literal, a: Attribute) if a.exprId == head.typeAttr.exprId => l
    }
    if (!pinned.exists(l => !l.semanticEquals(head.typeLit))) return None

    // 4. build the join (tiebreakers project through the right side so
    //    the merge can compare the full (time, ties…) tuple)
    val left = Filter(condSub, base)
    val rightKey = Alias(head.partKey, "__asof_key")()
    val rightTime = Alias(head.timeExpr, "__asof_time")()
    val rightTies = head.ties.zipWithIndex.map { case (t, i) => Alias(t, s"__asof_tie$i")() }
    val rightVals = outs.map(o => Alias(o.value, s"__asof_${o.alias.name}")())
    val right = Project(rightKey +: rightTime +: (rightTies ++ rightVals.toSeq),
      Filter(EqualTo(head.typeAttr, head.typeLit), base))
    val join = AsOfJoinNode(left, right,
      head.partKey, rightKey.toAttribute, head.timeExpr, rightTime.toAttribute,
      head.ties, rightTies.map(_.toAttribute))

    // 5. reproduce the chain top's exact output (names + exprIds): base
    //    columns pass through the left side, project aliases are
    //    recomputed over base, window outputs map to the right-side values
    val valueByWindowId = outs.zip(rightVals)
      .map { case (o, v) => o.alias.exprId -> v }.toMap
    val restored: Seq[NamedExpression] = top.output.map { attr =>
      valueByWindowId.get(attr.exprId) match {
        case Some(v) =>
          Alias(v.toAttribute.withNullability(true), attr.name)(exprId = attr.exprId)
        case None if defs.contains(attr.exprId) =>
          Alias(defs(attr.exprId), attr.name)(exprId = attr.exprId)
        case None => attr
      }
    }
    // every restored expression must be computable from the join output
    val allowed = AttributeSet(left.output) ++ AttributeSet(rightVals.map(_.toAttribute))
    if (!restored.forall(_.references.subsetOf(allowed))) return None
    Some(Project(restored, join))
  }
}
