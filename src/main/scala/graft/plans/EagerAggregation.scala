package graft.plans

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, EqualTo, ExprId, Expression, Literal, NamedExpression, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** A fact table licensed for eager aggregation on `fkCol`: a measured
  * audit found the fact's distinct-`fkCol` count to be a small
  * fraction of its row count, so grouping the fact by the join key
  * BEFORE a join on that key shrinks what crosses the join (and, at
  * cluster scale, the exchange feeding it) by that measured ratio.
  * Like [[VerifiedFkJoin]] this is a data-derived license, not a
  * declared constraint.
  */
case class EagerAggFact(factPathMarker: String, fkCol: String)

/** Eager aggregation (Yan & Larson, VLDB'94): push a partial
  * group-by below a join.
  *
  * `Aggregate(G, F, fact ⋈ dim)` becomes
  * `Aggregate(G, F', Aggregate(K ∪ G_fact, partials, fact) ⋈ dim)`
  * where K is the fact side of the equi-join keys and G_fact the
  * fact-side group columns. Exact for any INNER equi-join — no FK
  * integrity needed — because the join duplicates a pre-aggregated
  * group exactly as many times as it would duplicate each of the
  * group's rows (per-key dim multiplicity m(k) is constant across a
  * key): SUM re-associates over the m(k) copies, COUNT(n) re-sums,
  * MIN/MAX are duplication-blind. Keys with no dim match drop in
  * both spellings; NULL join keys never match in either. The final
  * aggregate therefore recomputes the same answer from partials —
  * the oracle hash-match of the x31 query is that proof run on data.
  *
  * Trigger (each condition load-bearing):
  *   - INNER join, condition a conjunction of attr = attr equalities
  *     pairing the two sides;
  *   - one side contains a registered [[EagerAggFact]] relation and
  *     its licensed `fkCol` is among that side's join keys (the
  *     measured-profitability gate — correctness holds regardless,
  *     but a rewrite that doesn't shrink the exchange just adds an
  *     aggregate);
  *   - every aggregate function reads only fact-side columns (or
  *     literals) and is decomposable with no DISTINCT / FILTER:
  *     SUM → SUM of partial sums, COUNT → SUM of partial counts,
  *     MIN/MAX → themselves;
  *   - group keys are plain columns (either side);
  *   - the fact side is not itself already aggregated (stops the
  *     fixpoint re-firing on its own output).
  *
  * At 100 TB this is THE join optimization for fact-to-dimension
  * rollups: the join and its shuffle see |distinct keys| rows
  * instead of |fact| — here a measured 600× reduction (600k lineitem
  * rows → 1000 supplier keys) — and a join that wasn't broadcastable
  * becomes one. Spark has no such rule (SPARK-36183 is open);
  * warehouses (DB2, SQL Server) ship it.
  */
object EagerAggregation extends Rule[LogicalPlan] with PredicateHelper {

  /** Licenses are scoped to the REGISTERING application (value =
    * app id): a license is a measured statement about the data that
    * each application re-verifies for itself ([[Extensions]]'
    * fkAuditMemo is per-appId), so a stale one must not fire in a
    * later session of the same JVM.
    */
  private val registry = new java.util.concurrent
    .ConcurrentHashMap[EagerAggFact, String]()

  private def activeAppId: String =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.applicationId).getOrElse("")

  def register(lic: EagerAggFact): Unit =
    registry.put(lic, activeAppId)
  def unregister(lic: EagerAggFact): Unit = registry.remove(lic)
  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(_, _, j: Join, _) =>
        rewrite(agg, j).getOrElse(agg)
      // the optimizer's column pruning leaves an attribute-only
      // Project over the join; it is safe to look through (and drop —
      // the partial aggregate prunes the fact side harder than the
      // Project did, and the final aggregate keeps only its own
      // output either way)
      case agg @ Aggregate(_, _, Project(pl, j: Join), _)
          if pl.forall(_.isInstanceOf[AttributeReference]) =>
        rewrite(agg, j).getOrElse(agg)
    }

  private def pathOf(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
    case _ => Nil
  }

  /** All attrs read by aggregate functions in `exprs`. */
  private def aggInputRefs(exprs: Seq[NamedExpression]): Seq[Attribute] =
    exprs.flatMap(_.collect { case ae: AggregateExpression => ae })
      .flatMap(_.references.toSeq)

  private def decomposable(ae: AggregateExpression): Boolean =
    !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
      case _: Sum | _: Min | _: Max | _: Count => true
      case _ => false
    })

  /** The column under a join key: a bare attribute, or one inside a
    * type-coercion Cast (e.g. int fk = bigint pk). Pre-aggregating by
    * the RAW attribute is exact for any deterministic cast — it
    * groups at least as fine as the join-key equivalence, and the
    * final aggregate re-merges per group key.
    */
  private def keyAttr(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case c: Cast => c.child match {
      case a: AttributeReference => Some(a)
      case _ => None
    }
    case _ => None
  }

  private def rewrite(agg: Aggregate, j: Join): Option[LogicalPlan] = {
    val Join(l, r, joinType, condOpt, _) = j
    if (joinType != Inner) return None
    val cond = condOpt.getOrElse(return None)
    // equi pairs, one (possibly cast) attr per side
    val pairs: Seq[(Expression, Expression)] =
      splitConjunctivePredicates(cond).map {
        case EqualTo(a, b)
            if keyAttr(a).isDefined && keyAttr(b).isDefined => (a, b)
        case _ => return None
      }
    if (!agg.groupingExpressions.forall(_.isInstanceOf[AttributeReference]))
      return None
    val aggExprs =
      agg.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression => ae
      })
    if (aggExprs.isEmpty || !aggExprs.forall(decomposable)) return None

    Seq((l, true), (r, false)).flatMap { case (fact, factIsLeft) =>
      val factKeys = pairs.map { case (a, b) =>
        val (aa, ba) = (keyAttr(a).get, keyAttr(b).get)
        if (fact.outputSet.contains(aa) && !fact.outputSet.contains(ba)) aa
        else if (fact.outputSet.contains(ba) &&
          !fact.outputSet.contains(aa)) ba
        else return None
      }
      val app = activeAppId
      val licensed = registry.asScala.exists { case (lic, owner) =>
        owner == app && fact.collectFirst {
          case lr: LogicalRelation
            if pathOf(lr).exists(_.contains(lic.factPathMarker)) => lr
        }.exists(lr => lr.output.exists(o =>
          o.name == lic.fkCol && factKeys.exists(_.semanticEquals(o))))
      }
      if (!licensed || fact.exists(_.isInstanceOf[Aggregate]) ||
          !aggInputRefs(agg.aggregateExpressions)
            .forall(fact.outputSet.contains))
        None
      else Some(build(agg, j, fact, factIsLeft, factKeys))
    }.headOption
  }

  private def build(agg: Aggregate, j: Join, fact: LogicalPlan,
      factIsLeft: Boolean,
      factKeys: Seq[AttributeReference]): LogicalPlan = {
    val factGroupAttrs = agg.groupingExpressions.collect {
      case a: AttributeReference if fact.outputSet.contains(a) => a
    }
    val seen = mutable.Set[ExprId]()
    val partialKeys =
      (factKeys ++ factGroupAttrs).filter(a => seen.add(a.exprId))

    // one partial column per distinct aggregate expression
    val partialFor = mutable.LinkedHashMap[Expression, Alias]()
    agg.aggregateExpressions.foreach(_.foreach {
      case ae: AggregateExpression
        if !partialFor.contains(ae.canonicalized) =>
        partialFor(ae.canonicalized) =
          Alias(ae, s"geag_${partialFor.size}")()
      case _ =>
    })
    val partial = Aggregate(partialKeys,
      (partialKeys: Seq[NamedExpression]) ++ partialFor.values.toSeq, fact)

    val newJoin =
      if (factIsLeft) j.copy(left = partial) else j.copy(right = partial)

    // transformUp: a top-down transform would descend into the
    // replacement and re-match the freshly built Sum(partial)
    val newResult = agg.aggregateExpressions.map(_.transformUp {
      case ae: AggregateExpression =>
        val pa = partialFor(ae.canonicalized).toAttribute
        val f = ae.aggregateFunction match {
          case _: Sum => Sum(pa)
          case _: Min => Min(pa)
          case _: Max => Max(pa)
          case _: Count => Sum(pa) // count of join rows = Σ partial counts
        }
        val nae = AggregateExpression(f, Complete, isDistinct = false)
        // Sum-of-Sum widens decimals; restore the original result type
        val merged: Expression =
          if (nae.dataType == ae.dataType) nae
          else Cast(nae, ae.dataType)
        ae.aggregateFunction match {
          // COUNT over zero join rows is 0, but Σ partial counts over
          // an empty input is NULL — visible when the final aggregate
          // is global (no group keys, always one output row). For
          // grouped output a group implies ≥1 row, so the coalesce is
          // a no-op there.
          case _: Count => Coalesce(Seq(merged, Literal(0L)))
          case _ => merged
        }
    }.asInstanceOf[NamedExpression])

    agg.copy(aggregateExpressions = newResult, child = newJoin)
  }
}
