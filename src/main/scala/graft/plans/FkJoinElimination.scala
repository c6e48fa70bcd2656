package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, AttributeSet, EqualTo, IsNotNull}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** A PK-FK join whose integrity has been VERIFIED on the data:
  * `fk` in the fact table at `factPathMarker` is non-null and every
  * value matches exactly one row of the dimension at `dimPathMarker`
  * keyed by unique `pk`. Registered only after those three checks
  * pass ([[graft.queries.Extensions]] runs them as an audit job —
  * the x20 referential-integrity check recycled as an optimizer
  * license; on a warehouse with declared constraints the same facts
  * come from the catalog).
  */
case class VerifiedFkJoin(
    factPathMarker: String,
    dimPathMarker: String,
    fkCol: String,
    pkCol: String)

/** Join elimination over verified PK-FK joins — the second classic
  * constraint-driven rewrite next to [[MatviewRewrite]]: an INNER
  * equi-join of the fact against a key-preserving dimension is the
  * identity on fact rows (each fact row matches exactly once), so
  * when the operators above reference ONLY fact-side columns the
  * dimension scan + join are dropped entirely. At 100 TB that is a
  * dimension broadcast (or worse, a shuffle) that never happens —
  * the rewrite every warehouse optimizer performs from declared
  * RI constraints, here licensed by a measured audit instead.
  *
  * Trigger, each condition load-bearing for exactness:
  *   - INNER join, condition exactly `fact.fk = dim.pk` (either
  *     orientation) for a registered [[VerifiedFkJoin]];
  *   - the dimension side is its bare relation — a columns-only
  *     Project and the optimizer's inferred `IsNotNull(pk)` filter
  *     are accepted (null-pk rows never match, so dropping them
  *     cannot change the join) — anything else (a real filter!)
  *     refuses, because it could drop matches;
  *   - the fk attribute is the UN-RENAMED column of the registered
  *     fact relation inside the fact subtree (fact-side filters /
  *     projections are fine — integrity verified on the whole table
  *     holds on any subset);
  *   - the parent (Project or Aggregate) references no dim-side
  *     attribute.
  */
object FkJoinElimination extends Rule[LogicalPlan] {

  /** Verified-integrity facts are scoped to the REGISTERING
    * application (value = app id), like [[EagerAggregation]]'s
    * licenses: each application re-measures integrity for itself, so
    * a fact must not survive into a later session of the same JVM.
    */
  private val registry = new java.util.concurrent
    .ConcurrentHashMap[VerifiedFkJoin, String]()

  private def activeAppId: String =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.applicationId).getOrElse("")

  def register(d: VerifiedFkJoin): Unit = registry.put(d, activeAppId)
  def unregister(d: VerifiedFkJoin): Unit = registry.remove(d)
  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp {
      case p @ Project(_, j: Join) =>
        eliminate(p.references, j).map(c => p.copy(child = c)).getOrElse(p)
      case a @ Aggregate(_, _, j: Join, _) =>
        eliminate(a.references, j).map(c => a.copy(child = c)).getOrElse(a)
    }

  /** The dimension side: bare relation, columns-only Project, or the
    * inferred not-null filter on the pk.
    */
  private def dimBase(plan: LogicalPlan,
      pkName: String): Option[LogicalRelation] = plan match {
    case lr: LogicalRelation => Some(lr)
    case Project(pl, ch) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      dimBase(ch, pkName)
    case Filter(IsNotNull(a: AttributeReference), ch) if a.name == pkName =>
      dimBase(ch, pkName)
    case _ => None
  }

  private def pathOf(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
    case _ => Nil
  }

  private def eliminate(parentRefs: AttributeSet,
      j: Join): Option[LogicalPlan] = j match {
    case Join(l, r, Inner, Some(EqualTo(a: AttributeReference,
        b: AttributeReference)), _) =>
      Seq((l, r, a, b), (l, r, b, a), (r, l, a, b), (r, l, b, a))
        .flatMap { case (fact, dim, fk, pk) =>
          val app = activeAppId
          registry.asScala.flatMap { case (d, owner) =>
            for {
              _ <- if (owner == app) Some(()) else None
              dimLr <- dimBase(dim, d.pkCol)
              if pathOf(dimLr).exists(_.contains(d.dimPathMarker))
              pkAttr <- dimLr.output.find(_.name == d.pkCol)
              if pk.semanticEquals(pkAttr)
              factLr <- fact.collectFirst {
                case lr: LogicalRelation
                  if pathOf(lr).exists(_.contains(d.factPathMarker)) => lr
              }
              fkAttr <- factLr.output.find(_.name == d.fkCol)
              if fk.semanticEquals(fkAttr)
              if fact.outputSet.contains(fk)
              if parentRefs.subsetOf(fact.outputSet)
            } yield fact
          }
        }.headOption
    case _ => None
  }
}
