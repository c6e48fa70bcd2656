package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** What a registered materialized rollup can answer: the base-table
  * location it summarizes, its grouping keys, and which aggregate
  * calls over the base map to which pre-aggregated measure columns.
  *
  * `freshPlan` must return the ANALYZED read plan of the rollup table
  * with fresh attribute ids per call (two routed aggregates in one
  * query tree must not share ids).
  */
case class MatviewDef(
    pathMarker: String,
    keys: Set[String],
    countCol: String,
    sumCols: Map[String, String],
    sumDecCols: Map[(String, DecimalType), String],
    minCols: Map[String, String],
    maxCols: Map[String, String],
    freshPlan: () => LogicalPlan)

/** Materialized-view routing — the aggregate-navigator tier of an
  * OLAP engine: an `Aggregate` over the BASE fact table is rewritten
  * to re-aggregate a registered (much smaller) persisted rollup when
  * the rewrite is provably exact, so the 100 TB scan never happens.
  *
  * The trigger is deliberately narrow, and every condition exists for
  * exactness:
  *   - the aggregate's child is the registered base relation (bare,
  *     or under a column-pruning Project) with NO Filter — a residual
  *     predicate over non-key columns cannot be answered from key
  *     grain;
  *   - every grouping expression is a bare column within the rollup's
  *     key set (a subset regroup re-aggregates the rollup — the
  *     classic rollup-lattice walk);
  *   - every measure is COUNT(non-null literal) → SUM(cnt),
  *     SUM(int/long col) → SUM(sum_col), SUM(CAST(col AS DECIMAL))
  *     with the registered cast → SUM(sum_dec_col) (decimal sums
  *     re-associate exactly — this is why the engine's exact-sum
  *     discipline doubles as matview-routability), or MIN/MAX(col) →
  *     MIN/MAX of the pre-aggregated extrema. No DISTINCT, no FILTER
  *     clauses, no AVG (avg of avgs is wrong; a consumer wanting avg
  *     routes sum and count separately).
  * Anything else leaves the plan untouched. Rewritten outputs keep
  * the original names, exprIds, and dataTypes (a cast is inserted
  * where the rollup's wider sum type must narrow back), so parent
  * operators are unaffected.
  *
  * Staleness is handled at REGISTRATION, not in the rule: the rollup
  * table name carries the base-source fingerprint (the d17/s14
  * persisted-index contract), so a stale rollup is simply never
  * registered for the current data.
  *
  * Registered like [[RewriteRankLimit]] via
  * `SparkSessionExtensions.injectOptimizerRule` and
  * `spark.experimental.extraOptimizations`; routing decisions apply
  * to ANY query in the session over the registered base — q01-family
  * aggregates route automatically wherever the trigger holds, which
  * is the point of an aggregate navigator.
  */
object MatviewRewrite extends Rule[LogicalPlan] {

  /** Registry entries are scoped to the REGISTERING application: a
    * MatviewDef embeds analyzed plans whose file relations are bound
    * to one SparkContext, so an entry surviving into a later session
    * in the same JVM (suite sequences, notebook restarts) would route
    * a matching aggregate — including the REBUILD of the matview
    * itself — through a stopped context. Entries from other app ids
    * are invisible to [[apply]].
    */
  private val registry = new java.util.concurrent
    .ConcurrentHashMap[String, (String, MatviewDef)]()

  private def activeAppId: String =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.applicationId).getOrElse("")

  def register(d: MatviewDef): Unit =
    registry.put(d.pathMarker, (activeAppId, d))
  def unregister(pathMarker: String): Unit = registry.remove(pathMarker)
  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp {
      case agg @ Aggregate(groupExprs, resultExprs, child, _) =>
        (for {
          lr <- baseOf(child)
          d <- defFor(lr)
          rewritten <- rewrite(groupExprs, resultExprs, d)
        } yield rewritten).getOrElse(agg)
    }

  /** The base relation under the aggregate: bare, or under a
    * columns-only Project (pruning). A Filter anywhere refuses.
    */
  private def baseOf(plan: LogicalPlan): Option[LogicalRelation] =
    plan match {
      case lr: LogicalRelation => Some(lr)
      case Project(projList, lr: LogicalRelation)
        if projList.forall(_.isInstanceOf[AttributeReference]) => Some(lr)
      case _ => None
    }

  /** The scan must be the WHOLE registered base — the path matches
    * only when it ends exactly at the marker (a scheme prefix like
    * `file:` is tolerated). A read of a SUBPATH (one partition dir of
    * a partitioned base) must never route: the rollup answers the
    * whole base, and serving it for a partial read is silently wrong
    * (x33's per-epoch delta rollup is exactly that shape).
    */
  private def defFor(lr: LogicalRelation): Option[MatviewDef] =
    lr.relation match {
      case fs: HadoopFsRelation =>
        val paths = fs.location.rootPaths.map(_.toString.stripSuffix("/"))
        val app = activeAppId
        registry.values.asScala.collect {
          case (owner, d) if owner == app => d
        }.find(d =>
          paths.exists(_.endsWith(d.pathMarker.stripSuffix("/"))))
      case _ => None
    }

  private def rewrite(groupExprs: Seq[Expression],
      resultExprs: Seq[NamedExpression],
      d: MatviewDef): Option[Aggregate] = {
    // all grouping expressions: bare key columns
    val groupNames = groupExprs.map {
      case a: AttributeReference if d.keys(a.name) => a.name
      case _ => return None
    }
    // the registered read plan is ANALYZED; the optimizer batch that
    // strips analysis-only wrappers (SubqueryAlias) already ran, so
    // strip them here or physical planning has no strategy for them
    val fresh = org.apache.spark.sql.catalyst.analysis
      .EliminateSubqueryAliases(d.freshPlan())
    def mvAttr(name: String): Option[Attribute] =
      fresh.output.find(_.name == name)
    val newGroup = groupNames.map(n => mvAttr(n).getOrElse(return None))
    val byName = groupNames.zip(newGroup).toMap

    def measure(fn: Expression): Option[Expression] = fn match {
      case Count(cs) if cs.forall(c => c.foldable && c.eval() != null) =>
        mvAttr(d.countCol).map(a => Sum(a).toAggregateExpression())
      case Sum(a: AttributeReference, _) =>
        d.sumCols.get(a.name).flatMap(mvAttr)
          .map(c => Sum(c).toAggregateExpression())
      case Sum(Cast(a: AttributeReference, dt: DecimalType, _, _), _) =>
        d.sumDecCols.get((a.name, dt)).flatMap(mvAttr)
          .map(c => Sum(c).toAggregateExpression())
      case Min(a: AttributeReference) =>
        d.minCols.get(a.name).flatMap(mvAttr)
          .map(c => Min(c).toAggregateExpression())
      case Max(a: AttributeReference) =>
        d.maxCols.get(a.name).flatMap(mvAttr)
          .map(c => Max(c).toAggregateExpression())
      case _ => None
    }

    // A result expression is any tree over grouping attributes and
    // aggregate calls (the optimizer collapses post-aggregation
    // projections — casts, arithmetic — into the Aggregate, so the
    // rewrite must map aggregates WHEREVER they sit in the tree).
    // Each aggregate call maps to its rollup re-aggregation (cast
    // back to the original type where the rollup's wider sum type
    // differs); each grouping attribute maps to the rollup key; any
    // other base-attribute reference refuses the route.
    val mvOutput = fresh.outputSet
    def mapResult(ne: NamedExpression): Option[NamedExpression] = {
      var ok = true
      val mapped = ne.transformUp {
        case ae: AggregateExpression =>
          if (ae.isDistinct || ae.filter.nonEmpty) { ok = false; ae }
          else measure(ae.aggregateFunction) match {
            case Some(e) =>
              if (e.dataType == ae.dataType) e else Cast(e, ae.dataType)
            case None => ok = false; ae
          }
        case a: AttributeReference if byName.contains(a.name) =>
          byName(a.name)
      }
      if (!ok || !mapped.references.subsetOf(mvOutput)) None
      else mapped match {
        case n: NamedExpression if n.exprId == ne.exprId => Some(n)
        case a: Attribute => Some(Alias(a, ne.name)(exprId = ne.exprId))
        case other => Some(Alias(other, ne.name)(exprId = ne.exprId))
      }
    }
    val newResult: Seq[NamedExpression] =
      resultExprs.map(ne => mapResult(ne).getOrElse(return None))

    // prune the rollup read to what the regroup references
    val needed = (newGroup ++ newResult.flatMap(_.references)).distinct
    Some(Aggregate(newGroup, newResult, Project(needed, fresh), None))
  }
}
