package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the constraint-checking stage
  * (dbt tests / Deequ / Great Expectations) a production pipeline
  * runs before publishing a table. Each rule evaluates to ONE summary
  * row `(rule, n_checked, n_violations, pass)`; the audit report is
  * the union of rule rows, so the whole check is a handful of
  * aggregates — nothing row-level ever reaches the driver.
  *
  * Three constraint classes, each with the minimal distributed plan:
  *  - [[predicateRule]] (NOT NULL / range / domain / cross-field):
  *    one map-side-combinable conditional aggregate over one scan.
  *  - [[uniqueRule]] (primary-key): a keyed count — one shuffle on
  *    the key, then a one-row rollup.
  *  - [[fkRule]] (referential integrity): a left-anti join against
  *    the parent's distinct key set (broadcast when small; at 100 TB
  *    a bloom-filter prune of the child side comes first — see
  *    [[BloomJoin]]).
  *
  * Callers auditing many predicates on the SAME table should fuse
  * them into one pass (one agg emitting several violation counts) —
  * kept separate here so each rule stays an independent value.
  */
object Audit {

  private def report(name: String, checked: Column,
      violations: Column): Seq[Column] = Seq(
    lit(name).as("rule"), checked.as("n_checked"),
    violations.as("n_violations"))

  /** Row-local constraint: `violation` is the condition that MUST NOT
    * hold (e.g. `col("price") <= 0`). NULL conditions count as
    * non-violations (SQL constraint semantics: only a provable breach
    * fails).
    */
  def predicateRule(name: String, df: DataFrame,
      violation: Column): DataFrame =
    df.agg(count(lit(1)).as("__c"),
        coalesce(sum(when(violation, 1L).otherwise(0L)), lit(0L))
          .as("__v"))
      .select(report(name, col("__c"), col("__v")): _*)

  /** Key-uniqueness constraint: `n_violations` counts every row that
    * shares its key with another (the rows a dedup would have to
    * adjudicate), not just the surplus.
    */
  def uniqueRule(name: String, df: DataFrame,
      keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(coalesce(sum(col("__n")), lit(0L)).as("__c"),
        coalesce(sum(when(col("__n") > 1, col("__n")).otherwise(0L)),
          lit(0L)).as("__v"))
      .select(report(name, col("__c"), col("__v")): _*)

  /** Referential integrity: every non-null `childKey` must exist in
    * `parent(parentKey)`. NULL child keys pass (SQL FK semantics) and
    * are excluded from `n_checked`.
    */
  def fkRule(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame = {
    val nn = child.select(col(childKey)).filter(col(childKey).isNotNull)
    val orphans = nn.join(
      parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")
    nn.agg(count(lit(1)).as("__c"))
      .crossJoin(orphans.agg(count(lit(1)).as("__v")))
      .select(report(name, col("__c"), col("__v")): _*)
  }

  /** Union rule rows into the audit report, adding the `pass` flag. */
  def reportOf(rules: DataFrame*): DataFrame =
    rules.reduce(_.unionByName(_))
      .withColumn("pass",
        (col("n_violations") === 0L).cast("int"))
}
