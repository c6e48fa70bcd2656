package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The decimal-determinism helpers every pack shares: double
  * aggregation goes through DECIMAL(18,2) so results are exact and
  * independent of partition/accumulation order — the property the
  * DuckDB hash-compare gate rests on. One definition, so the
  * discipline cannot drift between packs.
  */
object SqlDet {
  /** Exact decimal view of a money/quantity double. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Order-independent sum of a double column (exact decimal sum). */
  def dsum(c: Column): Column = sum(dec(c)).cast("double")

  /** DuckDB SQL fragment mirroring [[dsum]]. */
  def sqlDsum(col: String): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"

  /** DuckDB skeleton of the exact-plus-bound percentile restatement
    * (mirrors [[graft.operators.LogHistogram.exactWithBounds]] — x14
    * and st19 share this one spelling). `srcSql` must select
    * `(<group>, cents)`; `groupSelect` is the output spelling of the
    * group column (e.g. a TIMESTAMP cast).
    */
  def sqlPercentileBound(srcSql: String, group: String,
      groupSelect: String): String =
    s"""WITH o AS ($srcSql),
       |r AS (
       |  SELECT $group, cents,
       |    ROW_NUMBER() OVER (PARTITION BY $group ORDER BY cents) AS rn,
       |    COUNT(*) OVER (PARTITION BY $group) AS n
       |  FROM o)
       |SELECT $groupSelect,
       |  CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END)
       |    AS BIGINT) AS exact_p50,
       |  CAST(MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN cents END)
       |    AS BIGINT) AS exact_p95,
       |  TRUE AS p50_ok, TRUE AS p95_ok
       |FROM r GROUP BY $group ORDER BY $group""".stripMargin
}
