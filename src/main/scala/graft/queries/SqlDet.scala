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
}
