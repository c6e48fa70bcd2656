package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch as a log-scale histogram (the HDR-
  * histogram shape): positive integer values bucket by octave
  * (floor(log2 v), spelled `length(bin(v)) - 1` — pure integer, no
  * floating log whose last ulp could differ across engines) times `k`
  * linear sub-buckets per octave. A sketch is then just a
  * `(group, bucket, c)` count table, which makes it the quantile
  * sibling of the HLL rollup (x11): per-day sketches merge to
  * monthly by ADDING bucket counts — one combinable aggregate, no
  * rescan of the base data, unlike percentiles themselves (Σ of
  * daily p95s is meaningless).
  *
  * Quantile estimation reads the merged histogram: the rank-r value
  * lives in the first bucket whose cumulative count reaches r, and
  * the estimate is that bucket's upper edge. Guarantee (the x04
  * exact-plus-bound policy leans on this):
  *
  *   exact ≤ est ≤ exact · (k+1)/k
  *
  * Proof sketch: the r-th smallest value t has fewer than r values
  * in buckets before its own (all are < t), so the first bucket with
  * cum ≥ r IS t's bucket; est = upperEdge ≥ t by the sub-bucket
  * inequality `(v - 2^o)·k div 2^o = s  ⇒  v < 2^o(k+s+1)/k`, and
  * t ≥ 2^o(k+s)/k gives est/t ≤ (k+s+1)/(k+s) ≤ (k+1)/k. All
  * arithmetic is 64-bit integer, so the bound booleans are
  * deterministic and the DuckDB oracle reproduces them bit-for-bit.
  *
  * Scale shape (100 TB): the sketch table has at most
  * `octaves × k` rows per group (≤ ~1000 for 64-bit values, k=16) —
  * a map-side-combinable `groupBy(bucket).count()` regardless of row
  * count, and rollups (day → month → quarter) touch only sketch
  * rows. Memory is FIXED like the CMS (x09), but for ranks instead
  * of frequencies.
  */
object LogHistogram {

  /** Bucket id of a POSITIVE integer column: `octave * k + sub`,
    * octave = floor(log2 v) via binary-string length, sub ∈ [0, k)
    * by linear split of the octave. Callers must filter v ≥ 1 first
    * (bin(0) has no set bit; zero/negative values have no octave).
    *
    * `k` must be a power of two: the sub-bucket is then computed
    * DIVISION-FIRST — `(v - 2^o) div (2^o div k)` — which is exactly
    * `((v - 2^o)·k) div 2^o` for 2^o ≥ k but never overflows, keeping
    * the full documented domain v ∈ [1, 2^62) correct where the
    * multiply-first spelling wraps negative from octave ~59 up (the
    * DuckDB oracle multiplies in HUGEINT and was never at risk — the
    * two engines agree across the whole domain).
    */
  def bucket(v: String, k: Int): Column = {
    require(k >= 1 && (k & (k - 1)) == 0, s"need a power-of-two k, got $k")
    val pow = s"shiftleft(CAST(1 AS BIGINT), length(bin($v)) - 1)"
    expr(s"(length(bin($v)) - 1) * $k + (CASE WHEN $pow >= $k " +
      s"THEN ($v - $pow) div ($pow div $k) " +
      s"ELSE (($v - $pow) * $k) div $pow END)")
  }

  /** Upper edge of a bucket id: `2^o · (k + s + 1) div k` — the
    * integer-floor of the real sub-bucket boundary, still an upper
    * bound for every integer value in the bucket (see object doc).
    * Same division-first overflow discipline as [[bucket]]: for
    * 2^o ≥ k this is exactly `2^(o - log2 k) · (k + s + 1)`, in-range
    * for every bucket of the v < 2^62 domain.
    */
  def upperEdge(bucketCol: String, k: Int): Column = {
    require(k >= 1 && (k & (k - 1)) == 0, s"need a power-of-two k, got $k")
    val pow = s"shiftleft(CAST(1 AS BIGINT), $bucketCol div $k)"
    expr(s"CASE WHEN $pow >= $k " +
      s"THEN ($pow div $k) * ($k + $bucketCol % $k + 1) " +
      s"ELSE ($pow * ($k + $bucketCol % $k + 1)) div $k END")
  }

  /** Lower edge of a bucket id: `2^o · (k + s) div k` — at or below
    * every integer value in the bucket (the floor can only lower it).
    * Same division-first overflow discipline as [[upperEdge]].
    */
  def lowerEdge(bucketCol: String, k: Int): Column = {
    require(k >= 1 && (k & (k - 1)) == 0, s"need a power-of-two k, got $k")
    val pow = s"shiftleft(CAST(1 AS BIGINT), $bucketCol div $k)"
    expr(s"CASE WHEN $pow >= $k " +
      s"THEN ($pow div $k) * ($k + $bucketCol % $k) " +
      s"ELSE ($pow * ($k + $bucketCol % $k)) div $k END")
  }

  /** DELETABLE min/max estimates from a live `(groupCols..., bucket,
    * c)` histogram — the piece [[graft.operators.IncrementalAgg]]'s
    * monotone merge cannot express: bucket counts DECREMENT cleanly
    * (a CDC delete is a negative-count delta through
    * `mergeAdditive`), and after any mix of inserts and deletes the
    * group's min lives in its first live bucket, the max in its
    * last. Emits the bucket edges on both sides of each extremum:
    *
    *   min_est = lowerEdge(first live bucket) ≤ exact min ≤ min_hi
    *   max_lo  ≤ exact max ≤ upperEdge(last live bucket) = max_est
    *
    * — containment the caller restates as bound booleans (the x04
    * policy). Width of the bracket is one sub-bucket, i.e. a (k+1)/k
    * relative bound. Scale shape: one aggregate over the tiny sketch
    * table (≤ octaves·k rows per group), never the data.
    */
  def extremaEstimates(hist: DataFrame, groupCols: Seq[String],
      k: Int): DataFrame =
    hist.filter(col("c") > 0)
      .groupBy(groupCols.map(col): _*)
      .agg(min(col("bucket")).as("__bmin"), max(col("bucket")).as("__bmax"))
      .select(groupCols.map(col) ++ Seq(
        lowerEdge("__bmin", k).as("min_est"),
        upperEdge("__bmin", k).as("min_hi"),
        lowerEdge("__bmax", k).as("max_lo"),
        upperEdge("__bmax", k).as("max_est")): _*)

  /** Estimate quantiles from a merged `(groupCols..., bucket, c)`
    * histogram: for each requested `(name, numer, denom)` the
    * discrete rank is `ceil(numer·n / denom)` (n = Σ c within the
    * group, derived from the sketch itself) and the estimate is the
    * upper edge of the first bucket whose cumulative count reaches
    * it. Two windows over the tiny sketch table — never the data.
    */
  def estimateQuantiles(hist: DataFrame, groupCols: Seq[String], k: Int,
      quantiles: Seq[(String, Int, Int)]): DataFrame = {
    require(quantiles.nonEmpty, "no quantiles requested")
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*).orderBy(col("bucket"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum(col("c")).over(wCum))
      .withColumn("__n", sum(col("c")).over(wAll))
    val ests = quantiles.map { case (name, numer, denom) =>
      val rank = expr(s"($numer * __n + $denom - 1) div $denom")
      min(when(col("__cum") >= rank, upperEdge("bucket", k))).as(name)
    }
    cum.groupBy(groupCols.map(col): _*).agg(ests.head, ests.tail: _*)
  }

  /** The exact-plus-bound p50/p95 restatement shared by x14 and st19
    * (the x04 policy): exact rank-based percentiles over `values`
    * (`groupCol`, `cents`) joined to the sketch estimates `est`
    * (`groupCol`, `p50_est`, `p95_est`) with the (k+1)/k bound
    * booleans. ONE spelling, so the two queries — and their mirrored
    * oracle skeleton, [[graft.queries.SqlDet.sqlPercentileBound]] —
    * can never drift apart.
    */
  def exactWithBounds(values: DataFrame, est: DataFrame,
      groupCol: String, k: Int): DataFrame = {
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("cents"))
    val wn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
    val exact = values
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy(col(groupCol))
      .agg(max(when(col("rn") === expr("(n + 1) div 2"), col("cents")))
          .as("exact_p50"),
        max(when(col("rn") === expr("(19 * n + 19) div 20"), col("cents")))
          .as("exact_p95"))
    exact.join(est, Seq(groupCol))
      .select(col(groupCol), col("exact_p50"), col("exact_p95"),
        (col("p50_est") >= col("exact_p50") &&
          col("p50_est") * k <= col("exact_p50") * (k + 1)).as("p50_ok"),
        (col("p95_est") >= col("exact_p95") &&
          col("p95_est") * k <= col("exact_p95") * (k + 1)).as("p95_ok"))
      .orderBy(col(groupCol))
  }
}
