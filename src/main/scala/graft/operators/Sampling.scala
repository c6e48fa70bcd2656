package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.PortableHash._

/** Deterministic sampling and dataset splitting — the corpus-assembly
  * operators every training-data pipeline needs downstream of dedup:
  * reproducible train/val/test splits and per-stratum subsampling
  * (data mixing by source).
  *
  * Both are pure `filter`/`withColumn` over a salted content hash — no
  * RNG, no state, no shuffle of their own:
  *   - the same row lands in the same split on every run, on any
  *     cluster size, under any partitioning (unlike `randomSplit`,
  *     which is seed- AND partitioning-dependent);
  *   - membership is decidable per row in isolation, so the predicate
  *     pushes down a parquet scan and survives any 100 TB re-layout;
  *   - adding data never reassigns existing rows (hash is per-row, not
  *     rank-based).
  *
  * The salt separates decisions: splitting by "split" and sampling by
  * "sample" are independent coin flips of the same key.
  */
object Sampling {

  /** Per-mille bucket in [0, 1000) of a key column under a salt —
    * the shared coin for [[splitColumn]] and [[sampleByHash]].
    */
  def hashBucketPm(key: Column, salt: String): Column =
    sparkHash56(concat(lit(salt + ":"), key.cast("string"))) % 1000

  /** DuckDB mirror of [[hashBucketPm]]. */
  def duckHashBucketPm(keySqlExpr: String, salt: String): String =
    duckHash56(s"'$salt:' || CAST($keySqlExpr AS VARCHAR)") + " % 1000"

  /** Split label column: per-mille weights, e.g.
    * `Seq("train" -> 800, "val" -> 100, "test" -> 100)`.
    */
  def splitColumn(key: Column, weights: Seq[(String, Int)],
      salt: String = "split"): Column = {
    require(weights.map(_._2).sum == 1000,
      s"split weights must sum to 1000 per-mille, got $weights")
    val bucket = hashBucketPm(key, salt)
    val cumulative = weights.scanLeft(0)(_ + _._2).tail
    weights.zip(cumulative).init.foldRight(lit(weights.last._1)) {
      case (((name, _), cum), otherwise) =>
        when(bucket < cum, name).otherwise(otherwise)
    }
  }

  /** Keep a deterministic `perMille`/1000 fraction of rows by key
    * hash; composes with any prior transform and pushes down to scans.
    */
  def sampleByHash(df: DataFrame, key: Column, perMille: Int,
      salt: String = "sample"): DataFrame = {
    require(perMille >= 0 && perMille <= 1000)
    df.filter(hashBucketPm(key, salt) < perMille)
  }

  /** Row-varying keep rate (domain mixing / source reweighting): keep
    * each row iff its hash bucket falls under `ratePerMille`, which may
    * be any per-mille expression of the row (e.g. a per-source target
    * proportion). Same determinism contract as [[sampleByHash]]; still
    * a single row-local predicate, so it pushes into the scan stage.
    */
  def sampleByRate(df: DataFrame, key: Column, ratePerMille: Column,
      salt: String = "mix"): DataFrame =
    df.filter(hashBucketPm(key, salt) < ratePerMille)
}
