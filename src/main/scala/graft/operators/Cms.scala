package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.PortableHash

/** Count-min sketch over a key column — frequency estimation in FIXED
  * memory: `d` hash rows × `w` buckets of counters regardless of key
  * cardinality. Build is one map-side-combinable aggregate (the
  * sketch merges associatively, so it works identically as a batch
  * aggregate, a streaming Complete-mode aggregate, or a union of
  * per-partition sketches); probe is a broadcast of the candidate
  * keys against the cell table, estimate = min over the key's `d`
  * cells (never an underestimate — pinned by ExtensionsSpec).
  *
  * Hashes come from [[graft.queries.PortableHash.cmsBucket]], so the
  * sketch — and every estimate — is deterministic and bit-identical
  * across engines (the x09/st16 oracles reproduce it in DuckDB).
  */
object Cms {

  /** Build the `(i, bucket, c)` cell table from `df`'s `key` column. */
  def build(df: DataFrame, key: Column, d: Int = 4,
      w: Int = 256): DataFrame = {
    require(d >= 1 && w >= 1, s"need d >= 1, w >= 1; got d=$d, w=$w")
    df.select(key.as("__k"), explode(sequence(lit(0), lit(d - 1))).as("i"))
      .withColumn("bucket", PortableHash.cmsBucket(col("i"), col("__k"), w))
      .groupBy(col("i"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Estimate counts for `keys` (a frame with a `key` column) against
    * a built sketch: returns the input rows plus `cms_est`. The
    * SKETCH broadcasts (it is the fixed ≤ d·w-row side; the probe
    * frame may be arbitrarily large), and the join is LEFT OUTER with
    * absent cells counting as zero — a key never seen at build time
    * must estimate 0, not drop from the output or take the min of
    * only its populated cells. `d` and `w` must match the build.
    *
    * Working columns are `__`-prefixed and the sketch's columns are
    * renamed before the join, so probe frames may freely carry
    * columns named `i`/`bucket`/`c`; a transient per-row tag keeps
    * duplicate probe rows distinct in the output (row-in, row-out).
    */
  def probe(sketch: DataFrame, keys: DataFrame, key: Column, d: Int = 4,
      w: Int = 256): DataFrame = {
    val reserved = Seq("__row", "__i", "__bucket", "__c")
    require(keys.columns.intersect(reserved).isEmpty,
      s"probe frame must not carry ${reserved.mkString("/")} columns")
    val keyCols = keys.columns.map(col).toSeq
    val sk = sketch.select(col("i").as("__i"), col("bucket").as("__bucket"),
      col("c").as("__c"))
    val probes = keys
      .withColumn("__row", monotonically_increasing_id())
      .withColumn("__i", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("__bucket", PortableHash.cmsBucket(col("__i"), key, w))
    probes.join(broadcast(sk), Seq("__i", "__bucket"), "left")
      .groupBy(col("__row") +: keyCols: _*)
      .agg(min(coalesce(col("__c"), lit(0L))).as("cms_est"))
      .drop("__row")
  }
}
