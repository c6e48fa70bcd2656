package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager localCheckpoint PLUS a Catalyst statistics reset — THE
  * checkpoint any iterative fixpoint loop must use.
  *
  * `localCheckpoint(eager = true)` truncates lineage but PRESERVES the
  * origin plan's statistics on the new LogicalRDD, and
  * `SizeInBytesOnlyStatsPlanVisitor.visitJoin` multiplies children's
  * `sizeInBytes` BigInts — so across a loop's checkpoint generations
  * the stored BigInt's digit count roughly TRIPLES per generation
  * (round r's plan joins two or three round-(r-1) checkpoints). Ten
  * rounds in, the stat has ~3^10 digits; fifteen rounds in, the DRIVER
  * spends minutes per planning pass inside
  * `BigInteger.multiplyToomCook3` — observed twice for real: an SCC
  * outer round over a 13-node graph taking 133 s of pure stats
  * arithmetic, and d19's entity-resolution components freezing the
  * sf0.1 bench inside `Clusters.connectedComponents` (main thread
  * 1100+ s of CPU in BigInteger.add/multiply).
  *
  * Rebuilding the frame from the already-persisted RDD drops origin
  * stats back to the session default, breaking the chain. The cost is
  * a per-row InternalRow↔Row round-trip at each downstream
  * materialization — acceptable for the O(nodes) label/frontier tables
  * fixpoint loops checkpoint, NOT for fact/edge tables (checkpoint
  * those once outside the loop, where one generation can't compound).
  * The reset also pins `sizeInBytes` at the don't-know default, which
  * disables AUTO-broadcast of the checkpointed side — loops that want
  * a broadcast or hash build must say so explicitly
  * (`broadcast()`/`hint("SHUFFLE_HASH")`), which every graft loop
  * already does.
  */
object Ckpt {
  def flat(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Spread a narrow scan across the cluster BEFORE expensive per-row
    * work (shingling, window packing, decode): when `df`'s scan has
    * fewer partitions than the session's parallelism — here every sf
    * table is a single-row-group parquet file, so every scan stage is
    * ONE task — whole-stage codegen fuses the heavy transform into
    * that serial task and 31 of 32 cores idle (measured: the shared
    * shingle-index build ran 2.9 s in one task; spread, ~0.25 s).
    * Keyed repartition (deterministic, guide §2.5 — never round-robin
    * on an expensive lineage) by `key`. On a real multi-file table
    * the scan already carries ≥ parallelism splits and this is the
    * identity — the shuffle only exists where the layout starves the
    * cores, which is why it is a conditional, not a blanket
    * `repartition` that would shuffle 100 TB before every transform.
    */
  def spread(df: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p, key)
  }
}
