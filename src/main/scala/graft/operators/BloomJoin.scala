package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

/** Bloom-filter join pruning: drop fact-side rows that cannot have a
  * join partner BEFORE the join's shuffle, using a broadcast Bloom
  * filter built over the dimension keys.
  *
  * This is the explicit, always-on form of what Spark's runtime row
  * filtering (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
  * applies opportunistically: at 100 TB the shuffle of the fact table
  * IS the query cost, and when the dimension side is selective (but
  * too large to broadcast-join outright), a ~MB bloom filter shipped
  * to every executor eliminates the non-matching fact rows at scan
  * time — the shuffle then carries only rows that will survive the
  * join, at the price of `fpp` false positives that the real join
  * removes anyway. Results are therefore EXACTLY the plain join's
  * (verified by the oracle and `BloomJoinSpec`); only the shuffled
  * volume changes.
  *
  * The dimension side is aggregated to its distinct keys by
  * `stat.bloomFilter` (one pass, tree-aggregated partial sketches);
  * the predicate is a scalar function of the fact key, so it pipelines
  * inside the scan stage — no extra shuffle anywhere.
  */
object BloomJoin {

  /** `fact ⋈ dim` (inner, `factKey == dimKey`) with the fact side
    * pre-pruned by a bloom over `dim[dimKey]`. `expectedKeys` sizes
    * the sketch (overestimate is wasted megabytes, underestimate is
    * extra false positives — not wrong results).
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedKeys: Long = 1 << 20, fpp: Double = 0.01): DataFrame = {
    val pruned = pruneByBloom(fact, dim, factKey, dimKey, expectedKeys, fpp)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }

  /** Just the pruning half — the fact rows whose key passes the bloom
    * (all rows with a join partner, plus ≤ fpp false positives).
    * Exposed separately so callers can compose it with their own join
    * shape (left/semi/aggregate-before-join).
    *
    * NOTE this method is EAGER: building the sketch runs one Spark job
    * over `dim` at call time (inherent — the filter must exist before
    * the fact scan can use it; Spark's own runtime filters do the same
    * work inside an exchange-reused subquery).
    */
  def pruneByBloom(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedKeys: Long = 1 << 20, fpp: Double = 0.01): DataFrame = {
    // the probe MUST hash the same representation stat.bloomFilter
    // inserted: integral keys go in via putLong, strings via their
    // UTF-8 bytes — probing a string sketch with cast-to-long longs
    // would silently prune (almost) every matching row. Validated
    // BEFORE building the sketch so unsupported types fail with the
    // operator's own message, not stat.bloomFilter's.
    val keyType = dim.schema(dimKey).dataType
    val integral = keyType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case StringType => false
      case other => throw new IllegalArgumentException(
        s"bloom pruning supports integral or string keys, `$dimKey` is $other")
    }
    val bloom = dim.stat.bloomFilter(dimKey, expectedKeys, fpp)
    // the sketch rides inside the native expression: it ships to
    // executors with the serialized plan (per stage, like a task
    // binary) and probes from generated code — no Scala-UDF boxing or
    // closure dispatch in the fact scan, which is the hottest row path
    // of the whole pruned join. Null keys probe to null, which the
    // Filter drops — identical to the old UDF's `k != null && ...`.
    val plan = fact.queryExecution.analyzed
    // resolve with the session's resolver (case-insensitive unless
    // spark.sql.caseSensitive) — an exact string match would reject
    // `L_SUPPKEY` against `l_suppkey` where every other column lookup
    // in the API accepts it
    val resolver = org.apache.spark.sql.internal.SQLConf.get.resolver
    val keyAttr = plan.output.filter(a => resolver(a.name, factKey)) match {
      case Seq(a) => a
      case Seq() => throw new IllegalArgumentException(
        s"column `$factKey` not in ${plan.output.map(_.name).mkString(", ")}")
      case many => throw new IllegalArgumentException(
        s"column `$factKey` is ambiguous (${many.length} matches) — " +
          "disambiguate with select/alias first")
    }
    val wantType = if (integral) LongType else StringType
    val probeKey: Expression =
      if (keyAttr.dataType == wantType) keyAttr else Cast(keyAttr, wantType)
    GraftSqlBridge.ofRows(fact.sparkSession,
      Filter(graft.functions.BloomMightContain(probeKey, bloom), plan))
  }
}
