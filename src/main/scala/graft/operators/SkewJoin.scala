package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY §2.3 "salting for skew").
  *
  * AQE's skew-join splitting handles skew *reactively* at shuffle
  * time; salting is the *proactive* form for joins where one or a few
  * hot keys dominate (the classic power-law user_id): the skewed side
  * gets a uniform random salt in [0, f), the build side is replicated
  * f times (one row per salt value), and the join key becomes
  * (key, salt) — spreading each hot key over f reducers.
  *
  * Cost model: f× replication of the build side vs f× parallelism on
  * the hot keys; use only when the build side is small relative to
  * the skew (it usually is — dimension-ish), and prefer plain
  * broadcast when the build side fits in memory outright.
  *
  * The salt is `pmod(hash(monotonically_increasing_id()), f)` —
  * uniform and partition-independent; correctness does not depend on
  * its distribution, only balance does.
  */
object SkewJoin {

  def saltedJoin(skewed: DataFrame, build: DataFrame, key: String,
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // right/full outer would emit each unmatched build row once PER
    // SALT (the build side is replicated) — reject instead of being
    // silently wrong; "cross" is contradictory with a using-columns
    // equi-join, so it is rejected too
    val safe = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
    require(safe.contains(joinType.toLowerCase.replace("_", "")) ||
      safe.contains(joinType.toLowerCase),
      s"saltedJoin does not support joinType=$joinType: the replicated " +
        "build side would duplicate unmatched right rows")
    val salted = skewed.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(saltFactor)))
    val replicated = build
      .withColumn("__salt", explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
