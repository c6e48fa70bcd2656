package graft.operators

import graft.streaming.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** k-core peeling invariants on known graphs: pendant structures peel
  * away layer by layer, cliques survive, and extra rounds past
  * convergence change nothing.
  */
class KCoreSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // 4-clique {1,2,3,4} + chain 4-5-6 + pendant 7 on the clique
  private def cliqueChain = {
    import spark.implicits._
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (1L, 7L)).toDF("u", "v")
  }

  test("3-core of a clique-plus-appendages is exactly the clique") {
    import spark.implicits._
    val core = KCore.survivors(cliqueChain, k = 3, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.keySet === Set(1L, 2L, 3L, 4L))
    // final-round degree: every clique node sees its 3 clique
    // neighbors (the appendages peeled in earlier rounds)
    assert(core.values.toSet === Set(3L))
  }

  test("peeling cascades: a chain needs multiple rounds, not one") {
    import spark.implicits._
    // path 1-2-3-4-5: 2-core is empty, but only after cascading peels
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    assert(KCore.survivors(path, k = 2, rounds = 8).count() === 0L)
    // one round only strips the endpoints — interior still standing
    assert(KCore.survivors(path, k = 2, rounds = 1).count() === 3L)
  }

  test("rounds past convergence are a no-op (fixpoint stability)") {
    import spark.implicits._
    val a = KCore.survivors(cliqueChain, k = 3, rounds = 8)
    val b = KCore.survivors(cliqueChain, k = 3, rounds = 11)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("k=1 keeps every non-isolated node") {
    import spark.implicits._
    assert(KCore.survivors(cliqueChain, k = 1, rounds = 4).count() === 7L)
  }

  test("fixpoint mode equals fixed-rounds once converged") {
    import spark.implicits._
    val fixed = KCore.survivors(cliqueChain, k = 3, rounds = 8)
    val fp = KCore.survivorsToFixpoint(cliqueChain, k = 3)
    assert(fp.exceptAll(fixed).isEmpty && fixed.exceptAll(fp).isEmpty)
    // cascading case: fixpoint discovers the empty 2-core of a path
    // without being told how many rounds the cascade needs
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    assert(KCore.survivorsToFixpoint(path, k = 2).count() === 0L)
    // runaway backstop trips instead of silently returning a non-core
    intercept[IllegalStateException] {
      KCore.survivorsToFixpoint(path, k = 2, maxRounds = 1)
    }
  }
}
