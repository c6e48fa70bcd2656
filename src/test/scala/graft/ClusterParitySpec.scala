package graft

import org.scalatest.funsuite.AnyFunSuite

/** The multi-process gate: every representative query must produce
  * EXACTLY the same rows under `local-cluster[2,8,…]` (separate
  * executor JVMs — real closure/plan serialization, codegen class
  * shipping, network task results) as under single-JVM `local[8]`.
  * local[N] is how every other suite runs; this is the one place the
  * 100-TB claim's serialization axis is actually crossed on a single
  * machine.
  *
  * One suite-level comparison rather than per-query sessions: session
  * startup dominates (master + workers + executor JVM spawn), so both
  * sides run the whole slice in one session each.
  */
class ClusterParitySpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test(s"${ClusterParity.queryNames.size} representative queries are bit-identical across the " +
      "process boundary (local[8] vs local-cluster[2,8])") {
    val names = ClusterParity.queryNames
    val localRes = ClusterParity.runAll(
      () => GraftSession.local(cpus = 8), names, sfDir)
    val clusterRes = ClusterParity.runAll(
      () => GraftSession.cluster(workers = 2, coresPerWorker = 8,
        workerMemMB = 3072), names, sfDir)
    val problems = names.flatMap { n =>
      (localRes(n), clusterRes(n)) match {
        case (Right((ls, lr)), Right((cs, cr))) =>
          if (ls != cs) Some(s"$n: schema drift local=$ls cluster=$cs")
          else if (lr != cr) Some(
            s"$n: ${lr.size} local vs ${cr.size} cluster rows; first " +
              s"diff=${lr.zipAll(cr, "<none>", "<none>")
                .find(p => p._1 != p._2)}")
          else None
        case (Left(e), _) => Some(s"$n: local run failed: $e")
        case (_, Left(e)) => Some(s"$n: cluster run failed: $e")
      }
    }
    assert(problems.isEmpty, problems.mkString("\n"))
    // and the slice really covered every tier we claim it does
    assert(names.size >= 50)
  }
}
