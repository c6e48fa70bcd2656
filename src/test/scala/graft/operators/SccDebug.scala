package graft.operators

/** Throwaway timing harness: `sbt "Test/runMain graft.operators.SccDebug"` */
object SccDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4, "scc-debug")
    import spark.implicits._
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scc-debug] $tag ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // single directed ring of 100 — pointer doubling should close it
    // in ~8 inner rounds; the 300k smoke saw 40-round non-convergence
    time("ring1000") {
      val ring = (0L until 1000L).map(i => i -> ((i + 1) % 1000))
      println(Scc.stronglyConnected(ring.toDF("src", "dst"))
        .select("scc").distinct().collect().length)
    }
    val k = 4
    val chain = (0 until k).flatMap { c =>
      val base = c * 10L
      Seq(base -> (base + 1), (base + 1) -> (base + 2),
        (base + 2) -> base) ++
        (if (c + 1 < k) Seq((base + 2) -> (c + 1) * 10L) else Nil)
    }
    time("chain4") {
      println(Scc.stronglyConnected(chain.toDF("src", "dst"))
        .collect().length)
    }
    val rnd = new scala.util.Random(20260815L)
    for (p <- Seq(0.03, 0.08)) {
      val nn = 40
      val redges = for {
        a <- 1 to nn; b <- 1 to nn
        if a != b && rnd.nextDouble() < p
      } yield a.toLong -> b.toLong
      time(s"random-$p") {
        println(Scc.stronglyConnected(redges.toDF("src", "dst"))
          .collect().length)
      }
    }
    spark.stop()
  }
}
