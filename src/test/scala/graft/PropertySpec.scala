package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based invariants (SURVEY §5.2.4) — random inputs checked
  * against in-memory reference models:
  *
  *   - relational algebra (filter / union / distinct / except) over a
  *     `Dataset` equals the Scala-collection model;
  *   - [[graft.operators.Sampling.splitColumn]] totally partitions any
  *     dataset for any generated weight vector;
  *   - the pub/sub hub delivers any random event sequence exactly
  *     once, in publication order (the reference's §1.3 contract).
  */
object PropertySpec extends Properties("graft") {

  private lazy val spark = graft.streaming.TestSpark.spark

  // Spark jobs per case are not free — a handful of random cases per
  // property is the right budget (each exercises a full plan).
  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(8)

  private val smallInts: Gen[List[Int]] =
    Gen.listOfN(40, Gen.chooseNum(-50, 50))

  property("filter/union/distinct/except match the collection model") =
    forAll(smallInts, smallInts, Gen.chooseNum(-50, 50)) { (xs, ys, t) =>
      import spark.implicits._
      val dx = xs.toDS()
      val dy = ys.toDS()
      val gotFilter = dx.filter(_ > t).collect().toList.sorted
      val gotUnion = dx.union(dy).collect().toList.sorted
      val gotDistinct = dx.distinct().collect().toList.sorted
      val gotExcept = dx.except(dy).collect().toList.sorted
      gotFilter == xs.filter(_ > t).sorted &&
      gotUnion == (xs ++ ys).sorted &&
      gotDistinct == xs.distinct.sorted &&
      gotExcept == xs.distinct.filterNot(ys.toSet).sorted
    }

  private val weightsGen: Gen[List[Int]] = for {
    n <- Gen.chooseNum(2, 5)
    cuts <- Gen.listOfN(n - 1, Gen.chooseNum(1, 999))
  } yield {
    val sorted = (0 :: 1000 :: cuts).distinct.sorted
    sorted.zip(sorted.tail).map { case (a, b) => b - a }.filter(_ > 0)
  }

  property("splitColumn totally partitions for any weight vector") =
    forAll(weightsGen, Gen.chooseNum(100L, 2000L)) { (ws, n) =>
      import org.apache.spark.sql.functions._
      val named = ws.zipWithIndex.map { case (w, i) => s"s$i" -> w }
      val counts = spark.range(n)
        .withColumn("split",
          graft.operators.Sampling.splitColumn(col("id"), named))
        .groupBy("split").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      counts.values.sum == n && counts.keySet.subsetOf(named.map(_._1).toSet)
    }

  property("native top-k == per-group model for any data and k") =
    forAll(
      Gen.listOfN(120, Gen.zip(Gen.chooseNum(0, 8), Gen.chooseNum(-30, 30))),
      Gen.chooseNum(1, 12)) { (rows, k) =>
      import spark.implicits._
      // unique tiebreaker index makes the order total, so the bounded
      // heap and the in-memory model must agree EXACTLY
      val data = rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
      val got = graft.operators.TopK.perGroup(
          data.toDF("g", "v", "i"), Seq("g"),
          Seq(("v", false), ("i", true)), k)
        .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
        .toList.sorted
      val want = data.groupBy(_._1).values.flatMap(
          _.sortBy { case (_, v, i) => (-v, i) }.take(k))
        .toList.sorted
      got == want
    }

  private val randomEdges: Gen[List[(Long, Long)]] =
    Gen.listOfN(60, Gen.zip(Gen.chooseNum(0L, 14L), Gen.chooseNum(0L, 14L)))
      .map(_.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b)) }.distinct)
      .suchThat(_.nonEmpty)

  property("KTruss.support == brute-force triangle recount; peel " +
      "survivors all meet the threshold") =
    forAll(randomEdges, Gen.chooseNum(3, 5)) { (es, k) =>
      import spark.implicits._
      val edf = es.toDF("u", "v")
      val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def supOf(e: (Long, Long)): Long =
        (adj(e._1) & adj(e._2)).size.toLong
      val got = graft.operators.KTruss.support(edf).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val supportExact = got == es.map(e => e -> supOf(e)).toMap
      // one peel round: survivors' support measured on the INPUT set
      val peeled = graft.operators.KTruss.peelProfile(edf, k, rounds = 1)
        .collect().map(r => r.getAs[Long]("round") ->
          r.getAs[Long]("n_edges")).toMap
      val wantAfter = es.count(e => supOf(e) >= k - 2).toLong
      supportExact && peeled(0L) == es.size.toLong &&
        peeled(1L) == wantAfter
    }

  property("weightedSystematic == integer-midpoint model for any data") =
    forAll(
      Gen.listOfN(60,
        Gen.zip(Gen.chooseNum(0, 4), Gen.chooseNum(0L, 100L))),
      Gen.chooseNum(1, 5)) { (rows, k) =>
      import spark.implicits._
      // unique id per row makes the per-stratum order total
      val data = rows.zipWithIndex.map { case ((s, w), i) =>
        (s.toString, i.toLong, w)
      }
      val got = graft.operators.Sampling
        .weightedSystematic(data.toDF("s", "id", "w"), "s", "id", "w", k)
        .select("s", "sample_idx", "id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toList.sorted
      // reference model: same integer arithmetic in plain Scala
      val want = data.groupBy(_._1).toList.flatMap { case (s, rs) =>
        val sorted = rs.sortBy(_._2)
        val total = sorted.map(_._3).sum
        val cums = sorted.scanLeft(0L)(_ + _._3).tail
        (0 until k).flatMap { i =>
          val t = total * (2L * i + 1) / (2L * k)
          sorted.zip(cums).find { case ((_, _, w), cumEnd) =>
            t >= cumEnd - w && t < cumEnd
          }.map { case ((_, id, _), _) => (s, i.toLong, id) }
        }
      }.sorted
      got == want
    }

  property("CMS estimate == min-of-cells model; never below exact") =
    forAll(Gen.listOfN(300, Gen.chooseNum(0L, 40L)),
      Gen.chooseNum(2, 4)) { (ks, d) =>
      import spark.implicits._
      val w = 32
      val cms = graft.operators.Cms.build(ks.toDF("k"),
        org.apache.spark.sql.functions.col("k"), d, w)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      // in-memory model of the same portable-hash cells
      def bucket(i: Int, k: Long): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$i:$k".getBytes("UTF-8"))
        val hex = md.map("%02x".format(_)).mkString.take(14)
        java.lang.Long.parseLong(hex, 16) % w
      }
      val exact = ks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val probed = graft.operators.Cms
        .probe(graft.operators.Cms.build(ks.toDF("k"),
            org.apache.spark.sql.functions.col("k"), d, w),
          exact.keys.toSeq.toDF("k"),
          org.apache.spark.sql.functions.col("k"), d, w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      exact.forall { case (k, cnt) =>
        val model = (0 until d)
          .map(i => cms.getOrElse((i, bucket(i, k)), 0L)).min
        probed(k) == model && probed(k) >= cnt
      }
    }

  property("greedyPack matches the sequential next-fit model") =
    forAll(Gen.listOfN(60, Gen.chooseNum(1L, 400L)),
      Gen.chooseNum(100L, 600L)) { (toks, budget) =>
      import spark.implicits._
      import graft.operators.Packing
      val docs = toks.zipWithIndex
        .map { case (n, i) => (i.toLong, n) }.toDF("doc_id", "toks")
      val got = Packing.greedyPack(docs, "doc_id", org.apache.spark.sql
          .functions.col("toks"), budget, shards = 3, salt = "prop")
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("shard"), r.getAs[Long]("pack_id"),
            r.getAs[Long]("used_before"))))
        .toMap
      // in-memory model: the same two-register fold per shard over
      // the doc_id-sorted sequence, shard from the portable hash of
      // the Spark run itself (shard assignment is pinned by the model
      // CONSISTENCY check: same shard -> same sequence walk)
      val byShard = got.toSeq.groupBy(_._2._1)
      byShard.forall { case (_, ds) =>
        val ordered = ds.sortBy(_._1)
        var pack = 0L; var used = 0L
        ordered.forall { case (id, (_, gotPack, gotBefore)) =>
          val n = toks(id.toInt)
          if (used > 0 && used + n > budget) { pack += 1; used = 0L }
          val ok = gotPack == pack && gotBefore == used
          used += n
          ok
        }
      } && got.size == toks.size
    }

  property("LogHistogram bucket edges bracket every value in " +
      "[1, 2^62), one sub-bucket wide") =
    forAll(Gen.listOfN(30, Gen.oneOf(
      Gen.chooseNum(1L, 1000L), // tiny octaves incl. pow < k
      Gen.chooseNum(1L, (1L << 62) - 1), // full documented domain
      Gen.oneOf(1L, 2L, 15L, 16L, 17L, (1L << 61) - 1, (1L << 61),
        (1L << 62) - 1)))) { vs => // edge values pinned explicitly
      import spark.implicits._
      import graft.operators.LogHistogram
      val k = 16
      val rows = vs.toDF("v")
        .withColumn("b", LogHistogram.bucket("v", k))
        .select(org.apache.spark.sql.functions.col("v"),
          LogHistogram.lowerEdge("b", k).as("lo"),
          LogHistogram.upperEdge("b", k).as("hi"))
        .collect()
      rows.forall { r =>
        val (v, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2))
        // containment (the x26 bracket) and the (k+1)/k relative bound
        lo <= v && v <= hi && hi >= 1 &&
          BigInt(hi) * k <= BigInt(v) * (k + 1)
      }
    }

  /** Random small corpus with injected near-duplicates: most docs are
    * fresh word soup over a 24-word vocab (so shingles genuinely
    * collide), ~a third copy an earlier doc with zero or one appended
    * word (high-Jaccard pairs), and lengths down to one word exercise
    * the too-short-to-shingle left-completion path.
    */
  private val corpusGen: Gen[List[(Long, String)]] = {
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo",
      "foxtrot", "golf", "hotel", "india", "juliet", "kilo", "lima",
      "mike", "november", "oscar", "papa", "quebec", "romeo", "sierra",
      "tango", "uniform", "victor", "whiskey", "xray")
    for {
      n <- Gen.chooseNum(20, 45)
      fresh <- Gen.listOfN(n, for {
        len <- Gen.chooseNum(1, 18)
        ws <- Gen.listOfN(len, Gen.oneOf(vocab))
      } yield ws.mkString(" "))
      dupOf <- Gen.listOfN(n, Gen.option(Gen.chooseNum(0, n - 1)))
      extra <- Gen.listOfN(n, Gen.oneOf("" +: vocab))
    } yield fresh.indices.toList.map { i =>
      val text = dupOf(i) match {
        case Some(j) if j < i =>
          if (extra(i).isEmpty) fresh(j) else s"${fresh(j)} ${extra(i)}"
        case _ => fresh(i)
      }
      (i.toLong, text)
    }
  }

  property("persisted-index probe (d17) == in-memory probe (d13) " +
      "for any corpus") =
    forAll(corpusGen) { docs =>
      import spark.implicits._
      // the storage path under test: build THROUGH the bucketed
      // saveAsTable writer, probe by reading back — must be
      // row-identical to the memo-fed in-memory probe on the same dir
      val dir = java.nio.file.Files
        .createTempDirectory("graft-prop-d17-").toString
      docs.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val inMem = SparkEntry.queries("d13_incremental_dedup")(spark, dir)
        .collect().map(_.toString).toList
      val persisted = SparkEntry
        .queries("d17_persisted_index_dedup")(spark, dir)
        .collect().map(_.toString).toList
      graft.queries.Dedup.releaseShared(spark, dir)
      persisted == inMem
    }

  private val eaggCase: Gen[(List[(Int, Int)], List[(Int, Int)])] = for {
    nf <- Gen.chooseNum(0, 30)
    fact <- Gen.listOfN(nf,
      Gen.zip(Gen.chooseNum(0, 5), Gen.chooseNum(0, 100)))
    nd <- Gen.chooseNum(0, 12)
    // duplicate dim keys on purpose: the rewrite's exactness argument
    // rests on per-key multiplicity, so the generator must produce it
    dim <- Gen.listOfN(nd,
      Gen.zip(Gen.chooseNum(0, 7), Gen.chooseNum(0, 2)))
  } yield (fact, dim)

  private val eaggDirSeq = new java.util.concurrent.atomic.AtomicInteger()

  property("eager aggregation ≡ plain rollup on random fact/dim " +
      "(dup dim keys included)") =
    forAll(eaggCase) { case (fact, dim) =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dir = s"/tmp/graft-prop-eagg/${eaggDirSeq.incrementAndGet()}"
      fact.toDF("fk", "cents").coalesce(1)
        .write.mode("overwrite").parquet(dir)
      def q() = {
        val f = spark.read.parquet(dir)
        val d = dim.toDF("k", "grp")
        f.join(d, f("fk") === d("k")).groupBy($"grp")
          .agg(count(lit(1)).as("n"), sum($"cents").as("s"),
            min($"cents").as("mn"), max($"cents").as("mx"))
          .orderBy($"grp")
      }
      val base = q().collect().toSeq // dir not licensed yet: plain plan
      graft.plans.EagerAggregation.register(
        graft.plans.EagerAggFact(dir, "fk"))
      val rewritten = q()
      // an empty side is folded to an empty LocalRelation by the main
      // optimizer before user rules run — no join left to rewrite, so
      // the fire check only applies to non-degenerate inputs
      val mustFire = fact.nonEmpty && dim.nonEmpty
      (!mustFire ||
        rewritten.queryExecution.optimizedPlan.toString
          .contains("geag_")) &&
        rewritten.collect().toSeq == base
    }

  // ---- adversarial coverage of the licensed-optimizer refusal -------
  // surfaces: random aggregate-over-join SHAPES (join type, grouping
  // side, measure mix, filters) against each rule, asserting the full
  // dichotomy — rewrite-fires ⇒ result identical to the unlicensed
  // run, rewrite-declines ⇒ optimized plan untouched (canonicalized
  // plan equality, so exprId noise doesn't mask a silent change).
  // register/unregister bracket each case so the global licenses of
  // x29/x30/x31 are never disturbed.

  private val propDirSeq = new java.util.concurrent.atomic.AtomicInteger()

  private def canon(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.canonicalized.toString

  // every generator mixes ~30% canonical KNOWN-FIRING shapes into the
  // random stream, so both dichotomy branches (fire ⇒ equal, decline
  // ⇒ untouched) are exercised on every run — a purely random mix
  // could spend all 8 cases on declines and never test the fire arm
  private val eaggShape: Gen[(String, List[String], List[String])] =
    Gen.frequency(
      3 -> Gen.const(("inner", List("grp_d"), List("count", "sum_f"))),
      7 -> (for {
        jt <- Gen.oneOf("inner", "left_outer", "left_semi")
        gb <- Gen.someOf(List("grp_d", "flag_f")).map(_.toList)
        aggs <- Gen.atLeastOne(List("count", "sum_f", "min_f", "max_f",
          "avg_f", "cd_f", "sum_d")).map(_.toList)
      } yield (jt, gb, aggs)))

  property("eager-agg dichotomy over random join/grouping/measure " +
      "shapes: fires ⇒ equal, declines ⇒ plan untouched") =
    forAll(eaggShape) { case (jt, gb0, aggs0) =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      // dim columns don't exist after a semi join — restrict shapes
      // to well-formed queries
      val gb = if (jt == "left_semi") gb0.filter(_ != "grp_d") else gb0
      val aggs1 = if (jt == "left_semi") aggs0.filter(_ != "sum_d")
        else aggs0
      val aggs = if (aggs1.isEmpty) List("count") else aggs1
      val dir = s"/tmp/graft-prop-eaggshape/${propDirSeq.incrementAndGet()}"
      spark.range(40).select(($"id" % 6).as("fk"),
          ($"id" % 100).as("cents"), ($"id" % 2 === 0).as("flag_f"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
      def q() = {
        val f = spark.read.parquet(dir)
        // duplicate dim keys on purpose (multiplicity is the rewrite's
        // whole exactness argument)
        val d = Seq((0, "a"), (1, "b"), (2, "a"), (3, "c"), (3, "c2"),
          (5, "b"), (7, "z")).toDF("k", "grp_d")
        val j = f.join(d, f("fk") === d("k"), jt)
        val cols = aggs.map {
          case "count" => count(lit(1)).as("n")
          case "sum_f" => sum($"cents").as("s")
          case "min_f" => min($"cents").as("mn")
          case "max_f" => max($"cents").as("mx")
          case "avg_f" => avg($"cents").as("av")
          case "cd_f" => countDistinct($"cents").as("cd")
          case "sum_d" => sum(length($"grp_d")).as("sd")
        }
        val g = if (gb.isEmpty) j.groupBy() else j.groupBy(gb.map(col): _*)
        val a = g.agg(cols.head, cols.tail: _*)
        if (gb.isEmpty) a else a.orderBy(gb.map(col): _*)
      }
      val lic = graft.plans.EagerAggFact(dir, "fk")
      graft.plans.EagerAggregation.unregister(lic)
      val p0 = canon(q()); val r0 = q().collect().toSeq
      graft.plans.EagerAggregation.register(lic)
      try {
        val q1 = q()
        val fired = q1.queryExecution.optimizedPlan.toString
          .contains("geag_")
        // the canonical seeded shape MUST fire — a silently-dead rule
        // would otherwise pass every case through the decline branch
        val mustFire = jt == "inner" && gb == List("grp_d") &&
          aggs == List("count", "sum_f")
        (!mustFire || fired) &&
          (if (fired) q1.collect().toSeq == r0 else canon(q()) == p0)
      } finally graft.plans.EagerAggregation.unregister(lic)
    }

  private val mvShape: Gen[(Boolean, List[String], List[String])] =
    Gen.frequency(
      3 -> Gen.const((false, List("k1", "k2"),
        List("count", "sum_dec"))),
      7 -> (for {
        withFilter <- Gen.oneOf(true, false)
        gb <- Gen.someOf(List("k1", "k2", "nonkey")).map(_.toList)
        aggs <- Gen.atLeastOne(List("count", "sum_dec", "min", "max",
          "avg", "sum_plain", "cd")).map(_.toList)
      } yield (withFilter, gb, aggs)))

  property("matview-route dichotomy over random filter/grouping/" +
      "measure shapes") =
    forAll(mvShape) { case (withFilter, gb, aggs) =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.execution.datasources.LogicalRelation
      import org.apache.spark.sql.types.DecimalType
      val seq = propDirSeq.incrementAndGet()
      val base = s"/tmp/graft-prop-mv/$seq/base"
      val mvp = s"/tmp/graft-prop-mv/$seq/mv"
      spark.range(60).select(
          concat(lit("g"), ($"id" % 3).cast("string")).as("k1"),
          ($"id" % 4).as("k2"), ($"id" % 7).cast("double").as("v"),
          ($"id" % 11).as("w"), ($"id" % 5).as("nonkey"))
        .coalesce(1).write.mode("overwrite").parquet(base)
      spark.read.parquet(base).groupBy($"k1", $"k2")
        .agg(count(lit(1)).as("mvprop_cnt"),
          sum($"v".cast(DecimalType(18, 2))).as("mvprop_sum"),
          min($"v").as("mvprop_min"), max($"v").as("mvprop_max"))
        .write.mode("overwrite").parquet(mvp)
      val mvPlan = spark.read.parquet(mvp).queryExecution.analyzed
      def q() = {
        val b0 = spark.read.parquet(base)
        val b = if (withFilter) b0.filter($"w" >= 0) else b0
        val cols = aggs.map {
          case "count" => count(lit(1)).as("n")
          case "sum_dec" => sum($"v".cast(DecimalType(18, 2)))
            .cast("double").as("s")
          case "min" => min($"v").as("mn")
          case "max" => max($"v").as("mx")
          case "avg" => avg($"v").as("av")
          case "sum_plain" => sum($"w").as("sw")
          case "cd" => countDistinct($"v").as("cd")
        }
        val g = if (gb.isEmpty) b.groupBy() else b.groupBy(gb.map(col): _*)
        val a = g.agg(cols.head, cols.tail: _*)
        if (gb.isEmpty) a else a.orderBy(gb.map(col): _*)
      }
      graft.plans.MatviewRewrite.unregister(base)
      val p0 = canon(q()); val r0 = q().collect().toSeq
      graft.plans.MatviewRewrite.register(graft.plans.MatviewDef(
        pathMarker = base, keys = Set("k1", "k2"),
        countCol = "mvprop_cnt", sumCols = Map.empty,
        sumDecCols = Map(("v", DecimalType(18, 2)) -> "mvprop_sum"),
        minCols = Map("v" -> "mvprop_min"),
        maxCols = Map("v" -> "mvprop_max"),
        freshPlan = () => mvPlan.transformUp {
          case lr: LogicalRelation => lr.newInstance()
        }))
      try {
        val q1 = q()
        val fired = q1.queryExecution.optimizedPlan.toString
          .contains("mvprop_")
        val mustFire = !withFilter && gb == List("k1", "k2") &&
          aggs == List("count", "sum_dec")
        (!mustFire || fired) &&
          (if (fired) q1.collect().toSeq == r0 else canon(q()) == p0)
      } finally graft.plans.MatviewRewrite.unregister(base)
    }

  private val fkShape: Gen[(String, Boolean, Boolean)] =
    Gen.frequency(
      3 -> Gen.const(("inner", false, false)),
      7 -> (for {
        jt <- Gen.oneOf("inner", "left_outer")
        readDim <- Gen.oneOf(true, false)
        dimFiltered <- Gen.oneOf(true, false)
      } yield (jt, readDim, dimFiltered)))

  property("fk-join-elimination dichotomy over random join/column/" +
      "filter shapes") =
    forAll(fkShape) { case (jt, readDim, dimFiltered) =>
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val seq = propDirSeq.incrementAndGet()
      val factDir = s"/tmp/graft-prop-fk/$seq/fact"
      val dimDir = s"/tmp/graft-prop-fk/$seq/dim"
      // integrity holds by construction: fk non-null ∈ dim's unique pk
      spark.range(50).select(($"id" % 10).as("fk"),
          ($"id" % 3).as("cat"), ($"id" % 100).as("cents"))
        .coalesce(1).write.mode("overwrite").parquet(factDir)
      spark.range(10).select($"id".as("pk"),
          concat(lit("d"), $"id").as("dname"))
        .coalesce(1).write.mode("overwrite").parquet(dimDir)
      def q() = {
        val f = spark.read.parquet(factDir)
        val d0 = spark.read.parquet(dimDir)
        val d = if (dimFiltered) d0.filter($"pk" =!= 3L) else d0
        val j = f.join(d, f("fk") === d("pk"), jt)
        val g = if (readDim) j.groupBy($"cat", $"dname")
          else j.groupBy($"cat")
        g.agg(count(lit(1)).as("n"), sum($"cents").as("s"))
          .orderBy($"cat")
      }
      val lic = graft.plans.VerifiedFkJoin(factDir, dimDir, "fk", "pk")
      graft.plans.FkJoinElimination.unregister(lic)
      val p0 = canon(q()); val r0 = q().collect().toSeq
      graft.plans.FkJoinElimination.register(lic)
      try {
        val q1 = q()
        // fired ⇔ the dimension scan is gone from the physical plan
        val fired = !q1.queryExecution.executedPlan.toString
          .contains("/dim")
        val mustFire = jt == "inner" && !readDim && !dimFiltered
        (!mustFire || fired) &&
          (if (fired) q1.collect().toSeq == r0 else canon(q()) == p0)
      } finally graft.plans.FkJoinElimination.unregister(lic)
    }

  // ---- codec totality fuzz ------------------------------------------
  // every decoder's contract is "one poison blob must not kill a
  // 100 TB job": arbitrary garbage AND random single-byte corruptions
  // of VALID payloads must produce a row (possibly the sentinel),
  // never an exception. Corrupted-valid inputs are the sharper probe —
  // they reach deep parser states that pure garbage never does.
  private val fuzzCase: Gen[(Int, List[Byte], Int, Byte)] = for {
    codec <- Gen.chooseNum(0, 13)
    garbage <- Gen.listOfN(300, Gen.chooseNum(-128, 127).map(_.toByte))
    flipAt <- Gen.chooseNum(0, 10000)
    flipTo <- Gen.chooseNum(-128, 127).map(_.toByte)
  } yield (codec, garbage, flipAt, flipTo)

  property("codecs are total: garbage and corrupted payloads never throw") =
    forAll(fuzzCase) { case (codec, garbage, flipAt, flipTo) =>
      import graft.operators._
      val valid: Array[Byte] = codec match {
        case 0 => PngMediaCodec.encodeRgb8(6, 5,
          Array.tabulate(90)(i => (i * 7).toByte))
        case 1 => ("P6\n4 3\n255\n" + "x" * 36).getBytes("US-ASCII")
        case 2 =>
          val out = new java.io.ByteArrayOutputStream()
          val g = new java.util.zip.GZIPOutputStream(out)
          g.write(("WARC/1.0\r\nWARC-Type: response\r\n" +
            "Content-Length: 5\r\n\r\nhello\r\n\r\n").getBytes("UTF-8"))
          g.close(); out.toByteArray
        case 3 =>
          val out = new java.io.ByteArrayOutputStream()
          val z = new com.github.luben.zstd.ZstdOutputStream(out)
          z.write("{\"a\":1}\n{\"a\":2}".getBytes("UTF-8"))
          z.close(); out.toByteArray
        case 4 => ("YUV4MPEG2 W2 H2 F25:1\nFRAME\n" + "abcdef")
          .getBytes("US-ASCII")
        case 5 => TarIngest.tarGz(Seq(("a.txt", "hello fuzz")))
        case 6 => JpegMediaCodec.encodeRgb8(6, 5,
          Array.tabulate(90)(i => (i * 7).toByte))
        case 7 => WavCodec.wavContainer(7, 1, 8000, 8, 1,
          Array.tabulate(32)(i => (i * 11).toByte))
        case 8 => AviCodec.aviMjpeg(4, 4, Seq(
          JpegMediaCodec.encodeRgb8(4, 4,
            Array.tabulate(48)(i => (i * 5).toByte))))
        case 9 => GifMediaCodec.encodeGray8(6, 5,
          Array.tabulate(30)(i => (i * 9).toByte))
        case 10 => FlacCodec.encodeMono(
          Array.tabulate(64)(i => (i * 37) % 2000 - 1000), 8000,
          blockSize = 32, order = 2)
        case 11 => FlvScreenVideo.encode(20, 20, 16, 16, Seq(
          FlvScreenVideo.SvFrame(key = true, Map(
            0 -> Array.tabulate(16 * 16)(i => (i * 3).toByte),
            1 -> Array.tabulate(4 * 16)(i => (i * 5).toByte),
            2 -> Array.tabulate(16 * 4)(i => (i * 7).toByte),
            3 -> Array.tabulate(4 * 4)(i => (i * 11).toByte))),
          FlvScreenVideo.SvFrame(key = false, Map(
            3 -> Array.fill(4 * 4)(42.toByte)))))
        case 12 => Mp1Codec.encodeMono(Seq(Mp1Codec.Mp1Frame(
          Array.tabulate(32)(sb => if (sb % 4 == 0) 2 + sb % 8 else 0),
          Array.tabulate(32)(sb => (sb * 7) % 63),
          Array.tabulate(32, 12)((sb, q) =>
            if (sb % 4 == 0) (sb * 29 + q * 3) % (1 << (2 + sb % 8))
            else 0))))
        case _ => JpegScratch.encodeCoeffs(16, 16, Array.tabulate(4) { b =>
          val zz = new Array[Int](64)
          zz(0) = b * 40 - 60; zz(1 + b) = 7 - b * 3; zz(55) = 1 + b
          zz
        }, restartInterval = 2)
      }
      val corrupted = valid.clone()
      corrupted(flipAt % corrupted.length) = flipTo
      val inputs = Seq(garbage.toArray, corrupted, valid)
      inputs.forall { b =>
        codec match {
          case 0 =>
            PngMediaCodec.decode(1L, b)
            PngMediaCodec.resize(b, 2)
            PngMediaCodec.perceptualHash(1L, b, 8); true
          case 1 =>
            PpmMediaCodec.decode(1L, b)
            PpmMediaCodec.resize(b, 2)
            PpmMediaCodec.perceptualHash(1L, b, 8); true
          case 2 => WarcIngest.records(1L, b).nonEmpty &&
            WarcIngest.docs(1L, b).nonEmpty
          case 3 => ZstdLines.lines(1L, b).nonEmpty
          case 4 => Y4mCodec.frameSample(1L, b, 2).nonEmpty
          case 5 => TarIngest.entries(1L, b).nonEmpty &&
            TarIngest.docs(1L, b).nonEmpty
          case 6 =>
            JpegMediaCodec.decode(1L, b)
            JpegMediaCodec.resize(b, 2)
            JpegMediaCodec.perceptualHash(1L, b, 8)
            JpegMediaCodec.meta(1L, b); true
          case 7 => WavCodec.decode(1L, b).n_samples >= -1L
          case 8 => AviCodec.frameSample(1L, b, 2).nonEmpty
          case 9 =>
            GifMediaCodec.decode(1L, b)
            GifMediaCodec.resize(b, 2)
            GifMediaCodec.perceptualHash(1L, b, 8); true
          case 10 => FlacCodec.decode(1L, b).n_samples >= -1L
          case 11 => FlvScreenVideo.decode(1L, b).n_frames >= -1L
          case 12 => Mp1Codec.decode(1L, b).n_frames >= -1L
          case _ => JpegScratch.decode(1L, b).n_blocks >= -1L
        }
      } && {
        WavCodec.decode(1L, garbage.toArray) // WAV on garbage too
        true
      }
    }

  // random digraphs, labels checked against a boolean reachability
  // closure (Floyd–Warshall over ≤12 nodes): SCC(v)=SCC(w) ⟺ mutual
  // reach, label = min member; star/label-prop CC against the same
  // closure with symmetric edges. Generator-driven cover for the two
  // component operators beyond their hand-picked spec shapes.
  private val digraphGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(4, 12)
    m <- Gen.chooseNum(n, 3 * n)
    es <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
    } yield (a.toLong, b.toLong))
  } yield es.filter(e => e._1 != e._2).distinct

  private def closure(edges: Seq[(Long, Long)], sym: Boolean)
      : Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val r = Array.fill(n, n)(false)
    nodes.indices.foreach(i => r(i)(i) = true)
    edges.foreach { case (a, b) =>
      r(idx(a))(idx(b)) = true
      if (sym) r(idx(b))(idx(a)) = true
    }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (r(i)(k) && r(k)(j)) r(i)(j) = true
    nodes.map { v =>
      val i = idx(v)
      v -> nodes.indices.filter(j => r(i)(j) && r(j)(i))
        .map(nodes).min
    }.toMap
  }

  property("SCC matches the mutual-reach closure on random digraphs") =
    forAll(digraphGen) { edges =>
      edges.isEmpty || {
        import spark.implicits._
        val got = graft.operators.Scc
          .stronglyConnected(edges.toDF("src", "dst"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == closure(edges, sym = false)
      }
    }

  property("both CC modes match the reach closure on random graphs") =
    forAll(digraphGen) { edges =>
      edges.isEmpty || {
        import spark.implicits._
        val model = closure(edges, sym = true)
        val df = edges.toDF("d1", "d2")
        val star = graft.operators.Clusters.connectedComponentsStar(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val prop = graft.operators.Clusters.connectedComponents(df)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        star == model && prop == model
      }
    }

  // d20's blocking identity (SymSpell): lev(a,b) ≤ 2 ⟹ the depth-2
  // deletion neighborhoods of a and b intersect — deleting the ≤2
  // edited positions from each side of an optimal alignment yields a
  // common string. The query's levenshtein post-filter removes false
  // positives, so candidate COMPLETENESS is the property that must
  // hold for the join to be exact.
  property("depth-2 deletion neighborhoods intersect whenever lev ≤ 2") = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def del1(w: String): Set[String] =
      (0 until w.length).map(i => w.take(i) + w.drop(i + 1)).toSet + w
    def del2(w: String): Set[String] = del1(w).flatMap(del1)
    val word = Gen.chooseNum(3, 8)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    // edit b out of a: random small perturbations keep many pairs ≤ 2
    val perturbed = for {
      a <- word
      nOps <- Gen.chooseNum(0, 3)
      ops <- Gen.listOfN(nOps, Gen.oneOf(0, 1, 2))
      seeds <- Gen.listOfN(nOps, Gen.chooseNum(0, 1000))
    } yield {
      var b = a
      ops.zip(seeds).foreach { case (op, sd) =>
        if (b.nonEmpty) {
          val i = sd % b.length
          op match {
            case 0 => b = b.take(i) + b.drop(i + 1) // delete
            case 1 => b = b.take(i) + ('a' + sd % 3).toChar + b.drop(i) // ins
            case _ => b = b.take(i) + ('a' + sd % 3).toChar + b.drop(i + 1)
          }
        }
      }
      (a, b)
    }
    forAll(perturbed) { case (a, b) =>
      lev(a, b) > 2 || (del2(a) & del2(b)).nonEmpty
    }
  }

  // d21's blocking guarantee: any pair whose floor-div Jaccard
  // per-mille meets the threshold must share a token within BOTH
  // rare-first prefixes of length m − ceil(m·t) + 1 — the exact plen
  // formula prefixFilterCandidates computes. This is the completeness
  // half (no false negatives); the exact verify removes the rest.
  property("prefix filtering is complete: J ≥ t pairs collide in both " +
      "prefixes") = {
    val gen = for {
      nDocs <- Gen.chooseNum(2, 8)
      tPm <- Gen.oneOf(500L, 700L, 800L, 900L)
      docs <- Gen.listOfN(nDocs,
        Gen.nonEmptyListOf(Gen.chooseNum(0, 15)).map(_.distinct))
    } yield (docs, tPm)
    forAll(gen) { case (docs, tPm) =>
      val df = docs.flatten.groupBy(identity)
        .map { case (k, v) => k -> v.size }
      def prefix(s: List[Int]): Set[Int] = {
        val m = s.size.toLong
        val plen = (m - (m * tPm + 999) / 1000 + 1).toInt
        s.sortBy(t => (df(t), t)).take(plen).toSet
      }
      docs.indices.forall { i =>
        (i + 1 until docs.size).forall { j =>
          val a = docs(i).toSet
          val b = docs(j).toSet
          val inter = (a & b).size.toLong
          val jpm = inter * 1000 / (a | b).size
          jpm < tPm || (prefix(docs(i)) & prefix(docs(j))).nonEmpty
        }
      }
    }
  }

  // arbitrary Unicode minus unpaired surrogates (a lone surrogate is
  // not a valid string; the log never needs to carry one)
  private val utfString: Gen[String] =
    Gen.listOf(Gen.frequency(
      6 -> Gen.asciiPrintableChar,
      2 -> Gen.oneOf('"', '\\', '\n', '\r', '\t'),
      1 -> Gen.chooseNum(0x20, 0xD7FF).map(_.toChar),
      1 -> Gen.chooseNum(0, 0x1F).map(_.toChar)))
      .map(_.mkString)

  property("manifest JSON escaping round-trips any string") =
    forAll(utfString) { s =>
      import graft.operators.ManifestTable.{jsonEscape, jsonUnescape}
      val esc = jsonEscape(s)
      jsonUnescape(esc) == s &&
        // the escaped form never contains a raw newline (the manifest
        // grammar is line-based) and the parser's own string regex
        // consumes it whole (no unescaped quote terminates early)
        !esc.exists(c => c == '\n' || c == '\r') &&
        ("\"" + """((?:[^"\\]|\\.)*)""" + "\"").r
          .findFirstMatchIn("\"" + esc + "\"")
          .exists(_.group(1) == esc)
    }

  // hostile names/values for the inline-object fragments: braces and
  // commas are the fragment grammar's own delimiters, so they MUST
  // survive fieldEscape's \\u escapes
  private val hostileName: Gen[String] =
    Gen.nonEmptyListOf(Gen.frequency(
      6 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('"', '\\', '{', '}', ',', '=', '/', ' ')))
      .map(_.mkString)

  private val manifestEntries: Gen[Vector[graft.operators.ManifestTable.ManifestEntry]] =
    Gen.listOf(for {
      p <- Gen.nonEmptyListOf(Gen.frequency(
        8 -> Gen.alphaNumChar, 1 -> Gen.oneOf('"', '\\', '/', ' ')))
        .map(_.mkString)
      rows <- Gen.chooseNum(0L, 1000000L)
      stats <- Gen.option(for {
        lo <- Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)
        span <- Gen.chooseNum(0L, 1000L)
      } yield (lo, lo + span))
      part <- Gen.mapOf(Gen.zip(hostileName, hostileName))
        .map(_.take(3))
      mstats <- Gen.mapOf(Gen.zip(hostileName, for {
        lo <- Gen.chooseNum(-100000L, 100000L)
        span <- Gen.chooseNum(0L, 1000L)
      } yield (lo, lo + span))).map(_.take(3))
      dv <- Gen.option(Gen.alphaNumStr.suchThat(_.nonEmpty))
      dvRows <- Gen.chooseNum(0L, 1000L)
    } yield graft.operators.ManifestTable.ManifestEntry(
      p, rows, stats.map(_._1), stats.map(_._2), part, mstats,
      dv, if (dv.isDefined) dvRows else 0L)).map(_.toVector)

  property("a delta manifest body parses back to its exact actions") =
    forAll(manifestEntries, manifestEntries.map(_.map(_.path)),
        Gen.chooseNum(1, 999999), Gen.oneOf(true, false),
        Gen.option(utfString.suchThat(_.nonEmpty)),
        Gen.option(utfString.suchThat(_.nonEmpty)),
        Gen.oneOf(true, false),
        Gen.option(Gen.listOf(hostileName).map(_.take(3)))) {
      (adds, removes, v, compaction, txn, ddl, mor, partCols) =>
      import graft.operators.ManifestTable
      // spell the body exactly as tryCommit does (private — the
      // grammar is pinned here instead: header line + one action/line)
      def esc(s: String) = ManifestTable.jsonEscape(s)
      def fesc(s: String) = ManifestTable.fieldEscape(s)
      val hdr = (if (mor) s""", "mor": true""" else "") +
        txn.map(t => s""", "txn": "${esc(t)}"""").getOrElse("") +
        ddl.map(d => s""", "schema": "${esc(d)}"""").getOrElse("") +
        partCols.map(cs => s""", "part_cols": "${
          cs.map(fesc).mkString(",")}"""").getOrElse("")
      val body =
        s"""{"version": $v, "compaction": $compaction$hdr, "actions": [""" +
          "\n" +
        (adds.map { e =>
          val st = (e.lo, e.hi) match {
            case (Some(l), Some(h)) => s""", "lo": $l, "hi": $h"""
            case _ => ""
          }
          val part =
            if (e.part.isEmpty) ""
            else s""", "part": {${e.part.toSeq.sortBy(_._1).map {
              case (k, x) => s""""${fesc(k)}": "${fesc(x)}""""
            }.mkString(", ")}}"""
          val mstats =
            if (e.stats.isEmpty) ""
            else s""", "stats": {${e.stats.toSeq.sortBy(_._1).map {
              case (c, (l, h)) => s""""${fesc(c)}": [$l, $h]"""
            }.mkString(", ")}}"""
          val dvs = e.dv.map(x =>
            s""", "dv": "${esc(x)}", "dv_rows": ${e.dvRows}""")
            .getOrElse("")
          s"""  {"path": "${esc(e.path)}", "rows": ${e.rows}""" +
            s"""$st$part$mstats$dvs}"""
        } ++ removes.map(p =>
          s"""  {"path": "${esc(p)}", "remove": true}"""))
          .mkString(",\n") + "\n]}"
      val d = ManifestTable.parseManifest(body)
      d.version == v && d.compaction == compaction && d.txn == txn &&
        d.schemaDdl == ddl && d.adds == adds && d.removes == removes &&
        d.mor == mor &&
        d.partCols == partCols.map(_.filter(_.nonEmpty))
    }

  property("partition pruning is conservative and exact: every file " +
      "whose tuple matches the pinned value survives, every mismatch " +
      "is dropped") =
    forAll(
      Gen.listOf(Gen.zip(Gen.identifier, Gen.oneOf("a", "b", "c", "d"))),
      Gen.oneOf("a", "b", "c", "d")) { (files, want) =>
      import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal}
      import graft.operators.ManifestTable.ManifestEntry
      val attr = AttributeReference("g",
        org.apache.spark.sql.types.StringType)()
      val entries = files.zipWithIndex.map { case ((_, v), i) =>
        ManifestEntry(s"f$i", 1L, part = Map("g" -> v))
      }.toVector
      val kept = graft.sources.ManifestFileIndex.pruneEntries(
        entries, None, Seq(EqualTo(attr,
          Literal(org.apache.spark.unsafe.types.UTF8String.fromString(want),
            org.apache.spark.sql.types.StringType))))
      kept.forall(_.part("g") == want) &&
        entries.filter(_.part("g") == want).toSet == kept.toSet
    }

  property("manifest-stats pruning is conservative: every file whose " +
      "range intersects the pushed window survives") =
    forAll(
      Gen.listOf(for {
        lo <- Gen.chooseNum(-1000L, 1000L)
        span <- Gen.chooseNum(0L, 200L)
      } yield (lo, lo + span)),
      Gen.chooseNum(-1200L, 1200L), Gen.chooseNum(0L, 500L)) {
      (files, qlo, span) =>
      val qhi = qlo + span
      import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThanOrEqual, Literal}
      val attr = org.apache.spark.sql.catalyst.expressions
        .AttributeReference("k", org.apache.spark.sql.types.LongType)()
      val filters = Seq(
        GreaterThanOrEqual(attr, Literal(qlo)),
        LessThanOrEqual(attr, Literal(qhi)))
      graft.sources.ManifestFileIndex.rangeOf(filters, "k") match {
        case None => false // two conjuncts on k MUST yield a window
        case Some((lb, ub)) =>
          // conservative: the derived window contains the true one,
          // so an intersecting file can never be pruned
          lb <= qlo && ub >= qhi &&
            files.forall { case (flo, fhi) =>
              val intersects = fhi >= qlo && flo <= qhi
              val kept = fhi >= lb && flo <= ub
              !intersects || kept
            }
      }
    }

  property("hub delivers any sequence exactly once, in order") =
    forAll(Gen.listOfN(25, Gen.chooseNum(Int.MinValue, Int.MaxValue))) { xs =>
      val engine = new graft.streaming.EventEngine(spark)
      try {
        val hub = engine.hub[Int]("prop")
        val buf = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
        hub.subscribe().foreachOrdered(e => buf.add(e.payload))
        hub.postBatch(xs)
        engine.awaitQuiescence()
        import scala.jdk.CollectionConverters._
        buf.asScala.toList == xs
      } finally engine.close()
    }
}
