package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Strongly connected components of a DIRECTED graph — the directed
  * face of [[Clusters]] (undirected CC): cyclic trade / call /
  * dependency structure detection, where mutual reachability rather
  * than mere contact defines the group. Part of the graph-analytics
  * extension tier (SURVEY §2.3), like the rest of that tier not a
  * reference capability but a pipeline need the engine carries
  * first-class.
  *
  * Algorithm: multi-pivot forward-backward coloring (the FW-BW idea
  * of Fleischer–Hendrickson–Pınar 2000, run for ALL pivots at once —
  * the standard Pregel/GraphFrames spelling):
  *
  *  1. FORWARD min-label to fixpoint: `lbl(v)` = ≺-min node that
  *     can reach v (including v itself), under the HASHED total
  *     order ≺ of [[okey]], pointer-doubled — since `lbl(v)` reaches
  *     v and `lbl(lbl(v))` reaches `lbl(v)`, transitivity licenses
  *     the `lbl := lbl(lbl)` shortcut. Round complexity, honestly:
  *     when label regions form and merge in place (the common case —
  *     a fresh fixpoint over a cyclic core), the jump composes region
  *     chains and convergence is logarithmic in practice (a 1000-node
  *     directed ring closes in 16 rounds). But when a ≺-smaller label
  *     INVADES an already-converged region through a single entry
  *     point, the front advances at edge speed until it reaches the
  *     region's pivot NODE, whose relabeling then flips the whole
  *     region in one jump — so the worst-case round count is
  *     O(largest SCC diameter), the same bound every label-
  *     propagation SCC (GraphX, GraphFrames) carries. Real-graph SCC
  *     diameters are small; `maxIter` defaults high (300) because
  *     rounds are cheap keyed joins, not because many are expected.
  *     The label values partition nodes into color classes; each
  *     class's color c is the ≺-MINIMUM member (a ≺-smaller member
  *     would have kept its own label) and c reaches every member.
  *  2. BACKWARD min-label WITHIN color classes: `r(v)` = ≺-min node
  *     v can reach along intra-class edges. All intra-class nodes
  *     are ⪰ c, so `r(v) = c  ⇔  v reaches the pivot` — and with
  *     `c →* v` from step 1 that is exactly `v ∈ SCC(c)`.
  *  3. Settle `{v : r(v) = lbl(v)}` with `scc = lbl`, remove them,
  *     iterate on the residual subgraph. An SCC never straddles the
  *     boundary: mutual reachability forces one color class, and if
  *     any member reaches the pivot all members do. Every round
  *     settles at least each class's pivot SCC, so the round count
  *     is bounded by the longest pivot-elimination chain — small on
  *     real graphs (few large SCCs plus shallow periphery).
  *
  * Scale notes (100 TB): every step is a keyed equi-join between a
  * persisted, pre-partitioned edge list and a 1-row-per-node label
  * table (SHUFFLE_HASH-hinted — never sort the big side), the same
  * audited shape as the [[Clusters]] loop; label tables are eagerly
  * `localCheckpoint`-ed to keep lineage flat; convergence probes are
  * `isEmpty` (stop at first changed row). No transitive closure is
  * ever materialized — reachability lives only in the label
  * fixpoint, O(nodes) state per round.
  */
object Scc {

  private def parts(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  private implicit class CkptOps(private val df: DataFrame) {
    /** Stats-resetting eager checkpoint — see [[Ckpt.flat]] for why a
      * plain localCheckpoint would blow up the driver here. Only the
      * O(nodes) label tables go through it, never the edge fact table.
      */
    def ckptFlat: DataFrame = Ckpt.flat(df)
  }

  /** The propagation ORDER key: labels flow as `(xxhash64(id), id)`
    * structs and `min`/`least` compare lexicographically, so the
    * total order the fixpoint minimizes over is a deterministic hash
    * shuffle of the id space, not the id space itself. This is not
    * cosmetic: pointer doubling only shortcuts when interim labels
    * form nontrivial chains (`lbl(v) ≠ v`), and under RAW id order an
    * adversarial layout defeats one direction entirely — a directed
    * ring with ids ascending along the edges leaves every backward-
    * pass interim label = self, `lbl(lbl(v)) = lbl(v)`, and doubling
    * degrades to one hop per round, O(diameter) (observed: the
    * forward pass closed a 100-ring in 7 rounds, the backward pass
    * was still crawling at 40). Under a hashed order both directions
    * see random descents, chains form everywhere, and convergence is
    * O(log diameter)-ish in both passes regardless of how ids were
    * assigned (the takeover stall documented on step 1 remains — the
    * hashed order fixes the ORDER pathology, not the single-entry
    * front). Every correctness argument below only needs SOME total
    * order ≺ (transitivity of reachability does the rest), so the
    * swap is free; [[stronglyConnected]] canonicalizes the final
    * labels back to min-member-id for callers/oracles.
    */
  private def okey(idCol: Column): Column =
    struct(xxhash64(idCol).as("ok"), idCol.as("oid"))

  /** Min-label fixpoint under the hashed order: `prop` rows
    * (from, to) flow the label of `from` into `to` each round (plus
    * the pointer-doubling shortcut). Returns (id, lbl) over the
    * `nodes` domain, lbl an okey struct.
    */
  private def fixpointMinLabel(prop: DataFrame, nodes: DataFrame,
      maxIter: Int): DataFrame = {
    val p = prop.repartition(parts(prop), col("from")).persist()
    var lbl = nodes.select(col("id"), okey(col("id")).as("lbl"))
      .ckptFlat
    var iter = 0
    var converged = false
    val verbose = sys.env.contains("GRAFT_SCC_VERBOSE")
    try {
      while (!converged && iter < maxIter) {
        val fromMin = p
          .join(lbl.select(col("id").as("from"), col("lbl").as("flbl"))
            .hint("SHUFFLE_HASH"), "from")
          .groupBy(col("to")).agg(min(col("flbl")).as("nbMin"))
        val hopped = lbl
          .join(fromMin.withColumnRenamed("to", "id")
            .hint("SHUFFLE_HASH"), Seq("id"), "left")
          .select(col("id"), col("lbl").as("old"),
            least(col("lbl"), coalesce(col("nbMin"), col("lbl")))
              .as("lbl"))
          .ckptFlat
        val stepped = hopped
          .join(hopped.select(col("id").as("jid"), col("lbl").as("lbl2"))
            .hint("SHUFFLE_HASH"),
            col("lbl.oid") === col("jid"), "left")
          .select(col("id"), col("old"),
            least(col("lbl"), coalesce(col("lbl2"), col("lbl")))
              .as("lbl"))
          .ckptFlat
        converged = stepped.filter(col("lbl") =!= col("old")).isEmpty
        if (verbose && !converged) println(s"[graft-scc] inner iter=$iter changed=" +
          stepped.filter(col("lbl") =!= col("old")).count())
        lbl = stepped.select(col("id"), col("lbl"))
        iter += 1
      }
      require(converged,
        s"SCC label fixpoint did not converge in $maxIter rounds")
    } finally p.unpersist()
    lbl
  }

  /** SCC label (MIN MEMBER ID — canonicalized from the internal
    * hashed-order pivots) for every node of the directed edge
    * list: `(id, scc)`. Nodes appear iff they occur in an edge;
    * callers wanting isolated nodes as singleton SCCs coalesce
    * absent ids to themselves (they trivially are).
    */
  def stronglyConnected(edges: DataFrame, srcCol: String = "src",
      dstCol: String = "dst", maxOuter: Int = 40,
      maxIter: Int = 300): DataFrame = {
    var e = edges
      .select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .ckptFlat
    var nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .ckptFlat
    var settled: Option[DataFrame] = None

    def settle(df: DataFrame): Unit =
      settled = Some(settled match {
        case None => df
        case Some(acc) => acc.unionByName(df).ckptFlat
      })

    /** TRIM (the -Trim of FW-BW-Trim, Slota et al. / Hong et al.):
      * a node with no in-edges or no out-edges in the residual graph
      * is a singleton SCC — settle it without any fixpoint. Looped:
      * removing sources exposes new sources, so a whole DAG melts
      * away here in depth/2 rounds of cheap semi/anti joins, leaving
      * the expensive coloring passes only the genuinely cyclic core.
      * CAPPED at 64 rounds: trim is an optimization, not a
      * correctness step — a pathologically deep DAG (a 100k-node
      * chain would otherwise spin 50k driver rounds here) falls
      * through to the coloring passes, which settle singletons too,
      * just less cheaply.
      */
    def trim(): Unit = {
      var more = true
      var rounds = 0
      while (more && rounds < 64 && !nodes.isEmpty) {
        rounds += 1
        val hasIn = e.select(col("dst").as("id")).distinct()
        val hasOut = e.select(col("src").as("id")).distinct()
        val keep = nodes.join(hasIn, Seq("id"), "left_semi")
          .join(hasOut, Seq("id"), "left_semi")
          .ckptFlat
        val dropped = nodes.join(keep, Seq("id"), "left_anti")
          .ckptFlat
        if (dropped.isEmpty) more = false
        else {
          settle(dropped.select(col("id"), okey(col("id")).as("scc")))
          nodes = keep
          e = e
            .join(keep.withColumnRenamed("id", "src"), Seq("src"),
              "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), Seq("dst"),
              "left_semi")
            .select(col("src"), col("dst"))
            .ckptFlat
        }
      }
    }

    var outer = 0
    val verboseO = sys.env.contains("GRAFT_SCC_VERBOSE")
    trim()
    while (outer < maxOuter && !nodes.isEmpty) {
      if (verboseO) println(s"[graft-scc] outer=$outer t=${System.nanoTime()/1000000000L%100000}")
      val fwd = fixpointMinLabel(
        e.select(col("src").as("from"), col("dst").as("to")),
        nodes, maxIter)
      val intra = e
        .join(fwd.select(col("id").as("src"), col("lbl").as("cSrc")),
          "src")
        .join(fwd.select(col("id").as("dst"), col("lbl").as("cDst")),
          "dst")
        .filter(col("cSrc") === col("cDst"))
        .select(col("src"), col("dst"))
      // backward: r(v) picks up r of v's successors (reversed flow)
      val bwd = fixpointMinLabel(
        intra.select(col("dst").as("from"), col("src").as("to")),
        nodes, maxIter)
        .withColumnRenamed("lbl", "r")
      val joined = fwd.join(bwd, "id").ckptFlat
      settle(joined.filter(col("r") === col("lbl"))
        .select(col("id"), col("lbl").as("scc")))
      nodes = joined.filter(col("r") =!= col("lbl")).select(col("id"))
        .ckptFlat
      e = e
        .join(nodes.withColumnRenamed("id", "src"), Seq("src"),
          "left_semi")
        .join(nodes.withColumnRenamed("id", "dst"), Seq("dst"),
          "left_semi")
        .select(col("src"), col("dst"))
        .ckptFlat
      trim()
      outer += 1
    }
    require(nodes.isEmpty,
      s"SCC did not settle after $maxOuter outer rounds")
    settled match {
      case None => edges.sparkSession.emptyDataFrame
        .select(lit(0L).as("id"), lit(0L).as("scc")).limit(0)
      case Some(part) =>
        // canonicalize the hashed-order pivots back to the contract
        // callers and SQL oracles state in: scc = MIN MEMBER ID. One
        // aggregate over O(nodes) + one keyed join — the only place
        // the surrogate order is visible from outside.
        val canon = part.groupBy(col("scc"))
          .agg(min(col("id")).as("canonId"))
        part.join(canon.hint("SHUFFLE_HASH"), Seq("scc"))
          .select(col("id"), col("canonId").as("scc"))
    }
  }
}
