package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected pair graph — the step that
  * turns near-duplicate PAIRS (LSH output, [[TextDedup.lshCandidates]])
  * into duplicate CLUSTERS, so a retention policy can keep exactly one
  * representative per group. The reference has no graph surface; this
  * is part of the training-data-pipeline extension (SURVEY §2.3
  * "Dedup (LLM-pipeline)").
  *
  * Algorithm: min-label propagation. Every node starts labeled with
  * its own id; each round it adopts the minimum label among itself and
  * its neighbors; at the fixpoint every node carries the minimum node
  * id of its component (a canonical, deterministic cluster key).
  * Rounds = graph diameter.
  *
  * Scale notes (100 TB):
  *   - Near-dup graphs are forests of tiny dense clumps — diameter is
  *     single-digit, so O(diameter) rounds beats the constant-factor
  *     overhead of O(log n) algorithms (large-star/small-star,
  *     Connected Components in MapReduce, Kiveris et al. 2014) on this
  *     workload; switch to star-contraction only if components with
  *     long chains appear.
  *   - Each round is one shuffle-on-id join + one map-side-combinable
  *     min aggregate; labels and the symmetric edge list are hash-
  *     partitioned on the same key, so AQE reuses the exchange.
  *   - `localCheckpoint` truncates the growing lineage each round —
  *     without it the plan doubles per iteration and the driver, not
  *     the data, becomes the bottleneck. On a cluster use
  *     `spark.sparkContext.setCheckpointDir` + `checkpoint()` for
  *     fault-tolerant truncation instead.
  *   - The convergence probe is one `isEmpty` action per round (cheap:
  *     it stops at the first changed row).
  */
object Clusters {

  /** Component label (min reachable node id) for every node of the
    * edge list: `(id, comp)`. Nodes appear iff they occur in an edge;
    * callers wanting singleton components coalesce absent ids to
    * themselves.
    */
  def connectedComponents(edges: DataFrame, srcCol: String = "d1",
      dstCol: String = "d2", maxIter: Int = 30): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("id"), col(dstCol).cast("long").as("nb"))
      .union(edges.select(col(dstCol).cast("long").as("id"),
        col(srcCol).cast("long").as("nb")))
      .distinct()
      .localCheckpoint(true)

    var labels = sym.select(col("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)

    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // min label among neighbors, then least(own, neighbors'); old and
      // new label are materialized TOGETHER by the eager checkpoint, so
      // the convergence probe below reuses it instead of re-running the
      // round's joins
      val nbMin = sym
        .join(labels.select(col("id").as("nb"), col("comp").as("nbComp")), "nb")
        .groupBy(col("id")).agg(min(col("nbComp")).as("nbMin"))
      val stepped = labels
        .join(nbMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("old"),
          least(col("comp"), coalesce(col("nbMin"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      converged = stepped.filter(col("comp") =!= col("old")).isEmpty
      labels = stepped.select(col("id"), col("comp"))
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "component diameter exceeds the bound; raise maxIter or switch " +
        "to star-contraction")
    labels
  }
}
