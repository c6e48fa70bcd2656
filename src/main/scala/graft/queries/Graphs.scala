package graft.queries

import graft.Tables
import graft.operators.PageRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the customer→supplier trade graph (edges =
  * "customer bought from supplier", lineitem⋈orders): PageRank
  * centrality and the degree profile. Complements the dup-cluster
  * connected components (d07) on the graph surface.
  *
  * Node namespace: customers keep their key, suppliers are offset by
  * `SupplierOffset` = 10^12 — far above any customer key this schema
  * reaches (c_custkey ≈ 150k × SF; even SF 10^6 stays below the
  * offset), so the two key spaces stay disjoint in one id column.
  *
  * Scale notes (100 TB): the edge list derives from the largest table
  * (lineitem) but is projected to two key columns before the distinct
  * — parquet reads exactly `l_orderkey, l_suppkey` plus the join key;
  * the PageRank loop itself shuffles only the rank vector per
  * iteration (see [[graft.operators.PageRank]]).
  */
object Graphs extends QueryPack {

  private val SupplierOffset = 1000000000000L

  private def tradeEdges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    t.lineitem.select($"l_orderkey", $"l_suppkey")
      .join(t.orders.select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("src"),
        ($"l_suppkey" + SupplierOffset).as("dst"))
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- G1: integer PageRank, 3 synchronous iterations -----------------
    "g01_pagerank" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      PageRank.ranksPpm(tradeEdges(s, dir), iters = 3)
        .orderBy($"id")
    }),

    // -- G2: degree profile of the trade graph --------------------------
    "g02_degree_histogram" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      tradeEdges(s, dir).distinct()
        .groupBy($"src").agg(count(lit(1)).as("deg"))
        .groupBy($"deg").agg(count(lit(1)).as("n_nodes"))
        .orderBy($"deg")
    })
  )

  override def oracles: Map[String, String] = {
    // one CTE per synchronous iteration — same integer recurrence as
    // PageRank.ranksPpm (div = floor on non-negatives in both engines)
    def iterCte(i: Int): String = {
      val prev = s"r${i - 1}"
      s"""c$i AS (
         |  SELECT e.dst AS id,
         |    CAST(SUM(r.rank_ppm // d.outdeg) AS BIGINT) AS csum
         |  FROM edges e
         |  JOIN $prev r ON r.id = e.src
         |  JOIN outdeg d ON d.src = e.src
         |  GROUP BY e.dst),
         |r$i AS (
         |  SELECT n.id,
         |    CAST(150000 + (850 * COALESCE(c.csum, 0)) // 1000 AS BIGINT)
         |      AS rank_ppm
         |  FROM nodes n LEFT JOIN c$i c ON c.id = n.id)""".stripMargin
    }
    Map(
      "g01_pagerank" ->
        s"""WITH edges AS (
           |  SELECT DISTINCT o_custkey AS src,
           |    l_suppkey + $SupplierOffset AS dst
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |nodes AS (
           |  SELECT src AS id FROM edges
           |  UNION SELECT dst AS id FROM edges),
           |outdeg AS (
           |  SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
           |r0 AS (
           |  SELECT id, CAST(1000000 AS BIGINT) AS rank_ppm FROM nodes),
           |${iterCte(1)},
           |${iterCte(2)},
           |${iterCte(3)}
           |SELECT id, rank_ppm FROM r3 ORDER BY id""".stripMargin,

      "g02_degree_histogram" ->
        s"""WITH edges AS (
           |  SELECT DISTINCT o_custkey AS src,
           |    l_suppkey + $SupplierOffset AS dst
           |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
           |deg AS (
           |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
           |  FROM edges GROUP BY src)
           |SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
           |FROM deg GROUP BY deg ORDER BY deg""".stripMargin
    )
  }
}
