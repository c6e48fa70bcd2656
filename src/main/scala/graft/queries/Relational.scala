package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator battery over the TPC-H-ish star schema
  * (SURVEY.md §2.3: scans, projection/filter, equi/semi/anti/outer
  * joins, hash aggregation, distinct aggregation, having, rollup/cube,
  * window functions, set ops, top-k, scalar functions).
  *
  * Determinism rules (oracle hash-compare):
  *   - sums over DOUBLE columns go through DECIMAL(18,2) so the result
  *     is exact and independent of partition/accumulation order, then
  *     cast back to DOUBLE;
  *   - averages are exact-decimal-sum / count in DOUBLE arithmetic;
  *   - every query ends with a total ORDER BY over a unique key set.
  *
  * Scale notes (100 TB design): filters/projections sit directly on the
  * parquet scan (Catalyst pushdown); dimension tables (region, nation)
  * are broadcast explicitly; fact-fact joins shuffle on their join key
  * and AQE handles skew/coalescing; window queries partition by a key
  * (never a global window over unsorted data).
  */
object Relational extends QueryPack {
  import SqlDet.{dec, dsum, sqlDsum}

  private val netExpr: String =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- Q1: full-scan grouped aggregation (TPC-H Q1 shape) -------------
    "q01_pricing_summary" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).lineitem
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          dsum($"l_quantity").as("sum_qty"),
          dsum($"l_extendedprice").as("sum_base_price"),
          sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .cast("double").as("sum_disc_price"),
          sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")) *
              (lit(1) + dec($"l_tax"))).cast("double").as("sum_charge"),
          (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // -- Q2: projection + filter, pushed to the parquet scan ------------
    "q02_filter_project" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).lineitem
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1996-04-01").cast("timestamp") &&
          $"l_quantity" > 45)
        .select($"l_orderkey", $"l_linenumber", $"l_partkey",
          (dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .cast("double").as("net_price"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // -- Q3: 3-way join + agg + top-k (TPC-H Q3 shape) ------------------
    "q03_top_revenue" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = Tables(s, dir)
      t.customer.filter($"c_mktsegment" === "BUILDING")
        .join(t.orders, $"c_custkey" === $"o_custkey")
        .join(t.lineitem, $"o_orderkey" === $"l_orderkey")
        .groupBy($"o_orderkey", $"o_orderdate")
        .agg(sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
          .cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"o_orderkey")
        .limit(10)
    }),

    // -- Q4: semi join (EXISTS) -----------------------------------------
    "q04_order_priority" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = Tables(s, dir)
      t.orders
        .join(t.lineitem.filter($"l_quantity" >= 48).select($"l_orderkey"),
          $"o_orderkey" === $"l_orderkey", "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy($"o_orderpriority")
    }),

    // -- Q5: 5-way join through broadcast dims (TPC-H Q5 shape) ---------
    "q05_region_revenue" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = Tables(s, dir)
      broadcast(t.region.filter($"r_name" === "EUROPE"))
        .join(broadcast(t.nation), $"n_regionkey" === $"r_regionkey")
        .join(t.customer, $"c_nationkey" === $"n_nationkey")
        .join(t.orders.filter(
          $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp")),
          $"o_custkey" === $"c_custkey")
        .join(t.lineitem, $"l_orderkey" === $"o_orderkey")
        .groupBy($"n_name")
        .agg(
          sum(dec($"l_extendedprice") * (lit(1) - dec($"l_discount")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy($"n_name")
    }),

    // -- Q6: selective scan + scalar aggregate (TPC-H Q6 shape) ---------
    "q06_revenue_forecast" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).lineitem
        .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
          $"l_shipdate" < lit("1997-01-01").cast("timestamp") &&
          $"l_discount".between(0.05, 0.07) && $"l_quantity" < 24)
        .agg(
          sum(dec($"l_extendedprice") * dec($"l_discount"))
            .cast("double").as("revenue"),
          count(lit(1)).as("n"))
    }),

    // -- Q7: anti join (NOT EXISTS) -------------------------------------
    "q07_inactive_customers" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = Tables(s, dir)
      val h1_96 = t.orders.filter(
        $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
        $"o_orderdate" < lit("1996-07-01").cast("timestamp"))
      t.customer
        .join(h1_96, $"c_custkey" === $"o_custkey", "left_anti")
        .groupBy($"c_nationkey")
        .agg(count(lit(1)).as("n_inactive"))
        .orderBy($"c_nationkey")
    }),

    // -- Q8: left outer join + null-aware agg ---------------------------
    "q08_customer_orders" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = Tables(s, dir)
      t.customer
        .join(t.orders, $"o_custkey" === $"c_custkey", "left")
        .groupBy($"c_custkey")
        .agg(
          count($"o_orderkey").as("n_orders"),
          coalesce(sum(dec($"o_totalprice")), lit(0)).cast("double")
            .as("total_spent"))
        .orderBy($"c_custkey")
    }),

    // -- Q9: per-group top-k via window row_number ----------------------
    "q09_segment_top_orders" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = Tables(s, dir)
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      t.orders.join(t.customer, $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment", $"o_orderkey", $"o_totalprice")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 3)
        .orderBy($"c_mktsegment", $"rn")
    }),

    // -- Q10: running (cumulative) window aggregate ---------------------
    "q10_running_quantity" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"l_suppkey")
        .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir).lineitem
        .filter($"l_suppkey" <= 5)
        .select($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber",
          sum(dec($"l_quantity")).over(w).cast("double").as("running_qty"))
        .orderBy($"l_suppkey", $"l_shipdate", $"l_orderkey", $"l_linenumber")
    }),

    // -- Q11: lag/lead event-sequence window ----------------------------
    "q11_order_gaps" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      Tables(s, dir).orders
        .select($"o_custkey", $"o_orderkey", $"o_orderdate",
          datediff($"o_orderdate", lag($"o_orderdate", 1).over(w))
            .cast("long").as("days_since_prev"),
          datediff(lead($"o_orderdate", 1).over(w), $"o_orderdate")
            .cast("long").as("days_to_next"))
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    }),

    // -- Q12: rollup ----------------------------------------------------
    "q12_rollup_acctbal" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = Tables(s, dir)
      t.customer
        .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(t.region), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_customers"),
          dsum($"c_acctbal").as("total_acctbal"))
        .select(coalesce($"r_name", lit("ALL")).as("region_name"),
          coalesce($"n_name", lit("ALL")).as("nation_name"),
          $"n_customers", $"total_acctbal")
        .orderBy($"region_name", $"nation_name")
    }),

    // -- Q13: cube -------------------------------------------------------
    "q13_cube_status" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).lineitem
        .cube($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
        .select(coalesce($"l_returnflag", lit("ALL")).as("returnflag"),
          coalesce($"l_linestatus", lit("ALL")).as("linestatus"),
          $"n", $"sum_qty")
        .orderBy($"returnflag", $"linestatus")
    }),

    // -- Q14: set operations (UNION / INTERSECT / EXCEPT) ---------------
    "q14_setops" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = Tables(s, dir)
      val rich = t.customer.filter($"c_acctbal" > 7500).select($"c_custkey")
      val active96 = t.orders.filter(
          $"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1997-01-01").cast("timestamp"))
        .select($"o_custkey".as("c_custkey"))
      rich.intersect(active96)
        .agg(lit("intersect").as("op"), count(lit(1)).as("n"))
        .union(rich.except(active96)
          .agg(lit("except").as("op"), count(lit(1)).as("n")))
        .union(rich.union(active96).distinct()
          .agg(lit("union").as("op"), count(lit(1)).as("n")))
        .orderBy($"op")
    }),

    // -- Q15: distinct aggregation --------------------------------------
    "q15_supplier_stats" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).lineitem
        .groupBy($"l_suppkey")
        .agg(
          countDistinct($"l_partkey").as("n_parts"),
          countDistinct($"l_orderkey").as("n_orders"),
          dsum($"l_quantity").as("total_qty"))
        .orderBy($"l_suppkey")
    }),

    // -- Q16: HAVING ----------------------------------------------------
    "q16_frequent_customers" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).orders
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
        .filter($"n_orders" >= 15)
        .orderBy($"o_custkey")
    }),

    // -- Q17: scalar function surface (string / math / conditional) -----
    "q17_scalar_fns" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).part
        .select($"p_partkey",
          lower($"p_name").as("name_lower"),
          upper($"p_brand").as("brand_upper"),
          length($"p_name").cast("long").as("name_len"),
          substring($"p_type", 1, 4).as("type_prefix"),
          concat($"p_brand", lit(":"), $"p_type").as("brand_type"),
          regexp_replace($"p_name", " ", "_").as("name_us"),
          ($"p_size" % 7).cast("int").as("size_mod"),
          floor($"p_retailprice").cast("long").as("price_floor"),
          ceil($"p_retailprice").cast("long").as("price_ceil"),
          abs($"p_size" - 25).cast("int").as("size_dev"),
          sqrt($"p_size".cast("double")).as("size_sqrt"))
        .orderBy($"p_partkey")
    }),

    // -- Q18: compare against per-group exact average (windowed) --------
    "q18_above_brand_avg" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"p_brand")
      Tables(s, dir).part
        .withColumn("brand_avg",
          sum(dec($"p_retailprice")).over(w).cast("double") /
            count(lit(1)).over(w))
        .filter($"p_retailprice" > $"brand_avg")
        .select($"p_partkey", $"p_brand", $"p_retailprice", $"brand_avg")
        .orderBy($"p_partkey")
    }),

    // -- Q20: range-frame window (value-based frame, not row-based) -----
    // 30-day trailing spend per order: RANGE BETWEEN over epoch days.
    "q20_range_frame" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"day".cast("long"))
        .rangeBetween(-30, Window.currentRow)
      Tables(s, dir).orders
        .withColumn("day", datediff($"o_orderdate",
          lit("1990-01-01").cast("timestamp")))
        .select($"o_custkey", $"o_orderkey", $"o_orderdate",
          sum(dec($"o_totalprice")).over(w).cast("double")
            .as("trailing_30d_spend"))
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    }),

    // -- Q21: scalar subquery (orders above global average) -------------
    "q21_scalar_subquery" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir).orders.createOrReplaceTempView("orders_sq")
      s.sql(
        """SELECT o_orderkey, o_custkey,
          |  CAST(o_totalprice AS DOUBLE) AS o_totalprice
          |FROM orders_sq
          |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM orders_sq) >
          |  (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders_sq)
          |ORDER BY o_orderkey""".stripMargin)
    }),

    // -- Q24: exact ordered statistics (median / quartiles) -------------
    // Exact percentile (not the t-digest approximation): safe for the
    // oracle because l_quantity is integral, so linear interpolation
    // lands on k or k.5 — exactly representable doubles in both engines.
    "q24_exact_median" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("q1_qty"),
          expr("percentile(l_quantity, 0.5)").as("median_qty"),
          expr("percentile(l_quantity, 0.75)").as("q3_qty"),
          min($"l_quantity").as("min_qty"), max($"l_quantity").as("max_qty"))
        .orderBy($"l_returnflag")
    }),

    // -- Q25: correlated EXISTS / NOT EXISTS (semi + anti in one pass) --
    // Customers with an urgent order and no finished order — the
    // DataFrame spelling is left_semi + left_anti; Catalyst plans both
    // as existence joins (no row duplication, build side broadcast at
    // this dim size).
    "q25_exists_not_exists" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = Tables(s, dir)
      val urgent = t.orders.filter($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey")
      val finished = t.orders.filter($"o_orderstatus" === "F")
        .select($"o_custkey")
      t.customer
        .join(urgent, $"c_custkey" === urgent("o_custkey"), "left_semi")
        .join(finished, $"c_custkey" === finished("o_custkey"), "left_anti")
        .select($"c_custkey", $"c_mktsegment",
          $"c_acctbal".cast("double").as("c_acctbal"))
        .orderBy($"c_custkey")
    }),

    // -- Q26: LATERAL correlated subquery (per-group top-k in SQL) ------
    // The SQL-standard spelling of q09's window top-k; Spark plans the
    // lateral as a correlated join + per-partition limit.
    "q26_lateral_topk" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir).nation.createOrReplaceTempView("nation_l")
      Tables(s, dir).customer.createOrReplaceTempView("customer_l")
      s.sql(
        """SELECT n_name, c.c_custkey,
          |  CAST(c.c_acctbal AS DOUBLE) AS c_acctbal
          |FROM nation_l, LATERAL (
          |  SELECT c_custkey, c_acctbal FROM customer_l
          |  WHERE c_nationkey = n_nationkey
          |  ORDER BY c_acctbal DESC, c_custkey LIMIT 3) c
          |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin)
    }),

    // -- Q27: histogram via width_bucket (fixed-range binning) ----------
    // (600000-0)/12 = 50000 is exactly representable, so Spark's
    // width_bucket float arithmetic reproduces bit-for-bit as
    // floor(x/50000)+1 in the oracle.
    "q27_histogram" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).orders
        .withColumn("bucket",
          expr("width_bucket(o_totalprice, 0.0, 600000.0, 12)"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
        .orderBy($"bucket")
    }),

    // -- Q28: NOT IN three-valued logic (the NULL-in-list trap) ---------
    // `x NOT IN (set containing NULL)` can never be TRUE — the count
    // must be 0, and both engines must agree on all three variants.
    "q28_null_semantics" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir).customer.createOrReplaceTempView("customer_n")
      Tables(s, dir).orders.createOrReplaceTempView("orders_n")
      s.sql(
        """SELECT
          |  (SELECT COUNT(*) FROM customer_n WHERE c_custkey <= 15
          |     AND c_custkey IN (SELECT NULLIF(o_custkey, 7)
          |                       FROM orders_n WHERE o_custkey < 10))
          |    AS n_in_nullable,
          |  (SELECT COUNT(*) FROM customer_n WHERE c_custkey <= 15
          |     AND c_custkey NOT IN (SELECT NULLIF(o_custkey, 7)
          |                           FROM orders_n WHERE o_custkey < 10))
          |    AS n_not_in_nullable,
          |  (SELECT COUNT(*) FROM customer_n WHERE c_custkey <= 15
          |     AND c_custkey NOT IN (SELECT o_custkey FROM orders_n
          |                           WHERE o_custkey < 10 AND o_custkey <> 7))
          |    AS n_not_in_clean""".stripMargin)
    }),

    // -- Q29: ranking-function surface (ntile / percent_rank / cume_dist)
    // percent_rank and cume_dist divide the same integers in both
    // engines, so the doubles agree bit-for-bit despite being
    // non-terminating binary fractions.
    "q29_rank_surface" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"c_mktsegment")
        .orderBy($"c_acctbal".desc, $"c_custkey")
      Tables(s, dir).customer
        .filter($"c_custkey" <= 200)
        .select($"c_mktsegment", $"c_custkey",
          $"c_acctbal".cast("double").as("c_acctbal"),
          dense_rank().over(w).as("drank"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("prank"),
          cume_dist().over(w).as("cdist"))
        .orderBy($"c_mktsegment", $"drank", $"c_custkey")
    }),

    // -- Q30: unpivot / melt (wide → long) ------------------------------
    "q30_unpivot" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).lineitem
        .groupBy($"l_returnflag")
        .agg(dsum($"l_quantity").as("m_qty"),
          dsum($"l_extendedprice").as("m_price"),
          count(lit(1)).cast("double").as("m_rows"))
        .unpivot(Array($"l_returnflag"),
          Array($"m_qty", $"m_price", $"m_rows"), "measure", "value")
        .orderBy($"l_returnflag", $"measure")
    }),

    // -- Q31: GROUPING_ID over rollup (which level produced the row) ----
    "q31_grouping_id" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).orders
        .rollup($"o_orderstatus", $"o_orderpriority")
        .agg(grouping_id().cast("long").as("gid"),
          count(lit(1)).as("n"))
        .select(coalesce($"o_orderstatus", lit("ALL")).as("status"),
          coalesce($"o_orderpriority", lit("ALL")).as("priority"),
          $"gid", $"n")
        .orderBy($"gid", $"status", $"priority")
    }),

    // -- Q22: native pivot (fixed value list → deterministic schema) ----
    "q22_pivot" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).orders
        .groupBy($"o_orderpriority")
        .pivot($"o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select($"o_orderpriority", $"F".as("n_f"), $"O".as("n_o"),
          $"P".as("n_p"))
        .orderBy($"o_orderpriority")
    }),

    // -- Q23: collection functions (sorted array agg, element ops) ------
    "q23_collections" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).orders
        .filter($"o_custkey" <= 20)
        .groupBy($"o_custkey")
        .agg(sort_array(collect_list($"o_orderpriority")).as("prios"),
          sort_array(collect_set($"o_orderstatus")).as("statuses"))
        .select($"o_custkey",
          size($"prios").cast("long").as("n_orders"),
          element_at($"prios", 1).as("first_prio"),
          element_at($"prios", -1).as("last_prio"),
          array_join($"statuses", ",").as("status_set"),
          array_contains($"prios", "1-URGENT").cast("int").as("has_urgent"))
        .orderBy($"o_custkey")
    }),

    // -- Q19: conditional (pivot-style) aggregation ---------------------
    "q19_status_pivot" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = Tables(s, dir)
      t.orders.join(t.customer, $"c_custkey" === $"o_custkey")
        .groupBy($"c_nationkey")
        .agg(
          sum(when($"o_orderstatus" === "O", 1).otherwise(0)).as("n_open"),
          sum(when($"o_orderstatus" === "F", 1).otherwise(0)).as("n_finished"),
          sum(when($"o_orderstatus" === "P", 1).otherwise(0)).as("n_pending"),
          sum(when($"o_orderstatus" === "O", dec($"o_totalprice"))
            .otherwise(dec(lit(0)))).cast("double").as("open_value"))
        .orderBy($"c_nationkey")
    }),

    // -- Q35: recursive CTE (iterative hierarchy walk in SQL) -----------
    // Spark 4 WITH RECURSIVE: every customer walks its ancestor chain
    // c → c div 10 → … → 0 (a deterministic tree over the key space);
    // the profile of chain depths proves the fixpoint executed fully.
    // The same recursion closes dup-clusters in the d07 oracle — here
    // it is the ENGINE side running the recursion.
    "q35_recursive_cte" -> ((s: SparkSession, dir: String) => {
      Tables(s, dir).customer.createOrReplaceTempView("customer_v")
      s.sql(
        """WITH RECURSIVE up AS (
          |  SELECT c_custkey AS c, c_custkey AS anc, CAST(0 AS BIGINT) AS depth
          |  FROM customer_v
          |  UNION ALL
          |  SELECT c, anc div 10, depth + 1 FROM up WHERE anc > 0)
          |SELECT depth, CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(anc) AS BIGINT) AS anc_sum
          |FROM up GROUP BY depth ORDER BY depth""".stripMargin)
    }),

    // -- Q36: multiset set ops (EXCEPT ALL / INTERSECT ALL) -------------
    // q14 covers the DISTINCT set ops; these are the bag semantics —
    // duplicates count, so the result sizes differ from q14's on the
    // same inputs.
    "q36_setops_all" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = Tables(s, dir)
      def keys(y: Int) = t.orders.filter(
          $"o_orderdate" >= lit(s"$y-01-01").cast("timestamp") &&
          $"o_orderdate" < lit(s"${y + 1}-01-01").cast("timestamp"))
        .select($"o_custkey")
      val a = keys(1995)
      val b = keys(1996)
      a.exceptAll(b).agg(lit("except_all").as("op"), count(lit(1)).as("n"))
        .union(a.intersectAll(b)
          .agg(lit("intersect_all").as("op"), count(lit(1)).as("n")))
        .union(a.unionAll(b)
          .agg(lit("union_all").as("op"), count(lit(1)).as("n")))
        .orderBy($"op")
    }),

    // -- Q34: window navigation (first/last/nth_value, IGNORE NULLS) ----
    // The value is NULL except on finished orders, so the navigation
    // functions must skip nulls: first finished price over the whole
    // partition, running last-known finished price (LOCF shape), and
    // the second finished price. Pure value selection — no float
    // arithmetic, so raw doubles compare exactly.
    "q34_window_navigation" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val full = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val running = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir).orders
        .filter($"o_custkey" <= 30)
        .withColumn("price_f",
          when($"o_orderstatus" === "F", $"o_totalprice"))
        .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"price_f",
          first($"price_f", ignoreNulls = true).over(full)
            .as("first_finished"),
          last($"price_f", ignoreNulls = true).over(running)
            .as("last_known_finished"),
          nth_value($"price_f", 2, ignoreNulls = true).over(full)
            .as("second_finished"))
        .orderBy($"o_custkey", $"o_orderdate", $"o_orderkey")
    }),

    // -- Q33: full outer join (both-side null extension) ----------------
    // High-balance customers FULL OUTER the per-customer order rollup:
    // unmatched rows survive from BOTH sides (rich customers with no
    // orders; ordering customers below the balance cut).
    "q33_full_outer" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = Tables(s, dir)
      val rich = t.customer.filter($"c_acctbal" > 5000)
        .select($"c_custkey", $"c_acctbal".cast("double").as("acctbal"))
      val spend = t.orders.groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sum(dec($"o_totalprice")).cast("double").as("spent"))
      rich.join(spend, $"c_custkey" === $"o_custkey", "full_outer")
        .select(coalesce($"c_custkey", $"o_custkey").as("custkey"),
          $"acctbal", $"n_orders", $"spent")
        .orderBy($"custkey")
    }),

    // -- Q32: native bounded top-k (custom LogicalPlan + SparkPlan) -----
    // Same semantics as the q09 row_number spelling, but through
    // graft.plans.TopKPerGroup: partial heaps → hash exchange → final
    // heaps, no per-group sort, no window projection. The oracle is
    // the windowed SQL — proving the custom operator tier equals the
    // declarative spelling bit-for-bit.
    "q32_topk_native" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val t = Tables(s, dir)
      val joined = t.orders.join(t.customer, $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment", $"o_orderkey", $"o_totalprice")
      graft.operators.TopK.perGroup(joined, Seq("c_mktsegment"),
          Seq(("o_totalprice", false), ("o_orderkey", true)), 5)
        .orderBy($"c_mktsegment", $"o_totalprice".desc, $"o_orderkey")
    })
  )

  override def oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlDsum("l_quantity")} AS sum_qty,
         |  ${sqlDsum("l_extendedprice")} AS sum_base_price,
         |  CAST(SUM($netExpr) AS DOUBLE) AS sum_disc_price,
         |  CAST(SUM($netExpr * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
         |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
         |  CAST(COUNT(*) AS BIGINT) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey,
         |  CAST($netExpr AS DOUBLE) AS net_price
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1996-04-01' AND l_quantity > 45
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_top_revenue" ->
      s"""SELECT o_orderkey, o_orderdate,
         |  CAST(SUM($netExpr) AS DOUBLE) AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |GROUP BY o_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q04_order_priority" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q05_region_revenue" ->
      s"""SELECT n_name,
         |  CAST(SUM($netExpr) AS DOUBLE) AS revenue,
         |  CAST(COUNT(*) AS BIGINT) AS n_items
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE r_name = 'EUROPE'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q06_revenue_forecast" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q07_inactive_customers" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_inactive
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |                    AND o_orderdate < TIMESTAMP '1996-07-01')
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,

    "q08_customer_orders" ->
      """SELECT c_custkey,
        |  CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
        |  CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
        |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,

    "q09_segment_top_orders" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rn <= 3 ORDER BY c_mktsegment, rn""".stripMargin,

    "q10_running_quantity" ->
      """SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""".stripMargin,

    "q11_order_gaps" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(date_diff('day',
        |    LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |    o_orderdate) AS BIGINT) AS days_since_prev,
        |  CAST(date_diff('day', o_orderdate,
        |    LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)) AS BIGINT) AS days_to_next
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q12_rollup_acctbal" ->
      s"""SELECT COALESCE(r_name, 'ALL') AS region_name,
         |  COALESCE(n_name, 'ALL') AS nation_name,
         |  CAST(COUNT(*) AS BIGINT) AS n_customers,
         |  ${sqlDsum("c_acctbal")} AS total_acctbal
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY region_name, nation_name""".stripMargin,

    "q13_cube_status" ->
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
         |  COALESCE(l_linestatus, 'ALL') AS linestatus,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  ${sqlDsum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY returnflag, linestatus""".stripMargin,

    "q14_setops" ->
      """WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 7500),
        |active AS (SELECT o_custkey AS c_custkey FROM orders
        |           WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |             AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT 'intersect' AS op, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT * FROM rich INTERSECT SELECT * FROM active) t1
        |UNION ALL
        |SELECT 'except' AS op, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT * FROM rich EXCEPT SELECT * FROM active) t2
        |UNION ALL
        |SELECT 'union' AS op, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT * FROM rich UNION SELECT * FROM active) t3
        |ORDER BY op""".stripMargin,

    "q15_supplier_stats" ->
      s"""SELECT l_suppkey,
         |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
         |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
         |  ${sqlDsum("l_quantity")} AS total_qty
         |FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin,

    "q16_frequent_customers" ->
      s"""SELECT o_custkey,
         |  CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY o_custkey
         |HAVING COUNT(*) >= 15 ORDER BY o_custkey""".stripMargin,

    "q17_scalar_fns" ->
      """SELECT p_partkey,
        |  lower(p_name) AS name_lower,
        |  upper(p_brand) AS brand_upper,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  substring(p_type, 1, 4) AS type_prefix,
        |  concat(p_brand, ':', p_type) AS brand_type,
        |  replace(p_name, ' ', '_') AS name_us,
        |  CAST(p_size % 7 AS INTEGER) AS size_mod,
        |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
        |  CAST(abs(p_size - 25) AS INTEGER) AS size_dev,
        |  sqrt(CAST(p_size AS DOUBLE)) AS size_sqrt
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q18_above_brand_avg" ->
      """SELECT p_partkey, p_brand, p_retailprice, brand_avg FROM (
        |  SELECT p_partkey, p_brand, p_retailprice,
        |    CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) OVER (PARTITION BY p_brand) AS DOUBLE)
        |      / COUNT(*) OVER (PARTITION BY p_brand) AS brand_avg
        |  FROM part) t
        |WHERE p_retailprice > brand_avg ORDER BY p_partkey""".stripMargin,

    "q24_exact_median" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q1_qty,
        |  quantile_cont(l_quantity, 0.5) AS median_qty,
        |  quantile_cont(l_quantity, 0.75) AS q3_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q25_exists_not_exists" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(c_acctbal AS DOUBLE) AS c_acctbal
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,

    "q26_lateral_topk" ->
      """SELECT n_name, c.c_custkey,
        |  CAST(c.c_acctbal AS DOUBLE) AS c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 3) c
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin,

    "q27_histogram" ->
      s"""SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) + 1 AS bucket,
         |  CAST(COUNT(*) AS BIGINT) AS n, ${sqlDsum("o_totalprice")} AS total
         |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin,

    "q28_null_semantics" ->
      """SELECT
        |  (SELECT COUNT(*) FROM customer WHERE c_custkey <= 15
        |     AND c_custkey IN (SELECT NULLIF(o_custkey, 7)
        |                       FROM orders WHERE o_custkey < 10))
        |    AS n_in_nullable,
        |  (SELECT COUNT(*) FROM customer WHERE c_custkey <= 15
        |     AND c_custkey NOT IN (SELECT NULLIF(o_custkey, 7)
        |                           FROM orders WHERE o_custkey < 10))
        |    AS n_not_in_nullable,
        |  (SELECT COUNT(*) FROM customer WHERE c_custkey <= 15
        |     AND c_custkey NOT IN (SELECT o_custkey FROM orders
        |                           WHERE o_custkey < 10 AND o_custkey <> 7))
        |    AS n_not_in_clean""".stripMargin,

    "q29_rank_surface" ->
      """SELECT c_mktsegment, c_custkey,
        |  CAST(c_acctbal AS DOUBLE) AS c_acctbal,
        |  CAST(DENSE_RANK() OVER w AS INTEGER) AS drank,
        |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
        |  PERCENT_RANK() OVER w AS prank,
        |  CUME_DIST() OVER w AS cdist
        |FROM customer WHERE c_custkey <= 200
        |WINDOW w AS (PARTITION BY c_mktsegment
        |             ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_mktsegment, drank, c_custkey""".stripMargin,

    "q30_unpivot" ->
      s"""WITH a AS (
         |  SELECT l_returnflag, ${sqlDsum("l_quantity")} AS m_qty,
         |    ${sqlDsum("l_extendedprice")} AS m_price,
         |    CAST(COUNT(*) AS DOUBLE) AS m_rows
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, measure, value FROM (
         |  SELECT l_returnflag, 'm_qty' AS measure, m_qty AS value FROM a
         |  UNION ALL
         |  SELECT l_returnflag, 'm_price', m_price FROM a
         |  UNION ALL
         |  SELECT l_returnflag, 'm_rows', m_rows FROM a)
         |ORDER BY l_returnflag, measure""".stripMargin,

    "q31_grouping_id" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        |  COALESCE(o_orderpriority, 'ALL') AS priority,
        |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,

    "q22_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q23_collections" ->
      """SELECT o_custkey,
        |  CAST(len(prios) AS BIGINT) AS n_orders,
        |  prios[1] AS first_prio,
        |  prios[-1] AS last_prio,
        |  array_to_string(statuses, ',') AS status_set,
        |  CAST(CASE WHEN list_contains(prios, '1-URGENT') THEN 1 ELSE 0 END AS INTEGER) AS has_urgent
        |FROM (
        |  SELECT o_custkey,
        |    list_sort(list(o_orderpriority)) AS prios,
        |    list_sort(list(DISTINCT o_orderstatus)) AS statuses
        |  FROM orders WHERE o_custkey <= 20 GROUP BY o_custkey)
        |ORDER BY o_custkey""".stripMargin,

    "q20_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY date_diff('day', TIMESTAMP '1990-01-01', o_orderdate)
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS trailing_30d_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q21_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
        |FROM orders
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM orders) >
        |  (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q35_recursive_cte" ->
      """WITH RECURSIVE up AS (
        |  SELECT c_custkey AS c, c_custkey AS anc, CAST(0 AS BIGINT) AS depth
        |  FROM customer
        |  UNION ALL
        |  SELECT c, anc // 10, depth + 1 FROM up WHERE anc > 0)
        |SELECT depth, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(anc) AS BIGINT) AS anc_sum
        |FROM up GROUP BY depth ORDER BY depth""".stripMargin,

    "q36_setops_all" ->
      """WITH a AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |    AND o_orderdate < TIMESTAMP '1996-01-01'),
        |b AS (SELECT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-01-01')
        |SELECT 'except_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |UNION ALL
        |SELECT 'intersect_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |UNION ALL
        |SELECT 'union_all' AS op, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
        |ORDER BY op""".stripMargin,

    "q34_window_navigation" ->
      """WITH t AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS price_f
        |  FROM orders WHERE o_custkey <= 30)
        |SELECT o_custkey, o_orderkey, o_orderdate, price_f,
        |  first_value(price_f IGNORE NULLS) OVER wfull AS first_finished,
        |  last_value(price_f IGNORE NULLS) OVER wrun AS last_known_finished,
        |  nth_value(price_f, 2 IGNORE NULLS) OVER wfull AS second_finished
        |FROM t
        |WINDOW
        |  wfull AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
        |  wrun AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q33_full_outer" ->
      """SELECT COALESCE(c.c_custkey, s.o_custkey) AS custkey,
        |  CAST(c.c_acctbal AS DOUBLE) AS acctbal,
        |  s.n_orders, s.spent
        |FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000) c
        |FULL OUTER JOIN (
        |  SELECT o_custkey,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spent
        |  FROM orders GROUP BY o_custkey) s
        |ON c.c_custkey = s.o_custkey
        |ORDER BY custkey""".stripMargin,

    "q32_topk_native" ->
      """SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders JOIN customer ON o_custkey = c_custkey) t
        |WHERE rn <= 5
        |ORDER BY c_mktsegment, o_totalprice DESC, o_orderkey""".stripMargin,

    "q19_status_pivot" ->
      """SELECT c_nationkey,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2))
        |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS open_value
        |FROM orders JOIN customer ON c_custkey = o_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
  )
}
