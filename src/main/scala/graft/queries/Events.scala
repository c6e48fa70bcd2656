package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-stream analytics over the `events` table (FIXTURES.md §B1) —
  * the batch expressions of the streaming surface in SURVEY.md §2.3:
  * JSON payload extraction (the reference's `dyn Any` analog, SURVEY
  * §1.2), tumbling/sliding/session event-time windows, as-of join,
  * keep-first dedup, funnel sequencing.
  *
  * The same logic runs incrementally under Structured Streaming (see
  * graft.streaming); these batch forms are what the DuckDB oracle can
  * check. Windowing uses `window()`/`session_window`-equivalent
  * expressions that stay inside whole-stage codegen.
  *
  * The fizzbuzz classifier is the engine port of the reference's
  * canonical example (/root/reference/tests/fizz_buzz_sink.rs:97-137 —
  * class(n) from (n%5, n%3)).
  */
object Events extends QueryPack {
  import SqlDet.{dec, dsum, sqlDsum}

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- reference fizzbuzz classification (U1), grouped ----------------
    "e00_fizzbuzz_classify" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).events
        .withColumn("class",
          when($"event_id" % 15 === 0, "FIZZBUZZ")
            .when($"event_id" % 3 === 0, "FIZZ")
            .when($"event_id" % 5 === 0, "BUZZ")
            .otherwise("NUMBER"))
        .groupBy($"class")
        .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
        .orderBy($"class")
    }),

    // -- JSON payload extraction (dyn Any analog) -----------------------
    "e01_json_extract" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).events
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          (sum(dec($"value")).cast("double") / count(lit(1))).as("avg_value"))
        .orderBy($"event_type")
    }),

    // -- tumbling event-time window -------------------------------------
    "e02_tumbling_window" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).events
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
        .select($"window.start".as("ws"), $"event_type", $"n", $"total_value")
        .orderBy($"ws", $"event_type")
    }),

    // -- sliding event-time window (1 h window, 15 min slide) -----------
    "e03_sliding_window" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).events
        .groupBy(window($"ts", "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"), dsum($"value").as("total_value"))
        .select($"window.start".as("ws"), $"n", $"total_value")
        .orderBy($"ws")
    }),

    // -- session windows (30 min gap), batch sessionization -------------
    "e04_session_window" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir).events
        .withColumn("prev_ts", lag($"ts", 1).over(w))
        .withColumn("new_sess",
          when($"prev_ts".isNull ||
            unix_micros($"ts") - unix_micros($"prev_ts") > 1800000000L, 1)
            .otherwise(0))
        .withColumn("sess_id", sum($"new_sess").over(run))
        .groupBy($"user_id", $"sess_id")
        .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
          count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
        .select($"user_id", $"session_start", $"session_end", $"n_events",
          $"total_value")
        .orderBy($"user_id", $"session_start")
    }),

    // -- as-of join: each purchase matched to latest prior click --------
    // Scalable union+window form: one shuffle on user_id, no range
    // cross-product (the classic as-of pattern; DuckDB's ASOF JOIN is
    // the oracle).
    "e05_asof_click" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables(s, dir).events
      graft.operators.AsofJoin.asofBackward(
          ev.filter($"event_type" === "purchase")
            .select($"user_id", $"ts", $"event_id"),
          ev.filter($"event_type" === "click")
            .select($"user_id", $"ts", $"event_id"),
          on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          pick = Seq("event_id" -> "last_click_id", "ts" -> "last_click_ts"),
          tieBreak = Some("event_id"))
        .filter($"last_click_ts".isNotNull)
        .select($"event_id", $"user_id", $"ts", $"last_click_id",
          $"last_click_ts")
        .orderBy($"event_id")
    }),

    // -- forward as-of: time-to-next-purchase per click ------------------
    // The mirror of e05 ([[graft.operators.AsofJoin.asofForward]]):
    // for each click, the earliest purchase at-or-after it by the same
    // user, plus the gap in whole minutes — the "time to conversion"
    // join, still one shuffle and zero row multiplication.
    // -- calendar function surface (month-end, add_months, dow, ...) ----
    // The datetime scalar family the other queries don't touch; every
    // output is cast to the representation both engines agree on
    // (TIMESTAMP for derived dates, BIGINT for ordinals — Spark's
    // dayofweek is 1-based Sunday, DuckDB's 0-based, aligned with +1).
    "e18_calendar" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).orders
        .filter($"o_custkey" <= 20)
        .select($"o_orderkey", $"o_orderdate",
          last_day($"o_orderdate").cast("timestamp").as("month_end"),
          add_months($"o_orderdate", 2).cast("timestamp").as("plus_2m"),
          dayofweek($"o_orderdate").cast("long").as("dow"),
          quarter($"o_orderdate").cast("long").as("q"),
          datediff($"o_orderdate", lit("1995-01-01").cast("date"))
            .cast("long").as("days_since_95"))
        .orderBy($"o_orderkey")
    }),

    "e17_next_purchase" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables(s, dir).events
      graft.operators.AsofJoin.asofForward(
          ev.filter($"event_type" === "click")
            .select($"user_id", $"ts", $"event_id"),
          ev.filter($"event_type" === "purchase")
            .select($"user_id", $"ts", $"event_id"),
          on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          pick = Seq("event_id" -> "next_purchase_id",
            "ts" -> "next_purchase_ts"),
          tieBreak = Some("event_id"))
        .filter($"next_purchase_ts".isNotNull)
        .withColumn("gap_min", expr(
          "(unix_micros(next_purchase_ts) - unix_micros(ts)) div 60000000"))
        .select($"event_id", $"user_id", $"ts", $"next_purchase_id",
          $"gap_min")
        .orderBy($"event_id")
    }),

    // -- multi-touch attribution: U-shaped credit per conversion --------
    // The marketing-analytics staple: every click/view/signup touch
    // attributes forward to the user's NEXT purchase within a 24h
    // lookback (the e17 as-of-forward shape — each touch credits
    // exactly one conversion, so credit never double-counts), then
    // position-based (U-shaped) credit in integer per-mille: 40% to
    // the first touch, 40% to the last, 20% split across the middle
    // (n=1 → 1000, n=2 → 500/500), with the integer-division
    // remainder pinned to the last touch so every conversion's credit
    // sums to exactly 1000. Channel rollup = credited conversions ×
    // 1000. Scale: one as-of merge-sort per user partition plus two
    // conv_id-keyed windows — no self-join, no driver state.
    "e23_attribution" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables(s, dir).events
      val att = graft.operators.AsofJoin.asofForward(
          ev.filter($"event_type".isin("click", "view", "signup"))
            .select($"user_id", $"ts", $"event_id", $"event_type"),
          ev.filter($"event_type" === "purchase")
            .select($"user_id", $"ts", $"event_id"),
          on = Seq("user_id"), leftTs = "ts", rightTs = "ts",
          pick = Seq("event_id" -> "conv_id", "ts" -> "conv_ts"),
          tieBreak = Some("event_id"))
        .filter($"conv_ts".isNotNull &&
          expr("unix_micros(conv_ts) - unix_micros(ts) <= 86400000000"))
      val wp = Window.partitionBy($"conv_id").orderBy($"ts", $"event_id")
      att.withColumn("pos", row_number().over(wp).cast("long"))
        .withColumn("n",
          count(lit(1)).over(Window.partitionBy($"conv_id")))
        .withColumn("credit", expr(
          """CASE WHEN n = 1 THEN 1000
            |     WHEN n = 2 THEN 500
            |     WHEN pos = 1 THEN 400
            |     WHEN pos = n THEN
            |       400 + (200 - (200 div (n - 2)) * (n - 2))
            |     ELSE 200 div (n - 2) END""".stripMargin))
        .groupBy($"event_type".as("channel"))
        .agg(count(lit(1)).as("n_touches"),
          countDistinct($"conv_id").as("n_conversions"),
          sum($"credit").cast("long").as("credit_total_pm"))
        .orderBy($"channel")
    }),

    // -- keep-first dedup by business key (deterministic) ---------------
    "e06_dedup_first" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts", $"event_id")
      Tables(s, dir).events
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_type", $"event_id".as("first_event_id"),
          $"ts".as("first_ts"), $"value".as("first_value"))
        .orderBy($"user_id", $"event_type")
    }),

    // -- funnel: signup -> purchase within 7 days -----------------------
    "e07_funnel" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables(s, dir).events
      val signups = ev.filter($"event_type" === "signup")
        .groupBy($"user_id").agg(min($"ts").as("signup_ts"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id".as("p_user_id"), $"ts".as("p_ts"))
      val firstPurchase = purchases
        .join(signups, $"p_user_id" === $"user_id" && $"p_ts" >= $"signup_ts")
        .groupBy($"p_user_id").agg(min($"p_ts").as("first_purchase_ts"))
      signups
        .join(firstPurchase, $"user_id" === $"p_user_id", "left")
        .select($"user_id", $"signup_ts", $"first_purchase_ts",
          when($"first_purchase_ts".isNotNull &&
            unix_micros($"first_purchase_ts") - unix_micros($"signup_ts")
              <= 604800000000L, 1).otherwise(0).cast("int").as("converted_7d"))
        .orderBy($"user_id")
    }),

    // -- top-k by exact aggregate ---------------------------------------
    "e08_top_spenders" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).events
        .filter($"event_type" === "purchase")
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_purchases"), dsum($"value").as("total_spent"))
        .orderBy($"total_spent".desc, $"user_id")
        .limit(10)
    }),

    // -- interval (range) join: clicks within 1h before each purchase ---
    // Equi-join on user_id carries the shuffle; the time predicate
    // prunes within partitions — the scalable range-join shape (no
    // cross product; at 100 TB add date-bucketing to both sides).
    "e10_interval_join" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables(s, dir).events
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("p_id"), $"ts".as("p_ts"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("c_ts"))
      purchases.join(clicks,
          purchases("user_id") === clicks("user_id") &&
          $"c_ts" >= $"p_ts" - expr("INTERVAL 1 HOUR") && $"c_ts" < $"p_ts",
          "left")
        .groupBy($"p_id")
        .agg(count($"c_ts").as("n_clicks_1h"))
        .orderBy($"p_id")
    }),

    // -- native session_window (the streaming sessionizer, batch form) --
    "e11_session_window_fn" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).events
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"), dsum($"value").as("total_value"))
        .select($"user_id", $"sw.start".as("session_start"),
          $"sw.end".as("session_end"), $"n_events", $"total_value")
        .orderBy($"user_id", $"session_start")
    }),

    // -- daily activity (date_trunc + distinct count) -------------------
    "e09_daily_activity" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).events
        .groupBy(date_trunc("day", $"ts").as("day"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct($"user_id").as("n_users"),
          dsum($"value").as("total_value"))
        .orderBy($"day")
    }),

    // -- e24: rolling 7-day active users (DAU/WAU stickiness) -----------
    // The engagement dashboard headline: per day, how many distinct
    // users were active in the trailing 7 days, and the DAU/WAU
    // stickiness ratio. A sliding DISTINCT doesn't decompose into
    // window frames, so it is restated map-side: each distinct
    // (user, day) pair is exploded to the 7 window-END days it
    // contributes to (sequence + explode — row-local, no window
    // state), then one exact keyed distinct per end day. 7× row
    // amplification, two hash aggregates, one co-keyed join — every
    // stage combinable. At 100 TB the exact per-day distinct swaps
    // for the x11 HLL-sketch rollup (re-aggregatable across days by
    // construction); this query is the exactness reference. Only
    // days with actual activity emit (inner join against DAU).
    // -- e25: CEP pattern with negation (MATCH_RECOGNIZE semantics) -----
    // The complex-event-processing shape SQL:2016 spells as
    // MATCH_RECOGNIZE and Flink ships as CEP: per user, a VIEW
    // converts iff the FIRST purchase within a day follows it, at
    // least one click falls strictly between, and NO error event
    // intervenes — the negation ("absence of an event inside the
    // match window") is what plain funnel existence (e07) cannot say.
    // Spelled relationally: first-purchase = the as-of argmin
    // (min-struct, no window), the click requirement a LEFT SEMI and
    // the error veto a LEFT ANTI on the (view, purchase) interval —
    // three keyed joins, each bounded by per-user event density
    // inside the one-day window, no per-user sequence
    // materialization, no quadratic pair set. Per-user rollup keeps
    // zero-conversion users visible (left completion).
    "e25_cep_pattern" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables(s, dir).events
      val v = ev.filter($"event_type" === "view")
        .select($"user_id", $"event_id".as("v_id"), $"ts".as("v_ts"))
      val p = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("p_id"), $"ts".as("p_ts"))
      val firstP = v.join(p, Seq("user_id"))
        .filter($"p_ts" > $"v_ts" &&
          $"p_ts" <= $"v_ts" + expr("INTERVAL 1 DAY"))
        .groupBy($"user_id", $"v_id", $"v_ts")
        .agg(min(struct($"p_ts", $"p_id")).as("fp"))
        .select($"user_id", $"v_id", $"v_ts",
          $"fp.p_ts".as("p_ts"), $"fp.p_id".as("p_id"))
      val c = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("c_ts"))
      val x = ev.filter($"event_type" === "error")
        .select($"user_id", $"ts".as("x_ts"))
      val matched = firstP
        .join(c, firstP("user_id") === c("user_id") &&
          $"c_ts" > $"v_ts" && $"c_ts" < $"p_ts", "left_semi")
        .join(x, firstP("user_id") === x("user_id") &&
          $"x_ts" > $"v_ts" && $"x_ts" < $"p_ts", "left_anti")
      val conv = matched.groupBy($"user_id")
        .agg(count(lit(1)).as("n_converted"),
          min(struct($"v_ts", $"v_id", $"p_id")).as("f"))
        .select($"user_id", $"n_converted",
          $"f.v_id".as("first_view"), $"f.p_id".as("first_purchase"))
      v.groupBy($"user_id").agg(count(lit(1)).as("n_views"))
        .join(conv, Seq("user_id"), "left")
        .select($"user_id", $"n_views",
          coalesce($"n_converted", lit(0L)).as("n_converted"),
          $"first_view", $"first_purchase")
        .orderBy($"user_id")
    }),

    "e24_rolling_active_users" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ud = Tables(s, dir).events
        .select(to_date($"ts").as("d"), $"user_id").distinct()
      val wau = ud
        .select(explode(sequence($"d", date_add($"d", 6))).as("d"),
          $"user_id")
        .distinct()
        .groupBy($"d").agg(count(lit(1)).as("wau"))
      val dau = ud.groupBy($"d").agg(count(lit(1)).as("dau"))
      dau.join(wau, Seq("d"))
        .select($"d".cast("timestamp").as("day"), $"dau", $"wau",
          expr("dau * 1000 div wau").as("stickiness_pm"))
        .orderBy($"day")
    }),

    // -- time-series gap fill: complete day spine + LOCF ----------------
    // Missing (event_type, day) buckets appear as zero rows, and the
    // last observed daily value carries forward — the two standard
    // repairs before feeding a series downstream. The spine is
    // sequence()+explode (distributed; no driver-side date loop) and
    // the fill is one window pass.
    // -- TWAP: the time-weighted mean, the step-function integral -------
    // The metric every monitoring / pricing readout actually wants
    // (a plain AVG over samples overweights bursts): per (event_type,
    // day), value is held left-continuous until the next sample and
    // integrated — Σ valueᵢ·(tᵢ₊₁−tᵢ) / Σ(tᵢ₊₁−tᵢ) — entirely in
    // integers (cents × epoch-micros, ratio via div in milli-cents),
    // so the integral is order-independent and oracle-exact. One
    // keyed window (lead) + one hash aggregate; the window partitions
    // by (type, day) so no global sort exists and state per partition
    // is one day of one type. Zero-span groups (all samples on one
    // timestamp) are excluded on both sides.
    "e26_twap" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type", $"day")
        .orderBy($"us", $"event_id")
      Tables(s, dir).events
        .select($"event_type", to_date($"ts").as("day"),
          unix_micros($"ts").as("us"),
          expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"),
          $"event_id")
        .withColumn("next_us", lead($"us", 1).over(w))
        .filter($"next_us".isNotNull)
        .withColumn("dt", $"next_us" - $"us")
        .groupBy($"event_type", $"day")
        .agg(count(lit(1)).as("n_intervals"),
          sum($"dt").as("span_us"),
          sum($"cents" * $"dt").as("num"))
        .filter($"span_us" > 0)
        .withColumn("twap_millicents", expr("num * 1000 div span_us"))
        .select($"event_type", $"day", $"n_intervals", $"span_us",
          $"twap_millicents")
        .orderBy($"event_type", $"day")
    }),

    // -- dyadic EWMA rolling feature: exact-integer decay ---------------
    // The α=1/2 exponentially-weighted moving value every trading /
    // feature pipeline wants, made hash-exact: weights are powers of
    // two over the 10 most recent events (newest ×512 … oldest ×1),
    // so the smoothed value is a BIGINT both engines compute bit for
    // bit — ten codegen'd LAGs over ONE window pass, no self-join, no
    // floats. Emitted per user at the latest event (rank-desc
    // filter), with the event count pinning window completeness.
    "e27_ewma_feature" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val wd = Window.partitionBy($"user_id")
        .orderBy($"ts".desc, $"event_id".desc)
      val lags = (1 to 9).map(j =>
        coalesce(lag($"cents", j).over(w), lit(0L)) * (1L << (9 - j)))
      val ewma = lags.foldLeft($"cents" * 512L)(_ + _)
      Tables(s, dir).events
        .select($"user_id", $"event_id", $"ts",
          expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
        .withColumn("ewma", ewma)
        .withColumn("rnd", row_number().over(wd))
        .withColumn("n_events", count(lit(1)).over(
          Window.partitionBy($"user_id")))
        .filter($"rnd" === 1)
        .select($"user_id", $"n_events", $"ewma".as("last_ewma"))
        .orderBy($"user_id")
    }),

    // -- seasonal baseline + robust residual anomaly --------------------
    // The time-series health check every metrics pipeline runs: a
    // day-of-week seasonal baseline per event type (integer mean of
    // the type's daily cent-totals sharing that weekday), residuals
    // against it, and a robust flag — |resid|·n_days > 2·Σ|resid|,
    // i.e. more than twice the type's mean absolute residual —
    // spelled entirely in BIGINTs so both engines agree bit for bit.
    // Weekday is epoch-day mod 7 (calendar-free: identical in any
    // engine/locale/timezone; days since 1970-01-01 are positive so
    // the two engines' % agree). Two window passes over the tiny
    // daily grain (types × days rows) AFTER the one aggregating
    // exchange on (event_type, day); at 100 TB the raw scan reduces
    // map-side to that grain, and the window inputs are a few
    // thousand rows per type regardless of corpus size.
    "e28_seasonal_anomaly" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val wSeas = Window.partitionBy($"event_type", $"dow")
      val wType = Window.partitionBy($"event_type")
      Tables(s, dir).events
        .select($"event_type", to_date($"ts").as("day"),
          expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
        .groupBy($"event_type", $"day")
        .agg(sum($"cents").as("day_cents"))
        .withColumn("dow",
          datediff($"day", to_date(lit("1970-01-01"))) % 7)
        .withColumn("seas_num", sum($"day_cents").over(wSeas))
        .withColumn("seas_n", count(lit(1)).over(wSeas))
        .withColumn("seas_cents", expr("seas_num div seas_n"))
        .withColumn("resid", $"day_cents" - $"seas_cents")
        .withColumn("sum_abs", sum(abs($"resid")).over(wType))
        .withColumn("n_days", count(lit(1)).over(wType))
        .withColumn("is_anomaly",
          when(abs($"resid") * $"n_days" > $"sum_abs" * 2L, 1L)
            .otherwise(0L))
        .select($"event_type", $"day", $"day_cents", $"seas_cents",
          $"resid", $"is_anomaly")
        .orderBy($"event_type", $"day")
    }),

    // -- peak concurrency: the interval sweep line ----------------------
    // "How many users were mid-session at the busiest instant of each
    // day" — the capacity-planning / license-audit / max-load query.
    // Sessions are per-(user, day) [first event, last event] closed
    // intervals; the sweep spells each as +1 at start and -1 at end,
    // nets simultaneous deltas by ordering starts BEFORE ends at the
    // same instant (closed-interval overlap: a session ending at t
    // still overlaps one starting at t), and takes the running sum —
    // concurrency(t) = starts≤t − ends<t, evaluated at every start,
    // whose maximum is the day's peak (max concurrency of an interval
    // system is always attained at some interval start). Determinism:
    // interchangeable +1 rows at one instant prefix-sum to the same
    // final value and MAX keeps the largest, so tie order is
    // irrelevant. At 100 TB the window is PARTITIONed by day (sessions
    // never span days by construction), so the sort is per-day-
    // partition, never global — and a year of load is 365 independent
    // sweeps in one job.
    "e29_peak_concurrency" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val sessions = Tables(s, dir).events
        .groupBy($"user_id", to_date($"ts").as("day"))
        .agg(min($"ts").as("s"), max($"ts").as("e"))
      val deltas = sessions.select($"day",
          explode(array(struct($"s".as("t"), lit(1L).as("delta")),
            struct($"e".as("t"), lit(-1L).as("delta")))).as("ev"))
        .select($"day", $"ev.t".as("t"), $"ev.delta".as("delta"))
      val sweep = Window.partitionBy($"day")
        .orderBy($"t".asc, $"delta".desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas
        .withColumn("conc", sum($"delta").over(sweep))
        .filter($"delta" === 1L)
        .groupBy($"day")
        .agg(max($"conc").as("peak_concurrent"),
          count(lit(1)).as("n_sessions"))
        .orderBy($"day")
    }),

    // -- positional multi-touch attribution -----------------------------
    // The marketing-science workload: every purchase distributes its
    // value over the user's clicks in the prior 7 days, U-shaped —
    // 40% to the first touch, 40% to the last, 20% shared by the
    // middles (1 touch → 100%, 2 → 50/50). Exactness discipline:
    // weights are INTEGER ppm, the middle share is 200000 div (k-2)
    // with the remainder spread one-ppm-each over the earliest
    // middles, so every purchase's weights sum to exactly 10⁶ and
    // credit stays BIGINT end to end (credit = cents × ppm). The
    // touch set is a per-user equi-join with a range predicate (never
    // a time-range cross join); position and k come from one window
    // per purchase keyed by the unique purchase event id, tie-broken
    // by (ts, click id) — fully deterministic. At 100 TB the join
    // shuffles on user_id (bounded per-user fan-out C·P; a pathological
    // mega-user is the x15 salting case) and the window partitions by
    // purchase — both keys high-cardinality, no global sort anywhere.
    "e30_attribution" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables(s, dir).events
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts".as("tp"), $"event_id".as("pid"),
          expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts".as("tc"), $"event_id".as("cid"))
      val w = Window.partitionBy($"pid")
      purchases.join(clicks, Seq("user_id"))
        .filter($"tc" < $"tp" &&
          $"tc" >= $"tp" - expr("INTERVAL 7 DAYS"))
        .withColumn("pos", row_number().over(w.orderBy($"tc", $"cid")))
        .withColumn("k", count(lit(1)).over(w))
        .withColumn("wppm", expr(
          """CASE WHEN k = 1 THEN 1000000
            |     WHEN k = 2 THEN 500000
            |     WHEN pos = 1 OR pos = k THEN 400000
            |     ELSE 200000 div (k - 2) +
            |       (CASE WHEN pos - 1 <= 200000 % (k - 2)
            |             THEN 1 ELSE 0 END)
            |END""".stripMargin))
        .groupBy(to_date($"tc").as("day"))
        .agg(count(lit(1)).as("n_touches"),
          countDistinct($"pid").as("n_purchases"),
          sum($"cents" * $"wppm").as("credit_ppm_cents"))
        .orderBy($"day")
    }),

    // -- rolling OLS trend slope, exact-integer -------------------------
    // "Is this metric trending up" answered with the least-squares
    // slope over a trailing 14-observation window — but emitted as the
    // exact INTEGER pair (num, den) of slope = num/den =
    // (nΣxy − ΣxΣy) / (nΣx² − (Σx)²), x = epoch day, y = day cents.
    // Dividing would force a float (order-sensitive, oracle-hostile);
    // the ratio's sign and any downstream comparison (slope > θ ⟺
    // num > θ·den) work on the integer pair directly — the e27 dyadic
    // EWMA discipline applied to regression. Four running sums over
    // one ROWS window partitioned by event_type: state per series is
    // O(window), the plan is one shuffle on the series key, and a
    // million series trend in parallel. trend = sign(num) since den >
    // 0 whenever the window holds ≥ 2 distinct days.
    "e31_trend_slope" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"event_type").orderBy($"x")
        .rowsBetween(-13, Window.currentRow)
      Tables(s, dir).events
        .groupBy($"event_type", to_date($"ts").as("day"))
        .agg(sum(expr("CAST(FLOOR(value * 100) AS BIGINT)")).as("y"))
        .withColumn("x",
          datediff($"day", to_date(lit("1970-01-01"))).cast("long"))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("sx", sum($"x").over(w))
        .withColumn("sy", sum($"y").over(w))
        .withColumn("sxy", sum($"x" * $"y").over(w))
        .withColumn("sxx", sum($"x" * $"x").over(w))
        .select($"event_type", $"day",
          $"y".as("day_cents"),
          ($"n" * $"sxy" - $"sx" * $"sy").as("slope_num"),
          ($"n" * $"sxx" - $"sx" * $"sx").as("slope_den"),
          signum($"n" * $"sxy" - $"sx" * $"sy").cast("long").as("trend"))
        .orderBy($"event_type", $"day")
    }),

    "e12_gap_fill" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val events = Tables(s, dir).events
      val daily = events
        .groupBy($"event_type", date_trunc("day", $"ts").as("day"))
        .agg(count(lit(1)).as("n"), dsum($"value").as("day_value"))
      val bounds = events.agg(
        date_trunc("day", min($"ts")).as("d0"),
        date_trunc("day", max($"ts")).as("d1"))
      val spine = events.select($"event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select($"event_type",
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(daily, Seq("event_type", "day"), "left")
        .select($"event_type", $"day",
          coalesce($"n", lit(0L)).as("n_events"),
          coalesce(last($"day_value", ignoreNulls = true).over(w), lit(0.0))
            .as("locf_value"))
        .orderBy($"event_type", $"day")
    }),

    // -- linear-interpolation gap fill: the other time-series repair ----
    // e12 carries the last observation forward; e22 INTERPOLATES —
    // the resampling a metrics store does for sparse series (here:
    // daily purchase cent-totals per user, ~13 obs across 30 days, so
    // interior gaps genuinely exist). Missing interior days take the
    // integer weighted average
    //   (prev·(next_i − i) + next·(i − prev_i)) div (next_i − prev_i)
    // — algebraically the linear interpolant, but spelled so the
    // numerator is a sum of NON-NEGATIVE products: portable floor
    // division, never a negative operand where the engines' integer
    // divisions could round apart. Head gaps backfill, tail gaps
    // LOCF. Two windows (run-forward, run-backward) over one
    // user-partitioned sort — same exchange structure as e12.
    "e22_interp_fill" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val events = Tables(s, dir).events
      val daily = events
        .filter($"event_type" === "purchase" && $"user_id" <= 20)
        .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
        .agg(sum(expr("CAST(FLOOR(value * 100) AS BIGINT)")).as("cents"))
      val bounds = events.agg(
        date_trunc("day", min($"ts")).as("d0"),
        date_trunc("day", max($"ts")).as("d1"))
      val spine = daily.select($"user_id").distinct()
        .crossJoin(broadcast(bounds))
        .select($"user_id", $"d0",
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val wPrev = Window.partitionBy($"user_id").orderBy($"idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy($"user_id").orderBy($"idx")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(daily, Seq("user_id", "day"), "left")
        .withColumn("idx", datediff($"day", $"d0").cast("long"))
        .withColumn("obs_idx", when($"cents".isNotNull, $"idx"))
        .withColumn("prev_c", last($"cents", ignoreNulls = true).over(wPrev))
        .withColumn("prev_i", last($"obs_idx", ignoreNulls = true).over(wPrev))
        .withColumn("next_c", first($"cents", ignoreNulls = true).over(wNext))
        .withColumn("next_i", first($"obs_idx", ignoreNulls = true).over(wNext))
        .select($"user_id", $"day",
          when($"cents".isNotNull, 1).otherwise(0).cast("int").as("is_obs"),
          when($"cents".isNotNull, $"cents")
            .when($"prev_c".isNotNull && $"next_c".isNotNull,
              expr("(prev_c * (next_i - idx) + next_c * (idx - prev_i)) " +
                "div (next_i - prev_i)"))
            .when($"prev_c".isNotNull, $"prev_c")
            .otherwise($"next_c").as("interp_cents"))
        .orderBy($"user_id", $"day")
    }),

    // -- behavioral transition matrix: event_type → next event_type -----
    // Per-user lead() over the event-time order, then one aggregate —
    // the first-order Markov surface (funnel generalization). One
    // shuffle on user_id for the window, one map-side-combinable agg.
    "e13_event_transitions" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables(s, dir).events
        .select($"user_id", $"event_type",
          lead($"event_type", 1).over(w).as("next_type"))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type", $"next_type")
        .agg(count(lit(1)).as("n"))
        .orderBy($"event_type", $"next_type")
    }),

    // -- sequential path mining: top 3-step event paths -----------------
    // e13's transition matrix extended to order-3 patterns: the most
    // common event_type trigrams across user timelines (the "what do
    // users do next" funnel-discovery query). Same per-user window
    // (never global); trigram assembly is two LEADs over one sort, the
    // count is map-side combinable, and the top-10 is a bounded
    // TakeOrderedAndProject — per-partition heaps, no global sort.
    "e19_event_paths" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables(s, dir).events
        .select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("e2", lead($"event_type", 1).over(w))
        .withColumn("e3", lead($"event_type", 2).over(w))
        .filter($"e3".isNotNull)
        .select(concat_ws(">", $"event_type", $"e2", $"e3").as("path"))
        .groupBy($"path")
        .agg(count(lit(1)).as("n"))
        .orderBy($"n".desc, $"path")
        .limit(10)
    }),

    // -- VARIANT ingest tier: parse once, extract cheaply ---------------
    // Spark 4's VARIANT type is the production JSON-ingest shape at
    // 100 TB: `parse_json` once at the scan boundary into the binary
    // variant encoding, then every downstream path extraction
    // (`variant_get`) is a cheap binary probe instead of a re-parse —
    // e01's `get_json_object` re-tokenizes the string per call. The
    // query also pins `schema_of_variant`'s inferred shape, so a
    // payload drift (a new field, a type change) becomes a hash
    // mismatch instead of a silent NULL.
    "e21_variant_extract" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).events
        .withColumn("v", expr("parse_json(props)"))
        .select($"event_type",
          expr("variant_get(v, '$.k', 'long')").as("k"),
          expr("schema_of_variant(v)").as("vschema"))
        .groupBy($"event_type", $"vschema")
        .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
          min($"k").as("min_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    }),

    // -- OHLC bars: deterministic argmin/argmax first/last --------------
    // The financial-bars shape (open/high/low/close per (user, day)
    // over purchase events): open and close are FIRST/LAST-in-group,
    // computed as `min(struct(ts, event_id, cents))` /
    // `max(struct(...))` — lexicographic struct order IS the
    // (ts, event_id) total order, so the extremum carries its payload
    // deterministically even under ts ties, with NO window and NO
    // per-group sort: one combinable aggregate, map-side partials and
    // all. The oracle spells the same thing as DuckDB's ordered-set
    // first/last. At 100 TB this is one keyed exchange over the
    // event scan — the cheapest correct spelling of "first value per
    // group".
    "e20_ohlc_bars" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val ev = Tables(s, dir).events
        .filter($"event_type" === "purchase")
        .select($"user_id", date_trunc("day", $"ts").as("day"),
          $"ts", $"event_id",
          expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
      ev.groupBy($"user_id", $"day")
        .agg(
          min(struct($"ts", $"event_id", $"cents")).getField("cents")
            .as("open_cents"),
          max($"cents").as("high_cents"),
          min($"cents").as("low_cents"),
          max(struct($"ts", $"event_id", $"cents")).getField("cents")
            .as("close_cents"),
          count(lit(1)).as("n_trades"),
          sum($"cents").as("volume_cents"))
        .orderBy($"user_id", $"day")
    }),

    // -- typed downcast of the open payload: from_json with schema ------
    // The engine's honest analog of the reference's checked downcast
    // (EventBox::get_event, src/event.rs:90-98): parse `props` against
    // a declared schema; a field the payload doesn't carry comes back
    // NULL — the `None`-on-mismatch semantics — so n_mismatch counts 0.
    "e14_typed_downcast" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      Tables(s, dir).events
        .withColumn("p", from_json($"props",
          org.apache.spark.sql.types.StructType.fromDDL("k LONG")))
        .withColumn("miss", from_json($"props",
          org.apache.spark.sql.types.StructType.fromDDL("missing STRING")))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"p.k").as("sum_k"),
          count($"miss.missing").as("n_mismatch"))
        .orderBy($"event_type")
    }),

    // -- cohort retention: users active N weeks after first activity ----
    // Two hash aggregates + one equi-join on user_id (the cohort table
    // re-joins the activity table; both shuffle once on user_id and
    // combine map-side) — the standard retention matrix, no windows,
    // no self-cross.
    "e15_cohort_retention" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val events = Tables(s, dir).events
      val activity = events
        .select($"user_id", date_trunc("day", $"ts").as("day")).distinct()
      val cohort = activity.groupBy($"user_id")
        .agg(min($"day").as("cohort_day"))
      activity.join(cohort, "user_id")
        .withColumn("week_offset",
          expr("datediff(day, cohort_day) div 7"))
        .groupBy($"cohort_day", $"week_offset")
        .agg(countDistinct($"user_id").as("n_active"))
        .orderBy($"cohort_day", $"week_offset")
    }),

    // -- windowed leaderboard: top-3 spenders per day --------------------
    // Time-bucketed aggregate THEN per-bucket rank — the two-window
    // composition (event-time bucket + ranking window) behind every
    // "daily top N" surface; one shuffle per step, rank prunes to 3
    // rows per day before the sort.
    "e16_daily_leaderboard" -> ((s: SparkSession, dir: String) => {
      import s.implicits._
      val daily = Tables(s, dir).events
        .filter($"event_type" === "purchase")
        .groupBy(date_trunc("day", $"ts").as("day"), $"user_id")
        .agg(sum(expr("CAST(FLOOR(value * 100) AS BIGINT)")).as("cents"))
      val w = Window.partitionBy($"day").orderBy($"cents".desc, $"user_id")
      daily.withColumn("rank", row_number().over(w))
        .filter($"rank" <= 3)
        .orderBy($"day", $"rank")
    })
  )

  override def oracles: Map[String, String] = Map(
    // first-purchase per view via ROW_NUMBER, click EXISTS, error
    // NOT EXISTS on the open interval — MATCH_RECOGNIZE replayed
    // relationally
    "e25_cep_pattern" ->
      """WITH v AS (SELECT user_id, event_id AS v_id, ts AS v_ts
        |           FROM events WHERE event_type = 'view'),
        |fp AS (
        |  SELECT user_id, v_id, v_ts, p_ts, p_id FROM (
        |    SELECT v.user_id, v.v_id, v.v_ts, p.ts AS p_ts,
        |      p.event_id AS p_id,
        |      ROW_NUMBER() OVER (PARTITION BY v.user_id, v.v_id
        |        ORDER BY p.ts, p.event_id) AS rk
        |    FROM v JOIN events p ON p.user_id = v.user_id
        |      AND p.event_type = 'purchase'
        |      AND p.ts > v.v_ts AND p.ts <= v.v_ts + INTERVAL 1 DAY) t
        |  WHERE rk = 1),
        |m AS (
        |  SELECT * FROM fp
        |  WHERE EXISTS (SELECT 1 FROM events c
        |    WHERE c.user_id = fp.user_id AND c.event_type = 'click'
        |      AND c.ts > fp.v_ts AND c.ts < fp.p_ts)
        |    AND NOT EXISTS (SELECT 1 FROM events x
        |      WHERE x.user_id = fp.user_id AND x.event_type = 'error'
        |        AND x.ts > fp.v_ts AND x.ts < fp.p_ts)),
        |conv AS (
        |  SELECT user_id, n_converted, first_view, first_purchase FROM (
        |    SELECT user_id,
        |      CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
        |        AS n_converted,
        |      v_id AS first_view, p_id AS first_purchase,
        |      ROW_NUMBER() OVER (PARTITION BY user_id
        |        ORDER BY v_ts, v_id, p_id) AS rk
        |    FROM m) t
        |  WHERE rk = 1)
        |SELECT nv.user_id, nv.n_views,
        |  COALESCE(conv.n_converted, 0) AS n_converted,
        |  conv.first_view, conv.first_purchase
        |FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_views
        |      FROM v GROUP BY user_id) nv
        |LEFT JOIN conv ON nv.user_id = conv.user_id
        |ORDER BY nv.user_id""".stripMargin,

    "e00_fizzbuzz_classify" ->
      s"""SELECT CASE WHEN event_id % 15 = 0 THEN 'FIZZBUZZ'
         |            WHEN event_id % 3 = 0 THEN 'FIZZ'
         |            WHEN event_id % 5 = 0 THEN 'BUZZ'
         |            ELSE 'NUMBER' END AS class,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  ${sqlDsum("value")} AS total_value
         |FROM events GROUP BY 1 ORDER BY class""".stripMargin,

    "e01_json_extract" ->
      """SELECT event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e02_tumbling_window" ->
      s"""SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  ${sqlDsum("value")} AS total_value
         |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,

    "e03_sliding_window" ->
      s"""SELECT time_bucket(INTERVAL '15 minutes', ts) - j * INTERVAL '15 minutes' AS ws,
         |  CAST(COUNT(*) AS BIGINT) AS n,
         |  ${sqlDsum("value")} AS total_value
         |FROM events, LATERAL (SELECT unnest(generate_series(0, 3)) AS j) _
         |GROUP BY 1 ORDER BY ws""".stripMargin,

    "e04_session_window" ->
      s"""WITH x AS (
         |  SELECT user_id, ts, value, event_id,
         |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |y AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |      OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1 ELSE 0 END AS new_sess
         |  FROM x),
         |z AS (
         |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
         |  FROM y)
         |SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
         |  CAST(COUNT(*) AS BIGINT) AS n_events,
         |  ${sqlDsum("value")} AS total_value
         |FROM z GROUP BY user_id, sess_id
         |ORDER BY user_id, session_start""".stripMargin,

    "e05_asof_click" ->
      """SELECT p.event_id, p.user_id, p.ts,
        |  c.event_id AS last_click_id, c.ts AS last_click_ts
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY p.event_id""".stripMargin,

    "e06_dedup_first" ->
      """SELECT user_id, event_type, event_id AS first_event_id,
        |  ts AS first_ts, value AS first_value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
        |        ORDER BY ts, event_id) AS rn FROM events) t
        |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "e07_funnel" ->
      """WITH s AS (SELECT user_id, MIN(ts) AS signup_ts FROM events
        |           WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (SELECT e.user_id, MIN(e.ts) AS first_purchase_ts
        |      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts >= s.signup_ts
        |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        |SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
        |  CAST(CASE WHEN p.first_purchase_ts IS NOT NULL
        |    AND epoch_us(p.first_purchase_ts) - epoch_us(s.signup_ts) <= 604800000000
        |    THEN 1 ELSE 0 END AS INTEGER) AS converted_7d
        |FROM s LEFT JOIN p ON s.user_id = p.user_id
        |ORDER BY s.user_id""".stripMargin,

    "e08_top_spenders" ->
      s"""SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
         |  ${sqlDsum("value")} AS total_spent
         |FROM events WHERE event_type = 'purchase'
         |GROUP BY user_id ORDER BY total_spent DESC, user_id LIMIT 10""".stripMargin,

    "e10_interval_join" ->
      """SELECT p.event_id AS p_id, CAST(COUNT(c.ts) AS BIGINT) AS n_clicks_1h
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id
        |  AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
        |GROUP BY p.event_id ORDER BY p_id""".stripMargin,

    // session_window semantics: a new session starts when the gap is
    // >= 30 min (half-open [ts, ts+gap) windows); end = last ts + gap
    "e11_session_window_fn" ->
      s"""WITH x AS (
         |  SELECT user_id, ts, value,
         |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
         |  FROM events),
         |y AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |      OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000 THEN 1 ELSE 0 END AS new_sess
         |  FROM x),
         |z AS (
         |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
         |  FROM y)
         |SELECT user_id, MIN(ts) AS session_start,
         |  MAX(ts) + INTERVAL 30 MINUTES AS session_end,
         |  CAST(COUNT(*) AS BIGINT) AS n_events,
         |  ${sqlDsum("value")} AS total_value
         |FROM z GROUP BY user_id, sess_id
         |ORDER BY user_id, session_start""".stripMargin,

    "e09_daily_activity" ->
      s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         |  CAST(COUNT(*) AS BIGINT) AS n_events,
         |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
         |  ${sqlDsum("value")} AS total_value
         |FROM events GROUP BY 1 ORDER BY day""".stripMargin,

    // the same explode restatement (a (user, day) pair reaches the 7
    // window-end days day..day+6); integer division floors alike
    "e24_rolling_active_users" ->
      """WITH ud AS (
        |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS d,
        |    user_id
        |  FROM events),
        |contrib AS (
        |  SELECT DISTINCT d + CAST(i AS INTEGER) AS d, user_id
        |  FROM ud CROSS JOIN LATERAL
        |    (SELECT unnest(generate_series(0, 6)) AS i) _),
        |wau AS (
        |  SELECT d, CAST(COUNT(*) AS BIGINT) AS wau
        |  FROM contrib GROUP BY d),
        |dau AS (
        |  SELECT d, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY d)
        |SELECT CAST(dau.d AS TIMESTAMP) AS day, dau.dau, wau.wau,
        |  CAST(dau.dau * 1000 // wau.wau AS BIGINT) AS stickiness_pm
        |FROM dau JOIN wau USING (d) ORDER BY day""".stripMargin,

    // same non-negative weighted-average spelling; IGNORE NULLS
    // navigation mirrors Spark's last/first(ignoreNulls)
    "e22_interp_fill" ->
      """WITH daily AS (
        |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |    CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM events
        |  WHERE event_type = 'purchase' AND user_id <= 20
        |  GROUP BY 1, 2),
        |bounds AS (
        |  SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS d0,
        |    CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS d1
        |  FROM events),
        |spine AS (
        |  SELECT u.user_id, b.d0, CAST(s.day AS TIMESTAMP) AS day
        |  FROM (SELECT DISTINCT user_id FROM daily) u
        |  CROSS JOIN bounds b
        |  CROSS JOIN LATERAL (SELECT unnest(generate_series(b.d0, b.d1,
        |    INTERVAL 1 DAY)) AS day) s),
        |j AS (
        |  SELECT sp.user_id, sp.day,
        |    CAST(date_diff('day', sp.d0, sp.day) AS BIGINT) AS idx,
        |    d.cents,
        |    CASE WHEN d.cents IS NOT NULL
        |      THEN CAST(date_diff('day', sp.d0, sp.day) AS BIGINT)
        |    END AS obs_idx
        |  FROM spine sp LEFT JOIN daily d
        |    ON sp.user_id = d.user_id AND sp.day = d.day),
        |nav AS (
        |  SELECT user_id, day, idx, cents,
        |    last_value(cents IGNORE NULLS) OVER wp AS prev_c,
        |    last_value(obs_idx IGNORE NULLS) OVER wp AS prev_i,
        |    first_value(cents IGNORE NULLS) OVER wn AS next_c,
        |    first_value(obs_idx IGNORE NULLS) OVER wn AS next_i
        |  FROM j
        |  WINDOW wp AS (PARTITION BY user_id ORDER BY idx
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wn AS (PARTITION BY user_id ORDER BY idx
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT user_id, day,
        |  CAST(CASE WHEN cents IS NOT NULL THEN 1 ELSE 0 END AS INTEGER)
        |    AS is_obs,
        |  CAST(CASE
        |    WHEN cents IS NOT NULL THEN cents
        |    WHEN prev_c IS NOT NULL AND next_c IS NOT NULL THEN
        |      (prev_c * (next_i - idx) + next_c * (idx - prev_i))
        |        // (next_i - prev_i)
        |    WHEN prev_c IS NOT NULL THEN prev_c
        |    ELSE next_c END AS BIGINT) AS interp_cents
        |FROM nav ORDER BY user_id, day""".stripMargin,

    // the identical left-continuous step integral in integer
    // cents·micros, same (us, event_id) tie-broken lead
    "e26_twap" ->
      """WITH e AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |    epoch_us(ts) AS us,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents, event_id
        |  FROM events),
        |seq AS (
        |  SELECT event_type, day, us, cents,
        |    LEAD(us) OVER (PARTITION BY event_type, day
        |      ORDER BY us, event_id) AS next_us
        |  FROM e)
        |SELECT event_type, day,
        |  CAST(COUNT(*) AS BIGINT) AS n_intervals,
        |  CAST(SUM(next_us - us) AS BIGINT) AS span_us,
        |  CAST(CAST(SUM(cents * (next_us - us)) AS BIGINT) * 1000
        |    // CAST(SUM(next_us - us) AS BIGINT) AS BIGINT)
        |    AS twap_millicents
        |FROM seq WHERE next_us IS NOT NULL
        |GROUP BY event_type, day
        |HAVING SUM(next_us - us) > 0
        |ORDER BY event_type, day""".stripMargin,

    // the ten-lag dyadic spelling replayed verbatim: both engines sum
    // the same powers-of-two weights over the same total order
    "e27_ewma_feature" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |w AS (
        |  SELECT user_id,
        |    cents * 512
        |      + COALESCE(LAG(cents, 1) OVER win, 0) * 256
        |      + COALESCE(LAG(cents, 2) OVER win, 0) * 128
        |      + COALESCE(LAG(cents, 3) OVER win, 0) * 64
        |      + COALESCE(LAG(cents, 4) OVER win, 0) * 32
        |      + COALESCE(LAG(cents, 5) OVER win, 0) * 16
        |      + COALESCE(LAG(cents, 6) OVER win, 0) * 8
        |      + COALESCE(LAG(cents, 7) OVER win, 0) * 4
        |      + COALESCE(LAG(cents, 8) OVER win, 0) * 2
        |      + COALESCE(LAG(cents, 9) OVER win, 0) AS ewma,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts DESC, event_id DESC) AS rnd,
        |    COUNT(*) OVER (PARTITION BY user_id) AS n_events
        |  FROM e
        |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(ewma AS BIGINT) AS last_ewma
        |FROM w WHERE rnd = 1 ORDER BY user_id""".stripMargin,

    // epoch-day mod 7 weekday; DuckDB's window SUM over BIGINT widens
    // to HUGEINT, so every derived column is cast back down — values
    // fit BIGINT by construction (cent totals of a day)
    // the same four running sums; sign() returns DOUBLE in DuckDB →
    // cast through the CASE spelling to keep BIGINT
    "e31_trend_slope" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |xd AS (
        |  SELECT *, CAST(day - DATE '1970-01-01' AS BIGINT) AS x
        |  FROM daily),
        |s AS (
        |  SELECT event_type, day, y, x,
        |    COUNT(*) OVER win AS n,
        |    SUM(x) OVER win AS sx,
        |    SUM(y) OVER win AS sy,
        |    SUM(x * y) OVER win AS sxy,
        |    SUM(x * x) OVER win AS sxx
        |  FROM xd
        |  WINDOW win AS (PARTITION BY event_type ORDER BY x
        |    ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
        |SELECT event_type, day, y AS day_cents,
        |  CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
        |  CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
        |  CAST(CASE WHEN n * sxy - sx * sy > 0 THEN 1
        |            WHEN n * sxy - sx * sy < 0 THEN -1
        |            ELSE 0 END AS BIGINT) AS trend
        |FROM s ORDER BY event_type, day""".stripMargin,

    // same join/window/CASE; DuckDB // is Spark div on BIGINTs
    "e30_attribution" ->
      """WITH p AS (
        |  SELECT user_id, ts AS tp, event_id AS pid,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts AS tc, event_id AS cid
        |  FROM events WHERE event_type = 'click'),
        |t AS (
        |  SELECT p.pid, p.cents, c.tc, c.cid
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND c.tc < p.tp AND c.tc >= p.tp - INTERVAL 7 DAY),
        |r AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY pid ORDER BY tc, cid) AS pos,
        |    COUNT(*) OVER (PARTITION BY pid) AS k
        |  FROM t),
        |wt AS (
        |  SELECT *,
        |    CASE WHEN k = 1 THEN 1000000
        |         WHEN k = 2 THEN 500000
        |         WHEN pos = 1 OR pos = k THEN 400000
        |         ELSE 200000 // (k - 2) +
        |           (CASE WHEN pos - 1 <= 200000 % (k - 2)
        |                 THEN 1 ELSE 0 END)
        |    END AS wppm
        |  FROM r)
        |SELECT CAST(tc AS DATE) AS day,
        |  CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(COUNT(DISTINCT pid) AS BIGINT) AS n_purchases,
        |  CAST(SUM(cents * wppm) AS BIGINT) AS credit_ppm_cents
        |FROM wt GROUP BY 1 ORDER BY 1""".stripMargin,

    // same sweep: +1/-1 deltas, starts before ends at equal t (delta
    // DESC), per-day running sum sampled at starts
    "e29_peak_concurrency" ->
      """WITH sessions AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    MIN(ts) AS s, MAX(ts) AS e
        |  FROM events GROUP BY 1, 2),
        |deltas AS (
        |  SELECT day, s AS t, CAST(1 AS BIGINT) AS delta FROM sessions
        |  UNION ALL
        |  SELECT day, e, CAST(-1 AS BIGINT) FROM sessions),
        |sweep AS (
        |  SELECT day, delta,
        |    SUM(delta) OVER (PARTITION BY day ORDER BY t, delta DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        |  FROM deltas)
        |SELECT day, CAST(MAX(conc) AS BIGINT) AS peak_concurrent,
        |  CAST(COUNT(*) AS BIGINT) AS n_sessions
        |FROM sweep WHERE delta = 1
        |GROUP BY day ORDER BY day""".stripMargin,

    "e28_seasonal_anomaly" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT)
        |      AS day_cents
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT *, (day - DATE '1970-01-01') % 7 AS dow FROM daily),
        |s AS (
        |  SELECT *,
        |    CAST(SUM(day_cents) OVER (PARTITION BY event_type, dow)
        |      // COUNT(*) OVER (PARTITION BY event_type, dow)
        |      AS BIGINT) AS seas_cents
        |  FROM d),
        |r AS (
        |  SELECT *, day_cents - seas_cents AS resid FROM s),
        |t AS (
        |  SELECT *,
        |    CAST(SUM(ABS(resid)) OVER (PARTITION BY event_type)
        |      AS BIGINT) AS sum_abs,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n_days
        |  FROM r)
        |SELECT event_type, day, day_cents, seas_cents,
        |  CAST(resid AS BIGINT) AS resid,
        |  CAST(CASE WHEN ABS(resid) * n_days > 2 * sum_abs
        |    THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM t ORDER BY event_type, day""".stripMargin,

    "e12_gap_fill" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         |    CAST(COUNT(*) AS BIGINT) AS n, ${sqlDsum("value")} AS day_value
         |  FROM events GROUP BY 1, 2),
         |bounds AS (
         |  SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS d0,
         |    CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS d1
         |  FROM events),
         |spine AS (
         |  SELECT event_type, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
         |  FROM (SELECT DISTINCT event_type FROM events) CROSS JOIN bounds),
         |j AS (
         |  SELECT s.event_type, s.day, COALESCE(d.n, 0) AS n_events, d.day_value
         |  FROM spine s LEFT JOIN daily d
         |    ON s.event_type = d.event_type AND s.day = d.day)
         |SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
         |  COALESCE(last_value(day_value IGNORE NULLS) OVER (
         |    PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS locf_value
         |FROM j ORDER BY event_type, day""".stripMargin,

    "e19_event_paths" ->
      """SELECT event_type || '>' || e2 || '>' || e3 AS path,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM (
        |  SELECT event_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e2,
        |    LEAD(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS e3
        |  FROM events) t
        |WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,

    // the payload is uniformly {"k": N}, so Spark's inferred variant
    // schema is the literal OBJECT<k: BIGINT> for every row — the
    // oracle pins it as a constant; json_extract mirrors variant_get
    "e21_variant_extract" ->
      """SELECT event_type,
        |  'OBJECT<k: BIGINT>' AS vschema,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k,
        |  CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS min_k,
        |  CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // ordered-set first/last mirror Spark's min/max(struct(ts,
    // event_id, cents)) exactly: (ts, event_id) is a total order
    "e20_ohlc_bars" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('day', ts) AS day, ts, event_id,
        |    CAST(FLOOR(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, CAST(day AS TIMESTAMP) AS day,
        |  first(cents ORDER BY ts, event_id) AS open_cents,
        |  CAST(MAX(cents) AS BIGINT) AS high_cents,
        |  CAST(MIN(cents) AS BIGINT) AS low_cents,
        |  last(cents ORDER BY ts, event_id) AS close_cents,
        |  CAST(COUNT(*) AS BIGINT) AS n_trades,
        |  CAST(SUM(cents) AS BIGINT) AS volume_cents
        |FROM e GROUP BY user_id, day
        |ORDER BY user_id, day""".stripMargin,

    "e13_event_transitions" ->
      """SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM (
        |  SELECT event_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_type
        |  FROM events) t
        |WHERE next_type IS NOT NULL
        |GROUP BY event_type, next_type
        |ORDER BY event_type, next_type""".stripMargin,

    "e14_typed_downcast" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(props::JSON ->> 'k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(COUNT(json_extract_string(props, '$.missing')) AS BIGINT)
        |    AS n_mismatch
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "e15_cohort_retention" ->
      """WITH activity AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
        |  FROM events),
        |cohort AS (
        |  SELECT user_id, MIN(day) AS cohort_day
        |  FROM activity GROUP BY user_id)
        |SELECT c.cohort_day,
        |  date_diff('day', c.cohort_day, a.day) // 7 AS week_offset,
        |  CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
        |FROM activity a JOIN cohort c ON a.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY cohort_day, week_offset""".stripMargin,

    "e18_calendar" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS TIMESTAMP)
        |    AS plus_2m,
        |  CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |    AS BIGINT) AS days_since_95
        |FROM orders WHERE o_custkey <= 20
        |ORDER BY o_orderkey""".stripMargin,

    "e17_next_purchase" ->
      """SELECT c.event_id, c.user_id, c.ts,
        |  n.event_id AS next_purchase_id,
        |  (epoch_us(n.ts) - epoch_us(c.ts)) // 60000000 AS gap_min
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |JOIN LATERAL (
        |  SELECT p.event_id, p.ts FROM events p
        |  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        |    AND p.ts >= c.ts
        |  ORDER BY p.ts, p.event_id LIMIT 1) n ON TRUE
        |ORDER BY c.event_id""".stripMargin,

    // same e17 LATERAL next-purchase semantics (ts >= touch, ties by
    // event_id), then the identical integer U-shaped credit CASE
    "e23_attribution" ->
      """WITH t AS (
        |  SELECT event_id, user_id, ts, event_type FROM events
        |  WHERE event_type IN ('click', 'view', 'signup')),
        |a AS (
        |  SELECT t.event_id, t.event_type, t.ts, n.conv_id
        |  FROM t JOIN LATERAL (
        |    SELECT p.event_id AS conv_id, p.ts AS conv_ts FROM events p
        |    WHERE p.event_type = 'purchase' AND p.user_id = t.user_id
        |      AND p.ts >= t.ts
        |    ORDER BY p.ts, p.event_id LIMIT 1) n ON TRUE
        |  WHERE epoch_us(n.conv_ts) - epoch_us(t.ts) <= 86400000000),
        |pos AS (
        |  SELECT event_type, conv_id,
        |    ROW_NUMBER() OVER (PARTITION BY conv_id
        |      ORDER BY ts, event_id) AS pos,
        |    COUNT(*) OVER (PARTITION BY conv_id) AS n
        |  FROM a),
        |cr AS (
        |  SELECT event_type, conv_id,
        |    CASE WHEN n = 1 THEN 1000
        |         WHEN n = 2 THEN 500
        |         WHEN pos = 1 THEN 400
        |         WHEN pos = n THEN
        |           400 + (200 - (200 // (n - 2)) * (n - 2))
        |         ELSE 200 // (n - 2) END AS credit
        |  FROM pos)
        |SELECT event_type AS channel,
        |  CAST(COUNT(*) AS BIGINT) AS n_touches,
        |  CAST(COUNT(DISTINCT conv_id) AS BIGINT) AS n_conversions,
        |  CAST(SUM(credit) AS BIGINT) AS credit_total_pm
        |FROM cr GROUP BY 1 ORDER BY 1""".stripMargin,

    "e16_daily_leaderboard" ->
      """WITH daily AS (
        |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id,
        |    CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY 1, 2)
        |SELECT day, user_id, cents, rank FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY day
        |    ORDER BY cents DESC, user_id) AS INTEGER) AS rank FROM daily) t
        |WHERE rank <= 3 ORDER BY day, rank""".stripMargin
  )
}
