package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-process parity harness: runs declared queries twice — once
  * under plain `local[N]` and once under `local-cluster` (separate
  * executor JVMs, see [[GraftSession.cluster]]) — and compares exact
  * row fingerprints. local[N] shares one JVM between driver and
  * executors, so it never exercises closure/plan serialization, codegen
  * class shipping, or network task-result paths; this harness is the
  * single-machine stand-in for the 1000-executor deployment target.
  */
object ClusterParity {

  /** Canonical result fingerprint: schema DDL + every row rendered
    * with columns sorted by name, rows sorted lexicographically —
    * the same canonicalization discipline as the DuckDB oracle
    * compare (column-sorted, row-sorted, exact values).
    */
  def fingerprint(df: DataFrame): (String, Seq[String]) = {
    val cols = df.columns.sorted.toSeq
    val proj = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
    val schema = proj.schema.map(f => s"${f.name}:${f.dataType.sql}")
      .mkString(",")
    val rows = proj.collect().map(_.toSeq.map {
      case null => "NULL"
      case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
      case a: scala.collection.Seq[_] => a.mkString("[", "|", "]")
      case v => v.toString
    }.mkString("")).sorted.toSeq
    (schema, rows)
  }

  /** Stop whatever session is live (suites share a JVM via
    * getOrCreate) so the next builder call really applies its master.
    */
  def resetSessions(): Unit = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
  }

  /** Run `names` under one session factory, returning fingerprints.
    * The session is created once, torn down at the end.
    */
  def runAll(mk: () => SparkSession, names: Seq[String], sfDir: String)
      : Map[String, Either[String, (String, Seq[String])]] = {
    resetSessions()
    val spark = mk()
    try names.map { n =>
      n -> (try Right(fingerprint(SparkEntry.queries(n)(spark, sfDir)))
      catch { case e: Throwable =>
        Left(s"${e.getClass.getSimpleName}: ${e.getMessage}\n  at " +
          e.getStackTrace.take(12).mkString("\n  at "))
      })
    }.toMap
    finally {
      resetSessions()
      System.clearProperty("spark.testing")
      System.clearProperty("spark.test.home")
    }
  }

  /** The representative slice: every tier that serializes something
    * custom across the executor boundary — the custom exec node
    * (q32), codegen expressions (s01/d03), the licensed optimizer
    * rules (x29–x33), mapPartitions codec closures (m13, c16–c18),
    * graph iteration (g01…), persisted-index probe (d17), bucketed
    * serving tables (s14), streaming state + foreachBatch loops
    * (st37/st38/st40), the transformWithState processor family
    * (st8/st14/st15 — handle + processor objects serialized to the
    * state-store task, st8 on the RocksDB provider), signed-
    * retraction IVM (st32), the range-shuffled Z-order write (x16),
    * window-heavy samplers (c07/e24), cell-joined vector ops
    * (d10/s16), multi-seed BFS (g12), plus the relational core.
    */
  val queryNames: Seq[String] = Seq(
    "q01_pricing_summary", "q03_top_revenue", "q09_segment_top_orders",
    "q12_rollup_acctbal", "q22_pivot", "q24_exact_median",
    "q32_topk_native", "q35_recursive_cte",
    "e05_asof_click", "e10_interval_join",
    "x04_approx_sketches", "x08_bloom_prune_join", "x15_skew_join",
    "x29_matview_route", "x30_join_elimination", "x31_eager_agg",
    "x32_matview_maintain", "x33_matview_autorefresh",
    "d01_exact_dedup", "d03_minhash_bands", "d17_persisted_index_dedup",
    "s01_topk_bruteforce", "s14_persisted_ann_serving",
    "t01_token_stats", "t23_bpe_train",
    "c04_sequence_pack", "c16_warc_ingest", "c18_tar_gz_ingest",
    "m13_png_decode_real", "m15_jpeg_meta_imageio",
    "m16_ulaw_decode_real", "m18_avi_mjpeg_frames",
    "m19_mp3_frame_walk", "m21_gif_decode_real", "m22_flac_decode_real",
    "m23_flv_screen_video", "m24_mp1_subband_census",
    "m25_jpeg_coeff_census",
    "g01_pagerank", "g15_ktruss", "g19_trade_scc",
    "g20_quarterly_components",
    "st37_stream_extrema_rollup", "st38_stream_cep_inflight",
    "st40_stream_warc_ingest", "st41_stream_late_data",
    "d19_entity_resolution", "e28_seasonal_anomaly",
    "st8_transform_with_state", "st14_tws_timers", "st15_tws_mapstate",
    "st32_stream_join_view_ivm",
    "x16_zorder_layout", "c07_weighted_sample",
    "e24_rolling_active_users", "d10_semdedup", "s16_sq8_rerank_topk",
    "g12_harmonic_centrality",
    "g21_stress_centrality", "d20_fuzzy_join", "e29_peak_concurrency",
    "g22_eccentricity", "e30_attribution", "st42_stream_peak_concurrency",
    "s19_mmr_rerank", "st43_stream_temporal_enrich",
    "d21_prefix_filter_join", "e31_trend_slope", "d22_threshold_percolation",
    "m26_h264_sps_decode", "x35_heavy_hitters", "st44_stream_heavy_hitters",
    "p01_curation_pipeline",
    // round-9 late tier: the PackedWindows generator + MaxCodePoint
    // scalar serialized to executors (d23/d24), the manifest commit
    // protocol + change-feed tail (x37/st45), bare-dir compaction (x36)
    "d23_substring_dedup", "d24_longest_dup_passage",
    "x36_compact_small_files", "x37_manifest_time_travel",
    "st45_stream_table_tail", "x38_manifest_data_skipping",
    "st46_stream_manifest_sink", "x39_manifest_merge",
    "x40_manifest_schema_evolution",
    // round-10 tier: the DSv2 front doors (custom FileIndex + wrapped
    // ParquetScanBuilder serialized into executor scans), the SQL
    // catalog's V1 write bridge + COW DELETE, the version-offset
    // streaming source, and the continuous-trigger query
    "x41_format_time_travel", "x42_format_data_skipping",
    "x43_format_change_feed", "x44_sql_catalog", "x45_sql_delete",
    "st47_stream_format_tail", "st48_stream_format_sink",
    "x46_manifest_history", "stC1_continuous_map",
    // round-10 partitioned-table tier: partition pruning, dynamic
    // partition overwrite, restore, Z-order — all exercise the commit
    // log + DSv2 planning across separate executor JVMs
    "x47_partitioned_table", "x48_partition_overwrite",
    "x49_restore", "x50_zorder_skipping",
    // SQL DML through DSv2 row-level operations: the staged native
    // write runs on the executors, so cross-JVM parity is the test
    // that matters most for it
    "x51_sql_update", "x52_sql_merge", "x53_mor_delete",
    "x54_sql_maintenance", "x55_change_feed_rows",
    // round-11 tier: the DV-aware front-door scan, the CDF scan's
    // three custom partition kinds + literal-appending readers, the
    // clone's absolutized DV read, partition evolution's mixed-spec
    // pruning, string-stats skipping, convert's footer adoption, and
    // the throttled version-offset stream — every one of these ships
    // custom InputPartitions / reader factories into executor JVMs,
    // which single-JVM local[N] never serializes
    "x56_dv_front_door", "x57_cow_update_cdc", "x58_column_mapping",
    "x59_auto_stats_skipping", "x60_check_constraints",
    "x61_shallow_clone", "x62_cdf_front_door",
    "x63_partition_evolution", "x64_convert_in_place",
    "x65_string_stats_skipping", "st49_stream_merge_manifest",
    "st50_stream_cdf_source", "st51_stream_throttled_backfill")
}

/** Smoke main: `runMain graft.ClusterParitySmoke <sfDir> [names…]` —
  * brings up the local-cluster session and runs the listed queries
  * (default: a 3-query canary), printing one status line each.
  */
object ClusterParitySmoke {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_pricing_summary", "q32_topk_native",
        "d03_minhash_bands")
    // "parity:" prefix on the first name runs the local pass first —
    // reproduces the shared-JVM suite sequence (stale process-global
    // state is exactly what that ordering smokes out)
    val (doLocal, names2) =
      if (names.headOption.contains("parity")) (true, names.drop(1))
      else (false, names)
    if (doLocal)
      ClusterParity.runAll(() => GraftSession.local(8), names2, sfDir)
    val got = ClusterParity.runAll(
      () => GraftSession.cluster(), names2, sfDir)
    names2.foreach { n =>
      got(n) match {
        case Right((_, rows)) => println(s"OK $n rows=${rows.size}")
        case Left(err) => println(s"FAIL $n $err")
      }
    }
    if (got.values.exists(_.isLeft)) sys.exit(1)
  }
}
