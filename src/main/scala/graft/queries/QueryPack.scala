package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of queries plus their DuckDB oracle SQL.
  *
  * Contract (driver's Verify/correctness gate):
  *   - every key in `queries` producing SQL-expressible results also
  *     appears in `oracles` with ANSI SQL DuckDB can run over the same
  *     parquet tables;
  *   - column names match exactly between the Spark result and the
  *     oracle result (the driver sorts columns by name before hashing);
  *   - results are deterministic: aggregates over doubles go through
  *     decimal casts (exact, order-independent) and every query ends in
  *     an unambiguous ORDER BY.
  */
trait QueryPack {
  /** Note for embedders: some queries `persist()` shared subtrees
    * (e.g. the dedup shingle index). The cache is scoped to the
    * session — `Verify`/`Bench` release it with
    * `spark.catalog.clearCache()` after materializing each query;
    * long-lived sessions embedding these queries should do the same.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
