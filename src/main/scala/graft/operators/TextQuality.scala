package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The corpus quality heuristic, shared by the t04 scoring query and
  * the p01 curation pipeline so the thresholds cannot silently
  * desynchronize from their DuckDB oracles.
  *
  * All ratios are integer per-mille (`div` == DuckDB `//`).
  */
object TextQuality {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")
  val MinTokens = 30
  val StopwordPmRange: (Int, Int) = (20, 400)

  /** Annotate documents with the quality metrics + `keep` flag. */
  def annotate(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("toks", split(col(textCol), "\\s+"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("stop_hits",
        size(filter(col("toks"), t => t.isInCollection(Stopwords)))
          .cast("long"))
      .withColumn("short_hits",
        size(filter(col("toks"), t => length(t) <= 2)).cast("long"))
      .withColumn("stopword_pm", expr("stop_hits * 1000 div n_tokens"))
      .withColumn("short_token_pm", expr("short_hits * 1000 div n_tokens"))
      .withColumn("chars_per_token_pm",
        expr(s"length($textCol) * 1000 div n_tokens"))
      .withColumn("keep",
        when(col("n_tokens") >= MinTokens &&
          col("stopword_pm").between(StopwordPmRange._1, StopwordPmRange._2),
          1).otherwise(0).cast("int"))
}
