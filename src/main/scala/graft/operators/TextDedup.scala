package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.PortableHash._

/** Text deduplication operators (the training-data-pipeline dedup
  * family) as reusable DataFrame transforms: shingling, exact content
  * hashing, MinHash signatures, LSH banding, Jaccard verification,
  * SimHash. The `graft.queries.Dedup` pack is the oracle-checked
  * instantiation of these over the `documents` table.
  *
  * Scale design: every stage is explode → keyed aggregate (map-side
  * combinable) or an inverted-index self-join on a 56-bit hash — no
  * O(n²) pass anywhere; LSH banding bounds the pairs that ever meet a
  * verifier.
  */
object TextDedup {

  /** Normalized content hash for exact dedup. */
  def contentHash(text: Column): Column =
    sparkHash56(regexp_replace(lower(text), "\\s+", " "))

  /** (id, h): distinct n-token-shingle 56-bit hashes per document. */
  def shingleHashes(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame = {
    val toks = docs
      .withColumn("__norm", regexp_replace(lower(col(textCol)), "\\s+", " "))
      .withColumn("__toks", split(col("__norm"), " "))
    toks
      .select(col(idCol).as("id"),
        explode(array_distinct(shingleExpr("__toks", n))).as("sh"))
      .select(col("id"), sparkHash56(col("sh")).as("h"))
  }

  /** Candidate near-dup pairs from the inverted shingle index: pairs
    * sharing ≥ `minCommon` shingles, with exact Jaccard in per-mille.
    */
  def jaccardPairs(sh: DataFrame, minCommon: Long = 10,
      minJaccardPm: Long = 0): DataFrame = {
    val ns = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    sh.select(col("id").as("d1"), col("h"))
      .join(sh.select(col("id").as("d2"), col("h")), Seq("h"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
      .filter(col("inter") >= minCommon)
      .join(ns.select(col("id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(ns.select(col("id").as("d2"), col("n").as("n2")), Seq("d2"))
      .select(col("d1"), col("d2"), col("inter"),
        (col("n1") + col("n2") - col("inter")).as("un"),
        expr("inter * 1000 div (n1 + n2 - inter)").as("jaccard_pm"))
      .filter(col("jaccard_pm") >= minJaccardPm)
  }

  /** Exact Jaccard (no candidate threshold) for externally-supplied
    * pairs — the LSH verification step.
    */
  def jaccardVerify(sh: DataFrame, pairs: DataFrame): DataFrame = {
    val ns = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val inter = sh.select(col("id").as("d1"), col("h"))
      .join(sh.select(col("id").as("d2"), col("h")), Seq("h"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("d1", "d2"), "left")
      .join(ns.select(col("id").as("d1"), col("n").as("n1")), Seq("d1"))
      .join(ns.select(col("id").as("d2"), col("n").as("n2")), Seq("d2"))
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("jaccard_pm",
        expr("inter * 1000 div (n1 + n2 - inter)"))
  }

  /** Per-doc MinHash signature: `numPerms` conditional-min columns
    * s0..s{k-1} over `(a_j·h + b_j) mod p`.
    */
  def minhashSignatures(sh: DataFrame, numPerms: Int): DataFrame = {
    val spark = sh.sparkSession
    val permDf = spark.createDataFrame(
      permCoeffs(numPerms).zipWithIndex.map { case ((a, b), j) => (j, a, b) })
      .toDF("j", "a", "b")
    val sigs = sh
      .withColumn("h31", col("h") % MersenneP)
      .crossJoin(broadcast(permDf))
      .groupBy(col("id"), col("j"))
      .agg(min((col("a") * col("h31") + col("b")) % MersenneP).as("sig"))
    val cols = (0 until numPerms)
      .map(j => min(when(col("j") === j, col("sig"))).as(s"s$j"))
    sigs.groupBy(col("id")).agg(cols.head, cols.tail: _*)
  }

  /** Band layout: band name -> signature columns in it. */
  def bandCols(numPerms: Int, bands: Int): Seq[(String, Seq[String])] = {
    val rows = numPerms / bands
    (0 until bands).map(b =>
      s"b$b" -> (0 until rows).map(r => s"s${b * rows + r}"))
  }

  /** Hash each signature band (the LSH bucket keys). */
  def withBandHashes(signatures: DataFrame, numPerms: Int,
      bands: Int): DataFrame =
    bandCols(numPerms, bands).foldLeft(signatures) {
      case (df, (name, sigCols)) =>
        df.withColumn(name,
          sparkHash56(concat_ws(",", sigCols.map(col): _*)))
    }

  /** Distinct candidate pairs colliding in ≥1 LSH band, with the
    * number of agreeing bands.
    */
  def lshCandidates(signatures: DataFrame, numPerms: Int,
      bands: Int): DataFrame = {
    val banded = bandCols(numPerms, bands).zipWithIndex.map {
      case ((_, sigCols), bi) =>
        signatures.select(col("id"), lit(bi).as("band"),
          sparkHash56(concat_ws(",", sigCols.map(col): _*)).as("bh"))
    }.reduce(_ unionByName _)
    banded.select(col("id").as("d1"), col("band"), col("bh"))
      .join(banded.select(col("id").as("d2"), col("band"), col("bh")),
        Seq("band", "bh"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("n_bands"))
  }

  /** Per-doc SimHash over whitespace tokens (bit b of the result set
    * iff the b-th hash-bit majority over tokens is positive).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 32): DataFrame = {
    val tok = docs
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .select(col("id"), sparkHash56(col("w")).as("h"))
    tok
      .select(col("id"), col("h"),
        explode(expr(s"sequence(0, ${bits - 1})")).as("bit"))
      .groupBy(col("id"), col("bit"))
      .agg(sum(when(expr("shiftright(h, bit) & 1") === 1, 1).otherwise(-1))
        .as("bs"))
      .groupBy(col("id"))
      .agg(sum(when(col("bs") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0L))
        .as("simhash"))
  }
}
