package graft.queries

import java.nio.file.{Files, Paths}

import graft.streaming.TestSpark
import org.apache.spark.sql.functions.{concat, lit}
import org.scalatest.funsuite.AnyFunSuite

/** The shared staged-stream helper: a `_STAGED` sentinel only counts
  * while the staged schema still matches the DataFrame being staged —
  * a stale /tmp stage left by a regenerated source must re-stage, and
  * an unchanged one must NOT rewrite (the memo is the point).
  */
class StagedStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def fileSet(dir: String): Set[(String, Long)] =
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toSet

  test("sentinel memoizes; a schema change forces a re-stage") {
    val s = spark
    import s.implicits._
    val tag = s"spec-stage-${System.nanoTime()}"
    val dir = "/root/testdata/sf0.001"
    val v1 = s.range(100).select($"id".as("k"), ($"id" * 2).as("v"))
    val stage1 = StreamingOps.stageDeterministic(s, tag, dir, v1, 3,
      Seq($"k"))
    try {
      assert(Files.exists(Paths.get(stage1, "_STAGED")))
      val files1 = fileSet(stage1)
      assert(files1.nonEmpty)

      // same schema again → memo hit, nothing rewritten
      val stage2 = StreamingOps.stageDeterministic(s, tag, dir,
        s.range(5).select($"id".as("k"), ($"id" * 9).as("v")), 3,
        Seq($"k"))
      assert(stage2 == stage1)
      assert(fileSet(stage1) == files1,
        "an unchanged schema must not re-stage")

      // regenerated source with a different schema (the stale-stage
      // shape): the sentinel alone would serve v1's files under v3's
      // plan — the helper must detect the mismatch and re-stage
      val v3 = s.range(10)
        .select($"id".as("k"), concat(lit("x"), $"id").as("v"))
      val stage3 = StreamingOps.stageDeterministic(s, tag, dir, v3, 3,
        Seq($"k"))
      assert(stage3 == stage1)
      val back = s.read.parquet(stage3)
      assert(back.schema("v").dataType ==
        org.apache.spark.sql.types.StringType,
        "stale stage served: staged files still carry the old schema")
      assert(back.count() == 10)
    } finally {
      val p = new org.apache.hadoop.fs.Path(stage1)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }
}
