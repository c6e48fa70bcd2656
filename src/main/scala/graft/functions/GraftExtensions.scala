package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Injects the engine's native functions into Catalyst's function
  * registry, so `graft_hash56` / `graft_dotl` work from SQL text as
  * well as the typed [[GraftFunctions]] API.
  *
  * Activate with
  * `spark.sql.extensions=graft.functions.GraftExtensions` — the
  * standard extension hook, so any cluster (or spark-sql shell)
  * picks the functions up with zero code; [[graft.GraftSession]] also
  * registers them directly for embedded use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    // full custom-operator tier: bounded per-group top-k
    // (logical node + planner strategy + rank-limit rewrite rule)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRankLimit)
    ext.injectOptimizerRule(_ => graft.plans.MatviewRewrite)
    ext.injectOptimizerRule(_ => graft.plans.FkJoinElimination)
    ext.injectOptimizerRule(_ => graft.plans.EagerAggregation)
  }
}

object GraftExtensions {
  type Builder = Seq[Expression] => Expression

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions.GraftExtensions", "", name, usage,
      "", "", "", "", "", "", "built-in")

  private def arity(name: String, n: Int)(b: Builder): Builder =
    args => {
      require(args.length == n,
        s"$name takes $n argument(s), got ${args.length}")
      b(args)
    }

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("graft_hash56"),
      info("graft_hash56",
        "graft_hash56(str) - portable 56-bit md5-prefix hash"),
      arity("graft_hash56", 1)(args => Hash56(args.head))),
    (FunctionIdentifier("graft_dotl"),
      info("graft_dotl",
        "graft_dotl(a, b) - exact integer dot product of long arrays"),
      arity("graft_dotl", 2)(args => DotProductL(args(0), args(1)))),
    (FunctionIdentifier("graft_max_codepoint"),
      info("graft_max_codepoint",
        "graft_max_codepoint(str) - largest code point (0 for empty)"),
      arity("graft_max_codepoint", 1)(args => MaxCodePoint(args.head))),
    (FunctionIdentifier("graft_packed_windows"),
      info("graft_packed_windows",
        "graft_packed_windows(str) - one row (pos, cls) per position: " +
          "width-8 suffix class packed base-129; single-byte strings only"),
      arity("graft_packed_windows", 1)(args => PackedWindows(args.head))),
    (FunctionIdentifier("graft_mg_summary"),
      info("graft_mg_summary",
        "graft_mg_summary(key, k) - Misra-Gries heavy-hitters summary " +
          "(struct(n, counters)); every key with freq > n/k is present, " +
          "estimates underestimate by at most n/k"),
      arity("graft_mg_summary", 2)(MisraGries.builder))
  )
}
