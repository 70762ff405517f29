package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan audits: the scale properties that make queries survive a
  * 100× data blow-up, asserted on the actual plans (SURVEY §4). These catch
  * regressions that row-level correctness tests cannot — a query can stay
  * value-correct while silently losing its pushed filter or broadcasting the
  * wrong side. Runs against sf0.001 (plan shape is scale-independent). */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q_scan_agg: shipdate filter reaches the parquet scan; columns pruned") {
    val p = planOf("q_scan_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"filter not pushed:\n$p")
    // 6 of 11 lineitem columns needed — the scan must not read the rest
    assert(!p.contains("l_orderkey") && !p.contains("l_shipinstruct") && !p.contains("l_partkey"),
      s"column pruning lost:\n$p")
  }

  test("q_join_broadcast: nation joins as BroadcastHashJoin") {
    val p = planOf("q_join_broadcast")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"no broadcast in dim join:\n$p")
  }

  test("q_join_semi / q_join_anti plan semi/anti joins with pushed-down filters") {
    val semi = planOf("q_join_semi")
    assert(semi.contains("LeftSemi"), s"semi join missing:\n$semi")
    assert(semi.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"),
      s"build-side filter not pushed:\n$semi")
    val anti = planOf("q_join_anti")
    assert(anti.contains("LeftAnti"), s"anti join missing:\n$anti")
  }

  test("hot text queries stay inside whole-stage codegen (no CodegenFallback)") {
    // the HOF forms these replaced were CodegenFallback — assert every
    // Project in these queries carries the `*(n)` codegen marker
    Seq("q_lang_id", "q_token_stats", "q_simhash", "q_minhash_sig").foreach { q =>
      val df = SparkEntry.queries(q)(spark, dir)
      val executed = df.queryExecution.executedPlan.toString
      val projLines = executed.linesIterator.filter(_.contains("Project [")).toSeq
      assert(projLines.nonEmpty, s"$q: no projection found:\n$executed")
      projLines.foreach(l =>
        assert(l.contains("*("), s"$q projection fell out of codegen: $l"))
    }
  }

  test("q_pit_backfill EXPLAIN shows the whole pipeline through the native as-of") {
    val p = planOf("q_pit_backfill")
    assert(p.contains("AsOfMerge"), s"native as-of missing:\n$p")
    // the stages BEHIND the as-of are visible (no opaque RDD scan boundary)
    assert(p.contains("HashAggregate") && p.contains("Window"),
      s"upstream stages hidden behind a scan boundary:\n$p")
    assert(!p.contains("Scan ExistingRDD"), s"opaque RDD boundary present:\n$p")
  }

  test("no big-table query plans a single-partition global window") {
    // WindowExec with an empty partition spec moves ALL rows to one task —
    // inspect the pre-AQE physical plan programmatically
    import org.apache.spark.sql.execution.window.WindowExec
    def globalWindows(df: DataFrame): Seq[WindowExec] =
      df.queryExecution.sparkPlan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w
      }
    // self-check the detector against a deliberately-global window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val bad = Seq((1, 2)).toDF("a", "b").withColumn("r",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(col("a"))))
    assert(globalWindows(bad).nonEmpty, "detector failed its self-check")
    Seq("q_auc_roc", "q_pr_curve", "q_auc_pr", "q_threshold_scan", "q_pit_backfill",
      "q_running_stats", "q_lag_lead", "q_sessionize").foreach { q =>
      val offenders = globalWindows(SparkEntry.queries(q)(spark, dir))
      assert(offenders.isEmpty, s"$q has a global window: ${offenders.mkString("; ")}")
    }
  }
}
