package graft

/** Ad-hoc perf probe: time named queries (or all) at a given sf dir.
  * Usage: runMain graft.Perf <sfDir> [query ...]  (repeats each twice,
  * reports both — first run includes codegen/JIT warm-up). */
object Perf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // pseudo-queries: PIT pipeline stage breakdown
    val extra: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "pit:windows" -> ((s, dir) => ops.Windowize.withTumblingWindow(
        Pipelines.table(s, dir, "events"), TranscriptCols.events, 3600L)),
      "pit:counts" -> ((s, dir) => ops.PivotCounts(
        ops.Windowize.withTumblingWindow(Pipelines.table(s, dir, "events"), TranscriptCols.events, 3600L),
        Seq("user_id", "window_start"), "event_type", Pipelines.quartet, suffix = "_wc")),
      "pit:states" -> ((s, dir) => PitPipeline.windowStates(
        Pipelines.table(s, dir, "events"), TranscriptCols.events, Pipelines.quartet, 3600L)),
      "pit:features" -> ((s, dir) => PitPipeline.featureStates(
        Pipelines.table(s, dir, "events"), TranscriptCols.events, Pipelines.quartet,
        Pipelines.binding, 3600L)))
    names.foreach { n =>
      val fn = extra.getOrElse(n, SparkEntry.queries(n))
      val t1 = Bench.time(Bench.exec(fn(spark, sfDir)))
      val t2 = Bench.time(Bench.exec(fn(spark, sfDir)))
      println(f"PERF $n%-22s first=$t1%8.2fs warm=$t2%8.2fs")
    }
    spark.stop()
  }
}
