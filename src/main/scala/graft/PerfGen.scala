package graft

import org.apache.spark.sql.functions._
import graft.features.BehaviorBinding

/** Stage-isolated throughput probe over generated transcripts.
  * Usage: SPARK_GRAFT_CPUS=N runMain graft.PerfGen [convs] */
object PerfGen {
  def main(args: Array[String]): Unit = {
    val convs = args.headOption.map(_.toInt).getOrElse(100000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    val binding = BehaviorBinding("user", "assistant", "system", "tool")
    val c = TranscriptCols.turns
    val turns = gen.TranscriptGen.turns(spark, 42L, convs, 2, 20000, partitions = cpus.toInt * 2)
      .toDF().select("conv_id", "turn_idx", "role", "ts").cache()
    val n = turns.count()
    println(s"PERFGEN turns=$n cpus=$cpus")
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val a = Bench.time(Bench.exec(df))
      val b = Bench.time(Bench.exec(df))
      println(f"PERFGEN $name%-12s ${math.min(a, b)}%8.2fs  (${n / math.min(a, b) / 1000}%.0fk rows/s)")
    }
    t("scan")(turns)
    t("states")(PitPipeline.windowStates(turns, c, Turn.roles, 3600L))
    t("features")(PitPipeline.featureStates(turns, c, Turn.roles, binding, 3600L))
    val states = PitPipeline.featureStates(turns, c, Turn.roles, binding, 3600L).cache()
    states.count()
    val payload = states.columns.filterNot(Set(c.conv, "window_start", "window_end").contains).toSeq
    val anchors = turns.select(col(c.conv), col(c.seq), col(c.ts))
    t("asof_only")(ops.AsOfJoin.merged(anchors, states.withColumnRenamed("window_end", c.ts),
      c.conv, c.ts, "window_start", payload, prefix = "", dedup = false))
    t("asof_1col")(ops.AsOfJoin.merged(anchors, states.withColumnRenamed("window_end", c.ts),
      c.conv, c.ts, "window_start", Seq("user_min"), prefix = "", dedup = false))
    t("asof_win")(ops.AsOfJoin.windowed(anchors, states.withColumnRenamed("window_end", c.ts),
      c.conv, c.ts, "window_start", payload, prefix = "", dedup = false))
    t("asof_win1")(ops.AsOfJoin.windowed(anchors, states.withColumnRenamed("window_end", c.ts),
      c.conv, c.ts, "window_start", Seq("user_min"), prefix = "", dedup = false))
    t("asof_scal")(ops.AsOfJoin.mergedScalable(anchors, states.withColumnRenamed("window_end", c.ts),
      c.conv, c.ts, "window_start", payload, prefix = "", dedup = false))
    t("full")(PitPipeline.anchorFeatures(turns, c, Turn.roles, binding, 3600L))
    spark.stop()
  }
}
