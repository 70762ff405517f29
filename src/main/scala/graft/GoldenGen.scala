package graft

import org.apache.spark.sql.functions._
import graft.features.BehaviorBinding

/** One-time generator for the committed golden fixture: PIT anchor feature
  * vectors over a small deterministic transcript table. Regenerate ONLY on an
  * intentional semantics change (the GoldenSpec diff is the review gate). */
object GoldenGen {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/test/resources/golden/pit_anchor_features")
    val spark = Bench.session("4")
    val turns = gen.TranscriptGen.turns(spark, seed = 77L, nConvs = 15)
    val binding = BehaviorBinding("user", "assistant", "system", "tool")
    PitPipeline.anchorFeatures(turns.toDF(), TranscriptCols.turns, Turn.roles, binding, 3600L)
      .orderBy(col("conv_id"), col("turn_idx"))
      .coalesce(1)
      .write.mode("overwrite").parquet(out)
    println(s"golden written to $out")
    spark.stop()
  }
}
