package graft

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence (north rule: throughput scaling efficiency
  * >= 0.8 from N to 4N executors).
  *
  * No multi-executor cluster exists in this sandbox, so the sanctioned
  * stand-in (BASELINE.md) is the identical job at two parallelism levels:
  * local[N] vs local[4N] with spark.sql.shuffle.partitions matched to cores.
  * Each level runs in its own SparkSession (stop + rebuild — Spark allows a
  * new master after stop()) over the SAME deterministic generated input.
  *
  * Usage: runMain graft.ScalingBench [N] [convs]   (defaults 8, 6000)
  * Prints one JSON line with turns/sec at both levels + efficiency.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8)
    val convs = args.lift(1).map(_.toInt).getOrElse(6000)

    def runAt(cpus: Int): (Long, Double) = {
      val spark = Bench.session(cpus.toString)
      // warm-up pass (JIT + codegen) on a small slice, then the measured run
      Bench.pitThroughput(spark, nConvs = 200, parts = cpus)
      val r = Bench.pitThroughput(spark, nConvs = convs, parts = cpus * 2)
      spark.stop()
      r
    }

    val (rows1, tps1) = runAt(n)
    val (rows4, tps4) = runAt(4 * n)
    require(rows1 == rows4, "input mismatch between levels")
    val eff = (tps4 / tps1) / 4.0
    println(s"""{"metric":"scaling_efficiency","turns":$rows1,"n_cores":$n,""" +
      s""""turns_per_sec_n":$tps1,"turns_per_sec_4n":$tps4,"efficiency":$eff}""")
  }
}
