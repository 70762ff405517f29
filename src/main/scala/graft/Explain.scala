package graft

/** Plan inspector: runMain graft.Explain <sfDir> <query...> — prints the
  * formatted physical plan of each named query (SURVEY §4 plan reviews). */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq("q_pit_backfill")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    names.foreach { n =>
      println(s"==== $n ====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
