package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.gen.TranscriptGen
import graft.ops.{Sessionize, micros}
import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.TurnEvent

/** Streaming sessionization agrees with the batch engine on the same data. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val gap = TranscriptGen.SessionGapSeconds

  test("session_window streaming counts match batch sessionize per conversation") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val turns = TranscriptGen.turns(spark, seed = 51L, nConvs = 12)
    turns.write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream.schema(Turn.schema).parquet(s"$dir/in")
    val q = StreamingSessionize.sessionWindows(stream, TranscriptCols.turns, gap)
      .writeStream.outputMode("complete").format("memory").queryName("sess_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("sess_stream")
      .groupBy("conv_id").agg(count(lit(1)).as("n"), sum("n_turns").as("turns"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Sessionize.sessions(turns.toDF(), TranscriptCols.turns, gap)
      .groupBy("conv_id").agg(count(lit(1)).as("n"), sum("n_turns").as("turns"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
  }

  test("streaming PIT window states ≡ batch windowStates on completed windows") {
    val dir = Files.createTempDirectory("graft-stream3").toString
    val turns = TranscriptGen.turns(spark, seed = 53L, nConvs = 15)
    // one file → one micro-batch → whole-group ordering inside the fold
    turns.toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/in")
    val width = 3600L

    val stream = spark.readStream.schema(Turn.schema).parquet(s"$dir/in")
      .select(col("conv_id"), col("turn_idx"), micros(col("ts")).as("tsUs"), col("role"))
      .as[graft.streaming.StreamingPit.RoleTurn]
    val q = graft.streaming.StreamingPit.statefulWindowStates(stream, Turn.roles, width)
      .writeStream.outputMode("append").format("memory").queryName("pit_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("pit_stream").collect().map { r =>
      (r.getString(0), r.getLong(1)) ->
        (r.getSeq[Long](3), r.getSeq[Long](4), r.getSeq[Double](5), r.getSeq[Long](6))
    }.toMap

    val batchRows = PitPipeline.windowStates(turns.toDF(), TranscriptCols.turns, Turn.roles, width)
      .withColumn("ws_us", micros(col("window_start")))
      .collect().map { r =>
        val mins = Turn.roles.map(role => r.getLong(r.fieldIndex(s"${role}_min")))
        val maxs = Turn.roles.map(role => r.getLong(r.fieldIndex(s"${role}_max")))
        val avgs = Turn.roles.map(role => r.getDouble(r.fieldIndex(s"${role}_avg")))
        val counts = Turn.roles.map(role => r.getLong(r.fieldIndex(s"${role}_count")))
        (r.getString(r.fieldIndex("conv_id")), r.getLong(r.fieldIndex("ws_us"))) ->
          (mins, maxs, avgs, counts)
      }
    // drop each conversation's LAST window — still open at stream end,
    // therefore (correctly, per PIT semantics) never emitted by the stream
    val lastPerConv = batchRows.groupBy(_._1._1).view.mapValues(_.map(_._1._2).max).toMap
    val expected = batchRows.filterNot { case ((conv, ws), _) => lastPerConv(conv) == ws }.toMap
    assert(streamed.nonEmpty && streamed == expected)
  }

  test("streaming PIT drops late events for already-closed windows") {
    import graft.streaming.StreamingPit
    val dir = Files.createTempDirectory("graft-stream4").toString
    def mk(rows: Seq[(String, Int, Long, String)]) =
      rows.toDF("conv_id", "turn_idx", "tsUs", "role")
    // batch 1: W0 (t=100s) and W1 (t=3700s) events -> W0 closes + emits
    mk(Seq(("c1", 0, 100000000L, "user"), ("c1", 1, 150000000L, "assistant"),
      ("c1", 2, 3700000000L, "user")))
      .coalesce(1).write.parquet(s"$dir/in/a.parquet".replace("a.parquet", "a"))
    Thread.sleep(1100) // distinct modTime => deterministic file order
    // batch 2: a LATE W0 event (t=200s, window already closed) + a W2 event
    mk(Seq(("c1", 3, 200000000L, "user"), ("c1", 4, 7300000000L, "tool")))
      .coalesce(1).write.parquet(s"$dir/in/b")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("conv_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("turn_idx", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("tsUs", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("role", org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$dir/in/*")
      .as[StreamingPit.RoleTurn]
    val q = StreamingPit.statefulWindowStates(stream, Turn.roles, 3600L)
      .writeStream.outputMode("append").format("memory").queryName("pit_late")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("pit_late").collect()
      .map(r => r.getLong(1) -> r.getSeq[Long](6)).toMap // window_start_us -> counts
    // W0 emitted from batch 1 with its pre-late counts (1 user, 1 assistant);
    // W1 emitted when W2 opened, cumulative counts unchanged by the late row
    assert(rows.keySet == Set(0L, 3600000000L))
    val userIdx = Turn.roles.indexOf("user")
    assert(rows(0L)(userIdx) == 1L, "late event must NOT be retro-counted")
    assert(rows(3600000000L)(userIdx) == 2L, "W1 cumulative = W0 + W1 users only")
  }

  test("streaming exact dedup ≡ batch survivors; watermark variant bounds state") {
    val dir = Files.createTempDirectory("graft-stream4").toString
    val docs = Seq(
      (0L, "alpha doc body", "2024-01-01 00:00:00"),
      (1L, "alpha doc body", "2024-01-01 00:00:05"), // dup of 0 within watermark
      (2L, "beta doc body", "2024-01-01 00:01:00"),
      (3L, "gamma doc body", "2024-01-01 00:02:00"),
      (4L, "beta doc body", "2024-01-01 00:02:30")   // dup of 2
    ).toDF("doc_id", "text", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    // one input partition, id order → streaming first-seen = batch min-id
    docs.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(s"$dir/in")

    val schema = docs.schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/in")
    val q = graft.streaming.StreamingDedup
      .withinWatermark(stream, "text", "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("dedup_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("dedup_stream")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val batch = graft.ops.Dedup.exact(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed == batch, s"streaming=$streamed batch=$batch")
  }

  test("streaming curation ≡ batch quality-gate + exact-dedup composition") {
    val dir = Files.createTempDirectory("graft-stream5").toString
    val docs = Seq(
      (0L, "the cat and the dog walked to a small house", "2024-01-01 00:00:00"),
      (1L, "the cat and the dog walked to a small house", "2024-01-01 00:00:10"), // exact dup
      (2L, "short", "2024-01-01 00:00:20"),                                       // fails gate
      (3L, "el gato y el perro de la casa que ladra mucho", "2024-01-01 00:00:30"), // non-en
      (4L, "the quick brown fox jumps over a lazy sleeping dog", "2024-01-01 00:01:00")
    ).toDF("doc_id", "text", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    docs.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream.schema(docs.schema).parquet(s"$dir/in")
    val q = graft.streaming.StreamingCuration
      .curate(stream, "text", "ts", "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("curation_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("curation_stream")
      .select("doc_id", "quality_score").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // batch composition on the same data: gate first, then exact dedup
    val batch = graft.ops.Dedup.exact(
      graft.ops.TextAnalysis.qualityFiltered(docs, "text"), "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(streamed.keySet == batch, s"streaming=${streamed.keySet} batch=$batch")
    assert(streamed.keySet == Set(0L, 4L))
    assert(streamed.values.forall(_ >= 2), "gate metadata must ride through")
  }

  test("stateful flatMapGroupsWithState sessionizer matches batch session ids") {
    val dir = Files.createTempDirectory("graft-stream2").toString
    val turns = TranscriptGen.turns(spark, seed = 52L, nConvs = 10)
    turns.write.mode("overwrite").parquet(s"$dir/in")

    val stream = spark.readStream.schema(Turn.schema).parquet(s"$dir/in")
      .select(col("conv_id"), col("turn_idx"), micros(col("ts")).as("tsUs"))
      .as[TurnEvent]
    val q = StreamingSessionize.statefulSessionize(stream, gap)
      .writeStream.outputMode("append").format("memory").queryName("sess_state")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val streamed = spark.table("sess_state")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val batch = Sessionize.withSessionId(turns.toDF(), TranscriptCols.turns, gap)
      .select("conv_id", "turn_idx", "session_id")
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }
}
