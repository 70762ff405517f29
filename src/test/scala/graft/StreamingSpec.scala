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
