package graft

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** A single turn of a multi-turn conversation / agent transcript.
  *
  * Shape fixed by the engine contract (BASELINE.json `input_hint`):
  * `(conv_id:string, turn_idx:int32, role:string, text:string, tool:string, ts:timestamp)`.
  * This is the engine's native grain — the analog of the reference's raw behavior
  * log row (`/root/reference/Preprocess/dataset_for_prediction.py:16`:
  * `user_id, item_id, cate_id, behavior, timestamp`), with `role`/`tool` playing
  * the part of `behavior` as the pivot dimension.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String, // null for non-tool turns
    ts: Timestamp
)

object Turn {
  val schema: StructType = StructType(Seq(
    StructField("conv_id", StringType, nullable = false),
    StructField("turn_idx", IntegerType, nullable = false),
    StructField("role", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("tool", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = false)
  ))

  /** Canonical role domain (pivot values — declared explicitly so the pivot
    * never needs a distinct-scan over the data; mirrors the closed behavior
    * domain {pv,cart,fav,buy} at `dataset_for_prediction.py:76`). */
  val roles: Seq[String] = Seq("user", "assistant", "system", "tool")

  /** Canonical tool domain for the secondary pivot. */
  val tools: Seq[String] = Seq("search", "exec", "browse")
}

/** Column-name binding so every operator works over any table with the
  * transcript *shape* — the driver's `events` table
  * `(event_id, ts, user_id, event_type, value, props)` binds as
  * conv=user_id, role=event_type, seq=event_id.
  */
final case class TranscriptCols(
    conv: String = "conv_id",
    seq: String = "turn_idx", // deterministic tiebreak within equal ts
    role: String = "role",
    ts: String = "ts"
)

object TranscriptCols {
  val turns: TranscriptCols = TranscriptCols()
  val events: TranscriptCols =
    TranscriptCols(conv = "user_id", seq = "event_id", role = "event_type", ts = "ts")
}
