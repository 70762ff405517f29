package graft.streaming

import org.apache.spark.sql.DataFrame
import graft.ops.TextAnalysis

/** Streaming face of the terminal curation pipeline (`ops.Curation`): the
  * stateless quality gate — the SAME codegen'd native expressions as batch,
  * so the two faces cannot drift — followed by watermark-bounded first-seen
  * dedup on the text.
  *
  * Stage order is the state-size lever at ingest scale: gating BEFORE the
  * stateful dedup means the dedup state only ever holds quality-passing
  * documents. Near-dup clustering (LSH + connected components) is
  * inherently a batch/compaction job — the streaming face handles the exact
  * tier; re-crawled near-dups fall to the periodic batch `Curation.curate`
  * over the committed ingest (the standard lambda split for dedup).
  */
object StreamingCuration {

  def curate(df: DataFrame, textCol: String, tsCol: String, delay: String,
             minScore: Int = 2): DataFrame =
    StreamingDedup.withinWatermark(
      TextAnalysis.qualityFiltered(df, textCol, minScore), textCol, tsCol, delay)
}
