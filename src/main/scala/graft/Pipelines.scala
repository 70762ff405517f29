package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops._
import graft.features.{BehaviorBinding, FeatureLayers}

/** End-to-end hierarchical pipelines over the driver's `events` table
  * `(event_id, ts, user_id, event_type, value, props)` — the transcript-shaped
  * stand-in (conv=user_id, role=event_type, seq=event_id; TESTDATA.md).
  *
  * Reproduces the reference's 4-stage lineage (SURVEY §1.1 T1..T4) as ONE lazy
  * Catalyst DAG instead of 4 file-IPC'd pandas scripts:
  * scan → project → slot pivot-agg → quantile bot-filter → entity stats →
  * entity rollup → engineered feature layers. Two shuffles total (slot
  * grouping, entity grouping), both map-side combined; the quantile thresholds
  * are a 1-row broadcast.
  */
object Pipelines {

  /** events binding of the reference's behavior quartet (pv,cart,fav,buy). */
  val binding: BehaviorBinding = BehaviorBinding(pv = "view", cart = "click", fav = "signup", buy = "purchase")
  val quartet: Seq[String] = Seq("view", "click", "signup", "purchase")
  val events: TranscriptCols = TranscriptCols.events

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** T1 — slot grain: user × day_type × time_period pivot counts + label
    * (`dataset_for_prediction.py:46-97`). Rows outside the behavior quartet
    * are dropped first (the reference's domain is closed). */
  def slots(spark: SparkSession, dir: String): DataFrame = {
    val raw = table(spark, dir, "events")
      .filter(col("event_type").isin(quartet.map(lit): _*))
      .select(col("user_id"), col("event_type"), col("ts"))
    val slotted = Windowize.withCalendarSlots(raw, events)
    PivotCounts.withLabel(slotted,
      keys = Seq("user_id", "day_type", "time_period"),
      dim = "event_type", values = quartet,
      labelValue = "purchase", labelName = "purchase_yn")
  }

  /** T2 — bot filter: drop slots with (view_count > P99 ∧ no purchase) or
    * (purchase_count > P99 ∧ view_count < 5) (`miss_data.py:7-19`).
    * Exact percentile (pandas-compatible linear interpolation), computed in
    * one tiny agg and broadcast back — no second scan of the fact table
    * beyond the re-read Catalyst plans (slots is cheap to recompute or
    * cacheable by the caller at scale). */
  def slotsCleaned(spark: SparkSession, dir: String, approxAccuracy: Int = 0): DataFrame = {
    // NOTE (round-6, measured): persisting `s` here looks like the obvious
    // fix for the two consumptions below (threshold agg + main branch) but
    // is a measured REGRESSION (~2× on q_entity/q_entity_features at
    // sf0.1): the cache forces a FULL materialization of the slot table for
    // the threshold side, where the un-cached plan lets Catalyst prune the
    // threshold branch's pivot down to the two percentile columns — the
    // "duplicate" compute is really one full + one column-pruned pass, both
    // fused end-to-end in whole-stage codegen, which beats columnar cache
    // write+read at every scale where the fact scan is not the bottleneck.
    // At 100 TB the caller that fans out MANY consumers should cache the
    // CLEANED output (bounded, entity×8 rows), not the pivot input.
    val s = slots(spark, dir)
    // approxAccuracy > 0: approx_percentile sketch for the 10^12-row regime
    // (bounded memory; rank error ≤ n/accuracy) — the exact default is the
    // oracle-checked reference-parity path (SURVEY §7.5)
    val th =
      if (approxAccuracy > 0) s.agg(
        expr(s"approx_percentile(view_count, 0.99D, $approxAccuracy)").cast("double").as("__p99_view"),
        expr(s"approx_percentile(purchase_count, 0.99D, $approxAccuracy)").cast("double").as("__p99_buy"))
      else s.agg(
        expr("percentile(view_count, 0.99D)").as("__p99_view"),
        expr("percentile(purchase_count, 0.99D)").as("__p99_buy"))
    val flagged = s.crossJoin(broadcast(th)).withColumn("suspected_spider",
      when((col("view_count") > col("__p99_view") && col("purchase_count") === 0) ||
           (col("purchase_count") > col("__p99_buy") && col("view_count") < 5), 1).otherwise(0))
    flagged.filter(col("suspected_spider") === 0)
      .drop("__p99_view", "__p99_buy", "suspected_spider")
  }

  /** T3 stats — per-entity min/max/avg of each slot count
    * (`mean_features.py:20-26`), entity-grain output (the reference
    * denormalizes back onto slots at `:51`; in Spark we keep the normalized
    * grain and let callers join or window as needed).
    *
    * `round2dp` applies the reference's banker's rounding of the `*_avg`
    * stats (`mean_features.py:47-48`, numpy HALF_EVEN → Spark `bround`) —
    * the shipped `user_time_with_user_stats.xlsx` domain. Default off: the
    * unrounded domain feeds the oracle-checked feature pipeline. */
  def entityStats(spark: SparkSession, dir: String, round2dp: Boolean = false): DataFrame = {
    val stats = RunningStats.fullHistory(slotsCleaned(spark, dir),
      entity = Seq("user_id"), valueCols = quartet.map(q => s"${q}_count"))
    // reference naming: pv_min not pv_count_min (`mean_features.py:29-43`)
    val renamed = quartet.flatMap(q => Seq("min", "max", "avg").map(s => (s"${q}_count_$s", s"${q}_$s")))
      .foldLeft(stats) { case (df, (from, to)) => df.withColumnRenamed(from, to) }
    if (!round2dp) renamed
    else quartet.foldLeft(renamed) { (df, q) =>
      df.withColumn(s"${q}_avg", bround(col(s"${q}_avg"), 2))
    }
  }

  /** T4 — entity grain: summed counts + label + the 12 stats
    * (`pre_dataset.py:26-69`). Stats come from the same single aggregation
    * (no join at all — the reference's merge-then-re-aggregate disappears). */
  def entity(spark: SparkSession, dir: String): DataFrame = {
    val cleaned = slotsCleaned(spark, dir)
    val sums = quartet.map(q => sum(col(s"${q}_count")).as(s"${q}_count"))
    val stats = quartet.flatMap { q =>
      Seq(min(col(s"${q}_count")).as(s"${q}_min"),
        max(col(s"${q}_count")).as(s"${q}_max"),
        (sum(col(s"${q}_count").cast("long")).cast("double") /
          count(lit(1)).cast("double")).as(s"${q}_avg"))
    }
    val aggs = sums ++ stats
    cleaned.groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("purchase_yn", when(col("purchase_count") > 0, 1).otherwise(0))
  }

  /** T4 + layers 2-3: the full engineered feature vector per entity
    * (`LR_Advanced.py:394-473`) — the flagship hierarchical rollup. */
  def entityFeatures(spark: SparkSession, dir: String): DataFrame =
    FeatureLayers.applyTo(entity(spark, dir), binding)
}
