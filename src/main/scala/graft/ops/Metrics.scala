package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Evaluation-framework dataflow operators (`LR_Model_train/LR_Advanced.py:
  * 656-677`, `OOF_AUC_test.py:336-371`) as distributed aggregations — the
  * sklearn metric calls become groupBy plans with exact arithmetic (counts +
  * one final division), so the DuckDB oracle matches bit-for-bit.
  *
  * Threshold semantics: predict positive when `score >= threshold`, matching
  * the reference (`OOF_AUC_test.py:367` uses `proba >= thr`).
  *
  * Scale shape: NO global single-partition windows anywhere (round 1's
  * `aucRoc` used `rank().over(Window.orderBy(score))`, which moves every
  * scored row to one task). All rank/cumulative logic now runs over the
  * DISTINCT-SCORE table (a map-side-combined groupBy first), with global
  * prefix sums via [[PrefixSum]] (range-partitioned parallel prefix).
  */
object Metrics {

  /** Confusion matrix counts: one row per (label, prediction). */
  def confusion(df: DataFrame, label: String, pred: String): DataFrame =
    df.groupBy(col(label), col(pred)).agg(count(lit(1)).as("n"))

  /** Accuracy / precision / recall / F1 at a threshold, one output row.
    * All ratios are single divisions of exact long counts. */
  def binaryMetrics(df: DataFrame, label: String, score: String, threshold: Double): DataFrame = {
    val pred = when(col(score) >= lit(threshold), 1).otherwise(0)
    val agg = df.agg(
      sum(when(col(label) === 1 && pred === 1, 1L).otherwise(0L)).as("tp"),
      sum(when(col(label) === 0 && pred === 1, 1L).otherwise(0L)).as("fp"),
      sum(when(col(label) === 0 && pred === 0, 1L).otherwise(0L)).as("tn"),
      sum(when(col(label) === 1 && pred === 0, 1L).otherwise(0L)).as("fn"))
    val d = (c: Column) => c.cast("double")
    // null (not error/Inf) on empty denominators — sklearn's zero_division
    // analog, and what the CASE-guarded oracle SQL produces
    def safe(num: Column, den: Column): Column = when(den > 0.0, num / den)
    agg.select(col("tp"), col("fp"), col("tn"), col("fn"),
      safe(d(col("tp")) + d(col("tn")),
        d(col("tp")) + d(col("tn")) + d(col("fp")) + d(col("fn"))).as("accuracy"),
      safe(d(col("tp")), d(col("tp")) + d(col("fp"))).as("precision"),
      safe(d(col("tp")), d(col("tp")) + d(col("fn"))).as("recall"),
      safe(lit(2.0) * d(col("tp")),
        lit(2.0) * d(col("tp")) + d(col("fp")) + d(col("fn"))).as("f1"))
  }

  /** Distinct-score histogram: per score value, total rows and positives.
    * The first stage of every rank-based metric — map-side combined, so the
    * shuffle carries |distinct scores| rows, not |rows|. */
  private def scoreHistogram(df: DataFrame, label: String, score: String): DataFrame =
    df.groupBy(col(score).as("__s")).agg(
      count(lit(1)).as("__n"),
      sum(when(col(label) === 1, 1L).otherwise(0L)).as("__p"))

  /** ROC AUC via the Mann-Whitney U statistic with average ranks for ties:
    * AUC = (Σ ranks(positives) − P(P+1)/2) / (P·N).
    *
    * Plan: distinct-score histogram → [[PrefixSum]] over score order (no
    * single-partition window) → one aggregate. Every positive in a tie group
    * shares avg rank (cum_before + (n+1)/2), so the group contribution
    * p·(cum_before + (n+1)/2) is a multiple of 0.5 — exactly representable,
    * making the double sum order-independent and oracle-hash-stable. */
  def aucRoc(df: DataFrame, label: String, score: String): DataFrame = {
    val cum = PrefixSum.runningSums(scoreHistogram(df, label, score), Seq(col("__s")), Seq("__n"))
    val contrib = col("__p").cast("double") *
      ((col("__n_cum") - col("__n")).cast("double") + (col("__n").cast("double") + 1.0) / 2.0)
    cum.agg(
      sum(contrib).as("__sumR"),
      sum(col("__p")).as("__pp"),
      sum(col("__n") - col("__p")).as("__nn"))
      .select(when(col("__pp") > 0 && col("__nn") > 0,
        (col("__sumR") - col("__pp").cast("double") * (col("__pp").cast("double") + 1.0) / 2.0)
          / (col("__pp").cast("double") * col("__nn").cast("double"))).as("auc"))
  }

  /** Calibration bins (`OOF_AUC_test.py` 10 uniform bins): per bin of the
    * score, mean score / positive rate / count — exact sum/count arithmetic
    * over score values that are themselves deterministic. */
  def calibrationBins(df: DataFrame, label: String, score: String, bins: Int = 10): DataFrame = {
    val bin = least(greatest(floor(col(score) * bins), lit(0)), lit(bins - 1)).cast("int")
    df.groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        (sum(when(col(label) === 1, 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double")).as("pos_rate"))
  }

  /** F1 over a threshold grid (the 99-threshold scan, `OOF_AUC_test.py:355-
    * 364`). Histogram-first: the 99× row amplification hits the DISTINCT-
    * SCORE table, not the scan (round 1 cross-joined the full input).
    *
    * Continuous-score guard (mirrors [[averagePrecision]]'s): for continuous
    * double scores the "distinct-score table" is |rows|-sized and the grid
    * amplification becomes 99×|rows|. Round-4 shape ran a SEPARATE HLL probe
    * job over the full input to decide; the guard now folds into the
    * histogram pass itself (round-4 advice): the exact histogram is built
    * once, persisted, and counted — that count IS the distinct-score count
    * (exact, so the switch needs no estimate fudge factor and engages
    * exactly at the gate, same semantics as [[guardedCumulative]]'s carry).
    * Over the gate, the 99× grid joins a `floor(score·quantizeBins)/
    * quantizeBins` re-aggregation OF THE CACHED HISTOGRAM (bounded output,
    * no second input scan); quantized F1 is an approximation (each score
    * snaps down to its grid point before the >= comparison). Net: ONE full
    * input pass where round 4 paid two. What stays persisted (registered
    * with `scope` — released by Bench between reps / callers that manage
    * lifetimes) is always BOUNDED: max(maxDistinctScores, quantizeBins+1)
    * rows — the input-sized exact histogram is cached only transiently
    * during construction. EAGER: the count job(s) run at construction. */
  def thresholdScan(df: DataFrame, label: String, score: String,
                    thresholds: Seq[Double],
                    maxDistinctScores: Long = 1L << 20,
                    quantizeBins: Int = 100000,
                    scope: StorageScope = StorageScope.global): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val th = thresholds.toDF("threshold")
    // The exact histogram is |distinct scores|-sized — input-sized for
    // continuous doubles, i.e. exactly the table the guard exists to keep
    // bounded. It is persisted only TRANSIENTLY (count + at most one bounded
    // re-aggregation read it, then it is dropped); what stays retained in
    // `scope` is always bounded: either the exact histogram when it proved
    // ≤ maxDistinctScores rows, or the ≤ quantizeBins+1-row quantized
    // re-aggregation. Net cost is unchanged (ONE full input pass); the
    // input-sized cache no longer outlives construction.
    val g = scoreHistogram(df, label, score).persist()
    val hist =
      try {
        val distinct = g.count()
        if (distinct <= maxDistinctScores) scope.retain(g)
        else {
          val q = scope.retain(
            g.groupBy((floor(col("__s") * quantizeBins) / quantizeBins).as("__s"))
              .agg(sum(col("__n")).as("__n"), sum(col("__p")).as("__p"))
              .persist())
          q.count() // materialize FROM the exact cache before dropping it
          g.unpersist(blocking = false)
          q
        }
      } catch { case t: Throwable => g.unpersist(blocking = false); throw t }
    hist
      .withColumn("__gn", col("__n") - col("__p"))
      .crossJoin(broadcast(th))
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("__s") >= col("threshold"), col("__p")).otherwise(0L)).as("tp"),
        sum(when(col("__s") >= col("threshold"), col("__gn")).otherwise(0L)).as("fp"),
        sum(when(col("__s") < col("threshold"), col("__p")).otherwise(0L)).as("fn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        when(lit(2.0) * col("tp").cast("double") + col("fp").cast("double") + col("fn").cast("double") > 0.0,
          (lit(2.0) * col("tp").cast("double")) /
            (lit(2.0) * col("tp").cast("double") + col("fp").cast("double") + col("fn").cast("double")))
          .as("f1"))
  }

  /** Guarded cumulative score table for PR metrics: descending prefix sums
    * over the distinct-score histogram, with the continuous-score quantize
    * guard. Returns the cumulative table plus the global positive total
    * (free from the prefix pass-1 carry — no extra agg job).
    *
    * Guard: |distinct| also rides the pass-1 carry (`__one`); above
    * `maxDistinctScores` the histogram is re-aggregated onto a
    * `floor(score·quantizeBins)/quantizeBins` grid before the prefix pass,
    * bounding both the fold/collect sizes downstream AND the output row
    * count at `quantizeBins`+1. EAGER like the PrefixSum it wraps. */
  private def guardedCumulative(df: DataFrame, label: String, score: String,
                                maxDistinctScores: Long,
                                quantizeBins: Int): (DataFrame, Long) = {
    val g0 = scoreHistogram(df, label, score).withColumn("__one", lit(1L))
    val (cum0, tot0) =
      PrefixSum.runningSumsWithTotals(g0, Seq(col("__s").desc), Seq("__n", "__p", "__one"))
    if (tot0("__one") <= maxDistinctScores)
      (cum0.drop("__one", "__one_cum"), tot0("__p"))
    else {
      val gq = g0.groupBy((floor(col("__s") * quantizeBins) / quantizeBins).as("__s"))
        .agg(sum(col("__n")).as("__n"), sum(col("__p")).as("__p"))
      val (c, t) = PrefixSum.runningSumsWithTotals(gq, Seq(col("__s").desc), Seq("__n", "__p"))
      (c, t("__p"))
    }
  }

  /** OOF precision-recall curve (`OOF_AUC_test.py:336-340`): one row per
    * distinct score threshold with exact cumulative counts; precision and
    * recall are single divisions of exact longs (oracle-hash-stable).
    * Continuous scores quantize past `maxDistinctScores` (see
    * [[guardedCumulative]]) so the curve itself stays bounded — callers that
    * collect it for plotting (EvalMain) pass a small `quantizeBins`. */
  def prCurve(df: DataFrame, label: String, score: String,
              maxDistinctScores: Long = 1L << 20,
              quantizeBins: Int = 100000): DataFrame = {
    val (cum, tpTotal) =
      guardedCumulative(df, label, score, maxDistinctScores, quantizeBins)
    cum.select(
      col("__s").as("threshold"),
      col("__p_cum").as("tp"),
      col("__n_cum").as("n_pred"),
      (col("__p_cum").cast("double") / col("__n_cum").cast("double")).as("precision"),
      when(lit(tpTotal) > 0,
        col("__p_cum").cast("double") / lit(tpTotal).cast("double")).as("recall"))
  }

  /** Average precision (sklearn `average_precision_score`, the reference's
    * headline PR-AUC): AP = Σ_j ΔR_j · P_j over thresholds = distinct scores
    * descending, ΔR_j = p_j/P, P_j = tp_j/n_pred_j.
    *
    * The terms are inexact doubles, so the REDUCTION order matters for
    * bit-parity: both this plan and the DuckDB oracle fold the (tiny,
    * |distinct scores|-sized) term list sequentially in ascending-score
    * order — collect_list → sort_array → aggregate here, list(... ORDER BY
    * score) → list_reduce there — giving a bit-reproducible scalar. The
    * heavy work (histogram, prefix sums) is all distributed; only the final
    * |distinct|-element fold is single-node, and it arrives pre-aggregated.
    *
    * Continuous-score guard (round-2 fix): for continuous double scores
    * |distinct| ≈ |rows|, which would funnel every row into that one fold
    * buffer. The distinct-score count (and the positive total) come FREE
    * from the prefix pass-1 carry — no extra guard job; above
    * `maxDistinctScores` the histogram is re-aggregated onto a
    * `floor(score·quantizeBins)/quantizeBins` grid before the prefix/fold
    * stages, bounding the fold at `quantizeBins`+1 terms. Quantized AP is
    * an approximation (standard for at-scale PR metrics); the default
    * threshold (2^20 distinct) keeps every exact-oracle use on the exact
    * path. EAGER like the PrefixSum it wraps. */
  def averagePrecision(df: DataFrame, label: String, score: String,
                       maxDistinctScores: Long = 1L << 20,
                       quantizeBins: Int = 100000): DataFrame = {
    val (cum, tpTotal) =
      guardedCumulative(df, label, score, maxDistinctScores, quantizeBins)
    val term = (col("__p").cast("double") / lit(tpTotal).cast("double")) *
      (col("__p_cum").cast("double") / col("__n_cum").cast("double"))
    cum
      .filter(lit(tpTotal) > 0L) // no positives ⇒ empty term list ⇒ 0.0 (oracle-identical)
      .select(col("__s"), term.as("__term"))
      .agg(aggregate(
        sort_array(collect_list(struct(col("__s"), col("__term")))),
        lit(0.0),
        (acc, x) => acc + x.getField("__term")).as("auc_pr"))
  }
}
