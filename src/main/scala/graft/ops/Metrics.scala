package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Evaluation-framework dataflow operators (`LR_Model_train/LR_Advanced.py:
  * 656-677`, `OOF_AUC_test.py:336-371`) as distributed aggregations — the
  * sklearn metric calls become groupBy/window plans with exact arithmetic
  * (counts + one final division), so the DuckDB oracle matches bit-for-bit.
  */
object Metrics {

  /** Confusion matrix counts: one row per (label, prediction). */
  def confusion(df: DataFrame, label: String, pred: String): DataFrame =
    df.groupBy(col(label), col(pred)).agg(count(lit(1)).as("n"))

  /** Accuracy / precision / recall / F1 at a threshold, one output row.
    * All ratios are single divisions of exact long counts. */
  def binaryMetrics(df: DataFrame, label: String, score: String, threshold: Double): DataFrame = {
    val pred = when(col(score) > lit(threshold), 1).otherwise(0)
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

  /** ROC AUC via the Mann-Whitney U statistic with average ranks for ties:
    * AUC = (Σ ranks(positives) − P(P+1)/2) / (P·N). One window pass + one
    * aggregate; exact given exact scores. */
  def aucRoc(df: DataFrame, label: String, score: String): DataFrame = {
    val rAvg = rank().over(Window.orderBy(col(score))).cast("double") +
      (count(lit(1)).over(Window.partitionBy(col(score))).cast("double") - 1.0) / 2.0
    val ranked = df.select(col(label), rAvg.as("__r"))
    ranked.agg(
      sum(when(col(label) === 1, col("__r")).otherwise(0.0)).as("__sumR"),
      sum(when(col(label) === 1, 1L).otherwise(0L)).as("__p"),
      sum(when(col(label) === 0, 1L).otherwise(0L)).as("__n"))
      .select(when(col("__p") > 0 && col("__n") > 0,
        (col("__sumR") - col("__p").cast("double") * (col("__p").cast("double") + 1.0) / 2.0)
          / (col("__p").cast("double") * col("__n").cast("double"))).as("auc"))
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
    * 364`): broadcast the grid, one shuffle by threshold. */
  def thresholdScan(df: DataFrame, label: String, score: String,
                    thresholds: Seq[Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val th = thresholds.toDF("threshold")
    df.select(col(label).as("__y"), col(score).as("__s"))
      .crossJoin(broadcast(th))
      .groupBy(col("threshold"))
      .agg(
        sum(when(col("__y") === 1 && col("__s") > col("threshold"), 1L).otherwise(0L)).as("tp"),
        sum(when(col("__y") === 0 && col("__s") > col("threshold"), 1L).otherwise(0L)).as("fp"),
        sum(when(col("__y") === 1 && col("__s") <= col("threshold"), 1L).otherwise(0L)).as("fn"))
      .select(col("threshold"), col("tp"), col("fp"), col("fn"),
        when(lit(2.0) * col("tp").cast("double") + col("fp").cast("double") + col("fn").cast("double") > 0.0,
          (lit(2.0) * col("tp").cast("double")) /
            (lit(2.0) * col("tp").cast("double") + col("fp").cast("double") + col("fn").cast("double")))
          .as("f1"))
  }
}
