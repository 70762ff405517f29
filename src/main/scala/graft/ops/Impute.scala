package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Missing-value imputation (`Other_Models/XGBoost_test.py:33-44`,
  * `Catboost_1.py:64-71`): numeric → median, categorical → mode. Both are
  * one tiny aggregation broadcast back — never a per-column scan loop.
  * Mode tie-break: smallest value (deterministic; sklearn/pandas `mode()`
  * also picks the smallest).
  */
object Impute {

  /** Fill nulls in numeric `cols` with their (exact) median. */
  def medianFill(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c => expr(s"percentile($c, 0.5D)").as(s"__med_$c"))
    val th = df.agg(aggs.head, aggs.tail: _*)
    val joined = df.crossJoin(broadcast(th))
    val out = df.columns.map { c =>
      if (cols.contains(c)) coalesce(col(c).cast("double"), col(s"__med_$c")).as(c) else col(c)
    }
    joined.select(out.toIndexedSeq: _*)
  }

  /** Fill nulls in categorical `cols` with their mode (most frequent,
    * smallest-value tie-break). */
  def modeFill(df: DataFrame, cols: Seq[String]): DataFrame = {
    val modes = cols.map { c =>
      df.filter(col(c).isNotNull)
        .groupBy(col(c)).agg(count(lit(1)).as("__n"))
        .orderBy(col("__n").desc, col(c).asc)
        .limit(1)
        .select(col(c).as(s"__mode_$c"))
    }
    val joined = modes.foldLeft(df)((acc, m) => acc.crossJoin(broadcast(m)))
    val out = df.columns.map { c =>
      if (cols.contains(c)) coalesce(col(c), col(s"__mode_$c")).as(c) else col(c)
    }
    joined.select(out.toIndexedSeq: _*)
  }
}
