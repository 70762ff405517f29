package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality guards from the reference's preprocessing:
  *   - `nullAudit`: fail-fast if any listed column is null
  *     (`Preprocess/dataset_for_prediction.py:41-43` raise-on-isna) —
  *     implemented as a LIMIT-1 existence probe, not a full count;
  *   - `cleanNonFinite`: ±inf/NaN → 0 (`LR_Model_train/LR_Advanced.py:
  *     542-543` replace+fillna), kept for parity even though the engineered
  *     formulas' +1e-6 guards make non-finite values impossible;
  *   - `clip`: scalar clamp (`LR_Advanced.py:556`).
  */
object DataOps {

  final case class NullAuditException(cols: Seq[String])
    extends RuntimeException(s"null values present in: ${cols.mkString(", ")}")

  /** Throws NullAuditException if any of `cols` contains a null. One
    * short-circuiting job (LIMIT 1 under the hood). */
  def nullAudit(df: DataFrame, cols: Seq[String]): DataFrame = {
    val anyNull = cols.map(c => col(c).isNull).reduce(_ || _)
    val offender = df.filter(anyNull).limit(1)
      .select(cols.map(c => col(c).isNull.as(c)): _*).collect()
    if (offender.nonEmpty) {
      val bad = cols.zipWithIndex.filter { case (_, i) => offender(0).getBoolean(i) }.map(_._1)
      throw NullAuditException(bad)
    }
    df
  }

  /** NaN/±Inf → 0.0 for the listed double columns. */
  def cleanNonFinite(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(df.columns.map { c =>
      if (!cols.contains(c)) col(c)
      else when(isnan(col(c)) || col(c) === Double.PositiveInfinity ||
        col(c) === Double.NegativeInfinity, 0.0).otherwise(col(c)).as(c)
    }.toIndexedSeq: _*)

  /** clip(lower, upper) as least(greatest(..)). */
  def clip(c: Column, lo: Double, hi: Double): Column =
    least(greatest(c, lit(lo)), lit(hi))
}
