package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: pair left rows with right rows of the same key whose
  * timestamps lie within ±`widthSec` — "turns within Δ of an anchor", the
  * temporal-context join of a transcript pipeline.
  *
  * Why not write the predicate directly: an equi-key + range condition is
  * fine (Spark plans the equality as the join key and the range as a
  * post-join filter), but per-key candidate volume is |L_k|×|R_k| — one
  * mega-entity makes a quadratic task. The banded form bins both sides by
  * `widthSec` (band width = bin width, so a right row can only match left
  * rows in its own or adjacent bins), replicates each right row to those ≤3
  * bins, and joins on (key, bin): candidates per task drop from
  * |L_k|×|R_k| to the rows of three time-adjacent bins, and the join key
  * (key, bin) re-spreads a mega-entity across the cluster — the same
  * key-extension trick as the salted aggregate, but deterministic from the
  * data (no salt to tune).
  *
  * Each (left, right) pair appears exactly once: the left row has ONE bin,
  * the right row's ≤3 replica bins are distinct, so at most one replica can
  * equal the left bin. No post-join dedup is needed — the exact range
  * filter is the only correction.
  */
object RangeJoin {

  /** For each left row: the count of right rows within the band and the
    * minimum right sequence id among them (deterministic representative).
    * Output: (leftSeq, n_in_band, min_right_seq). */
  def bandCounts(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftSeq: String, rightSeq: String, widthSec: Long): DataFrame = {
    require(widthSec > 0, s"widthSec must be positive, got $widthSec")
    val w = widthSec * 1000000L // band width in epoch micros
    def bin(c: Column): Column = ((c - pmod(c, lit(w))) / lit(w)).cast("long")
    val l = left.select(col(key).as("__k"), micros(col(ts)).as("__lt"),
      col(leftSeq).as("__ls")).withColumn("__bin", bin(col("__lt")))
    val r = right.select(col(key).as("__k"), micros(col(ts)).as("__rt"),
      col(rightSeq).as("__rs"))
      .withColumn("__bin", explode(array(bin(col("__rt")) - 1, bin(col("__rt")),
        bin(col("__rt")) + 1)))
    l.join(r, Seq("__k", "__bin"))
      .filter(abs(col("__lt") - col("__rt")) <= lit(w))
      .groupBy(col("__ls"))
      .agg(count(lit(1)).as("n_in_band"), min(col("__rs")).as("min_right_seq"))
      .select(col("__ls").as(leftSeq), col("n_in_band"), col("min_right_seq"))
  }
}
