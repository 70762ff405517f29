package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global running (inclusive prefix) sums WITHOUT a single-partition window.
  *
  * `Window.orderBy(...)` with no partition key is Spark's documented
  * scale-killer ("WindowExec: No Partition Defined ... Moving all data to a
  * single partition"): every row lands on one task. This operator is the
  * parallel-prefix alternative, same shape as
  * [[AsOfJoin.mergedScalable]]'s boundary stitching:
  *
  *   1. range-partition + sort by `orderCols`;
  *   2. pass 1 (cheap scan): per-partition totals of `sumCols` — P tiny rows
  *      to the driver;
  *   3. driver: exclusive prefix-combine (O(P));
  *   4. pass 2: per-partition sequential sums seeded with the partition's
  *      incoming offsets.
  *
  * Work per task is proportional to rows per PARTITION, never total rows.
  * Both passes read the same persisted sorted shuffle output.
  *
  * `sumCols` must be LongType (cast upfront — exact integer prefix sums are
  * also what keeps the DuckDB-oracle hash compare bit-stable); nulls count
  * as 0. Appends `<col>_cum` columns.
  *
  * `orderCols` must order rows UNIQUELY: per-row cumulative values of TIED
  * rows depend on which side of a range boundary a tie lands — callers here
  * always order by a distinct key (post-groupBy scores). Per-partition
  * totals (and therefore all downstream group-level sums) are tie-safe.
  *
  * No persist: both passes pull the same QueryExecution RDD, so pass 2
  * reuses pass 1's shuffle files (only the cheap within-partition sort
  * re-runs) — the operator holds no cache entries after it returns.
  *
  * NOTE: construction is EAGER — pass 1 runs a Spark job when this method is
  * called (not when the returned DataFrame is first acted on). Callers that
  * build plans speculatively should defer the call accordingly.
  */
object PrefixSum {

  def runningSums(df: DataFrame, orderCols: Seq[Column], sumCols: Seq[String],
                  numPartitions: Int = 0): DataFrame =
    runningSumsWithTotals(df, orderCols, sumCols, numPartitions)._1

  /** [[runningSums]] plus the GRAND totals of `sumCols` — free by-products
    * of pass 1 (the driver's exclusive-prefix carry after the last
    * partition). Callers that would otherwise run a separate count/agg job
    * over the input (e.g. |distinct| guards, positive-total denominators)
    * should read them from here instead. */
  def runningSumsWithTotals(df: DataFrame, orderCols: Seq[Column], sumCols: Seq[String],
                            numPartitions: Int = 0): (DataFrame, Map[String, Long]) = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    sumCols.foreach { c =>
      require(df.schema(c).dataType == LongType, s"sumCol $c must be LongType (cast upfront)")
    }
    val sorted = df
      .repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    val idxs = sumCols.map(df.schema.fieldIndex).toArray
    val n = idxs.length

    // pass 1: per-partition totals (P × n longs — tiny)
    val totals: Array[(Int, Array[Long])] =
      sorted.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
        val acc = new Array[Long](n)
        it.foreach { row =>
          var i = 0
          while (i < n) {
            if (!row.isNullAt(idxs(i))) acc(i) += row.getLong(idxs(i))
            i += 1
          }
        }
        Iterator.single((pid, acc))
      }.collect()

    // driver: exclusive prefix offsets per partition
    val offsets = Array.ofDim[Long](parts, n)
    val byPid = totals.toMap
    val carry = new Array[Long](n)
    (0 until parts).foreach { pid =>
      System.arraycopy(carry, 0, offsets(pid), 0, n)
      byPid.get(pid).foreach { t =>
        var i = 0
        while (i < n) { carry(i) += t(i); i += 1 }
      }
    }
    // pass 2: sequential per-partition sums seeded with the offsets.
    // The offsets array is P×n longs (P = shuffle partitions) — small by
    // construction, so it ships inside each task closure; broadcasting it
    // would leave an undestroyable broadcast behind in long-lived sessions.
    val outSchema = StructType(df.schema.fields ++
      sumCols.map(c => StructField(s"${c}_cum", LongType, nullable = false)))
    val rdd = sorted.queryExecution.toRdd.mapPartitionsWithIndex { (pid, it) =>
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(outSchema)
      val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
      val cums = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(n)
      val run = offsets(pid).clone()
      it.map { row =>
        var i = 0
        while (i < n) {
          if (!row.isNullAt(idxs(i))) run(i) += row.getLong(idxs(i))
          cums.update(i, run(i))
          i += 1
        }
        joined(row, cums)
        proj(joined).copy(): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val out = org.apache.spark.sql.graftbridge.Bridge.internalCreateDataFrame(spark, rdd, outSchema)
    (out, sumCols.zipWithIndex.map { case (c, i) => c -> carry(i) }.toMap)
  }
}
