package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer

/** Backward (point-in-time) as-of join — the engine's flagship operator.
  *
  * For every left row (key, ts), attach the payload of the LATEST right row
  * with the same key and right.ts <= left.ts (inclusive); null if none.
  * Among right rows sharing (key, ts), the one with the greatest `rightSeq`
  * wins (deterministic tiebreak). Zero temporal leakage by construction:
  * no right row with ts' > ts can ever reach a left row.
  *
  * Spark has no built-in as-of join, so three equivalent implementations are
  * provided (property-tested identical — SURVEY §7.4.5):
  *
  *  1. `windowed` — union-tag + `last(ignoreNulls)` over a cumulative window.
  *     Declarative; Catalyst plans one exchange + one sort. The SQL-oracle
  *     form (DuckDB `ASOF JOIN` cross-checks it).
  *  2. `merged` — `repartitionByRange(key)` + `sortWithinPartitions(key, ts,
  *     side)` + a single-pass `mapPartitions` merge carrying last-seen
  *     payload (the classic union-tag merge). Same shuffle volume as (1) but
  *     no window-operator buffering: O(1) state per key, ideal when payloads
  *     are wide or conversations are huge. Range partitioning keeps keys
  *     contiguous so a partition boundary never splits a key.
  *  3. `broadcastIndex` — when the right side is a SMALL timestamp index
  *     (e.g. per-conversation checkpoint/snapshot heads): broadcast sorted
  *     per-key arrays and binary-search per left row. No shuffle of the big
  *     side at all — the 100 TB scan stays pipelined map-only.
  *
  * At cluster scale the choice is mechanical: (3) if right fits the
  * broadcast threshold; else (2); (1) as the semantic oracle.
  */
object AsOfJoin {

  /** Deduplicate right to one row per (key, ts): greatest rightSeq wins. */
  private def dedupRight(right: DataFrame, key: String, ts: String, rightSeq: String,
                         payload: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(key), col(ts)).orderBy(col(rightSeq).desc)
    right.select((Seq(key, ts, rightSeq) ++ payload).distinct.map(col): _*)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select((Seq(key, ts) ++ payload).map(col): _*)
  }

  /** Variant 1 — declarative window fill. */
  def windowed(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightSeq: String, payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val r = dedupRight(right, key, ts, rightSeq, payload)
    val lStruct = struct(left.columns.map(col): _*).as("__l")
    val pTypes = payload.map(p => p -> r.schema(p).dataType)
    val lTagged = left.select(
      Seq(col(key).as("__k"), micros(col(ts)).as("__t"), lit(1).as("__side"), lStruct) ++
        pTypes.map { case (p, dt) => lit(null).cast(dt).as(s"__p_$p") }: _*)
    val lStructType = lTagged.schema("__l").dataType
    val rTagged = r.select(
      Seq(col(key).as("__k"), micros(col(ts)).as("__t"), lit(0).as("__side"),
        lit(null).cast(lStructType).as("__l")) ++
        payload.map(p => col(p).as(s"__p_$p")): _*)
    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lTagged.unionByName(rTagged)
      .select(Seq(col("__side"), col("__l")) ++
        payload.map(p => last(col(s"__p_$p"), ignoreNulls = true).over(w).as(s"__p_$p")): _*)
      .filter(col("__side") === 1)
    filled.select(left.columns.map(c => col(s"__l.$c")) ++
      payload.map(p => col(s"__p_$p").as(s"$prefix$p")): _*)
  }

  /** Variant 2 — range-partitioned, secondary-sorted single-pass merge. */
  def merged(left: DataFrame, right: DataFrame, key: String, ts: String,
             rightSeq: String, payload: Seq[String], prefix: String = "asof_",
             numPartitions: Int = 0): DataFrame = {
    val spark = left.sparkSession
    val r = dedupRight(right, key, ts, rightSeq, payload)
    val lStruct = struct(left.columns.map(col): _*).as("__l")
    val pTypes = payload.map(p => p -> r.schema(p).dataType)
    val lTagged = left.select(
      Seq(col(key).as("__k"), micros(col(ts)).as("__t"), lit(1).as("__side"), lStruct) ++
        pTypes.map { case (p, dt) => lit(null).cast(dt).as(s"__p_$p") }: _*)
    val lStructType = lTagged.schema("__l").dataType.asInstanceOf[StructType]
    val rTagged = r.select(
      Seq(col(key).as("__k"), micros(col(ts)).as("__t"), lit(0).as("__side"),
        lit(null).cast(lStructType).as("__l")) ++
        payload.map(p => col(p).as(s"__p_$p")): _*)
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = lTagged.unionByName(rTagged)
      .repartitionByRange(parts, col("__k"))
      .sortWithinPartitions(col("__k"), col("__t"), col("__side"))

    val nPay = payload.size
    val outSchema = StructType(
      lStructType.fields ++
        pTypes.map { case (p, dt) => StructField(s"$prefix$p", dt, nullable = true) })
    val outEnc = Encoders.row(outSchema)
    // columns of `sorted`: __k, __t, __side, __l, __p_*...
    val result = sorted.mapPartitions { it =>
      var curKey: Any = null
      var haveKey = false
      val lastPay = new Array[Any](nPay)
      it.flatMap { row =>
        val k = row.get(0)
        if (!haveKey || k != curKey) {
          curKey = k; haveKey = true
          java.util.Arrays.fill(lastPay.asInstanceOf[Array[AnyRef]], null)
        }
        if (row.getInt(2) == 0) { // right row: update carried payload
          var i = 0
          while (i < nPay) { lastPay(i) = row.get(4 + i); i += 1 }
          Iterator.empty
        } else { // left row: emit with carried payload
          val l = row.getStruct(3)
          val out = new Array[Any](l.size + nPay)
          var i = 0
          while (i < l.size) { out(i) = l.get(i); i += 1 }
          var j = 0
          while (j < nPay) { out(l.size + j) = lastPay(j); j += 1 }
          Iterator.single(Row.fromSeq(out.toIndexedSeq))
        }
      }
    }(outEnc)
    result
  }

  /** Variant 3 — broadcast per-key sorted timestamp index + binary search.
    * Right side must be collect-ably small (an index, not a fact table). */
  def broadcastIndex(left: DataFrame, right: DataFrame, key: String, ts: String,
                     rightSeq: String, payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    val r = dedupRight(right, key, ts, rightSeq, payload)
      .select(col(key), micros(col(ts)).as("__t"), struct(payload.map(col): _*).as("__p"))
    // driver-side build of the index: key -> (sorted tsUs, payload rows)
    val index: Map[Any, (Array[Long], Array[Row])] =
      r.collect().groupBy(_.get(0)).map { case (k, rows) =>
        val sortedRows = rows.sortBy(_.getLong(1))
        (k, (sortedRows.map(_.getLong(1)), sortedRows.map(_.getStruct(2))))
      }
    val bc = spark.sparkContext.broadcast(index)

    val pTypes = payload.map(p => StructField(s"$prefix$p",
      r.schema("__p").dataType.asInstanceOf[StructType](p).dataType, nullable = true))
    val outSchema = StructType(left.schema.fields ++ pTypes)
    val outEnc = Encoders.row(outSchema)
    val keyIdx = left.columns.indexOf(key)
    val tsIdx = left.columns.indexOf(ts)
    val nPay = payload.size
    left.mapPartitions { it =>
      val idx = bc.value
      it.map { row =>
        val out = new ArrayBuffer[Any](row.size + nPay)
        var i = 0
        while (i < row.size) { out += row.get(i); i += 1 }
        // TIMESTAMP reads back as java.sql.Timestamp / Instant; TIMESTAMP_NTZ
        // as LocalDateTime (interpreted as UTC, matching the session tz).
        val tUs = row.get(tsIdx) match {
          case t: java.sql.Timestamp =>
            Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          case i: java.time.Instant =>
            Math.multiplyExact(i.getEpochSecond, 1000000L) + i.getNano / 1000L
          case l: java.time.LocalDateTime =>
            val i = l.toInstant(java.time.ZoneOffset.UTC)
            Math.multiplyExact(i.getEpochSecond, 1000000L) + i.getNano / 1000L
          case other => throw new IllegalArgumentException(s"unsupported ts type: $other")
        }
        idx.get(row.get(keyIdx)) match {
          case Some((tsArr, payArr)) =>
            // greatest j with tsArr(j) <= tUs
            var lo = 0; var hi = tsArr.length - 1; var ans = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (tsArr(mid) <= tUs) { ans = mid; lo = mid + 1 } else hi = mid - 1
            }
            if (ans >= 0) { val p = payArr(ans); var j = 0; while (j < nPay) { out += p.get(j); j += 1 } }
            else out ++= Seq.fill[Any](nPay)(null)
          case None => out ++= Seq.fill[Any](nPay)(null)
        }
        Row.fromSeq(out.toIndexedSeq)
      }
    }(outEnc)
  }
}
