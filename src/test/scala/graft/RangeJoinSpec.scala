package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.ops.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // user 1: anchors at 1000 and 4000; user 2: anchor at 1000 (keys isolate)
  private lazy val left = Seq(
    (1L, ts(500), 10L), (1L, ts(1500), 11L), (1L, ts(2500), 12L),
    (1L, ts(3900), 13L), (1L, ts(9000), 14L),
    (2L, ts(900), 20L), (2L, ts(5000), 21L)
  ).toDF("user_id", "ts", "event_id")
  private lazy val right = Seq(
    (1L, ts(1000), 100L), (1L, ts(4000), 101L), (2L, ts(1000), 200L)
  ).toDF("user_id", "ts", "event_id")

  test("banded == naive theta join (including band-boundary rows)") {
    val width = 1000L
    val banded = RangeJoin.bandCounts(left, right, "user_id", "ts",
      "event_id", "event_id", width)
      .as[(Long, Long, Long)].collect().toSet
    val l = left.select(col("user_id").as("k"), col("ts").as("lt"), col("event_id").as("ls"))
    val r = right.select(col("user_id").as("k2"), col("ts").as("rt"), col("event_id").as("rs"))
    val naive = l.join(r, col("k") === col("k2") &&
        abs(graft.ops.micros(col("lt")) - graft.ops.micros(col("rt"))) <= lit(width * 1000000L))
      .groupBy(col("ls")).agg(count(lit(1)).as("n"), min(col("rs")).as("m"))
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == naive)
    // hand checks against the fixture timeline
    assert(banded.contains((11L, 1L, 100L)), "t=1500 is only in the 1000 anchor band")
    assert(!banded.exists(_._1 == 12L), "t=2500 is outside both ±1000 bands")
    assert(!banded.exists(_._1 == 14L), "t=9000 matches nothing")
    assert(banded.contains((13L, 1L, 101L)), "t=3900 is in the 4000 anchor band")
    assert(banded.contains((20L, 1L, 200L)), "user-2 rows never cross to user-1 anchors")
  }

  test("each (left, right) pair is produced exactly once (replica bins are distinct)") {
    // anchors AT bin boundaries — the replication edge case
    val l2 = Seq((1L, ts(2000), 1L), (1L, ts(2001), 2L)).toDF("user_id", "ts", "event_id")
    val r2 = Seq((1L, ts(2000), 9L)).toDF("user_id", "ts", "event_id")
    val got = RangeJoin.bandCounts(l2, r2, "user_id", "ts", "event_id", "event_id", 1000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 1L, 9L), (2L, 1L, 9L)))
  }

  test("band join is partition-invariant") {
    val a = RangeJoin.bandCounts(left.repartition(1), right.repartition(1),
      "user_id", "ts", "event_id", "event_id", 1000L)
      .as[(Long, Long, Long)].collect().toSet
    val b = RangeJoin.bandCounts(left.repartition(7), right.repartition(3),
      "user_id", "ts", "event_id", "event_id", 1000L)
      .as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("mega-entity skew: the (key, bin) join key re-spreads one key across bins") {
    // one user, 5,000 events spread over ~58 days: a plain user_id join key
    // would put every candidate pair in ONE task; the banded key has as many
    // distinct values as occupied time bins
    val mega = (0L until 5000L).map(i => (1L, ts(i * 1000), i)).toDF("user_id", "ts", "event_id")
    val anchors = (0L until 50L).map(i => (1L, ts(i * 100000), 9000L + i)).toDF("user_id", "ts", "event_id")
    val width = 1800L
    val w = width * 1000000L
    val occupiedBins = mega.select(
        ((graft.ops.micros(col("ts")) - pmod(graft.ops.micros(col("ts")), lit(w))) / lit(w))
          .cast("long").as("b"))
      .distinct().count()
    assert(occupiedBins > 100, s"fixture should span many bins, got $occupiedBins")
    // correctness on the skewed fixture: banded == naive
    val banded = RangeJoin.bandCounts(mega, anchors, "user_id", "ts",
      "event_id", "event_id", width).as[(Long, Long, Long)].collect().toSet
    val naive = mega.select(col("user_id").as("k"), col("ts").as("lt"), col("event_id").as("ls"))
      .join(anchors.select(col("user_id").as("k2"), col("ts").as("rt"), col("event_id").as("rs")),
        col("k") === col("k2") &&
          abs(graft.ops.micros(col("lt")) - graft.ops.micros(col("rt"))) <= lit(w))
      .groupBy(col("ls")).agg(count(lit(1)).as("n"), min(col("rs")).as("m"))
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == naive)
  }

  test("banded plan is an equi-join — no nested-loop / cartesian fallback") {
    val plan = RangeJoin.bandCounts(left, right, "user_id", "ts",
      "event_id", "event_id", 1000L).queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"banded join fell back to a non-equi plan:\n$plan")
    assert(plan.contains("Join") || plan.contains("join"), s"no join in plan:\n$plan")
  }
}
