package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import graft.ops.AsOfJoin

/** Three-way equivalence of the as-of join variants + oracle + leakage
  * properties (SURVEY §7.4.5). */
case class AsOfL(user_id: Long, event_id: Long, ts: Timestamp)
case class AsOfR(user_id: Long, ts: Timestamp, event_id: Long, value: Double)

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private type L = AsOfL
  private type R = AsOfR
  private val L = AsOfL
  private val R = AsOfR

  private def t(s: Long): Timestamp = new Timestamp(s * 1000L)

  /** Seeded random scenario incl. duplicate timestamps, keys with no right
    * rows, right rows after all left rows. */
  private def scenario(seed: Long, nKeys: Int, nLeft: Int, nRight: Int): (Seq[L], Seq[R]) = {
    val rnd = new scala.util.Random(seed)
    val left = (0 until nLeft).map(i =>
      L(rnd.nextInt(nKeys).toLong, i.toLong, t(rnd.nextInt(1000).toLong)))
    val right = (0 until nRight).map(i =>
      R(rnd.nextInt(nKeys).toLong, t(rnd.nextInt(1000).toLong), (1000 + i).toLong, rnd.nextInt(100).toDouble))
    (left, right)
  }

  private def run(f: (DataFrame, DataFrame) => DataFrame, left: Seq[L], right: Seq[R]): Map[Long, (Option[Long], Option[Double])] =
    f(left.toDF(), right.toDF()).collect().map { r =>
      val id = r.getLong(r.fieldIndex("event_id"))
      val aid = Option(r.get(r.fieldIndex("asof_event_id"))).map(_.asInstanceOf[Long])
      val av = Option(r.get(r.fieldIndex("asof_value"))).map(_.asInstanceOf[Double])
      id -> (aid, av)
    }.toMap

  private def inMemory(left: Seq[L], right: Seq[R]): Map[Long, (Option[Long], Option[Double])] =
    left.map { l =>
      val cand = right.filter(r => r.user_id == l.user_id && !r.ts.after(l.ts))
      val best = cand.sortBy(r => (r.ts.getTime, r.event_id)).lastOption
      l.event_id -> (best.map(_.event_id), best.map(_.value))
    }.toMap

  private val variants: Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Seq(
    "windowed" -> ((l, r) => AsOfJoin.windowed(l, r, "user_id", "ts", "event_id", Seq("event_id", "value"))),
    "merged" -> ((l, r) => AsOfJoin.merged(l, r, "user_id", "ts", "event_id", Seq("event_id", "value"))),
    "broadcastIndex" -> ((l, r) => AsOfJoin.broadcastIndex(l, r, "user_id", "ts", "event_id", Seq("event_id", "value"))),
    "planned" -> ((l, r) => graft.plans.AsOfPlan.asOfJoin(l, r, "user_id", "ts", "event_id", Seq("event_id", "value"))))

  test("all three variants equal the in-memory oracle on random scenarios") {
    for (seed <- Seq(1L, 2L, 3L)) {
      val (left, right) = scenario(seed, nKeys = 7, nLeft = 300, nRight = 120)
      val expected = inMemory(left, right)
      variants.foreach { case (name, f) =>
        assert(run(f, left, right) == expected, s"variant $name seed $seed")
      }
    }
  }

  test("skew-proof mergedScalable equals the oracle, incl. a mega-key spanning many partitions") {
    // one key holds ~90% of rows -> with 8 range partitions on (key, ts) it
    // MUST span several partitions, exercising the boundary stitching
    val rnd = new scala.util.Random(17)
    val left = (0 until 2000).map { i =>
      val k = if (i % 10 == 0) rnd.nextInt(5).toLong + 100L else 7L
      L(k, i.toLong, t(rnd.nextInt(5000).toLong))
    }
    val right = (0 until 300).map { i =>
      val k = if (i % 10 == 0) rnd.nextInt(5).toLong + 100L else 7L
      R(k, t(rnd.nextInt(5000).toLong), (10000 + i).toLong, rnd.nextInt(100).toDouble)
    }
    val expected = inMemory(left, right)
    val got = run((l, r) =>
      AsOfJoin.mergedScalable(l, r, "user_id", "ts", "event_id", Seq("event_id", "value"),
        numPartitions = 8), left, right)
    assert(got == expected)
  }

  test("mergedScalable on random scenarios equals the in-memory oracle") {
    for (seed <- Seq(4L, 5L)) {
      val (left, right) = scenario(seed, nKeys = 7, nLeft = 300, nRight = 120)
      val expected = inMemory(left, right)
      val got = run((l, r) =>
        AsOfJoin.mergedScalable(l, r, "user_id", "ts", "event_id", Seq("event_id", "value"),
          numPartitions = 5), left, right)
      assert(got == expected, s"seed $seed")
    }
  }

  test("inclusive at equal timestamps; greatest-seq tiebreak among right dups") {
    val left = Seq(L(1, 10, t(100)))
    val right = Seq(R(1, t(100), 1001, 5.0), R(1, t(100), 1002, 7.0), R(1, t(101), 1003, 9.0))
    val expected = Map(10L -> (Some(1002L), Some(7.0)))
    variants.foreach { case (name, f) => assert(run(f, left, right) == expected, name) }
  }

  test("zero leakage: mutating right rows strictly after an anchor never changes it") {
    val (left, right) = scenario(9L, nKeys = 4, nLeft = 80, nRight = 40)
    val base = run(variants(1)._2, left, right)
    // shift every right row that is strictly after ALL anchors of its key
    val maxAnchor = left.groupBy(_.user_id).view.mapValues(_.map(_.ts.getTime).max).toMap
    val mutated = right.map { r =>
      if (maxAnchor.get(r.user_id).forall(a => r.ts.getTime > a))
        r.copy(value = r.value + 999.0, event_id = r.event_id + 5000)
      else r
    }
    assert(run(variants(1)._2, left, mutated) == base)
  }

  test("no right rows for a key → null payload") {
    val left = Seq(L(1, 1, t(10)), L(2, 2, t(10)))
    val right = Seq(R(1, t(5), 1001, 1.0))
    val expected = Map(1L -> (Some(1001L), Some(1.0)), 2L -> (None, None))
    variants.foreach { case (name, f) => assert(run(f, left, right) == expected, name) }
  }

  test("non-long key type (int) is supported and all variants agree") {
    import org.apache.spark.sql.functions.col
    val (left, right) = scenario(11L, nKeys = 5, nLeft = 120, nRight = 60)
    val expected = inMemory(left, right)
    def asInt(df: DataFrame) = df.withColumn("user_id", col("user_id").cast("int"))
    (variants :+ ("mergedScalable" -> ((l: DataFrame, r: DataFrame) =>
      AsOfJoin.mergedScalable(l, r, "user_id", "ts", "event_id", Seq("event_id", "value"))))
    ).foreach { case (name, f) =>
      val got = f(asInt(left.toDF()), asInt(right.toDF())).collect().map { r =>
        val id = r.getLong(r.fieldIndex("event_id"))
        val aid = Option(r.get(r.fieldIndex("asof_event_id"))).map(_.asInstanceOf[Long])
        val av = Option(r.get(r.fieldIndex("asof_value"))).map(_.asInstanceOf[Double])
        id -> (aid, av)
      }.toMap
      assert(got == expected, s"int-key variant $name")
    }
  }

  test("null keys: payloads carry within the null group, all variants agree") {
    import org.apache.spark.sql.functions.{col, when}
    // many null-key rows so the null group spans range-partition boundaries
    val left = (0 until 200).map(i => L(if (i % 2 == 0) 0L else 1L, i.toLong, t(i.toLong)))
    val right = Seq(R(0, t(0), 1000, 1.0), R(1, t(0), 1001, 2.0))
    def nullify(df: DataFrame) = df.withColumn("user_id",
      when(col("user_id") === 0L, null).otherwise(col("user_id")))
    def runNull(f: (DataFrame, DataFrame) => DataFrame) =
      f(nullify(left.toDF()), nullify(right.toDF())).collect().map { r =>
        r.getLong(r.fieldIndex("event_id")) ->
          Option(r.get(r.fieldIndex("asof_event_id"))).map(_.asInstanceOf[Long])
      }.toMap
    val fromWindowed = runNull((l, r) =>
      AsOfJoin.windowed(l, r, "user_id", "ts", "event_id", Seq("event_id", "value")))
    // engine semantic: null keys form ONE group (Window.partitionBy groups
    // nulls; NOT SQL equi-join NULL-never-matches) — all variants must agree,
    // including the boundary carry in mergedScalable (haveCarry flag, not a
    // null-key sentinel)
    (0 until 200 by 2).foreach(i =>
      assert(fromWindowed(i.toLong).contains(1000L), s"null anchor $i"))
    assert(fromWindowed(1L).contains(1001L))
    for ((name, f) <- Seq(
      "merged" -> ((l: DataFrame, r: DataFrame) =>
        AsOfJoin.merged(l, r, "user_id", "ts", "event_id", Seq("event_id", "value"))),
      "mergedScalable" -> ((l: DataFrame, r: DataFrame) =>
        AsOfJoin.mergedScalable(l, r, "user_id", "ts", "event_id", Seq("event_id", "value"),
          numPartitions = 8)),
      "planned" -> ((l: DataFrame, r: DataFrame) =>
        graft.plans.AsOfPlan.asOfJoin(l, r, "user_id", "ts", "event_id", Seq("event_id", "value")))))
      assert(runNull(f) == fromWindowed, s"null-key variant $name")
  }

  test("planned variant: EXPLAIN shows the native operator, exchanges and sorts") {
    import org.apache.spark.sql.functions.col
    val (left, right) = scenario(21L, nKeys = 5, nLeft = 100, nRight = 50)
    val df = graft.plans.AsOfPlan.asOfJoin(left.toDF(), right.toDF(),
      "user_id", "ts", "event_id", Seq("event_id", "value"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfMerge"), s"native node missing:\n$plan")
    assert(!plan.contains("!AsOfMerge"), s"unresolved references in plan:\n$plan")
    // EnsureRequirements satisfied the declared needs — no hand-built shuffle
    assert(plan.contains("Exchange") && plan.contains("Sort"), s"plan:\n$plan")
    // self-as-of (duplicate ExprIds across children) resolves via re-aliasing
    val ev = left.toDF()
    val self = graft.plans.AsOfPlan.asOfJoin(ev, ev.filter(col("event_id") % 2 === 0),
      "user_id", "ts", "event_id", Seq("event_id"))
    assert(self.count() == left.size)
  }

  test("broadcastIndex fails fast on an oversized right side and bad key types") {
    val (left, right) = scenario(13L, nKeys = 3, nLeft = 20, nRight = 15)
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.broadcastIndex(left.toDF(), right.toDF(), "user_id", "ts", "event_id",
        Seq("event_id", "value"), maxIndexRows = 5)
    }
    assert(e.getMessage.contains("maxIndexRows"))
    import org.apache.spark.sql.functions.col
    val binKey = (df: DataFrame) => df.withColumn("user_id",
      col("user_id").cast("string").cast("binary"))
    intercept[IllegalArgumentException] {
      AsOfJoin.merged(binKey(left.toDF()), binKey(right.toDF()), "user_id", "ts",
        "event_id", Seq("event_id", "value"))
    }
  }
}
