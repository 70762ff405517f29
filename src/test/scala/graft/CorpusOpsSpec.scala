package graft

import org.apache.spark.sql.functions._
import graft.ops.CorpusOps

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def scramble(id: Long): Long =
    java.lang.Math.floorMod(id * 2654435761L, 4294967296L)

  // 3 groups: "big" (40 rows), "mid" (10), "tiny" (2) — cap=10 exercises
  // both the pass-through (mid/tiny) and the rank-window (big) branch
  private lazy val grouped = (
    (0L until 40L).map(i => (i, "big")) ++
    (100L until 110L).map(i => (i, "mid")) ++
    Seq((200L, "tiny"), (201L, "tiny"))
  ).toDF("id", "grp")

  test("capPerGroup: under-cap groups pass through, over-cap groups keep the scrambled top-cap") {
    val got = CorpusOps.capPerGroup(grouped, "id", "grp", cap = 10)
      .as[(Long, String)].collect().toSet
    val expectBig = (0L until 40L).sortBy(i => (scramble(i), i)).take(10)
      .map(i => (i, "big")).toSet
    val expectRest = ((100L until 110L).map(i => (i, "mid")) ++
      Seq((200L, "tiny"), (201L, "tiny"))).toSet
    assert(got == expectBig ++ expectRest)
  }

  test("capPerGroup == plain rank-filter (two-phase split is an optimization, not a semantic)") {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("grp"))
      .orderBy(pmod(col("id") * lit(2654435761L), lit(4294967296L)), col("id"))
    val plain = grouped.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10).select(col("id"), col("grp"))
      .as[(Long, String)].collect().toSet
    val twoPhase = CorpusOps.capPerGroup(grouped, "id", "grp", cap = 10)
      .as[(Long, String)].collect().toSet
    assert(twoPhase == plain)
    // the shuffle-join fallback (over-cap set too big to broadcast) is the
    // same semantic
    val noBcast = CorpusOps.capPerGroup(grouped, "id", "grp", cap = 10,
      broadcastOverSet = false).as[(Long, String)].collect().toSet
    assert(noBcast == plain)
  }

  test("capPerGroup caps the NULL group like any other (PARTITION BY semantics)") {
    // 15 null-group rows + the 3 named groups; cap=10 must cap BOTH the
    // null group and "big" — a plain equi-join routing would let every
    // null-key row bypass the cap through the anti-join pass-through
    val withNulls = grouped.unionByName(
      (300L until 315L).map(i => (i, null: String)).toDF("id", "grp"))
    val got = CorpusOps.capPerGroup(withNulls, "id", "grp", cap = 10)
      .as[(Long, Option[String])].collect().toSet
    val expectNull = (300L until 315L).sortBy(i => (scramble(i), i)).take(10)
      .map(i => (i, None: Option[String])).toSet
    val expectBig = (0L until 40L).sortBy(i => (scramble(i), i)).take(10)
      .map(i => (i, Option("big"))).toSet
    val expectRest = ((100L until 110L).map(i => (i, Option("mid"))) ++
      Seq((200L, Option("tiny")), (201L, Option("tiny")))).toSet
    assert(got == expectNull ++ expectBig ++ expectRest)
  }

  test("capPerGroup is partition-invariant") {
    val a = CorpusOps.capPerGroup(grouped.repartition(1), "id", "grp", 10)
      .as[(Long, String)].collect().toSet
    val b = CorpusOps.capPerGroup(grouped.repartition(7), "id", "grp", 10)
      .as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("stratifiedSample keeps exactly the rows under the per-stratum permille") {
    val df = (0L until 1000L).map(i => (i, if (i % 3 == 0) "en" else "de"))
      .toDF("id", "lang")
    val got = CorpusOps.stratifiedSample(df, "id", "lang",
      rates = Seq("en" -> 100), defaultPermille = 1000)
      .select("id").as[Long].collect().toSet
    // the sample key is (id*C) mod 1000 directly — NOT (id*C mod 2^32) mod
    // 1000, which differs because 1000 does not divide 2^32
    val expect = (0L until 1000L).filter { i =>
      val keep = java.lang.Math.floorMod(i * 2654435761L, 1000L)
      if (i % 3 == 0) keep < 100 else keep < 1000
    }.toSet
    assert(got == expect)
    // the de stratum (default 1000 permille) is kept in full
    assert((0L until 1000L).filter(_ % 3 != 0).forall(got.contains))
  }

  test("repetitionStats: counts and ratios match a hand computation") {
    val df = Seq(
      (1L, "a a a b"),         // 4 tokens, 2 distinct, top=3
      (2L, "x y z"),           // 3 tokens, 3 distinct, top=1
      (3L, "a  a")             // split keeps empties: tokens a,"",a → top=2, distinct=2
    ).toDF("doc_id", "text")
    val got = CorpusOps.repetitionStats(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3)), (r.getDouble(4), r.getDouble(5)))).toMap
    assert(got(1L)._1 == ((4, 2, 3)))
    assert(got(1L)._2 == ((2.0 / 4.0, 3.0 / 4.0)))
    assert(got(2L)._1 == ((3, 3, 1)))
    assert(got(3L)._1 == ((3, 2, 2)))
  }

  test("packSequences: bins are contiguous prefix-sum offsets within each shard") {
    // one shard so the packing order is fully determined by the scramble
    val docs = (0L until 20L)
      .map(i => (i, Seq.fill(600)("w").mkString(" "))) // 600 tokens each
      .toDF("doc_id", "text")
    val got = CorpusOps.packSequences(docs, "doc_id", "text", budget = 2048L, nShards = 1)
      .as[(Int, Long, Long, Long)].collect().toSet
    // 20 docs × 600 tokens, offset bins of 2048: doc k starts at 600k,
    // bin = (600k) / 2048
    val bins = (0L until 20L).groupBy(k => (600L * k) / 2048L)
    val expect = bins.map { case (b, ks) => (0, b, ks.size.toLong, 600L * ks.size) }.toSet
    assert(got == expect)
    // token conservation: every token lands in exactly one bin
    assert(got.toSeq.map(_._4).sum == 20L * 600L)
  }

  test("packSequences is partition-invariant and covers all rows across shards") {
    val docs = (0L until 200L).map(i => (i, ("tok " * ((i % 17).toInt + 1)).trim))
      .toDF("doc_id", "text")
    val a = CorpusOps.packSequences(docs.repartition(1), "doc_id", "text", 64L, 8)
      .as[(Int, Long, Long, Long)].collect().toSet
    val b = CorpusOps.packSequences(docs.repartition(5), "doc_id", "text", 64L, 8)
      .as[(Int, Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.toSeq.map(_._3).sum == 200L)
  }

  test("native repetition expressions stay in whole-stage codegen") {
    // a parquet scan (not a local relation, no exchange) so the plan is the
    // plain codegen'd Project PlanAuditSpec audits on the real tables
    val p = java.nio.file.Files.createTempDirectory("corpusops").toString
    Seq((1L, "a b a")).toDF("doc_id", "text").write.mode("overwrite").parquet(p)
    val plan = CorpusOps.repetitionStats(spark.read.parquet(p), "doc_id", "text")
      .queryExecution.executedPlan.toString
    val projLines = plan.linesIterator.filter(_.contains("Project [")).toSeq
    assert(projLines.nonEmpty, s"no projection found:\n$plan")
    projLines.foreach(l =>
      assert(l.contains("*("), s"projection fell out of codegen: $l"))
  }
}
