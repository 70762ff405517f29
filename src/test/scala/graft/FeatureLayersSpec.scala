package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.features.{BehaviorBinding, FeatureLayers}
import graft.oracle.ScalaOracle
import graft.oracle.ScalaOracle.EntityStats

/** Engineered feature layers vs the plain-Scala oracle — EXACT double
  * equality (same IEEE expression trees), stronger than allclose. */
class FeatureLayersSpec extends SparkSpec {

  private val q = Seq("pv", "cart", "fav", "buy")
  private val binding = BehaviorBinding("pv", "cart", "fav", "buy")

  private def mkRow(id: Long, counts: Map[String, Long], mins: Map[String, Long],
                    maxs: Map[String, Long], avgs: Map[String, Double]): Row =
    Row.fromSeq(
      id +: q.flatMap(p => Seq[Any](counts(p), mins(p), maxs(p), avgs(p))))

  private val schema = StructType(
    StructField("user_id", LongType) +:
      q.flatMap(p => Seq(
        StructField(s"${p}_count", LongType),
        StructField(s"${p}_min", LongType),
        StructField(s"${p}_max", LongType),
        StructField(s"${p}_avg", DoubleType))))

  test("all 39 engineered features match the plain-Scala oracle exactly") {
    // deterministic pseudo-random entities, including edge shapes (all-zero,
    // single-behavior-dominant, large counts)
    val rnd = new scala.util.Random(42)
    val entities = (0 until 200).map { i =>
      val counts = q.map(p => p -> (if (i == 0) 0L else rnd.nextInt(50).toLong)).toMap
      val mins = q.map(p => p -> (if (i == 0) 0L else rnd.nextInt(5).toLong)).toMap
      val maxs = q.map(p => p -> (mins(p) + rnd.nextInt(20))).toMap
      val avgs = q.map(p => p -> (mins(p) + (maxs(p) - mins(p)) * rnd.nextDouble())).toMap
      (i.toLong, EntityStats(counts, mins, maxs, avgs))
    }
    val rows = entities.map { case (id, s) => mkRow(id, s.counts, s.min, s.max, s.avg) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = FeatureLayers.applyTo(df, binding)
      .collect().map(r => r.getLong(r.fieldIndex("user_id")) -> r).toMap

    val featNames = FeatureLayers.formulas(binding).map(_._1)
    assert(featNames.size == 39)
    entities.foreach { case (id, s) =>
      val expected = ScalaOracle.features(q, s).toMap
      val row = got(id)
      featNames.foreach { n =>
        val gotV = row.get(row.fieldIndex(n)) match {
          case d: Double => d
          case i: Int => i.toDouble
          case x => fail(s"unexpected type for $n: $x")
        }
        assert(gotV == expected(n), s"feature $n for entity $id: got $gotV expected ${expected(n)}")
      }
    }
  }

  test("leakage column policy lists every buy-derived feature") {
    val leaks = FeatureLayers.leakageCols(binding)
    assert(leaks.size == 19)
    val feats = FeatureLayers.formulas(binding).map(_._1).toSet
    // every leakage entry is either a feature name or a base/raw column name
    val base = Set("buy", "buy_yn", "buy_min", "buy_max", "buy_avg")
    leaks.foreach(l => assert(feats.contains(l) || base.contains(l), s"unknown leakage col $l"))
  }
}
