package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.genMedia(spark, seed = 3L, n = 500).cache()

  test("media table: schema, modality domains, deterministic generation") {
    assert(media.schema == Multimodal.mediaSchema)
    val mods = media.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods == Set("image", "audio", "video"))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getAs[Array[Byte]](3)).map(_.toSeq), r.getStruct(4).toString)
    }.toSet
    assert(canon(media.toDF()) == canon(Multimodal.genMedia(spark, 3L, 500)))
  }

  test("batched feature extraction: one vector per sample, batch-size invariant, deterministic") {
    val f1 = Multimodal.extractFeatures(media, batchSize = 64)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val f2 = Multimodal.extractFeatures(media, batchSize = 7)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(f1.size == 500)
    assert(f1 == f2, "features must not depend on batch boundaries")
    assert(f1.values.forall(_.length == Multimodal.FeatureDim))
    // deterministic stub: same bytes -> same features (direct call;
    // compare as Seq — Array equality is referential)
    val bytes = media.filter(col("sample_id") === 0).collect()(0).getAs[Array[Byte]]("content")
    assert(Multimodal.decodeBatch(Seq(bytes)).map(_.toSeq) ==
      Multimodal.decodeBatch(Seq(bytes)).map(_.toSeq))
  }

  test("frame sampling yields k evenly spaced offsets within duration") {
    val k = 4
    val frames = Multimodal.sampleFrames(media, k)
    val perSample = frames.groupBy("sample_id").count().collect().map(_.getLong(1)).toSet
    assert(perSample == Set(k.toLong))
    val durations = media.filter(col("modality") === "video")
      .select(col("sample_id"), col("meta.duration_ms")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    frames.collect().foreach { r =>
      val (id, idx, off) = (r.getLong(0), r.getInt(1), r.getInt(2))
      assert(off == idx * durations(id) / k)
    }
  }

  test("resize plan preserves aspect ratio, bounded by maxDim") {
    val plans = Multimodal.resizePlan(media, maxDim = 32).collect()
    assert(plans.nonEmpty)
    plans.foreach { r =>
      assert(r.getInt(1) <= 32 && r.getInt(2) <= 32)
      assert(r.getInt(1) == 32 || r.getInt(2) == 32) // longest side hits the bound
    }
  }
}
