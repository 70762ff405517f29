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

  test("REAL image decode: javax.imageio round-trip, batch-invariant, garbage-safe") {
    import spark.implicits._
    // real PNG bytes (JDK encoder), one corrupt row, one null row
    val rows = (0L until 40L).map { i =>
      (i, Multimodal.encodePng(8 + (i % 5).toInt, 6 + (i % 3).toInt, seed = i * 7 + 1))
    } :+ (98L, Array[Byte](1, 2, 3)) :+ (99L, null.asInstanceOf[Array[Byte]])
    val df = rows.toDF("sample_id", "content")
    val got = Multimodal.decodeImages(df, batchSize = 8).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getSeq[Float](3))))).toMap
    assert(got.size == 42)
    (0L until 40L).foreach { i =>
      val Some((w, h, means)) = got(i)
      assert(w == 8 + (i % 5).toInt && h == 6 + (i % 3).toInt, s"dims wrong for $i")
      assert(means.length == 3 && means.forall(m => m >= 0f && m <= 255f))
    }
    assert(got(98L).isEmpty && got(99L).isEmpty, "garbage/null must map to null, not fail")
    // batch-size invariance
    val got2 = Multimodal.decodeImages(df, batchSize = 3).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2), r.getSeq[Float](3))))).toMap
    assert(got == got2)
  }

  test("REAL image resize: aspect-preserved dims, decodable output, deterministic bytes") {
    import spark.implicits._
    val df = Seq((1L, Multimodal.encodePng(64, 48, 5L)), (2L, Multimodal.encodePng(20, 60, 9L)))
      .toDF("sample_id", "content")
    val out = Multimodal.resizeImages(df, maxDim = 16).collect()
      .map(r => r.getLong(0) -> (r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3))).toMap
    assert(out(1L)._2 == 16 && out(1L)._3 == 12) // 64x48 -> 16x12
    assert(out(2L)._2 == 5 && out(2L)._3 == 16)  // 20x60 -> 5x16 (integer floor)
    // the resized bytes are a REAL decodable PNG with the planned dims
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(out(1L)._1))
    assert(back.getWidth == 16 && back.getHeight == 12)
    // deterministic re-encode
    val out2 = Multimodal.resizeImages(df, maxDim = 16).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(out(1L)._1.toSeq == out2(1L).toSeq)
  }

  test("REAL audio decode: WAV rate/frames/duration/rms via javax.sound") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.encodeWav(nSamples = 16000, sampleRate = 16000, seed = 4L)),
      (2L, Multimodal.encodeWav(nSamples = 4410, sampleRate = 44100, seed = 8L)),
      (3L, Array[Byte](9, 9, 9))).toDF("sample_id", "content")
    val got = Multimodal.decodeAudio(df, batchSize = 2).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None
         else Some((r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4))))).toMap
    val Some((sr1, fr1, ms1, rms1)) = got(1L)
    assert(sr1 == 16000 && fr1 == 16000L && ms1 == 1000)
    assert(rms1 > 0.0 && rms1 < 32768.0)
    val Some((sr2, fr2, ms2, _)) = got(2L)
    assert(sr2 == 44100 && fr2 == 4410L && ms2 == 100)
    assert(got(3L).isEmpty, "non-WAV bytes must map to null")
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
