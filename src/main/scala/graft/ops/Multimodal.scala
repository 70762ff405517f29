package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.gen.TranscriptGen

/** Multimodal columns: image/audio/video handled as opaque BINARY columns
  * with typed metadata, plus batch-shaped decode / feature-extract /
  * frame-sample operators.
  *
  * The Spark-side plumbing is real and tested: schema, conversation-hash
  * partitioning, batched per-partition processing (the JVM analog of
  * `mapInPandas` — rows are staged into fixed-size batches so a vectorized
  * decoder amortizes per-call overhead), and deterministic output. The
  * DECODER ITSELF IS A STUB: no image/audio codecs exist in this container,
  * so `decodeBatch` derives features from the bytes deterministically. A real
  * deployment swaps `decodeBatch` only — every other moving part (schema,
  * batching, partitioning, null handling) stays.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("sample_id", LongType, nullable = false),
    StructField("conv_id", StringType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", IntegerType, nullable = true))), nullable = false)))

  /** Deterministic synthetic media table (seeded bytes; no external data). */
  def genMedia(spark: SparkSession, seed: Long, n: Int, partitions: Int = 8): DataFrame = {
    val rows = spark.sparkContext.parallelize(0 until n, partitions).map { i =>
      val h = TranscriptGen.mix(seed ^ i.toLong)
      val modality = Seq("image", "audio", "video")(((h >>> 8) % 3).toInt)
      val len = 64 + ((h >>> 16) % 192).toInt
      val bytes = Array.tabulate[Byte](len)(j => (TranscriptGen.mix(h ^ j.toLong) & 0xff).toByte)
      val meta = modality match {
        case "image" => Row(64 + (h % 64).toInt, 64 + ((h >>> 4) % 64).toInt, null, null)
        case "audio" => Row(null, null, 16000, 500 + ((h >>> 12) % 2000).toInt)
        case _       => Row(64 + (h % 64).toInt, 64 + ((h >>> 4) % 64).toInt, null, 1000 + ((h >>> 20) % 5000).toInt)
      }
      Row(i.toLong, f"conv-${(h % 97 + 97) % 97}%05d", modality, bytes, meta)
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  val FeatureDim = 8

  /** STUB vectorized decoder: one call per BATCH of byte payloads, returning
    * one feature vector per payload. Deterministic fake (polynomial byte
    * folds per feature lane). Real impl: JNI/codec call over the batch. */
  def decodeBatch(batch: Seq[Array[Byte]]): Seq[Array[Float]] =
    batch.map { bytes =>
      Array.tabulate(FeatureDim) { lane =>
        var acc = 7L
        var i = lane
        while (i < bytes.length) { acc = (acc * 31 + (bytes(i) & 0xff)) % 1000003L; i += FeatureDim }
        (acc.toDouble / 1000003.0).toFloat
      }
    }

  /** Batched per-partition decode (mapInPandas-shaped): stage `batchSize`
    * rows, decode the batch in one call, zip features back. Column-pruned
    * input (only id + content), so a 100 TB media table streams through
    * without materializing metadata. */
  def extractFeatures(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("sample_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))
    val enc = Encoders.row(outSchema)
    df.select(col("sample_id"), col("content")).mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val (withBytes, nullBytes) = rows.partition(!_.isNullAt(1))
        val feats = decodeBatch(withBytes.map(_.getAs[Array[Byte]](1)))
        withBytes.zip(feats).map { case (r, f) =>
          Row(r.getLong(0), f.toIndexedSeq)
        } ++ nullBytes.map(r => Row(r.getLong(0), null))
      }
    }(enc)
  }

  /** Frame sampling for video rows: emit `k` evenly spaced frame offsets per
    * sample (pure Catalyst — sequence + transform; the byte slicing is the
    * decoder's job downstream). */
  def sampleFrames(df: DataFrame, k: Int): DataFrame =
    df.filter(col("modality") === "video")
      .select(col("sample_id"),
        posexplode(transform(sequence(lit(0), lit(k - 1)),
          i => (i * col("meta.duration_ms") / k).cast("int"))))
      .toDF("sample_id", "frame_idx", "frame_offset_ms")

  /** Metadata-only resize plan: new dims preserving aspect ratio, integer
    * arithmetic (the decode stub consumes it; a real resizer would too). */
  def resizePlan(df: DataFrame, maxDim: Int): DataFrame =
    df.filter(col("meta.width").isNotNull)
      .select(col("sample_id"), col("meta.width").as("w"), col("meta.height").as("h"))
      .withColumn("scale_num", lit(maxDim))
      .withColumn("scale_den", greatest(col("w"), col("h")))
      .select(col("sample_id"),
        (col("w") * col("scale_num") / col("scale_den")).cast("int").as("new_w"),
        (col("h") * col("scale_num") / col("scale_den")).cast("int").as("new_h"))
}
