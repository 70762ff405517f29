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
  * decoder amortizes per-call overhead), and deterministic output.
  *
  * Decoders: IMAGE decode/resize is REAL (JDK `javax.imageio`, PNG/BMP —
  * no external codec dependency), AUDIO decode is REAL for WAV/PCM (JDK
  * `javax.sound.sampled`); only VIDEO remains a documented stub (`
  * decodeBatch`'s deterministic byte-fold) because the JDK ships no video
  * codec and the container has none. A real deployment swaps `decodeBatch`
  * only — every other moving part (schema, batching, partitioning, null
  * handling) stays.
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

  // ——— real JDK image path (round-3 verdict: javax.imageio is built in) ———

  /** Deterministic synthetic PNG: seeded per-pixel RGB, encoded by the JDK
    * PNG writer — REAL image bytes with no external data or codec. */
  def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, (TranscriptGen.mix(seed ^ (y.toLong * width + x)) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Vectorized REAL image decode: one `ImageIO.read` per payload, features =
    * (width, height, per-channel means in row-major order — deterministic
    * accumulation). Undecodable/corrupt bytes → None (never an exception:
    * a 100 TB crawl always contains garbage rows). */
  def decodeImageBatch(batch: Seq[Array[Byte]]): Seq[Option[(Int, Int, Array[Float])]] =
    batch.map { bytes =>
      val img =
        // NonFatal, not just IOException: the JDK image readers throw
        // IllegalArgumentException / ArrayIndexOutOfBounds on malformed
        // chunk data, and one crafted row must not kill the task
        try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
        catch { case scala.util.control.NonFatal(_) => None }
      img.map { im =>
        val (w, h) = (im.getWidth, im.getHeight)
        var (sr, sg, sb) = (0.0, 0.0, 0.0)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = (w.toLong * h).toDouble
        (w, h, Array((sr / n).toFloat, (sg / n).toFloat, (sb / n).toFloat))
      }
    }

  /** Batched per-partition REAL image decode — same mapInPandas shape as
    * [[extractFeatures]]: column-pruned input, `batchSize` rows staged per
    * decoder call group, nulls and undecodable rows pass through as null
    * features instead of failing the task. */
  def decodeImages(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("sample_id", LongType, nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("channel_means", ArrayType(FloatType, containsNull = false), nullable = true)))
    val enc = Encoders.row(outSchema)
    df.select(col("sample_id"), col("content")).mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        val (withBytes, nullBytes) = rows.partition(!_.isNullAt(1))
        val decoded = decodeImageBatch(withBytes.map(_.getAs[Array[Byte]](1)))
        withBytes.zip(decoded).map {
          case (r, Some((w, h, means))) => Row(r.getLong(0), w, h, means.toIndexedSeq)
          case (r, None) => Row(r.getLong(0), null, null, null)
        } ++ nullBytes.map(r => Row(r.getLong(0), null, null, null))
      }
    }(enc)
  }

  /** REAL resize: decode → nearest-neighbor scale to the [[resizePlan]]
    * aspect-preserving dims → re-encode PNG. Nearest-neighbor keeps the
    * pixel mapping integer-deterministic (bilinear would be too, but NN
    * makes the spec's determinism assertion trivially auditable). Output:
    * (sample_id, content PNG bytes, new_w, new_h); undecodable → null. */
  def resizeImages(df: DataFrame, maxDim: Int, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("sample_id", LongType, nullable = false),
      StructField("content", BinaryType, nullable = true),
      StructField("new_w", IntegerType, nullable = true),
      StructField("new_h", IntegerType, nullable = true)))
    val enc = Encoders.row(outSchema)
    df.select(col("sample_id"), col("content")).mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val decoded =
            if (r.isNullAt(1)) None
            else try Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1))))
            catch { case scala.util.control.NonFatal(_) => None }
          decoded match {
            case Some(im) =>
              val den = math.max(im.getWidth, im.getHeight)
              val nw = math.max(1, im.getWidth * maxDim / den)
              val nh = math.max(1, im.getHeight * maxDim / den)
              val out = new java.awt.image.BufferedImage(
                nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              var y = 0
              while (y < nh) {
                var x = 0
                while (x < nw) { // nearest-neighbor: integer source index
                  out.setRGB(x, y, im.getRGB(x * im.getWidth / nw, y * im.getHeight / nh))
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              Row(r.getLong(0), bos.toByteArray, nw, nh)
            case None => Row(r.getLong(0), null, null, null)
          }
        }
      }
    }(enc)
  }

  // ——— real JDK audio path (WAV/PCM via javax.sound.sampled) ———

  /** Deterministic synthetic 16-bit mono PCM WAV — real audio bytes. */
  def encodeWav(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    val pcm = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (TranscriptGen.mix(seed ^ i.toLong) & 0xffff).toInt - 32768
      pcm(2 * i) = (s & 0xff).toByte
      pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Batched REAL WAV decode: (sample_rate, n_frames, duration_ms, rms) per
    * payload; non-WAV bytes → null row. Same batch shape as the image path. */
  def decodeAudio(df: DataFrame, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("sample_id", LongType, nullable = false),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_frames", LongType, nullable = true),
      StructField("duration_ms", IntegerType, nullable = true),
      StructField("rms", DoubleType, nullable = true)))
    val enc = Encoders.row(outSchema)
    df.select(col("sample_id"), col("content")).mapPartitions { it =>
      it.grouped(batchSize).flatMap { rows =>
        rows.map { r =>
          val decoded =
            if (r.isNullAt(1)) None
            else try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
              val fmt = ais.getFormat
              // the RMS loop below assumes 16-bit little-endian mono PCM;
              // anything else (8-bit, stereo, big-endian, float, or a
              // crafted header with rate <= 0 / NOT_SPECIFIED) maps to a
              // null row rather than silently-wrong numbers or a division
              // by zero escaping the catch
              val ok = fmt.getSampleRate > 0 &&
                fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
                !fmt.isBigEndian &&
                fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              if (!ok) None
              else {
                val frames = ais.getFrameLength
                val bytes = ais.readAllBytes()
                var sum = 0.0
                var i = 0
                while (i + 1 < bytes.length) { // 16-bit little-endian mono
                  val s = ((bytes(i + 1).toInt << 8) | (bytes(i) & 0xff)).toShort.toDouble
                  sum += s * s
                  i += 2
                }
                val n = bytes.length / 2
                Some((fmt.getSampleRate.toInt, frames,
                  (frames * 1000 / fmt.getSampleRate.toLong).toInt,
                  if (n > 0) math.sqrt(sum / n) else 0.0))
              }
            } catch { case scala.util.control.NonFatal(_) => None }
          decoded match {
            case Some((sr, fr, ms, rms)) => Row(r.getLong(0), sr, fr, ms, rms)
            case None => Row(r.getLong(0), null, null, null, null)
          }
        }
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
