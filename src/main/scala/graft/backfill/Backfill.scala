package graft.backfill

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.tables.IcebergLite
import graft.tables.IcebergLite.Snapshot

/** Resumable, checkpointed feature backfill (north rule: "resumable from
  * per-partition checkpoints carrying lineage (snapshot id, partition range,
  * row counts) and emit per-partition throughput metrics").
  *
  * Unit of work = one conversation bucket of one table snapshot. Buckets are
  * independent (a conversation never crosses buckets), so they can be
  * processed in any order, retried idempotently, and distributed across
  * drivers at cluster scale. Each completed bucket commits:
  *   - its output parquet under `out/bucket=<b>/`
  *   - a checkpoint `checkpoints/bucket-<b>.json` carrying full lineage
  *     (snapshot id, bucket range, input/output row counts) + throughput.
  *
  * Commit protocol: bucket output is written with mode(overwrite) directly
  * to its final `bucket=<b>` dir, THEN the checkpoint is committed
  * atomically (tmp + ATOMIC_MOVE). The CHECKPOINT is the commit marker:
  * readers must treat a bucket dir without its checkpoint as uncommitted
  * (a crash mid-write leaves a partial dir until resume overwrites it).
  * Resume is idempotent — same snapshot + same bucket ⇒ byte-identical
  * output, guaranteed by the engine's determinism tests.
  */
object Backfill {

  final case class Checkpoint(
      snapshotId: Long, bucket: Int, buckets: Int,
      inputRows: Long, outputRows: Long, elapsedMs: Long) {
    def turnsPerSec: Double =
      if (elapsedMs == 0) 0.0 else inputRows * 1000.0 / elapsedMs
  }

  /** Injected fault for kill-and-resume tests. */
  final class InjectedCrash(bucket: Int) extends RuntimeException(s"injected crash after bucket $bucket")

  private def ckptDir(outRoot: String): Path = Paths.get(outRoot, "checkpoints")
  private def ckptPath(outRoot: String, b: Int): Path = ckptDir(outRoot).resolve(s"bucket-$b.json")

  private def ckptJson(c: Checkpoint): String =
    s"""{"snapshotId":${c.snapshotId},"bucket":${c.bucket},"buckets":${c.buckets},""" +
      s""""inputRows":${c.inputRows},"outputRows":${c.outputRows},"elapsedMs":${c.elapsedMs},""" +
      s""""turnsPerSec":${c.turnsPerSec}}"""

  private def parseCkpt(json: String): Checkpoint = {
    def f(n: String): Long =
      (s""""$n":(-?\\d+)""").r.findFirstMatchIn(json).map(_.group(1).toLong)
        .getOrElse(sys.error(s"missing $n"))
    Checkpoint(f("snapshotId"), f("bucket").toInt, f("buckets").toInt,
      f("inputRows"), f("outputRows"), f("elapsedMs"))
  }

  def completed(outRoot: String): Map[Int, Checkpoint] = {
    val d = ckptDir(outRoot)
    if (!Files.exists(d)) Map.empty
    else scala.util.Using.resource(Files.list(d)) { stream => // close: fd leak on repeated resume
      stream.iterator().asScala
        .filter(_.getFileName.toString.matches("bucket-\\d+\\.json"))
        .map(p => parseCkpt(Files.readString(p)))
        .map(c => c.bucket -> c).toMap
    }
  }

  /** Run (or resume) a backfill of `compute` over every bucket of `snap`.
    *
    * @param crashAfter if >= 0, throw InjectedCrash after that many NEW
    *                   bucket commits (kill-and-resume testing)
    * @return checkpoints for all buckets (pre-existing + newly computed)
    */
  def run(spark: SparkSession, tableRoot: String, snap: Snapshot, outRoot: String,
          compute: DataFrame => DataFrame, crashAfter: Int = -1): Seq[Checkpoint] = {
    Files.createDirectories(ckptDir(outRoot))
    val done = completed(outRoot)
    // stale checkpoints from an older snapshot are not reused
    val valid = done.filter { case (_, c) => c.snapshotId == snap.id && c.buckets == snap.buckets }
    var newCommits = 0
    val results = (0 until snap.buckets).map { b =>
      valid.get(b) match {
        case Some(c) => c
        case None =>
          if (crashAfter >= 0 && newCommits >= crashAfter) throw new InjectedCrash(b)
          val t0 = System.nanoTime()
          val in = IcebergLite.readBucket(spark, tableRoot, snap, b)
          val inputRows = snap.forBucket(b).map(_.rowCount).sum // from the manifest, free
          val outPath = s"$outRoot/bucket=$b"
          compute(in).write.mode("overwrite").parquet(outPath)
          val outputRows = spark.read.parquet(outPath).count() // footer-only count
          val elapsedMs = (System.nanoTime() - t0) / 1000000L
          val c = Checkpoint(snap.id, b, snap.buckets, inputRows, outputRows, elapsedMs)
          val tmp = ckptDir(outRoot).resolve(s".bucket-$b.tmp")
          Files.writeString(tmp, ckptJson(c))
          Files.move(tmp, ckptPath(outRoot, b),
            StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
          newCommits += 1
          c
      }
    }
    results
  }

  /** Aggregate per-partition metrics into one summary line. */
  def metricsJson(cs: Seq[Checkpoint]): String = {
    val rows = cs.map(_.inputRows).sum
    val ms = cs.map(_.elapsedMs).sum
    val per = cs.map(c => s"""{"bucket":${c.bucket},"rows":${c.inputRows},""" +
      s""""ms":${c.elapsedMs},"turnsPerSec":${c.turnsPerSec}}""").mkString("[", ",", "]")
    s"""{"buckets":${cs.size},"inputRows":$rows,"elapsedMs":$ms,""" +
      s""""turnsPerSec":${if (ms == 0) 0.0 else rows * 1000.0 / ms},"perPartition":$per}"""
  }
}
