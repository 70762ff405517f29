package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IcebergLite — a minimal Iceberg-style table format (SURVEY §7.0).
  *
  * No Iceberg runtime jar ships in this environment, so the engine implements
  * the three properties the north rule actually depends on, with the same
  * on-disk philosophy (immutable data files + JSON snapshot manifests +
  * atomic pointer swap):
  *
  *   - **snapshot isolation / lineage**: every commit produces
  *     `metadata/snapshot-<id>.json` listing the table's complete file set
  *     with per-file row counts and partition (bucket) ids; `metadata/current`
  *     is swapped atomically (tmp + ATOMIC_MOVE), so readers never observe a
  *     half-commit;
  *   - **partition pruning**: data files live under `data/s<id>/bucket=<b>/`,
  *     bucketed by a deterministic hash of the conversation id; a reader that
  *     wants bucket b opens only that bucket's files (the manifest is the
  *     index — no directory listing of the full table, which matters when the
  *     table has millions of files);
  *   - **append-only commits**: a new snapshot = parent's files + new files;
  *     data files are never rewritten.
  *
  * The interface is deliberately the minimal subset (list/read/append) that a
  * real Iceberg catalog could be dropped behind.
  */
object IcebergLite {

  final case class FileEntry(path: String, bucket: Int, rowCount: Long)
  final case class Snapshot(id: Long, parentId: Long, buckets: Int, files: Seq[FileEntry]) {
    def totalRows: Long = files.map(_.rowCount).sum
    def forBucket(b: Int): Seq[FileEntry] = files.filter(_.bucket == b)
  }

  /** Deterministic conversation→bucket assignment (also used by Backfill). */
  def bucketOf(convCol: org.apache.spark.sql.Column, buckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(convCol), lit(buckets.toLong)).cast("int")

  // --- tiny hand-rolled JSON codec (flat, controlled shape; no extra deps) ---
  private def snapshotJson(s: Snapshot): String = {
    val files = s.files.map(f =>
      s"""{"path":"${f.path}","bucket":${f.bucket},"rowCount":${f.rowCount}}""").mkString("[", ",", "]")
    s"""{"id":${s.id},"parentId":${s.parentId},"buckets":${s.buckets},"files":$files}"""
  }

  private def parseSnapshot(json: String): Snapshot = {
    def longField(src: String, name: String): Long = {
      val m = (s""""$name":(-?\\d+)""").r.findFirstMatchIn(src)
      m.map(_.group(1).toLong).getOrElse(sys.error(s"missing $name in manifest"))
    }
    val fileRe = """\{"path":"([^"]+)","bucket":(\d+),"rowCount":(\d+)\}""".r
    val files = fileRe.findAllMatchIn(json).map(m =>
      FileEntry(m.group(1), m.group(2).toInt, m.group(3).toLong)).toSeq
    // strip the files array before reading top-level ids
    val head = json.substring(0, json.indexOf("\"files\""))
    Snapshot(longField(head, "id"), longField(head, "parentId"),
      longField(head, "buckets").toInt, files)
  }

  private def metaDir(root: String): Path = Paths.get(root, "metadata")

  def currentSnapshotId(root: String): Option[Long] = {
    val p = metaDir(root).resolve("current")
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  def readSnapshot(root: String, id: Long): Snapshot =
    parseSnapshot(Files.readString(metaDir(root).resolve(s"snapshot-$id.json")))

  def currentSnapshot(root: String): Option[Snapshot] =
    currentSnapshotId(root).map(readSnapshot(root, _))

  def listSnapshots(root: String): Seq[Long] = {
    val d = metaDir(root)
    if (!Files.exists(d)) Seq.empty
    else scala.util.Using.resource(Files.list(d)) { stream => // close: fd leak on repeated calls
      stream.iterator().asScala.map(_.getFileName.toString)
        .collect { case s if s.startsWith("snapshot-") =>
          s.stripPrefix("snapshot-").stripSuffix(".json").toLong }
        .toSeq.sorted
    }
  }

  /** Append `df` (which must carry `convCol`) as a new snapshot, bucketed by
    * hash(convCol) % buckets. Returns the committed snapshot. */
  def append(spark: SparkSession, root: String, df: DataFrame, convCol: String,
             buckets: Int): Snapshot = {
    val parent = currentSnapshot(root)
    require(parent.forall(_.buckets == buckets),
      s"bucket count mismatch: table has ${parent.map(_.buckets)}, append wants $buckets")
    val newId = parent.map(_.id + 1).getOrElse(0L)
    val dataDir = s"$root/data/s$newId"
    df.withColumn("__bucket", bucketOf(col(convCol), buckets))
      .repartition(buckets, col("__bucket"))
      .write.partitionBy("__bucket").mode("overwrite").parquet(dataDir)

    // per-file row counts in ONE metadata-cheap job (count per input file),
    // not one Spark job per file
    val newFiles = spark.read.parquet(dataDir)
      .groupBy(input_file_name().as("path"), col("__bucket").as("bucket"))
      .count().collect()
      .map(r => FileEntry(r.getString(0), r.getInt(1), r.getLong(2)))
      .sortBy(f => (f.bucket, f.path)).toSeq
    val snap = Snapshot(newId, parent.map(_.id).getOrElse(-1L), buckets,
      parent.map(_.files).getOrElse(Seq.empty) ++ newFiles)
    commit(root, snap)
    snap
  }

  /** Atomic manifest commit: write tmp, ATOMIC_MOVE the `current` pointer. */
  private def commit(root: String, s: Snapshot): Unit = {
    val dir = metaDir(root)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(s"snapshot-${s.id}.json"), snapshotJson(s))
    val tmp = dir.resolve(s".current.tmp-${s.id}")
    Files.writeString(tmp, s.id.toString)
    Files.move(tmp, dir.resolve("current"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read one bucket of a snapshot (partition-pruned: only that bucket's
    * files are opened). The `__bucket` partition column is not re-derived —
    * file paths come from the manifest. */
  def readBucket(spark: SparkSession, root: String, snap: Snapshot, bucket: Int): DataFrame = {
    val files = snap.forBucket(bucket).map(_.path)
    if (files.nonEmpty) spark.read.parquet(files: _*)
    else if (snap.files.nonEmpty)
      // empty bucket: preserve the table schema (read zero rows of any file)
      spark.read.parquet(snap.files.head.path).limit(0)
    else spark.emptyDataFrame
  }

  /** Read the full table at a snapshot. */
  def read(spark: SparkSession, root: String, snap: Snapshot): DataFrame =
    spark.read.parquet(snap.files.map(_.path): _*)
}
