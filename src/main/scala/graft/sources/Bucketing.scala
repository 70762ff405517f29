package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table ingest — the zero-shuffle join path at 100 TB.
  *
  * A fact table written with `bucketBy(n, key)` + `sortBy(key)` is hash-
  * partitioned AND per-file sorted at REST. Joining two tables bucketed the
  * same way (same key, same n) needs no Exchange on either side: Catalyst
  * reads the bucket layout from the catalog and plans a sort-merge join
  * directly over matching bucket files. For the transcript backfill this is
  * the difference between re-shuffling 10^12 turns on every run and paying
  * the shuffle ONCE at ingest (the as-of/PIT joins all key by entity).
  *
  * Bucket count guidance at scale: n ≈ table size / target file size
  * (128-512 MB), and keep every co-joined table at the same n (or exact
  * multiples, which Spark can coalesce). BucketingSpec proves the plan
  * property: bucketed⋈bucketed carries zero Exchange nodes, while the same
  * join over plain parquet shuffles both sides.
  */
object Bucketing {

  /** Write `df` as a bucketed external table at `path`, registered under
    * `table` in the session catalog (bucket metadata lives in the catalog —
    * that is what lets the planner elide the join shuffle). */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)

  /** Hive-style partitioned layout — the OTHER rest-layout axis. Choose by
    * read pattern: `partitionBy` a low-cardinality column queries filter on
    * (date, shard, event_type) so the reader PRUNES whole directories before
    * any IO (`PartitionFilters` in the scan, vs `PushedFilters` which still
    * opens files to read footers); `bucketBy` the high-cardinality JOIN key.
    * The two compose — partition by day, bucket by entity within each day —
    * which is exactly the 10^12-turn transcript layout: backfill runs prune
    * to the partition range they own and join entity-bucketed without a
    * shuffle. Keep partition cardinality bounded (≤ ~10^4 directories):
    * partitioning by a high-cardinality key explodes the file count and
    * kills listing/planning long before query time. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)
}
