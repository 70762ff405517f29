package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the query vector and a
  * single map-only scan (no shuffle until the final TakeOrderedAndProject,
  * which moves only k rows per partition). Scale path: LSH bucketing via
  * random-hyperplane signatures (`signBits`) so candidate generation becomes
  * a bucket equi-join instead of a cross product.
  *
  * All vector math is Catalyst higher-order functions over doubles with a
  * sequential left-fold (`aggregate`), so results are deterministic and
  * bit-identical to the DuckDB `list_reduce` oracle.
  */
object Similarity {

  /** Default hot-block cap for [[nearDupPairs]] — shared with the DuckDB
    * oracle SQL so both engines skip exactly the same blocks. */
  val DefaultMaxBlock: Int = 100000

  /** Deterministic left-to-right double dot product of two float arrays
    * (HOF form — spec cross-check only; production path is the native
    * codegen'd graft.functions.CosineSim). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** HOF cosine — spec cross-check only. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity — native one-pass codegen'd expression (identical
    * sequential-fold arithmetic; see CosineSim's parity contract). */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim.cosine_sim(a, b)

  /** Brute-force cosine top-k of `df.embCol` against the single query row
    * `queryDf` (one row, one array column). Query side is broadcast; the big
    * side is never shuffled. */
  def bruteForceTopK(df: DataFrame, idCol: String, embCol: String,
                     queryDf: DataFrame, k: Int): DataFrame = {
    val q = queryDf.select(col(embCol).as("__q"))
    df.join(broadcast(q))
      .select(col(idCol), cosine(col(embCol), col("__q")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Blocked near-duplicate pairs: equi-join on a blocking key (cluster
    * label, LSH bucket, …) then exact cosine filter — the standard
    * candidate-then-verify shape that avoids the O(N²) cross product. The
    * blocking side is a plain shuffle join, so it scales with the block-size
    * distribution, not the table square — and `maxBlock` bounds the one
    * residual quadratic (a hot block of B members emits B² join rows):
    * blocks over the cap are skipped deterministically via a keyed window
    * count (same bound as Dedup.minHashLshPairs' hot buckets), with
    * truncation observable through the `embed_block_cap` query metrics. */
  def nearDupPairs(df: DataFrame, idCol: String, embCol: String, blockCol: String,
                   threshold: Double, maxBlock: Int = DefaultMaxBlock): DataFrame = {
    val wb = org.apache.spark.sql.expressions.Window.partitionBy(col("__blk"))
    val capped = df.select(col(idCol), col(blockCol).as("__blk"), col(embCol))
      .withColumn("__bn", count(lit(1)).over(wb))
      .observe("embed_block_cap",
        sum(when(col("__bn") > maxBlock, 1L).otherwise(0L)).as("rows_in_skipped_blocks"),
        max(col("__bn")).as("max_block_size"))
      .filter(col("__bn") <= maxBlock)
    val a = capped.select(col(idCol).as("id_a"), col("__blk"), col(embCol).as("__ea"))
    val b = capped.select(col(idCol).as("id_b"), col("__blk"), col(embCol).as("__eb"))
    a.join(b, "__blk")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosine(col("__ea"), col("__eb")).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** PER-QUERY top-k for a BATCH of query vectors — the multi-query shape
    * [[bruteForceTopK]]/[[ivfTopK]]/[[lshTopK]] deliberately don't blend
    * (their contract is one query row). Score corpus × broadcast(queries)
    * map-only, then ONE keyed aggregation with the native bounded-heap
    * [[graft.functions.CosTopK]] aggregate: O(k) state per buffer,
    * partial-aggregated, so each map task ships at most k entries per query
    * across the one shuffle. (A `row_number().over(partitionBy(qid))`
    * window would move all N corpus rows of each query onto one task.)
    * Ties break (cos desc, id asc) — the ROW_NUMBER oracle's order. */
  def bruteForceTopKBatch(df: DataFrame, idCol: String, embCol: String,
                          queryDf: DataFrame, qidCol: String, k: Int): DataFrame = {
    val q = queryDf.select(col(qidCol).as("__qid"), col(embCol).as("__q"))
    df.join(broadcast(q))
      .groupBy(col("__qid"))
      .agg(graft.functions.CosTopK.cos_topk(
        cosine(col(embCol), col("__q")), col(idCol).cast("long"), k).as("__top"))
      .select(col("__qid").as(qidCol), posexplode(col("__top")))
      .select(col(qidCol), (col("pos") + 1).cast("int").as("rank"),
        col("col.i").as(idCol), col("col.c").as("cos_sim"))
  }

  /** Shared batch-top-k tail: bounded-heap aggregate per query id, then
    * explode to (qid, rank, id, cos_sim). */
  private def topKPerQuery(cand: DataFrame, idCol: String, qidCol: String,
                           k: Int): DataFrame =
    cand.groupBy(col("__qid"))
      .agg(graft.functions.CosTopK.cos_topk(
        cosine(col("__emb"), col("__q")), col(idCol).cast("long"), k).as("__top"))
      .select(col("__qid").as(qidCol), posexplode(col("__top")))
      .select(col(qidCol), (col("pos") + 1).cast("int").as("rank"),
        col("col.i").as(idCol), col("col.c").as("cos_sim"))

  /** Quantization scale for the Lloyd refinement's per-dimension sums —
    * 2^20, shared bit-for-bit with the DuckDB oracle (OracleSql binds the
    * same literal). Exactness bound: per-list element sums stay exactly
    * convertible to double while `rows_per_list · 2^20 · max|x| < 2^53`
    * — ~8.6e9 unit-scale rows per inverted list; beyond that, lower the
    * scale (and regenerate the oracle) exactly as with QuantLR.quantScale. */
  val LloydQuantScale: Double = 1048576.0

  /** IVF coarse quantizer: a deterministic scramble-ordered seed sample of
    * `nlist` corpus vectors, refined by `lloydIters` k-means (Lloyd) steps.
    *
    * The refinement is CROSS-ENGINE BIT-EXACT (the reason it can sit under
    * the DuckDB hash gate): each step assigns every vector to its nearest
    * centroid with the codegen'd [[graft.functions.CosineArgMax]] projection
    * (one map-only pass, zero row amplification), then recomputes each
    * centroid as the mean of its list — with the per-dimension sums
    * QUANTIZED to int64 (`floor(x · 2^20)`) BEFORE summation, so the sums
    * are exact integers (order-independent under any partitioning) and the
    * final mean `(Σq / n) / 2^20` is the same IEEE double in both engines
    * (QuantLR's trick applied to k-means). Empty lists keep their seed
    * centroid. Returns double-precision centroids keyed by the seed ids.
    *
    * Plan shape per step: one codegen'd assignment projection + a
    * posexplode to (list, dim) keyed sums — map-side combined, so the
    * shuffle carries nlist·dim partials per task, and the collect is
    * nlist·dim tiny rows. The ×dim row amplification is a one-off quantizer
    * build cost, standard for IVF training. */
  def ivfCentroids(df: DataFrame, idCol: String, embCol: String, nlist: Int,
                   lloydIters: Int = 1): Seq[(Long, Array[Double])] = {
    val centRows = df
      .orderBy(pmod(col(idCol).cast("long") * lit(2654435761L), lit(4294967296L)), col(idCol))
      .limit(nlist)
      .select(col(idCol).cast("long"), col(embCol)).collect()
    var cents: Seq[(Long, Array[Double])] =
      centRows.map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toSeq
    for (_ <- 1 to lloydIters) {
      val sums = df
        .select(graft.functions.CosineArgMax.cosine_argmax(col(embCol), cents).as("__list"),
          posexplode(col(embCol)))
        .groupBy(col("__list"), col("pos"))
        .agg(sum(floor(col("col").cast("double") * lit(LloydQuantScale))).as("__sq"),
          count(lit(1)).as("__cnt"))
        .collect()
      val byList = sums.groupBy(_.getLong(0))
      cents = cents.map { case (cid, old) =>
        byList.get(cid) match {
          case Some(rows) =>
            val next = old.clone()
            // mean = (Σ floor(x·S) / n) / S — exact int64 sum, then two
            // correctly-rounded double divisions in the SAME order as the
            // oracle's (CAST(sq AS DOUBLE) / CAST(cnt AS DOUBLE)) / S
            rows.foreach { r =>
              next(r.getInt(1)) =
                (r.getLong(2).toDouble / r.getLong(3).toDouble) / LloydQuantScale
            }
            (cid, next)
          case None => (cid, old) // empty inverted list keeps its seed
        }
      }
    }
    cents
  }

  /** Batch IVF top-k: the corpus is assigned ONCE via the codegen'd
    * [[graft.functions.CosineArgMax]] projection over the Lloyd-refined
    * quantizer; per-query probe lists are computed DISTRIBUTED — query ×
    * broadcast(centroids) scored map-only, reduced by the same bounded-heap
    * [[graft.functions.CosTopK]] aggregate with k = nprobe (the round-4
    * driver-side probe loop and its 4,096-query cap are gone); probed
    * candidates reduce through CosTopK again (one shuffle, ≤ k entries per
    * query per map task). Candidate work is Σ_q |probed lists(q)| — exactly
    * the IVF read amplification, O(N·nprobe/nlist) per query when the table
    * is list-partitioned at ingest. Residual bound: the query SET (and its
    * |Q|·nprobe probe table) must fit a broadcast — the batch contract. */
  def ivfTopKBatch(df: DataFrame, idCol: String, embCol: String, queryDf: DataFrame,
                   qidCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
                   lloydIters: Int = 1,
                   scope: StorageScope = StorageScope.global): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // corpus projected + persisted ONCE per call: the quantizer build reads
    // it twice (seed sample, Lloyd assignment pass) and the probe read once
    // more — without the cache each pass re-scans and re-decodes the source.
    // Transient index-BUILD state (released via `scope` by the session
    // owner), not a cross-call index: every call still computes from source.
    val base = scope.retain(df.select(col(idCol), col(embCol)).persist())
    val cents = ivfCentroids(base, idCol, embCol, nlist, lloydIters)
    val centDf = cents.map { case (cid, e) => (cid, e) }.toDF("__cid", "__cemb")
    val q = queryDf.select(col(qidCol).cast("long").as("__qid"), col(embCol).as("__q"))
    // per-query nprobe nearest centroids: (cos desc, cid asc) with NaN
    // sorting greatest — CosTopK's keep-order, = the oracle's ROW_NUMBER
    // (ORDER BY qc DESC, cid)
    val probes = q.join(broadcast(centDf))
      .groupBy(col("__qid"))
      .agg(graft.functions.CosTopK.cos_topk(
        cosine(col("__q"), col("__cemb")), col("__cid"), nprobe).as("__top"))
      .select(col("__qid").as("__pqid"), explode(col("__top.i")).as("__probe"))
    val cand = base
      .withColumn("__list", graft.functions.CosineArgMax.cosine_argmax(col(embCol), cents))
      .join(broadcast(probes), col("__list") === col("__probe"))
      .join(broadcast(q), col("__pqid") === col("__qid"))
      .withColumn("__emb", col(embCol))
    topKPerQuery(cand, idCol, qidCol, k)
  }

  /** Batch LSH top-k: bucket equi-join against the broadcast query set,
    * bounded-heap reduce per query. O(N/2^bits) candidates per query when
    * the table is written bucketed by the signature. */
  def lshTopKBatch(df: DataFrame, idCol: String, embCol: String, queryDf: DataFrame,
                   qidCol: String, k: Int, bits: Int = 8, seed: Long = 42L): DataFrame = {
    val q = queryDf.select(col(qidCol).cast("long").as("__qid"), col(embCol).as("__q"),
      lshBucket(col(embCol), bits, seed).as("__qb"))
    val cand = df.withColumn("__b", lshBucket(col(embCol), bits, seed))
      .join(broadcast(q), col("__b") === col("__qb"))
      .withColumn("__emb", col(embCol))
    topKPerQuery(cand, idCol, qidCol, k)
  }

  /** Random-hyperplane (SimHash-style) signature for LSH bucketing: `bits`
    * pseudo-hyperplanes derived from a seeded deterministic weight pattern;
    * bucket id packs the sign bits. Same-bucket vectors are cosine-close with
    * high probability — candidate pairs come from a bucket equi-join.
    * Native one-pass codegen'd expression (identical arithmetic to the HOF
    * form below and the DuckDB oracle's `sqlLshBucket`). */
  def lshBucket(emb: Column, bits: Int, seed: Long): Column =
    graft.functions.LshBucket.lsh_bucket(emb, bits, seed)

  /** HOF form of [[lshBucket]] — spec cross-check only (the `bits`
    * per-plane `aggregate(transform(...))` folds are CodegenFallback and
    * re-walk the array per bit; the native expression replaced them on
    * every hot path). */
  def lshBucketHof(emb: Column, bits: Int, seed: Long): Column = {
    val sig = (0 until bits).map { b =>
      // deterministic pseudo-random hyperplane: w_i = mix(seed,b,i) mapped to ±1
      val proj = aggregate(
        transform(emb, (x, i) =>
          x.cast("double") *
            (pmod(((i + lit(1)) * lit(2654435761L) + lit(seed + b * 7919L)) * lit(40503L), lit(1000003L))
              .cast("double") / lit(500001.5) - lit(1.0))),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    sig.reduce((a, b) => a + b)
  }

  /** IVF-flat ANN top-k — the inverted-file scale path next to [[lshTopK]]:
    * a coarse quantizer of `nlist` centroids, every vector assigned to its
    * nearest centroid's inverted list, queries probing only the `nprobe`
    * nearest lists — an O(N·nprobe/nlist) candidate read instead of O(N)
    * when the table is written partitioned/bucketed by `list_id` at ingest.
    *
    * Centroids come from [[ivfCentroids]]: a deterministic scramble-ordered
    * seed sample refined by `lloydIters` bit-exact quantized Lloyd steps, so
    * the quantizer reflects the data distribution while staying
    * bit-reproducible across engines (under the DuckDB hash gate).
    * Assignment ties (equal cosine) break to the LOWEST centroid id; NaN
    * cosines sort greatest — both matching the oracle's struct-max (see
    * [[graft.functions.CosineArgMax]]).
    *
    * Plan shape: centroid selection is a TakeOrderedAndProject of nlist tiny
    * rows (collected — bounded at nlist) + the Lloyd refinement's keyed
    * sums; assignment is ONE codegen'd map-only projection (`CosineArgMax`),
    * with zero row amplification; probe selection is nlist driver-side
    * cosines (same fold — bit-identical to the oracle, NaN-greatest
    * ordering); the probe read is a codegen'd `isin` filter; the final
    * top-k is TakeOrderedAndProject.
    *
    * Contract: `queryDf` is a SINGLE query row (enforced) — per-query top-k
    * over a query batch partitions these stages by a query id instead
    * ([[ivfTopKBatch]]). EAGER: centroids and the query row are collected
    * at construction. */
  def ivfTopK(df: DataFrame, idCol: String, embCol: String, queryDf: DataFrame,
              k: Int, nlist: Int = 16, nprobe: Int = 4, lloydIters: Int = 1,
              scope: StorageScope = StorageScope.global): DataFrame = {
    // same transient per-call corpus cache as [[ivfTopKBatch]] — three
    // passes (seed sample, Lloyd assignment, probe read) share one scan
    val base = scope.retain(df.select(col(idCol), col(embCol)).persist())
    // the query-row fetch is independent of the quantizer build — overlap
    // the two jobs (guide §2.6) instead of paying their latencies in series
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    val qFut = Future { queryDf.select(col(embCol)).limit(2).collect() }
    val cents = ivfCentroids(base, idCol, embCol, nlist, lloydIters)
    val qRows = Await.result(qFut, scala.concurrent.duration.Duration.Inf)
    require(qRows.length == 1, "ivfTopK probes a single query row; got " + qRows.length)
    val qv = qRows(0).getSeq[Float](0).toArray
    // (cos desc, cid asc) with NaN sorting greatest — the oracle's
    // ORDER BY qc DESC, cid under DuckDB's NaN-greatest total order (a
    // plain sortBy(-c) would put NaN LAST: Scala's total order ranks NaN
    // above +Inf, and negation keeps it there)
    val probeIds = cents
      .map { case (cid, ce) => (graft.functions.CosineSim.cosine(qv, ce), cid) }
      .sortWith { case ((ca, ia), (cb, ib)) =>
        graft.functions.CosTopK.Buffer.worse(cb, ib, ca, ia)
      }
      .take(nprobe).map(_._2)
    val q = queryDf.select(col(embCol).as("__q"))
    base.withColumn("__list", graft.functions.CosineArgMax.cosine_argmax(col(embCol), cents))
      .filter(col("__list").isin(probeIds: _*))
      .join(broadcast(q))
      .select(col(idCol), cosine(col(embCol), col("__q")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  /** Bucketed ANN top-k: probe only the query's bucket (plus optionally
    * neighboring buckets) — at scale this turns an O(N) scan into an
    * O(N / 2^bits) bucket read when the table is written bucketed/partitioned
    * by the signature.
    *
    * Contract (as for [[bruteForceTopK]] and [[ivfTopK]]): `queryDf` is a
    * SINGLE query row — the final top-k is global, so a multi-row batch
    * would blend queries; per-query batching partitions the rank by a query
    * id instead. */
  def lshTopK(df: DataFrame, idCol: String, embCol: String,
              queryDf: DataFrame, k: Int, bits: Int = 8, seed: Long = 42L): DataFrame = {
    val q = queryDf.select(col(embCol).as("__q"), lshBucket(col(embCol), bits, seed).as("__qb"))
    df.withColumn("__b", lshBucket(col(embCol), bits, seed))
      .join(broadcast(q), col("__b") === col("__qb"))
      .select(col(idCol), cosine(col(embCol), col("__q")).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
