package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextExprs

/** Corpus-shaping operators a web-scale training-data pipeline runs between
  * dedup and the final shard write: per-group document caps, deterministic
  * stratified sampling, repetition scoring, and context-window sequence
  * packing.
  *
  * All pseudo-randomness is the same portable Knuth multiplicative scramble
  * the rest of the engine uses (`(id * 2654435761) mod 2^32` — see
  * [[CategoricalOps.stratifiedFolds]]), so every operator here is
  * deterministic, partition-invariant, and bit-reproducible in the DuckDB
  * oracle. The scramble's no-overflow bound (id < 2^63 / 2654435761 ≈ 3.4e9)
  * matches the existing fold/shard operators; beyond it, switch the id to a
  * pre-hashed 32-bit column at ingest.
  */
object CorpusOps {

  private def scramble(idCol: String) =
    pmod(col(idCol).cast("long") * lit(2654435761L), lit(4294967296L))

  /** Keep at most `cap` rows per group, chosen by scrambled-id order (i.e. a
    * deterministic uniform sample of each over-cap group).
    *
    * OUTPUT CONTRACT: only `(idCol, groupCol)` survive — the cap is a
    * KEEP-SET decision, deliberately computed over the two routing columns
    * so the window/anti-join never shuffle document payloads (guide §2.3:
    * decide with small rows, move big rows once). Callers that need the full
    * documents semi-join the result back by id (one map-side-prunable join),
    * exactly like the survivor join in [[graft.ops.Curation]].
    *
    * Scale shape: the naive form is one rank window over EVERY row — at web
    * scale that sorts the whole corpus to discard work for the (typical)
    * long tail of under-cap groups. This splits the work: a map-side-combined
    * count finds the over-cap groups (at most N/cap of them), under-cap rows
    * pass through with an anti join against that set (no sort), and only
    * over-cap groups' rows enter the rank window. The dominant cost becomes
    * proportional to the rows of over-represented groups — exactly the rows
    * the cap is about.
    *
    * `broadcastOverSet = true` (default) hints both joins broadcast, which
    * keeps the fact side entirely shuffle-free — correct while the over-cap
    * group set fits an executor (N/cap is the bound: fine for per-domain
    * caps in the 10^4+ range, NOT for cap=100 at 10^12 rows, where N/cap is
    * 10^10). Pass `false` beyond that bound: the joins fall back to plain
    * equi-joins (AQE still elects broadcast when the set turns out small),
    * trading one fact-side shuffle for an unbounded build side.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, cap: Int,
      broadcastOverSet: Boolean = true): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val over0 = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap).select(col(groupCol).as("__og"))
    val over = if (broadcastOverSet) broadcast(over0) else over0
    val keep = df.select(col(idCol), col(groupCol))
    // NULL is a group too (PARTITION BY groups NULLs together), so the
    // routing joins must be null-safe: a plain equi-join would send every
    // null-key row down the pass-through branch uncapped
    val cond = col(groupCol) <=> col("__og")
    val under = keep.join(over, cond, "left_anti")
    val w = Window.partitionBy(col(groupCol)).orderBy(scramble(idCol), col(idCol))
    val capped = keep.join(over, cond).drop("__og")
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap).drop("__rk")
    under.unionByName(capped).select(col(idCol), col(groupCol))
  }

  /** Deterministic per-stratum rate sampling: keep a row iff
    * `(id * 2654435761) mod 1000 < permille(stratum)` (the Knuth multiply
    * WITHOUT the mod-2^32 reduction — 1000 ∤ 2^32, so reducing first would
    * change the kept set; the DuckDB oracle computes the same direct form).
    * Map-only — the filter sits
    * directly on the scan (no shuffle, no state), which is what makes rate
    * sampling the first stage of any 100 TB curation run. `rates` lists the
    * non-default strata (bounded, e.g. languages — the chained CASE stays
    * small); everything else keeps `defaultPermille`.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Seq[(String, Int)], defaultPermille: Int): DataFrame = {
    require(rates.size <= 64, "per-stratum rate list must be a bounded enum " +
      "(a large rate table should broadcast-join instead)")
    val rate = rates.foldLeft(lit(defaultPermille)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.filter(pmod(col(idCol).cast("long") * lit(2654435761L), lit(1000L)) < rate)
  }

  /** Per-document repetition signals (the Gopher-style quality rules):
    * token count, distinct-token count, max single-token frequency, and the
    * two derived ratios. One codegen'd pass per row via the native
    * expressions — the explode→groupBy form would shuffle every token of the
    * corpus to compute a per-row statistic.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nTok = TextExprs.token_count(col(textCol))
    val nDis = TextExprs.distinct_token_count(col(textCol))
    val top = TextExprs.top_token_freq(col(textCol))
    df.select(col(idCol), nTok.as("n_tokens"), nDis.as("n_distinct"), top.as("top_freq"),
      (nDis.cast("double") / nTok.cast("double")).as("distinct_ratio"),
      (top.cast("double") / nTok.cast("double")).as("top_token_ratio"))
  }

  /** Contiguous sequence packing: assign documents to fixed-token-budget bins
    * ("context windows") and report per-bin document and token counts.
    *
    * Documents are scattered to `nShards` shards by scrambled id, ordered
    * within each shard by the same scramble (so packing order is independent
    * of physical layout), and a bin is `floor(tokens_before / budget)` —
    * offset packing: greedy contiguous fill where a document straddling a
    * boundary belongs to the bin its first token lands in (so a bin may
    * overflow by at most one document; first-fit bin-capping is a local
    * post-pass at materialization). Each shard packs independently — the
    * window is keyed by shard, so parallelism = nShards and no global sort
    * exists; at cluster scale set nShards to a small multiple of the
    * executor-core count.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      budget: Long, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0, s"budget=$budget nShards=$nShards")
    val scr = scramble(idCol)
    val base = df.select(col(idCol),
      TextExprs.token_count(col(textCol)).cast("long").as("__tok"),
      scr.as("__scr"), pmod(scr, lit(nShards.toLong)).cast("int").as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col("__scr"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val before = sum(col("__tok")).over(w) - col("__tok")
    val packed = base.withColumn("bin",
      ((before - pmod(before, lit(budget))) / lit(budget)).cast("long"))
    packed.groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("bin_tokens"))
  }
}
