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
    * Scale shape: the naive form is one rank window over EVERY row — at web
    * scale that sorts the whole corpus to discard work for the (typical)
    * long tail of under-cap groups. This splits the work: a map-side-combined
    * count finds the over-cap groups (at most N/cap of them, so the set is
    * broadcastable by construction), under-cap rows pass through with a
    * broadcast anti join (no sort, no shuffle of the fact side), and only
    * over-cap groups' rows enter the rank window. The dominant cost becomes
    * proportional to the rows of over-represented groups — exactly the rows
    * the cap is about.
    */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val over = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > cap).select(col(groupCol))
    val keep = df.select(col(idCol), col(groupCol))
    val under = keep.join(broadcast(over), Seq(groupCol), "left_anti")
    val w = Window.partitionBy(col(groupCol)).orderBy(scramble(idCol), col(idCol))
    val capped = keep.join(broadcast(over), Seq(groupCol))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap).drop("__rk")
    under.unionByName(capped).select(col(idCol), col(groupCol))
  }

  /** Deterministic per-stratum rate sampling: keep a row iff
    * `scramble(id) mod 1000 < permille(stratum)`. Map-only — the filter sits
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
