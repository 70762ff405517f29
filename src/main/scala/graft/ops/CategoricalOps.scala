package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Categorical encoding + evaluation-fold assignment.
  *
  * Both are the reference's sklearn idioms re-expressed as deterministic,
  * distributed dataflow (no fit/transform object state):
  *   - `labelEncode` = sklearn LabelEncoder (`LR_Advanced.py:535-539`):
  *     alphabetical code assignment — a tiny distinct+rank dimension joined
  *     back broadcast;
  *   - `stratifiedFolds` = StratifiedKFold(5, shuffle, seed)
  *     (`LR_Advanced.py:610`): per-label round-robin. The reference shuffles
  *     with numpy RNG (not reproducible cross-engine), so the engine orders
  *     by a deterministic hash of the id — same stratification guarantees
  *     (each fold gets ⌈n_label/k⌉ or ⌊n_label/k⌋ rows per label), stable
  *     across runs/engines; documented deviation from seed-42 numpy order.
  */
object CategoricalOps {

  /** Adds `<col>_code`: 0-based alphabetical rank of the value.
    *
    * Scale shape (round-2 fix): the rank over the distinct dimension is a
    * [[PrefixSum]] parallel prefix (count 1 per distinct value), NOT
    * `row_number().over(Window.orderBy(c))` — the global window moved every
    * distinct value to one task and was the last `WindowExec: No Partition
    * Defined` source in the registered surface. The dimension is then
    * broadcast back onto the fact side, so `maxCardinality` guards the one
    * genuinely driver-bound step (the broadcast), failing fast instead of
    * OOMing mid-job when someone label-encodes a user-id-like column.
    * EAGER: runs two small jobs (cardinality count + prefix pass 1) at call
    * time. */
  def labelEncode(df: DataFrame, c: String, maxCardinality: Long = 1000000L): DataFrame = {
    val dim0 = df.select(col(c)).distinct()
    val card = dim0.count()
    require(card <= maxCardinality,
      s"labelEncode($c): $card distinct values exceed maxCardinality=$maxCardinality — " +
        "a dictionary that size should live in a table and join by shuffle, not broadcast")
    val dim = PrefixSum.runningSums(dim0.withColumn("__one", lit(1L)), Seq(col(c)), Seq("__one"))
      .select(col(c), (col("__one_cum") - 1).cast("int").as(s"${c}_code"))
    df.join(broadcast(dim), Seq(c))
  }

  /** Adds `fold` ∈ [0, k): per-label row_number (ordered by a Knuth
    * multiplicative scramble of the numeric id — portable arithmetic, so the
    * DuckDB oracle reproduces it exactly) mod k. */
  def stratifiedFolds(df: DataFrame, idCol: String, labelCol: String, k: Int): DataFrame = {
    val scrambled = pmod(col(idCol).cast("long") * lit(2654435761L), lit(4294967296L))
    val w = Window.partitionBy(col(labelCol)).orderBy(scrambled, col(idCol))
    df.withColumn("fold", ((row_number().over(w) - 1) % k).cast("int"))
  }
}
