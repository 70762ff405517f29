package graft.gen

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.Turn

/** Deterministic synthetic transcript generator (FIXTURES.md F1).
  *
  * Fully seeded, no wall-clock: the same (seed, nConvs) always yields the same
  * Dataset[Turn], which is what lets golden fixtures and kill-and-resume tests
  * compare byte-identical output.
  *
  * Scale/skew knobs:
  *   - conversation sizes follow a Zipf-ish distribution;
  *   - `megaConvs` conversations get `megaTurns` turns each (the skew fixture —
  *     a handful of conversations holding a large share of all turns, the
  *     transcript analog of the reference's P99 "spider" users flagged at
  *     `/root/reference/Preprocess/miss_data.py:7-16`);
  *   - inter-turn gaps occasionally exceed the session threshold so
  *     sessionization boundaries land at known, reproducible turn indices.
  *
  * Generation is distributed: we parallelize over conversation ids and expand
  * each conversation's turns on the executors (never on the driver), so the
  * generator itself scales with the cluster.
  */
object TranscriptGen {

  val SessionGapSeconds: Long = 1800L // 30 min, the fixture's session threshold

  /** Deterministic 64-bit mix (splitmix64 finalizer) — stable across JVMs. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def pick[A](xs: IndexedSeq[A], h: Long): A = xs(((h % xs.size) + xs.size).toInt % xs.size)

  /** Expand one conversation deterministically from (seed, convIdx). */
  def conversation(seed: Long, convIdx: Int, nTurns: Int, baseEpochSec: Long): Seq[Turn] = {
    val convId = f"conv-$convIdx%05d"
    var t = baseEpochSec + (mix(seed ^ convIdx.toLong) & 0x3ffffL) // staggered starts
    (0 until nTurns).map { i =>
      val h = mix(seed ^ (convIdx.toLong << 24) ^ i.toLong)
      // gap: mostly 1..120s; every ~17th turn a >30min session break
      val gap = if (i == 0) 0L else if (i % 17 == 0) SessionGapSeconds + 60 + (h & 0xff) else 1 + ((h >>> 8) % 120)
      t += gap
      val role = pick(IndexedSeq("user", "assistant", "assistant", "tool"), h >>> 16)
      val tool = if (role == "tool") pick(IndexedSeq("search", "exec", "browse"), h >>> 24) else null
      // deterministic payload; length varies to drive text-length features
      val payLen = ((h >>> 32) % 40).toInt + 1
      val pay = Seq.tabulate(payLen)(j => pick(WORDS, mix(h ^ j.toLong))).mkString(" ")
      Turn(convId, i, role, s"c$convIdx:t$i:$pay", tool, new Timestamp(t * 1000L))
    }
  }

  private val WORDS: IndexedSeq[String] = IndexedSeq(
    "plan", "scan", "join", "merge", "sort", "window", "query", "state",
    "check", "parse", "token", "batch", "shuffle", "spill", "hash", "range")

  /** Zipf-ish size for conversation i, plus mega-conversation injection. */
  def sizeOf(seed: Long, i: Int, nConvs: Int, megaConvs: Int, megaTurns: Int): Int =
    if (i < megaConvs) megaTurns
    else {
      val h = mix(seed ^ (i.toLong * 7919))
      val r = ((h >>> 11).toDouble / (1L << 53).toDouble) // uniform [0,1)
      math.max(1, (4.0 / math.pow(r + 0.02, 0.7)).toInt.min(400))
    }

  /** Distributed generation: one task group per slice of conversations. */
  def turns(spark: SparkSession, seed: Long, nConvs: Int,
            megaConvs: Int = 0, megaTurns: Int = 0,
            baseEpochSec: Long = 1704067200L /* 2024-01-01 UTC */,
            partitions: Int = 32): Dataset[Turn] = {
    import spark.implicits._
    spark.sparkContext
      .parallelize(0 until nConvs, math.min(partitions, math.max(1, nConvs)))
      .flatMap(i => conversation(seed, i, sizeOf(seed, i, nConvs, megaConvs, megaTurns), baseEpochSec))
      .toDS()
  }
}
