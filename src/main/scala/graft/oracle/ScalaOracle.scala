package graft.oracle

/** Plain-Scala (no Spark) reference interpreter of the engine semantics —
  * the dual-implementation oracle of SURVEY §5.
  *
  * Mirrors, in ordinary collections code:
  *   - the engineered feature layers (`LR_Model_train/LR_Advanced.py:394-473`)
  *   - backward as-of join semantics
  *   - gap-threshold sessionization
  *   - point-in-time running stats
  *
  * Arithmetic uses the same IEEE double expression shapes as the Spark
  * formula AST, so comparisons in tests are EXACT (==), not allclose —
  * a stronger check than the north rule demands.
  */
object ScalaOracle {

  final case class EntityStats(
      counts: Map[String, Long],           // summed per-behavior counts
      min: Map[String, Long], max: Map[String, Long], avg: Map[String, Double])

  /** The engineered layers for one entity, given the behavior quartet
    * (pv, cart, fav, buy) and its Basic-layer stats. Order + formulas match
    * FeatureLayers.formulas 1:1. */
  def features(q: Seq[String], s: EntityStats): Vector[(String, Double)] = {
    val Seq(pv, cart, fav, buy) = q
    val eps = 1e-6
    def a(p: String) = s.avg(p)
    def mn(p: String) = s.min(p).toDouble
    def mx(p: String) = s.max(p).toDouble
    val pvCount = s.counts(pv).toDouble

    val b = Vector.newBuilder[(String, Double)]
    def add(n: String, v: Double): Double = { b += (n -> v); v }

    val c2p = add(s"${cart}_to_${pv}_rate", a(cart) / (a(pv) + eps))
    val f2p = add(s"${fav}_to_${pv}_rate", a(fav) / (a(pv) + eps))
    add(s"${buy}_to_${pv}_rate", a(buy) / (a(pv) + eps))
    add(s"${buy}_to_${cart}_rate", a(buy) / (a(cart) + eps))
    add(s"${buy}_to_${fav}_rate", a(buy) / (a(fav) + eps))
    add(s"intent_to_${pv}_rate", (a(cart) + a(fav)) / (a(pv) + eps))
    add(s"${cart}_to_${pv}_count_rate", a(cart) / (pvCount + eps))
    add(s"${fav}_to_${pv}_count_rate", a(fav) / (pvCount + eps))
    add(s"${buy}_to_${pv}_count_rate", a(buy) / (pvCount + eps))
    val pvR = add(s"${pv}_range", mx(pv) - mn(pv))
    val caR = add(s"${cart}_range", mx(cart) - mn(cart))
    val faR = add(s"${fav}_range", mx(fav) - mn(fav))
    val buR = add(s"${buy}_range", mx(buy) - mn(buy))
    val pvS = add(s"${pv}_stability", pvR / (a(pv) + eps))
    val caS = add(s"${cart}_stability", caR / (a(cart) + eps))
    val faS = add(s"${fav}_stability", faR / (a(fav) + eps))
    val buS = add(s"${buy}_stability", buR / (a(buy) + eps))
    val tot = add("total_avg_activity", a(pv) + a(cart) + a(fav) + a(buy))
    add("total_max_activity", mx(pv) + mx(cart) + mx(fav) + mx(buy))
    val cartRatio = add(s"${cart}_ratio", a(cart) / (tot + eps))
    val favRatio = add(s"${fav}_ratio", a(fav) / (tot + eps))
    val pvRatio = add(s"${pv}_ratio", a(pv) / (tot + eps))
    add(s"${buy}_ratio", a(buy) / (tot + eps))
    add(s"${pv}_${cart}_interaction", a(pv) * a(cart))
    add(s"${pv}_${fav}_interaction", a(pv) * a(fav))
    add(s"${cart}_${fav}_interaction", a(cart) * a(fav))
    add(s"${cart}_${buy}_interaction", a(cart) * a(buy))
    add(s"${fav}_${buy}_interaction", a(fav) * a(buy))
    add(s"${fav}_${cart}_preference", a(fav) / (a(cart) + eps))
    add("intent_intensity", (a(cart) + a(fav)) / (a(pv) + eps))
    add("purchase_intensity", a(buy) / (a(cart) + a(fav) + eps))
    val maxEng = add("max_engagement", math.max(math.max(mx(pv), mx(cart)), mx(fav)))
    add("peak_purchase_ratio", mx(buy) / (maxEng + eps))
    add("activity_level", if (tot <= 2) 0 else if (tot <= 8) 1 else if (tot <= 20) 2 else 3)
    add("balance_score", 1 - math.abs(cartRatio - favRatio))
    add("dominance_feature", if (pvRatio > 0.7) 0 else if (cartRatio > favRatio) 1 else 2)
    add("conversion_potential", c2p + f2p - c2p * f2p)
    add("behavior_consistency", 1 / (1 + pvS + caS + faS))
    add("purchase_consistency", 1 / (1 + buS))
    b.result()
  }

  /** Backward as-of join: for each left (key, ts) return index of the latest
    * right row with right.ts <= ts (ties: greatest seq), or -1. */
  def asOf(leftTs: Seq[Long], rightTsSeq: Seq[(Long, Long)]): Seq[Int] = {
    leftTs.map { t =>
      var best = -1
      var i = 0
      while (i < rightTsSeq.size) {
        val (rt, rs) = rightTsSeq(i)
        if (rt <= t && (best < 0 || rt > rightTsSeq(best)._1 ||
          (rt == rightTsSeq(best)._1 && rs > rightTsSeq(best)._2))) best = i
        i += 1
      }
      best
    }
  }

  /** Gap sessionization: 0-based session id per position (input sorted by ts). */
  def sessionIds(tsUs: Seq[Long], gapUs: Long): Seq[Long] = {
    var sid = -1L
    var prev = Long.MinValue
    tsUs.map { t =>
      if (prev == Long.MinValue || t - prev > gapUs) sid += 1
      prev = t
      sid
    }
  }

  /** Point-in-time running (min, max, avg, cnt) per position (sorted input). */
  def runningStats(values: Seq[Long]): Seq[(Long, Long, Double, Long)] = {
    var mn = Long.MaxValue; var mx = Long.MinValue; var sum = 0L; var n = 0L
    values.map { v =>
      mn = math.min(mn, v); mx = math.max(mx, v); sum += v; n += 1
      (mn, mx, sum.toDouble / n.toDouble, n)
    }
  }
}
