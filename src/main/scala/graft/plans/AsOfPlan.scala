package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The as-of join as a FIRST-CLASS Catalyst operator: a logical node, a
  * planner strategy, and a physical merge exec.
  *
  * Why a physical plan and not the Dataset-level `AsOfJoin.merged`: merged
  * builds its shuffle+sort by hand and crosses an `internalCreateDataFrame`
  * RDD boundary, so EXPLAIN shows an opaque scan, AQE cannot re-plan around
  * it, and Catalyst cannot push projections/filters through it. Here the
  * physical node just DECLARES what it needs —
  *
  *   requiredChildDistribution: both children clustered by the join key;
  *   requiredChildOrdering:     (key, ts[, seq]) ascending
  *
  * — and EnsureRequirements inserts the exchanges and sorts, exactly as for
  * SortMergeJoin. The merge itself is the same single-pass last-seen-payload
  * sweep as `AsOfJoin.merged` (one sequential pass per co-partition; work
  * proportional to partition size). The right-side (key, ts) dedup falls out
  * of the sort for free: ordering by (key, ts, seq) means the LAST row seen
  * for a (key, ts) group has the greatest seq — the documented tiebreak —
  * and simply overwrites the carried payload.
  *
  * Semantics (property-tested identical to the other variants in
  * AsOfJoinSpec): for each left row, the payload of the latest right row
  * with the same key and right.ts <= left.ts; null if none; null keys form
  * one group (Window.partitionBy semantics, NOT SQL equi-join nulls).
  *
  * Skew: ClusteredDistribution keeps a key inside one partition, so a
  * mega-key lands on one task — same trade as SortMergeJoin. For keys that
  * dominate partitions, use [[graft.ops.AsOfJoin.mergedScalable]] (range
  * partitioning + boundary stitching), which stays the documented skew path.
  */
object AsOfPlan {

  /** Idempotently add the strategy to an existing session (sessions built
    * with `spark.sql.extensions=graft.GraftExtensions` get it injected). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraStrategies.contains(AsOfStrategy))
      em.extraStrategies = AsOfStrategy +: em.extraStrategies
  }

  /** Build the as-of join DataFrame over the custom logical node. */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               rightSeq: String, payload: Seq[String], prefix: String = "asof_"): DataFrame = {
    val spark = left.sparkSession
    // same fail-fast contracts as the Dataset-level variants: whitelisted
    // key types (InternalRow equals-comparison soundness) and long-backed
    // timestamps (the merge compares raw micros)
    graft.ops.AsOfJoin.requireKeyType(left, key, "planned")
    Seq(left.schema(ts).dataType, right.schema(ts).dataType).foreach { dt =>
      require(dt == org.apache.spark.sql.types.TimestampType ||
        dt == org.apache.spark.sql.types.TimestampNTZType ||
        dt == org.apache.spark.sql.types.LongType,
        s"AsOfPlan.asOfJoin: ts must be timestamp/long (internally long micros), got $dt")
    }
    ensureRegistered(spark)
    val rProj = right.select((Seq(key, ts, rightSeq) ++ payload).distinct.map(col): _*)
    val lPlan = left.queryExecution.analyzed
    // fresh ExprIds on the right side: left and right frequently derive from
    // the SAME base table (self as-of), and a binary node with duplicate
    // attribute ids across children is ambiguous (the analyzer dedups only
    // built-in Join nodes)
    val rAnalyzed = rProj.queryExecution.analyzed
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan = Project(rAliases, rAnalyzed)
    def lAttr(n: String) = lPlan.output.find(_.name == n)
      .getOrElse(sys.error(s"asOfJoin: left column $n missing"))
    def rAttr(n: String) = rAliases.find(_.name == n)
      .getOrElse(sys.error(s"asOfJoin: right column $n missing")).toAttribute
    val payAttrs = payload.map(rAttr)
    val outPay = payAttrs.map(a =>
      AttributeReference(s"$prefix${a.name}", a.dataType, nullable = true)())
    val node = AsOfJoinNode(lPlan, rPlan, lAttr(key), rAttr(key),
      lAttr(ts), rAttr(ts), rAttr(rightSeq), payAttrs, outPay)
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark, node)
  }
}

/** Logical as-of join: output = left columns ++ freshly-minted prefixed
  * payload attributes (producedAttributes, so resolution passes). */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute, rightSeq: Attribute,
    payload: Seq[Attribute],
    outPayload: Seq[AttributeReference]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ outPayload
  override def producedAttributes: AttributeSet = AttributeSet(outPayload)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans AsOfJoinNode → AsOfMergeExec (children via planLater). */
object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lts, rts, rseq, pay, outPay) =>
      AsOfMergeExec(lk, rk, lts, rts, rseq, pay, outPay, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical single-pass merge over co-partitioned, co-sorted children. */
case class AsOfMergeExec(
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute, rightSeq: Attribute,
    payload: Seq[Attribute], outPayload: Seq[AttributeReference],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ outPayload
  override def producedAttributes: AttributeSet = AttributeSet(outPayload)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightSeq, Ascending)))

  // rows are emitted in left order, one per left row
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  protected override def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val nPay = payload.size
    val outSchema = StructType(output.map(a => StructField(a.name, a.dataType, a.nullable)))
    val lKeyB = BindReferences.bindReference(leftKey: Expression, lOut)
    val lTsB = BindReferences.bindReference(leftTs: Expression, lOut)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, rOut)
    val rTsB = BindReferences.bindReference(rightTs: Expression, rOut)
    val payB = payload.map(p => BindReferences.bindReference(p: Expression, rOut))

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val payProj = GenerateUnsafeProjection.generate(payB)
      val outProj = UnsafeProjection.create(outSchema)
      val joined = new JoinedRow
      val nullPay = new GenericInternalRow(nPay)
      val rBuf = rIt.buffered
      var lastPay: InternalRow = null
      var lastKey: Any = null
      var haveLast = false
      // nulls-first three-way compare (SortOrder Ascending default)
      def cmp(a: Any, b: Any): Int =
        if (a == null && b == null) 0
        else if (a == null) -1
        else if (b == null) 1
        else keyOrd.compare(a, b)
      def tsOf(e: Expression, row: InternalRow): Long = {
        val v = e.eval(row)
        if (v == null) Long.MinValue else v.asInstanceOf[Long] // nulls sort first
      }
      lIt.map { l =>
        val lk = lKeyB.eval(l)
        val lt = tsOf(lTsB, l)
        var scanning = true
        while (scanning && rBuf.hasNext) {
          val r = rBuf.head
          val rk = rKeyB.eval(r)
          val c = cmp(rk, lk)
          if (c < 0 || (c == 0 && tsOf(rTsB, r) <= lt)) {
            lastPay = payProj(r).copy()
            lastKey = rk match {
              case u: UTF8String => u.clone() // buffer-backed; retain a copy
              case other => other
            }
            haveLast = true
            rBuf.next()
          } else scanning = false
        }
        val pay = if (haveLast && cmp(lastKey, lk) == 0) lastPay else nullPay
        outProj(joined(l, pay)): InternalRow
      }
    }
  }
}
