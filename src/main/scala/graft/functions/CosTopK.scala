package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Bounded-heap top-k aggregate: keeps the k (score, id) pairs with the
  * highest score (ties → lowest id) in O(k) state per aggregation buffer —
  * the scale-right per-group top-k. `groupBy(qid).agg(cos_topk(...))` gets
  * partial aggregation for free, so each map task ships AT MOST k entries
  * per group across the shuffle; a `row_number().over(partitionBy(qid))`
  * window would move every scored row of a query onto one task, and a
  * collect_list/sort/slice composition buffers a whole partition per group.
  *
  * Deterministic: (score, -id) is a TOTAL order (ids unique) under the
  * NaN-SORTS-GREATEST comparison (NaN > +Inf, NaN == NaN, ±0.0 equal), so
  * the kept set is partitioning- and merge-order-invariant even when NaN
  * scores (zero-norm embeddings) are present. Null scores/ids are skipped.
  * Output: array<struct<c:double, i:bigint>> sorted score-desc, id-asc —
  * exactly the ROW_NUMBER (score DESC, id ASC) oracle order, where both
  * DuckDB and Spark's own orderBy rank NaN FIRST on a descending sort
  * (round-4 advice: the heap used to silently drop NaN, diverging from the
  * oracle on any zero-norm vector).
  */
case class CosTopK(scoreChild: Expression, idChild: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CosTopK.Buffer] with ExpectsInputTypes {
  require(k > 0, "cos_topk needs k > 0")

  override def children: Seq[Expression] = Seq(scoreChild, idChild)
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(DoubleType, LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("c", DoubleType, nullable = false),
    StructField("i", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): CosTopK.Buffer = new CosTopK.Buffer(k)

  override def update(b: CosTopK.Buffer, input: InternalRow): CosTopK.Buffer = {
    val s = scoreChild.eval(input)
    val i = idChild.eval(input)
    if (s != null && i != null) b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: CosTopK.Buffer, o: CosTopK.Buffer): CosTopK.Buffer = {
    var j = 0
    while (j < o.size) { b.insert(o.cs(j), o.ids(j)); j += 1 }
    b
  }

  override def eval(b: CosTopK.Buffer): Any = {
    // best-first: j before l iff l is worse — the same NaN-greatest order
    // the heap keeps, so NaN scores emit at rank 1 like the oracle's
    // ORDER BY score DESC
    val order = (0 until b.size).sortWith((j, l) =>
      CosTopK.Buffer.worse(b.cs(l), b.ids(l), b.cs(j), b.ids(j)))
    new GenericArrayData(order.map { j =>
      new GenericInternalRow(Array[Any](b.cs(j), b.ids(j))): Any
    }.toArray)
  }

  override def serialize(b: CosTopK.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.size * 16)
    bb.putInt(b.size)
    var j = 0
    while (j < b.size) { bb.putDouble(b.cs(j)); bb.putLong(b.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CosTopK.Buffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val b = new CosTopK.Buffer(k)
    var j = 0
    while (j < n) { b.insert(bb.getDouble, bb.getLong); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): CosTopK = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CosTopK = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CosTopK =
    copy(scoreChild = c(0), idChild = c(1))
}

object CosTopK {

  /** Size-k min-heap keyed by (score asc, id desc): the root is the WORST
    * kept entry, evicted when a better candidate arrives. */
  final class Buffer(val k: Int) {
    val cs = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    import Buffer.worse

    private def swap(a: Int, b: Int): Unit = {
      val tc = cs(a); cs(a) = cs(b); cs(b) = tc
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftUp(start: Int): Unit = {
      var j = start
      while (j > 0 && worse(cs(j), ids(j), cs((j - 1) / 2), ids((j - 1) / 2))) {
        swap(j, (j - 1) / 2); j = (j - 1) / 2
      }
    }

    private def siftDown(): Unit = {
      var j = 0
      var done = false
      while (!done) {
        val l = 2 * j + 1
        val r = 2 * j + 2
        var m = j
        if (l < size && worse(cs(l), ids(l), cs(m), ids(m))) m = l
        if (r < size && worse(cs(r), ids(r), cs(m), ids(m))) m = r
        if (m == j) done = true else { swap(j, m); j = m }
      }
    }

    def insert(c: Double, id: Long): Unit =
      if (size < k) { cs(size) = c; ids(size) = id; size += 1; siftUp(size - 1) }
      else if (worse(cs(0), ids(0), c, id)) { cs(0) = c; ids(0) = id; siftDown() }
  }

  object Buffer {
    /** `a < b` under the NaN-greatest score order: NaN beats every finite
      * score and +Inf, NaN ties NaN, and ±0.0 compare equal (the one spot
      * where java.lang.Double.compare would diverge from SQL ordering). A
      * NaN cosine (zero-norm vector) therefore ranks FIRST, exactly like
      * `ORDER BY cos_sim DESC` in DuckDB and Spark — keeping the heap a
      * total order (merge-order-invariant) without dropping rows the oracle
      * keeps. */
    private def lessScore(a: Double, b: Double): Boolean =
      if (a.isNaN) false else b.isNaN || a < b

    /** (ca, ia) is worse than (cb, ib) under the keep-order (score, -id). */
    def worse(ca: Double, ia: Long, cb: Double, ib: Long): Boolean =
      lessScore(ca, cb) || (!lessScore(cb, ca) && ia > ib)
  }

  def cos_topk(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      CosTopK(Bridge.expression(score), Bridge.expression(id), k).toAggregateExpression())
}
