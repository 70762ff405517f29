package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** IVF coarse-quantizer assignment as a single codegen'd projection: the id
  * of the centroid with the highest cosine similarity to the row's embedding
  * (ties → lowest centroid id, matching a `max(struct(cos, -cid))`).
  *
  * This replaces the explode-shaped `df.join(broadcast(centroids)).groupBy
  * (id).agg(max(struct(...)))` assignment, which materializes N×nlist
  * pre-combine rows — fine at nlist=16, the dominant cost at a production
  * nlist of 4k-64k lists. Here the centroid table rides the expression as a
  * reference object (same mechanism as Spark's `InSet`), so assignment is
  * one map-only pass with zero row amplification; on a cluster the reference
  * objects ship once per task closure — for very large quantizers wrap the
  * arrays in a broadcast at the call site.
  *
  * Arithmetic parity: per centroid, EXACTLY the [[CosineSim]] sequential
  * fold (float→double, left-to-right, independent norms) — bit-identical to
  * the DuckDB oracle's `list_reduce` cosine, so the argmax agrees across
  * engines. Centroids are scanned in ascending-id order with a strict `>`
  * improvement test, which is what makes ties resolve to the lowest id.
  */
case class CosineArgMax(child: Expression,
                        centroidIds: Array[Long],
                        centroidEmbs: Array[Array[Float]])
    extends UnaryExpression with ExpectsInputTypes {
  require(centroidIds.nonEmpty && centroidIds.length == centroidEmbs.length,
    "CosineArgMax needs a non-empty centroid set")
  override def dataType: DataType = LongType
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(FloatType))
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(a: Any): Any =
    CosineArgMax.argmax(a.asInstanceOf[ArrayData], centroidIds, centroidEmbs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ids = ctx.addReferenceObj("centIds", centroidIds, "long[]")
    val embs = ctx.addReferenceObj("centEmbs", centroidEmbs, "float[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.CosineArgMax.argmax($c, $ids, $embs)")
  }

  override protected def withNewChildInternal(newChild: Expression): CosineArgMax =
    copy(child = newChild)
}

object CosineArgMax {

  /** Cosine of an ArrayData embedding vs a plain float[] — the same fold as
    * [[CosineSim.cosine]], with the row-side norm hoisted by the caller
    * (value-identical: the norm folds only over its own array). */
  private def dotAndNorm(a: ArrayData, b: Array[Float]): (Double, Double) = {
    val n = math.min(a.numElements(), b.length)
    var dot = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b(i).toDouble; i += 1 }
    i = 0
    while (i < b.length) { val y = b(i).toDouble; nb += y * y; i += 1 }
    (dot, nb)
  }

  def argmax(emb: ArrayData, ids: Array[Long], embs: Array[Array[Float]]): Long = {
    var na = 0.0
    var i = 0
    val an = emb.numElements()
    while (i < an) { val x = emb.getFloat(i).toDouble; na += x * x; i += 1 }
    val sna = math.sqrt(na)
    var best = Double.NegativeInfinity
    var bestId = ids(0)
    i = 0
    while (i < ids.length) {
      val (dot, nb) = dotAndNorm(emb, embs(i))
      val cos = dot / (sna * math.sqrt(nb))
      if (cos > best) { best = cos; bestId = ids(i) }
      i += 1
    }
    bestId
  }

  /** Column factory; sorts the centroid set by id ascending so the strict-`>`
    * scan resolves cosine ties to the lowest centroid id. */
  def cosine_argmax(emb: Column, centroids: Seq[(Long, Array[Float])]): Column = {
    val sorted = centroids.sortBy(_._1).toArray
    Bridge.column(CosineArgMax(Bridge.expression(emb), sorted.map(_._1), sorted.map(_._2)))
  }
}
