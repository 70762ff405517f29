package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two array embeddings as a native codegen'd
  * expression — replaces the higher-order-function composition
  * (`aggregate(zip_with(...))`) which is CodegenFallback and allocates an
  * intermediate array per row pair (the dominant cost of blocked near-dup
  * search, q_embed_similar: 3.6 s → sub-second at sf0.1).
  *
  * Arithmetic parity contract: EXACTLY the sequential left-fold the HOF form
  * and the DuckDB oracle (`OracleSql.sqlCosine`: `list_reduce(list_transform
  * (...), (x,y) -> x+y)`) compute — per element, float→double cast (a no-op
  * for double inputs) then multiply, accumulated left-to-right; final
  * `dot / (sqrt(na) * sqrt(nb))`. Same expression tree ⇒ bit-identical
  * doubles ⇒ the oracle hash compare still holds. Returns null if either
  * array is null (nullIntolerant).
  *
  * Each side independently accepts `array<float>` (stored embeddings) or
  * `array<double>` (Lloyd-refined centroids, derived feature vectors);
  * anything else fails at analysis time — without the check a mistyped
  * column would silently return garbage similarities.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(
    Bridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)),
    Bridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)))
  override def nullIntolerant: Boolean = true

  private lazy val leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  protected override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], leftIsFloat,
      b.asInstanceOf[ArrayData], rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.CosineSim.cosine($a, $leftIsFloat, $b, $rightIsFloat)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {

  @inline private def elem(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      dot += elem(a, aFloat, i) * elem(b, bFloat, i)
      i += 1
    }
    // norms fold over each array's own full length (mirrors the HOF form,
    // where norm(a) is independent of b)
    i = 0
    val an = a.numElements()
    while (i < an) { val x = elem(a, aFloat, i); na += x * x; i += 1 }
    i = 0
    val bn = b.numElements()
    while (i < bn) { val y = elem(b, bFloat, i); nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Float-float ArrayData form (kept for generated-code compatibility). */
  def cosine(a: ArrayData, b: ArrayData): Double = cosine(a, aFloat = true, b, bFloat = true)

  /** Driver-side twin of the expression fold (float→double, left-to-right,
    * independent norms) — used for bounded scalar work like IVF probe
    * selection; bit-identical to the expression and the DuckDB oracle. */
  def cosine(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    i = 0
    while (i < a.length) { val x = a(i).toDouble; na += x * x; i += 1 }
    i = 0
    while (i < b.length) { val y = b(i).toDouble; nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Driver-side mixed form: float query vs double (Lloyd-refined) centroid. */
  def cosine(a: Array[Float], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) { dot += a(i).toDouble * b(i); i += 1 }
    i = 0
    while (i < a.length) { val x = a(i).toDouble; na += x * x; i += 1 }
    i = 0
    while (i < b.length) { val y = b(i); nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
}
