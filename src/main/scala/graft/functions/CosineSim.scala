package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two float-array embeddings as a native codegen'd
  * expression — replaces the higher-order-function composition
  * (`aggregate(zip_with(...))`) which is CodegenFallback and allocates an
  * intermediate array per row pair (the dominant cost of blocked near-dup
  * search, q_embed_similar: 3.6 s → sub-second at sf0.1).
  *
  * Arithmetic parity contract: EXACTLY the sequential left-fold the HOF form
  * and the DuckDB oracle (`OracleSql.sqlCosine`: `list_reduce(list_transform
  * (...), (x,y) -> x+y)`) compute — per element, float→double cast then
  * multiply, accumulated left-to-right; final `dot / (sqrt(na) * sqrt(nb))`.
  * Same expression tree ⇒ bit-identical doubles ⇒ the oracle hash compare
  * still holds. Returns null if either array is null (nullIntolerant).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  // eval reads elements with ArrayData.getFloat, so anything but array<float>
  // (e.g. an array<double> embedding column) must fail at ANALYSIS time —
  // without this it would silently return garbage similarities
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def nullIntolerant: Boolean = true

  protected override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.CosineSim.cosine($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      i += 1
    }
    // norms fold over each array's own full length (mirrors the HOF form,
    // where norm(a) is independent of b)
    i = 0
    val an = a.numElements()
    while (i < an) { val x = a.getFloat(i).toDouble; na += x * x; i += 1 }
    i = 0
    val bn = b.numElements()
    while (i < bn) { val y = b.getFloat(i).toDouble; nb += y * y; i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

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

  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSim(Bridge.expression(a), Bridge.expression(b)))
}
