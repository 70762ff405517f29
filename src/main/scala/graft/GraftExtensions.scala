package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.TokHash

/** SparkSessionExtensions entry point — makes the engine's native functions
  * available to plain SQL users:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *   spark.sql("SELECT tok_hash(text) FROM docs")
  *
  * For an already-built session (tests, notebooks) use
  * [[GraftFunctions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.tokHashDescriptor)
    // the native as-of join operator (logical node -> physical merge exec)
    e.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
  }
}

object GraftFunctions {
  private[graft] val tokHashDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("tok_hash"),
    new ExpressionInfo(classOf[TokHash].getName, "tok_hash"),
    (exprs: Seq[Expression]) => TokHash(exprs.head))

  /** Runtime registration into an existing session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tok_hash", exprs => TokHash(exprs.head), "scala_udf")
}
