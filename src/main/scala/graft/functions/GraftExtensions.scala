package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for graft's native functions.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.functions.GraftExtensions` registers at
  *    session build (the SparkSessionExtensions path);
  *  - [[GraftFunctions.register]] adds them to an existing session.
  *
  * After either, `SELECT graft_dot(a, b)` works anywhere SQL does.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftFunctions.dotFunction)
  }
}

object GraftFunctions {
  private[functions] val dotFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1)))

  /** Register graft functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val (_, info, builder) = dotFunction
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", builder, "scala_udf")
    val _ = info // ExpressionInfo used by the extensions path
  }
}
