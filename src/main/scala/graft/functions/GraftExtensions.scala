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
    e.injectFunction(GraftFunctions.fastMd5Function)
    e.injectFunction(GraftFunctions.topKFunction)
    e.injectFunction(GraftFunctions.kmvFunction)
    e.injectFunction(GraftFunctions.bitmapFunction)
  }
}

object GraftFunctions {
  private[functions] val dotFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1)))

  private[functions] val fastMd5Function
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_fast_md5"),
    new ExpressionInfo(classOf[FastMd5Expr].getName, "graft_fast_md5"),
    (exprs: Seq[Expression]) => FastMd5Expr(exprs.head))

  private[functions] val topKFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_topk"),
    new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 3,
        s"graft_topk(score, id, k) takes 3 arguments, got ${exprs.length}")
      TopKAgg(exprs.head, exprs(1), exprs(2)).toAggregateExpression()
    })

  private[functions] val kmvFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_kmv"),
    new ExpressionInfo(classOf[KMVAgg].getName, "graft_kmv"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"graft_kmv(hash, k) takes 2 arguments, got ${exprs.length}")
      KMVAgg(exprs.head, exprs(1)).toAggregateExpression()
    })

  private[functions] val bitmapFunction
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_bitmap"),
    new ExpressionInfo(classOf[BitmapAgg].getName, "graft_bitmap"),
    (exprs: Seq[Expression]) => {
      require(exprs.length == 2,
        s"graft_bitmap(id, nBits) takes 2 arguments, got ${exprs.length}")
      BitmapAgg(exprs.head, exprs(1)).toAggregateExpression()
    })

  /** Register graft functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    Seq(dotFunction, fastMd5Function, topKFunction, kmvFunction,
        bitmapFunction).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "scala_udf")
      val _ = info // ExpressionInfo used by the extensions path
    }
  }
}
