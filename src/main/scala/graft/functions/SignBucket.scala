package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Sign-LSH bucket id: bit j of the result is the sign of
  * `emb · planes(j)`, folded left-to-right in doubles — identical
  * semantics to composing [[DotProduct]] per plane, but ONE expression for
  * the whole bucket: the plane matrix rides along as a referenced object
  * instead of 24 × 64 array literals, keeping generated code small (large
  * literal plans cost seconds of janino compilation per query).
  */
case class SignBucket(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_bucket requires array<float>, got ${other.simpleString}")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    var bucket = 0
    var j = 0
    while (j < planes.length) {
      val w = planes(j)
      val n = math.min(a.numElements(), w.length)
      var s = 0.0
      var i = 0
      while (i < n) { s += a.getFloat(i).toDouble * w(i); i += 1 }
      if (s > 0) bucket |= (1 << j)
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val s = ctx.freshName("s"); val w = ctx.freshName("w")
      val n = ctx.freshName("n"); val b = ctx.freshName("b")
      s"""
         |int $b = 0;
         |for (int $j = 0; $j < $ref.length; $j++) {
         |  double[] $w = $ref[$j];
         |  int $n = java.lang.Math.min($a.numElements(), $w.length);
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ((double) $a.getFloat($i)) * $w[$i];
         |  }
         |  if ($s > 0) $b |= (1 << $j);
         |}
         |${ev.value} = $b;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBucket {
  def apply(emb: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(SignBucket(ColumnBridge.expression(emb), planes))
}
