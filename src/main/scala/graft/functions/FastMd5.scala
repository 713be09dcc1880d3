package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Thread-local-digest MD5: hex output is byte-identical to Spark's
  * built-in `md5()` (lowercase, 32 chars), but the `MessageDigest`
  * instance is allocated once per executor thread instead of once per
  * call, and the hex encoding writes straight into a byte array instead
  * of going through commons-codec's char[]→String→UTF8String chain.
  *
  * This is the hot path of MinHash shingle hashing (q41/q43/q45): at
  * 100 TB the corpus has ~10¹¹ shingles, each hashed exactly once — the
  * per-call constant factor is the dominant cost, so it gets a native
  * codegen expression (stays inside whole-stage codegen; the generated
  * code is a single static call).
  */
object FastMd5 {
  private val localDigest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val HEX: Array[Byte] = "0123456789abcdef".getBytes

  /** Static entry used by both interpreted eval and generated code. */
  def md5Hex(input: UTF8String): UTF8String = {
    val md = localDigest.get()
    val d = md.digest(input.getBytes) // digest() resets the instance
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Plain-string variant for typed paths (e.g. the MinHash Aggregator). */
  def md5HexString(s: String): String =
    md5Hex(UTF8String.fromString(s)).toString

  /** Column API: drop-in replacement for `functions.md5(e.cast(binary))`
    * on string inputs. */
  def fastMd5(c: Column): Column =
    ColumnBridge.column(FastMd5Expr(ColumnBridge.expression(c)))
}

case class FastMd5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fast_md5 requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    FastMd5.md5Hex(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastMd5.md5Hex($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
