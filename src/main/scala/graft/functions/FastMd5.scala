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

  /** First 60 bits of the MD5 as a non-negative Long — numerically equal
    * to DuckDB's `('0x' || substr(md5(x), 1, 15))::BIGINT` (15 hex chars
    * = digest bytes 0..6 plus byte 7's high nibble), so it can serve as
    * a hash-graded key. Ordering by this Long IS lexicographic ordering
    * by the 15-char hex prefix. Built for q116's winnow key: an 8-byte
    * primitive key in the sorted/aggregated rows instead of a 16-char
    * hex string, with no hex-encode or substring allocation per window. */
  def md5Prefix60(input: UTF8String): Long = {
    val b = input.getBytes
    md5Prefix60Bytes(b, 0, b.length)
  }

  /** [[md5Prefix60]] over a byte RANGE — the allocation-free form for
    * callers that hash many slices of one buffer (q116's winnow hashes
    * every 40-char window of a document: [[graft.functions.Winnow]]). */
  def md5Prefix60Bytes(b: Array[Byte], off: Int, len: Int): Long = {
    val md = localDigest.get()
    md.update(b, off, len)
    val d = md.digest() // digest() resets the instance
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** Column API: drop-in replacement for `functions.md5(e.cast(binary))`
    * on string inputs. */
  def fastMd5(c: Column): Column =
    ColumnBridge.column(FastMd5Expr(ColumnBridge.expression(c)))

  /** Column API for [[md5Prefix60]]. */
  def md5Prefix60Col(c: Column): Column =
    ColumnBridge.column(Md5Prefix60Expr(ColumnBridge.expression(c)))
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

/** Codegen twin of [[FastMd5.md5Prefix60]] — LongType output. */
case class Md5Prefix60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    FastMd5.md5Prefix60(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FastMd5.md5Prefix60($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
