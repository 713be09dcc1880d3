package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass winnowing selection for q116's substring dedup.
  *
  * The operator's semantics (see `DedupQueries.winnowedSubstringPairs`):
  * every 40-char window of a document is keyed by the first 60 bits of
  * its MD5; a window is a FINGERPRINT iff its key is the minimum of its
  * trailing 10-window frame OR of its leading 10-window frame — the
  * two-sided rule whose shared-run guarantee makes anchors
  * alignment-free.
  *
  * Why a native expression and not SQL machinery: the row-stream
  * formulation (explode every window → WindowExec sliding mins) pays
  * exchange/sort machinery per WINDOW, and the higher-order-function
  * formulation (transform/filter/slice/array_min) is interpreted with a
  * 10-element array allocation per position — measured 5× slower than
  * the row stream. The whole selection is a per-document scalar
  * computation, so it runs here as ONE codegen-friendly static call:
  * an O(n) monotonic-deque sliding min in each direction, zero
  * allocations per position beyond the key array, and the only
  * per-window cost is the MD5 itself (hashed straight from the text's
  * UTF-8 bytes — no substring object per window). Stays inside
  * whole-stage codegen: the generated code is a single static call,
  * like [[FastMd5]].
  *
  * Two variants share the selection:
  *  - [[Winnow.selectedKeys]] → array<long> of the DISTINCT selected
  *    60-bit keys (the production fingerprint path);
  *  - [[Winnow.selectedPositions]] → array<int> of 1-based selected
  *    window positions (the full-128-bit re-key escape path maps these
  *    through `md5(substr(text, p, 40))` so selection stays identical
  *    between digest widths).
  */
object Winnow {
  /** Window length in characters and frame length in windows — q116's
    * published constants (58-char shared-run guarantee = 19 windows). */
  val WindowLen = 40
  val FrameLen = 10

  /** DISTINCT selected fingerprint keys of `text`, in first-selection
    * order. Empty array when the text is shorter than one window. */
  def selectedKeys(text: UTF8String): ArrayData = {
    val k = windowKeys(text)
    val sel = select(k)
    val seen = new java.util.HashSet[java.lang.Long](sel.length * 2)
    val out = new Array[Long](sel.length)
    var m = 0
    var i = 0
    while (i < sel.length) {
      val v = k(sel(i))
      if (seen.add(v)) { out(m) = v; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** 1-based positions of the selected windows (NOT deduplicated — the
    * caller re-keys and dedups on its digest). */
  def selectedPositions(text: UTF8String): ArrayData = {
    val sel = select(windowKeys(text))
    val out = new Array[Int](sel.length)
    var i = 0
    while (i < sel.length) { out(i) = sel(i) + 1; i += 1 }
    new GenericArrayData(out)
  }

  /** k(i) = md5-prefix-60 of the window of [[WindowLen]] CHARS starting
    * at 0-based char i — hashed directly over the corresponding UTF-8
    * byte range (identical bytes to `substring(text, i+1, 40)`), so no
    * per-window string is ever built. */
  private def windowKeys(text: UTF8String): Array[Long] = {
    val nChars = text.numChars()
    val n = nChars - WindowLen + 1
    if (n <= 0) return Array.emptyLongArray
    val bytes = text.getBytes
    // char -> byte offset map (one scan; equals identity for ASCII).
    // The per-char advance is CLAMPED to bytes.length: malformed UTF-8
    // (a continuation sequence shorter than its lead byte declares)
    // would otherwise walk past the buffer and throw in the executor —
    // clamping degrades invalid input to truncated windows instead,
    // like the old substring() path did.
    val off = new Array[Int](nChars + 1)
    var c = 0
    var b = 0
    while (c < nChars) {
      off(c) = b
      if (b < bytes.length)
        b = math.min(b + UTF8String.numBytesForFirstByte(bytes(b)), bytes.length)
      c += 1
    }
    off(nChars) = bytes.length
    val k = new Array[Long](n)
    var i = 0
    while (i < n) {
      k(i) = FastMd5.md5Prefix60Bytes(bytes, off(i), off(i + WindowLen) - off(i))
      i += 1
    }
    k
  }

  /** 0-based indices i with k(i) == min over the trailing frame
    * [i-9, i] or the leading frame [i, i+9] (frames truncated at the
    * edges) — two O(n) monotonic-deque sliding-min passes. */
  private def select(k: Array[Long]): Array[Int] = {
    val n = k.length
    if (n == 0) return Array.emptyIntArray
    val tmin = new Array[Long](n)
    val lmin = new Array[Long](n)
    val dq = new Array[Int](n)
    var h = 0
    var t = 0
    var i = 0
    while (i < n) { // trailing: min over [i-FrameLen+1, i]
      while (t > h && k(dq(t - 1)) >= k(i)) t -= 1
      dq(t) = i; t += 1
      if (dq(h) <= i - FrameLen) h += 1
      tmin(i) = k(dq(h))
      i += 1
    }
    h = 0; t = 0; i = n - 1
    while (i >= 0) { // leading: min over [i, i+FrameLen-1]
      while (t > h && k(dq(t - 1)) >= k(i)) t -= 1
      dq(t) = i; t += 1
      if (dq(h) >= i + FrameLen) h += 1
      lmin(i) = k(dq(h))
      i -= 1
    }
    val sel = new Array[Int](n)
    var m = 0
    i = 0
    while (i < n) {
      if (k(i) == tmin(i) || k(i) == lmin(i)) { sel(m) = i; m += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(sel, m)
  }

  /** Column API for [[selectedKeys]]. */
  def selectedKeysCol(c: Column): Column =
    ColumnBridge.column(WinnowKeysExpr(ColumnBridge.expression(c)))

  /** Column API for [[selectedPositions]]. */
  def selectedPositionsCol(c: Column): Column =
    ColumnBridge.column(WinnowPositionsExpr(ColumnBridge.expression(c)))
}

/** array<long> of distinct selected winnow keys — see [[Winnow]]. */
case class WinnowKeysExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_keys requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    Winnow.selectedKeys(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.selectedKeys($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** array<int> of 1-based selected winnow positions — see [[Winnow]]. */
case class WinnowPositionsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_positions requires a string input, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    Winnow.selectedPositions(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.selectedPositions($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
