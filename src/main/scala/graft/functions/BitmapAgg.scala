package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fixed-domain bitmap aggregate — EXACT distinct counting and exact set
  * algebra over a bounded integer id space, as a native Catalyst
  * aggregate (the third TypedImperativeAggregate after [[TopKAgg]] and
  * [[KMVAgg]], and the exact counterpart to KMV's estimate).
  *
  * The declarative route to exact per-group distinct-user sets (q162's
  * bitmap arithmetic) must first `distinct()` the membership stream —
  * a full shuffle of every occurrence. This aggregate rides
  * partial/final ObjectHashAggregate: each map task ORs ids into a
  * words-array buffer, so duplicates collapse map-side and only
  * `domain/64` longs per group cross the wire — constant in the row
  * count. Partial bitmaps merge by word-wise OR, which is exactly what
  * the final step does with map-side partials (and what a streaming
  * state store would do across micro-batches).
  *
  * The id domain must be declared up front (`nBits`) and is a CONTRACT:
  * an id outside [0, nBits) fails the job loudly rather than silently
  * folding into a wrong bucket — bounded-domain ids (user ids, dense
  * dictionary codes) are the production use; unbounded domains belong
  * in [[KMVAgg]]. Output: (cnt = exact popcount, bits = the words
  * array) — downstream set algebra (intersections, Jaccard) runs on
  * `bits` with codegen'd higher-order functions, never a re-scan.
  * SQL: `graft_bitmap(id, nBits)`.
  */
case class BitmapAgg(
    idExpr: Expression,
    nBitsExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  private lazy val nBits: Int = nBitsExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_bitmap nBits must be an integer literal, got $other")
  }
  private def nWords: Int = (nBits + 63) >>> 6

  override def left: Expression = idExpr
  override def right: Expression = nBitsExpr

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (!(idExpr.dataType == LongType || idExpr.dataType == IntegerType))
      TypeCheckFailure(s"graft_bitmap id must be integral, got ${idExpr.dataType.sql}")
    else if (!nBitsExpr.foldable ||
        !(nBitsExpr.dataType == IntegerType || nBitsExpr.dataType == LongType))
      TypeCheckFailure("graft_bitmap nBits must be an integer literal")
    else {
      // the declared domain is a buffer-size contract: validate it at
      // ANALYSIS time — a negative nBits would otherwise underflow
      // nWords through the unsigned shift and allocate a huge buffer
      // per group instead of failing loudly
      // a typed NULL literal (CAST(NULL AS INT)) is foldable IntegerType
      // but evals to null — fail it here, not with a MatchError
      val n = nBitsExpr.eval(InternalRow.empty) match {
        case i: Int => i.toLong
        case l: Long => l
        case _ => return TypeCheckFailure(
          "graft_bitmap nBits must be a non-null integer literal")
      }
      if (n <= 0 || n > (1L << 30))
        TypeCheckFailure(
          s"graft_bitmap nBits must be in (0, 2^30], got $n")
      else TypeCheckSuccess
    }
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](nWords)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = idExpr.eval(input)
    if (v != null) {
      val id = v match { case i: Int => i.toLong; case l: Long => l }
      if (id < 0 || id >= nBits)
        throw new IllegalArgumentException(
          s"graft_bitmap id $id outside declared domain [0, $nBits)")
      buffer((id >>> 6).toInt) |= (1L << (id & 63))
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    var cnt = 0L
    var i = 0
    while (i < buffer.length) { cnt += java.lang.Long.bitCount(buffer(i)); i += 1 }
    new GenericInternalRow(Array[Any](cnt, new GenericArrayData(buffer.clone())))
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.length)
    buffer.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val words = new Array[Long](n)
    var i = 0
    while (i < n) { words(i) = in.readLong(); i += 1 }
    words
  }

  override def dataType: DataType = BitmapAgg.OutType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAgg =
    copy(idExpr = newLeft, nBitsExpr = newRight)

  override def prettyName: String = "graft_bitmap"
}

object BitmapAgg {
  val OutType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("bits", ArrayType(LongType, containsNull = false), nullable = false)))

  /** DataFrame-side entry: `bitmap(id, nBits)` aggregate column. */
  def bitmap(id: Column, nBits: Int): Column =
    ColumnBridge.column(
      BitmapAgg(ColumnBridge.expression(id), Literal(nBits)).toAggregateExpression())
}
