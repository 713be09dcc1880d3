package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a native Catalyst
  * aggregate — the sketch twin of [[TopKAgg]], and the native form of
  * q156's window formulation.
  *
  * The declarative KMV (q156) must `distinct()` the member stream first
  * (a full shuffle of every occurrence) and then rank hashes with a
  * window. This aggregate rides partial/final ObjectHashAggregate
  * instead: each map task keeps a ≤k sorted set of distinct hash values
  * per group — DUPLICATE HASHES COLLAPSE IN THE BUFFER, so the
  * pre-aggregation distinct shuffle disappears entirely and only
  * k·groups longs cross the wire. Partial sketches merge by set-union-
  * then-truncate, the textbook KMV merge, which is exactly what the
  * final aggregation step does with map-side partials (and what a
  * streaming state store would do across micro-batches, q143-style).
  *
  * Estimator: with the hash domain [0, 2³²) (the md5 32-bit slice used
  * across graft), est = cnt below k (the sketch IS the set), else
  * (k−1)·2³² DIV kth-smallest — truncating integer, deterministic, and
  * identical to q156's oracle arithmetic. SQL: `graft_kmv(hash, k)`.
  */
case class KMVAgg(
    hashExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0,
    // [[graft.Mutations]] "q170_kmv_merge_drops_other": when true, merge
    // keeps only `buffer` and silently loses `other` — the classic
    // partial-merge defect that per-partition unit tests never hit
    // (single buffer, merge never called) and only multi-buffer paths
    // expose: map-side partials in batch, the state-store union across
    // micro-batches in streaming. Resolved ONCE at construction in
    // [[KMVAgg.kmv]]; a plain field, so executor-serialized copies and
    // `copy(...)` offset rewrites preserve it, and production plans
    // carry a constant `false` with zero per-merge cost.
    dropMergeOther: Boolean = false)
  extends TypedImperativeAggregate[KMVAgg.Sketch] with BinaryLike[Expression] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_kmv k must be an integer literal, got $other")
  }

  override def left: Expression = hashExpr
  override def right: Expression = kExpr

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (hashExpr.dataType != LongType)
      TypeCheckFailure(s"graft_kmv hash must be BIGINT, got ${hashExpr.dataType.sql}")
    else if (!kExpr.foldable ||
        !(kExpr.dataType == IntegerType || kExpr.dataType == LongType))
      TypeCheckFailure("graft_kmv k must be an integer literal")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): KMVAgg.Sketch = new KMVAgg.Sketch(k)

  override def update(buffer: KMVAgg.Sketch, input: InternalRow): KMVAgg.Sketch = {
    val h = hashExpr.eval(input)
    if (h != null) buffer.insert(h.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KMVAgg.Sketch, other: KMVAgg.Sketch): KMVAgg.Sketch = {
    if (!dropMergeOther) buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: KMVAgg.Sketch): Any = {
    val cnt = buffer.size.toLong
    val kth = buffer.kth
    val est = if (cnt < k) cnt else (k - 1).toLong * 4294967296L / kth
    new GenericInternalRow(Array[Any](cnt, kth, est))
  }

  override def serialize(buffer: KMVAgg.Sketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.k)
    out.writeInt(buffer.size)
    buffer.values.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KMVAgg.Sketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sk = new KMVAgg.Sketch(in.readInt())
    val n = in.readInt()
    var j = 0
    while (j < n) { sk.insert(in.readLong()); j += 1 }
    sk
  }

  override def dataType: DataType = KMVAgg.OutType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): KMVAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KMVAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KMVAgg =
    copy(hashExpr = newLeft, kExpr = newRight)

  override def prettyName: String = "graft_kmv"
}

object KMVAgg {
  val OutType: DataType = StructType(Seq(
    StructField("cnt", LongType, nullable = false),
    StructField("kth", LongType, nullable = false),
    StructField("est", LongType, nullable = false)))

  /** DataFrame-side entry: `kmv(hash, k)` aggregate column. The mutation
    * knob is read HERE, at plan-construction time (the [[graft.Mutations]]
    * discipline), never inside merge. */
  def kmv(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KMVAgg(ColumnBridge.expression(hash), Literal(k),
        dropMergeOther = graft.Mutations.on("q170_kmv_merge_drops_other"))
        .toAggregateExpression())

  /** Sorted set of at most k DISTINCT hash values (java.util.TreeSet:
    * dedup and truncate-largest are both O(log k); k is sketch-sized,
    * so the buffer is a few hundred bytes regardless of input scale).
    * kth = the largest retained value = the k-th smallest overall once
    * the sketch is full; 0 on an empty sketch. */
  final class Sketch(val k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def insert(h: Long): Unit = {
      set.add(h)
      if (set.size > k) { val _ = set.pollLast() }
    }

    def mergeFrom(other: Sketch): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) insert(it.next())
    }

    def size: Int = set.size
    def kth: Long = if (set.isEmpty) 0L else set.last()
    def values: Iterator[Long] = {
      val it = set.iterator()
      new Iterator[Long] {
        def hasNext: Boolean = it.hasNext
        def next(): Long = it.next()
      }
    }
  }
}
