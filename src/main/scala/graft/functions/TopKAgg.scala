package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k heap as a native Catalyst aggregate
  * (TypedImperativeAggregate) — per-group top-k WITHOUT the window sort.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY s DESC)` + filter — the
  * declarative top-k — shuffles EVERY row of every group and sorts each
  * partition fully: O(n log n) comparisons and n-row shuffle input. This
  * aggregate rides the standard partial/final hash-aggregation machinery
  * instead: each map task keeps a ≤k-element min-heap per group
  * (O(n log k)), and only k·groups heap entries cross the wire — at
  * 100 TB with k=5 that is the difference between shuffling the corpus
  * and shuffling a rounding error. This is the (b)-tier of the custom-
  * Catalyst decision list (SURVEY §7.5): an aggregate FUNCTION, not a
  * custom plan node — the plan machinery (ObjectHashAggregate, partial +
  * final) is stock Spark.
  *
  * Determinism: entries ordered by (score DESC, id ASC) under
  * `java.lang.Double.compare` total order — NaN sorts greatest, exactly
  * Spark's and DuckDB's descending-sort convention, so results are
  * partitioning-independent and oracle-comparable. Usable from SQL as
  * `graft_topk(score, id, k)` (registered by [[GraftExtensions]]).
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] with TernaryLike[Expression] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty) match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(
      s"graft_topk k must be an integer literal, got $other")
  }

  override def first: Expression = scoreExpr
  override def second: Expression = idExpr
  override def third: Expression = kExpr

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (scoreExpr.dataType != DoubleType)
      TypeCheckFailure(s"graft_topk score must be DOUBLE, got ${scoreExpr.dataType.sql}")
    else if (idExpr.dataType != LongType)
      TypeCheckFailure(s"graft_topk id must be BIGINT, got ${idExpr.dataType.sql}")
    else if (!kExpr.foldable ||
        !(kExpr.dataType == IntegerType || kExpr.dataType == LongType))
      TypeCheckFailure("graft_topk k must be an integer literal")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buffer: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKAgg.Heap, other: TopKAgg.Heap): TopKAgg.Heap = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKAgg.Heap): Any = {
    val sorted = buffer.sortedDesc
    new GenericArrayData(sorted.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })
  }

  override def serialize(buffer: TopKAgg.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buffer.entries
    out.writeInt(buffer.k)
    out.writeInt(entries.length)
    entries.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val heap = new TopKAgg.Heap(in.readInt())
    val n = in.readInt()
    var j = 0
    while (j < n) { heap.insert(in.readDouble(), in.readLong()); j += 1 }
    heap
  }

  override def dataType: DataType = TopKAgg.OutType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): TopKAgg =
    copy(scoreExpr = newFirst, idExpr = newSecond, kExpr = newThird)

  override def prettyName: String = "graft_topk"
}

object TopKAgg {
  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  /** DataFrame-side entry: `topk(score, id, k)` aggregate column. */
  def topk(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(score), ColumnBridge.expression(id),
        Literal(k)).toAggregateExpression())

  /** (score DESC, id ASC) under Double's total order (NaN greatest) —
    * the same convention as a descending SQL sort in Spark and DuckDB. */
  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  /** Min-heap of at most k (score, id) entries; the root is the WORST
    * retained entry, so a better candidate replaces it in O(log k). */
  final class Heap(val k: Int) {
    private var size = 0
    private val scores = new Array[Double](math.max(k, 1))
    private val ids = new Array[Long](math.max(k, 1))

    def insert(s0: Double, i: Long): Unit = {
      // normalize -0.0 to +0.0 (x + 0.0 is the IEEE identity except on
      // -0.0; NaN passes through): SQL comparison in both engines treats
      // the two zeros as EQUAL ties (broken by id), while Double's total
      // order would rank -0.0 below +0.0 and diverge from the window
      // formulation this aggregate claims to equal
      val s = s0 + 0.0d
      if (size < k) {
        scores(size) = s; ids(size) = i; size += 1
        siftUp(size - 1)
      } else if (k > 0 && better(s, i, scores(0), ids(0))) {
        scores(0) = s; ids(0) = i
        siftDown(0)
      }
    }

    def mergeFrom(other: Heap): Unit = {
      var j = 0
      while (j < other.size) { insert(other.scores(j), other.ids(j)); j += 1 }
    }

    def entries: Array[(Double, Long)] =
      Array.tabulate(size)(j => (scores(j), ids(j)))

    def sortedDesc: Array[(Double, Long)] = {
      val arr = entries
      scala.util.Sorting.stableSort(arr,
        (a: (Double, Long), b: (Double, Long)) => better(a._1, a._2, b._1, b._2))
      arr
    }

    // root = worst retained: heap order is "a below b if a is better"
    private def worse(j1: Int, j2: Int): Boolean =
      better(scores(j2), ids(j2), scores(j1), ids(j1))

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    private def siftUp(j0: Int): Unit = {
      var j = j0
      while (j > 0 && worse(j, (j - 1) / 2)) { swap(j, (j - 1) / 2); j = (j - 1) / 2 }
    }

    private def siftDown(j0: Int): Unit = {
      var j = j0
      var done = false
      while (!done) {
        val l = 2 * j + 1; val r = 2 * j + 2
        var m = j
        if (l < size && worse(l, m)) m = l
        if (r < size && worse(r, m)) m = r
        if (m == j) done = true else { swap(j, m); j = m }
      }
    }
  }
}
