package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable MinHash signature as a typed [[Aggregator]] (the UDAF surface
  * from SURVEY §2.2). One MD5 per input string, split into 8 lanes of 4 hex
  * chars; the buffer keeps the lane-wise minimum. Lane-wise min is
  * associative + commutative, so Spark runs it as a partial aggregate on
  * the map side and merges per-partition states — no row shuffle of the
  * raw shingles beyond the groupBy key.
  *
  * Signatures from disjoint document sets can also be merged offline
  * (union semantics), which is what makes MinHash sketches usable for
  * incremental 100 TB dedup indexes.
  */
class MinHashAgg extends Aggregator[String, Array[String], Array[String]] {
  private val lanes = 8
  private val sentinel = "￿" // sorts after any hex digit

  override def zero: Array[String] = Array.fill(lanes)(sentinel)

  override def reduce(b: Array[String], shingle: String): Array[String] = {
    val h = graft.functions.FastMd5.md5HexString(shingle)
    var i = 0
    while (i < lanes) {
      val chunk = h.substring(4 * i, 4 * i + 4)
      if (chunk < b(i)) b(i) = chunk
      i += 1
    }
    b
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var i = 0
    while (i < lanes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(b: Array[String]): Array[String] = b

  override def bufferEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  override def outputEncoder: Encoder[Array[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
}
