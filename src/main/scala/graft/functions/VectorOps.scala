package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector kernels over `ArrayType(FloatType)` embedding columns.
  *
  * All kernels are built from codegen'd higher-order functions
  * (`zip_with` + `aggregate`) — no UDFs, no Python, stays inside
  * whole-stage codegen. The fold is SEQUENTIAL (left-to-right), which makes
  * the double-precision result bit-identical to DuckDB's
  * `list_reduce(list_transform(list_zip(a,b), ...), (x,y) -> x+y)` — that is
  * what lets float kernels participate in hash-compared oracle queries
  * without decimal arithmetic in the hot path.
  */
object VectorOps {

  /** Sequential-fold dot product: Σ double(a_i) * double(b_i).
    * Backed by the codegen'd [[DotProduct]] expression; semantically equal
    * to the higher-order formulation in [[dotHof]] (asserted by tests). */
  def dotSeq(a: Column, b: Column): Column = DotProduct.dot(a, b)

  /** Reference formulation via built-in higher-order functions — same fold
    * order, interpreted evaluation; kept for differential testing. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean norm via the same sequential fold. */
  def norm(a: Column): Column = sqrt(dotSeq(a, a))

  /** Cosine similarity given precomputed norms (precompute them once per
    * vector — at 100 TB you never recompute a norm inside a pair join). */
  def cosineWithNorms(dot: Column, na: Column, nb: Column): Column =
    dot / (na * nb)

  /** Squared L2 distance via the same sequential fold (PQ codebooks use
    * L2 geometry; the square root is monotone and never needed).
    * Backed by the codegen'd [[L2Sq]] expression — the interpreted HOF
    * formulation is kept in [[l2sqHof]] for differential testing. */
  def l2sq(a: Column, b: Column): Column = L2Sq.l2sq(a, b)

  /** Reference formulation via built-in higher-order functions — same
    * fold order, interpreted evaluation; kept for differential testing. */
  def l2sqHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val diff = x.cast("double") - y.cast("double")
        diff * diff
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** DuckDB twin of [[l2sq]]. */
  def oL2sq(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), " +
      s"x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE)) * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))), " +
      s"(acc, v) -> acc + v)"

  /** DuckDB twin of [[dotSeq]] for oracle SQL. */
  def oDot(a: String, b: String): String =
    s"list_reduce(list_transform(list_zip($a, $b), x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)"

  /** DuckDB twin of [[norm]]. */
  def oNorm(a: String): String =
    s"sqrt(list_reduce(list_transform($a, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))"

  /** Deterministic pseudo-random hyperplanes for sign-LSH (random
    * projection). Component (j, i) is derived from the MD5 of "hp{j}_{i}":
    * first byte − 127.5, exactly representable in binary, so the literal
    * round-trips identically through Spark and DuckDB SQL text. Computed
    * driver-side once; embedded as literals in both plans.
    */
  def hyperplane(j: Int, dims: Int): Array[Double] = {
    val mdf = java.security.MessageDigest.getInstance("MD5")
    (0 until dims).map { i =>
      val h = mdf.digest(s"hp${j}_$i".getBytes("UTF-8"))
      (h(0) & 0xff) - 127.5
    }.toArray
  }

  /** Spark column: sign bit of `emb · hyperplane(j)` (1 or 0). */
  def signBit(emb: Column, j: Int, dims: Int): Column = {
    val w = hyperplane(j, dims)
    val planeCol = array(w.map(lit): _*)
    when(dotSeq(emb, planeCol) > 0, 1).otherwise(0)
  }

  /** DuckDB twin of [[signBit]]. */
  def oSignBit(emb: String, j: Int, dims: Int): String = {
    val w = hyperplane(j, dims).mkString("[", ", ", "]")
    s"CASE WHEN ${oDot(emb, s"$w::DOUBLE[]")} > 0 THEN 1 ELSE 0 END"
  }

  /** Pack sign bits [lo, hi) into an integer bucket id. Single
    * [[SignBucket]] expression (plane matrix as a referenced object) —
    * semantically identical to summing per-plane [[signBit]]s but without
    * the 24×64-literal codegen blowup. */
  def signBucket(emb: Column, lo: Int, hi: Int, dims: Int): Column =
    SignBucket(emb, (lo until hi).map(j => hyperplane(j, dims)).toArray)

  def oSignBucket(emb: String, lo: Int, hi: Int, dims: Int): String =
    (lo until hi).map(j => s"(${oSignBit(emb, j, dims)} * ${1 << (j - lo)})").mkString("(", " + ", ")")
}
