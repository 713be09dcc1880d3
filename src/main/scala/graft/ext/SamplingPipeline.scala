package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-call user API for the sampling stage of a training-data pipeline —
  * the operators between curation ([[DedupPipeline]], [[CurationQueries]])
  * and the trainer: epoch ordering, source mixing, sequence packing, and
  * length bucketing. The graded queries q186-q190 are these operators'
  * oracle-checked demos; this object is the composable surface.
  *
  * Everything here is DETERMINISTIC — draws and orders derive from md5 of
  * the row's id and a caller seed, never from `rand()` — so a retried task
  * or a re-run epoch reproduces byte-identical samples (the property that
  * keeps epoch bookkeeping and resumable training honest), and nothing
  * requires a global sort: orders are expressed as sortable columns,
  * windows are keyed per shard.
  */
object SamplingPipeline {

  /** Escape a data-derived string for embedding in a SQL string literal —
    * source names and salts come from user corpora, where a quote is
    * plausible input, not programmer error. */
  private[graft] def sqlLit(s: String): String = s.replace("'", "''")

  /** Integer uniform draw in [0, 16^5) from the first 5 md5 hex digits of
    * `idCol` + salt — identical arithmetic in Spark SQL and DuckDB (both
    * have md5/substring/instr). THE single definition: the graded queries'
    * oracles and this API both build from here, so the two sides cannot
    * drift (the four-hand-maintained-copies lesson in DETERMINISM.md). */
  // private[graft]: q338's shard-rebalance arms (ops package) ride the
  // same engine-neutral md5 draw
  private[graft] def drawExpr(idCol: String, salt: String): String =
    (1 to 5).map(i =>
      s"(instr('0123456789abcdef', substring(md5(concat(cast($idCol as string), ':${sqlLit(salt)}')), $i, 1)) - 1) * ${math.pow(16, 5 - i).toLong}")
      .mkString(" + ")

  private[ext] def floorOf(w: Double): Long = math.floor(w).toLong
  private[ext] def threshOf(w: Double): Long = math.round((w - math.floor(w)) * 1048576)

  /** Per-source weight split into integer pieces as CASE expressions
    * (whole-copy floor, 16^5-scaled fractional threshold) — valid in both
    * Spark SQL and DuckDB. */
  private[ext] def weightCases(sourceCol: String, weights: Seq[(String, Double)],
                               default: Double): (String, String) = {
    def cases(f: Double => Long) = weights.sortBy(_._1)
      .map { case (s, w) => s"WHEN '${sqlLit(s)}' THEN ${f(w)}" }
      .mkString(s"CASE $sourceCol ", " ", s" ELSE ${f(default)} END")
    (cases(floorOf), cases(threshOf))
  }

  /** Ascending bucket ladder as a CASE expression, shared with oracles. */
  private[ext] def ladderExpr(tokCol: String, bounds: Seq[Long], overflow: Long): String =
    bounds.map(b => s"WHEN $tokCol <= $b THEN $b")
      .mkString("CASE ", " ", s" ELSE $overflow END")

  /** Canonical power-of-2 bucket boundaries (q190 + lengthBucket default).
    * Public: callers batching by length need the ladder to size pads. */
  val DefaultBucketBounds: Seq[Long] =
    Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L)
  val DefaultOverflowCap: Long = 4096L

  /** A deterministic epoch-order column: sorting by it yields a uniform,
    * seed-reproducible permutation (different seeds → different orders).
    * No position is materialized — at scale the ORDER is what a
    * dataloader needs (range-partition by this column and read shards in
    * key order); `q186_seeded_shuffle` grades the ranked head. */
  def epochOrder(df: DataFrame, idCol: String, seed: Int): DataFrame =
    df.withColumn("epoch_order",
      md5(concat(col(idCol).cast("string"), lit(s":$seed"))))

  /** Replicate rows to hit per-source mixture weights: weight 2.5 emits
    * 2 copies of every row plus a third for a deterministic half of them;
    * weight 0 drops the source. The fractional draw is integer-exact
    * (first 5 md5 hex digits of the id vs a 16^5-scaled threshold) and
    * salted, so different epochs can re-roll WHICH rows get the extra
    * copy without touching the expected rate. Map-only: each row decides
    * its own copy count and explodes locally — no shuffle, no join. */
  def mixtureSample(df: DataFrame, idCol: String, sourceCol: String,
                    weights: Map[String, Double],
                    defaultWeight: Double = 1.0,
                    salt: String = "mix"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0 && w <= 100),
      "mixture weights must be in [0, 100]")
    val (floorCase, threshCase) = weightCases(sourceCol, weights.toSeq, defaultWeight)
    val draw = drawExpr(idCol, salt)
    df.withColumn("__n_copies",
        expr(floorCase).cast("long") + when(expr(s"($draw)") < expr(threshCase), 1L).otherwise(0L))
      .filter(col("__n_copies") > 0)
      .withColumn("copy_idx", explode(expr("sequence(1, __n_copies)")))
      .drop("__n_copies")
  }

  /** Concat-and-chunk packing: within each `shardCol` group (documents
    * ordered by `idCol`), place every row in the fixed-`seqLen` token
    * stream — (`seq_id`, `start_off`, `n_straddles`) — via ONE prefix-sum
    * window keyed on the shard. `q188_sequence_pack` grades this layout. */
  def packSequences(df: DataFrame, idCol: String, shardCol: String,
                    tokCol: String, seqLen: Int = 2048): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum", coalesce(sum(col(tokCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"__cum DIV $seqLen"))
      .withColumn("start_off", expr(s"__cum % $seqLen"))
      .withColumn("n_straddles",
        expr(s"((__cum + $tokCol - 1) DIV $seqLen) - (__cum DIV $seqLen)"))
      .drop("__cum")
  }

  /** Tag each row with its length bucket (smallest boundary ≥ `tokCol`,
    * overflow rows get `overflowCap`) — the grouping key for padded
    * batching. Boundaries must ascend. `q190_length_buckets` grades the
    * per-bucket batch/waste accounting this feeds. */
  def lengthBucket(df: DataFrame, tokCol: String,
                   bounds: Seq[Long] = DefaultBucketBounds,
                   overflowCap: Long = DefaultOverflowCap): DataFrame = {
    require(bounds.nonEmpty && bounds == bounds.sorted && bounds.last < overflowCap,
      "bucket bounds must ascend below the overflow cap")
    df.withColumn("bucket_cap",
      expr(ladderExpr(tokCol, bounds, overflowCap)).cast("long"))
  }
}
