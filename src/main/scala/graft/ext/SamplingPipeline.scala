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
    def floorOf(w: Double) = math.floor(w).toLong
    def threshOf(w: Double) = math.round((w - math.floor(w)) * 1048576)
    val floorCase = weights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN '$s' THEN ${floorOf(w)}L" }
      .mkString(s"CASE $sourceCol ", " ", s" ELSE ${floorOf(defaultWeight)}L END")
    val threshCase = weights.toSeq.sortBy(_._1)
      .map { case (s, w) => s"WHEN '$s' THEN ${threshOf(w)}L" }
      .mkString(s"CASE $sourceCol ", " ", s" ELSE ${threshOf(defaultWeight)}L END")
    val draw = (1 to 5).map(i =>
      s"(instr('0123456789abcdef', substring(md5(concat(cast($idCol as string), ':$salt')), $i, 1)) - 1) * ${math.pow(16, 5 - i).toLong}")
      .mkString(" + ")
    df.withColumn("__n_copies",
        expr(floorCase) + when(expr(s"($draw)") < expr(threshCase), 1L).otherwise(0L))
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
                   bounds: Seq[Long] = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L),
                   overflowCap: Long = 4096L): DataFrame = {
    require(bounds.nonEmpty && bounds == bounds.sorted && bounds.last < overflowCap,
      "bucket bounds must ascend below the overflow cap")
    val ladder = bounds.map(b => s"WHEN $tokCol <= $b THEN ${b}L")
      .mkString("CASE ", " ", s" ELSE ${overflowCap}L END")
    df.withColumn("bucket_cap", expr(ladder))
  }
}
