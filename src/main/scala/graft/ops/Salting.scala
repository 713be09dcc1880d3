package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys: two-phase salted aggregation.
  *
  * At 100 TB a groupBy over a power-law key (e.g. dedup hash of a boilerplate
  * page, a celebrity user_id) funnels one key's rows into one reducer.
  * Salting splits each key into `buckets` sub-keys for the partial phase so
  * the heavy key fans out across the cluster, then a cheap second aggregate
  * over (true key) combines the partials. Works for any algebraic aggregate
  * (sum/count/min/max); AQE's skew-join handling covers the join-side
  * equivalent automatically.
  */
object Salting {

  /** Salted count+sum aggregation: semantically identical to
    * `df.groupBy(key).agg(count(1), sum(value))` for any `buckets >= 1`.
    *
    * The salt is derived from the row's own columns — NOT from
    * `monotonically_increasing_id()` or `rand()`: a non-deterministic salt
    * feeding a shuffle is the classic recompute-after-fetch-failure hazard
    * (a retried map task re-salts its rows differently, so reducers see
    * partials that double-count some rows and miss others). The salt here
    * hashes the input partition id plus the key and value columns only —
    * a recomputed partition has the same id and the same rows, so retries
    * re-derive identical salts; a heavy key spreads across buckets even
    * when its rows are bit-identical (they land in many partitions); and
    * rows wide with unrelated columns (or columns `hash` rejects, like
    * maps) cost nothing extra. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
                     buckets: Int): DataFrame = {
    val partial = df
      .withColumn("__salt",
        pmod(hash(spark_partition_id(), key, value), lit(buckets)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(value).as("ps"))
    partial.groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("total"))
  }
}
