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
    * `df.groupBy(key).agg(count(1), sum(value))` for any `buckets >= 1`. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
                     buckets: Int): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(buckets)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("pn"), sum(value).as("ps"))
    partial.groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("total"))
  }
}
