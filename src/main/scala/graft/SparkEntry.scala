package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query (and its DuckDB oracle
  * twin) from the per-domain modules. Column names are aliased identically
  * on both sides; order-sensitive queries are totally ordered.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Manifest-style summary: per source prefix, object count / total bytes /
    * largest object — scan → project (reference scalar semantics) → agg →
    * sort in one pipeline. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Tables.documents(spark, d)
      .select(
        col("source").as("bucket_prefix"),
        concat(col("source"), lit("/"), col("doc_id").cast("string"), lit(".txt")).as("key"),
        col("n_chars").as("size"))
      .groupBy("bucket_prefix")
      .agg(count(lit(1)).as("n_objects"),
        sum(col("size")).as("total_bytes"),
        max(col("size")).as("max_bytes"))
      .orderBy("bucket_prefix")
  }

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (ops.CoreQueries.queries, ops.CoreQueries.oracles),
      (ops.RelationalQueries.queries, ops.RelationalQueries.oracles),
      (ops.EventQueries.queries, ops.EventQueries.oracles),
      (ops.MonitoringQueries.queries, ops.MonitoringQueries.oracles),
      (ops.ManifestFsQueries.queries, ops.ManifestFsQueries.oracles),
      (ops.MiscQueries.queries, ops.MiscQueries.oracles),
      (ops.SketchQueries.queries, ops.SketchQueries.oracles),
      (ext.DedupQueries.queries, ext.DedupQueries.oracles),
      (ext.DedupEvalQueries.queries, ext.DedupEvalQueries.oracles),
      (ext.SimilarityQueries.queries, ext.SimilarityQueries.oracles),
      (ext.GraphQueries.queries, ext.GraphQueries.oracles),
      (ext.TextQueries.queries, ext.TextQueries.oracles),
      (ext.Multimodal.queries, ext.Multimodal.oracles),
      (ext.PipelineQueries.queries, ext.PipelineQueries.oracles),
      (ext.SelectionQueries.queries, ext.SelectionQueries.oracles),
      (ext.CurationQueries.queries, ext.CurationQueries.oracles)
    )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._1).reduce(_ ++ _)

  /** Sum of per-module sizes — equals `queries.size` iff names are unique. */
  def moduleQueryCount: Int = modules.map(_._1.size).sum

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._2).reduce(_ ++ _)
}
