package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-core queries: the reference's data model and scalar semantics
  * (reference `/root/reference/src/main.rs:135-145` schema;
  * `src/main.rs:361-390` row construction) re-expressed as Catalyst
  * expressions over the `documents` table, so every rule has a DuckDB
  * oracle twin.
  *
  *  - FileName = substring after the LAST delimiter occurrence
  *    (`key.rsplit(delimiter).next()`, src/main.rs:376-377)
  *    → `substring_index(key, delim, -1)`.
  *  - Missing Key → "" , missing Size → 0 (src/main.rs:373, 379).
  *  - Unparseable LastModified → epoch 0 (src/main.rs:381-387).
  *  - Prefix predicate re-check (`starts_with`, src/main.rs:210-219).
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Synthetic object key derived from deterministic columns — gives the
    * manifest scalar rules a SQL-expressible input at any scale factor. */
  private def keyCol = concat(
    col("source"), lit("/"), col("lang"), lit("/"),
    col("doc_id").cast("string"), lit(".txt"))

  private val keySql =
    "source || '/' || lang || '/' || CAST(doc_id AS VARCHAR) || '.txt'"

  def queries: Map[String, Q] = Map(
    "q01_manifest_project" -> ((s, d) => {
      Tables.documents(s, d)
        .select(
          lit("graft-test").as("Bucket"),
          keyCol.as("Key"),
          substring_index(keyCol, "/", -1).as("FileName"),
          col("n_chars").as("Size"))
        .orderBy("Key")
    }),

    "q02_prefix_filter" -> ((s, d) => {
      // Key = source || '/' || …, so Key LIKE 'src1%' ⟺ source LIKE 'src1%'
      // ('src1' contains no delimiter). The source-column predicate is the
      // one Catalyst can push into the parquet scan; the Key predicate
      // stays as the defensive re-check (reference src/main.rs:210-219).
      Tables.documents(s, d)
        .filter(col("source").startsWith("src1"))
        .select(keyCol.as("Key"), col("n_chars").as("Size"))
        .filter(col("Key").startsWith("src1"))
        .orderBy("Key")
    }),

    "q03_null_defaults" -> ((s, d) => {
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          coalesce(nullif(col("source"), lit("src0")), lit("")).as("key_fixed"),
          coalesce(when(col("n_chars") > 300, col("n_chars")), lit(0L)).as("size_fixed"),
          coalesce(
            try_to_timestamp(
              when(col("doc_id") % 3 === 0, lit("2024-01-02 03:04:05"))
                .otherwise(lit("not a ts"))),
            lit("1970-01-01 00:00:00").cast("timestamp")).as("ts_fixed"))
        .orderBy("doc_id")
    }),

    "q04_filename_edge" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          substring_index(col("p_name"), " ", -1).as("last_word"),
          substring_index(col("p_brand"), "/", -1).as("no_delim"),
          substring_index(col("p_brand"), "nd#", -1).as("multi_delim"))
        .orderBy("p_partkey")
    })
  )

  def oracles: Map[String, String] = Map(
    "q01_manifest_project" ->
      s"""SELECT 'graft-test' AS Bucket, $keySql AS Key,
          str_split($keySql, '/')[-1] AS FileName, n_chars AS Size
          FROM documents ORDER BY Key""",

    "q02_prefix_filter" ->
      s"""SELECT $keySql AS Key, n_chars AS Size FROM documents
          WHERE $keySql LIKE 'src1%' ORDER BY Key""",

    "q03_null_defaults" ->
      """SELECT doc_id,
          COALESCE(NULLIF(source, 'src0'), '') AS key_fixed,
          COALESCE(CASE WHEN n_chars > 300 THEN n_chars END, 0) AS size_fixed,
          COALESCE(TRY_CAST(CASE WHEN doc_id % 3 = 0 THEN '2024-01-02 03:04:05'
                                 ELSE 'not a ts' END AS TIMESTAMP),
                   TIMESTAMP '1970-01-01 00:00:00') AS ts_fixed
          FROM documents ORDER BY doc_id""",

    "q04_filename_edge" ->
      """SELECT p_partkey,
          str_split(p_name, ' ')[-1] AS last_word,
          str_split(p_brand, '/')[-1] AS no_delim,
          str_split(p_brand, 'nd#')[-1] AS multi_delim
          FROM part ORDER BY p_partkey"""
  )
}
