package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-facing dedup API — what a pipeline actually calls: give it a corpus,
  * get back the deduplicated corpus. Composes the verified building blocks
  * (exact hash grouping; MinHash banding → Jaccard verification → survivor
  * selection) from [[DedupQueries]]' operators.
  *
  * Survivor policy: keep the smallest id per duplicate cluster. Near-dup
  * clustering is edge-based: a doc is dropped if it has a verified
  * near-dup with a SMALLER id (union-find-free, one pass, deterministic —
  * the standard choice at 100 TB where transitive closure is a separate
  * offline job).
  */
object DedupPipeline {

  /** Drop exact duplicates of `textCol`, keeping the row with min `idCol`
    * per distinct text. One hash shuffle, no text comparison. */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Edge-based survivor policy shared by every dedup entry point: given
    * verified duplicate pairs with id1 < id2, every id2 (the larger id of
    * some verified pair) is dropped. One place to fix the policy. */
  private def dropLosers(df: DataFrame, idCol: String,
                         pairs: DataFrame): DataFrame = {
    val losers = pairs.select(col("id2").as("__loser")).distinct()
    df.join(losers, df(idCol) === losers("__loser"), "left_anti")
  }

  /** Drop near-duplicates: MinHash-band candidates, exact shingle-Jaccard
    * verification at `threshold`, survivors keep the smallest id. */
  def nearDedup(df: DataFrame, idCol: String, textCol: String,
                threshold: Double = 0.9): DataFrame = {
    val corpus = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    dropLosers(df, idCol,
      jaccardOnCandidates(corpus).filter(col("jaccard") >= threshold))
  }

  /** Drop near-duplicates by CLUSTER: LSH candidates VERIFIED at
    * `threshold` exact Jaccard become edges, connected components collapse
    * each cluster onto its smallest id. Unlike [[nearDedup]]'s edge policy
    * this takes the transitive closure (a~b, b~c ⇒ a,b,c one cluster even
    * if a≁c directly). Verification matters: an unverified band collision
    * would silently delete a genuinely distinct document. */
  def clusterDedup(df: DataFrame, idCol: String, textCol: String,
                   threshold: Double = 0.9): DataFrame = {
    val corpus = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    val edges = jaccardOnCandidates(corpus)
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2")
    val comps = GraphOps.connectedComponents(
      edges, corpus.select(col("doc_id").as("id")))
    dropLosers(df, idCol, comps.filter(col("id") =!= col("comp"))
      .select(col("comp").as("id1"), col("id").as("id2")))
  }

  /** EXACT set-similarity self-join: every pair with 3-word-shingle
    * Jaccard ≥ tNum/tDen, by PPJoin prefix filtering — recall AND
    * precision 1.0, the lossless alternative to the banded
    * [[jaccardOnCandidates]] when probabilistic misses are not
    * acceptable (legal dedup, contamination audits). Cost grows as the
    * threshold drops; below ~1/2 prefer the LSH path. Expects
    * (doc_id, text); returns (id1, id2, inter, union_sz, jacc_bp). */
  def exactJaccardJoin(corpus: DataFrame,
                       tNum: Int = 3, tDen: Int = 5): DataFrame =
    DedupQueries.prefixJaccardPairs(corpus, tNum, tDen)

  /** Candidate pairs (MinHash LSH bands) with exact Jaccard — exposed for
    * reporting/threshold tuning. Expects columns (doc_id, text). */
  def jaccardOnCandidates(corpus: DataFrame): DataFrame = {
    val pairs = DedupQueries.candidatePairsOf(DedupQueries.shinglesRawOf(corpus))
    DedupQueries.jaccardOf(pairs, DedupQueries.shinglesOf(corpus))
  }

  /** Drop SEMANTIC duplicates over an embedding column: sign-LSH banded
    * candidates (q107's machinery), exact cosine ≥ `threshold`, survivors
    * keep the smallest id. Expects `idCol` orderable and `embCol` an
    * Array[Float]. Edge-based survivor policy, like [[nearDedup]].
    *
    * Zero-norm embeddings (failed embedding calls padded with zeros)
    * yield NaN cosine, and both Spark and DuckDB order NaN above every
    * number — without a guard a zero vector would "duplicate" everything
    * in its bucket; NaN pairs are excluded, zero vectors always survive.
    *
    * `maxBucket`: a hyperplane cell holding more members than this is
    * skipped, bounding the self-join at O(cap²) per cell. More than
    * `maxBucket` near-identical vectors therefore dedup only partially —
    * raise the cap (cost grows quadratically per cell) or run exact
    * dedup on the embedding bytes first, which collapses exact copies
    * before LSH ever sees them. */
  def semanticDedup(df: DataFrame, idCol: String, embCol: String,
                    threshold: Double = 0.99,
                    maxBucket: Int = DedupQueries.DefaultMaxBucket): DataFrame = {
    val vecs = df.select(col(idCol).as("vec_id"), col(embCol).as("embedding"))
    dropLosers(df, idCol,
      DedupQueries.signLshCosineCandidates(vecs, maxBucket)
        .filter(!isnan(col("cos_sim")) && col("cos_sim") >= threshold))
  }

  /** Drop docs sharing a verbatim character run with a smaller-id doc:
    * two-sided winnowing fingerprints (q116's machinery), at least
    * `minShared` shared fingerprints to count as a duplicate.
    *
    * Shared runs of ≥ 58 chars are guaranteed to collide UNLESS the
    * fingerprint is shared by more than `maxBucket` docs — such
    * mega-buckets (boilerplate headers, licenses) are skipped to bound
    * the self-join, so a cluster of >`maxBucket` documents sharing ONLY
    * boilerplate dedups partially. Whole-document copies are better
    * collapsed by [[exactDedup]] first; raise the cap only when a
    * >`maxBucket` boilerplate cluster genuinely must pair (cost is
    * O(cap²) per fingerprint). */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
                     minShared: Long = 1L,
                     maxBucket: Int = DedupQueries.DefaultMaxBucket): DataFrame = {
    val corpus = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
    dropLosers(df, idCol,
      DedupQueries.winnowedSubstringPairs(corpus, maxBucket)
        .filter(col("n_shared") >= minShared))
  }
}
