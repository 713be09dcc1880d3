package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Committed plan snapshots for the heaviest queries (round-12 verdict
  * stretch 9): the formatted physical plan of each, normalized and
  * written under `docs/plans/`, regenerated each round — so a plan
  * regression (a lost broadcast, a new exchange, a vanished pushed
  * filter) shows up as a TEXTUAL diff in review instead of only as
  * wall-time drift in the bench artifact.
  *
  * Normalization keeps diffs meaningful across runs: expression ids
  * (`#123`), plan ids, temp/scratch paths, and inlined binary literals
  * all churn per session and are scrubbed; node structure, operator
  * choice, pushed filters, read schemas, and join strategies — the
  * things a plan review actually reads — survive verbatim.
  *
  * Usage: runMain graft.PlanSnapshots [outDir]   (default docs/plans)
  */
object PlanSnapshots {

  /** The snapshot set: the suite's heaviest queries by quiet-box minima
    * (the plans where a silent regression costs the most), plus q110
    * (the bucketed join whose shuffle-free shape drifted 2.11x in r12
    * purely from load — the case that motivated committing plans). */
  val Snapshotted: Seq[String] = Seq(
    "q230_kcore",
    "q296_license_propagation",
    "q116_substring_dedup",
    "q231_rerank_cascade",
    "q255_dedup_impact",
    "q125_bm25",
    "q212_canonical_docs",
    "q243_personalized_pagerank",
    "q120_pagerank",
    "q277_cluster_span",
    "q110_bucketed_join",
    // round-13 heavies: the two new LSH+CC consumers
    "q302_shuffle_spacing",
    "q305_leakage_free_split",
    // round-14 heavies: the NSW walk and the unigram-LM round
    "q308_nsw_graph_ann",
    "q307_unigram_lm",
    // late-round-14 heavies: the snapshot storage accounting and the
    // sketch-error audit (the two largest post-landing quiet minima)
    "q320_cdc_delta_storage",
    "q317_sketch_error",
    // round-15: the entry-strategy ablation (two walks over the shared
    // NswEngine graph — the round's heaviest addition)
    "q332_ann_entry_ablation")

  private[graft] def normalize(plan: String): String =
    plan
      .replaceAll("#\\d+[L]?", "#_")            // expression ids
      .replaceAll("plan_id=\\d+", "plan_id=_")
      .replaceAll("0x[0-9A-Fa-f]{32,}", "0x_")  // inlined binary literals
      .replaceAll("_bkt_[0-9a-f]+", "_bkt_")    // memoized bucket-table hash
      .replaceAll("RDD\\[\\d+\\]", "RDD[_]")    // session-scoped RDD ids
      .replaceAll("/tmp/[^\\s,\\]]+", "/tmp/_") // scratch paths
      .replaceAll("file:[^\\s,\\]]+", "file:_") // fixture locations
      .replaceAll("(?m) +$", "")                // trailing space churn

  def main(args: Array[String]): Unit = {
    val outDir = java.nio.file.Paths.get(args.lift(0).getOrElse("docs/plans"))
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- Snapshotted) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val txt = normalize(df.queryExecution.explainString(FormattedMode))
      java.nio.file.Files.writeString(outDir.resolve(s"$q.txt"),
        s"== $q (formatted physical plan, sf0.001, normalized) ==\n$txt")
      println(s"[plans] wrote ${outDir.resolve(s"$q.txt")}")
    }
    spark.stop()
  }
}
