package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Round-deliverable plan capture: `.explain("formatted")` text for an
  * arbitrary query list, written as `<outDir>/<query><suffix>.txt` —
  * the before/after evidence files the optimization rounds commit under
  * `plans/rNN/`. Reuses [[PlanSnapshots.normalize]] so the committed
  * text is stable across sessions (expression ids, scratch paths and
  * binary literals scrubbed; operators, join strategies, pushed filters
  * and read schemas survive verbatim).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <query> [query ...]
  *   e.g. runMain graft.PlanDump plans/r17 _before q41_minhash_lsh
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    java.nio.file.Files.createDirectories(outDir)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    for (q <- args.drop(2)) {
      val df = SparkEntry.queries(q)(spark, sf)
      val txt = PlanSnapshots.normalize(df.queryExecution.explainString(FormattedMode))
      java.nio.file.Files.writeString(outDir.resolve(s"$q$suffix.txt"),
        s"== $q (formatted physical plan, $sf, normalized) ==\n$txt")
      println(s"[plans] wrote ${outDir.resolve(s"$q$suffix.txt")}")
    }
    spark.stop()
  }
}
