package graft
import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the formatted physical plan of the named
  * queries (the `.explain("formatted")` loop of the per-operator scale
  * review — pushdown, broadcast choice, exchange count, codegen spans).
  *
  * Usage: runMain graft.ExplainMain q101_contamination [q43_ngram_jaccard ...]
  */
object ExplainMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").explain("formatted")
    }
    spark.stop()
  }
}
