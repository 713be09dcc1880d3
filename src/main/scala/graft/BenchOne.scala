package graft
import org.apache.spark.sql.SparkSession

/** Targeted per-query timing: run the named queries K times each under the
  * same session config as [[Bench]] and print every individual timing —
  * the profiling loop for reconciling a recorded bench number against a
  * local run (a single-shot artifact can be 2-3× a clean run purely from
  * box load).
  *
  * Usage: runMain graft.BenchOne q43_ngram_jaccard [q41_minhash_lsh ...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS, GRAFT_REPS.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("lineitem", "orders", "events", "documents", "embeddings").foreach { t =>
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    for (name <- args) SparkEntry.queries.get(name) match {
      case None => println(s"""{"query":"$name","error":"unknown"}""")
      case Some(fn) =>
        val times = (0 until reps).map { _ =>
          val t0 = System.nanoTime()
          val n = fn(spark, sfDir).count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val ts = times.map(t => "%.3f".formatLocal(java.util.Locale.ROOT, t._1))
        println(s"""{"query":"$name","rows":${times.head._2},"sec":[${ts.mkString(",")}],"min":${ts.min}}""")
    }
    spark.stop()
  }
}
