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
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4") // same default as Bench
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
        def f(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
        val ts = times.map(t => f(t._1))
        // min over the NUMERIC timings (the formatted strings would
        // compare lexicographically: "11.0" < "9.8")
        println(s"""{"query":"$name","rows":${times.head._2},"sec":[${ts.mkString(",")}],"min":${f(times.map(_._1).min)}}""")
    }
    spark.stop()
  }
}
