package graft

import org.apache.spark.sql.SparkSession

/** Time (or show) individual graded queries outside the full bench —
  * `runMain graft.OneQuery q210_lsh_eval [q54_dedup_clusters ...]`.
  * Same session shape as [[Bench]] (local[N], shuffle.partitions=N, warm
  * tables, min-of-2), so a number here is comparable to a bench line
  * without paying the 280-query suite. With SPARK_GRAFT_SHOW=1 prints the
  * first rows instead of timing (correctness eyeball, not a measurement). */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val show = sys.env.get("SPARK_GRAFT_SHOW").contains("1")
    args.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"""{"query":"$name","error":"unknown"}""")
        case Some(fn) if show =>
          fn(spark, sfDir).show(50, truncate = false)
        case Some(fn) =>
          val times = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            val n = fn(spark, sfDir).count()
            ((System.nanoTime() - t0) / 1e9, n)
          }
          val best = times.map(_._1).min
          println(f"""{"query":"$name","min_sec":$best%.3f,"passes":[${times.map(t => f"${t._1}%.3f").mkString(",")}],"rows":${times.head._2}}""")
      }
    }
    spark.stop()
  }
}
