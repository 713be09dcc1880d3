package graft

/** Listing-path profiler: separates PLANNING time from EXECUTION time for
  * the 250×200 tree layout, per rep. This is how the round-8 shard
  * coalescing was found — planning was single-digit ms while per-task
  * dispatch (~1ms × 250 one-dir shards) dominated the walk itself.
  *
  * Usage: runMain graft.ListProfile   (env: SPARK_GRAFT_CPUS)
  */
object ListProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tree = java.nio.file.Paths.get(ops.Scratch.dir("graft_prof_tree"))
    for (d <- 0 until 250) {
      val dir = tree.resolve(f"shard$d%03d"); java.nio.file.Files.createDirectory(dir)
      for (f <- 0 until 200) java.nio.file.Files.createFile(dir.resolve(f"obj$f%04d"))
    }
    val listing = spark.read.format("graft.sources.FsListSource")
      .option("path", tree.toString).load()
    listing.count() // warm
    for (i <- 0 until 5) {
      val t0 = System.nanoTime()
      val parts = new graft.sources.FsListScan(tree.toString, "/", None).planInputPartitions()
      val t1 = System.nanoTime()
      val n = listing.count()
      val t2 = System.nanoTime()
      println(f"rep$i: plan=${(t1-t0)/1e6}%.1f ms (${parts.length} parts)  count=${(t2-t1)/1e6}%.1f ms  rate=${n/((t2-t1)/1e9)}%.0f obj/s")
    }
    spark.stop()
  }
}
