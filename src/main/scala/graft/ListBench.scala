package graft

/** Listing-only micro-bench: the two layouts [[Bench]] times (250×200
  * tree, 50k-file flat mega-dir), every try printed — the reconciliation
  * loop for the listing throughput numbers, same role [[BenchOne]] plays
  * for query timings. A recorded listing rate that disagrees with a quiet
  * local run is box state (dentry cache, I/O contention), and this main
  * makes that a 1-minute check instead of a full Bench run.
  *
  * Usage: runMain graft.ListBench   (env: SPARK_GRAFT_CPUS, GRAFT_REPS)
  */
object ListBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4") // same default as Bench
    val reps = sys.env.getOrElse("GRAFT_REPS", "3").toInt
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def rates(path: String): Seq[Long] = {
      val listing = spark.read.format("graft.sources.FsListSource")
        .option("path", path).load()
      listing.count() // warm: codegen + dentry cache
      (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        val n = listing.count()
        (n / ((System.nanoTime() - t0) / 1e9)).round
      }
    }

    val tree = java.nio.file.Paths.get(ops.Scratch.dir("graft_lb_tree"))
    for (d <- 0 until 250) {
      val dir = tree.resolve(f"shard$d%03d"); java.nio.file.Files.createDirectory(dir)
      for (f <- 0 until 200) java.nio.file.Files.createFile(dir.resolve(f"obj$f%04d"))
    }
    val treeTries = rates(tree.toString)

    val flat = java.nio.file.Paths.get(ops.Scratch.dir("graft_lb_flat"))
    for (f <- 0 until 50000)
      java.nio.file.Files.createFile(flat.resolve(f"o$f%05d"))
    val flatTries = rates(flat.toString)

    def j(xs: Seq[Long]) = xs.mkString("[", ",", "]")
    println(s"""{"metric":"listing_micro","cpus":$cpus,"tree_objects_per_sec":${j(treeTries)},"flat_objects_per_sec":${j(flatTries)},"tree_best":${treeTries.max},"flat_best":${flatTries.max}}""")
    spark.stop()
  }
}
