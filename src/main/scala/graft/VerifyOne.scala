package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Targeted correctness dump: run only the NAMED queries and write each
  * result plus its oracle SQL, so a single new query can be DuckDB-checked
  * locally without paying the full [[Verify]] sweep.
  *
  * Usage: runMain graft.VerifyOne outDir q107_semantic_dedup [...]
  * Env: SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS.
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outDir = args.head
    val names = args.tail
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val sfRoot = sfDir.stripSuffix("/")
    val sfBucket = new java.io.File(sfRoot).getName
    for (name <- names) {
      SparkEntry.queries(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      SparkEntry.oracleSql.get(name).foreach { sql =>
        Files.writeString(Paths.get(s"$outDir/$name.sql"),
          sql.replace(ops.ManifestFsQueries.SfDirToken, sfRoot)
            .replace(ops.ManifestFsQueries.SfBucketToken, sfBucket))
      }
    }
    spark.stop()
  }
}
