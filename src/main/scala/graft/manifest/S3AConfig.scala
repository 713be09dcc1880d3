package graft.manifest

import org.apache.spark.sql.SparkSession

/** Connector configuration for manifest jobs against object stores — the
  * Spark answer to the reference's dual credential/endpoint CLI surface
  * (/root/reference/src/main.rs:33-59, create_s3_client at 294-319) and its
  * hand-rolled retry loop (src/main.rs:174, 196-206, 331-356).
  *
  * Hadoop S3A supports PER-BUCKET overrides
  * (`fs.s3a.bucket.<name>.*`), so a single job can read the source bucket
  * with one endpoint/credential set and write the destination with
  * another — no second client object, no temp-file staging, and multipart
  * streaming instead of the reference's whole-manifest RAM buffer
  * (src/main.rs:327-329). Retry/backoff comes from S3A's built-in policy
  * instead of custom code.
  */
object S3AConfig {
  final case class Credentials(accessKey: String, secretKey: String)

  /** Per-bucket endpoint + static credentials; omitted pieces fall back to
    * the default provider chain (same fallback rule as the reference:
    * static creds only when BOTH key and secret are given,
    * src/main.rs:300-309). */
  def perBucket(spark: SparkSession, bucket: String,
                endpoint: Option[String] = None,
                creds: Option[Credentials] = None,
                pathStyleAccess: Boolean = true): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = s"fs.s3a.bucket.$bucket"
    endpoint.foreach(e => conf.set(s"$p.endpoint", e))
    creds.foreach { c =>
      conf.set(s"$p.access.key", c.accessKey)
      conf.set(s"$p.secret.key", c.secretKey)
    }
    if (pathStyleAccess) conf.set(s"$p.path.style.access", "true")
  }

  /** Retry budget: 3 attempts with 100 ms exponential backoff mirrors the
    * reference defaults (ExponentialBackoff::from_millis(100).take(3),
    * src/main.rs:174). */
  def retry(spark: SparkSession, attempts: Int = 3, intervalMs: Int = 100): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.setInt("fs.s3a.attempts.maximum", attempts)
    conf.setInt("fs.s3a.retry.limit", attempts)
    conf.set("fs.s3a.retry.interval", s"${intervalMs}ms")
  }
}
