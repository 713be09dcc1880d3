package graft.manifest

import org.apache.spark.sql.DataFrame

/** Run-summary metrics reproducing the reference's final report
  * ("Scanned N objects in Xs (Y objects/sec)",
  * /root/reference/src/main.rs:284-289). Per-task live counts come from the
  * fslist source's DSv2 custom metric ([[graft.sources.ObjectsListedMetric]]);
  * this helper times a materialization and renders the same summary line.
  */
object ManifestMetrics {
  final case class RunSummary(objects: Long, elapsedSec: Double) {
    def objectsPerSec: Double = if (elapsedSec > 0) objects / elapsedSec else 0.0
    def render: String =
      f"Scanned $objects%d objects in $elapsedSec%.2fs ($objectsPerSec%.0f objects/sec)"
  }

  /** Materialize a manifest DataFrame and report the reference-style
    * summary. */
  def timedCount(manifest: DataFrame): RunSummary = {
    val t0 = System.nanoTime()
    val n = manifest.count()
    RunSummary(n, (System.nanoTime() - t0) / 1e9)
  }
}
