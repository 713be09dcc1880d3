package graft.manifest

import org.apache.spark.sql.DataFrame

/** Run-summary metrics reproducing the reference's final report
  * ("Scanned N objects in Xs (Y objects/sec)",
  * /root/reference/src/main.rs:284-289). Per-task live counts come from the
  * fslist source's DSv2 custom metric ([[graft.sources.ObjectsListedMetric]]);
  * this helper times a materialization and renders the same summary line.
  */
object ManifestMetrics {
  final case class RunSummary(objects: Long, elapsedSec: Double,
      throttle: Map[String, AdaptiveThrottle.ThrottleStat] = Map.empty) {
    def objectsPerSec: Double = if (elapsedSec > 0) objects / elapsedSec else 0.0
    def render: String = {
      // Locale.ROOT throughout: log consumers parse this line, and the
      // f-interpolator localizes digits under non-ASCII default locales
      // (the same convention Bench's artifact formatting follows)
      val L = java.util.Locale.ROOT
      val base = "Scanned %d objects in %.2fs (%.0f objects/sec)"
        .formatLocal(L, objects, elapsedSec, objectsPerSec)
      if (throttle.isEmpty) base
      else base + throttle.toSeq.sortBy(_._1).map { case (auth, st) =>
        "; throttled by %s %d× (peak pacing %.0f ms)"
          .formatLocal(L, auth, st.throttles, st.peakDelayMs)
      }.mkString
    }
  }

  /** Materialize a manifest DataFrame and report the reference-style
    * summary, including any [[AdaptiveThrottle]] governor activity THIS
    * run provoked (throttle-count delta per authority; peak pacing delay
    * is the governor's lifetime high-water mark) — a deployment sees the
    * brake engage in the run report itself. */
  def timedCount(manifest: DataFrame): RunSummary = {
    val before = AdaptiveThrottle.snapshot()
    val t0 = System.nanoTime()
    val n = manifest.count()
    val runThrottle = AdaptiveThrottle.snapshot().flatMap { case (k, st) =>
      val d = st.throttles - before.get(k).map(_.throttles).getOrElse(0L)
      if (d > 0) Some(k -> st.copy(throttles = d)) else None
    }
    RunSummary(n, (System.nanoTime() - t0) / 1e9, runThrottle)
  }
}
