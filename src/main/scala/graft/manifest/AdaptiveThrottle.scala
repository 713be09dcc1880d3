package graft.manifest

import java.util.concurrent.ConcurrentHashMap

/** AIMD pacing for listing calls against a throttling object store.
  *
  * The reference's only defense against 503 Slow Down is a fixed 3-attempt /
  * 100 ms-backoff budget per call (/root/reference/src/main.rs:174) — enough
  * for a single sequential lister, but a 1000-executor listing fleet that
  * keeps its request RATE constant after a throttle just re-earns the next
  * 503 with extra steps. What a store's throttle signal actually asks for is
  * less aggregate pressure, so this governor adapts the rate itself:
  *
  *   - multiplicative increase of a per-call pacing delay on every
  *     throttle-shaped failure (25 ms floor, doubling to a 2 s ceiling);
  *   - gradual decay on every success (×0.9), so a fleet drifts back up to
  *     full speed once the store stops pushing back.
  *
  * Scope is per-JVM keyed by store authority — exactly one governor per
  * executor per bucket. That is deliberate: S3 throttles per key-prefix and
  * each executor observes its own 503s, so local AIMD converges the FLEET's
  * aggregate rate onto the store's capacity with zero cross-executor
  * coordination (same control loop as TCP congestion avoidance — and as
  * S3A's own `fs.s3a.retry.throttle` handling). The in-flight shard count
  * stays fixed (Spark owns task scheduling); stretching each shard's
  * inter-call gap is the equivalent lever and composes with task retry.
  *
  * Pacing applies BEFORE each call (including the first attempt of a new
  * call, which is what spreads the brake across a shard's whole page
  * stream, not just the call that saw the 503).
  */
object AdaptiveThrottle {
  final class State {
    @volatile var delayMs: Double = 0.0
    @volatile var peakDelayMs: Double = 0.0
    val throttles = new java.util.concurrent.atomic.AtomicLong(0)
  }

  /** One authority's observable governor state — what a run report needs
    * to show the brake engaging: how often the store pushed back and how
    * hard the governor braked at worst. */
  final case class ThrottleStat(throttles: Long, peakDelayMs: Double,
                                currentDelayMs: Double)

  private val states = new ConcurrentHashMap[String, State]()
  private def state(key: String): State =
    states.computeIfAbsent(key, _ => new State)

  val MinActiveDelayMs = 25.0
  val MaxDelayMs       = 2000.0

  /** A failure that means "slow down" rather than "broken": HTTP 503/429
    * shapes as surfaced through IOException messages by FileSystem impls.
    * The status codes must stand alone as numbers — digit lookarounds keep
    * object names and byte counts ("part-00503.parquet", request ids) from
    * engaging the brake on ordinary transient errors.
    */
  private val StatusCodeRe = "(?<![0-9])(503|429)(?![0-9])".r
  def throttleShaped(e: Throwable): Boolean = {
    val m = Option(e.getMessage).getOrElse("").toLowerCase
    StatusCodeRe.findFirstIn(m).isDefined || m.contains("slow down") ||
      m.contains("slowdown") || m.contains("throttl") ||
      m.contains("too many requests")
  }

  /** Sleep the key's current pacing delay; returns the delay applied. */
  def pauseBeforeCall(key: String): Long = {
    val d = state(key).delayMs.toLong
    if (d > 0) Thread.sleep(d)
    d
  }

  // delayMs updates are read-modify-write and the whole point is correct
  // behavior under concurrent executor task threads — synchronize on the
  // per-key State (uncontended in the common no-throttle path: onSuccess
  // on a zero delay is one volatile read + lock of a thread-local-hot
  // monitor; the code inside never blocks).
  def onThrottle(key: String): Unit = {
    val s = state(key)
    s.throttles.incrementAndGet()
    s.synchronized {
      s.delayMs = math.min(MaxDelayMs, math.max(MinActiveDelayMs, s.delayMs * 2))
      s.peakDelayMs = math.max(s.peakDelayMs, s.delayMs)
    }
  }

  def onSuccess(key: String): Unit = {
    val s = state(key)
    s.synchronized {
      s.delayMs = if (s.delayMs < 1.0) 0.0 else s.delayMs * 0.9
    }
  }

  def currentDelayMs(key: String): Double = state(key).delayMs
  def throttleCount(key: String): Long    = state(key).throttles.get()

  /** This JVM's per-authority governor telemetry, throttled authorities
    * only. Local-mode runs see the whole fleet here (one JVM); on a real
    * cluster each executor reports its own view — which is also the
    * governor's decision scope, so the numbers stay meaningful per node.
    */
  def snapshot(): Map[String, ThrottleStat] = {
    import scala.jdk.CollectionConverters._
    states.entrySet().iterator().asScala
      .map(e => e.getKey ->
        ThrottleStat(e.getValue.throttles.get(), e.getValue.peakDelayMs,
          e.getValue.delayMs))
      .filter(_._2.throttles > 0)
      .toMap
  }

  /** Test hook. */
  def reset(key: String): Unit = states.remove(key)
}
