package graft.manifest

/** Call-level retry with the reference's budget: 3 attempts, exponential
  * backoff from 100 ms (ExponentialBackoff::from_millis(100).take(3),
  * /root/reference/src/main.rs:174, applied to every LIST page and upload
  * call at src/main.rs:196-206, 331-356).
  *
  * Division of labor with the other retry layers, so nothing retries
  * twice: S3A retries its own wire calls per [[S3AConfig.retry]]; Spark
  * re-runs a failed TASK, which is the correct retry for a listing stream
  * that dies mid-pagination (the stream has position, a call does not).
  * This wrapper covers the remaining layer — single listing CALLS our code
  * issues through bare FileSystem APIs (shard planning on the driver,
  * stream OPENS on executors) where nothing below retries for schemes
  * without S3A's machinery. */
object Retry {
  private val log = org.slf4j.LoggerFactory.getLogger(Retry.getClass)

  /** Transient-fault shapes the budget covers: plain IOException, plus
    * UncheckedIOException — Hadoop FS iterators and NIO streams surface
    * mid-iteration faults wrapped unchecked, which would otherwise slip
    * straight past an IOException-only guard. */
  private def transientIo(e: Throwable): Boolean = e match {
    case _: java.io.IOException => true
    case u: java.io.UncheckedIOException => u.getCause != null
    case _ => false
  }

  /** `throttleKey` opts a call site into [[AdaptiveThrottle]] AIMD pacing
    * (key = store authority): each attempt first pays the key's current
    * pacing delay, throttle-shaped failures raise it, successes decay it.
    * `None` keeps the bare reference-equivalent budget.
    */
  def withRetries[T](attempts: Int = 3, baseIntervalMs: Long = 100,
      throttleKey: Option[String] = None)(body: => T): T = {
    var n = 0
    while (true) {
      throttleKey.foreach(AdaptiveThrottle.pauseBeforeCall)
      try {
        val r = body
        throttleKey.foreach(AdaptiveThrottle.onSuccess)
        return r
      } catch {
        case e: Exception if transientIo(e) =>
          // register EVERY throttle-shaped failure with the governor —
          // including the budget-exhausting final one, which is the
          // strongest slow-down signal the store can send (a retry storm
          // that fails all attempts must still raise the fleet brake)
          val throttled = throttleKey.isDefined && AdaptiveThrottle.throttleShaped(e)
          if (throttled) throttleKey.foreach(AdaptiveThrottle.onThrottle)
          if (n + 1 >= attempts) throw e
          n += 1
          // back off at least the (possibly just-raised) pacing delay: the
          // per-call exponential budget and the fleet-level brake compose
          val backoff = math.max(baseIntervalMs * (1L << (n - 1)),
            if (throttled) AdaptiveThrottle.currentDelayMs(throttleKey.get).toLong else 0L)
          log.warn(s"listing attempt $n/$attempts failed, retrying in ${backoff}ms: $e")
          Thread.sleep(backoff)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
