package graft.queries

/** Process-wide fixture-build stopwatch. Gate queries build their own Graft
  * tables before the measured operator runs; the driver's Bench times the
  * whole closure, so fixture cost lands in the query's number and (worse)
  * whichever query runs FIRST absorbs the write path's one-time JIT. Leaf
  * fixture builders wrap themselves in [[timed]]; Bench resets per query and
  * reports the split, so a slow-looking row can be read as fixture vs
  * operator without a local re-run. Only leaf builders are instrumented —
  * nesting would double-count.
  */
object FixtureClock {
  private val acc = new java.util.concurrent.atomic.AtomicLong(0L)

  def timed[T](f: => T): T = {
    val t0 = System.nanoTime()
    try f finally acc.addAndGet(System.nanoTime() - t0)
  }

  def reset(): Unit = acc.set(0L)

  /** Seconds accumulated since the last reset. */
  def sec: Double = acc.get / 1e9
}
