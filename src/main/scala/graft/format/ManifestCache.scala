package graft.format

/** Process-wide cache of PARSED manifest / manifest-list files.
  *
  * Manifest files are immutable: written once under a UUID-bearing name,
  * never modified in place, and deleted only when no snapshot references
  * them (reachability GC) — so a path-keyed cache can never serve stale
  * data; eviction only bounds memory. The payoff is planning latency:
  * re-scanning a snapshot the driver has already planned (repeated
  * queries, DML read-modify-write, metadata aggregates after a scan)
  * costs zero manifest I/O and zero JSON parsing. Entries are shared
  * immutable case-class graphs, safe across threads.
  */
object ManifestCache {
  private val MaxEntries = 4096
  private val map = new java.util.LinkedHashMap[String, AnyRef](256, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, AnyRef]): Boolean =
      size() > MaxEntries
  }

  /** Cached parse of `path`, loading (outside the lock — parallel misses
    * on different paths don't serialize) on first sight.
    */
  def get[T <: AnyRef](path: String)(load: => T): T = {
    val hit = map.synchronized { Option(map.get(path)) }
    hit match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        val v = load
        map.synchronized { map.put(path, v) }
        v
    }
  }

  def clear(): Unit = map.synchronized { map.clear() }
}
