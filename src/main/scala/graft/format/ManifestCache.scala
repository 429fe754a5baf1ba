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
  *
  * Eviction is LRU bounded on BOTH entry count and approximate bytes: a
  * parsed manifest's heap footprint tracks its file size (same strings,
  * same stats), so the on-disk size observed at load time is the weight.
  * Count alone would let 4096 many-MB manifests pin multiple GBs in a
  * long-lived driver planning many large tables.
  */
object ManifestCache {
  private val MaxEntries = 4096
  private val MaxBytes = 256L * 1024 * 1024
  /** Test seam: shrink the byte budget to exercise eviction without GBs. */
  @volatile private[format] var maxBytesOverride: Option[Long] = None
  private def maxBytes: Long = maxBytesOverride.getOrElse(MaxBytes)
  private final case class Entry(value: AnyRef, bytes: Long)
  private var totalBytes = 0L
  private val map = new java.util.LinkedHashMap[String, Entry](256, 0.75f, true)

  /** Cached parse of `path`, loading (outside the lock — parallel misses
    * on different paths don't serialize) on first sight.
    */
  def get[T <: AnyRef](path: String)(load: => T): T = {
    val hit = map.synchronized { Option(map.get(path)) }
    hit match {
      case Some(e) => e.value.asInstanceOf[T]
      case None =>
        val v = load
        val w = try java.nio.file.Files.size(java.nio.file.Paths.get(path))
                catch { case _: Exception => 0L }
        map.synchronized {
          val prev = map.put(path, Entry(v, w))
          totalBytes += w - (if (prev != null) prev.bytes else 0L)
          // evict eldest-accessed first until within both budgets; never
          // evict the entry just inserted (an oversized single manifest
          // still gets cached — evicting it would thrash every reuse).
          // When the NEW entry alone exceeds the byte budget, no amount of
          // evicting others can ever satisfy it — skip byte-eviction
          // entirely rather than flush the whole hot cache chasing an
          // unreachable target (the jumbo itself ages out at the next
          // normal insert, when it is no longer the just-inserted entry).
          val byteEvict = w <= maxBytes
          val it = map.entrySet().iterator()
          while ((map.size > MaxEntries || (byteEvict && totalBytes > maxBytes)) &&
                 map.size > 1 && it.hasNext) {
            val e = it.next()
            if (e.getKey != path) { totalBytes -= e.getValue.bytes; it.remove() }
          }
        }
        v
    }
  }

  private[graft] def approximateBytes: Long = map.synchronized(totalBytes)

  def clear(): Unit = map.synchronized { map.clear(); totalBytes = 0L }
}
