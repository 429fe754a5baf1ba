package graft.format

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ManifestCacheSpec extends AnyFunSuite {

  private def tmp(bytes: Int): String = {
    val p = Files.createTempFile("mcache", ".json")
    Files.write(p, Array.fill[Byte](bytes)('x'))
    p.toFile.deleteOnExit()
    p.toString
  }

  test("byte-weighted LRU: oversized total evicts least-recently-used first") {
    ManifestCache.clear()
    ManifestCache.maxBytesOverride = Some(250L)
    try {
      var loads = 0
      val paths = (1 to 3).map(_ => tmp(100))
      def load(p: String): String = ManifestCache.get(p) { loads += 1; s"parsed:$p" }
      paths.foreach(load) // 300 bytes > 250 budget: first entry evicted
      assert(loads == 3)
      assert(ManifestCache.approximateBytes <= 250L)
      load(paths(2)); load(paths(1))
      assert(loads == 3, "retained entries must still hit")
      load(paths(0)) // was evicted -> reload; evicts paths(2) (now eldest)
      assert(loads == 4)
      load(paths(2))
      assert(loads == 5)
    } finally {
      ManifestCache.maxBytesOverride = None
      ManifestCache.clear()
    }
  }

  test("a single entry larger than the budget is still cached and reusable") {
    ManifestCache.clear()
    ManifestCache.maxBytesOverride = Some(50L)
    try {
      var loads = 0
      val big = tmp(500)
      ManifestCache.get(big) { loads += 1; "v" }
      ManifestCache.get(big) { loads += 1; "v" }
      assert(loads == 1, "oversized single entry must not thrash")
    } finally {
      ManifestCache.maxBytesOverride = None
      ManifestCache.clear()
    }
  }

  test("a jumbo insert does NOT flush the hot cache chasing an unreachable budget") {
    ManifestCache.clear()
    ManifestCache.maxBytesOverride = Some(50L)
    try {
      val hot = (1 to 4).map(_ => tmp(10))
      hot.foreach(p => ManifestCache.get(p)("v"))
      // the jumbo alone exceeds the budget: evicting the 4 hot entries can
      // never satisfy it, so none of them may be sacrificed
      ManifestCache.get(tmp(500))("jumbo")
      var reloads = 0
      hot.foreach(p => ManifestCache.get(p) { reloads += 1; "v" })
      assert(reloads == 0, s"hot entries were flushed for an unreachable budget ($reloads)")
    } finally {
      ManifestCache.maxBytesOverride = None
      ManifestCache.clear()
    }
  }
}
