package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Seeded randomized properties of the bounded-containment video rule
  * ([[Extensions.videoContainmentPairsOf]]) — the dHash-property
  * discipline on the trim axis. Two regimes exist by construction of the
  * fixture gradient: frames differ by a uniform +7 gray shift, which
  * dHash (brightness-blind) sees only through mod-256 wraparound
  * crossings — so for SOME (w, h, seed) draws adjacent frames alias
  * within the verify threshold and several anchors legitimately tie at
  * the minimum (the rule then reports the smallest, which is correct
  * min-over-anchors semantics, and the oracles agree because they
  * compute the same rule). The UNCONDITIONAL properties hold in both
  * regimes: a planted trim always pairs with hamming ≤ 2, an over-trim
  * is invisible to the bounded window but visible to full containment,
  * and an unrelated seed never pairs. The ANCHOR-equality property is
  * asserted exactly when the draw satisfies the uniqueness precondition
  * the gate fixtures maintain, computed from the base's own frame
  * hashes: every wrong alignment's hamming sum clears the planted
  * alignment's by more than the edit budget.
  */
class VideoContainmentSpec extends SparkSpec {
  import spark.implicits._

  test("random trims pair at hamming <= 2; anchors exact under frame separation; over-trims bounded-invisible") {
    val rnd = new scala.util.Random(20260816L) // seeded: deterministic run
    var separated = 0
    (0 until 10).foreach { _ =>
      val w = 12 + rnd.nextInt(30)
      val h = 10 + rnd.nextInt(20)
      val nf = 5 + rnd.nextInt(4) // 5..8
      val seed = rnd.nextInt(1000)
      val t = 1 + rnd.nextInt(2) // trim 1..2 frames
      val t0 = rnd.nextInt(t + 1) // leading share of the trim
      val edit = rnd.nextBoolean()
      val strangerSeed = seed + 1 + rnd.nextInt(100)
      val rows = Seq(
        Extensions.videoTrimFixtureRow(1L, seed, w, h, nf, 0, edit = false),
        Extensions.videoTrimFixtureRow(2L, seed, w, h, nf - t, t0, edit = edit),
        // over-trim: 3 frames cut — beyond the 2-frame window
        Extensions.videoTrimFixtureRow(3L, seed, w, h, nf - 3, 1, edit = false),
        Extensions.videoTrimFixtureRow(4L, strangerSeed, w, h, nf, 0, edit = false))
      val fh = Extensions.videoFrameHashes(rows.toDF("vid_id", "blob"))
        .localCheckpoint()
      // the ANCHOR-UNIQUENESS precondition, computed exactly from the
      // base's own frame hashes: the reported anchor provably equals the
      // planted one iff every wrong alignment's hamming sum clears the
      // planted alignment's by more than the edit budget (the edit moves
      // any sum by at most 2, so S(a) > 4 for all a != t0 suffices)
      val baseH = fh.filter(col("vid_id") === 1L)
        .orderBy("frame").select("h").as[Long].collect()
      def alignSum(a: Int, b: Int, len: Int): Int =
        (0 until len).map(f =>
          java.lang.Long.bitCount(baseH(f + a) ^ baseH(f + b))).sum
      val sep = (0 to t).forall(a => a == t0 || alignSum(a, t0, nf - t) > 4)
      val sepOver = (0 to 3).forall(a => a == 1 || alignSum(a, 1, nf - 3) > 0)
      val trimmed = Extensions.videoContainmentPairsOf(fh, Some(2))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      val key = (1L, 2L)
      assert(trimmed.contains(key),
        s"trim t=$t t0=$t0 of ${w}x$h x$nf seed $seed must pair: $trimmed")
      val (ham, anchor) = trimmed(key)
      assert(ham <= 2, s"planted trim must verify within 2 bits, got $ham")
      assert(!trimmed.contains((1L, 3L)),
        "a 3-frame over-trim must be invisible to the 2-frame window")
      assert(!trimmed.keys.exists(p => p._1 == 4L || p._2 == 4L),
        s"the unrelated seed must never pair: $trimmed")
      val contained = Extensions.videoContainmentPairsOf(fh, None)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
      assert(contained.contains((1L, 3L)),
        s"full containment must find the over-trim: $contained")
      if (sep) {
        separated += 1
        assert(anchor == t0.toLong,
          s"separated draw: expected anchor $t0, got $anchor (${w}x$h x$nf seed $seed)")
      }
      if (sepOver)
        assert(contained((1L, 3L)) == 1L,
          s"separated draw: over-trim anchors at 1, got ${contained((1L, 3L))}")
    }
    // the precondition must actually exercise the anchor claim: if the
    // seeded draws ever stop producing separated fixtures, this test has
    // silently stopped testing anchors — fail loudly instead
    assert(separated >= 3, s"only $separated/10 draws were frame-separated")
  }
}
