package graft.tools

import graft.Bench
import org.scalatest.funsuite.AnyFunSuite

/** The round-archive overwrite decision (Bench.shouldArchive): the
  * BENCH_full_r{NN}.json baseline must end up as the QUIETEST capture of
  * the round at the driver's scale, never silently replaced by a noisier
  * re-run or a stray small-sf full run (ADVICE r12 + verdict #6).
  */
class BenchArchiveSpec extends AnyFunSuite {

  private val sf01 = "/root/testdata/sf0.1"
  private val sf0001 = "/root/testdata/sf0.001"

  private def archived(sf: String, hf: Double, head: String = "aaaa11112222"): Option[String] = Some(
    s"""{"metric":"total","value":1.0,"host_factor":$hf,"git_head":"$head","sf":"$sf","verdict":"clean"}""")

  private val head = "aaaa11112222"

  test("first capture of a round always archives") {
    assert(Bench.shouldArchive(None, sf01, 1.9, head))
  }

  test("same sf + same code: quieter capture overwrites, noisier is refused") {
    assert(Bench.shouldArchive(archived(sf01, 1.562), sf01, 1.1, head))
    assert(!Bench.shouldArchive(archived(sf01, 1.1), sf01, 1.562, head))
    assert(Bench.shouldArchive(archived(sf01, 1.2), sf01, 1.2, head)) // tie: fresher wins
  }

  test("different code: the newer capture always wins, however noisy") {
    // a quiet-but-stale mid-round snapshot must never outlive the code
    // the round actually ships
    assert(Bench.shouldArchive(archived(sf01, 1.0, "oldcode00000"), sf01, 9.9, head))
  }

  test("an unresolvable head never counts as different code") {
    // packed refs / non-repo cwd resolve to "unknown" — treating that as
    // a different head would let any noisy re-run clobber the baseline
    assert(!Bench.shouldArchive(archived(sf01, 1.0, head), sf01, 9.9, "unknown"))
    assert(!Bench.shouldArchive(archived(sf01, 1.0, "unknown"), sf01, 9.9, head))
    assert(Bench.shouldArchive(archived(sf01, 9.9, "unknown"), sf01, 1.0, head))
  }

  test("driver scale matches the sf segment exactly, not as a substring") {
    assert(Bench.isDriverScale("/root/testdata/sf0.1"))
    assert(!Bench.isDriverScale("/root/testdata/sf0.15"))
    assert(!Bench.isDriverScale("/root/testdata/sf0.100"))
    assert(!Bench.isDriverScale("/root/testdata/sf0.01"))
  }

  test("cross sf: the driver scale (sf0.1) wins in both directions") {
    // stray sf0.001 full run must not clobber the sf0.1 baseline...
    assert(!Bench.shouldArchive(archived(sf01, 9.9, head), sf0001, 1.0, head))
    // ...and must not block the driver's later sf0.1 capture either
    assert(Bench.shouldArchive(archived(sf0001, 1.0, head), sf01, 9.9, head))
  }

  test("unparseable existing archive: same-sf rule degrades to overwrite") {
    assert(Bench.shouldArchive(Some("not json"), sf01, 2.0, head))
  }

  test("attempts stamp is measurement context, not an archive-arbitration key") {
    // bench_compare.py reads "attempts" to mark the first sorted gates
    // warmup-incomparable across attempts:1 vs attempts:2 captures; the
    // ARCHIVE decision must keep ignoring it — an attempts:2 capture is not
    // better or worse code, and the stamp must not break hf/sf/head parsing
    val withAttempts = Some(
      s"""{"metric":"total","value":1.0,"host_factor":1.5,"git_head":"$head","sf":"$sf01","attempts":2,"verdict":"clean"}""")
    assert(Bench.shouldArchive(withAttempts, sf01, 1.1, head))
    assert(!Bench.shouldArchive(withAttempts, sf01, 1.9, head))
  }

  test("same dataset under a different path spelling is SAME-sf (ADVICE r13)") {
    // trailing slash / relative spelling of the same sf0.1 data must route
    // through the keep-quietest branch, not the cross-sf driver-scale branch
    // (which would let a noisier same-code re-run overwrite the baseline)
    assert(!Bench.shouldArchive(archived(sf01, 1.0), sf01 + "/", 2.0, head))
    assert(!Bench.shouldArchive(archived(sf01, 1.0), "testdata/sf0.1", 2.0, head))
    assert(Bench.shouldArchive(archived(sf01 + "/", 1.5), sf01, 1.0, head))
    // segmentless paths fall back to raw equality: a non-sf dir is never
    // silently treated as the driver scale
    assert(!Bench.shouldArchive(archived("/data/custom", 1.0), "/data/other", 2.0, head))
  }
}
