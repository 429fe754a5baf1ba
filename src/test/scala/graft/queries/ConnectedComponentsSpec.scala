package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Duplicate-cluster label propagation: correctness on multi-component
  * graphs, and graceful convergence (pointer-doubling fallback) on a chain
  * whose diameter exceeds the plain-propagation round budget — that case
  * used to abort the whole pipeline job.
  */
class ConnectedComponentsSpec extends SparkSpec {

  private def labelsOf(edges: Seq[(Long, Long)], maxIters: Int = 20) = {
    import spark.implicits._
    Extensions.connectedComponents(edges.toDF("src", "dst"), maxIters)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  test("two components resolve to their min doc_id") {
    val got = labelsOf(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("pathological chain deeper than the plain round budget converges") {
    // path 0-1-...-120: diameter 120 >> maxIters=8 plain rounds; the
    // doubling regime must close it in ~log2 extra rounds, not abort
    val chain = (0L until 120L).map(i => (i, i + 1))
    val got = labelsOf(chain ++ Seq((500L, 501L)), maxIters = 8)
    assert((0L to 120L).forall(got(_) == 0L), "chain must collapse to label 0")
    assert(got(500L) == 500L && got(501L) == 500L)
  }
}
