package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The near-dup candidate explode must stay bounded under a planted
  * mega-bucket (the boilerplate-corpus failure mode at scale) while staying
  * EXACTLY all-pairs below the cap, and the sub-bucket split must keep the
  * bucket connected through bridge pairs (duplicate-cluster resolution
  * depends on connectivity, not on every pair).
  */
class BucketCapSpec extends SparkSpec {

  private def pairsOf(ids: Seq[Long]) = {
    import spark.implicits._
    Extensions.boundedBucketPairs(
      Seq(("s", ids)).toDF("sig", "members"))
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
  }

  test("below the cap: exact all-pairs") {
    val got = pairsOf(1L to 10L)
    assert(got.length == 45)
    assert(got.toSet == (for (a <- 1L to 10L; b <- (a + 1) to 10L) yield (a, b)).toSet)
  }

  test("planted mega-bucket: pair count bounded, bucket stays connected") {
    val n = 3000
    val got = pairsOf(1L to n.toLong)
    // uncapped would be n(n-1)/2 ≈ 4.5M; the split bounds it near b·cap
    assert(got.length < n * 300, s"pair explosion: ${got.length}")
    assert(got.nonEmpty)
    // union-find connectivity over the produced pairs
    val parent = scala.collection.mutable.Map((1L to n.toLong).map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    got.foreach { case (a, b) => parent(find(a)) = find(b) }
    assert((1L to n.toLong).map(find).distinct.size == 1, "mega-bucket split lost connectivity")
  }

  test("canary: fixture corpora keep every sig bucket under the cap the oracles assume") {
    // The near-dup DuckDB oracles (x_neardup_jaccard / x_neardup_edit /
    // x_dedup_banded) are plain sig self-joins: they enumerate EVERY
    // same-sig pair, with no analogue of boundedBucketPairs' sub-bucket
    // split. The gates are therefore only sound while no sig bucket in the
    // gate corpus exceeds graft.neardup.max-bucket (default 256). This
    // canary measures the EXACT buckets the generator builds, at both SFs
    // the driver gates on — a future corpus/tokenizer change that grows a
    // bucket past the cap fails HERE with the number, not as an opaque
    // hash mismatch in CORRECTNESS.
    val cap = 256
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val docs = Tables.documents(spark, s"/root/testdata/$sf")
      val maxBucket = Extensions.neardupSigs(docs)
        .groupBy("sig").count()
        .agg(max(col("count"))).head.getLong(0)
      assert(maxBucket <= cap,
        s"$sf: a sig bucket holds $maxBucket members (> cap $cap) — the " +
          "near-dup oracles' all-pairs self-joins no longer match " +
          "boundedBucketPairs; re-shape the fixture or update the oracles")
    }
  }

  test("cap is configurable and empty sub-buckets are harmless") {
    spark.conf.set("graft.neardup.max-bucket", "8")
    try {
      val got = pairsOf(1L to 40L)
      assert(got.length < 40 * 12)
      val parent = scala.collection.mutable.Map((1L to 40L).map(i => i -> i): _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      got.foreach { case (a, b) => parent(find(a)) = find(b) }
      assert((1L to 40L).map(find).distinct.size == 1)
    } finally spark.conf.unset("graft.neardup.max-bucket")
  }
}
