package graft.queries

import graft.SparkSpec

/** Independent in-memory recomputation of the indexed-retrieval gates:
  * x_bm25 and x_phrase_search run through the Graft index tables, the spec
  * recomputes from raw text with plain Scala collections — agreement proves
  * the index build + pruned probes + join/ranking plumbing lose nothing.
  */
class RetrievalOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def docs(): Map[Long, Array[String]] = {
    val rows = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
    rows.map(r => r.getLong(0) ->
      Option(r.getString(1)).getOrElse("").split("\\s+").filter(_.nonEmpty)).toMap
  }

  test("x_bm25 matches a brute-force BM25 over raw text") {
    val corpus = docs()
    val tf = corpus.map { case (id, ts) =>
      id -> ts.groupBy(identity).map { case (t, o) => t -> o.length.toLong } }
    val withTokens = tf.filter(_._2.nonEmpty)
    val n = withTokens.size.toDouble
    val totalLen = withTokens.values.map(_.values.sum).sum.toDouble
    val avgdl = totalLen / n
    val df = Seq("merge", "window").map(t =>
      t -> tf.count(_._2.contains(t)).toDouble).toMap
    def score(id: Long): Option[Double] = {
      val terms = Seq("merge", "window").filter(tf(id).contains)
      if (terms.isEmpty) None
      else Some(terms.map { t =>
        val tfd = tf(id)(t).toDouble
        val dl = tf(id).values.sum.toDouble
        val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
        idf * ((tfd * 2.25) / (tfd + 1.25 * (0.25 + 0.75 * (dl / avgdl))))
      }.sum)
    }
    val expect = corpus.keys.flatMap(id => score(id).map(s => (id, s)))
      .toSeq.sortBy { case (id, s) => (-s, id) }.take(20)
    val got = Extensions.entries.find(_._1 == "x_bm25").get._2(spark, d)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(3)))
    assert(got.length == expect.length)
    got.zip(expect).foreach { case ((gid, gs, pruned), (eid, es)) =>
      assert(gid == eid, s"doc order: got $gid expected $eid")
      assert(gs == es, s"doc $gid score: got $gs expected $es")
      assert(pruned, "both term probes must prune the index scan")
    }
  }

  test("x_phrase_search matches brute-force adjacency and refines AND search") {
    val corpus = docs()
    val expect = corpus.flatMap { case (id, ts) =>
      val hits = ts.indices.dropRight(1)
        .count(i => ts(i) == "merge" && ts(i + 1) == "group")
      if (hits > 0) Some((id, hits.toLong)) else None
    }.toSeq.sortBy { case (id, c) => (-c, id) }.take(20)
    val got = Extensions.entries.find(_._1 == "x_phrase_search").get._2(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.map(g => (g._1, g._2)).toSeq == expect)
    assert(got.forall(_._3), "both term probes must prune the index scan")
    // phrase hits are a subset of the docs containing BOTH terms
    val andDocs = corpus.filter { case (_, ts) =>
      ts.contains("merge") && ts.contains("group") }.keySet
    assert(got.forall(g => andDocs.contains(g._1)))
  }
}
