package graft.queries

import graft.SparkSpec

/** Independent in-memory recomputation of the training-mix curation gates:
  * bigram-LM quality scoring (the CCNet/Gopher perplexity-filter shape in
  * exact fixed-point integers) and DSIR-style hashed-feature importance
  * resampling. Both replays run the full per-doc math in plain Scala on
  * the raw fixture and must match the gate rollups exactly — the same
  * all-integer discipline that makes the DuckDB oracles hash-stable.
  */
class TrainingMixSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def corpus(): Array[(Long, String, Array[String])] =
    // via Tables.documents — the gates' own loader — so any future
    // loader-side normalization keeps replay and gate on the same input
    Tables.documents(spark, d)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)).getOrElse("").split("\\s+").filter(_.nonEmpty)))

  private def bigrams(toks: Array[String]): Array[String] =
    if (toks.length < 2) Array.empty
    else toks.sliding(2).map(_.mkString(" ")).toArray

  test("x_lm_score matches the in-memory fixed-point bigram LM") {
    val docs = corpus()
    val allBg = docs.flatMap { case (_, _, t) => bigrams(t) }
    val c2 = allBg.groupBy(identity).map { case (bgr, o) => bgr -> o.length.toLong }
    val c1 = allBg.groupBy(_.split(" ", 2)(0)).map { case (w1, o) => w1 -> o.length.toLong }
    val q = c2.map { case (bgr, c) =>
      bgr -> (c * 1000000L) / c1(bgr.split(" ", 2)(0))
    }
    // the fixed point is a probability: always within (0, 1e6]
    assert(q.values.forall(v => v >= 1L && v <= 1000000L))
    val perDoc = docs.flatMap { case (id, lang, t) =>
      val bg = bigrams(t)
      if (bg.isEmpty) None // <2-token docs carry no bigram evidence: excluded
      else Some((id, lang, bg.map(q).sum / bg.length))
    }
    val expect = perDoc.groupBy(_._2).map { case (lang, rows) =>
      val scores = rows.map(_._3)
      (lang, rows.length.toLong, scores.sum / rows.length,
        scores.min, scores.max, scores.count(_ < 33000L).toLong)
    }.toSeq.sortBy(_._1)
    val got = Extensions.entries.find(_._1 == "x_lm_score").get._2(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expect, s"got $got\nexpected $expect")
  }

  test("x_importance_resample matches the in-memory DSIR acceptance math") {
    val docs = corpus()
    val allB = docs.flatMap { case (_, lang, t) => bigrams(t).map(bg => (lang, md5hex(bg).take(2))) }
    val cc = allB.groupBy(_._2).map { case (b, o) => b -> o.length.toLong }
    val tc = allB.filter(_._1 == "en").groupBy(_._2)
      .map { case (b, o) => b -> o.length.toLong }
    val w = cc.map { case (b, c) => b -> (tc.getOrElse(b, 0L) * 1048576L) / c }
    // the hashed feature space stays constant-size (<= 256 cells)
    assert(w.size <= 256 && w.values.forall(v => v >= 0L && v <= 1048576L))
    val perDoc = docs.flatMap { case (id, lang, t) =>
      val bs = bigrams(t).map(bg => md5hex(bg).take(2))
      if (bs.isEmpty) None
      else {
        val wdoc = bs.map(w).sum / bs.length
        val u = java.lang.Long.parseLong(md5hex(s"is_$id").take(5), 16)
        Some((lang, wdoc, u < wdoc))
      }
    }
    val expect = perDoc.groupBy(_._1).map { case (lang, rows) =>
      (lang, rows.length.toLong, rows.count(_._3).toLong, rows.map(_._2).sum)
    }.toSeq.sortBy(_._1)
    val got = Extensions.entries.find(_._1 == "x_importance_resample").get._2(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect, s"got $got\nexpected $expect")
    // the resample must actually cut — acceptance is probabilistic, not a
    // pass-through — and must keep SOMETHING (weights ~0.43*2^20 here)
    val (kept, total) = (got.map(_._3).sum, got.map(_._2).sum)
    assert(kept > 0L && kept < total, s"degenerate resample: $kept of $total")
  }

  test("x_incremental_lm: history-trained model scores the batch; state conserves counts") {
    val docs = corpus()
    val hist = docs.filter(_._1 % 2 == 0)
    val batch = docs.filter(_._1 % 2 == 1)
    val histBg = hist.flatMap { case (_, _, t) => bigrams(t) }
    val c2 = histBg.groupBy(identity).map { case (bgr, o) => bgr -> o.length.toLong }
    val c1 = histBg.groupBy(_.split(" ", 2)(0)).map { case (w1, o) => w1 -> o.length.toLong }
    val q = c2.map { case (bgr, c) => bgr -> (c * 1000000L) / c1(bgr.split(" ", 2)(0)) }
    val perDoc = batch.flatMap { case (id, lang, t) =>
      val bg = bigrams(t)
      if (bg.isEmpty) None
      // out-of-model bigrams score 0 (the left-join miss in the gate)
      else Some((id, lang, bg.map(b => q.getOrElse(b, 0L)).sum / bg.length))
    }
    val expect = perDoc.groupBy(_._2).map { case (lang, rows) =>
      val sc = rows.map(_._3)
      (lang, rows.length.toLong, sc.sum / rows.length, sc.min, sc.max,
        sc.count(_ == 0L).toLong)
    }.toSeq.sortBy(_._1)
    val allBigrams = docs.map { case (_, _, t) => bigrams(t).length.toLong }.sum
    val got = Extensions.entries.find(_._1 == "x_incremental_lm").get._2(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
        r.getLong(9), r.getLong(10))).toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5, t._6)) == expect,
      s"scores: got $got\nexpected $expect")
    // state ritual flags: compaction happened and lost nothing; the batch
    // append only added files; 4 commits; counts conserve to the corpus
    got.foreach { r =>
      assert(r._7 && r._8 && r._9, s"state ritual flags off: $r")
      assert(r._10 == 4L, s"commit count: $r")
      assert(r._11 == allBigrams, s"count conservation: ${r._11} vs $allBigrams")
    }
    // the batch must contain genuinely out-of-model BIGRAMS (the 0-score
    // left-join-miss path really ran) — whole docs scoring 0 only appear
    // at larger SFs, so that column is reported, not required
    val oovBigrams = batch.flatMap { case (_, _, t) => bigrams(t) }
      .count(b => !q.contains(b))
    assert(oovBigrams > 0, "batch has no out-of-model bigrams; split proves nothing")
  }

  test("lmScoreRollup property: random corpora match the in-memory model (3 seeds)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("text", StringType)))
    for (seed <- Seq(11L, 42L, 1337L)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "bb", "ccc", "d1", "e!", "f", "gg", "h?", "ii", "j")
      val langs = Vector("xx", "yy", "zz")
      // lengths 0..7 on purpose: 0- and 1-token docs must drop out of the
      // rollup identically on both paths
      val docs = (0L until 120L).map { id =>
        val n = rnd.nextInt(8)
        (id, langs(rnd.nextInt(3)),
          Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      val df = spark.createDataFrame(
        docs.map { case (i, l, t) => Row(i, l, t) }.asJava, schema)
      val got = Extensions.lmScoreRollup(df).orderBy("lang")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
      // in-memory model on the same corpus
      val toks = docs.map { case (i, l, t) =>
        (i, l, t.split("\\s+").filter(_.nonEmpty)) }
      val allBg = toks.flatMap { case (_, _, t) => bigrams(t) }
      val c2 = allBg.groupBy(identity).map { case (b, o) => b -> o.length.toLong }
      val c1 = allBg.groupBy(_.split(" ", 2)(0)).map { case (w, o) => w -> o.length.toLong }
      val q = c2.map { case (b, c) => b -> (c * 1000000L) / c1(b.split(" ", 2)(0)) }
      val perDoc = toks.flatMap { case (i, l, t) =>
        val bg = bigrams(t)
        if (bg.isEmpty) None else Some((l, bg.map(q).sum / bg.length))
      }
      val expect = perDoc.groupBy(_._1).map { case (l, rows) =>
        val sc = rows.map(_._2)
        (l, rows.length.toLong, sc.sum / rows.length, sc.min, sc.max,
          sc.count(_ < 33000L).toLong)
      }.toSeq.sortBy(_._1)
      assert(got == expect, s"seed $seed: got $got\nexpected $expect")
    }
  }
}
