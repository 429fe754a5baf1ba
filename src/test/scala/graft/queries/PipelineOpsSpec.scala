package graft.queries

import graft.SparkSpec
import graft.operators.AudioCodec
import org.apache.spark.sql.functions._

/** Property-style hardening for the round-7 pipeline operators beyond their
  * oracle gates: codec round-trips over randomized parameters, scrub
  * idempotence, and determinism of the mixing/shuffle row functions under
  * repartitioning (the property a 100 TB re-run depends on).
  */
class PipelineOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("audio encode->decode round-trips exact header fields across random params") {
    val rnd = new scala.util.Random(42)
    val cases = (0 until 30).map { i =>
      val fmt = Seq("wav", "aiff", "au")(i % 3)
      (fmt, 8000 + rnd.nextInt(8) * 5000, 1 + rnd.nextInt(2), 1 + rnd.nextInt(5000))
    }
    cases.foreach { case (fmt, rate, ch, frames) =>
      val row = AudioCodec.decodeHeaderRow(AudioCodec.encodeAudio(fmt, rate, ch, frames))
      assert(row != null, s"$fmt $rate/$ch/$frames must decode")
      val expectExt = Map("wav" -> "wav", "aiff" -> "aif", "au" -> "au")(fmt)
      assert(row.getUTF8String(0).toString == expectExt)
      assert(row.getInt(1) == rate && row.getInt(2) == ch && row.getInt(3) == 16)
      assert(row.getLong(4) == frames.toLong, s"$fmt frame count")
    }
  }

  test("PII scrub is idempotent: redaction tokens never re-match the patterns") {
    val run = Extensions.entries.find(_._1 == "x_pii_scrub").get._2
    val once = run(spark, d)
    // re-scrubbing the planted corpus changes nothing: token text contains
    // no '@'+TLD shape, phone shape, or dotted quad
    val pats = Seq(
      """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""",
      """\b\d{3}-\d{4}\b""",
      """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b""")
    pats.foreach { p =>
      assert(!"[EMAIL][PHONE][IP]".matches(s".*$p.*"), s"token matches $p")
    }
    // and the aggregate gate itself is stable across evaluations
    assert(once.collect().sameElements(run(spark, d).collect()))
  }

  test("domain-mix thresholds match the closed-form BIGINT formula") {
    val run = Extensions.entries.find(_._1 == "x_domain_mix").get._2
    val got = run(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, d)
    val sums = docs.groupBy("source")
      .agg(sum(col("n_chars")).cast("long").as("chars_s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = sums.values.sum
    got.foreach { case (src, t) =>
      val w = 1L + src.drop(3).toLong % 5
      val expect = math.min(65536L, (w * total * 65536L) / (120L * sums(src)))
      assert(t == expect, s"$src: threshold $t != $expect")
      assert(t > 0 && t <= 65536L)
    }
  }

  test("edit-distance verifier: exact DP values through the broadcast pair plumbing") {
    import spark.implicits._
    // classic DP reference, computed in the test itself
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumped over the lazy dog"),
      (3L, "a completely different document")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val got = Extensions.pairEditDistance(docs, pairs)
      .select("doc_a", "doc_b", "edit_dist").as[(Long, Long, Int)].collect()
      .map { case (a, b, v) => (a, b) -> v }.toMap
    assert(got((1L, 2L)) == lev(docs.collect()(0).getString(1), docs.collect()(1).getString(1)))
    assert(got((1L, 3L)) == lev(docs.collect()(0).getString(1), docs.collect()(2).getString(1)))
  }

  test("edit distance is the order-SENSITIVE verifier Jaccard is not") {
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = a.split(" ").reverse.mkString(" ")
    val df = Seq((a, b)).toDF("a", "b")
      .select(graft.functions.TextFunctions.jaccardOf(
          graft.functions.TextFunctions.tokens(col("a")),
          graft.functions.TextFunctions.tokens(col("b"))).as("j"),
        levenshtein(col("a"), col("b")).as("lev"))
    val r = df.collect()(0)
    assert(r.getDouble(0) == 1.0, "token-set Jaccard is blind to reordering")
    assert(r.getInt(1) > 0, "levenshtein sees the reordering")
  }

  test("boilerplate fraction matches an independent in-memory computation") {
    val gate = Extensions.entries.find(_._1 == "x_boilerplate_ngrams").get._2
    val got = gate(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split("\\s+").filter(_.nonEmpty).sliding(5).filter(_.length == 5)
          .map(_.mkString(" ")).toSet)
    val dfreq = docs.flatMap(_._2).groupBy(identity).map { case (g, xs) => g -> xs.length }
    val expect = docs.collect { case (id, sh) if sh.nonEmpty =>
      val shared = sh.count(g => dfreq(g) >= 2).toLong
      (id, sh.size.toLong, shared, shared.toDouble / sh.size)
    }.filter(_._4 >= 0.5).sortBy(_._1)
    assert(expect.nonEmpty, "fixture must contain high-overlap docs")
    assert(got.toSeq == expect.toSeq)
  }

  test("tfidf top-k matches an independent in-memory computation") {
    val gate = Extensions.entries.find(_._1 == "x_tfidf").get._2
    val got = gate(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val texts = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq)
    val n = texts.length.toLong
    val tf = texts.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, xs) => (id, t, xs.length.toLong) } }
    val dfreq = tf.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val expect = tf.map { case (id, t, f) => (id, t, f, dfreq(t), (f * n).toDouble / dfreq(t)) }
      .sortBy { case (id, t, _, _, sc) => (-sc, t, id) }.take(15)
    assert(got.toSeq == expect.toSeq)
  }

  test("heavy hitters: sample-verified counts are EXACT for every emitted token") {
    val gate = Extensions.entries.find(_._1 == "x_heavy_hitters").get._2
    val got = gate(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val occs = Tables.documents(spark, d).select("doc_id", "text").collect()
      .flatMap(r => r.getString(1).split("\\s+").filter(_.nonEmpty))
    val trueCounts = occs.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val total = occs.length.toLong
    assert(got.nonEmpty, "fixture vocabulary must contain heavy hitters")
    got.foreach { case (tok, freq, share) =>
      assert(freq == trueCounts(tok), s"$tok: emitted count must be the EXACT count")
      assert(freq * 64 >= total, s"$tok: support below the exact threshold")
      assert(share == freq.toDouble / total)
    }
    // completeness is sample-bounded, not exact — but anything WELL above
    // the threshold (2x) cannot be missed by a 1/16 occurrence sample here
    trueCounts.filter { case (_, c) => c * 32 >= total }.keys.foreach { t =>
      assert(got.exists(_._1 == t), s"$t is 2x over threshold yet missing")
    }
  }

  test("containment: every planted excerpt is found at containment 1.0") {
    val gate = Extensions.entries.find(_._1 == "x_containment").get._2
    val got = gate(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // each planted excerpt (id+200000, first 15 tokens of doc id%25==0 with
    // >= 5 tokens — nomination needs one shared 5-gram) is contained in its
    // source: the pair must be emitted with containment exactly 1.0
    val sources = Tables.documents(spark, d)
      .filter(col("doc_id") % 25 === 0 &&
        size(graft.functions.TextFunctions.tokens(col("text"))) >= 5)
      .select("doc_id").collect().map(_.getLong(0))
    assert(sources.nonEmpty)
    sources.foreach { id =>
      assert(got.exists(p => p._1 == id + 200000L && p._2 == id && p._3 == 1.0),
        s"excerpt of doc $id not found at containment 1.0")
    }
    // asymmetry: a long source is NOT emitted as contained in its excerpt
    // (unless the doc has <= 17 tokens, making excerpt == whole doc)
    val longSources = Tables.documents(spark, d)
      .filter(col("doc_id") % 25 === 0 &&
        size(graft.functions.TextFunctions.tokens(col("text"))) >= 30)
      .select("doc_id").collect().map(_.getLong(0))
    longSources.foreach { id =>
      assert(!got.exists(p => p._1 == id && p._2 == id + 200000L),
        s"long doc $id wrongly 'contained' in its own 15-token excerpt")
    }
  }

  test("incremental dedup matches an in-memory replay; both rejection classes reject") {
    val gate = Extensions.entries.find(_._1 == "x_incremental_dedup").get._2
    val got = gate(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val rows = Tables.documents(spark, d).select("doc_id", "lang", "n_chars", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hist = rows.filter(_._1 % 2 == 0)
    val batch = rows.filter(_._1 % 2 == 1) ++
      hist.filter(_._1 % 10 == 0).map(r => (r._1 + 300000L, r._2, r._3, r._4)) ++
      rows.filter(_._1 % 20 == 1).map(r => (r._1 + 400000L, r._2, r._3, r._4))
    val histFps = hist.map(r => md5hex(r._4)).toSet
    val firstIn = batch.groupBy(r => md5hex(r._4)).map { case (fp, xs) =>
      fp -> xs.map(_._1).min }
    val admittedIds = firstIn.collect {
      case (fp, id) if !histFps.contains(fp) => id }.toSet
    // planted rejections: every +300000 re-crawl and +400000 resubmission out
    assert(batch.exists(_._1 >= 300000L), "fixture must plant rejections")
    assert(admittedIds.forall(_ < 300000L), "a planted duplicate was admitted")
    val expect = batch.filter(r => admittedIds.contains(r._1))
      .groupBy(_._2).map { case (lang, xs) =>
        (lang, xs.length.toLong, xs.map(_._3).sum) }
      .toSeq.sortBy(_._1)
    assert(got.toSeq == expect)
  }

  test("heavy hitters property: full replay on random skewed corpora, 3 seeds") {
    import spark.implicits._
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    for (seed <- Seq(11, 22, 33)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 40).map(i => s"w$i")
      // zipf-ish skew: low indices dominate
      def draw(): String = vocab(math.min(39, (math.pow(rnd.nextDouble(), 2.5) * 40).toInt))
      val corpus = (0 until 120).map(i =>
        (i.toLong, Seq.fill(10 + rnd.nextInt(40))(draw()).mkString(" ")))
      val got = Extensions.heavyHitters(corpus.toDF("doc_id", "text"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
      // exact in-memory replay of the operator's contract
      val occ = corpus.flatMap { case (id, text) =>
        text.split("\\s+").filter(_.nonEmpty).zipWithIndex
          .map { case (t, p) => (id, p + 1, t) } }
      val sampled = occ.filter { case (id, p, t) => md5hex(s"$id:$p:$t").startsWith("0") }
      val sc = sampled.groupBy(_._3).map { case (t, xs) => t -> xs.length.toLong }
      val ts = sc.values.sum
      val cand = sc.collect { case (t, c) if c * 128 >= ts => t }.toSet
      val total = occ.length.toLong
      val expect = occ.filter(o => cand(o._3)).groupBy(_._3)
        .map { case (t, xs) => (t, xs.length.toLong) }
        .collect { case (t, f) if f * 64 >= total => (t, f, f.toDouble / total) }
        .toSeq.sortBy { case (t, f, _) => (-f, t) }
      assert(got == expect, s"seed $seed: replay diverged")
      assert(expect.nonEmpty, s"seed $seed: degenerate fixture (no heavy hitters)")
    }
  }

  test("chunk windows: exact replay, full token coverage, short tail kept") {
    val gate = Extensions.entries.find(_._1 == "x_chunk_windows").get._2
    val got = gate(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, d).filter(col("doc_id") % 7 === 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("\\s+").filter(_.nonEmpty).toSeq)
      .filter(_._2.nonEmpty)
    assert(docs.nonEmpty)
    val expect = docs.flatMap { case (id, t) =>
      val n = t.length
      val starts = 1 to math.max(1, n - 8) by 24
      starts.zipWithIndex.map { case (st, k) =>
        val w = t.slice(st - 1, math.min(n, st - 1 + 32))
        (id, k.toLong, w.length.toLong, md5hex(w.mkString(" ")))
      }
    }.sortBy(x => (x._1, x._2)).toSeq
    assert(got.toSeq == expect)
    // coverage: per doc, the last window's end reaches the final token and
    // consecutive windows leave no gap (chunk k ends past chunk k+1's
    // start ⟺ every non-final chunk is longer than the 24-token stride)
    docs.foreach { case (id, t) =>
      val rows = expect.filter(_._1 == id)
      val lastStart = 1 + (rows.length - 1) * 24
      assert(lastStart - 1 + rows.last._3 == t.length, s"doc $id tail uncovered")
      rows.init.foreach { r =>
        assert(r._3 > 24, s"doc $id chunk ${r._2}: gap before the next window")
      }
    }
  }

  test("neardup-edit gate contract: fixture text is pure ASCII") {
    // Spark levenshtein counts codepoint edits, DuckDB's counts BYTE edits
    // — identical only on ASCII. Pin the fixture's ASCII-ness so a future
    // corpus change fails HERE, loudly, instead of hash-diverging the gate.
    val nonAscii = Tables.documents(spark, d)
      .filter(col("text").rlike("[^\\x00-\\x7F]")).count()
    assert(nonAscii == 0,
      "x_neardup_edit's oracle is byte-based; non-ASCII text breaks its cross-engine contract")
  }

  test("corpus shuffle order is invariant under repartitioning") {
    val h = md5(concat(lit("epoch1:"), col("doc_id").cast("string")))
    def firstPerShard(parts: Int): Map[String, Long] =
      Tables.documents(spark, d).repartition(parts)
        .withColumn("h", h).withColumn("shard", substring(col("h"), 1, 1))
        .groupBy("shard").agg(min_by(col("doc_id"), col("h")).as("first"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = firstPerShard(2)
    val b = firstPerShard(13)
    assert(a == b && a.nonEmpty, "shard heads must not depend on physical layout")
  }

  test("keyword search: index answers match direct text scan; probes prune") {
    val run = Extensions.entries.find(_._1 == "x_keyword_search").get._2
    val got = run(spark, d).collect()
    // every emitted row certifies both probes pruned the index
    assert(got.nonEmpty)
    assert(got.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      "both term probes must touch fewer files than the index holds")
    // independent recompute straight from text (no index)
    val direct = Tables.documents(spark, d)
      .select(col("doc_id"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .groupBy("doc_id")
      .agg(sum(when(col("t") === "merge", 1L).otherwise(0L)).as("a"),
        sum(when(col("t") === "window", 1L).otherwise(0L)).as("b"))
      .filter(col("a") > 0 && col("b") > 0)
      .select(col("doc_id"), (col("a") + col("b")).as("score"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      assert(direct(r.getLong(0)) == r.getLong(1), s"tf mismatch for doc ${r.getLong(0)}")
    }
    // top-20 cut must agree with the direct ranking (score desc, id asc)
    val wantTop = direct.toSeq.sortBy { case (id, sc) => (-sc, id) }.take(20).map(_._1)
    assert(got.map(_.getLong(0)).toSeq == wantTop)
  }

  test("funnel: strict step ordering on a planted fixture; one keyed exchange") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.expressions.Window
    // planted users: 1 completes in order; 2 purchases BEFORE clicking
    // (must stall at 2); 3 clicks before viewing (stalls at 1); 4 never
    // views (0); 5 re-views after converting (gaps anchor to FIRST view)
    def ts(m: Int) = java.sql.Timestamp.from(java.time.Instant.parse(
      f"2024-01-01T00:$m%02d:00Z"))
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("ts", TimestampType)))
    val rows = Seq(
      (1L, "view", 1), (1L, "click", 2), (1L, "purchase", 5),
      (2L, "view", 1), (2L, "purchase", 2), (2L, "click", 3),
      (3L, "click", 1), (3L, "view", 2),
      (4L, "click", 1), (4L, "purchase", 2),
      (5L, "view", 1), (5L, "click", 2), (5L, "purchase", 3), (5L, "view", 4))
    val ev = spark.createDataFrame(
      rows.map { case (u, t, m) => Row(u, t, ts(m)) }.asJava, schema)
    val w = Window.partitionBy("user_id")
    val staged = ev
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ts") > col("t1"), col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ts") > col("t2"), col("ts"))).over(w))
    val got = staged.groupBy("user_id")
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"), min(col("t3")).as("t3"))
      .select(col("user_id"),
        when(col("t3").isNotNull, 3L).when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L).otherwise(0L).as("reached"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // user 3's click precedes their first view, so no click qualifies and
    // they stall at stage 1 — the strict-ordering semantics in one case
    assert(got == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L, 5L -> 3L),
      s"funnel stages wrong: $got")
    // the three windows + the user rollup share ONE user_id exchange
    val gate = Extensions.entries.find(_._1 == "x_funnel").get._2
    val plan = gate(spark, d).queryExecution.executedPlan.toString
    val keyedExchanges =
      "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size
    assert(keyedExchanges <= 1,
      s"funnel must reuse one user_id exchange, found $keyedExchanges:\n$plan")
  }

  test("retention cohorts: week-0 activity equals each cohort's size") {
    val gate = Extensions.entries.find(_._1 == "x_retention_cohorts").get._2
    val got = gate(spark, d).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    val cohortSizes = Tables.events(spark, d)
      .groupBy("user_id").agg(to_date(min(col("ts"))).as("cohort_day"))
      .groupBy("cohort_day").count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(cohortSizes.nonEmpty)
    cohortSizes.foreach { case (day, size) =>
      assert(got((day, 0L)) == size,
        s"cohort $day: week-0 active ${got.get((day, 0L))} != cohort size $size")
    }
    // offsets are non-negative (first event anchors the cohort)
    assert(got.keys.forall(_._2 >= 0L))
  }

  test("skyline equals in-memory brute-force dominance on the fixture") {
    val gate = Extensions.entries.find(_._1 == "x_skyline").get._2
    val got = gate(spark, d).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    val pts = Tables.part(spark, d)
      .select(col("p_size"), col("p_retailprice").cast("decimal(12,2)").as("price"))
      .collect().map(r => (r.getInt(0), r.getDecimal(1)))
    // brute force: a point survives iff NO point has (price ≤, size ≥)
    // with one strict — computed over distinct pairs, support counted after
    val pairs = pts.distinct
    val sky = pairs.filter { case (sz, pr) =>
      !pairs.exists { case (sz2, pr2) =>
        pr2.compareTo(pr) <= 0 && sz2 >= sz &&
          (pr2.compareTo(pr) < 0 || sz2 > sz)
      }
    }
    val want = sky.map { case (sz, pr) =>
      (sz, pr.doubleValue, pts.count(p => p._1 == sz && p._2.compareTo(pr) == 0).toLong)
    }.sortBy(_._1)
    assert(got.toSeq == want.toSeq, s"got ${got.toSeq}\nwant ${want.toSeq}")
    // sanity: along a (min price, max size) frontier the two criteria
    // TRADE OFF — a larger frontier size must cost strictly more, else the
    // smaller-size point would be dominated
    val frontier = got.map(g => (g._1, g._2)).sortBy(_._1)
    assert(frontier.sliding(2).forall {
      case Array((_, p1), (_, p2)) => p2 > p1; case _ => true })
  }

  test("event transitions: matrix mass equals events minus users") {
    val gate = Extensions.entries.find(_._1 == "x_event_transitions").get._2
    val got = gate(spark, d).collect()
    // each user with n events contributes exactly n-1 transitions, so the
    // matrix's total mass is a closed form of two corpus counts
    val ev = Tables.events(spark, d)
    val want = ev.count() - ev.select("user_id").distinct().count()
    assert(got.map(_.getLong(2)).sum == want,
      s"transition mass ${got.map(_.getLong(2)).sum} != events-users $want")
    // per-cell user support never exceeds the cell's transition count
    assert(got.forall(r => r.getLong(3) <= r.getLong(2) && r.getLong(3) >= 1L))
  }
}
