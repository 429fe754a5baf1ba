package graft.queries

import graft.SparkSpec

/** Independent in-memory recomputation of the behavioral-analytics gates
  * added in round 8's later sessions (co-occurrence PMI, integer-exact
  * anomaly days), plus plan pins for their one-exchange shapes.
  */
class AnalyticsOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def md5hex(x: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("x_cooccurrence matches brute-force windowed pair counting") {
    val rows = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").collect()
    val toks = rows.map(r =>
      Option(r.getString(1)).getOrElse("").split("\\s+").filter(_.nonEmpty))
    val pairs = toks.flatMap { ts =>
      ts.indices.flatMap { i =>
        (1 to 3).flatMap { k =>
          if (i + k < ts.length) {
            val (a, b) = (ts(i), ts(i + k))
            Some(if (a <= b) (a, b) else (b, a))
          } else None
        }
      }
    }
    val nPairs = pairs.length.toDouble
    val pc = pairs.groupBy(identity).map { case (p, o) => p -> o.length.toLong }
    val uni = toks.flatten.groupBy(identity).map { case (t, o) => t -> o.length.toDouble }
    val expect = pc.filter(_._2 >= 5).map { case ((a, b), c) =>
      (a, b, c, c.toDouble * nPairs / (uni(a) * uni(b)))
    }.toSeq.sortBy { case (a, b, _, pmi) => (-pmi, a, b) }.take(20)
    val got = Extensions.entries.find(_._1 == "x_cooccurrence").get._2(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3, s"pair: $g vs $e")
      assert(math.abs(g._4 - e._4) < 1e-12 * math.max(1.0, e._4), s"pmi: $g vs $e")
    }
    assert(got.forall(_._3 >= 5))
  }

  test("x_anomaly_days flag is the exact-integer z-test; z2 matches") {
    val ev = Tables.events(spark, d)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("day"))
      .collect().map(r => (r.getString(0), r.getDate(1).toString))
    val daily = ev.groupBy(identity).map { case ((t, day), o) => (t, day, o.length.toLong) }
    val byType = daily.groupBy(_._1)
    val expect = byType.flatMap { case (t, cells) =>
      val n = cells.size.toLong
      val s = cells.map(_._3).sum
      val q = cells.map(c => c._3 * c._3).sum
      val denom = n * q - s * s
      cells.map { case (_, day, x) =>
        val dev = x * n - s
        val z2 = if (denom > 0) dev.toDouble * dev.toDouble / denom.toDouble else 0.0
        (t, day, x, z2, denom > 0 && dev * dev > 9 * denom)
      }.toSeq.sortBy(c => (-c._4, c._2)).take(3)
    }.toSeq.sortBy(c => (c._1, c._2))
    val got = Extensions.entries.find(_._1 == "x_anomaly_days").get._2(spark, d)
      .collect().map(r =>
        (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq == expect, s"got ${got.toSeq}\nexpected $expect")
    // the flag is decided by the integer cross-multiplication, never the
    // double z2 — but away from the exact boundary they must agree
    got.foreach { case (_, _, _, z2, flag) =>
      if (z2 > 9.000001) assert(flag)
      if (z2 < 8.999999) assert(!flag)
    }
  }

  test("x_copurchase matches brute-force basket pair counting") {
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val baskets = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      .filter(_._2.length <= 64)
    val pc = baskets.values.flatMap { parts =>
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    val expect = pc.toSeq.map { case ((a, b), c) => (a, b, c) }
      .sortBy { case (a, b, c) => (-c, a, b) }.take(20)
    val got = Extensions.entries.find(_._1 == "x_copurchase").get._2(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
  }

  test("x_triangles matches brute-force counting and holds its invariants") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def keep(k: Long): Boolean = {
      val h = md.digest(k.toString.getBytes("UTF-8"))
      ((h(0) >> 4) & 0xf) < 4
    }
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
      .filter(x => keep(x._1))
    val edges = li.groupBy(_._1).values.flatMap { is =>
      val parts = is.map(_._2).distinct.sorted
      for (i <- parts.indices; j <- i + 1 until parts.length)
        yield (parts(i), parts(j))
    }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triangles = edges.toSeq.map { case (u, v) =>
      (adj(u) & adj(v)).size.toLong
    }.sum / 3 // each triangle counted once per edge
    val row = Extensions.entries.find(_._1 == "x_triangles").get._2(spark, d).head()
    val (ne, nw, np, nt, tr) = (row.getLong(0), row.getLong(1), row.getLong(2),
      row.getLong(3), row.getDouble(4))
    assert(ne == edges.size.toLong)
    assert(nt == triangles, s"triangles: got $nt expected $triangles")
    // each triangle closes exactly ONE degree-oriented wedge...
    assert(nt <= nw)
    // ...out of its THREE unoriented 2-paths
    assert(nw <= np && 3 * nt <= np)
    assert(tr == 3.0 * nt.toDouble / np.toDouble && tr <= 1.0)
  }

  test("x_pagerank matches a brute-force integer fixed-point power iteration") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def keep(k: Long): Boolean = ((md.digest(k.toString.getBytes)(0) >> 4) & 0xf) < 4
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
      .filter(x => keep(x._1))
    val und = li.groupBy(_._1).values.flatMap { is =>
      val ps = is.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val edges = und.toSeq ++ und.toSeq.map(e => (e._2, e._1))
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = outdeg.size.toLong
    val p0 = 1000000000000L / n
    val base = (15L * p0) / 100L
    var p: Map[Long, Long] = outdeg.map { case (k, _) => k -> p0 }
    for (_ <- 1 to 5) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => p(u) / outdeg(u) }.sum }
      p = in.map { case (v, s) => v -> (base + (85L * s) / 100L) }
    }
    val expect = p.toSeq.sortBy { case (node, pr) => (-pr, node) }.take(10)
    val got = Extensions.entries.find(_._1 == "x_pagerank").get._2(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect, s"got $got\nexpected $expect")
    // floor division only sheds mass: total stays under the initial S
    assert(p.values.sum <= 1000000000000L && p.values.forall(_ > 0))
  }

  test("x_session_paths matches brute-force sessionization") {
    val ev = Tables.events(spark, d)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getLong(2), r.getString(3)))
    val paths = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._2, e._3))
      val sessions = scala.collection.mutable.ArrayBuffer(
        scala.collection.mutable.ArrayBuffer[String]())
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (prev != Long.MinValue && e._2 - prev > 1800000L)
          sessions += scala.collection.mutable.ArrayBuffer[String]()
        sessions.last += e._4
        prev = e._2
      }
      sessions.map(_.take(5).mkString(">"))
    }
    val expect = paths.groupBy(identity).map { case (p, o) => (p, o.size.toLong) }
      .toSeq.sortBy { case (p, c) => (-c, p) }.take(15)
    val got = Extensions.entries.find(_._1 == "x_session_paths").get._2(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect, s"got $got\nexpected $expect")
  }

  test("x_ols_trend matches the closed-form least-squares slope") {
    val ev = Tables.events(spark, d)
      .select(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("day"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay))
    val expect = ev.groupBy(_._1).map { case (t, rows) =>
      val daily = rows.groupBy(_._2).map { case (x, o) => (x, o.length.toLong) }
      val n = daily.size.toLong
      val sx = daily.keys.sum
      val sy = daily.values.sum
      val sxx = daily.keys.map(x => x * x).sum
      val sxy = daily.map { case (x, y) => x * y }.sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      (t, n, num, den,
        if (den > 0) num.toDouble / den.toDouble else 0.0, num > 0)
    }.toSeq.sortBy(_._1)
    val got = Extensions.entries.find(_._1 == "x_ols_trend").get._2(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5))).toSeq
    assert(got == expect, s"got $got\nexpected $expect")
  }

  test("x_simpson_diversity matches brute-force token concentration") {
    val rows = spark.read.parquet(s"$d/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0),
        Option(r.getString(1)).getOrElse("").split("\\s+").filter(_.nonEmpty)))
    val expect = rows.groupBy(_._1).flatMap { case (lang, ds) =>
      val counts = ds.flatMap(_._2).groupBy(identity).map { case (_, o) => o.length.toLong }
      if (counts.isEmpty) None else {
        val total = counts.sum
        val ss = counts.map(c => c * c).sum
        Some((lang, counts.size.toLong, total, ss,
          1.0 - ss.toDouble / (total.toDouble * total.toDouble),
          total.toDouble * total.toDouble / ss.toDouble))
      }
    }.toSeq.sortBy(_._1)
    val got = Extensions.entries.find(_._1 == "x_simpson_diversity").get._2(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5))).toSeq
    assert(got == expect, s"got $got\nexpected $expect")
    // a healthy distribution has effective vocab well above 1
    assert(got.forall(g => g._6 > 1.0 && g._5 > 0.0 && g._5 < 1.0))
  }

  test("x_domain_cap matches brute-force hash-order capping") {
    val rows = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expect = rows.groupBy(_._2).map { case (src, ds) =>
      val kept = ds.map(r => (md5hex(r._1.toString), r._1, r._3))
        .sortBy(t => (t._1, t._2)).take(80)
      (src, ds.length.toLong, kept.length.toLong, (ds.length - kept.length).toLong,
        kept.map(_._3).sum, kept.map(_._1).max)
    }.toSeq.sortBy(_._1)
    val got = Extensions.entries.find(_._1 == "x_domain_cap").get._2(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSeq
    assert(got == expect, s"got $got\nexpected $expect")
  }

  test("x_label_purity matches a brute-force nearest-centroid recompute") {
    val rows = spark.read.parquet(s"$d/embeddings.parquet")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def quantize(v: Array[Float]): Array[Long] = {
      val amax = v.map(x => math.abs(x.toDouble)).max
      if (amax == 0) v.map(_ => 0L)
      else v.map(x => math.floor(x.toDouble * 127.0 / amax + 0.5).toLong)
    }
    val coded = rows.map(r => (r._1, quantize(r._2), r._3))
    val dim = coded.head._2.length
    val cents = coded.groupBy(_._3).map { case (lab, vs) =>
      lab -> Array.tabulate(dim)(i => vs.map(_._2(i)).sum) }
    val s2 = cents.map { case (lab, sl) => lab -> sl.map(v => v * v).sum }
    val expect = coded.map { case (_, codes, label) =>
      val scored = cents.toSeq.map { case (lab, sl) =>
        val dot = codes.indices.map(i => codes(i) * sl(i)).sum
        (dot.toDouble / math.sqrt(s2(lab).toDouble), lab)
      }
      // max score, ties to the SMALLER label (mirrors ORDER BY score DESC, clabel)
      val assigned = scored.sortBy { case (sc, lab) => (-sc, lab) }.head._2
      (label, assigned)
    }.groupBy(identity).map { case ((l, a), o) => (l, a, o.length.toLong) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = Extensions.entries.find(_._1 == "x_label_purity").get._2(spark, d)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expect, s"got $got\nexpected $expect")
    assert(got.map(_._3).sum == rows.length.toLong)
  }

  test("x_bootstrap_ci matches a brute-force Poisson bootstrap and brackets the mean") {
    val rows = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def weight(id: Long, r: Int): Long = {
      val h2 = md5hex(s"${id}_$r").substring(0, 2)
      if (h2 < "5e") 0L else if (h2 < "bc") 1L else if (h2 < "eb") 2L
      else if (h2 < "fb") 3L else 4L
    }
    val means = (0 until 40).map { r =>
      val ws = rows.map { case (id, x) => (weight(id, r), x) }
      val sw = ws.map(_._1).sum
      (r, ws.map { case (w, x) => w * x }.sum.toDouble / sw.toDouble, sw)
    }
    val sorted = means.sortBy { case (r, m, _) => (m, r) }
    val (expectLo, expectHi) = (sorted(1)._2, sorted(37)._2)
    val grand = rows.map(_._2).sum.toDouble / rows.length
    val got = Extensions.entries.find(_._1 == "x_bootstrap_ci").get._2(spark, d).head()
    assert(got.getLong(0) == rows.length.toLong)
    assert(got.getDouble(1) == grand)
    assert(got.getDouble(2) == expectLo && got.getDouble(3) == expectHi,
      s"ci: got (${got.getDouble(2)}, ${got.getDouble(3)}) expected ($expectLo, $expectHi)")
    // statistical sanity: the interval brackets the grand mean, and the
    // Poisson(1) weights resample ~the corpus size per replicate
    assert(got.getDouble(2) <= grand && grand <= got.getDouble(3))
    means.foreach { case (_, _, sw) =>
      assert(math.abs(sw.toDouble / rows.length - 1.0) < 0.2, s"weight mass $sw") }
  }

  test("x_ngram_novelty matches brute-force first-seen accounting") {
    val rows = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)).getOrElse("").split("\\s+").filter(_.nonEmpty)))
    def grams3(t: Array[String]): Set[String] =
      (0 until math.max(0, t.length - 2))
        .map(i => s"${t(i)} ${t(i + 1)} ${t(i + 2)}").toSet
    val docGrams = rows.map(r => (r._1, r._2, grams3(r._3))).filter(_._3.nonEmpty)
    val firstSeen = docGrams.flatMap(r => r._3.map(_ -> r._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expect = docGrams.groupBy(_._2).map { case (lang, ds) =>
      val grams = ds.map(_._3.size.toLong).sum
      val novel = ds.map(dg => dg._3.count(g => firstSeen(g) == dg._1).toLong).sum
      (lang, ds.length.toLong, grams, novel, novel.toDouble / grams.toDouble)
    }.toSeq.sortBy(_._1)
    val got = Extensions.entries.find(_._1 == "x_ngram_novelty").get._2(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expect, s"got $got\nexpected $expect")
    // every gram is novel exactly once: Σ novel = |distinct grams|
    assert(got.map(_._4).sum == firstSeen.size.toLong)
  }

  test("x_hits matches a brute-force max-normalized integer iteration") {
    val S = 1000000L
    val orders = Tables.orders(spark, d).select("o_orderkey", "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = Tables.lineitem(spark, d).select("l_orderkey", "l_partkey")
      .collect().map(r => (orders(r.getLong(0)), r.getLong(1))).distinct
    var hub = edges.map(_._1).distinct.map(_ -> S).toMap
    var auth = Map.empty[Long, Long]
    for (i <- 1 to 3) {
      val aRaw = edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => hub(e._1)).sum }
      val aMax = aRaw.values.max
      auth = aRaw.map { case (p, a) => p -> (a * S) / aMax }
      if (i < 3) {
        val hRaw = edges.groupBy(_._1).map { case (c, es) =>
          c -> es.map(e => auth(e._2)).sum }
        val hMax = hRaw.values.max
        hub = hRaw.map { case (c, h) => c -> (h * S) / hMax }
      }
    }
    val expect = auth.toSeq.sortBy { case (p, a) => (-a, p) }.take(10)
    val got = Extensions.entries.find(_._1 == "x_hits").get._2(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect, s"got $got\nexpected $expect")
    // max-normalization pins the top authority at exactly S
    assert(got.head._2 == S)
  }

  test("x_cooccurrence pair generation plans ONE window over one exchange") {
    val df = Extensions.entries.find(_._1 == "x_cooccurrence").get._2(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    val windows = "Window \\[".r.findAllIn(plan).length
    assert(windows == 1, s"expected exactly 1 Window operator, got $windows:\n$plan")
  }
}
