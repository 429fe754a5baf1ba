package graft.queries

import graft.SparkSpec

/** Independent in-memory recomputation of the behavioral-analytics gates
  * added in round 8's later sessions (co-occurrence PMI, integer-exact
  * anomaly days), plus plan pins for their one-exchange shapes.
  */
class AnalyticsOpsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

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

  test("x_cooccurrence pair generation plans ONE window over one exchange") {
    val df = Extensions.entries.find(_._1 == "x_cooccurrence").get._2(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    val windows = "(?m)^\\s*[+:*-]*\\s*Window ".r.findAllIn(plan).length
    assert(windows == 1, s"expected exactly 1 Window operator, got $windows:\n$plan")
  }
}
