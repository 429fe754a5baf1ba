package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-10 hardening beyond the oracle gates: state-table maintenance
  * composing with incremental correctness (x_incremental_dedup_compacted),
  * the durable first-seen novelty state (x_incremental_novelty), ANN recall
  * invariants (x_ann_recall), and the algebraic identity of the hoisted
  * iterative-rank helpers against the unhoisted two-joins-per-round shape.
  */
class StateMaintenanceSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def gate(name: String): (org.apache.spark.sql.SparkSession, String) => DataFrame =
    Extensions.entries.find(_._1 == name).get._2

  test("compacted incremental dedup: flags certify maintenance, admissions unchanged") {
    val rows = gate("x_incremental_dedup_compacted")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), "compaction must strictly reduce the file count")
      assert(r.getBoolean(4), "compaction must preserve every state row")
      assert(r.getLong(5) == 3L, "append + append + compact = 3 commits")
    }
    // admissions equal an in-memory replay that never compacts: maintenance
    // must be invisible to the dedup decision
    val docs = Tables.documents(spark, d)
      .select("doc_id", "lang", "n_chars", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val hist = docs.filter(_._1 % 3 != 2).map(t => md5(t._4)).toSet
    val batch = docs.filter(_._1 % 3 == 2) ++
      docs.filter(t => t._1 % 3 != 2 && t._1 % 10 == 0)
        .map(t => (t._1 + 300000L, t._2, t._3, t._4)) ++
      docs.filter(_._1 % 30 == 2).map(t => (t._1 + 400000L, t._2, t._3, t._4))
    val firstIn = batch.groupBy(t => md5(t._4)).map { case (fp, ds) => fp -> ds.map(_._1).min }
    val admitted = firstIn.collect { case (fp, id) if !hist.contains(fp) => id }.toSet
    val expect = batch.filter(t => admitted.contains(t._1))
      .groupBy(_._2).map { case (lang, ds) => lang -> (ds.size.toLong, ds.map(_._3).sum) }
    val got = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect, s"admissions diverged: $got vs $expect")
  }

  test("incremental novelty: durable state equals the corpus gram inventory") {
    val rows = gate("x_incremental_novelty")(spark, d).collect()
    assert(rows.nonEmpty)
    val allGrams = Tables.documents(spark, d)
      .select(explode(array_distinct(
        graft.functions.TextFunctions.shingles(col("text"), 3))).as("g"))
      .agg(countDistinct(col("g"))).head.getLong(0)
    rows.foreach { r =>
      assert(r.getBoolean(5), "compaction must strictly reduce the file count")
      assert(r.getBoolean(6), "compaction must preserve every state row")
      assert(r.getBoolean(7), "the state append must be append-only")
      assert(r.getLong(8) == 4L, "append + append + compact + append = 4 commits")
      assert(r.getLong(9) == allGrams,
        "post-append state must hold exactly the corpus's distinct grams")
      assert(r.getLong(3) <= r.getLong(2), "novel grams bounded by batch grams")
    }
    // batch novelty equals the transient whole-stream computation restricted
    // to the batch: persistence must not change the answer
    val gr = Tables.documents(spark, d).select(col("doc_id"), col("lang"),
        explode(array_distinct(graft.functions.TextFunctions.shingles(col("text"), 3))).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val histGrams = gr.filter(_._1 % 2 == 0).map(_._3).toSet
    val bg = gr.filter(_._1 % 2 == 1)
    val firstInBatch = bg.groupBy(_._3).map { case (g, rs) => g -> rs.map(_._1).min }
    val perLang = bg.groupBy(_._2).map { case (lang, rs) =>
      val novel = rs.count(t => !histGrams.contains(t._3) && firstInBatch(t._3) == t._1)
      lang -> (rs.map(_._1).distinct.size.toLong, rs.size.toLong, novel.toLong)
    }
    val got = rows.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == perLang, s"batch novelty diverged: $got vs $perLang")
  }

  test("ann recall: hits bounded by brute_k, multi-probe dominates single-probe, brute list equals in-memory top-10") {
    val rows = gate("x_ann_recall")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (bk, lsh, lshMp, ivf, ivfMp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(bk >= 1 && bk <= 10)
      for ((n, h) <- Seq("lsh" -> lsh, "lsh_mp" -> lshMp, "ivf" -> ivf, "ivf_mp" -> ivfMp))
        assert(h >= 0 && h <= bk, s"${n}_hits $h out of [0, $bk]")
      // the single cell IS band 0 / the probe-list head, so the multi-probe
      // candidate pool is a superset — and a superset pool's top-10 keeps
      // every true neighbor the smaller pool found (they outrank whatever
      // displaced them): per-query monotone, not just on average
      assert(lshMp >= lsh, s"multi-band recall $lshMp < single-cell $lsh")
      assert(ivfMp >= ivf, s"nprobe=4 recall $ivfMp < single-cell $ivf")
    }
    // the ground-truth side: knnJoin's per-query top-10 equals a driver-side
    // brute force over the same floats (cosine in doubles, ties by id)
    val e = Tables.embeddings(spark, d).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val queries = e.filter(_._1 % 97 == 0)
    val corpus = e.filter(_._1 % 97 != 0)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble; nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      val den = math.sqrt(na) * math.sqrt(nb)
      if (den == 0.0) Double.NaN else dot / den
    }
    val expectTop = queries.map { case (qid, qv) =>
      qid -> corpus.map { case (cid, cv) => (cid, cos(cv, qv)) }
        .filter(t => !t._2.isNaN)
        .sortBy { case (cid, sim) => (-sim, cid) }.take(10).map(_._1).toSet
    }.toMap
    import graft.functions.{VectorFunctions => VF}
    val emb = Tables.embeddings(spark, d)
    val got = VF.knnJoin(emb.filter(col("vec_id") % 97 =!= 0),
        emb.filter(col("vec_id") % 97 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
        "vec_id", "embedding", "query_id", "q_emb", k = 10)
      .collect().groupBy(_.getLong(0))
      .map { case (qid, rs) => qid -> rs.map(_.getLong(2)).toSet }
    assert(got == expectTop, "knnJoin ground truth diverged from driver brute force")
  }

  test("compacted keyword index: probes still prune, answers equal the uncompacted index") {
    val rows = gate("x_keyword_index_compacted")(spark, d).collect()
    rows.foreach { r =>
      assert(r.getBoolean(2), "compaction must strictly reduce the file count")
      assert(r.getBoolean(3), "term probes must still partition-prune after the rewrite")
    }
    // the compacted index answers exactly like the never-compacted one
    val plain = gate("x_keyword_search")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq == plain.toSeq,
      "compaction changed the AND-query answer")
  }

  test("hoisted pagerank equals the unhoisted two-joins-per-round shape") {
    import spark.implicits._
    // a planted graph with skewed degrees + an isolated 2-cycle
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (5L, 6L))
      .toDF("u", "v")
    val edges = und.union(und.select(col("v").as("u"), col("u").as("v")))
    val got = Extensions.pagerankScores(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // reference: the pre-r10 loop body (edges ⋈ outdeg ⋈ p per round)
    val e2 = edges.localCheckpoint()
    val outdeg = e2.groupBy(col("u")).agg(count(lit(1)).as("outdeg"))
    val nN = outdeg.count()
    val p0 = 1000000000000L / nN
    val base = (15L * p0) / 100L
    var p = outdeg.select(col("u").as("node"), lit(p0).as("p"))
    for (_ <- 1 to 5) {
      p = e2.join(outdeg, "u")
        .join(p.select(col("node").as("u"), col("p")), "u")
        .select(col("v").as("node"), expr("p div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_sum"))
        .select(col("node"), (lit(base) + expr("(85 * in_sum) div 100")).as("p"))
        .localCheckpoint()
    }
    val expect = p.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expect, s"hoist changed the fixed point: $got vs $expect")
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // the high-degree hub must outrank every spoke
    assert(got(1L) > got(4L))
  }

  test("chunk dedup: full keep-first replay; whole-doc recrawls keep zero chunks") {
    val rows = gate("x_chunk_dedup")(spark, d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val boiler = " subscribe to our newsletter all rights reserved contact us privacy policy terms of service cookie notice"
    val base = Tables.documents(spark, d).select("doc_id", "lang", "text").collect()
      .map { r =>
        val t = if (r.getLong(0) % 5 == 0) r.getString(2) + boiler else r.getString(2)
        (r.getLong(0), r.getString(1), t)
      }
    val corpus = base ++ base.filter(_._1 % 20 == 0).map(t => (t._1 + 500000L, t._2, t._3))
    // chunk instances in (doc_id, ci) order; key = the chunk STRING itself
    // (the gate hashes it — replaying on raw strings proves the semantics,
    // not just the md5 plumbing)
    val inst = corpus.flatMap { case (id, lang, text) =>
      val t = text.trim.split("\\s+").filter(_.nonEmpty)
      t.grouped(16).zipWithIndex.map { case (c, ci) =>
        (id, lang, ci.toLong, c.length.toLong, c.mkString(" "))
      }
    }
    val first = inst.groupBy(_._5).map { case (k, is) =>
      k -> is.map(i => (i._1, i._3)).min
    }
    val perLang = inst.groupBy(_._2).map { case (lang, is) =>
      val kept = is.filter(i => first(i._5) == ((i._1, i._3)))
      lang -> (is.map(_._1).distinct.size.toLong, is.size.toLong,
        kept.size.toLong, is.map(_._4).sum, kept.map(_._4).sum)
    }
    assert(rows == perLang, s"replay diverged: $rows vs $perLang")
    // a whole-doc recrawl's every chunk already exists at a lower doc_id
    val recrawlIds = corpus.map(_._1).filter(_ >= 500000L).toSet
    val recrawlKept = inst.filter(i => recrawlIds.contains(i._1))
      .count(i => first(i._5) == ((i._1, i._3)))
    assert(recrawlKept == 0, s"recrawled docs kept $recrawlKept chunks")
  }

  test("clustered ann recall: every panel query >=8/10 with a ~25% cell-pruned candidate set") {
    val rows = gate("x_ann_recall_clustered")(spark, d).collect()
    assert(rows.nonEmpty)
    val corpusRows = Tables.embeddings(spark, d)
      .filter(col("vec_id") % 97 =!= 0).count()
    rows.foreach { r =>
      assert(r.getLong(1) == 10L, "the clustered corpus must yield a full brute top-10")
      val cand = r.getLong(2)
      // nprobe=2 of 8 roughly-equal cells: the probe reads ~25% of the
      // corpus, never all of it — the gate must stay cell-pruned
      assert(cand > 0 && cand < (corpusRows * 2) / 5,
        s"cand_rows $cand is not a pruned probe of $corpusRows corpus rows")
      assert(r.getLong(3) >= 8L, s"recall floor broken: ${r.getLong(3)}")
    }
  }

  test("persisted multiprobe index: pruned 2-of-8-cell read still recalls >=8/10") {
    val rows = gate("x_ann_index_multiprobe")(spark, d).collect()
    assert(rows.length == 10, "the pruned probe must fill all 10 ranks")
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L), "ranks must be 1..10")
    rows.foreach { r =>
      assert(r.getBoolean(3), "the probe scan must partition-prune")
      assert(r.getLong(4) == 2L, "the probe must read exactly nprobe=2 cells")
    }
    val hits = rows.count(_.getBoolean(2))
    assert(hits >= 8, s"pruned-probe recall $hits/10 below the floor")
  }

  test("compacted incremental neardup: maintenance flags certify, admissions equal the uncompacted gate") {
    val rows = gate("x_incremental_neardup_compacted")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), "compaction must strictly reduce the file count")
      assert(r.getBoolean(3), "compaction must preserve every signature row")
      assert(r.getBoolean(4), "the post-compaction batch append must be append-only")
      assert(r.getLong(5) == 4L, "append + append + compact + append = 4 commits")
    }
    // same fixture, same nomination, same verify — the only difference is
    // the mid-sequence rewrite, so admissions must match exactly
    val plain = gate("x_incremental_neardup")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == plain, s"compaction changed admissions: $got vs $plain")
  }

  test("incremental chunk dedup: keep-first-across-crawls replay; recrawls keep zero; state equals the corpus chunk inventory") {
    val rows = gate("x_incremental_chunk_dedup")(spark, d).collect()
    assert(rows.nonEmpty)
    val boiler = " subscribe to our newsletter all rights reserved contact us privacy policy terms of service cookie notice"
    val base = Tables.documents(spark, d).select("doc_id", "lang", "text").collect()
      .map { r =>
        val t = if (r.getLong(0) % 5 == 0) r.getString(2) + boiler else r.getString(2)
        (r.getLong(0), r.getString(1), t)
      }
    def chunksOf(docs: Array[(Long, String, String)]) = docs.flatMap {
      case (id, lang, text) =>
        val t = text.trim.split("\\s+").filter(_.nonEmpty)
        t.grouped(16).zipWithIndex.map { case (c, ci) =>
          (id, lang, ci.toLong, c.length.toLong, c.mkString(" "))
        }
    }
    val hist = base.filter(_._1 % 2 == 0)
    val batch = base.filter(_._1 % 2 == 1) ++
      hist.filter(_._1 % 20 == 0).map(t => (t._1 + 500000L, t._2, t._3))
    val histChunks = chunksOf(hist).map(_._5).toSet
    val bi = chunksOf(batch)
    val firstInBatch = bi.filter(i => !histChunks.contains(i._5))
      .groupBy(_._5).map { case (k, is) => k -> is.map(i => (i._1, i._3)).min }
    val perLang = bi.groupBy(_._2).map { case (lang, is) =>
      val kept = is.filter(i => firstInBatch.get(i._5).contains((i._1, i._3)))
      lang -> (is.map(_._1).distinct.size.toLong, is.size.toLong,
        kept.size.toLong, is.map(_._4).sum, kept.map(_._4).sum)
    }
    val got = rows.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == perLang, s"incremental replay diverged: $got vs $perLang")
    // every recrawled doc's chunks live in the state already — zero kept
    val recrawlKept = bi.filter(_._1 >= 500000L)
      .count(i => firstInBatch.get(i._5).contains((i._1, i._3)))
    assert(recrawlKept == 0, s"recrawled docs kept $recrawlKept chunks")
    // durable-state certification columns (state built in TWO crawls and
    // compacted mid-sequence before the batch probes it)
    val corpusChunks = (histChunks ++ bi.map(_._5)).size.toLong
    rows.foreach { r =>
      assert(r.getBoolean(7), "compaction must strictly reduce the file count")
      assert(r.getBoolean(8), "compaction must preserve every state row")
      assert(r.getBoolean(9), "the batch append must be append-only")
      assert(r.getLong(10) == 4L, "append + append + compact + append = 4 commits")
      assert(r.getLong(11) == corpusChunks,
        "state must hold exactly the corpus's distinct chunks")
    }
  }

  test("hits helper: scale-free fixed point, max authority pinned at S") {
    import spark.implicits._
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L), (4L, 12L))
      .toDF("c", "p")
    val a = Extensions.hitsAuthorities(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a.keySet == Set(10L, 11L, 12L))
    assert(a.values.max == 1000000L, "rescale pins max(a) at S exactly")
    assert(a(10L) > a(11L) && a(11L) >= a(12L),
      "three buyers (one influential) must dominate")
  }
  test("ann retraction then health-triggered compaction: flags certify, answers match the uncompacted retraction gate") {
    // the compacted gate's REQUIREs already pin the mechanism (delete-ratio
    // trigger, deletes folded, rows preserved, recall floor); here the
    // composition law: folding the position deletes must not change a
    // single probe answer vs the gate that leaves them outstanding
    val compactedRows = gate("x_ann_index_retract_compacted")(spark, d)
      .select("rank", "neighbor_id", "hit", "delete_ratio_triggered", "deletes_folded")
      .collect() // ONE run: the flags ride the same rows
    val outstanding = gate("x_ann_index_retract")(spark, d)
      .select("rank", "neighbor_id", "hit").collect()
    assert(compactedRows.nonEmpty && compactedRows.length == outstanding.length)
    compactedRows.zip(outstanding).foreach { case (c, o) =>
      assert(c.getLong(0) == o.getLong(0) && c.getLong(1) == o.getLong(1)
        && c.getBoolean(2) == o.getBoolean(2),
        s"compaction changed a probe answer: $c vs $o")
    }
    assert(compactedRows.forall(r => r.getBoolean(3) && r.getBoolean(4)))
  }
}
