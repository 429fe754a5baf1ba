package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class FunctionsSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) =
    spark.createDataFrame(
      rows.map { case (i, t) => Row(i, t) }.asJava,
      StructType(Seq(StructField("id", LongType), StructField("text", StringType))))

  test("dedup signatures: exact vs bag-of-words vs minhash vs simhash semantics") {
    val df = docs(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"),        // exact dup of 1
      (3L, "fox brown quick the"),        // token-set dup of 1, different order
      (4L, "a completely different text"))
    val sigs = df.select(
      TextFunctions.fingerprint(col("text")).as("fp"),
      TextFunctions.bagOfWordsSignature(col("text")).as("bow"),
      TextFunctions.minhashSignature(col("text")).as("mh"),
      TextFunctions.simhash(col("text")).as("sh")).collect()
    assert(sigs(0).getString(0) == sigs(1).getString(0)) // exact dup same fp
    assert(sigs(0).getString(0) != sigs(2).getString(0)) // reorder changes fp
    assert(Set(0, 1, 2).map(sigs(_).getString(1)).size == 1) // bow ignores order
    assert(sigs(3).getString(1) != sigs(0).getString(1))
    assert(Set(0, 1, 2).map(sigs(_).getString(2)).size == 1) // minhash on token set
    assert(sigs(0).getString(3).length == 16 && sigs(0).getString(3).forall(c => c == '0' || c == '1'))
  }

  test("itemHashes ignores null items (public-API arrays may carry them)") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array('a', 'b')),
        |  (2L, array('a', CAST(NULL AS STRING), 'b')),
        |  (3L, array(CAST(NULL AS STRING))),
        |  (4L, array('a', 'b', 'a'))
        |AS t(id, items)""".stripMargin)
    val out = df.select(col("id"), TextFunctions.minhashFromHashes(
      TextFunctions.itemHashes(col("items")), k = 4).as("sig"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1).isDefined && out(1) == out(2) && out(1) == out(4),
      "null items and duplicates must not change the signature")
    assert(out(3).isEmpty, "all-null item arrays yield NULL (no candidacy)")
  }

  test("TIME surrogate: micros-of-day round-trips parse/format/extract") {
    import graft.functions.TimeFunctions._
    val df = spark.sql(
      "SELECT * FROM VALUES ('00:00:00'), ('12:34:56'), ('23:59:59.999999') AS t(s)")
    val out = df.select(
      timeFromString(col("s")).as("us"),
      timeToString(timeFromString(col("s"))).as("str"),
      hourOfTime(timeFromString(col("s"))).as("h")).collect()
    assert(out(0).getLong(0) == 0L && out(0).getString(1) == "00:00:00")
    assert(out(1).getLong(0) == (12L * 3600 + 34 * 60 + 56) * 1000000L)
    assert(out(1).getString(1) == "12:34:56" && out(1).getLong(2) == 12L)
    assert(out(2).getLong(0) == 86399999999L && out(2).getLong(2) == 23L)
    // malformed input -> NULL, even under ANSI mode (try_cast, not cast)
    val bad = spark.sql("SELECT * FROM VALUES ('not:a:time'), ('12:xx:00') AS t(s)")
      .select(timeFromString(col("s")).as("us")).collect()
    assert(bad.forall(_.isNullAt(0)), "malformed times must be NULL, not an ANSI error")
    // the declared field is LongType + annotation, and survives a copy
    val f = timeField("tod")
    assert(isTimeField(f) && f.dataType == org.apache.spark.sql.types.LongType)
  }

  test("uuid surrogate: deterministic UUIDv4-shaped strings, annotated field") {
    import graft.functions.TimeFunctions._
    val out = spark.sql("SELECT * FROM VALUES ('a'), ('b'), ('a') AS t(s)")
      .select(uuidFromBytes(col("s")).as("u")).collect().map(_.getString(0))
    assert(out.forall(_.matches("[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-8[0-9a-f]{3}-[0-9a-f]{12}")),
      s"not uuid-shaped: ${out.toSeq}")
    assert(out(0) == out(2) && out(0) != out(1), "must be deterministic per input")
    val f = uuidField("uid")
    assert(f.metadata.getString(graft.format.GraftSchema.LogicalTypeKey) == "uuid")
  }

  test("token counting + quality gates") {
    val df = docs((1L, "the a the data data x"), (2L, ("word " * 600).trim))
    val out = df.select(
      TextFunctions.tokenCount(col("text")),
      TextFunctions.stopwordRatio(col("text"), Seq("the", "a", "data")),
      TextFunctions.qualityPass(col("text"), 2, 500, Seq("the", "a", "data"), 0.5)).collect()
    assert(out(0).getLong(0) == 6L)
    assert(math.abs(out(0).getDouble(1) - 5.0 / 6.0) < 1e-12)
    assert(!out(0).getBoolean(2)) // stop ratio too high
    assert(out(1).getLong(0) == 600L)
    assert(!out(1).getBoolean(2)) // too long
    // ALL whitespace tokenizes — newlines/tabs must not fuse tokens
    val ws = docs((3L, "hello\nworld\tagain  twice"))
    assert(ws.select(TextFunctions.tokenCount(col("text"))).head.getLong(0) == 4L)
    // empty doc: ratios are defined (ANSI-safe), quality still fails on
    // the token-count bound; empty-vs-empty Jaccard is 1.0 by convention
    val empty = docs((4L, "   "))
    val r = empty.select(
      TextFunctions.stopwordRatio(col("text"), Seq("the")),
      TextFunctions.qualityPass(col("text"), 2, 500, Seq("the"), 0.5),
      TextFunctions.jaccardTokens(col("text"), col("text"))).head()
    assert(r.getDouble(0) == 0.0 && !r.getBoolean(1) && r.getDouble(2) == 1.0)
  }

  test("cosine math: known vectors") {
    val schema = StructType(Seq(
      StructField("a", ArrayType(FloatType)), StructField("b", ArrayType(FloatType))))
    val df = spark.createDataFrame(Seq(
      Row(Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),   // orthogonal
      Row(Seq(1.0f, 1.0f), Seq(2.0f, 2.0f)),   // parallel
      Row(Seq(3.0f, 4.0f), Seq(3.0f, 4.0f))).asJava, schema)
    val out = df.select(
      VectorFunctions.cosineSimilarity(col("a"), col("b")),
      VectorFunctions.dot(col("a"), col("b")),
      VectorFunctions.norm(col("a")),
      VectorFunctions.euclideanDistance(col("a"), col("b"))).collect()
    assert(math.abs(out(0).getDouble(0)) < 1e-12)
    assert(math.abs(out(1).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(out(2).getDouble(2) - 5.0) < 1e-12)
    assert(math.abs(out(2).getDouble(3)) < 1e-12)
    assert(math.abs(out(0).getDouble(3) - math.sqrt(2)) < 1e-12)
  }

  test("LSH top-k agrees with brute force when the bucket holds the true neighbors") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    // all positive first-8-dims -> single bucket; neighbors of q = (1,1,...)
    val rows = (1L to 20L).map { i =>
      Row(i, (1 to 8).map(j => (1.0f + (i % 7) * 0.1f * j)).toSeq)
    }
    val df = spark.createDataFrame(rows.asJava, schema)
    val q = spark.createDataFrame(
      Seq(Row(Seq.fill(8)(1.0f))).asJava,
      StructType(Seq(StructField("q", ArrayType(FloatType)))))
    val brute = VectorFunctions.bruteForceTopK(df, q, "vec_id", "embedding", 5)
      .select("rank", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val lsh = VectorFunctions.lshTopK(df, q, "vec_id", "embedding", 5)
      .select("rank", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(brute == lsh)
    assert(brute.map(_._1) == (1L to 5L))
  }

  test("knnJoin: per-query results equal bruteForceTopK; invariant under fanout") {
    val d = "/root/testdata/sf0.001"
    val e = graft.queries.Tables.embeddings(spark, d)
    val corpus = e.filter(col("vec_id") % 10 =!= 0)
    // deterministic query pick — limit() on an unordered frame may choose
    // different rows on each of the several jobs this test runs
    val queries = e.filter(col("vec_id").isin(0L, 10L, 20L))
    val got = VectorFunctions
      .knnJoin(corpus, queries, "vec_id", "embedding", "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // reference: one bruteForceTopK per query
    val expect = queries.select(col("vec_id"), col("embedding").as("q")).collect().flatMap { qr =>
      val qid = qr.getLong(0)
      val q1 = queries.filter(col("vec_id") === qid).select(col("embedding").as("q"))
      VectorFunctions.bruteForceTopK(corpus, q1, "vec_id", "embedding", 4)
        .collect().map(r => (qid, r.getLong(0), r.getLong(1)))
    }.toSet
    assert(got == expect)
    // bucketed two-stage reduces to the single-stage plan at fanout=1
    val f1 = VectorFunctions
      .knnJoin(corpus, queries, "vec_id", "embedding", "vec_id", "embedding", k = 4, fanout = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(f1 == got)
  }

  test("knnJoin: NaN-lane and zero-norm corpus vectors never occupy a rank") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    // 3 real vectors + a NaN-lane vector (cosine = NaN — Spark sorts NaN
    // ABOVE every real number, so an unfiltered NaN would take rank 1) +
    // a zero vector (cosine = NULL)
    val corpus = spark.createDataFrame(Seq(
      Row(1L, Seq(1.0f, 0.0f)), Row(2L, Seq(0.5f, 0.5f)), Row(3L, Seq(0.0f, 1.0f)),
      Row(4L, Seq(Float.NaN, 1.0f)), Row(5L, Seq(0.0f, 0.0f))).asJava, schema)
    val queries = spark.createDataFrame(
      Seq(Row(100L, Seq(1.0f, 0.0f))).asJava, schema)
    val got = VectorFunctions
      .knnJoin(corpus, queries, "vec_id", "embedding", "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq.sorted
    // only the 3 real vectors rank, in cosine order; ids 4 and 5 are absent
    assert(got == Seq((1L, 1L), (2L, 2L), (3L, 3L)), s"got $got")
  }

  test("knnJoin property: random vectors at several fanouts match an in-memory ranking") {
    val rnd = new scala.util.Random(7)
    val dim = 8
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    def vecs(n: Int, off: Long) = (0 until n).map(i =>
      Row(off + i, Seq.fill(dim)(rnd.nextFloat() * 2f - 1f)))
    val corpusRows = vecs(60, 0L)
    val queryRows = vecs(4, 1000L)
    val corpus = spark.createDataFrame(corpusRows.asJava, schema)
    val queries = spark.createDataFrame(queryRows.asJava, schema)
    // mirror cosineSimilarity's exact op order: per-element double products
    // folded left, sqrt'd norms multiplied, one division
    def sim(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      val na = math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      val nb = math.sqrt(b.foldLeft(0.0)((acc, x) => acc + x.toDouble * x.toDouble))
      dot / (na * nb)
    }
    val expect = queryRows.flatMap { qr =>
      val qid = qr.getLong(0)
      val q = qr.getSeq[Float](1)
      corpusRows.map(cr => (qid, cr.getLong(0), sim(q, cr.getSeq[Float](1))))
        .sortBy { case (_, id, s) => (-s, id) }.take(6)
        .zipWithIndex.map { case ((_, id, _), r) => (qid, (r + 1).toLong, id) }
    }.toSet
    Seq(1, 3, 32).foreach { fanout =>
      val got = VectorFunctions
        .knnJoin(corpus, queries, "vec_id", "embedding", "vec_id", "embedding",
          k = 6, fanout = fanout)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"fanout=$fanout diverged from the in-memory ranking")
    }
  }

  test("shingles + token-set Jaccard") {
    val df = docs((1L, "a b c d"), (2L, "b c d e"), (3L, "x"))
    val sh = df.select(TextFunctions.shingles(col("text"), 2)).collect()
    assert(sh(0).getSeq[String](0) == Seq("a b", "b c", "c d"))
    assert(sh(2).getSeq[String](0) == Nil) // shorter than k
    val pair = df.filter(col("id") === 1).crossJoin(
      df.filter(col("id") === 2).select(col("text").as("other")))
    val j = pair.select(TextFunctions.jaccardTokens(col("text"), col("other"))).head.getDouble(0)
    assert(math.abs(j - 3.0 / 5.0) < 1e-15) // {b,c,d} of {a,b,c,d,e}
  }

  test("banded MinHash: near-dups share a band; distinct docs don't collide on all bands") {
    val df = docs(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),   // 5/7 token overlap with 1
      (3L, "one two three four five six"))
    val rows = df.select(col("id"),
      TextFunctions.minhashBands(TextFunctions.tokens(col("text")), bands = 6, rowsPerBand = 1))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(rows(1).length == 6)
    // OR-construction: similar docs share at least one of the 6 single-row bands
    assert(rows(1).zip(rows(2)).exists { case (a, b) => a == b },
      "near-dup pair should collide in some band")
    assert(!rows(1).zip(rows(3)).forall { case (a, b) => a == b },
      "disjoint docs must not collide in every band")
  }

  test("IVF top-k equals brute force with full probing; cell assignment is nearest-centroid") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    // two clusters around (0,0) and (10,10)
    val rows = (1L to 10L).map(i => Row(i, Seq((i % 5).toFloat * 0.1f, (i % 3).toFloat * 0.1f))) ++
      (11L to 20L).map(i => Row(i, Seq(10f + (i % 5) * 0.1f, 10f + (i % 3) * 0.1f)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val centroids = Seq(Seq(0f, 0f), Seq(10f, 10f))
    val q = spark.createDataFrame(Seq(Row(Seq(10.1f, 10.1f))).asJava,
      StructType(Seq(StructField("q", ArrayType(FloatType)))))

    val cells = df.select(VectorFunctions.ivfAssign(col("embedding"), centroids)).collect()
      .map(_.getInt(0))
    assert(cells.take(10).forall(_ == 0) && cells.drop(10).forall(_ == 1))

    val brute = VectorFunctions.bruteForceTopK(df, q, "vec_id", "embedding", 5)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val ivf1 = VectorFunctions.ivfTopK(df, q, "vec_id", "embedding", 5, centroids, nprobe = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val ivfAll = VectorFunctions.ivfTopK(df, q, "vec_id", "embedding", 5, centroids,
      nprobe = centroids.size).select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(ivfAll == brute)              // full probe == exact
    assert(ivf1.forall(_ >= 11L))        // single probe stays in the query's cluster
  }

  test("lshBands: band b hashes dims [b·bits, (b+1)·bits), prefixed so bands never cross-collide") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(Seq(
      Row(1L, Seq(1f, -1f, 1f, 1f)),
      Row(2L, Seq(1f, -1f, -1f, -1f)),   // same band 0 as vec 1, different band 1
      Row(3L, Seq(-1f, 1f, 1f, 1f)),     // same band 1 as vec 1
      Row(4L, Seq(1f, -1f, 1f, -1f)),    // sign pattern "10" in BOTH bands
      Row(5L, Seq(1f, -1f, 1f))).asJava, schema) // band 1 extends past the vector
    val bands = df.select(col("vec_id"),
      VectorFunctions.lshBands(col("embedding"), bands = 2, bits = 2).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(bands(1L) == Seq("0:10", "1:11"))
    assert(bands(1L)(0) == bands(2L)(0) && bands(1L)(1) != bands(2L)(1))
    assert(bands(1L)(1) == bands(3L)(1) && bands(1L)(0) != bands(3L)(0))
    // the band prefix keeps an IDENTICAL sign pattern in different bands
    // apart — vec 4 hashes "10" in both bands, yet its cells are distinct
    assert(bands(4L) == Seq("0:10", "1:10"))
    assert(bands(4L).distinct.length == 2)
    // an out-of-range band is DROPPED, not emitted as a universal "1:"
    // cell (which would cross-join every short vector with everything)
    assert(bands(5L) == Seq("0:10"))
  }

  test("ivfCellExact / ivfProbeCellsExact: d² argmin with cid tie-break; nprobe=1 is the head of the probe list") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    val df = spark.createDataFrame(Seq(
      Row(1L, Seq(0.1f, 0.0f)),
      Row(2L, Seq(5.0f, 5.1f)),
      Row(3L, Seq(2.5f, 2.5f))).asJava, schema) // equidistant from both centroids
    val cents = Seq(0L -> Array(0.0, 0.0), 1L -> Array(5.0, 5.0))
    val cells = df.orderBy("vec_id").select(
      VectorFunctions.ivfCellExact(col("embedding"), cents)).collect().map(_.getLong(0))
    assert(cells.toSeq == Seq(0L, 1L, 0L)) // the tie at (2.5, 2.5) breaks to the lower cid
    val probes = df.orderBy("vec_id").select(
      VectorFunctions.ivfProbeCellsExact(col("embedding"), cents, nprobe = 2))
      .collect().map(_.getSeq[Long](0))
    assert(probes.map(_.head).toSeq == cells.toSeq,
      "probe list head must equal the single-cell assignment")
    assert(probes.forall(_.toSeq.sorted == Seq(0L, 1L)),
      "nprobe = |centroids| probes every cell exactly once")
  }

  test("langId marker precedence") {
    val df = docs((1L, "the a dog"), (2L, "the dog"), (3L, "dog"))
    val out = df.select(TextFunctions.langId(col("text"),
      Seq("en" -> Seq("the", "a"), "en-weak" -> Seq("the")), "other")).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("en", "en-weak", "other"))
  }

  test("k-means training recovers cluster structure and beats bad fixed centroids") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    // three well-separated clusters
    // directions differ too (cosine ranks by angle; IVF cells are euclidean)
    val rows =
      (1L to 10L).map(i => Row(i, Seq((i % 5).toFloat * 0.1f, 5f + (i % 3) * 0.1f))) ++
      (11L to 20L).map(i => Row(i, Seq(10f + (i % 5) * 0.1f, 10f + (i % 3) * 0.1f))) ++
      (21L to 30L).map(i => Row(i, Seq(-10f + (i % 5) * 0.1f, 20f + (i % 3) * 0.1f)))
    val df = spark.createDataFrame(rows.asJava, schema)

    val trained = VectorFunctions.kmeansCentroids(df, "embedding", k = 3, iters = 5)
    // deterministic: retraining yields bit-identical centroids
    assert(trained == VectorFunctions.kmeansCentroids(df, "embedding", k = 3, iters = 5))
    // every true cluster is represented: each cluster center has a trained
    // centroid within distance 1 (cluster radius is ~0.6)
    for (c <- Seq(Seq(0f, 5f), Seq(10f, 10f), Seq(-10f, 20f))) {
      val d = trained.map(t => math.sqrt(t.zip(c).map { case (a, b) =>
        val x = a - b; x * x }.sum.toDouble)).min
      assert(d < 1.0, s"no trained centroid near $c (min dist $d): $trained")
    }

    // recall@5 for a query in cluster 2: trained centroids + nprobe=1 find
    // the true neighbors; deliberately bad fixed centroids do not
    val q = spark.createDataFrame(Seq(Row(Seq(10.1f, 10.1f))).asJava,
      StructType(Seq(StructField("q", ArrayType(FloatType)))))
    val brute = VectorFunctions.bruteForceTopK(df, q, "vec_id", "embedding", 5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    def recall(cents: Seq[Seq[Float]]): Double = {
      val got = VectorFunctions.ivfTopK(df, q, "vec_id", "embedding", 5, cents, nprobe = 1)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      got.intersect(brute).size.toDouble / brute.size
    }
    assert(recall(trained) == 1.0, "trained IVF must find all true neighbors")

    // Lloyd's iterations strictly improve the quantizer objective (within-
    // cell SSE) over the raw farthest-point seeds
    def sse(cents: Seq[Seq[Float]]): Double = {
      val d = array_min(array(cents.map(c =>
        VectorFunctions.euclideanDistance(col("embedding"), lit(c.toArray))): _*))
      df.select(sum(d * d)).head.getDouble(0)
    }
    val seeds = VectorFunctions.kmeansCentroids(df, "embedding", k = 3, iters = 0)
    assert(sse(trained) < sse(seeds),
      s"training did not reduce SSE: ${sse(trained)} !< ${sse(seeds)}")
  }
}
