package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class VectorQuantizeSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("emb", ArrayType(FloatType))))

  private def df(rows: Seq[(Long, Seq[Float])]) =
    spark.createDataFrame(rows.map { case (i, v) => Row(i, v) }.asJava, schema)

  test("quantizeInt8: codes in [-127,127], max lane hits ±127, zeros stay zero") {
    val d = df(Seq(
      (1L, Seq(1.0f, -2.0f, 0.5f)),       // amax 2 -> codes 64, -127, 32
      (2L, Seq(0.0f, 0.0f)),              // all-zero vector
      (3L, Seq(-3.0f))))                  // single negative lane -> -127
    val got = d.select(col("id"), VectorFunctions.quantizeInt8(col("emb")).as("q"))
      .select(col("id"), col("q.amax"), col("q.codes")).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getSeq[Int](2)))).toMap
    assert(got(1L)._1 == 2.0 && got(1L)._2 == Seq(64, -127, 32))
    assert(got(2L)._1 == 0.0 && got(2L)._2 == Seq(0, 0))
    assert(got(3L)._2 == Seq(-127))
  }

  test("sanitizeVector: NaN/Inf lanes -> 0, then quantization stays sane") {
    val d = df(Seq(
      (1L, Seq(Float.NaN, 1.0f, -2.0f)),
      (2L, Seq(Float.PositiveInfinity, 4.0f)),
      (3L, Seq(Float.NegativeInfinity, Float.NaN))))
    val got = d.select(col("id"),
      VectorFunctions.quantizeInt8(
        VectorFunctions.sanitizeVector(col("emb"))).as("q"))
      .select(col("id"), col("q.codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    // NaN lane -> 0; remaining lanes quantize against the finite amax
    assert(got(1L) == Seq(0, 64, -127))
    // an Inf lane no longer zeroes every other lane
    assert(got(2L) == Seq(0, 127))
    // all-poison vector behaves like the all-zero vector
    assert(got(3L) == Seq(0, 0))
  }

  test("dequantize bounds reconstruction error by amax/254 per lane") {
    val vecs = Seq(
      (1L, Seq(0.054f, -0.25f, 0.105f, 0.003f)),
      (2L, Seq(12.5f, -7.25f, 3.125f)))
    val d = df(vecs).withColumn("q", VectorFunctions.quantizeInt8(col("emb")))
      .withColumn("back", VectorFunctions.dequantizeInt8(col("q")))
      .withColumn("max_err", array_max(zip_with(col("emb"), col("back"),
        (a, b) => abs(a.cast("double") - b))))
      .withColumn("bound", col("q.amax") / 254.0)
    d.select("id", "max_err", "bound").collect().foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) + 1e-12,
        s"id ${r.getLong(0)}: err ${r.getDouble(1)} > bound ${r.getDouble(2)}")
    }
  }

  test("quantizedTopK with full-width candidates == exact brute force") {
    // m = corpus size means the coarse stage filters nothing: the re-rank
    // then IS brute force — the two-stage pipeline must reduce to it
    val e = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val corpus = e.filter(col("vec_id") =!= 0)
    val exact = VectorFunctions.bruteForceTopK(corpus, q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaQuant = VectorFunctions.quantizedTopK(corpus, q, "vec_id", "embedding", 10, 100000)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact == viaQuant)
    // and a REAL coarse cut (m=50) still recovers the exact top-10: the
    // int8 candidate recall is high enough on the synthetic corpus
    val cut = VectorFunctions.quantizedTopK(corpus, q, "vec_id", "embedding", 10, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(exact == cut, s"m=50 coarse cut changed the top-10: $exact vs $cut")
  }

  test("corpus columns named q/codes/qsim don't collide; stored-codes path == derived") {
    val e = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val corpus = e.filter(col("vec_id") =!= 0)
    val base = VectorFunctions.quantizedTopK(corpus, q, "vec_id", "embedding", 10, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // a corpus that already carries columns with the old internal names
    // must neither crash (ambiguous q) nor be silently rewritten (codes)
    val trapped = corpus.withColumn("q", lit(1))
      .withColumn("codes", lit("stored-elsewhere")).withColumn("qsim", lit(0.0))
    val viaTrapped = VectorFunctions.quantizedTopK(trapped, q, "vec_id", "embedding", 10, 50)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaTrapped == base, s"colliding corpus columns changed the answer")
    val bruteTrapped = VectorFunctions.bruteForceTopK(trapped, q, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bruteTrapped ==
      VectorFunctions.bruteForceTopK(corpus, q, "vec_id", "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // stored-codes shape: same answers through the join-back plan
    val stored = corpus.withColumn("c8",
      VectorFunctions.quantizeInt8(col("embedding")).getField("codes"))
    val viaStored = VectorFunctions.quantizedTopK(
      stored, q, "vec_id", "embedding", 10, 50, codesCol = Some("c8"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaStored == base, s"stored-codes path diverged: $viaStored vs $base")
    // the whole ANN family shares the q-column join convention — ivf and
    // lsh must survive a trapped corpus identically
    val centroids = corpus.filter(col("vec_id").isin(1L, 2L)).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toSeq).toSeq
    def ids(r: org.apache.spark.sql.DataFrame) =
      r.collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(ids(VectorFunctions.ivfTopK(trapped, q, "vec_id", "embedding", 5, centroids, 2)) ==
      ids(VectorFunctions.ivfTopK(corpus, q, "vec_id", "embedding", 5, centroids, 2)))
    assert(ids(VectorFunctions.lshTopK(trapped, q, "vec_id", "embedding", 5)) ==
      ids(VectorFunctions.lshTopK(corpus, q, "vec_id", "embedding", 5)))
  }

  test("degenerate all-zero vectors rank LAST, never hijack the top-k") {
    // a zero vector's cosine is undefined: it must yield NULL (sorts last
    // under desc), not NaN (sorts FIRST in Spark and would take rank 1)
    val d = df(Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 0.0f))))
    val q = spark.createDataFrame(Seq(Row(Seq(1.0f, 0.0f))).asJava,
      StructType(Seq(StructField("q", ArrayType(FloatType)))))
    val exact = VectorFunctions.bruteForceTopK(
      d.withColumnRenamed("emb", "embedding"), q, "id", "embedding", 3)
      .collect().map(_.getLong(1)).toSeq
    assert(exact.take(2) == Seq(1L, 2L) && !exact.take(2).contains(3L),
      s"zero vector must not outrank real neighbors: $exact")
    val viaQuant = VectorFunctions.quantizedTopK(
      d.withColumnRenamed("emb", "embedding"), q, "id", "embedding", 3, 10)
      .collect().map(_.getLong(1)).toSeq
    assert(viaQuant.take(2) == Seq(1L, 2L),
      s"zero CODES must not outrank real neighbors: $viaQuant")
  }

  test("quantized ANN recall holds across query vectors, not just one") {
    val e = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    Seq(1L, 7L, 42L, 99L).foreach { qid =>
      val q = e.filter(col("vec_id") === qid).select(col("embedding").as("q"))
      val corpus = e.filter(col("vec_id") =!= qid)
      val exact = VectorFunctions.bruteForceTopK(corpus, q, "vec_id", "embedding", 10)
        .collect().map(_.getLong(1)).toSet
      val cut = VectorFunctions.quantizedTopK(corpus, q, "vec_id", "embedding", 10, 50)
        .collect().map(_.getLong(1)).toSet
      assert(exact.intersect(cut).size >= 9,
        s"query $qid: recall@10 below 0.9 with m=50: $exact vs $cut")
    }
  }

  test("quantized cosine ranking agrees with float ranking on real embeddings") {
    // int8 quantization must preserve neighbor ordering to be usable for
    // ANN pre-filtering: top-10 by quantized-dot ranks the same ids as
    // exact cosine on the unit-norm-ish synthetic embeddings
    val e = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    val exact = VectorFunctions.bruteForceTopK(
      e.filter(col("vec_id") =!= 0), q, "vec_id", "embedding", 10)
      .collect().map(_.getLong(1)).toSeq
    val dq = e.withColumn("dq",
      VectorFunctions.dequantizeInt8(VectorFunctions.quantizeInt8(col("embedding"))))
      .select(col("vec_id"), col("dq").cast(ArrayType(FloatType)).as("embedding"))
    val approx = VectorFunctions.bruteForceTopK(
      dq.filter(col("vec_id") =!= 0), q, "vec_id", "embedding", 10)
      .collect().map(_.getLong(1)).toSeq
    // near-ties may swap ranks (quantization noise ≤ amax/254 per lane);
    // the head must agree and the candidate SET must be preserved — that
    // is the property ANN pre-filtering relies on
    assert(exact.take(4) == approx.take(4),
      s"top-4 must survive quantization: $exact vs $approx")
    assert(exact.toSet == approx.toSet,
      s"top-10 set must survive quantization: $exact vs $approx")
  }

  test("signMatrix: deterministic, ±1-only, roughly balanced, md5-derived") {
    val a = VectorFunctions.signMatrix(64, 8)
    val b = VectorFunctions.signMatrix(64, 8)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "regeneration must be identical")
    assert(a.flatten.forall(s => s == 1L || s == -1L))
    val plus = a.flatten.count(_ == 1L)
    assert(plus > 512 * 3 / 10 && plus < 512 * 7 / 10,
      s"md5 parity should be roughly balanced, got $plus/+512")
    // spot-check one entry against the definition: md5("0_0") first hex digit
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("0_0".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expect = if (hex.charAt(0) <= '7') 1L else -1L
    assert(a(0)(0) == expect)
  }

  test("signProject: exact vs naive driver-side recompute on random codes") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 50).map(i =>
      (i.toLong, Seq.fill(16)((rnd.nextInt(255) - 127).toFloat)))
    val signs = VectorFunctions.signMatrix(16, 4)
    val got = df(rows)
      .select(col("id"), VectorFunctions.signProject(
        VectorFunctions.quantizeInt8(col("emb"))("codes"), signs).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    rows.foreach { case (id, v) =>
      val amax = v.map(x => math.abs(x.toDouble)).max
      val codes =
        if (amax == 0.0) v.map(_ => 0L)
        else v.map(x => math.floor(x.toDouble * 127.0 / amax + 0.5).toLong)
      val want = signs.map(row => codes.zip(row).map { case (c, s) => c * s }.sum).toSeq
      assert(got(id) == want, s"row $id")
    }
  }

  test("signProject is map-only: no exchange in the projection plan") {
    val d = df(Seq((1L, Seq(1.0f, -2.0f, 0.5f))))
    val plan = d.select(VectorFunctions.signProject(
        VectorFunctions.quantizeInt8(col("emb"))("codes"),
        VectorFunctions.signMatrix(3, 2)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection must not shuffle:\n$plan")
  }

  test("ivfProbeCellsExact property: equals in-memory reduced-d2 argsort on random corpora, 3 seeds") {
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val dim = 8 + rnd.nextInt(8)
      val rows = (0 until 40).map(i =>
        (i.toLong, Seq.fill(dim)((rnd.nextInt(2001) - 1000).toFloat / 250f)))
      val k = 3 + rnd.nextInt(4)
      val cents = (0 until k).map(c =>
        c.toLong -> Array.fill(dim)((rnd.nextInt(2001) - 1000).toDouble / 250.0))
      val nprobe = 1 + rnd.nextInt(k)
      val got = df(rows).select(col("id"),
          VectorFunctions.ivfProbeCellsExact(col("emb"), cents, nprobe).as("cells"),
          VectorFunctions.ivfCellExact(col("emb"), cents).as("cell"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getLong(2))).toList
      // in-memory reference: the exact reduced-d2 score in the SAME fold
      // order (c·c folded left over doubles, v·c a left fold of widened
      // floats), argsorted with the cid tie-break
      def score(v: Seq[Float], c: Array[Double]): Double = {
        val cc = c.foldLeft(0.0)((a, x) => a + x * x)
        val vc = v.zip(c).foldLeft(0.0) { case (a, (x, y)) => a + x.toDouble * y }
        cc - 2.0 * vc
      }
      val byId = rows.toMap
      got.foreach { case (id, cells, cell) =>
        val want = cents.map { case (cid, c) => (score(byId(id), c), cid) }
          .sortBy { case (s, cid) => (s, cid) }.map(_._2).take(nprobe)
        assert(cells.toSeq == want, s"seed $seed id $id: $cells != $want")
        assert(cell == want.head, s"seed $seed id $id: head mismatch")
      }
    }
  }

  test("lshBands property: equals naive per-band recompute incl. short vectors, 3 seeds") {
    for (seed <- Seq(11, 12, 13)) {
      val rnd = new scala.util.Random(seed)
      val bands = 2 + rnd.nextInt(3)
      val bits = 2 + rnd.nextInt(3)
      // lengths straddle bands*bits so out-of-range bands occur
      val rows = (0 until 30).map { i =>
        val len = 1 + rnd.nextInt(bands * bits + 2)
        (i.toLong, Seq.fill(len)((rnd.nextInt(41) - 20).toFloat / 10f))
      }
      val got = df(rows).select(col("id"),
          VectorFunctions.lshBands(col("emb"), bands, bits).as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      rows.foreach { case (id, v) =>
        val want = (0 until bands).flatMap { b =>
          if (v.length >= (b + 1) * bits)
            Some(s"$b:" + v.slice(b * bits, (b + 1) * bits)
              .map(x => if (x >= 0f) "1" else "0").mkString)
          else None
        }
        assert(got(id) == want, s"seed $seed id $id: ${got(id)} != $want")
      }
    }
  }
}
