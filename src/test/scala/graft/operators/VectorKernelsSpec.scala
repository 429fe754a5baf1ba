package graft.operators

import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Bit-compat proof for the compiled vector kernels: every double the
  * CosineKernel/DotKernel produce must be BIT-equal (raw IEEE bits, not
  * approximate) to the interpreted HOF folds they replaced — the oracle
  * hashes depend on it. Adversarial shapes included: zero vectors, NaN and
  * ±Inf lanes, null lanes, length mismatches, float×double mixes.
  */
class VectorKernelsSpec extends SparkSpec {

  private val fschema = StructType(Seq(
    StructField("id", LongType),
    StructField("a", ArrayType(FloatType)),
    StructField("b", ArrayType(FloatType))))

  private def fdf(rows: Seq[(Long, Seq[java.lang.Float], Seq[java.lang.Float])]) =
    spark.createDataFrame(rows.map { case (i, x, y) => Row(i, x, y) }.asJava, fschema)

  private def bitsOrNull(r: Row, i: Int): Option[Long] =
    if (r.isNullAt(i)) None
    else Some(java.lang.Double.doubleToRawLongBits(r.getDouble(i)))

  test("cosine/dot kernels are bit-equal to the HOF folds on adversarial shapes") {
    val rows: Seq[(Long, Seq[java.lang.Float], Seq[java.lang.Float])] = Seq(
      (1L, Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)),
      (2L, Seq(0f, 0f, 0f), Seq(1f, 2f, 3f)),              // zero-norm side
      (3L, Seq(Float.NaN, 1f, 2f), Seq(1f, 1f, 1f)),       // NaN lane
      (4L, Seq(Float.PositiveInfinity, 1f), Seq(1f, 1f)),  // Inf lane
      (5L, Seq(1f, 2f), Seq(1f, 2f, 3f)),                  // length mismatch
      (6L, Seq[java.lang.Float](1f, null, 3f), Seq[java.lang.Float](1f, 1f, 1f)), // null lane
      (7L, null, Seq[java.lang.Float](1f, 1f)),            // whole side null
      (8L, Seq(1e-30f, -1e30f, 2.5f), Seq(-1e30f, 1e-30f, 4.25f)))
    val d = fdf(rows)
    val got = d.select(col("id"),
        VectorFunctions.cosineSimilarity(col("a"), col("b")).as("ck"),
        VectorFunctions.cosineSimilarityHof(col("a"), col("b")).as("ch"),
        VectorFunctions.dot(col("a"), col("b")).as("dk"),
        VectorFunctions.dotHof(col("a"), col("b")).as("dh"))
      .collect()
    got.foreach { r =>
      assert(bitsOrNull(r, 1) == bitsOrNull(r, 2),
        s"cosine bits diverged on id ${r.getLong(0)}: ${r.toString}")
      assert(bitsOrNull(r, 3) == bitsOrNull(r, 4),
        s"dot bits diverged on id ${r.getLong(0)}: ${r.toString}")
    }
    // the interesting rows actually exercised their branch
    val byId = got.map(r => r.getLong(0) -> r).toMap
    assert(bitsOrNull(byId(2L), 1).isEmpty, "zero-norm cosine must be NULL")
    assert(byId(3L).getDouble(1).isNaN, "NaN lane must propagate NaN")
    assert(bitsOrNull(byId(5L), 1).isEmpty && bitsOrNull(byId(5L), 3).isEmpty,
      "length mismatch must be NULL")
    assert(bitsOrNull(byId(6L), 1).isEmpty, "null lane must be NULL")
  }

  test("kernels bit-equal to HOFs on random float and mixed float x double corpora, 3 seeds") {
    for (seed <- Seq(21, 22, 23)) {
      val rnd = new scala.util.Random(seed)
      val dim = 8 + rnd.nextInt(60)
      val rows = (0 until 60).map { i =>
        def v = Seq.fill(dim)(java.lang.Float.valueOf((rnd.nextInt(4001) - 2000) / 500f))
        (i.toLong, v, v)
      }
      val d = fdf(rows)
        // mixed types: one side widened to array<double> like the
        // clustered gates' derived corpus
        .withColumn("bd", transform(col("b"), x => x.cast("double")))
      val got = d.select(
          VectorFunctions.cosineSimilarity(col("a"), col("bd")).as("ck"),
          VectorFunctions.cosineSimilarityHof(col("a"), col("bd")).as("ch"),
          VectorFunctions.dot(col("a"), col("bd")).as("dk"),
          VectorFunctions.dotHof(col("a"), col("bd")).as("dh"))
        .collect()
      got.foreach { r =>
        assert(bitsOrNull(r, 0) == bitsOrNull(r, 1), s"seed $seed cosine diverged")
        assert(bitsOrNull(r, 2) == bitsOrNull(r, 3), s"seed $seed dot diverged")
      }
    }
  }

  test("euclidean/quantized-cosine kernels bit-equal to their HOF forms, 3 seeds") {
    for (seed <- Seq(31, 32, 33)) {
      val rnd = new scala.util.Random(seed)
      val dim = 4 + rnd.nextInt(30)
      val rows = (0 until 50).map { i =>
        def v = Seq.fill(dim)(java.lang.Float.valueOf((rnd.nextInt(4001) - 2000) / 333f))
        (i.toLong, v, v)
      } :+ ((50L, Seq.fill(dim)(java.lang.Float.valueOf(0f)),
        Seq.fill(dim)(java.lang.Float.valueOf(0f)))) // zero codes → NULL qcos
      val d = fdf(rows)
      val codes = VectorFunctions.quantizeInt8(col("a")).getField("codes")
      val codesB = VectorFunctions.quantizeInt8(col("b")).getField("codes")
      val got = d.select(
          VectorFunctions.euclideanDistance(col("a"), col("b")).as("ek"),
          VectorFunctions.euclideanDistanceHof(col("a"), col("b")).as("eh"),
          VectorFunctions.quantizedCosine(codes, codesB).as("qk"),
          VectorFunctions.quantizedCosineHof(codes, codesB).as("qh"))
        .collect()
      got.foreach { r =>
        assert(bitsOrNull(r, 0) == bitsOrNull(r, 1), s"seed $seed euclidean diverged")
        assert(bitsOrNull(r, 2) == bitsOrNull(r, 3), s"seed $seed qcosine diverged")
      }
      assert(bitsOrNull(got.last, 2).isEmpty, "all-zero codes must score NULL")
    }
  }

  test("euclidean mixed float x double and quantized long paths bit-equal to HOFs") {
    val rnd = new scala.util.Random(41)
    val dim = 16
    val rows = (0 until 40).map { i =>
      def v = Seq.fill(dim)(java.lang.Float.valueOf((rnd.nextInt(4001) - 2000) / 333f))
      (i.toLong, v, v)
    }
    // euclidean against a DOUBLE literal — the exact shape ivfAssign/
    // kmeansCentroids probe with (float column vs constant centroid)
    val cent = Array.fill(dim)((rnd.nextInt(2001) - 1000) / 250.0)
    val d = fdf(rows)
      .withColumn("bd", transform(col("b"), x => x.cast("double")))
      .withColumn("cl", lit(cent))
    val got = d.select(
        VectorFunctions.euclideanDistance(col("a"), col("cl")).as("ek"),
        VectorFunctions.euclideanDistanceHof(col("a"), col("cl")).as("eh"),
        VectorFunctions.euclideanDistance(col("a"), col("bd")).as("mk"),
        VectorFunctions.euclideanDistanceHof(col("a"), col("bd")).as("mh"))
      .collect()
    got.foreach { r =>
      assert(bitsOrNull(r, 0) == bitsOrNull(r, 1), "float x double-literal euclidean diverged")
      assert(bitsOrNull(r, 2) == bitsOrNull(r, 3), "float x double euclidean diverged")
    }
    // quantized cosine over LONG code arrays (the aL/bL fast-path flag)
    val codesL = transform(VectorFunctions.quantizeInt8(col("a")).getField("codes"),
      x => x.cast("long"))
    val gotQ = d.select(
        VectorFunctions.quantizedCosine(codesL, codesL).as("qk"),
        VectorFunctions.quantizedCosineHof(codesL, codesL).as("qh"))
      .collect()
    gotQ.foreach { r =>
      assert(bitsOrNull(r, 0) == bitsOrNull(r, 1), "long-codes qcosine diverged")
    }
  }

  test("generic numeric path: int arrays and SQL decimal literals match the HOF cast semantics") {
    // int arrays through cosine/dot — the HOF accepted them via per-lane
    // cast("double"); the kernels' generic path must not narrow that
    val d = spark.range(1, 20).select(
      array(col("id").cast("int"), (col("id") * 2).cast("int"),
        (col("id") - 7).cast("int")).as("ia"),
      array((col("id") + 1).cast("int"), (col("id") * 3).cast("int"),
        lit(4)).as("ib"))
    val got = d.select(
        VectorFunctions.cosineSimilarity(col("ia"), col("ib")).as("ck"),
        VectorFunctions.cosineSimilarityHof(col("ia"), col("ib")).as("ch"),
        VectorFunctions.dot(col("ia"), col("ib")).as("dk"),
        VectorFunctions.dotHof(col("ia"), col("ib")).as("dh"))
      .collect()
    got.foreach { r =>
      assert(bitsOrNull(r, 0) == bitsOrNull(r, 1), "int-array cosine diverged")
      assert(bitsOrNull(r, 2) == bitsOrNull(r, 3), "int-array dot diverged")
    }
    // SQL decimal-literal arrays (what FunctionRegistry callers send)
    graft.functions.SqlFunctions.install(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0, 0.0), array(1.0, 0.0)) AS c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
  }

  test("quantizeInt8/signProject row kernels bit-equal to the HOF stacks, adversarial shapes + 3 seeds") {
    val shapes: Seq[(Long, Seq[java.lang.Float])] = Seq(
      (1L, Seq(1.0f, -2.0f, 0.5f)),
      (2L, Seq(0f, 0f)),                                  // all-zero → zero codes
      (3L, Seq(Float.NaN, 1f)),                            // NaN amax path
      (4L, Seq(Float.PositiveInfinity, 1f)),               // Inf amax path
      (5L, Seq[java.lang.Float](1f, null, 3f)),            // null lane
      (6L, Seq.empty[java.lang.Float]),                    // empty vector
      (7L, null))                                          // whole side null
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("emb", ArrayType(FloatType))))
    def qdf(rows: Seq[(Long, Seq[java.lang.Float])]) =
      spark.createDataFrame(rows.map { case (i, v) => Row(i, v) }.asJava, schema)
    def cmp(rows: Seq[(Long, Seq[java.lang.Float])]): Unit = {
      val got = qdf(rows).select(col("id"),
          VectorFunctions.quantizeInt8(col("emb")).as("k"),
          VectorFunctions.quantizeInt8Hof(col("emb")).as("h"))
        .select(col("id"), col("k.amax"), col("k.codes"), col("h.amax"), col("h.codes"))
        .collect()
      got.foreach { r =>
        val (ka, ha) = (bitsOrNull(r, 1), bitsOrNull(r, 3))
        assert(ka == ha, s"amax diverged on id ${r.getLong(0)}: $r")
        val kc = if (r.isNullAt(2)) null else r.getSeq[Any](2)
        val hc = if (r.isNullAt(4)) null else r.getSeq[Any](4)
        assert(kc == hc, s"codes diverged on id ${r.getLong(0)}: $kc vs $hc")
      }
    }
    cmp(shapes)
    for (seed <- Seq(51, 52, 53)) {
      val rnd = new scala.util.Random(seed)
      val dim = 8 + rnd.nextInt(56)
      cmp((0 until 60).map(i =>
        (i.toLong, Seq.fill(dim)(java.lang.Float.valueOf((rnd.nextInt(4001) - 2000) / 61f)))))
      // signProject over the quantized codes, incl. a wrong-length row and
      // a null-lane row that must project to NULL in both forms
      val signs = VectorFunctions.signMatrix(dim, 6)
      val rows = (0 until 40).map(i =>
        (i.toLong, Seq.fill(dim)(java.lang.Float.valueOf((rnd.nextInt(255) - 127).toFloat)))) ++
        Seq((98L, Seq.fill(dim + 1)(java.lang.Float.valueOf(1f))),
          (99L, (Seq.fill(dim - 1)(java.lang.Float.valueOf(1f)) :+
            (null: java.lang.Float))))
      val codes = VectorFunctions.quantizeInt8(col("emb")).getField("codes")
      val codesHof = VectorFunctions.quantizeInt8Hof(col("emb")).getField("codes")
      val got = qdf(rows).select(col("id"),
          VectorFunctions.signProject(codes, signs).as("k"),
          VectorFunctions.signProjectHof(codesHof, signs).as("h"))
        .collect()
      got.foreach { r =>
        val k = if (r.isNullAt(1)) null else r.getSeq[Long](1)
        val h = if (r.isNullAt(2)) null else r.getSeq[Long](2)
        assert(k == h, s"seed $seed projection diverged on id ${r.getLong(0)}: $k vs $h")
      }
      assert(got.filter(_.getLong(0) >= 98L).forall(_.isNullAt(1)),
        "irregular rows must project to NULL")
    }
  }

  test("untyped NULL inputs analyze and yield NULL — the kernels don't narrow the SQL surface") {
    // the HOF forms the kernels replaced type-coerced a bare NULL and
    // returned NULL; the kernels must do the same instead of failing
    // analysis (NullType child => value is always null, branch is dead)
    graft.functions.SqlFunctions.install(spark)
    val rows = spark.sql(
      """SELECT graft_cosine(NULL, array(1.0d, 2.0d)) AS c1,
        |       graft_cosine(array(CAST(1.0 AS FLOAT)), NULL) AS c2,
        |       graft_cosine(NULL, NULL) AS c3,
        |       graft_quantize_int8(NULL) AS q""".stripMargin).head()
    assert((0 to 3).forall(rows.isNullAt), s"expected all NULL, got $rows")

    // the NON-foldable shape (NULL literal x real column) must COMPILE in
    // codegen — a NullType argument reaching the kernel call as java
    // Object would throw in Janino and silently knock the whole stage
    // back to interpreted; CODEGEN_ONLY turns that fallback into a
    // loud failure here
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val d = fdf(Seq((1L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f))))
      d.createOrReplaceTempView("vk_null_codegen")
      val got = spark.sql(
        """SELECT graft_cosine(NULL, a) AS c, graft_cosine(a, b) AS r
          |FROM vk_null_codegen""".stripMargin).head()
      assert(got.isNullAt(0) && !got.isNullAt(1),
        s"NULL-side must be NULL while the real pair still computes: $got")
    } finally {
      prev.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("ArrayType(NullType) inputs analyze and keep the HOF edge semantics exactly") {
    // array(NULL, NULL) and array() type as ARRAY<NULL> — the r11-ADVICE
    // gap: the kernels accepted bare NULL but rejected these at analysis,
    // narrowing the API vs the coerced HOF forms. They now flow through
    // the NORMAL kernel path (never a constant-NULL shortcut), because
    // the HOF semantics differ per kernel: all-null lanes NULL every
    // fold, but an EMPTY array runs the empty fold — dot/euclidean 0.0,
    // cosine/quantizedCosine NULL (zero denominator), and quantizeInt8
    // of array(NULL, NULL) is a NON-null struct(null amax, null lanes).
    graft.functions.SqlFunctions.install(spark)
    val r = spark.range(1).select(
      VectorFunctions.cosineSimilarity(array(lit(null), lit(null)),
        array(lit(1.0), lit(2.0))).as("c_allnull"),
      VectorFunctions.cosineSimilarity(array(), array()).as("c_empty"),
      VectorFunctions.dot(array(), array()).as("d_empty"),
      VectorFunctions.euclideanDistance(array(), array()).as("e_empty"),
      VectorFunctions.quantizedCosine(array(), array()).as("qc_empty"),
      VectorFunctions.quantizedCosine(array(lit(null)), array(lit(3))).as("qc_allnull"),
      VectorFunctions.quantizeInt8(array(lit(null), lit(null))).as("qz"),
      VectorFunctions.signProject(array(lit(null), lit(null)),
        Array(Array(1L, -1L))).as("sp")).head()
    assert(r.isNullAt(0), "all-null lanes must NULL the cosine")
    assert(r.isNullAt(1), "empty cosine has a zero denominator -> NULL")
    assert(r.getDouble(2) == 0.0, "dot over array() is the empty fold: 0.0, NOT NULL")
    assert(r.getDouble(3) == 0.0, "euclidean over array() is sqrt(0.0)")
    assert(r.isNullAt(4) && r.isNullAt(5), "quantized cosine NULLs both shapes")
    val qz = r.getStruct(6)
    assert(qz.isNullAt(0) && qz.getSeq[Any](1) == Seq(null, null),
      s"quantizeInt8(array(NULL, NULL)) must be struct(null, [null, null]): $qz")
    assert(r.isNullAt(7), "signProject guard must NULL an all-null vector")
    // the SQL surface of the ADVICE example analyzes now
    assert(spark.sql("SELECT graft_cosine(array(NULL, NULL), array(1.0d))")
      .head().isNullAt(0))

    // non-foldable ARRAY<NULL> (built from data via transform) must
    // COMPILE in codegen — the lanes are all null so no lane read ever
    // happens, but the generated kernel call itself must be valid Janino
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val d = fdf(Seq((1L, Seq[java.lang.Float](1f, 2f), Seq[java.lang.Float](3f, 4f))))
      val got = d.select(
        VectorFunctions.cosineSimilarity(
          transform(col("a"), _ => lit(null)), col("b")).as("c"),
        VectorFunctions.dot(col("a"),
          transform(col("b"), _ => lit(null))).as("dt"),
        VectorFunctions.cosineSimilarity(col("a"), col("b")).as("real")).head()
      assert(got.isNullAt(0) && got.isNullAt(1) && !got.isNullAt(2),
        s"null-lane sides must be NULL while the real pair computes: $got")
    } finally {
      prev.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("kernel stays inside whole-stage codegen; the HOF form carried interpreted folds") {
    // a range source, not a local relation — ConvertToLocalRelation would
    // otherwise fold the projection before any physical plan exists
    val d = spark.range(8).select(
      array((1 to 4).map(i => (col("id") + i).cast("float")): _*).as("a"),
      array((1 to 4).map(i => (col("id") * i).cast("float")): _*).as("b"))
    val kernelPlan = d.select(VectorFunctions.cosineSimilarity(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    // the '*(n)' prefix marks a WholeStageCodegen stage in the collapsed
    // plan string — the kernel projection must carry it
    assert("""\*\(\d+\) Project \[graft_cosine_kernel""".r.findFirstIn(kernelPlan).isDefined,
      s"kernel fell out of codegen:\n$kernelPlan")
    assert(!kernelPlan.contains("aggregate("), s"kernel plan still folds HOFs:\n$kernelPlan")
    val hofPlan = d.select(VectorFunctions.cosineSimilarityHof(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(hofPlan.contains("aggregate("), "reference form should show the HOF fold")
  }
}
