package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector functions for similarity search (SURVEY.md §2.9 X3):
  * higher-order-function math over `array<float>` columns — stays in
  * WholeStageCodegen, no UDFs, no driver round-trips.
  *
  * Accumulation is in DOUBLE (floats are cast element-wise) so results are
  * deterministic left-fold sums regardless of Tungsten layout.
  */
object VectorFunctions {

  /** Compiled one-pass dot product ([[graft.operators.DotKernel]]) —
    * bit-identical to the interpreted HOF fold it replaced (kept below as
    * [[dotHof]] and proved lane-equal in VectorKernelsSpec).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(graft.operators.DotKernel(
      org.apache.spark.sql.GraftSqlShim.expression(a),
      org.apache.spark.sql.GraftSqlShim.expression(b)))

  /** The interpreted HOF fold `dot` compiled away — retained as the
    * bit-compat reference the kernel spec replays against.
    */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Zero-norm vectors get NULL, not NaN: Spark sorts NaN ABOVE every real
    * double, so one degenerate (all-zero) vector would otherwise take rank
    * 1 of every descending top-k; NULL sorts last under `desc`, which is
    * the semantics a ranking caller wants. Compiled one-pass kernel
    * ([[graft.operators.CosineKernel]]) — the dominant pair cost of every
    * ANN/semantic-dedup gate was this fold interpreted per lane; the
    * kernel runs the identical left-to-right double accumulation (proved
    * in VectorKernelsSpec against [[cosineSimilarityHof]]), so every sim
    * double and every oracle hash is unchanged.
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(graft.operators.CosineKernel(
      org.apache.spark.sql.GraftSqlShim.expression(a),
      org.apache.spark.sql.GraftSqlShim.expression(b)))

  /** The interpreted HOF cosine — retained as the bit-compat reference the
    * kernel spec replays against.
    */
  private[graft] def cosineSimilarityHof(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom =!= 0.0, dotHof(a, b) / denom)
  }

  /** Compiled one-pass euclidean distance ([[graft.operators
    * .EuclideanKernel]]) — the per-centroid assignment fold of
    * [[ivfAssign]]/[[kmeansCentroids]], bit-identical to the HOF form
    * (kept as [[euclideanDistanceHof]] for the kernel spec).
    */
  def euclideanDistance(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlShim.column(graft.operators.EuclideanKernel(
      org.apache.spark.sql.GraftSqlShim.expression(a),
      org.apache.spark.sql.GraftSqlShim.expression(b)))

  private[graft] def euclideanDistanceHof(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val diff = x.cast("double") - y.cast("double"); diff * diff
    }), lit(0.0), (acc, v) => acc + v))

  /** Defensive lane cleanup for untrusted embedding corpora: NaN and ±Inf
    * lanes become 0.0f (a NaN amax would otherwise poison every code in
    * [[quantizeInt8]], and one Inf lane would zero all others). Row-local,
    * codegen'd; compose as `quantizeInt8(sanitizeVector(v))` on corpora
    * that don't guarantee finite floats.
    */
  def sanitizeVector(vec: Column): Column =
    transform(vec, v =>
      when(isnan(v) || v === Float.PositiveInfinity || v === Float.NegativeInfinity,
        lit(0.0f)).otherwise(v))

  /** Symmetric int8 quantization of a float embedding: codes in [-127, 127]
    * with per-vector scale amax/127 (amax = max |v_i|). The 100 TB story is
    * storage: a 4-byte float lane becomes a 1-byte code + one shared scale,
    * a 4× cut on the corpus' largest column, map-only (no shuffle). Kept
    * bit-deterministic across engines: every step is the same IEEE DOUBLE
    * expression (floats widen exactly; max is order-independent;
    * floor(x + 0.5) avoids banker's-rounding divergence), so a DuckDB
    * oracle reproduces every code exactly. All-zero vectors (amax = 0)
    * quantize to all-zero codes.
    *
    * @return struct(amax double, codes array<int>)
    */
  def quantizeInt8(vec: Column): Column =
    // compiled row kernel ([[graft.operators.QuantizeInt8Kernel]]) — one
    // static call per row instead of an interpreted transform + array_max
    // + zip_with stack; codes bit-identical (HOF reference below for the
    // kernel spec, adversarial shapes included)
    org.apache.spark.sql.GraftSqlShim.column(graft.operators.QuantizeInt8Kernel(
      org.apache.spark.sql.GraftSqlShim.expression(vec)))

  private[graft] def quantizeInt8Hof(vec: Column): Column = {
    val amax = array_max(transform(vec, v => abs(v.cast("double"))))
    // hoist amax out of the per-lane lambda: higher-order functions are
    // interpreted (no codegen CSE), so referencing the O(dim) reduction
    // INSIDE transform re-evaluates it per lane — O(dim²) per row,
    // measured as the dominant cost of the projection gate. array_repeat
    // evaluates it once and zip_with hands each lane its copy; the
    // per-lane arithmetic is the identical IEEE expression, so every
    // code is bit-unchanged.
    val amaxes = array_repeat(amax, size(vec))
    struct(
      amax.as("amax"),
      when(amax === 0.0, transform(vec, _ => lit(0)))
        .otherwise(zip_with(vec, amaxes,
          (v, m) => floor(v.cast("double") * 127.0 / m + 0.5).cast("int")))
        .as("codes"))
  }

  /** Dequantize int8 codes back to doubles: code · amax / 127 — the read
    * path of the quantized column; reconstruction error ≤ amax/254 per lane.
    */
  def dequantizeInt8(quantized: Column): Column =
    // same hoist as quantizeInt8: the scale reference leaves the per-lane
    // lambda, so an unevaluated struct argument is not re-evaluated per lane
    zip_with(quantized("codes"),
      array_repeat(quantized("amax"), size(quantized("codes"))),
      (c, m) => c.cast("double") * m / 127.0)

  /** Sign-hyperplane LSH bucket over the first `bits` dimensions: a cheap,
    * exact-arithmetic space partition. At 100 TB this is the partition key —
    * an ANN probe touches one bucket, not the corpus.
    */
  def lshBucket(a: Column, bits: Int = 8): Column =
    concat_ws("", transform(slice(a, 1, bits),
      x => when(x >= lit(0.0f), "1").otherwise("0")))

  /** MULTI-TABLE sign LSH: `bands` independent [[lshBucket]] tables, band b
    * hashing dimensions [b·bits+1, (b+1)·bits]. A candidate matches if it
    * shares ANY band cell with the query (OR-of-bands — the banded-MinHash
    * recall discipline applied to vectors): per-band collision probability
    * p becomes 1−(1−p)^bands, the standard multi-probe recall lift at a
    * bounded extra candidate budget. Returned as `array<string>` of
    * "b:signs" cells (the band index prefixes the cell so cells from
    * different bands can never collide); probe by exploding and
    * equi-joining on the cell — each band is a partition key at scale,
    * exactly like the single-table bucket.
    *
    * Bands that extend past the vector's length are DROPPED from the
    * result, not emitted: an out-of-range slice folds to the empty sign
    * string, so every vector would share the identical "b:" cell and the
    * OR-of-bands equi-join would silently degenerate to a full cross
    * join — a quadratic candidate blowup that reads as a recall win. A
    * short vector probes its in-range bands only.
    */
  def lshBands(a: Column, bands: Int, bits: Int = 8): Column = {
    require(bands >= 1 && bits >= 1)
    filter(
      array((0 until bands).map(b =>
        when(size(a) >= (b + 1) * bits,
          concat_ws(":", lit(b), lshBucket(slice(a, b * bits + 1, bits), bits)))): _*),
      c => c.isNotNull)
  }

  /** IVF cell assignment against FROZEN (cid, centroid) pairs by the exact
    * reduced d² form: argmin over centroids of c·c − 2·v·c (= d² − v·v —
    * the v·v term is constant across centroids, so the argmin drops it
    * rather than re-folding an O(dim) aggregate once per centroid per row;
    * interpreted higher-order functions have no CSE, the repo-wide
    * discipline). c·c folds to a compile-time Double constant in the SAME
    * ascending-index order both engines' sequential dot folds use, and the
    * remaining per-centroid work is ONE v·c fold — every value a
    * deterministic double, ties on centroid id — so any engine holding the
    * same centroid constants derives the identical assignment (the
    * oracle-exact variant of [[ivfAssign]]; k-means centroids would be
    * engine-private state a cross-engine gate cannot see). Oracles mirror
    * the reduced form verbatim: `list_dot_product(c, c) −
    * 2·list_dot_product(v, c)`.
    */
  def ivfCellExact(v: Column, centroids: Seq[(Long, Array[Double])]): Column = {
    require(centroids.nonEmpty)
    array_min(array(centroids.map { case (cid, c) =>
      val cc = c.foldLeft(0.0)((acc, x) => acc + x * x)
      struct((lit(cc) - lit(2.0) * dot(v, lit(c))).as("d"), lit(cid).as("cell"))
    }: _*)).getField("cell")
  }

  /** MULTI-PROBE cell list: the `nprobe` nearest centroid cells by the same
    * reduced d² form (score asc, cid tie-break — array_sort orders the
    * structs field-by-field), as `array<bigint>`. nprobe is THE
    * recall/latency knob of an IVF index: the probe scans nprobe/K of the
    * corpus instead of 1/K, and recall rises accordingly. nprobe=1
    * degenerates to [[ivfCellExact]].
    */
  def ivfProbeCellsExact(v: Column, centroids: Seq[(Long, Array[Double])],
                         nprobe: Int): Column = {
    require(centroids.nonEmpty && nprobe >= 1 && nprobe <= centroids.size)
    val ranked = array_sort(array(centroids.map { case (cid, c) =>
      val cc = c.foldLeft(0.0)((acc, x) => acc + x * x)
      struct((lit(cc) - lit(2.0) * dot(v, lit(c))).as("d"), lit(cid).as("cell"))
    }: _*))
    transform(slice(ranked, 1, nprobe), s => s.getField("cell"))
  }

  /** Distributed top-k ranking without a global window: `orderBy.limit(k)`
    * plans TakeOrderedAndProject (each partition keeps k rows, the driver
    * merges k·numPartitions), then rank is derived over the k surviving rows
    * in one single-partition sorted pass — no WindowExec, no corpus-wide
    * single-partition shuffle.
    */
  private[graft] def rankTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .coalesce(1)
      .sortWithinPartitions(col("sim").desc, col(idCol))
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("long"))
      .select(col("rank"), col(idCol), col("sim"))

  /** Exact k-NN JOIN: per-query top-k by cosine for a BATCH of query
    * vectors — the building block of embedding-level dedup and retrieval
    * evaluation, where [[bruteForceTopK]]'s single global TakeOrdered can't
    * apply (top-k is per query, not per corpus). Two-stage bucketed top-k:
    *
    *   1. the query batch broadcasts (bounded by contract — a query BATCH,
    *      not a second corpus); each corpus row scores all queries map-side;
    *   2. local top-k per (query, bucket-of-corpus-id) over `fanout`
    *      buckets — the exchange key carries the bucket, so no partition
    *      ever holds more than ~|corpus|/fanout rows for one query (a
    *      single-key window here would re-sort the whole corpus per query
    *      — the straggler a 100 TB run dies on);
    *   3. exact merge: a per-query window over the ≤ fanout·k survivors.
    *
    * Rank ties break by id, so the ranking is deterministic cross-engine
    * even though cosine floats are compared only within one engine.
    *
    * @param corpus  (idCol, vecCol) table, any size
    * @param queries (qidCol, qvecCol) table, broadcastable
    * @return (query_id, rank, idCol) rows, rank 1..k per query
    */
  def knnJoin(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              qidCol: String, qvecCol: String, k: Int, fanout: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && fanout >= 1)
    val q = broadcast(queries
      .select(col(qidCol).as("_graft_qid"), col(qvecCol).as("_graft_q")))
    // ONE fused kernel call per pair (dot + both norms in a single
    // compiled pass — the interpreted-HOF era hoisted norms into
    // projections to avoid per-pair re-folds; the kernel makes the hoist
    // moot and the sim doubles are bit-unchanged: dot/(‖a‖·‖b‖) is the
    // identical accumulation and product). Zero-norm vectors score NULL
    // by the cosineSimilarity contract; a NULL row must not occupy a
    // neighbor rank. A NaN-lane embedding scores NaN, which passes
    // isNotNull and — by Spark's NaN-sorts-greatest rule — would rank
    // ABOVE every real neighbor: nanvl folds NaN into the same NULL path
    // (the oracle's NOT isnan).
    val scored = corpus
      .crossJoin(q)
      .withColumn("_graft_sim",
        nanvl(cosineSimilarity(col(vecCol), col("_graft_q")), lit(null)))
      .filter(col("_graft_sim").isNotNull)
      .withColumn("_graft_b", pmod(hash(col(idCol)), lit(fanout)))
    val local = Window.partitionBy(col("_graft_qid"), col("_graft_b"))
      .orderBy(col("_graft_sim").desc_nulls_last, col(idCol))
    val merge = Window.partitionBy(col("_graft_qid"))
      .orderBy(col("_graft_sim").desc_nulls_last, col(idCol))
    scored
      .withColumn("_graft_r", row_number().over(local)).filter(col("_graft_r") <= k)
      .withColumn("rank", row_number().over(merge).cast("long")).filter(col("rank") <= k)
      .select(col("_graft_qid").as("query_id"), col("rank"), col(idCol))
  }

  /** Brute-force exact top-k by cosine against a single query vector (the
    * correctness baseline; O(n·d) one pass, query broadcast).
    *
    * @param df         table with (idCol, vecCol)
    * @param queryVec   1-row DataFrame with a `q` array column
    * @return (rank, idCol, sim) rows, rank 1..k
    */
  def bruteForceTopK(df: DataFrame, queryVec: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // the query column is re-aliased to a _graft_-prefixed internal name at
    // the boundary: a CORPUS column that happens to be named "q" must not
    // make the similarity reference ambiguous
    val q = broadcast(queryVec.select(col("q").as("_graft_q")))
    val sim = cosineSimilarity(col(vecCol), col("_graft_q"))
    rankTopK(df.crossJoin(q).withColumn("sim", sim), idCol, k)
  }

  /** Cosine similarity over int8 code arrays, computed EXACTLY then
    * ratioed: dot and squared norms are integer folds (order-independent —
    * every partial sum is an exact BIGINT), the final ratio is one IEEE
    * DOUBLE expression. Per-vector scales cancel in cosine, so the codes
    * alone rank candidates — no float column is read at all.
    */
  def quantizedCosine(codesA: Column, codesB: Column): Column =
    // all-zero code vectors (quantizeInt8 of a zero/sanitized-away
    // embedding) get NULL, not 0/0 = NaN — NaN sorts ABOVE all reals in
    // Spark, so a degenerate row would hijack every descending top-k;
    // NULL sorts last under desc. Compiled kernel
    // ([[graft.operators.QuantizedCosineKernel]]): the three exact BIGINT
    // folds + the identical one-expression IEEE ratio in one pass (HOF
    // reference kept below for the kernel spec).
    org.apache.spark.sql.GraftSqlShim.column(graft.operators.QuantizedCosineKernel(
      org.apache.spark.sql.GraftSqlShim.expression(codesA),
      org.apache.spark.sql.GraftSqlShim.expression(codesB)))

  private[graft] def quantizedCosineHof(codesA: Column, codesB: Column): Column = {
    def idot(a: Column, b: Column) =
      aggregate(zip_with(a, b, (x, y) => (x.cast("long") * y.cast("long"))),
        lit(0L), (acc, v) => acc + v)
    val denom = idot(codesA, codesA).cast("double") * idot(codesB, codesB).cast("double")
    when(denom =!= 0.0, idot(codesA, codesB).cast("double") / sqrt(denom))
  }

  /** Two-stage quantized ANN: a COARSE pass ranks by [[quantizedCosine]]
    * over int8 codes, keeping `m` candidates via TakeOrderedAndProject;
    * only those m rows are re-ranked by exact float cosine for the final k.
    *
    * Two corpus shapes:
    *   - `codesCol = Some(name)` — the 100 TB shape: codes are STORED
    *     beside the floats, the coarse scan reads (id, codes) ONLY (the
    *     float column is column-pruned out of the read — a ReadSchema
    *     fact, see PlanAuditSpec), and the re-rank fetches floats for the
    *     m winner ids by a PUSHED In filter (the ids are a bounded
    *     driver collect — m is the API's candidate budget, like a probe
    *     cell list), so the float read is row-group/bloom-prunable
    *     instead of a broadcast join that scans the float column of the
    *     whole corpus to keep m rows.
    *   - `codesCol = None` — parity/demo shape: codes are derived in-query
    *     from the float column, which is therefore read for every corpus
    *     row. Same answers, none of the I/O win — use stored codes when
    *     the point is reading 4× fewer bytes.
    *
    * Internal columns are `_graft_`-prefixed so corpus columns named q /
    * codes / qsim cannot collide. Deterministic end-to-end: the coarse
    * stage is integer arithmetic plus one IEEE ratio (ties broken by id),
    * so both engines pick the same candidate set; the re-rank surfaces
    * ranks only, like [[bruteForceTopK]].
    *
    * EAGER in the stored-codes shape: the coarse pass EXECUTES at call
    * time (the winner ids must exist to be pushed into the float fetch),
    * so the returned DataFrame embeds the winners as of the CALL — build
    * it after the corpus is final, not ahead of data arrival. `m` is the
    * candidate budget and bounds that driver collect; it is require-
    * capped at [[VectorFunctions.QuantizedCandidateBudgetMax]] (the same
    * cost class as a runtime-filter key set).
    */
  def quantizedTopK(df: DataFrame, queryVec: DataFrame, idCol: String,
                    vecCol: String, k: Int, m: Int,
                    codesCol: Option[String] = None): DataFrame =
    codesCol match {
      case Some(cc) => quantizedTopKStaged(df, queryVec, idCol, vecCol, k, m, cc)._2
      case None =>
        requireBudget(k, m)
        val q = quantizedQuery(queryVec)
        val c = coarseRank(df, quantizeInt8(col(vecCol)).getField("codes"),
          idCol, m, q)
        rankTopK(c.withColumn("sim",
          cosineSimilarity(col(vecCol), col("_graft_q"))), idCol, k)
    }

  /** [[quantizedTopK]]'s stored-codes path, returning BOTH the coarse
    * DataFrame it executed and the re-rank result, so a caller can pin
    * plan facts (ReadSchema, PushedFilters) on the ACTUAL executed scans
    * rather than a reconstruction (the x_ann_index_quantized gate does).
    * The coarse pass runs eagerly here — see the eager-execution note on
    * [[quantizedTopK]].
    */
  private[graft] def quantizedTopKStaged(df: DataFrame, queryVec: DataFrame,
      idCol: String, vecCol: String, k: Int, m: Int,
      cc: String): (DataFrame, DataFrame) = {
    requireBudget(k, m)
    val q = quantizedQuery(queryVec)
    // coarse pass sees (id, codes) only — nothing else survives into
    // the scan's ReadSchema. The m winner ids collect to the driver
    // (BOUNDED: m is the require-capped candidate budget, the same
    // shape as a probe-cell list) and push back as an In filter, so
    // the float fetch reaches the scan as PushedFilters and
    // row-group stats / bloom can skip — a broadcast join here would
    // read the float column of every corpus row to keep m
    val coarseExec = coarseRank(df.select(col(idCol), col(cc)), col(cc),
      idCol, m, q).select(col(idCol))
    val winnerIds = coarseExec.collect().map(_.get(0)).toSeq
    val rerank = df.select(col(idCol), col(vecCol))
      .filter(if (winnerIds.isEmpty) lit(false) else col(idCol).isin(winnerIds: _*))
      .crossJoin(q)
      .withColumn("sim", cosineSimilarity(col(vecCol), col("_graft_q")))
    (coarseExec, rankTopK(rerank, idCol, k))
  }

  /** Upper bound on [[quantizedTopK]]'s candidate budget `m`: it sizes a
    * driver collect and an In expression, so it must stay in the
    * runtime-filter cost class, never "most of the corpus".
    */
  val QuantizedCandidateBudgetMax: Int = 100000

  private def requireBudget(k: Int, m: Int): Unit =
    require(k >= 1 && m >= k && m <= QuantizedCandidateBudgetMax,
      s"candidate budget out of range: k=$k, m=$m " +
        s"(need 1 <= k <= m <= $QuantizedCandidateBudgetMax)")

  private def quantizedQuery(queryVec: DataFrame): DataFrame =
    broadcast(queryVec.select(col("q").as("_graft_q"),
      quantizeInt8(col("q")).getField("codes").as("_graft_qcodes")))

  private def coarseRank(corpus: DataFrame, codes: Column, idCol: String,
                         m: Int, q: DataFrame): DataFrame = corpus
    .withColumn("_graft_codes", codes)
    .crossJoin(q)
    .withColumn("_graft_qsim", quantizedCosine(col("_graft_codes"), col("_graft_qcodes")))
    .orderBy(col("_graft_qsim").desc, col(idCol))
    .limit(m)

  /** IVF-style ANN: assign every vector to its nearest of `centroids`
    * (a small broadcast list — at scale, k-means centroids; any fixed,
    * deterministic set works), then search only the query's cell(s).
    *
    * `ivfAssign` is the index-build step (one pass, one new column to
    * partition/bucket the table by); [[ivfTopK]] probes `nprobe` nearest
    * cells — the recall/latency knob of every IVF index.
    */
  def ivfAssign(vec: Column, centroids: Seq[Seq[Float]]): Column = {
    require(centroids.nonEmpty)
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      struct(euclideanDistance(vec, lit(c.toArray)).as("d"), lit(i).as("cell"))
    }
    array_min(array(dists: _*)).getField("cell")
  }

  /** DataFrame-native Lloyd's k-means: the training step that turns IVF from
    * a fixed quantizer into a real index. Each iteration is ONE distributed
    * job (assign to nearest centroid, per-cell per-dimension mean via
    * map-side-combined aggregation) with only k·dim doubles collected to the
    * driver — the canonical scalable k-means shape.
    *
    * Deterministic: seeding is farthest-point (maximin) from a hash-chosen
    * first seed — no rand(), reproducible across runs and partitionings, and
    * guaranteed to spread seeds across well-separated clusters (plain
    * hash-sampling can drop two seeds in one cluster and converge to a
    * split/merged local optimum). Iteration count is fixed rather than
    * convergence-tested. Empty cells retain their previous centroid.
    */
  def kmeansCentroids(df: DataFrame, vecCol: String, k: Int,
                      iters: Int = 5): Seq[Seq[Float]] = {
    require(k >= 1 && iters >= 0)
    val vecs = df.select(col(vecCol).as("v")).where(col("v").isNotNull)
    val first = vecs.select(size(col("v"))).limit(1).collect()
    require(first.nonEmpty,
      s"kmeansCentroids: no non-null vectors in column '$vecCol'")
    val dim = first.head.getInt(0)
    var centroids: Seq[Seq[Float]] = Seq(
      vecs.orderBy(xxhash64(col("v"))).limit(1).head.getSeq[Float](0).toSeq)
    while (centroids.size < k) {
      // next seed = the vector farthest from its nearest existing seed
      // (one TakeOrdered job per seed; k is small)
      val minDist = array_min(array(centroids.map(c =>
        euclideanDistance(col("v"), lit(c.toArray))): _*))
      centroids = centroids :+ vecs
        .orderBy(minDist.desc, xxhash64(col("v")))
        .limit(1).head.getSeq[Float](0).toSeq
    }
    for (_ <- 0 until iters) {
      val assigned = vecs.withColumn("_cell", ivfAssign(col("v"), centroids))
      val avgCols = (1 to dim).map(i =>
        avg(element_at(col("v"), i).cast("double")).as(s"d$i"))
      val updated = assigned.groupBy(col("_cell"))
        .agg(avgCols.head, avgCols.tail: _*)
        .collect()
        .map(r => r.getInt(0) -> (1 to dim).map(i => r.getDouble(i).toFloat).toSeq)
        .toMap
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i)))
    }
    centroids
  }

  def ivfTopK(df: DataFrame, queryVec: DataFrame, idCol: String, vecCol: String,
              k: Int, centroids: Seq[Seq[Float]], nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.size)
    // query column re-aliased to an internal name at the boundary, like
    // bruteForceTopK: a corpus column named "q" must not make the
    // similarity reference ambiguous after the join
    val assigned = df.withColumn("_graft_cell", ivfAssign(col(vecCol), centroids))
    // the query's nprobe nearest cells, as an exploded (broadcastable) list
    val qCells = queryVec.select(col("q").as("_graft_q"), posexplode(array(
      centroids.zipWithIndex.map { case (c, i) =>
        struct(euclideanDistance(col("q"), lit(c.toArray)).as("d"), lit(i).as("cell"))
      }: _*)))
      .select(col("_graft_q"), col("col.d"), col("col.cell").as("_graft_cell"))
      // cell index tie-breaks equidistant centroids — without it nprobe
      // cuts between ties are plan-dependent and runs/engines diverge
      .orderBy(col("d"), col("_graft_cell")).limit(nprobe)
      .select("_graft_q", "_graft_cell")
    val sim = cosineSimilarity(col(vecCol), col("_graft_q"))
    rankTopK(assigned.join(broadcast(qCells), "_graft_cell").withColumn("sim", sim),
      idCol, k)
  }

  /** LSH-accelerated ANN top-k: restrict the scan to the query's sign bucket
    * (the scale path; falls back to fewer than k results when the bucket is
    * small — callers widen `bits` down / probe neighbor buckets as needed).
    */
  def lshTopK(df: DataFrame, queryVec: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 8): DataFrame = {
    val bucketed = df.withColumn("_graft_bucket", lshBucket(col(vecCol), bits))
    val q = queryVec.select(col("q").as("_graft_q"),
      lshBucket(col("q"), bits).as("_graft_qbucket"))
    val sim = cosineSimilarity(col(vecCol), col("_graft_q"))
    rankTopK(bucketed.join(broadcast(q), col("_graft_bucket") === col("_graft_qbucket"))
      .withColumn("sim", sim), idCol, k)
  }

  /** Deterministic ±1 Johnson-Lindenstrauss sign matrix, `outDims` rows of
    * `dim` columns. Each entry derives from md5("i_j") — first hex digit in
    * [0,7] ⇒ +1, else −1 — so any engine (and any executor, with no shared
    * RNG state) regenerates the identical matrix from the two integers
    * alone. The matrix is outDims×dim longs (a few KB): it rides into the
    * plan as a literal, the distributed-projection equivalent of
    * broadcasting the projection matrix.
    */
  def signMatrix(dim: Int, outDims: Int): Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDims, dim) { (j, i) =>
      val hex = md.digest(s"${i}_${j}".getBytes("UTF-8"))
      md.reset()
      // first hex digit = high nibble of byte 0; < 8 ⇒ +1
      if (((hex(0) >> 4) & 0xf) < 8) 1L else -1L
    }
  }

  /** Random-sign (achlioptas-style ±1) projection of an int8 code vector to
    * `signs.length` output dimensions — the 100 TB dimensionality cut that
    * runs BEFORE similarity work: 64 float lanes become, say, 8 BIGINT
    * lanes, map-only (one fold per row, zero exchanges), and because the
    * inputs are integer codes and the weights are ±1 every output lane is
    * an exact BIGINT — no float summation order to diverge across engines
    * or partitionings. Compose as
    * `signProject(quantizeInt8(sanitizeVector(v))("codes"), signMatrix(d, k))`.
    *
    * Shape matters: the fold runs over the LANE axis once, carrying all
    * `outDims` accumulators — an output-axis loop would re-evaluate the
    * `codes` expression (often a whole quantization) once per output
    * dimension, an outDims× hidden cost (measured 10× on the gate corpus).
    *
    * Rows whose code vector is NULL, not exactly `dim` lanes, or carrying
    * a NULL lane project to NULL. The guard is explicit because zip_with
    * pads a length mismatch with NULL lanes and the padded fold's null
    * handling is not a contract worth standing on (measured: it silently
    * returns the fold's zero element) — a degenerate row must surface as
    * NULL a downstream filter can drop, never as a fabricated finite
    * projection or an array of null lanes.
    */
  def signProject(codes: Column, signs: Array[Array[Long]]): Column =
    // compiled row kernel ([[graft.operators.SignProjectKernel]]): the
    // lane loop carries all outDims accumulators in one static call (the
    // HOF reference below is the fold this replaces, kept for the spec)
    org.apache.spark.sql.GraftSqlShim.column(graft.operators.SignProjectKernel(
      org.apache.spark.sql.GraftSqlShim.expression(codes), signs))

  private[graft] def signProjectHof(codes: Column, signs: Array[Array[Long]]): Column = {
    require(signs.nonEmpty && signs.map(_.length).distinct.length == 1,
      "signs must be a non-empty rectangular matrix")
    val outDims = signs.length
    val dim = signs(0).length
    // transpose to lane-major so the fold walks codes and weights together
    val byLane = typedLit(signs.transpose.map(_.toSeq).toSeq)
    when(size(codes) === dim && !exists(codes, c => c.isNull),
      aggregate(
        zip_with(codes, byLane, (c, laneSigns) =>
          transform(laneSigns, s => c.cast("long") * s)),
        typedLit(Seq.fill(outDims)(0L)),
        (acc, contrib) => zip_with(acc, contrib, (a, b) => a + b)))
  }
}
