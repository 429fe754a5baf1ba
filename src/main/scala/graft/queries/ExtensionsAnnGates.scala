package graft.queries

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search / ANN gates: brute force, LSH, IVF index lifecycle (build / refresh / multiprobe / quantized / rebuild), quantization, kNN join, recall certification (SURVEY §2.9 X3, X6b).
  *
  * One slice of [[Extensions.entries]] (split in r14 so no single file
  * holds a third of the source); each tuple is (gate key, Spark query,
  * DuckDB oracle SQL) and the semantics are unchanged from the monolith.
  * Self-typed to the aggregator so gate bodies use its shared helpers.
  */
trait ExtensionsAnnGates { this: Extensions.type =>

  private[queries] def annGates: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(


    // X6b: INT8 EMBEDDING QUANTIZATION ([[graft.functions.VectorFunctions
    // .quantizeInt8]]): symmetric per-vector quantization of the float
    // embedding column — 4 bytes/lane to 1 byte/lane + one scale, the
    // standard storage cut for a 100 TB embedding corpus; map-only, no
    // shuffle beyond the tiny audit rollup. Every step is the same IEEE
    // DOUBLE expression in both engines (floats widen exactly, max is
    // order-independent, floor(x + 0.5) avoids banker's rounding), so
    // DuckDB reproduces every int8 code bit-exactly; the gate compares
    // per-label code sums and extrema, plus the [-127, 127] range law.
    ("x_embed_quantize",
      (s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        e.withColumn("qz", VF.quantizeInt8(col("embedding")))
          .select(col("label"),
            aggregate(col("qz.codes"), lit(0L), (acc, c) => acc + c).as("code_sum"),
            array_min(col("qz.codes")).as("min_code"),
            array_max(col("qz.codes")).as("max_code"))
          .groupBy("label")
          .agg(count(lit(1)).as("n"),
            sum(col("code_sum")).as("sum_codes"),
            min(col("min_code")).as("min_code"),
            max(col("max_code")).as("max_code"))
          .withColumn("within_range",
            col("min_code") >= -127 && col("max_code") <= 127)
          .orderBy("label")
      },
      """WITH c AS (
        |  SELECT label,
        |    CASE WHEN amax = 0 THEN CAST(0 AS BIGINT)
        |      ELSE CAST(list_sum(list_transform(embedding,
        |        v -> CAST(floor(CAST(v AS DOUBLE) * 127.0 / amax + 0.5) AS BIGINT))) AS BIGINT)
        |      END AS code_sum,
        |    CASE WHEN amax = 0 THEN 0
        |      ELSE CAST(list_aggregate(list_transform(embedding,
        |        v -> CAST(floor(CAST(v AS DOUBLE) * 127.0 / amax + 0.5) AS BIGINT)), 'min') AS INTEGER)
        |      END AS min_code,
        |    CASE WHEN amax = 0 THEN 0
        |      ELSE CAST(list_aggregate(list_transform(embedding,
        |        v -> CAST(floor(CAST(v AS DOUBLE) * 127.0 / amax + 0.5) AS BIGINT)), 'max') AS INTEGER)
        |      END AS max_code
        |  FROM (
        |    SELECT label, embedding,
        |      list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS amax
        |    FROM embeddings))
        |SELECT label, count(*) AS n, CAST(sum(code_sum) AS BIGINT) AS sum_codes,
        |  CAST(min(min_code) AS INTEGER) AS min_code,
        |  CAST(max(max_code) AS INTEGER) AS max_code,
        |  (min(min_code) >= -127 AND max(max_code) <= 127) AS within_range
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin),


    // X6c: QUANTIZED TWO-STAGE ANN ([[graft.functions.VectorFunctions
    // .quantizedTopK]]) — the honest 100 TB search shape: the COARSE scan
    // ranks by cosine over int8 CODES (the column a quantized corpus
    // actually stores — 4× fewer bytes read, integer multiplies; scales
    // cancel in cosine so codes alone rank), TakeOrderedAndProject keeps
    // 50 candidates, and only those 50 rows are re-ranked by exact float
    // cosine for the final 10 — the corpus' float column is never scanned.
    // Deterministic end-to-end: integer folds are order-independent exact
    // BIGINTs, the coarse ratio is one IEEE DOUBLE expression (DuckDB's
    // list_dot_product over int lists is exact below 2^53), ties break by
    // id, and only ranks surface. (Here codes are derived in-query from
    // the float fixture; a production table stores them.)
    ("x_sim_quantized",
      (s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
        VF.quantizedTopK(e.filter(col("vec_id") =!= 0), q, "vec_id", "embedding", 10, 50)
          .select("rank", "vec_id")
          .orderBy("rank")
      },
      """WITH qz AS (
        |  SELECT vec_id, embedding,
        |    list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 127.0
        |      / list_max(list_transform(embedding, u -> abs(CAST(u AS DOUBLE))))
        |      + 0.5) AS BIGINT)) AS codes
        |  FROM embeddings),
        |qv AS (SELECT embedding AS qe, codes AS qcodes FROM qz WHERE vec_id = 0),
        |coarse AS (
        |  SELECT vec_id, embedding,
        |    list_dot_product(codes, qcodes)
        |      / sqrt(list_dot_product(codes, codes) * list_dot_product(qcodes, qcodes)) AS qsim,
        |    qe
        |  FROM qz, qv WHERE vec_id <> 0
        |  ORDER BY qsim DESC, vec_id LIMIT 50),
        |rerank AS (
        |  SELECT vec_id, list_cosine_similarity(embedding, qe) AS sim FROM coarse)
        |SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank, vec_id
        |FROM rerank ORDER BY 1 LIMIT 10""".stripMargin),


    // X3a: top-k cosine similarity search, brute force (the exact baseline).
    // Query vector broadcast; one pass over embeddings; ranks compared (the
    // doubles themselves never surface, so float noise cannot flip the hash).
    ("x_sim_topk",
      (s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
        VF.bruteForceTopK(e.filter(col("vec_id") =!= 0), q, "vec_id", "embedding", 10)
          .select("rank", "vec_id")
          .orderBy("rank")
      },
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |sims AS (
        |  SELECT vec_id, list_cosine_similarity(embedding, qe) AS sim
        |  FROM embeddings, q WHERE vec_id <> 0)
        |SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank, vec_id
        |FROM sims ORDER BY 1 LIMIT 10""".stripMargin),


    // X3b: LSH bucketing for ANN — 8 sign-hyperplane bits partition the
    // space; at 100 TB the search probes one bucket (a partition), not the
    // corpus. Sign tests are float-exact, so buckets match bit-for-bit.
    ("x_sim_lsh_buckets",
      (s: SparkSession, d: String) =>
        Tables.embeddings(s, d)
          .withColumn("bucket", VF.lshBucket(col("embedding"), bits = 8))
          .groupBy("bucket")
          .agg(count(lit(1)).as("vectors"), min(col("vec_id")).as("min_vec_id"))
          .orderBy("bucket"),
      """SELECT array_to_string(list_transform(embedding[1:8],
        |    x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS bucket,
        |  count(*) AS vectors, min(vec_id) AS min_vec_id
        |FROM embeddings GROUP BY 1 ORDER BY 1""".stripMargin),


    // X3c: LSH-cell ANN JOIN — the approximate twin of x_knn_join: a batch
    // of query vectors each retrieves top-k from ONLY its own sign-LSH
    // cell (a hash join on the cell key), never the full corpus. At 100 TB
    // the cell bit-width is the recall/cost knob (more bits → smaller
    // cells → cheaper, lower recall); the per-query window is bounded by
    // cell occupancy, not corpus size. Sign tests are float-exact so both
    // engines build identical cells; NaN-lane sims are filtered on both
    // sides (Spark would otherwise sort NaN above every real sim).
    ("x_lsh_ann_join",
      (s: SparkSession, d: String) => {
        val emb = Tables.embeddings(s, d)
          .withColumn("cell", VF.lshBucket(col("embedding"), bits = 8))
        val q = emb.filter(col("vec_id") % 97 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("cell"))
        val c = emb.filter(col("vec_id") % 97 =!= 0)
          .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"), col("cell"))
        val scored = q.join(c, "cell")
          .withColumn("sim",
            nanvl(VF.cosineSimilarity(col("q_emb"), col("c_emb")), lit(null).cast("double")))
          .filter(col("sim").isNotNull)
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("neighbor_id"))
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select("query_id", "rank", "neighbor_id")
          .orderBy("query_id", "rank")
      },
      """WITH lsh AS (
        |  SELECT vec_id, embedding,
        |    array_to_string(list_transform(embedding[1:8],
        |      x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS cell
        |  FROM embeddings),
        |q AS (SELECT * FROM lsh WHERE vec_id % 97 = 0),
        |c AS (SELECT * FROM lsh WHERE vec_id % 97 <> 0),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_cosine_similarity(q.embedding, c.embedding) AS sim
        |  FROM q JOIN c ON q.cell = c.cell),
        |ranked AS (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY sim DESC, neighbor_id) AS rank
        |  FROM scored WHERE sim IS NOT NULL AND NOT isnan(sim))
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id
        |FROM ranked WHERE rank <= 3 ORDER BY 1, 2""".stripMargin),


    // X3c: the IVF index as a TABLE LAYOUT — k-means-trained centroids
    // assign each vector a cell, the vectors land in a Graft table
    // partitioned by identity(cell), and a probe scans ONE partition's
    // files (certified by the pruning flag). Ranks come from the exact
    // full-probe path (≡ brute force, proven by FunctionsSpec), so the
    // oracle stays float-safe while the flag certifies the scale path.
    ("x_ann_index",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, Transform}
        val e = Tables.embeddings(s, d)
        val cents = VF.kmeansCentroids(e, "embedding", k = 4, iters = 2)
        val cat = graft.queries.TableOps.newCatalog()
        val assigned = e.withColumn("cell",
          VF.ivfAssign(col("embedding"), cents).cast("long"))
        val t = cat.createTable("db.ann", assigned.schema,
          partitionBy = Seq("cell" -> Transform.Identity))
        t.append(s, assigned)
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
        val qCell = q.select(VF.ivfAssign(col("q"), cents)).head.getInt(0).toLong
        val probe = t.scan(Predicate.Eq("cell", qCell))
        probe.toDF(s).count() // record pruning metrics
        VF.bruteForceTopK(t.toDF(s).filter(col("vec_id") =!= 0), q,
            "vec_id", "embedding", 10)
          .select("rank", "vec_id")
          .withColumn("probe_pruned",
            lit(probe.metrics.filesScanned < probe.metrics.filesTotal))
          .orderBy("rank")
      },
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |sims AS (
        |  SELECT vec_id, list_cosine_similarity(embedding, qe) AS sim
        |  FROM embeddings, q WHERE vec_id <> 0)
        |SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank, vec_id,
        |  true AS probe_pruned
        |FROM sims ORDER BY 1 LIMIT 10""".stripMargin),


    // X3f: INCREMENTAL ANN-index refresh — the maintenance shape a durable
    // vector index actually needs at 100 TB: the IVF index is a
    // cell-partitioned Graft TABLE, and a new embedding batch is APPENDED
    // with the centroids FROZEN (re-clustering would invalidate every
    // stored cell assignment and force a full rebuild; frozen-centroid
    // assignment touches only the arriving rows). The gate certifies the
    // properties that make the refresh honest: the refresh commit is
    // append-only (every pre-refresh file survives byte-identical in the
    // file inventory), the index then binpack-COMPACTS with files strictly
    // decreased and zero rows lost (3 commits: build, refresh, compact —
    // the in-gate maintenance proof every persisted state carries), and a
    // POST-COMPACTION probe still partition-prunes to the query's cell —
    // pruning metrics recorded through QUERY_HISTORY like x_ann_index.
    // Ranking output is exact brute-force over the refreshed table, so
    // DuckDB reproduces it from the raw embeddings with no index at all.
    ("x_ann_index_refresh",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, Transform}
        val e = Tables.embeddings(s, d)
        val base = e.filter(col("vec_id") % 2 === 0)
        val batch = e.filter(col("vec_id") % 2 === 1)
        val cents = VF.kmeansCentroids(base, "embedding", k = 4, iters = 2)
        def assign(df: DataFrame) = df.withColumn("cell",
          VF.ivfAssign(col("embedding"), cents).cast("long"))
        val cat = graft.queries.TableOps.newCatalog()
        val t = cat.createTable("db.ann_inc", assign(base).schema,
          partitionBy = Seq("cell" -> Transform.Identity))
        t.append(s, assign(base))
        val filesBefore = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        t.append(s, assign(batch)) // the refresh: same frozen centroids
        val filesAfter = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        // the vector index carries the same in-gate maintenance proof as
        // every other persisted state: compact the cell-partitioned table
        // and certify the rewrite changed neither the row inventory nor
        // the probe's ability to prune (a compaction that lost a cell's
        // partition value would degrade probes to full-index scans with
        // no wrong answer to flag it — the postings-index failure shape)
        val (compacted, statePreserved) = TableOps.compactionProof(s, t)
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
        val qCell = q.select(VF.ivfAssign(col("q"), cents)).head.getInt(0).toLong
        val probe = t.scan(Predicate.Eq("cell", qCell))
        probe.toDF(s).count() // record pruning metrics
        VF.bruteForceTopK(t.toDF(s).filter(col("vec_id") =!= 0), q,
            "vec_id", "embedding", 10)
          .select("rank", "vec_id")
          .withColumn("append_only",
            lit(filesBefore.subsetOf(filesAfter) && filesAfter.size > filesBefore.size))
          .withColumn("compacted", lit(compacted))
          .withColumn("state_preserved", lit(statePreserved))
          .withColumn("incremental_commits", lit(t.meta.snapshots.size.toLong))
          .withColumn("probe_pruned",
            lit(probe.metrics.filesScanned < probe.metrics.filesTotal))
          .orderBy("rank")
      },
      """WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |sims AS (
        |  SELECT vec_id, list_cosine_similarity(embedding, qe) AS sim
        |  FROM embeddings, q WHERE vec_id <> 0)
        |SELECT CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS rank, vec_id,
        |  true AS append_only, true AS compacted, true AS state_preserved,
        |  CAST(3 AS BIGINT) AS incremental_commits,
        |  true AS probe_pruned
        |FROM sims ORDER BY 1 LIMIT 10""".stripMargin),


    // X3d: exact k-NN JOIN — per-query top-k for a BATCH of query vectors
    // (x_sim_topk is one query; retrieval evaluation and embedding-level
    // dedup need the join form). Two-stage bucketed top-k: query batch
    // broadcasts, local top-k per (query, corpus-id bucket) bounds every
    // window partition to ~|corpus|/fanout rows, exact merge ranks the
    // ≤ fanout·k survivors — no per-query full-corpus sort anywhere (the
    // straggler shape a single-key window would plan). Output is ranks
    // only; ties break by vec_id, so the result is deterministic even
    // though the cosine floats are compared only within one engine.
    // Degenerate (zero-norm) vectors rank NOWHERE on either side: Spark
    // filters the NULL sims, the oracle the NaNs.
    ("x_knn_join",
      (s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        VF.knnJoin(
          e.filter(col("vec_id") % 50 =!= 0),
          e.filter(col("vec_id") % 50 === 0),
          "vec_id", "embedding", "vec_id", "embedding", k = 5)
          .orderBy("query_id", "rank")
      },
      """WITH q AS (
        |  SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 50 = 0),
        |sims AS (
        |  SELECT qid, vec_id, list_cosine_similarity(embedding, qe) AS sim
        |  FROM embeddings, q WHERE vec_id % 50 <> 0),
        |ranked AS (
        |  SELECT qid, vec_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rank
        |  FROM sims WHERE NOT isnan(sim))
        |SELECT qid AS query_id, CAST(rank AS BIGINT) AS rank, vec_id
        |FROM ranked WHERE rank <= 5 ORDER BY 1, 2""".stripMargin),


    // X6h: RANDOM-SIGN PROJECTION (Johnson-Lindenstrauss / Achlioptas ±1)
    // — the dimensionality cut that runs BEFORE similarity work at 100 TB:
    // 64 float lanes become 8 exact-BIGINT lanes, map-only (the ±1 matrix
    // is an outDims×dim literal riding in the plan — the broadcast-the-
    // projection-matrix shape), composed over the stored int8 codes so
    // every output lane is integer arithmetic with NO float summation
    // order to diverge across engines or partitionings. The gate
    // aggregates the projected lanes per (label, output-dim) — exact
    // BIGINT sums — and DuckDB regenerates the identical matrix from
    // md5(i_j) parity alone, so agreement proves both the quantization
    // and the projection bit-match ([[graft.functions.VectorFunctions
    // .signMatrix]] / [[graft.functions.VectorFunctions.signProject]]).
    ("x_random_projection",
      (s: SparkSession, d: String) => {
        val e = Tables.embeddings(s, d)
        val dim = e.select(size(col("embedding"))).head.getInt(0)
        val signs = VF.signMatrix(dim, 8)
        // no sanitizeVector here: the oracle quantizes the raw embedding,
        // and the twins must compute the SAME function (the fixture is
        // finite — x_embed_quantize pins that contract); compose
        // sanitizeVector on corpora that don't guarantee finite floats
        e.select(col("label"),
            VF.signProject(
              VF.quantizeInt8(col("embedding"))("codes"),
              signs).as("proj"))
          .select(col("label"), posexplode(col("proj")).as(Seq("j", "p")))
          .groupBy(col("label"), col("j").cast("long").as("j"))
          .agg(count(lit(1)).as("n"), sum(col("p")).as("proj_sum"))
          .orderBy("label", "j")
      },
      """WITH qz AS (
        |  SELECT label,
        |    CASE WHEN amax = 0
        |      THEN list_transform(embedding, v -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding,
        |        v -> CAST(floor(CAST(v AS DOUBLE) * 127.0 / amax + 0.5) AS BIGINT))
        |      END AS codes
        |  FROM (SELECT label, embedding,
        |          list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS amax
        |        FROM embeddings)),
        |lanes AS (
        |  SELECT label, unnest(codes) AS c,
        |    generate_subscripts(codes, 1) - 1 AS i
        |  FROM qz),
        |proj AS (
        |  SELECT label, j,
        |    CAST(sum(c * CASE WHEN substr(md5(i || '_' || j), 1, 1)
        |                      BETWEEN '0' AND '7' THEN 1 ELSE -1 END) AS BIGINT)
        |      AS proj_sum
        |  FROM lanes CROSS JOIN (SELECT unnest(range(8)) AS j)
        |  GROUP BY 1, 2),
        |n AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1)
        |SELECT p.label, p.j, n.n, p.proj_sum
        |FROM proj p JOIN n USING (label)
        |ORDER BY 1, 2""".stripMargin),


    // X6j: LABEL PURITY by nearest-centroid assignment — the clustering /
    // labeling-quality evaluation: every vector assigns to the label
    // centroid with the highest cosine, and the confusion matrix
    // (label × assigned) summarizes how separable the labeled space is.
    // Everything rides the EXACT quantized codes (x_embed_quantize's
    // contract): centroid SUMS are per-(label, lane) BIGINT aggregates —
    // never float means, whose summation order could diverge — and the
    // per-vector scores are dot(codes, sum_l) / √(‖sum_l‖²): an exact
    // BIGINT dot (ordered lane fold) over exact sums, one correctly-
    // rounded sqrt of an exact integer, one division — bit-identical on
    // both engines. ‖x‖ is label-independent, so dropping it changes no
    // argmax. The labels×dim sum table is the ONLY collected state (the
    // IVF-centroid discipline); scoring is map-only against the
    // broadcast literal, the per-vector argmax is one keyed window with
    // an explicit (score DESC, label) tie-break.
    ("x_label_purity",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.embeddings(s, d)
          .withColumn("codes", VF.quantizeInt8(col("embedding"))("codes"))
          .select("vec_id", "label", "codes") // drop the floats BEFORE the
          .localCheckpoint() // pin: codes feed the centroid agg AND scoring
        val cents = e.select(col("label"), posexplode(col("codes")).as(Seq("i", "c")))
          .groupBy("label", "i").agg(sum(col("c")).as("sl"))
          .collect().groupBy(_.getInt(0))
          .map { case (lab, rows) =>
            lab -> rows.sortBy(_.getInt(1)).map(_.getLong(2)) }
        val scoreCols = cents.toSeq.sortBy(_._1).map { case (lab, sl) =>
          val s2 = sl.map(v => v * v).sum
          val dot = aggregate(
            zip_with(col("codes"), typedLit(sl.toSeq), (a, b) => a * b),
            lit(0L), (acc, x) => acc + x)
          struct((dot.cast("double") / lit(math.sqrt(s2.toDouble))).as("score"),
            lit(lab).as("clabel"))
        }
        e.select(col("vec_id"), col("label"),
            explode(array(scoreCols: _*)).as("sc"))
          .select(col("vec_id"), col("label"),
            col("sc.score").as("score"), col("sc.clabel").as("clabel"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("vec_id").orderBy(col("score").desc, col("clabel"))))
          .filter(col("rk") === 1)
          .groupBy(col("label"), col("clabel").as("assigned"))
          .agg(count(lit(1)).as("n"))
          .orderBy("label", "assigned")
      },
      """WITH qz AS (
        |  SELECT vec_id, label,
        |    CASE WHEN amax = 0
        |      THEN list_transform(embedding, v -> CAST(0 AS BIGINT))
        |      ELSE list_transform(embedding,
        |        v -> CAST(floor(CAST(v AS DOUBLE) * 127.0 / amax + 0.5) AS BIGINT))
        |      END AS codes
        |  FROM (SELECT vec_id, label, embedding,
        |          list_max(list_transform(embedding, v -> abs(CAST(v AS DOUBLE)))) AS amax
        |        FROM embeddings)),
        |lanes AS (
        |  SELECT vec_id, label, unnest(codes) AS c,
        |    generate_subscripts(codes, 1) AS i
        |  FROM qz),
        |cents AS (
        |  SELECT label AS clabel, i, CAST(sum(c) AS BIGINT) AS sl
        |  FROM lanes GROUP BY 1, 2),
        |snorm AS (SELECT clabel, CAST(sum(sl * sl) AS BIGINT) AS s2
        |          FROM cents GROUP BY 1),
        |dots AS (
        |  SELECT l.vec_id, l.label, c.clabel, CAST(sum(l.c * c.sl) AS BIGINT) AS dot
        |  FROM lanes l JOIN cents c ON l.i = c.i GROUP BY 1, 2, 3),
        |scores AS (
        |  SELECT d.vec_id, d.label, d.clabel,
        |    CAST(d.dot AS DOUBLE) / sqrt(CAST(n.s2 AS DOUBLE)) AS score
        |  FROM dots d JOIN snorm n USING (clabel)),
        |top AS (
        |  SELECT vec_id, label, clabel, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY score DESC, clabel) AS rk
        |  FROM scores)
        |SELECT label, clabel AS assigned, count(*) AS n
        |FROM top WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),


    // X3g: ANN RECALL@10 as an ORACLE GATE (r9 verdict #4, MULTI-PROBE
    // upgrade r10 verdict #1) — retrieval QUALITY regression-gated, not
    // just plan shape: for every query in a deterministic panel
    // (vec_id % 97), four probe strategies' top-10 are intersected with
    // the exact brute-force top-10 and the per-query hit counts surface
    // as exact integers:
    //   lsh_hits    — one 8-bit sign cell (the honest single-table floor)
    //   lsh_mp_hits — OR of 8 independent 8-bit bands covering all 64
    //                 dims ([[VectorFunctions.lshBands]]): ~3% of the
    //                 corpus probed, recall ×2-3 the single cell
    //   ivf_hits    — nearest of 16 frozen centroids (1/16 of the corpus)
    //   ivf_mp_hits — nprobe=4 of the same 16 cells
    //                 ([[VectorFunctions.ivfProbeCellsExact]]): 4× the
    //                 candidates, recall rises accordingly
    // The fixture's embeddings are ISOTROPIC noise (pairwise cosine σ =
    // 1/√64), so recall ≈ fraction-probed is the information-theoretic
    // ceiling here — the monotone lift across the four columns is the
    // contract; the ≥8/10 demonstration lives in x_ann_recall_clustered
    // where the corpus has the cluster structure real embedding corpora
    // have. Ground truth runs through the SHIPPED knnJoin (bucketed
    // two-stage top-k); the IVF cells use the 16 corpus vectors
    // vec_id ∈ {1..16} as frozen centroids so BOTH engines derive the
    // identical assignment (argmin of the reduced d² form c·c − 2·v·c,
    // ties on centroid id — k-means centroids would be
    // Spark-private state the oracle cannot see). Every set boundary is
    // rank-based with id tie-breaks, so the intersections are
    // engine-exact; a probe whose cells miss a query entirely scores an
    // honest 0, not a dropped row.
    ("x_ann_recall",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.embeddings(s, d)
        val queries = e.filter(col("vec_id") % 97 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
        val corpus = e.filter(col("vec_id") % 97 =!= 0)
        val brute = VF.knnJoin(corpus, queries, "vec_id", "embedding",
            "query_id", "q_emb", k = 10)
          .select(col("query_id"), col("vec_id").as("neighbor_id"))
          .localCheckpoint() // ground truth is read five times below
        def top10(probe: DataFrame): DataFrame = {
          val w = Window.partitionBy(col("query_id"))
            .orderBy(col("sim").desc, col("neighbor_id"))
          probe
            .withColumn("sim", nanvl(VF.cosineSimilarity(col("q_emb"), col("c_emb")),
              lit(null).cast("double")))
            .filter(col("sim").isNotNull)
            .withColumn("rank", row_number().over(w))
            .filter(col("rank") <= 10)
            .select("query_id", "neighbor_id")
        }
        val cEmb = corpus.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("c_emb"))
        // LSH single-cell: candidates share the query's 8-bit sign cell
        val qLsh = queries.withColumn("cell", VF.lshBucket(col("q_emb"), bits = 8))
        val cLsh = cEmb.withColumn("cell", VF.lshBucket(col("c_emb"), bits = 8))
        val lsh = top10(qLsh.join(cLsh, "cell"))
        // LSH multi-band OR: a pair colliding in several bands must rank
        // once, so the candidate pairs dedup on (query, neighbor) — the
        // embeddings ride along (functionally determined by the keys)
        val qBands = queries.select(col("query_id"), col("q_emb"),
          explode(VF.lshBands(col("q_emb"), bands = 8, bits = 8)).as("cell"))
        val cBands = cEmb.select(col("neighbor_id"), col("c_emb"),
          explode(VF.lshBands(col("c_emb"), bands = 8, bits = 8)).as("cell"))
        val lshMp = top10(qBands.join(cBands, "cell")
          .dropDuplicates("query_id", "neighbor_id"))
        // IVF: frozen centroids both engines can see (corpus vectors
        // 1..16), nearest cell(s) by the exact reduced d² form
        val cents = e.filter(col("vec_id").between(1L, 16L))
          .select(col("vec_id"), col("embedding")).collect()
          .sortBy(_.getLong(0))
          .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
        require(cents.length == 16, "centroid seed vectors missing from fixture")
        val cIvf = cEmb.withColumn("cell", VF.ivfCellExact(col("c_emb"), cents))
        val qIvf = queries.withColumn("cell", VF.ivfCellExact(col("q_emb"), cents))
        val ivf = top10(qIvf.join(cIvf, "cell"))
        // corpus rows hold ONE cell and the probe list is distinct, so the
        // multi-probe join cannot duplicate a pair — no dedup needed
        val qIvfMp = queries.select(col("query_id"), col("q_emb"),
          explode(VF.ivfProbeCellsExact(col("q_emb"), cents, nprobe = 4)).as("cell"))
        val ivfMp = top10(qIvfMp.join(cIvf, "cell"))
        def hitsOf(probe: DataFrame, name: String): DataFrame =
          brute.join(probe, Seq("query_id", "neighbor_id"))
            .groupBy("query_id").agg(count(lit(1)).as(name))
        val bk = brute.groupBy("query_id").agg(count(lit(1)).as("brute_k"))
        bk.join(hitsOf(lsh, "lsh_hits"), Seq("query_id"), "left")
          .join(hitsOf(lshMp, "lsh_mp_hits"), Seq("query_id"), "left")
          .join(hitsOf(ivf, "ivf_hits"), Seq("query_id"), "left")
          .join(hitsOf(ivfMp, "ivf_mp_hits"), Seq("query_id"), "left")
          .select(col("query_id"), col("brute_k"),
            coalesce(col("lsh_hits"), lit(0L)).as("lsh_hits"),
            coalesce(col("lsh_mp_hits"), lit(0L)).as("lsh_mp_hits"),
            coalesce(col("ivf_hits"), lit(0L)).as("ivf_hits"),
            coalesce(col("ivf_mp_hits"), lit(0L)).as("ivf_mp_hits"))
          .orderBy("query_id")
      },
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |  FROM embeddings WHERE vec_id % 97 = 0),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS ce
        |  FROM embeddings WHERE vec_id % 97 <> 0),
        |bscored AS (
        |  SELECT q.query_id, c.neighbor_id,
        |    list_cosine_similarity(c.ce, q.qe) AS sim
        |  FROM q, c),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |    FROM bscored WHERE sim IS NOT NULL AND NOT isnan(sim))
        |  WHERE rn <= 10),
        |cells AS (
        |  SELECT vec_id, array_to_string(list_transform(embedding[1:8],
        |    x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '') AS cell
        |  FROM embeddings),
        |lscored AS (
        |  SELECT q.query_id, c.neighbor_id,
        |    list_cosine_similarity(c.ce, q.qe) AS sim
        |  FROM q JOIN cells qc ON qc.vec_id = q.query_id
        |  JOIN cells cc ON cc.cell = qc.cell
        |  JOIN c ON c.neighbor_id = cc.vec_id),
        |lsh AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |    FROM lscored WHERE sim IS NOT NULL AND NOT isnan(sim))
        |  WHERE rn <= 10),
        |bands AS (
        |  SELECT e.vec_id, CAST(t.b AS VARCHAR) || ':' || array_to_string(
        |    list_transform(generate_series(t.b * 8 + 1, t.b * 8 + 8),
        |      i -> CASE WHEN e.embedding[i] >= 0 THEN '1' ELSE '0' END), '') AS cell
        |  FROM embeddings e, generate_series(0, 7) AS t(b)),
        |mcand AS (
        |  SELECT DISTINCT q.query_id, c.neighbor_id
        |  FROM q JOIN bands qb ON qb.vec_id = q.query_id
        |  JOIN bands cb ON cb.cell = qb.cell
        |  JOIN c ON c.neighbor_id = cb.vec_id),
        |mscored AS (
        |  SELECT m.query_id, m.neighbor_id,
        |    list_cosine_similarity(c.ce, q.qe) AS sim
        |  FROM mcand m JOIN q USING (query_id) JOIN c USING (neighbor_id)),
        |lshmp AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |    FROM mscored WHERE sim IS NOT NULL AND NOT isnan(sim))
        |  WHERE rn <= 10),
        |cents AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cemb
        |  FROM embeddings WHERE vec_id BETWEEN 1 AND 16),
        |dists AS (
        |  SELECT v.vec_id, ct.cid,
        |    list_dot_product(ct.cemb, ct.cemb)
        |      - 2 * list_dot_product(CAST(v.embedding AS DOUBLE[]), ct.cemb) AS d2
        |  FROM embeddings v, cents ct),
        |dranked AS (
        |  SELECT vec_id, cid, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM dists),
        |assigned AS (SELECT vec_id, cid AS cell FROM dranked WHERE rn = 1),
        |probes AS (SELECT vec_id, cid AS cell FROM dranked WHERE rn <= 4),
        |iscored AS (
        |  SELECT q.query_id, c.neighbor_id,
        |    list_cosine_similarity(c.ce, q.qe) AS sim
        |  FROM q JOIN assigned qa ON qa.vec_id = q.query_id
        |  JOIN assigned ca ON ca.cell = qa.cell
        |  JOIN c ON c.neighbor_id = ca.vec_id),
        |ivf AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |    FROM iscored WHERE sim IS NOT NULL AND NOT isnan(sim))
        |  WHERE rn <= 10),
        |imscored AS (
        |  SELECT q.query_id, c.neighbor_id,
        |    list_cosine_similarity(c.ce, q.qe) AS sim
        |  FROM q JOIN probes qp ON qp.vec_id = q.query_id
        |  JOIN assigned ca ON ca.cell = qp.cell
        |  JOIN c ON c.neighbor_id = ca.vec_id),
        |ivfmp AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |    FROM imscored WHERE sim IS NOT NULL AND NOT isnan(sim))
        |  WHERE rn <= 10),
        |bk AS (SELECT query_id, count(*) AS brute_k FROM brute GROUP BY 1),
        |lh AS (SELECT b.query_id, count(*) AS h FROM brute b
        |  JOIN lsh l ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
        |  GROUP BY 1),
        |lmh AS (SELECT b.query_id, count(*) AS h FROM brute b
        |  JOIN lshmp l ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
        |  GROUP BY 1),
        |ih AS (SELECT b.query_id, count(*) AS h FROM brute b
        |  JOIN ivf i ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
        |  GROUP BY 1),
        |imh AS (SELECT b.query_id, count(*) AS h FROM brute b
        |  JOIN ivfmp i ON b.query_id = i.query_id AND b.neighbor_id = i.neighbor_id
        |  GROUP BY 1)
        |SELECT bk.query_id, bk.brute_k,
        |  CAST(coalesce(lh.h, 0) AS BIGINT) AS lsh_hits,
        |  CAST(coalesce(lmh.h, 0) AS BIGINT) AS lsh_mp_hits,
        |  CAST(coalesce(ih.h, 0) AS BIGINT) AS ivf_hits,
        |  CAST(coalesce(imh.h, 0) AS BIGINT) AS ivf_mp_hits
        |FROM bk LEFT JOIN lh USING (query_id) LEFT JOIN lmh USING (query_id)
        |LEFT JOIN ih USING (query_id) LEFT JOIN imh USING (query_id)
        |ORDER BY query_id""".stripMargin),


    // X3h: the ≥8/10 RECALL FLOOR, demonstrated where it is achievable —
    // a corpus WITH cluster structure (r10 verdict #1's "done" bar). The
    // raw fixture is isotropic noise, where recall ≈ fraction-probed is
    // information-theoretically forced on ANY sublinear index; real
    // embedding corpora are clustered, and THAT is the case an IVF index
    // exists for. Both engines derive the same clustered corpus from the
    // fixture: group g = vec_id % 8, clustered[i] = double(embedding[i])
    // + 0.25·[i%8 = g] (0.25 is exact in binary, so the planted shift
    // adds deterministically in both engines). The 8 frozen centroids are
    // the pure shift vectors themselves — compile-time constants visible
    // to both engines, nothing data-dependent. The shipped multi-probe
    // ([[VectorFunctions.ivfProbeCellsExact]], nprobe=2 of 8 cells ⇒ 25%
    // of the corpus per query, surfaced as cand_rows) is what crosses the
    // bar: single-probe bottoms out at 5/10 on this corpus at sf0.1,
    // nprobe=2 lifts every query to ≥8/10 — and the gate REQUIREs that
    // floor in-process, so a recall regression fails loudly rather than
    // shipping a lower integer that still hash-matches.
    ("x_ann_recall_clustered",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val e = Tables.embeddings(s, d)
        val clustered = clusteredEmbeddings(e)
        val queries = clustered.filter(col("vec_id") % 97 === 0)
          .select(col("vec_id").as("query_id"), col("v").as("q_emb"))
        val corpus = clustered.filter(col("vec_id") % 97 =!= 0)
        val brute = VF.knnJoin(corpus, queries, "vec_id", "v",
            "query_id", "q_emb", k = 10)
          .select(col("query_id"), col("vec_id").as("neighbor_id"))
          .localCheckpoint() // read twice: brute_k + the hit intersection
        val cents = shiftCentroids
        val cIvf = corpus.select(col("vec_id").as("neighbor_id"),
            col("v").as("c_emb"))
          .withColumn("cell", VF.ivfCellExact(col("c_emb"), cents))
        val qProbe = queries.select(col("query_id"), col("q_emb"),
          explode(VF.ivfProbeCellsExact(col("q_emb"), cents, nprobe = 2)).as("cell"))
        val cand = qProbe.join(cIvf, "cell")
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("sim").desc, col("neighbor_id"))
        val mp = cand
          .withColumn("sim", nanvl(VF.cosineSimilarity(col("q_emb"), col("c_emb")),
            lit(null).cast("double")))
          .filter(col("sim").isNotNull)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 10)
          .select("query_id", "neighbor_id")
        val out = brute.groupBy("query_id").agg(count(lit(1)).as("brute_k"))
          .join(cand.groupBy("query_id").agg(count(lit(1)).as("cand_rows")),
            Seq("query_id"), "left")
          .join(brute.join(mp, Seq("query_id", "neighbor_id"))
              .groupBy("query_id").agg(count(lit(1)).as("mp_hits")),
            Seq("query_id"), "left")
          .select(col("query_id"), col("brute_k"),
            coalesce(col("cand_rows"), lit(0L)).as("cand_rows"),
            coalesce(col("mp_hits"), lit(0L)).as("mp_hits"))
          .orderBy("query_id")
          .localCheckpoint() // certified below, then returned as-is
        val rows = out.collect()
        require(rows.nonEmpty && rows.forall(_.getAs[Long]("mp_hits") >= 8L),
          s"multi-probe recall floor broken: " + rows.map(r =>
            s"q${r.getAs[Long]("query_id")}=${r.getAs[Long]("mp_hits")}").mkString(","))
        out
      },
      """WITH base AS (
        |  SELECT vec_id, list_transform(generate_series(1, 64), i ->
        |    CAST(embedding[i] AS DOUBLE) +
        |    CASE WHEN (i - 1) % 8 = vec_id % 8 THEN 0.25 ELSE 0.0 END) AS v
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, v AS qe FROM base WHERE vec_id % 97 = 0),
        |c AS (SELECT vec_id AS neighbor_id, v AS ce FROM base WHERE vec_id % 97 <> 0),
        |bscored AS (
        |  SELECT q.query_id, c.neighbor_id,
        |    list_cosine_similarity(c.ce, q.qe) AS sim
        |  FROM q, c),
        |brute AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |    FROM bscored WHERE sim IS NOT NULL AND NOT isnan(sim))
        |  WHERE rn <= 10),
        |cents AS (
        |  SELECT g AS cid, list_transform(generate_series(1, 64), i ->
        |    CASE WHEN (i - 1) % 8 = g THEN 0.25 ELSE 0.0 END) AS cemb
        |  FROM generate_series(0, 7) AS t(g)),
        |dists AS (
        |  SELECT b.vec_id, ct.cid,
        |    list_dot_product(ct.cemb, ct.cemb)
        |      - 2 * list_dot_product(b.v, ct.cemb) AS d2
        |  FROM base b, cents ct),
        |dranked AS (
        |  SELECT vec_id, cid, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM dists),
        |assigned AS (SELECT vec_id, cid AS cell FROM dranked WHERE rn = 1),
        |probes AS (SELECT vec_id, cid AS cell FROM dranked WHERE rn <= 2),
        |cand AS (
        |  SELECT q.query_id, c.neighbor_id, c.ce, q.qe
        |  FROM q JOIN probes qp ON qp.vec_id = q.query_id
        |  JOIN assigned ca ON ca.cell = qp.cell
        |  JOIN c ON c.neighbor_id = ca.vec_id),
        |mp AS (SELECT query_id, neighbor_id FROM (
        |    SELECT query_id, neighbor_id, row_number() OVER (
        |      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rn
        |    FROM (SELECT query_id, neighbor_id,
        |        list_cosine_similarity(ce, qe) AS sim FROM cand)
        |    WHERE sim IS NOT NULL AND NOT isnan(sim))
        |  WHERE rn <= 10),
        |bk AS (SELECT query_id, count(*) AS brute_k FROM brute GROUP BY 1),
        |cr AS (SELECT query_id, count(*) AS cand_rows FROM cand GROUP BY 1),
        |mh AS (SELECT b.query_id, count(*) AS h FROM brute b
        |  JOIN mp m ON b.query_id = m.query_id AND b.neighbor_id = m.neighbor_id
        |  GROUP BY 1)
        |SELECT bk.query_id, bk.brute_k,
        |  CAST(coalesce(cr.cand_rows, 0) AS BIGINT) AS cand_rows,
        |  CAST(coalesce(mh.h, 0) AS BIGINT) AS mp_hits
        |FROM bk LEFT JOIN cr USING (query_id) LEFT JOIN mh USING (query_id)
        |ORDER BY query_id""".stripMargin),


    // X3i: the FULL 100 TB retrieval story in ONE gate — durable
    // partition-pruned index + multi-probe + certified recall, all
    // oracle-exact. x_ann_recall_clustered proves the recall math but
    // derives candidates with an in-query join; x_ann_index proves a
    // persisted index prunes but probes ONE cell of a k-means index the
    // oracle cannot see. This gate composes them with nothing
    // engine-private: the CLUSTERED corpus persists as a Graft table
    // identity-partitioned on its [[VectorFunctions.ivfCellExact]] cell
    // (8 frozen shift-vector centroids), the query's nprobe=2 probe list
    // becomes ONE In-predicate scan whose metrics certify the read
    // touched ONLY the probed cells' partitions (`probe_pruned`, 2 of 8),
    // candidates come FROM THAT PRUNED READ (not a full-table join), and
    // every top-10 row is flagged against the exact brute-force set
    // (shipped [[VectorFunctions.bruteForceTopK]]) with ≥8/10 REQUIREd
    // in-process. At 100 TB this is the shape a vector store actually
    // runs: the index is a partitioned table, a probe is a pruned scan,
    // and recall is a measured number — not a hope.
    ("x_ann_index_multiprobe",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        val clustered = clusteredEmbeddings(Tables.embeddings(s, d))
        val assigned = clustered
          .withColumn("cell", VF.ivfCellExact(col("v"), shiftCentroids))
        val t = TableOps.newCatalog().createTable("db.ann_mp", assigned.schema,
          partitionBy = Seq("cell" -> Transform.Identity))
        t.append(s, assigned)
        prunedMultiprobeTopK(s, t, clustered, shiftCentroids)
      },
      """WITH base AS (
        |  SELECT vec_id, list_transform(generate_series(1, 64), i ->
        |    CAST(embedding[i] AS DOUBLE) +
        |    CASE WHEN (i - 1) % 8 = vec_id % 8 THEN 0.25 ELSE 0.0 END) AS v
        |  FROM embeddings),
        |q AS (SELECT v AS qe FROM base WHERE vec_id = 0),
        |c AS (SELECT vec_id AS neighbor_id, v AS ce FROM base
        |  WHERE vec_id % 97 <> 0),
        |brute AS (SELECT neighbor_id FROM (
        |    SELECT c.neighbor_id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(c.ce, q.qe) DESC, c.neighbor_id) AS rn
        |    FROM c, q
        |    WHERE list_cosine_similarity(c.ce, q.qe) IS NOT NULL
        |      AND NOT isnan(list_cosine_similarity(c.ce, q.qe)))
        |  WHERE rn <= 10),
        |cents AS (
        |  SELECT g AS cid, list_transform(generate_series(1, 64), i ->
        |    CASE WHEN (i - 1) % 8 = g THEN 0.25 ELSE 0.0 END) AS cemb
        |  FROM generate_series(0, 7) AS t(g)),
        |dists AS (
        |  SELECT b.vec_id, ct.cid,
        |    list_dot_product(ct.cemb, ct.cemb)
        |      - 2 * list_dot_product(b.v, ct.cemb) AS d2
        |  FROM base b, cents ct),
        |dranked AS (
        |  SELECT vec_id, cid, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM dists),
        |assigned AS (SELECT vec_id, cid AS cell FROM dranked WHERE rn = 1),
        |probes AS (SELECT cid AS cell FROM dranked WHERE vec_id = 0 AND rn <= 2),
        |top AS (
        |  SELECT rank, neighbor_id FROM (
        |    SELECT c.neighbor_id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(c.ce, q.qe) DESC, c.neighbor_id) AS rank
        |    FROM c JOIN assigned a ON a.vec_id = c.neighbor_id
        |    JOIN probes p ON p.cell = a.cell
        |    CROSS JOIN q
        |    WHERE list_cosine_similarity(c.ce, q.qe) IS NOT NULL
        |      AND NOT isnan(list_cosine_similarity(c.ce, q.qe)))
        |  WHERE rank <= 10)
        |SELECT CAST(t.rank AS BIGINT) AS rank, t.neighbor_id,
        |  EXISTS (SELECT 1 FROM brute b WHERE b.neighbor_id = t.neighbor_id)
        |    AS hit,
        |  true AS probe_pruned, CAST(2 AS BIGINT) AS cells_probed
        |FROM top t ORDER BY 1""".stripMargin),


    // X3i2: the durable multiprobe index probe with QUANTIZED coarse-rank
    // composed in (r11 verdict #4) — x_ann_index_multiprobe exact-ranks
    // the pruned cells' FLOATS; at 100 TB the probe wants codes-only I/O
    // first. The index table stores int8 codes (the shipped
    // [[VectorFunctions.quantizeInt8]]) beside the floats; the probe is
    // the same nprobe=2 In-predicate pruned scan, the coarse pass ranks
    // by exact-integer quantized cosine over (vec_id, codes) ONLY — the
    // float column is column-pruned out of the coarse read, and
    // `codes_only_scan` pins that as a ReadSchema FACT on the executing
    // plan — then only the 50 coarse winners are re-ranked by exact float
    // cosine for the top 10 (x_sim_quantized's reduction law against the
    // durable index). Recall floor ≥8/10 vs exact brute force REQUIREd
    // in-process, same as the float probe. The oracle recomputes
    // quantization, cell assignment, probe list, coarse cut and re-rank
    // from raw data — every int8 code and coarse ratio is the identical
    // IEEE/BIGINT expression in both engines, so the candidate CUT (not
    // just the final ranks) must agree bit-for-bit.
    ("x_ann_index_quantized",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        val clustered = clusteredEmbeddings(Tables.embeddings(s, d))
        val assigned = clustered
          .withColumn("cell", VF.ivfCellExact(col("v"), shiftCentroids))
          .withColumn("codes", VF.quantizeInt8(col("v")).getField("codes"))
          .select("vec_id", "v", "cell", "codes")
        val t = TableOps.newCatalog().createTable("db.ann_qz", assigned.schema,
          partitionBy = Seq("cell" -> Transform.Identity))
        t.append(s, assigned)
        prunedQuantizedTopK(s, t, clustered, shiftCentroids)
      },
      """WITH base AS (
        |  SELECT vec_id, list_transform(generate_series(1, 64), i ->
        |    CAST(embedding[i] AS DOUBLE) +
        |    CASE WHEN (i - 1) % 8 = vec_id % 8 THEN 0.25 ELSE 0.0 END) AS v
        |  FROM embeddings),
        |qq AS (SELECT v AS qe, list_transform(v, x -> CAST(floor(x * 127.0
        |    / list_max(list_transform(v, u -> abs(u))) + 0.5) AS BIGINT)) AS qcodes
        |  FROM base WHERE vec_id = 0),
        |c AS (SELECT vec_id AS neighbor_id, v AS ce FROM base
        |  WHERE vec_id % 97 <> 0),
        |cz AS (SELECT neighbor_id, ce, list_transform(ce, x -> CAST(floor(x * 127.0
        |    / list_max(list_transform(ce, u -> abs(u))) + 0.5) AS BIGINT)) AS codes
        |  FROM c),
        |brute AS (SELECT neighbor_id FROM (
        |    SELECT c.neighbor_id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(c.ce, qq.qe) DESC, c.neighbor_id) AS rn
        |    FROM c, qq
        |    WHERE list_cosine_similarity(c.ce, qq.qe) IS NOT NULL
        |      AND NOT isnan(list_cosine_similarity(c.ce, qq.qe)))
        |  WHERE rn <= 10),
        |cents AS (
        |  SELECT g AS cid, list_transform(generate_series(1, 64), i ->
        |    CASE WHEN (i - 1) % 8 = g THEN 0.25 ELSE 0.0 END) AS cemb
        |  FROM generate_series(0, 7) AS t(g)),
        |dists AS (
        |  SELECT b.vec_id, ct.cid,
        |    list_dot_product(ct.cemb, ct.cemb)
        |      - 2 * list_dot_product(b.v, ct.cemb) AS d2
        |  FROM base b, cents ct),
        |dranked AS (
        |  SELECT vec_id, cid, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM dists),
        |assigned AS (SELECT vec_id, cid AS cell FROM dranked WHERE rn = 1),
        |probes AS (SELECT cid AS cell FROM dranked WHERE vec_id = 0 AND rn <= 2),
        |coarse AS (
        |  SELECT z.neighbor_id, z.ce,
        |    list_dot_product(z.codes, qq.qcodes)
        |      / sqrt(list_dot_product(z.codes, z.codes)
        |             * list_dot_product(qq.qcodes, qq.qcodes)) AS qsim
        |  FROM cz z JOIN assigned a ON a.vec_id = z.neighbor_id
        |  JOIN probes p ON p.cell = a.cell
        |  CROSS JOIN qq
        |  ORDER BY qsim DESC, z.neighbor_id LIMIT 50),
        |top AS (SELECT rank, neighbor_id FROM (
        |    SELECT z.neighbor_id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(z.ce, qq.qe) DESC, z.neighbor_id) AS rank
        |    FROM coarse z CROSS JOIN qq)
        |  WHERE rank <= 10)
        |SELECT CAST(t.rank AS BIGINT) AS rank, t.neighbor_id,
        |  EXISTS (SELECT 1 FROM brute b WHERE b.neighbor_id = t.neighbor_id)
        |    AS hit,
        |  true AS probe_pruned, CAST(2 AS BIGINT) AS cells_probed,
        |  true AS codes_only_scan
        |FROM top t ORDER BY 1""".stripMargin),


    // X3k: ANN index REBUILD with RE-TRAINED centroids and an ATOMIC
    // swap — the vector lifecycle leg refresh/streaming cannot cover:
    // both freeze centroids (correctly — re-clustering on ingest would
    // invalidate stored assignments), but a real corpus's embedding
    // distribution DRIFTS. The fixture plants the drift: the original
    // stride-cluster population is joined by a block-cluster population
    // ([[blockEmbeddings]] — overlaps any stride centroid in exactly one
    // dim), ingested under the FROZEN old centroids (the refresh leg's
    // rule). The gate then (1) MEASURES that the old index is broken for
    // a drifted query — the stale probe, run THROUGH THE TIME-TRAVEL
    // READ of the pre-swap snapshot, recalls only `stale_hits` of 10
    // (2-5 across SFs, REQUIREd < 8) while reading MORE candidates than
    // the rebuilt probe; (2) REBUILDS: the 16 fresh centroids (the
    // drifted corpus's planted solution — at fixture scale the planted
    // shift is far below the isotropic noise floor, so centroid quality
    // is certified by the operational metric, measured probe recall,
    // not by parameter recovery), the new cell-partitioned index built
    // STAGED and installed by [[graft.table.GraftTable.replaceWith]]'s
    // single CAS — every file write happens inside the commit closure
    // BEFORE the swap lands, so probes read the complete old index until
    // the commit and the complete new index after (AnnRebuildSpec proves
    // no snapshot ever exposes a half-built index, including a crashed
    // rebuild); (3) re-certifies the ≥8/10 floor on the REBUILT index
    // with the shared pruned multi-probe (10/10 measured), and (4)
    // proves the pre-swap snapshot still reads the complete OLD index
    // row-for-row (`pre_swap_preserved`, REQUIREd).
    ("x_ann_index_rebuild",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, Transform}
        val e = Tables.embeddings(s, d)
        val grown = clusteredEmbeddings(e).unionByName(blockEmbeddings(e))
        val cents16 = shiftCentroids ++ blockCentroids
        val cat = TableOps.newCatalog()
        // pre-rebuild life: index built for the stride population, the
        // drifted population ingested under the frozen old centroids
        val t = {
          val oldAssigned = clusteredEmbeddings(e)
            .withColumn("cell", VF.ivfCellExact(col("v"), shiftCentroids))
          val tbl = cat.createTable("db.ann_rebuild", oldAssigned.schema,
            partitionBy = Seq("cell" -> Transform.Identity))
          tbl.append(s, oldAssigned)
          tbl.append(s, blockEmbeddings(e)
            .withColumn("cell", VF.ivfCellExact(col("v"), shiftCentroids)))
          tbl
        }
        val preSwap = t.meta.currentSnapshotId.get
        val preSwapRows = t.toDF(s).localCheckpoint() // compared post-swap
        // REBUILD: new index staged, installed by ONE CAS
        val newAssigned = grown.withColumn("cell",
          VF.ivfCellExact(col("v"), cents16))
        t.replaceWith(newAssigned.schema,
          partitionBy = Seq("cell" -> Transform.Identity),
          spark = Some(s), data = Some(newAssigned))
        require(t.meta.snapshots.size == 3,
          s"rebuild must be ONE commit: ${t.meta.snapshots.size} snapshots")
        val postSwapOld = t.atSnapshot(preSwap).toDF(s)
        val preSwapPreserved = setEqual(postSwapOld, preSwapRows)
        require(preSwapPreserved,
          "time travel must read the complete OLD index pre-swap")
        // the drift, measured through the time-travel read of the OLD
        // index: same probe shape, old centroids, recall collapsed
        val q = grown.filter(col("vec_id") === 970000L).select(col("v").as("q"))
        val oldCells = q
          .select(VF.ivfProbeCellsExact(col("q"), shiftCentroids, nprobe = 2))
          .head.getSeq[Long](0)
        val staleCand = t.atSnapshot(preSwap, Predicate.In("cell", oldCells))
          .toDF(s).filter(col("vec_id") % 97 =!= 0)
          .select(col("vec_id").as("neighbor_id"), col("v").as("c_emb"))
          .crossJoin(broadcast(q))
          .withColumn("sim", nanvl(VF.cosineSimilarity(col("q"), col("c_emb")),
            lit(null).cast("double")))
          .filter(col("sim").isNotNull)
        val brute = VF.bruteForceTopK(
            grown.filter(col("vec_id") % 97 =!= 0), q, "vec_id", "v", 10)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        val staleHits = VF.rankTopK(staleCand, "neighbor_id", 10)
          .select("neighbor_id").collect().map(_.getLong(0)).count(brute)
        require(staleHits < 8,
          s"fixture broke: stale index must miss the floor, got $staleHits/10")
        prunedMultiprobeTopK(s, t, grown, cents16, queryId = 970000L)
          .withColumn("rebuild_commits", lit(t.meta.snapshots.size.toLong))
          .withColumn("stale_hits", lit(staleHits.toLong))
          .withColumn("pre_swap_preserved", lit(preSwapPreserved))
      },
      """WITH base1 AS (
        |  SELECT vec_id, list_transform(generate_series(1, 64), i ->
        |    CAST(embedding[i] AS DOUBLE) +
        |    CASE WHEN (i - 1) % 8 = vec_id % 8 THEN 0.25 ELSE 0.0 END) AS v
        |  FROM embeddings),
        |base2 AS (
        |  SELECT vec_id + 970000 AS vec_id, list_transform(generate_series(1, 64), i ->
        |    CAST(embedding[i] AS DOUBLE) +
        |    CASE WHEN (i - 1) // 8 = vec_id % 8 THEN 0.25 ELSE 0.0 END) AS v
        |  FROM embeddings),
        |grown AS (SELECT * FROM base1 UNION ALL SELECT * FROM base2),
        |q AS (SELECT v AS qe FROM grown WHERE vec_id = 970000),
        |c AS (SELECT vec_id AS neighbor_id, v AS ce FROM grown
        |  WHERE vec_id % 97 <> 0),
        |brute AS (SELECT neighbor_id FROM (
        |    SELECT c.neighbor_id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(c.ce, q.qe) DESC, c.neighbor_id) AS rn
        |    FROM c, q
        |    WHERE list_cosine_similarity(c.ce, q.qe) IS NOT NULL
        |      AND NOT isnan(list_cosine_similarity(c.ce, q.qe)))
        |  WHERE rn <= 10),
        |cents AS (
        |  SELECT g AS cid, list_transform(generate_series(1, 64), i ->
        |    CASE WHEN (i - 1) % 8 = g THEN 0.25 ELSE 0.0 END) AS cemb
        |  FROM generate_series(0, 7) AS t(g)
        |  UNION ALL
        |  SELECT g + 8 AS cid, list_transform(generate_series(1, 64), i ->
        |    CASE WHEN (i - 1) // 8 = g THEN 0.25 ELSE 0.0 END) AS cemb
        |  FROM generate_series(0, 7) AS t(g)),
        |dists AS (
        |  SELECT b.vec_id, ct.cid,
        |    list_dot_product(ct.cemb, ct.cemb)
        |      - 2 * list_dot_product(b.v, ct.cemb) AS d2
        |  FROM grown b, cents ct),
        |dranked AS (
        |  SELECT vec_id, cid, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY d2, cid) AS rn FROM dists),
        |assigned AS (SELECT vec_id, cid AS cell FROM dranked WHERE rn = 1),
        |probes AS (SELECT cid AS cell FROM dranked
        |  WHERE vec_id = 970000 AND rn <= 2),
        |top AS (
        |  SELECT rank, neighbor_id FROM (
        |    SELECT c.neighbor_id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(c.ce, q.qe) DESC, c.neighbor_id) AS rank
        |    FROM c JOIN assigned a ON a.vec_id = c.neighbor_id
        |    JOIN probes p ON p.cell = a.cell
        |    CROSS JOIN q
        |    WHERE list_cosine_similarity(c.ce, q.qe) IS NOT NULL
        |      AND NOT isnan(list_cosine_similarity(c.ce, q.qe)))
        |  WHERE rank <= 10),
        |drankedold AS (
        |  SELECT vec_id, cid, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY d2, cid) AS rn
        |  FROM dists WHERE cid < 8),
        |assignedold AS (SELECT vec_id, cid AS cell FROM drankedold WHERE rn = 1),
        |probesold AS (SELECT cid AS cell FROM drankedold
        |  WHERE vec_id = 970000 AND rn <= 2),
        |staletop AS (
        |  SELECT neighbor_id FROM (
        |    SELECT c.neighbor_id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(c.ce, q.qe) DESC, c.neighbor_id) AS rank
        |    FROM c JOIN assignedold a ON a.vec_id = c.neighbor_id
        |    JOIN probesold p ON p.cell = a.cell
        |    CROSS JOIN q
        |    WHERE list_cosine_similarity(c.ce, q.qe) IS NOT NULL
        |      AND NOT isnan(list_cosine_similarity(c.ce, q.qe)))
        |  WHERE rank <= 10),
        |stale AS (SELECT count(*) AS stale_hits FROM staletop st
        |  JOIN brute b ON b.neighbor_id = st.neighbor_id)
        |SELECT CAST(t.rank AS BIGINT) AS rank, t.neighbor_id,
        |  EXISTS (SELECT 1 FROM brute b WHERE b.neighbor_id = t.neighbor_id)
        |    AS hit,
        |  true AS probe_pruned, CAST(2 AS BIGINT) AS cells_probed,
        |  CAST(3 AS BIGINT) AS rebuild_commits,
        |  CAST(stale.stale_hits AS BIGINT) AS stale_hits,
        |  true AS pre_swap_preserved
        |FROM top t, stale ORDER BY 1""".stripMargin),
  )
}
