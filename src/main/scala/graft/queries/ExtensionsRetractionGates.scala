package graft.queries

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** State-retraction (right-to-be-forgotten) gates: membership deletes, keep-first re-election, aggregate subtraction (SURVEY §2.9 X13).
  *
  * One slice of [[Extensions.entries]] (split in r14 so no single file
  * holds a third of the source); each tuple is (gate key, Spark query,
  * DuckDB oracle SQL) and the semantics are unchanged from the monolith.
  * Self-typed to the aggregator so gate bodies use its shared helpers.
  */
trait ExtensionsRetractionGates { this: Extensions.type =>

  private[queries] def retractionGates: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(


    // X1r: RETRACTION from the durable fingerprint state — the
    // right-to-be-forgotten leg of the dedup lifecycle (batch / durable
    // / compacted / streaming / now RETRACT). A retraction request is a
    // BOUNDED id list (the GDPR shape); its fingerprint set becomes a
    // DELETE predicate whose In probe prunes the rewrite to the state
    // files that plausibly hold a retracted fp (bucket + fp-bloom planes
    // — the same planes the crawl probes use, now bounding a COW
    // rewrite: at 100 TB a retraction touches the files it must, never
    // the whole state). The recrawl then proves the SEMANTICS: exact
    // copies of retracted docs ADMIT again (the state genuinely forgot),
    // copies of surviving history still REJECT, and the state row counts
    // before/after pin that exactly the retracted fps died. The oracle
    // recomputes the post-retraction state from raw data.
    ("x_dedup_retract",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, Transform}
        val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars", "text")
        val hist = docs.filter(col("doc_id") % 2 === 0)
        val fps = hist.select(TF.fingerprint(col("text")).as("fp"))
        val cat = TableOps.newCatalog()
        val t = cat.createTable("db.fp_retract", fps.schema,
          partitionBy = Seq("fp" -> Transform.Bucket(4)),
          properties = Map(graft.format.TableProperties.BloomColumns -> "fp"))
        t.append(s, fps)
        val rowsBefore = t.toDF(s).count()
        // the bounded retraction request: every 20th history doc
        val retractFps = hist.filter(col("doc_id") % 20 === 0)
          .select(TF.fingerprint(col("text")).as("fp")).distinct()
          .collect().map(_.getString(0)).toSeq
        t.delete(s, Seq(Predicate.In("fp", retractFps)))
        val rowsAfter = t.toDF(s).count()
        // recrawl: copies of RETRACTED docs (+5e8) must admit now; copies
        // of SURVIVING history (+6e8) must still reject; fresh odds admit
        val batch = docs.filter(col("doc_id") % 2 === 1)
          .unionByName(hist.filter(col("doc_id") % 20 === 0)
            .select((col("doc_id") + 500000000L).as("doc_id"), col("lang"),
              col("n_chars"), col("text")))
          .unionByName(hist.filter(col("doc_id") % 20 === 2)
            .select((col("doc_id") + 600000000L).as("doc_id"), col("lang"),
              col("n_chars"), col("text")))
        val firstIn = batch
          .select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
          .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
        val admitted = firstIn
          .join(t.toDF(s).select(col("fp")), Seq("fp"), "left_anti")
          .select("doc_id")
        batch.join(broadcast(admitted), "doc_id")
          .groupBy("lang")
          .agg(count(lit(1)).as("admitted"),
            sum(col("n_chars")).cast("long").as("sum_chars"),
            sum(when(col("doc_id") >= 500000000L && col("doc_id") < 600000000L,
              1L).otherwise(0L)).as("readmitted"))
          .withColumn("state_rows_before", lit(rowsBefore))
          .withColumn("state_rows_after", lit(rowsAfter))
          .orderBy("lang")
      },
      """WITH docs AS (SELECT doc_id, lang, n_chars, text FROM documents),
        |retract AS (
        |  SELECT DISTINCT md5(text) AS fp FROM docs
        |  WHERE doc_id % 2 = 0 AND doc_id % 20 = 0),
        |state AS (
        |  SELECT md5(text) AS fp FROM docs WHERE doc_id % 2 = 0
        |    AND md5(text) NOT IN (SELECT fp FROM retract)),
        |batch AS (
        |  SELECT doc_id, lang, n_chars, text FROM docs WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 500000000, lang, n_chars, text FROM docs
        |  WHERE doc_id % 2 = 0 AND doc_id % 20 = 0
        |  UNION ALL
        |  SELECT doc_id + 600000000, lang, n_chars, text FROM docs
        |  WHERE doc_id % 2 = 0 AND doc_id % 20 = 2),
        |first_in AS (
        |  SELECT md5(text) AS fp, min(doc_id) AS doc_id FROM batch GROUP BY 1),
        |admitted AS (
        |  SELECT f.doc_id FROM first_in f
        |  WHERE NOT EXISTS (SELECT 1 FROM state h WHERE h.fp = f.fp))
        |SELECT b.lang, count(*) AS admitted,
        |  CAST(sum(b.n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(CASE WHEN b.doc_id >= 500000000 AND b.doc_id < 600000000
        |    THEN 1 ELSE 0 END) AS BIGINT) AS readmitted,
        |  (SELECT count(*) FROM docs WHERE doc_id % 2 = 0) AS state_rows_before,
        |  (SELECT count(*) FROM state) AS state_rows_after
        |FROM batch b JOIN admitted a ON b.doc_id = a.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin),


    // X7r: RETRACTION from the persisted inverted index — documents die,
    // their postings die with them, and term probes must neither surface
    // the retracted docs nor lose anyone else's rankings. The DELETE is
    // keyed by the bounded retracted-id list against the token-bucketed
    // postings table (COW here: doc_id cuts across every token bucket,
    // so the rewrite legitimately visits candidate files — the
    // under-approximating prunePreds rule); the probes after it must
    // still partition-prune to the terms' buckets (retraction must not
    // cost the index its read shape). postings_removed pins that exactly
    // the retracted docs' (token, doc) rows died. Oracle: the
    // x_keyword_search recomputation over the surviving docs only.
    ("x_keyword_index_retract",
      (s: SparkSession, d: String) => {
        import graft.format.Predicate
        val docs = Tables.documents(s, d)
        val t = buildInvertedIndex(s, docs, TableOps.newCatalog())
        val rowsBefore = t.toDF(s).count()
        val ids = docs.filter(pmod(col("doc_id"), lit(5L)) === 2L)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        t.delete(s, Seq(Predicate.In("doc_id", ids)))
        val rowsAfter = t.toDF(s).count()
        val (scA, a) = probeTerm(s, t, "merge")
        val (scB, b) = probeTerm(s, t, "window")
        a.join(b.withColumnRenamed("tf", "tf_b"), "doc_id")
          .select(col("doc_id"), (col("tf") + col("tf_b")).as("score"))
          .withColumn("pruned_a",
            lit(scA.metrics.filesScanned < scA.metrics.filesTotal))
          .withColumn("pruned_b",
            lit(scB.metrics.filesScanned < scB.metrics.filesTotal))
          .withColumn("postings_removed", lit(rowsBefore - rowsAfter))
          .orderBy(col("score").desc, col("doc_id")).limit(20)
      },
      s"""WITH tf_all AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
        |  GROUP BY 1, 2),
        |tf AS (SELECT * FROM tf_all WHERE doc_id % 5 <> 2)
        |SELECT a.doc_id, a.tf + b.tf AS score,
        |  true AS pruned_a, true AS pruned_b,
        |  (SELECT count(*) FROM tf_all WHERE doc_id % 5 = 2) AS postings_removed
        |FROM tf a JOIN tf b USING (doc_id)
        |WHERE a.token = 'merge' AND b.token = 'window'
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),


    // X3r: RETRACTION from the durable ANN index, MERGE-ON-READ — the
    // 100 TB shape: a retraction must NOT rewrite a cell-partitioned
    // vector index; it writes position-delete files (data file inventory
    // pinned UNCHANGED, used_delete_files pinned true) and the very next
    // probe reads through the merge while STILL partition-pruning to its
    // nprobe cells (S4 composed with S2 on the vector store). The
    // retracted ids are ranks 2/4/6 of the index's OWN pre-delete top-10
    // — a retraction that verifiably changes answers, which both engines
    // recompute deterministically — and the post-delete probe must match
    // the oracle's recomputation over the surviving corpus, recall floor
    // re-REQUIREd against the surviving brute force.
    ("x_ann_index_retract",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, Transform}
        val clustered = clusteredEmbeddings(Tables.embeddings(s, d))
        val assigned = clustered
          .withColumn("cell", VF.ivfCellExact(col("v"), shiftCentroids))
        val t = TableOps.newCatalog().createTable("db.ann_retract", assigned.schema,
          partitionBy = Seq("cell" -> Transform.Identity),
          properties = Map(graft.format.TableProperties.MergeOnRead -> "true"))
        t.append(s, assigned)
        val pre = prunedMultiprobeTopK(s, t, clustered, shiftCentroids)
        val retractIds = pre.filter(col("rank").isin(2, 4, 6))
          .select("neighbor_id").collect().map(_.getLong(0)).toSeq
        val dataBefore = t.scan().dataFiles.size
        t.delete(s, Seq(Predicate.In("vec_id", retractIds)))
        val post = t.scan()
        val survivors = clustered.filter(!col("vec_id").isInCollection(retractIds))
        val out = prunedMultiprobeTopK(s, t, survivors, shiftCentroids)
        require(out.filter(col("neighbor_id").isInCollection(retractIds)).isEmpty,
          "retracted vectors must never surface from the post-delete probe")
        out
          .withColumn("used_delete_files", lit(post.deleteFiles.nonEmpty))
          .withColumn("data_files_stable", lit(post.dataFiles.size == dataBefore))
      },
      """WITH base AS (
        |  SELECT vec_id, list_transform(generate_series(1, 64), i ->
        |    CAST(embedding[i] AS DOUBLE) +
        |    CASE WHEN (i - 1) % 8 = vec_id % 8 THEN 0.25 ELSE 0.0 END) AS v
        |  FROM embeddings),
        |q AS (SELECT v AS qe FROM base WHERE vec_id = 0),
        |c AS (SELECT vec_id AS neighbor_id, v AS ce FROM base
        |  WHERE vec_id % 97 <> 0),
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
        |top_pre AS (
        |  SELECT rank, neighbor_id FROM (
        |    SELECT c.neighbor_id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(c.ce, q.qe) DESC, c.neighbor_id) AS rank
        |    FROM c JOIN assigned a ON a.vec_id = c.neighbor_id
        |    JOIN probes p ON p.cell = a.cell
        |    CROSS JOIN q
        |    WHERE list_cosine_similarity(c.ce, q.qe) IS NOT NULL
        |      AND NOT isnan(list_cosine_similarity(c.ce, q.qe)))
        |  WHERE rank <= 10),
        |retracted AS (SELECT neighbor_id FROM top_pre WHERE rank IN (2, 4, 6)),
        |c2 AS (SELECT * FROM c
        |  WHERE neighbor_id NOT IN (SELECT neighbor_id FROM retracted)),
        |brute2 AS (SELECT neighbor_id FROM (
        |    SELECT c2.neighbor_id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(c2.ce, q.qe) DESC, c2.neighbor_id) AS rn
        |    FROM c2, q
        |    WHERE list_cosine_similarity(c2.ce, q.qe) IS NOT NULL
        |      AND NOT isnan(list_cosine_similarity(c2.ce, q.qe)))
        |  WHERE rn <= 10),
        |top AS (
        |  SELECT rank, neighbor_id FROM (
        |    SELECT c2.neighbor_id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(c2.ce, q.qe) DESC, c2.neighbor_id) AS rank
        |    FROM c2 JOIN assigned a ON a.vec_id = c2.neighbor_id
        |    JOIN probes p ON p.cell = a.cell
        |    CROSS JOIN q
        |    WHERE list_cosine_similarity(c2.ce, q.qe) IS NOT NULL
        |      AND NOT isnan(list_cosine_similarity(c2.ce, q.qe)))
        |  WHERE rank <= 10)
        |SELECT CAST(t.rank AS BIGINT) AS rank, t.neighbor_id,
        |  EXISTS (SELECT 1 FROM brute2 b WHERE b.neighbor_id = t.neighbor_id)
        |    AS hit,
        |  true AS probe_pruned, CAST(2 AS BIGINT) AS cells_probed,
        |  true AS used_delete_files, true AS data_files_stable
        |FROM top t ORDER BY 1""".stripMargin),


    // X3r2: RETRACTION × MAINTENANCE on the ANN index — the follow-on leg
    // x_ann_index_retract leaves open (r13 verdict #3): the MOR position
    // deletes accumulate until the delete-file ratio crosses the
    // reference's 10% threshold (docs/10:123), and it is HEALTH — not the
    // caller — that triggers the compaction (`maintain`, the docs/01:149
    // auto-maintenance loop) which folds the deletes into the
    // identity-partitioned index and drops the delete manifests. The gate
    // REQUIREs the full composition: delete-ratio trigger fired, deletes
    // folded AND dropped (zero delete files after), surviving rows
    // preserved through the rewrite, the post-compaction probe still
    // partition-prunes its nprobe cells, and the ≥8/10 recall floor
    // re-certified against the surviving brute force (inside
    // prunedMultiprobeTopK). At 100 TB this is the vector store's steady
    // state: retract cheap (position deletes), pay the rewrite ONLY when
    // health says the read-side merge burden is worth folding.
    ("x_ann_index_retract_compacted",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, Transform}
        val clustered = clusteredEmbeddings(Tables.embeddings(s, d))
        val assigned = clustered
          .withColumn("cell", VF.ivfCellExact(col("v"), shiftCentroids))
        val t = TableOps.newCatalog().createTable("db.ann_retract_c", assigned.schema,
          partitionBy = Seq("cell" -> Transform.Identity),
          properties = Map(graft.format.TableProperties.MergeOnRead -> "true"))
        t.append(s, assigned)
        val pre = prunedMultiprobeTopK(s, t, clustered, shiftCentroids)
        val retractIds = pre.filter(col("rank").isin(2, 4, 6))
          .select("neighbor_id").collect().map(_.getLong(0)).toSeq
        t.delete(s, Seq(Predicate.In("vec_id", retractIds)))
        val survivorRows = t.toDF(s).count()
        val h = t.health()
        require(h.deleteFileCount > 0 && h.deleteRatio > 0.10 && h.needsCompaction,
          s"MOR retraction must trip the docs/10:123 delete-ratio trigger, got $h")
        t.maintain(s) // health-triggered: compacts BECAUSE needsCompaction
        val post = t.scan()
        require(post.deleteFiles.isEmpty,
          "health-triggered compaction must fold position deletes and drop their manifests")
        require(t.toDF(s).count() == survivorRows,
          "compaction must preserve exactly the surviving rows")
        val survivors = clustered.filter(!col("vec_id").isInCollection(retractIds))
        val out = prunedMultiprobeTopK(s, t, survivors, shiftCentroids)
        require(out.filter(col("neighbor_id").isInCollection(retractIds)).isEmpty,
          "retracted vectors must never surface from the compacted index")
        out
          .withColumn("delete_ratio_triggered", lit(h.needsCompaction))
          .withColumn("deletes_folded", lit(post.deleteFiles.isEmpty))
      },
      """WITH base AS (
        |  SELECT vec_id, list_transform(generate_series(1, 64), i ->
        |    CAST(embedding[i] AS DOUBLE) +
        |    CASE WHEN (i - 1) % 8 = vec_id % 8 THEN 0.25 ELSE 0.0 END) AS v
        |  FROM embeddings),
        |q AS (SELECT v AS qe FROM base WHERE vec_id = 0),
        |c AS (SELECT vec_id AS neighbor_id, v AS ce FROM base
        |  WHERE vec_id % 97 <> 0),
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
        |top_pre AS (
        |  SELECT rank, neighbor_id FROM (
        |    SELECT c.neighbor_id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(c.ce, q.qe) DESC, c.neighbor_id) AS rank
        |    FROM c JOIN assigned a ON a.vec_id = c.neighbor_id
        |    JOIN probes p ON p.cell = a.cell
        |    CROSS JOIN q
        |    WHERE list_cosine_similarity(c.ce, q.qe) IS NOT NULL
        |      AND NOT isnan(list_cosine_similarity(c.ce, q.qe)))
        |  WHERE rank <= 10),
        |retracted AS (SELECT neighbor_id FROM top_pre WHERE rank IN (2, 4, 6)),
        |c2 AS (SELECT * FROM c
        |  WHERE neighbor_id NOT IN (SELECT neighbor_id FROM retracted)),
        |brute2 AS (SELECT neighbor_id FROM (
        |    SELECT c2.neighbor_id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(c2.ce, q.qe) DESC, c2.neighbor_id) AS rn
        |    FROM c2, q
        |    WHERE list_cosine_similarity(c2.ce, q.qe) IS NOT NULL
        |      AND NOT isnan(list_cosine_similarity(c2.ce, q.qe)))
        |  WHERE rn <= 10),
        |top AS (
        |  SELECT rank, neighbor_id FROM (
        |    SELECT c2.neighbor_id, row_number() OVER (ORDER BY
        |      list_cosine_similarity(c2.ce, q.qe) DESC, c2.neighbor_id) AS rank
        |    FROM c2 JOIN assigned a ON a.vec_id = c2.neighbor_id
        |    JOIN probes p ON p.cell = a.cell
        |    CROSS JOIN q
        |    WHERE list_cosine_similarity(c2.ce, q.qe) IS NOT NULL
        |      AND NOT isnan(list_cosine_similarity(c2.ce, q.qe)))
        |  WHERE rank <= 10)
        |SELECT CAST(t.rank AS BIGINT) AS rank, t.neighbor_id,
        |  EXISTS (SELECT 1 FROM brute2 b WHERE b.neighbor_id = t.neighbor_id)
        |    AS hit,
        |  true AS probe_pruned, CAST(2 AS BIGINT) AS cells_probed,
        |  true AS delete_ratio_triggered, true AS deletes_folded
        |FROM top t ORDER BY 1""".stripMargin),


    // X14r: RETRACTION from the image perceptual-hash state — the
    // membership-state discipline on the image family: a retracted image's
    // 4 (img_id, h, band_key) rows are DELETEd from the durable dHash
    // state (img_id cuts across every band bucket — the under-
    // approximating COW shape x_keyword_index_retract pinned — but the
    // per-commit img_id min/max bounds still prune the rewrite, recorded
    // from the delete's own candidate scan), and the recrawl proves the
    // semantics: single-pixel-edited clones of RETRACTED images ADMIT
    // again while clones of surviving history keep REJECTING. Oracle =
    // the pure-hamming admission rule over the SURVIVING history only
    // (banding is pigeonhole-lossless at the ≤3 threshold).
    ("x_image_dedup_retract",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, TableProperties, Transform}
        val hist = (0 until 20).map(i => imageFixtureRow(i, i, 24 + i, 16 + i % 5, edit = false))
        val histBands = imageBands(s.createDataFrame(hist).toDF("img_id", "blob"))
          .localCheckpoint()
        val cat = TableOps.newCatalog()
        val state = cat.createTable("db.img_sigs_r", histBands.schema,
          partitionBy = Seq("band_key" -> Transform.Bucket(4)),
          properties = Map(TableProperties.BloomColumns -> "band_key"))
        state.append(s, histBands.filter(col("img_id") < 10))
        state.append(s, histBands.filter(col("img_id") >= 10))
        val rowsBefore = state.toDF(s).count()
        // both retracted ids live in the FIRST crawl commit, so the
        // delete's In probe prunes the second commit's files via their
        // img_id min/max bounds — the rewrite is O(affected commits)
        val retractIds = Seq(0L, 5L)
        graft.table.QueryHistory.clear()
        state.delete(s, Seq(Predicate.In("img_id", retractIds)))
        val delScan = graft.table.QueryHistory.all.filter(_.table == "db.img_sigs_r").head
        val rowsAfter = state.toDF(s).count()
        require(rowsAfter == rowsBefore - 4 * retractIds.size,
          s"exactly the retracted images' band rows must die: $rowsBefore -> $rowsAfter")
        // recrawl: edited clones of retracted imgs (must ADMIT now) +
        // edited clones of surviving imgs i%5==1 (must keep REJECTING)
        val batch =
          retractIds.map(i => imageFixtureRow(200 + i, i.toInt, 24 + i.toInt, 16 + i.toInt % 5, edit = true)) ++
          (1 until 20 by 5).map(i => imageFixtureRow(300 + i, i, 24 + i, 16 + i % 5, edit = true))
        val batchBands = imageBands(s.createDataFrame(batch).toDF("img_id", "blob"))
          .localCheckpoint()
        val verdicts = imageAdmitVerdicts(s, state, batchBands)
        val admitted = verdicts.filter(col("admitted"))
          .select("img_id").collect().map(_.getLong(0)).toSet
        retractIds.foreach(i => require(admitted.contains(200L + i),
          s"a clone of retracted image $i must admit again"))
        (1 until 20 by 5).foreach(i => require(!admitted.contains(300L + i),
          s"a clone of surviving image $i must keep rejecting"))
        verdicts
          .withColumn("del_pruned",
            lit(delScan.filesScanned < delScan.filesTotal))
          .withColumn("rows_removed", lit(rowsBefore - rowsAfter))
          .orderBy("img_id")
      },
      s"""WITH imgs AS (
        |  SELECT i AS img_id, i AS seed, 24 + i AS w, 16 + (i % 5) AS h,
        |    -1 AS ex, -1 AS ey, true AS is_hist
        |  FROM range(20) t(i) WHERE i NOT IN (0, 5)
        |  UNION ALL
        |  SELECT 200 + i, i, 24 + i, 16 + (i % 5),
        |    (3 * (24 + i)) // 8, (3 * (16 + (i % 5))) // 8, false
        |  FROM range(20) t(i) WHERE i IN (0, 5)
        |  UNION ALL
        |  SELECT 300 + i, i, 24 + i, 16 + (i % 5),
        |    (3 * (24 + i)) // 8, (3 * (16 + (i % 5))) // 8, false
        |  FROM range(20) t(i) WHERE i % 5 = 1),
        |$imageOracleGridBits,
        |bh AS (SELECT b.* FROM bits b JOIN imgs i ON i.img_id = b.img_id AND i.is_hist),
        |bb AS (SELECT b.* FROM bits b JOIN imgs i ON i.img_id = b.img_id AND NOT i.is_hist),
        |m AS (
        |  SELECT bb.img_id, CAST(count(DISTINCT bh.img_id) AS BIGINT) AS matches
        |  FROM bb JOIN bh ON bit_count(xor(bb.h, bh.h)) <= 3
        |  GROUP BY 1)
        |SELECT bb.img_id, coalesce(m.matches, CAST(0 AS BIGINT)) AS matches,
        |  m.img_id IS NULL AS admitted, true AS del_pruned,
        |  CAST(8 AS BIGINT) AS rows_removed
        |FROM bb LEFT JOIN m USING (img_id) ORDER BY img_id""".stripMargin),


    // X14r-a: RETRACTION from the audio fingerprint state — the
    // x_image_dedup_retract discipline on the audio family: a retracted
    // clip's 4 (clip_id, h, band_key) rows are DELETEd from the durable
    // fingerprint state (clip_id cuts across every band bucket — the
    // under-approximating COW shape — but the per-commit clip_id min/max
    // bounds still prune the rewrite, recorded from the delete's own
    // candidate scan), and the recrawl proves the semantics: single-
    // sample-edited clones of RETRACTED clips ADMIT again while clones of
    // surviving history keep REJECTING. Oracle = the pure-hamming
    // admission rule over the SURVIVING history only (banding is
    // pigeonhole-lossless at the ≤3 threshold).
    ("x_audio_dedup_retract",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, TableProperties, Transform}
        val hist = (0 until 20).map(i => audioFixtureRow(i, i, 33 * (10 + i), edit = false))
        val histBands = audioBands(s.createDataFrame(hist).toDF("clip_id", "blob"))
          .localCheckpoint()
        val cat = TableOps.newCatalog()
        val state = cat.createTable("db.audio_sigs_r", histBands.schema,
          partitionBy = Seq("band_key" -> Transform.Bucket(4)),
          properties = Map(TableProperties.BloomColumns -> "band_key"))
        state.append(s, histBands.filter(col("clip_id") < 10))
        state.append(s, histBands.filter(col("clip_id") >= 10))
        val rowsBefore = state.toDF(s).count()
        // both retracted ids live in the FIRST crawl commit, so the
        // delete's In probe prunes the second commit's files via their
        // clip_id min/max bounds — the rewrite is O(affected commits)
        val retractIds = Seq(0L, 5L)
        graft.table.QueryHistory.clear()
        state.delete(s, Seq(Predicate.In("clip_id", retractIds)))
        val delScan = graft.table.QueryHistory.all.filter(_.table == "db.audio_sigs_r").head
        val rowsAfter = state.toDF(s).count()
        require(rowsAfter == rowsBefore - 4 * retractIds.size,
          s"exactly the retracted clips' band rows must die: $rowsBefore -> $rowsAfter")
        // recrawl: edited clones of retracted clips (must ADMIT now) +
        // edited clones of surviving clips i%5==1 (must keep REJECTING)
        val batch =
          retractIds.map(i => audioFixtureRow(200 + i, i.toInt, 33 * (10 + i.toInt), edit = true)) ++
          (1 until 20 by 5).map(i => audioFixtureRow(300 + i, i, 33 * (10 + i), edit = true))
        val batchBands = audioBands(s.createDataFrame(batch).toDF("clip_id", "blob"))
          .localCheckpoint()
        val verdicts = audioAdmitVerdicts(s, state, batchBands)
        val admitted = verdicts.filter(col("admitted"))
          .select("clip_id").collect().map(_.getLong(0)).toSet
        retractIds.foreach(i => require(admitted.contains(200L + i),
          s"a clone of retracted clip $i must admit again"))
        (1 until 20 by 5).foreach(i => require(!admitted.contains(300L + i),
          s"a clone of surviving clip $i must keep rejecting"))
        verdicts
          .withColumn("del_pruned",
            lit(delScan.filesScanned < delScan.filesTotal))
          .withColumn("rows_removed", lit(rowsBefore - rowsAfter))
          .orderBy("clip_id")
      },
      s"""WITH clips AS (
        |  SELECT i AS clip_id, i AS seed, 33 * (10 + i) AS n, -1 AS e,
        |    true AS is_hist
        |  FROM range(20) t(i) WHERE i NOT IN (0, 5)
        |  UNION ALL
        |  SELECT 200 + i, i, 33 * (10 + i), (33 * (10 + i)) // 2, false
        |  FROM range(20) t(i) WHERE i IN (0, 5)
        |  UNION ALL
        |  SELECT 300 + i, i, 33 * (10 + i), (33 * (10 + i)) // 2, false
        |  FROM range(20) t(i) WHERE i % 5 = 1),
        |${audioOracleBits(957)},
        |bh AS (SELECT b.* FROM bits b JOIN clips c ON c.clip_id = b.clip_id AND c.is_hist),
        |bb AS (SELECT b.* FROM bits b JOIN clips c ON c.clip_id = b.clip_id AND NOT c.is_hist),
        |m AS (
        |  SELECT bb.clip_id, CAST(count(DISTINCT bh.clip_id) AS BIGINT) AS matches
        |  FROM bb JOIN bh ON bit_count(xor(bb.h, bh.h)) <= 3
        |  GROUP BY 1)
        |SELECT bb.clip_id, coalesce(m.matches, CAST(0 AS BIGINT)) AS matches,
        |  m.clip_id IS NULL AS admitted, true AS del_pruned,
        |  CAST(8 AS BIGINT) AS rows_removed
        |FROM bb LEFT JOIN m USING (clip_id) ORDER BY clip_id""".stripMargin),


    // X14r-v: RETRACTION from the TWO-PLANE video state — the right-to-
    // be-forgotten discipline where one video's rows live in BOTH planes:
    // the retracted ids' full hash sequences DELETE from the vid_id-
    // bucketed sequence plane (bucket + bloom + min/max prune the
    // rewrite, recorded from the delete's own candidate scan) and their
    // frame-0 bands from the band plane — exactly nf(id) + 4 rows each —
    // and the recrawl proves the semantics: one-frame-edited clones of
    // RETRACTED videos ADMIT again while clones of surviving history keep
    // REJECTING. Oracle = the pure aligned-hamming admission rule over
    // the SURVIVING history only.
    ("x_video_dedup_retract",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, TableProperties, Transform}
        val hist = (0 until 14).map(i =>
          videoFixtureRow(i, i, 16 + i, 12 + i % 5, 3 + i % 4, edit = false))
        val histFh = videoFrameHashes(s.createDataFrame(hist).toDF("vid_id", "blob"))
          .localCheckpoint()
        val cat = TableOps.newCatalog()
        val bands = cat.createTable("db.vid_bands_r",
          videoBands(histFh.limit(0)).select("vid_id", "band_key").schema,
          partitionBy = Seq("band_key" -> Transform.Bucket(4)),
          properties = Map(TableProperties.BloomColumns -> "band_key"))
        val sigs = cat.createTable("db.vid_sigs_r", histFh.schema,
          partitionBy = Seq("vid_id" -> Transform.Bucket(4)),
          properties = Map(TableProperties.BloomColumns -> "vid_id"))
        Seq(histFh.filter(col("vid_id") < 7), histFh.filter(col("vid_id") >= 7))
          .foreach { part =>
            sigs.append(s, part.select("vid_id", "nf", "frame", "h"))
            bands.append(s,
              videoBands(part.filter(col("frame") === 0)).select("vid_id", "band_key"))
          }
        val sigRowsBefore = sigs.toDF(s).count()
        val bandRowsBefore = bands.toDF(s).count()
        // both retracted ids live in the FIRST crawl commit, so the
        // sequence-plane delete's In probe prunes the second commit's
        // files via their vid_id min/max + bloom planes
        val retractIds = Seq(0L, 5L)
        graft.table.QueryHistory.clear()
        sigs.delete(s, Seq(Predicate.In("vid_id", retractIds)))
        val delScan = graft.table.QueryHistory.all.filter(_.table == "db.vid_sigs_r").head
        bands.delete(s, Seq(Predicate.In("vid_id", retractIds)))
        val sigRowsAfter = sigs.toDF(s).count()
        val bandRowsAfter = bands.toDF(s).count()
        // nf(0) = 3, nf(5) = 4 sequence rows; 4 band rows per video
        require(sigRowsAfter == sigRowsBefore - 7,
          s"exactly the retracted videos' sequence rows must die: $sigRowsBefore -> $sigRowsAfter")
        require(bandRowsAfter == bandRowsBefore - 8,
          s"exactly the retracted videos' band rows must die: $bandRowsBefore -> $bandRowsAfter")
        // recrawl: edited clones of retracted videos (must ADMIT now) +
        // edited clones of surviving videos i%5==1 (must keep REJECTING)
        val batch =
          retractIds.map(i => videoFixtureRow(200 + i, i.toInt,
            16 + i.toInt, 12 + i.toInt % 5, 3 + i.toInt % 4, edit = true)) ++
          (1 until 14 by 5).map(i => videoFixtureRow(300 + i, i,
            16 + i, 12 + i % 5, 3 + i % 4, edit = true))
        val batchFh = videoFrameHashes(s.createDataFrame(batch).toDF("vid_id", "blob"))
          .localCheckpoint()
        val verdicts = videoAdmitVerdicts(s, bands, sigs, batchFh)
        val admitted = verdicts.filter(col("admitted"))
          .select("vid_id").collect().map(_.getLong(0)).toSet
        retractIds.foreach(i => require(admitted.contains(200L + i),
          s"a clone of retracted video $i must admit again"))
        (1 until 14 by 5).foreach(i => require(!admitted.contains(300L + i),
          s"a clone of surviving video $i must keep rejecting"))
        verdicts
          .withColumn("del_pruned",
            lit(delScan.filesScanned < delScan.filesTotal))
          .withColumn("sig_rows_removed", lit(sigRowsBefore - sigRowsAfter))
          .withColumn("band_rows_removed", lit(bandRowsBefore - bandRowsAfter))
          .orderBy("vid_id")
      },
      s"""WITH vids AS (
        |  SELECT i AS vid_id, i AS seed, 16 + i AS w, 12 + (i % 5) AS h,
        |    3 + (i % 4) AS nf, -1 AS ef, -1 AS ex, -1 AS ey, true AS is_hist
        |  FROM range(14) t(i) WHERE i NOT IN (0, 5)
        |  UNION ALL
        |  SELECT 200 + i, i, 16 + i, 12 + (i % 5), 3 + (i % 4),
        |    i % (3 + (i % 4)), (3 * (16 + i)) // 8, (3 * (12 + (i % 5))) // 8, false
        |  FROM range(14) t(i) WHERE i IN (0, 5)
        |  UNION ALL
        |  SELECT 300 + i, i, 16 + i, 12 + (i % 5), 3 + (i % 4),
        |    i % (3 + (i % 4)), (3 * (16 + i)) // 8, (3 * (12 + (i % 5))) // 8, false
        |  FROM range(14) t(i) WHERE i % 5 = 1),
        |$videoOracleFrameBits,
        |pm AS (
        |  SELECT a.vid_id AS bvid, b.vid_id AS hvid
        |  FROM vbits a JOIN vbits b ON a.f = b.f
        |  JOIN vids va ON va.vid_id = a.vid_id AND NOT va.is_hist
        |  JOIN vids vb ON vb.vid_id = b.vid_id AND vb.is_hist AND vb.nf = va.nf
        |  GROUP BY 1, 2
        |  HAVING sum(bit_count(xor(a.h, b.h))) <= 3),
        |m AS (SELECT bvid AS vid_id, CAST(count(DISTINCT hvid) AS BIGINT) AS matches
        |  FROM pm GROUP BY 1)
        |SELECT b.vid_id, coalesce(m.matches, CAST(0 AS BIGINT)) AS matches,
        |  m.vid_id IS NULL AS admitted, true AS del_pruned,
        |  CAST(7 AS BIGINT) AS sig_rows_removed,
        |  CAST(8 AS BIGINT) AS band_rows_removed
        |FROM (SELECT vid_id FROM vids WHERE NOT is_hist) b LEFT JOIN m USING (vid_id)
        |ORDER BY vid_id""".stripMargin),


    // X13 × dual-phase (r16): GROUP-ATOMIC retraction from the
    // sub-segment audio state — a clip's membership in the two-plane
    // state is BOTH its phase composites (clip·2 and clip·2+1), so a
    // right-to-be-forgotten delete must remove both together: leaving one
    // phase behind would keep rejecting the clip's trimmed recrawls —
    // precisely the violation this gate pins. Retract clips {0, 5} (all
    // four composites, both planes; the delete's In probe prunes the
    // second crawl commit's files via vid_id bounds + blooms), then
    // recrawl 165-sample-TRIMMED clones: clones of RETRACTED clips must
    // ADMIT (no phase left to match either grid), clones of SURVIVORS
    // must keep rejecting through the unchanged dual-phase containment
    // rule. At 100 TB the retraction stays a bounded In-pruned delete —
    // 2·(2ns−1) narrow rows per clip, never a state rebuild.
    ("x_audio_dedup_retract_subsegment",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, TableProperties, Transform}
        import graft.operators.AudioCodec
        val L = 330
        val hist = (0 until 12).map(i =>
          (i.toLong, AudioCodec.encodeAudioVariant((4 + i % 4) * L, i)))
        val histFh = audioSegmentsDualPhase(
          s.createDataFrame(hist).toDF("clip_id", "blob"), L).localCheckpoint()
        def bandsK(f: DataFrame) = audioSegBands(f.filter(col("frame") <= 2))
          .select("vid_id", "band_key").distinct()
        val cat = TableOps.newCatalog()
        val bands = cat.createTable("db.aud_bands_rss",
          bandsK(histFh.limit(0)).schema,
          partitionBy = Seq("band_key" -> Transform.Bucket(4)),
          properties = Map(TableProperties.BloomColumns -> "band_key"))
        val sigs = cat.createTable("db.aud_sigs_rss", histFh.schema,
          partitionBy = Seq("vid_id" -> Transform.Bucket(4)),
          properties = Map(TableProperties.BloomColumns -> "vid_id"))
        // composites of clips 0-5 sit below 12 — two crawl commits, and
        // the retracted composites all live in the FIRST
        Seq(histFh.filter(col("vid_id") < 12), histFh.filter(col("vid_id") >= 12))
          .foreach { part =>
            sigs.append(s, part.select("vid_id", "nf", "frame", "h"))
            bands.append(s, bandsK(part))
          }
        val sigRowsBefore = sigs.toDF(s).count()
        // GROUP-ATOMIC retraction: every phase composite of clips 0 and 5
        val retractClips = Seq(0L, 5L)
        val composites = retractClips.flatMap(c => Seq(c * 2, c * 2 + 1))
        graft.table.QueryHistory.clear()
        sigs.delete(s, Seq(Predicate.In("vid_id", composites)))
        val delScan = graft.table.QueryHistory.all
          .filter(_.table == "db.aud_sigs_rss").head
        bands.delete(s, Seq(Predicate.In("vid_id", composites)))
        // 2ns−1 sequence rows per clip: ns(0)=4 → 7, ns(5)=5 → 9
        val sigRowsAfter = sigs.toDF(s).count()
        require(sigRowsAfter == sigRowsBefore - 16,
          s"exactly both phases' rows must die: $sigRowsBefore -> $sigRowsAfter")
        // no composite of a retracted clip may survive in EITHER plane
        Seq(sigs, bands).foreach { t =>
          require(t.toDF(s).filter(col("vid_id").isin(composites: _*)).count() == 0L,
            s"retraction must be group-atomic on ${t.name}")
        }
        // recrawl: 165-TRIMMED clones — of retracted clips (ADMIT: with
        // one phase left behind, the trim would still match it) and of
        // surviving clips 2 and 7 (REJECT)
        val batch =
          retractClips.map(i => ((200 + i), AudioCodec.encodeAudioVariant(
            (4 + i.toInt % 4) * L - 165, i.toInt, sampleBase = 165))) ++
          Seq(2, 7).map(i => ((300 + i).toLong, AudioCodec.encodeAudioVariant(
            (4 + i % 4) * L - 165, i, sampleBase = 165)))
        val batchFh = audioSegmentsDualPhase(
          s.createDataFrame(batch).toDF("clip_id", "blob"), L).localCheckpoint()
        val verdicts = videoAdmitVerdictsTrimmed(s, bands, sigs, batchFh,
            toBands = audioSegBands)
          .select((col("vid_id") / 2).cast("long").as("clip_id"), col("admitted"))
          .groupBy("clip_id")
          .agg((min(col("admitted").cast("int")) === 1).as("admitted"))
          .localCheckpoint()
        val admitted = verdicts.filter(col("admitted"))
          .select("clip_id").collect().map(_.getLong(0)).toSet
        retractClips.foreach(i => require(admitted.contains(200L + i),
          s"a trimmed clone of retracted clip $i must admit again"))
        Seq(2, 7).foreach(i => require(!admitted.contains(300L + i),
          s"a trimmed clone of surviving clip $i must keep rejecting"))
        verdicts
          .withColumn("del_pruned",
            lit(delScan.filesScanned < delScan.filesTotal))
          .withColumn("sig_rows_removed", lit(sigRowsBefore - sigRowsAfter))
          .orderBy("clip_id")
      },
      // surviving history + the trimmed recrawls through the shared
      // dual-phase closed form; the retracted clips are simply ABSENT
      // from the history side
      s"""WITH clips AS (
        |  SELECT i AS clip_id, i AS seed, (4 + (i % 4)) * 330 AS n, 0 AS sb,
        |    -1 AS e, true AS is_hist
        |  FROM range(12) t(i) WHERE i NOT IN (0, 5)
        |  UNION ALL
        |  SELECT 200 + i, i, (4 + (i % 4)) * 330 - 165, 165, -1, false
        |  FROM range(12) t(i) WHERE i IN (0, 5)
        |  UNION ALL
        |  SELECT 300 + i, i, (4 + (i % 4)) * 330 - 165, 165, -1, false
        |  FROM range(12) t(i) WHERE i IN (2, 7)),
        |${audioOracleDualPhaseBits(2310)},
        |cl AS (SELECT clip_id, p, clip_id * 2 + p AS sid,
        |  (n - 165 * p) // 330 AS ns, is_hist FROM clips, range(2) ph(p)),
        |pr AS (
        |  SELECT b.clip_id AS bclip,
        |    CASE WHEN b.ns >= h.ns THEN b.sid ELSE h.sid END AS l,
        |    CASE WHEN b.ns >= h.ns THEN h.sid ELSE b.sid END AS s,
        |    abs(b.ns - h.ns) AS df
        |  FROM cl b JOIN cl h ON NOT b.is_hist AND h.is_hist
        |    AND abs(b.ns - h.ns) <= 2),
        |sc AS (
        |  SELECT pr.bclip, pr.l, pr.s, pp.p,
        |    CAST(sum(bit_count(xor(bl.h, bs2.h))) AS BIGINT) AS d
        |  FROM pr, range(3) pp(p), sb2 bs2, sb2 bl
        |  WHERE pp.p <= pr.df AND bs2.sid = pr.s AND bl.sid = pr.l
        |    AND bl.seg = bs2.seg + pp.p
        |  GROUP BY 1, 2, 3, 4),
        |rej AS (SELECT DISTINCT bclip FROM sc WHERE d <= 3)
        |SELECT c.clip_id, c.clip_id NOT IN (SELECT bclip FROM rej) AS admitted,
        |  true AS del_pruned, CAST(16 AS BIGINT) AS sig_rows_removed
        |FROM (SELECT DISTINCT clip_id FROM clips WHERE NOT is_hist) c
        |ORDER BY 1""".stripMargin),

    // X2r: RETRACTION from the band-signature state — the fuzzy twin of
    // x_dedup_retract: delete a retracted doc's (band, sig, doc_id) rows
    // and its near-dups stop nominating against it, so lightly-edited
    // recrawls of RETRACTED history ADMIT again while recrawls of
    // surviving history keep rejecting (the fixture's %10 recrawl class
    // splits exactly in half by the %20 retraction class). The oracle
    // recomputes the whole banded-MinHash nomination + exact-Jaccard
    // verify from raw text over the SURVIVING history only; state row
    // counts pin that exactly the retracted docs' signatures died
    // (2 narrow rows per doc — the deletion is as cheap as the state).
    ("x_neardup_retract",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, Transform}
        val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
        val (hist, batch) = neardupCrawlFixture(docs)
        val cat = TableOps.newCatalog()
        val histSigs = bandSigsOf(hist)
        val t = cat.createTable("db.neardup_sigs_r", histSigs.schema,
          partitionBy = Seq("sig" -> Transform.Bucket(4)),
          properties = Map(graft.format.TableProperties.BloomColumns -> "sig"))
        t.append(s, histSigs)
        val rowsBefore = t.toDF(s).count()
        val retractIds = hist.filter(col("doc_id") % 20 === 0)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        t.delete(s, Seq(Predicate.In("doc_id", retractIds)))
        val rowsAfter = t.toDF(s).count()
        val admitted = neardupAdmitAndAppend(s, t, hist, batch)
        admitted.groupBy("lang").agg(count(lit(1)).as("admitted"),
            sum(when(col("doc_id") >= 1000000000L &&
              pmod(col("doc_id") - 1000000000L, lit(20L)) === 0L,
              1L).otherwise(0L)).as("readmitted"))
          .withColumn("state_rows_before", lit(rowsBefore))
          .withColumn("state_rows_after", lit(rowsAfter))
          .orderBy("lang")
      },
      """WITH docs AS (SELECT doc_id, lang, text FROM documents),
        |hist AS (SELECT doc_id, lang, text FROM docs WHERE doc_id % 2 = 0),
        |batch AS (
        |  SELECT doc_id, lang, text FROM docs WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000000 AS doc_id, lang, text || ' recrawl tail' AS text
        |  FROM docs WHERE doc_id % 2 = 0 AND doc_id % 10 = 0),
        |sh_b AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |        FROM batch)),
        |sh_h AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |        FROM hist)),
        |b_b AS (
        |  SELECT doc_id, b, md5(
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 0) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 1) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 2) * 8, 8)))) AS sig
        |  FROM sh_b, (SELECT unnest([0, 1]) AS b) WHERE len(sh) > 0),
        |b_h_all AS (
        |  SELECT doc_id, b, md5(
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 0) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 1) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 2) * 8, 8)))) AS sig
        |  FROM sh_h, (SELECT unnest([0, 1]) AS b) WHERE len(sh) > 0),
        |b_h AS (SELECT * FROM b_h_all WHERE doc_id % 20 <> 0),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, h.doc_id AS doc_b
        |  FROM b_b a JOIN b_h h ON a.b = h.b AND a.sig = h.sig),
        |rej AS (
        |  SELECT DISTINCT c.doc_a AS doc_id
        |  FROM cand c JOIN sh_b x ON x.doc_id = c.doc_a
        |  JOIN sh_h y ON y.doc_id = c.doc_b
        |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5)
        |SELECT b.lang, count(*) AS admitted,
        |  CAST(SUM(CASE WHEN b.doc_id >= 1000000000
        |    AND (b.doc_id - 1000000000) % 20 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS readmitted,
        |  (SELECT count(*) FROM b_h_all) AS state_rows_before,
        |  (SELECT count(*) FROM b_h) AS state_rows_after
        |FROM batch b LEFT JOIN rej r USING (doc_id)
        |WHERE r.doc_id IS NULL GROUP BY 1 ORDER BY 1""".stripMargin),


    // X4s: UNLEARNING the LM model — retraction for a state whose rows
    // are AGGREGATES, not memberships: a retracted doc's counts cannot be
    // deleted row-wise, they must be SUBTRACTED. The retraction appends
    // NEGATIVE (bg, cnt) deltas to the count log (the log stays a true
    // append-only record — of additions and retractions alike) and one
    // MERGE folds them into the model: matched heads decrement, and rows
    // whose count reaches zero are DELETED by the merge's matched-delete
    // branch (a zero-count bigram is not in the vocabulary — it must not
    // score q=0-as-modeled where absence scores unmodeled). The
    // model ≡ nonzero-log-sum invariant is REQUIREd across the
    // unlearning, and the odd docs then score under the unlearned model —
    // which the oracle reproduces by simply COUNTING over the surviving
    // history (subtraction of counts ≡ recounting the survivors, the
    // exactness retraction needs).
    ("x_lm_retract",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        import org.apache.spark.sql.types.{LongType, StringType, StructType}
        val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
        val hist = docs.filter(col("doc_id") % 2 === 0)
        def bgOf(df: DataFrame) = df.select(col("doc_id"), col("lang"),
          explode(TF.shingles(col("text"), 2)).as("bg"))
        val histCounts = bgOf(hist).groupBy("bg").agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // seeds BOTH the log and the model
        val cat = TableOps.newCatalog()
        val log = cat.createTable("db.lm_log_r", new StructType()
          .add("bg", StringType).add("cnt", LongType),
          partitionBy = Seq("bg" -> Transform.Bucket(4)))
        log.append(s, histCounts)
        val model = cat.createTable("db.lm_model_r", new StructType()
          .add("bg", StringType).add("c2", LongType).add("w1", StringType),
          partitionBy = Seq("w1" -> Transform.Bucket(4)),
          properties = Map(graft.format.TableProperties.BloomColumns -> "w1"))
        model.append(s, histCounts.select(col("bg"), col("cnt").as("c2"),
          substring_index(col("bg"), " ", 1).as("w1")))
        val rowsBefore = model.toDF(s).count()
        // unlearn every 20th history doc: negative deltas to the log, one
        // decrement-or-delete MERGE into the model
        val negDeltas = bgOf(hist.filter(col("doc_id") % 20 === 0))
          .groupBy("bg").agg((-count(lit(1))).as("cnt"))
          .withColumn("w1", substring_index(col("bg"), " ", 1))
          .localCheckpoint() // log append + model merge both read it
        log.append(s, negDeltas.select("bg", "cnt"))
        model.merge(s, negDeltas, Seq("bg" -> "bg"),
          whenMatchedUpdate = Map("c2" -> (col("t.c2") + col("s.cnt"))),
          whenMatchedDelete = Some(col("t.c2") + col("s.cnt") === 0L),
          insertWhenNotMatched = false)
        val rowsAfter = model.toDF(s).count()
        val logSum = log.toDF(s).groupBy("bg").agg(sum(col("cnt")).as("c2"))
          .filter(col("c2") =!= 0L)
        val modelDf = model.toDF(s).select("bg", "c2")
        val modelMatchesLog = setEqual(modelDf, logSum)
        require(modelMatchesLog,
          "unlearned model must equal the log's nonzero sums")
        val probs = lmProbs(model.toDF(s).select(col("bg"), col("c2")))
        bgOf(docs.filter(col("doc_id") % 2 === 1))
          .join(probs, Seq("bg"), "left")
          .groupBy("doc_id").agg(min(col("lang")).as("lang"),
            expr("sum(coalesce(q, cast(0 as bigint))) div count(1)").as("score"),
            sum(when(col("q").isNotNull, 1L).otherwise(0L)).as("modeled"))
          .groupBy("lang").agg(count(lit(1)).as("docs"),
            expr("sum(score) div count(1)").as("avg_score"),
            min(col("score")).as("min_score"),
            max(col("score")).as("max_score"),
            sum(when(col("modeled") === 0L, 1L).otherwise(0L)).as("n_unmodeled"))
          .withColumn("model_rows_before", lit(rowsBefore))
          .withColumn("model_rows_after", lit(rowsAfter))
          .withColumn("model_matches_log", lit(modelMatchesLog))
          .orderBy("lang")
      },
      s"""WITH toks AS (
        |  SELECT doc_id, lang, $toksSql AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, unnest(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS bg
        |  FROM toks),
        |hist AS (SELECT bg FROM bg WHERE doc_id % 2 = 0),
        |surv AS (SELECT bg FROM bg WHERE doc_id % 2 = 0 AND doc_id % 20 <> 0),
        |c2 AS (SELECT bg, count(*) AS c2 FROM surv GROUP BY 1),
        |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c1
        |       FROM surv GROUP BY 1),
        |p AS (
        |  SELECT c2.bg, (c2 * 1000000) // c1 AS q
        |  FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.w1),
        |b AS (SELECT doc_id, lang, bg FROM bg WHERE doc_id % 2 = 1),
        |d AS (
        |  SELECT b.doc_id, min(b.lang) AS lang,
        |    CAST(sum(coalesce(p.q, 0)) AS BIGINT) // count(*) AS score,
        |    count(p.q) AS modeled
        |  FROM b LEFT JOIN p USING (bg) GROUP BY 1)
        |SELECT lang, count(*) AS docs,
        |  CAST(sum(score) AS BIGINT) // count(*) AS avg_score,
        |  min(score) AS min_score, max(score) AS max_score,
        |  CAST(SUM(CASE WHEN modeled = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unmodeled,
        |  (SELECT count(DISTINCT bg) FROM hist) AS model_rows_before,
        |  (SELECT count(*) FROM c2) AS model_rows_after,
        |  true AS model_matches_log
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin),


    // X1t: RETRACTION WITH RE-ELECTION from the chunk keep-first ledger —
    // the hard retraction shape: a keep-first state doesn't just MEMBER a
    // retracted doc, it may have elected it the canonical keeper of
    // chunks that also live in surviving docs. Deleting the retracted
    // rows alone would leave those chunks unclaimed and silently
    // re-admittable; the repair RE-ELECTS keep-first over the SURVIVING
    // corpus restricted to exactly the orphaned hashes (the shared
    // [[chunkKeepFirstLedger]] rule — the re-election cannot drift from
    // the original election), and hashes whose only occurrences were
    // retracted rightly vanish. The gate REQUIREs the repaired ledger ≡
    // the from-scratch keep-first over survivors, row for row — delete +
    // re-elect must be indistinguishable from never having crawled the
    // retracted docs — and the oracle recomputes that from-scratch state
    // independently.
    ("x_chunk_retract",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, Transform}
        val W = 16
        val boiler = " subscribe to our newsletter all rights reserved contact us privacy policy terms of service cookie notice"
        val corpus = Tables.documents(s, d).select("doc_id", "lang", "text")
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(boiler))).otherwise(col("text")))
        val cat = TableOps.newCatalog()
        val ledger0 = chunkKeepFirstLedger(chunksOf(corpus, W))
        val t = cat.createTable("db.chunk_ledger_r", ledger0.schema,
          partitionBy = Seq("h" -> Transform.Bucket(4)),
          properties = Map(graft.format.TableProperties.BloomColumns -> "h"))
        t.append(s, ledger0)
        val rowsBefore = t.toDF(s).count()
        val retractIds = corpus.filter(col("doc_id") % 20 === 0)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        // the orphaned hashes: chunks whose elected keeper dies — pinned
        // BEFORE the delete mutates the table under them
        val orphans = t.toDF(s)
          .filter(col("f_doc").isInCollection(retractIds))
          .select("h").localCheckpoint()
        t.delete(s, Seq(Predicate.In("f_doc", retractIds)))
        val survivors = corpus.filter(!col("doc_id").isInCollection(retractIds))
        val reelected = chunkKeepFirstLedger(
          chunksOf(survivors, W).join(orphans, Seq("h"))).localCheckpoint()
        t.append(s, reelected)
        val rowsAfter = t.toDF(s).count()
        val scratch = chunkKeepFirstLedger(chunksOf(survivors, W))
        val repaired = t.toDF(s)
        require(setEqual(repaired, scratch),
          "repaired ledger must equal the from-scratch keep-first over survivors")
        repaired.groupBy("lang")
          .agg(count(lit(1)).as("kept_chunks"), sum(col("n_tok")).as("kept_tokens"))
          .withColumn("rows_before", lit(rowsBefore))
          .withColumn("rows_after", lit(rowsAfter))
          .withColumn("reelected", lit(reelected.count()))
          .orderBy("lang")
      },
      """WITH docs0 AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 5 = 0 THEN text ||
        |      ' subscribe to our newsletter all rights reserved contact us privacy policy terms of service cookie notice'
        |    ELSE text END AS text
        |  FROM documents),
        |surv AS (SELECT * FROM docs0 WHERE doc_id % 20 <> 0),
        |toked_f AS (
        |  SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |  FROM docs0),
        |chunks_f AS (
        |  SELECT doc_id, lang, CAST((s - 1) // 16 AS BIGINT) AS ci,
        |    CAST(least(16, len(t) - s + 1) AS BIGINT) AS n_tok,
        |    md5(array_to_string(t[s : s + 15], ' ')) AS h
        |  FROM (SELECT * FROM toked_f WHERE len(t) > 0),
        |    unnest(generate_series(1, len(t), 16)) AS u(s)),
        |fd_f AS (SELECT h, min(doc_id) AS f_doc FROM chunks_f GROUP BY 1),
        |chunks_s AS (SELECT * FROM chunks_f WHERE doc_id % 20 <> 0),
        |fd AS (SELECT h, min(doc_id) AS f_doc FROM chunks_s GROUP BY 1),
        |fci AS (
        |  SELECT c.h, f.f_doc, min(c.ci) AS f_ci
        |  FROM chunks_s c JOIN fd f ON f.h = c.h AND c.doc_id = f.f_doc
        |  GROUP BY 1, 2),
        |ledger AS (
        |  SELECT c.h, f.f_doc, f.f_ci, c.lang, c.n_tok
        |  FROM chunks_s c JOIN fci f
        |    ON c.h = f.h AND c.doc_id = f.f_doc AND c.ci = f.f_ci)
        |SELECT lang, count(*) AS kept_chunks,
        |  CAST(sum(n_tok) AS BIGINT) AS kept_tokens,
        |  (SELECT count(*) FROM fd_f) AS rows_before,
        |  (SELECT count(*) FROM ledger) AS rows_after,
        |  (SELECT count(*) FROM ledger l JOIN fd_f f USING (h)
        |   WHERE f.f_doc % 20 = 0) AS reelected
        |FROM ledger GROUP BY 1 ORDER BY 1""".stripMargin),


    // X4t: RETRACTION WITH RE-ELECTION from the first-seen gram state —
    // the novelty twin of x_chunk_retract: a retracted doc may be the
    // CLAIMANT of grams that also occur in surviving docs, so deleting
    // its claims must re-elect each orphaned gram's first-seen to the
    // earliest SURVIVING occurrence (grams only the retracted doc ever
    // had rightly vanish — they are novel again for whoever says them
    // next). Repaired state ≡ from-scratch first-seen over survivors
    // REQUIREd row for row; the oracle recomputes it independently and
    // rolls up claimed grams by the claimant's lang.
    ("x_novelty_retract",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, Transform}
        val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
        def gramsOf(df: DataFrame) = df.select(col("doc_id"),
          explode(array_distinct(TF.shingles(col("text"), 3))).as("g"))
        val cat = TableOps.newCatalog()
        val fs0 = gramsOf(docs).groupBy("g").agg(min(col("doc_id")).as("first_doc"))
        val t = cat.createTable("db.first_seen_r", fs0.schema,
          partitionBy = Seq("g" -> Transform.Bucket(4)),
          properties = Map(graft.format.TableProperties.BloomColumns -> "g"))
        t.append(s, fs0)
        val rowsBefore = t.toDF(s).count()
        val retractIds = docs.filter(col("doc_id") % 20 === 0)
          .select("doc_id").collect().map(_.getLong(0)).toSeq
        val orphans = t.toDF(s)
          .filter(col("first_doc").isInCollection(retractIds))
          .select("g").localCheckpoint()
        t.delete(s, Seq(Predicate.In("first_doc", retractIds)))
        val survivors = docs.filter(!col("doc_id").isInCollection(retractIds))
        val reelected = gramsOf(survivors).join(orphans, Seq("g"))
          .groupBy("g").agg(min(col("doc_id")).as("first_doc"))
          .localCheckpoint()
        t.append(s, reelected)
        val rowsAfter = t.toDF(s).count()
        val scratch = gramsOf(survivors)
          .groupBy("g").agg(min(col("doc_id")).as("first_doc"))
        val repaired = t.toDF(s)
        require(setEqual(repaired, scratch),
          "repaired first-seen state must equal the from-scratch election over survivors")
        repaired.join(docs.select(col("doc_id").as("first_doc"), col("lang")),
            Seq("first_doc"))
          .groupBy("lang").agg(count(lit(1)).as("claimed_grams"))
          .withColumn("rows_before", lit(rowsBefore))
          .withColumn("rows_after", lit(rowsAfter))
          .withColumn("reelected", lit(reelected.count()))
          .orderBy("lang")
      },
      s"""WITH toks AS (
        |  SELECT doc_id, lang, $toksSql AS t FROM documents),
        |g_f AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(t) < 3 THEN [] ELSE
        |      list_transform(generate_series(1, len(t) - 2),
        |        i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) END)) AS g
        |  FROM toks),
        |fs_f AS (SELECT g, min(doc_id) AS first_doc FROM g_f GROUP BY 1),
        |g_s AS (SELECT * FROM g_f WHERE doc_id % 20 <> 0),
        |fs AS (SELECT g, min(doc_id) AS first_doc FROM g_s GROUP BY 1)
        |SELECT d.lang, count(*) AS claimed_grams,
        |  (SELECT count(*) FROM fs_f) AS rows_before,
        |  (SELECT count(*) FROM fs) AS rows_after,
        |  (SELECT count(*) FROM fs s JOIN fs_f f USING (g)
        |   WHERE f.first_doc % 20 = 0) AS reelected
        |FROM fs JOIN toks d ON d.doc_id = fs.first_doc
        |GROUP BY 1 ORDER BY 1""".stripMargin),
  )
}
