package graft.queries

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LLM-training-data-pipeline operators (SURVEY.md §2.9; BASELINE.json north
  * star): deduplication (exact / bag-of-words / MinHash / SimHash),
  * similarity search (brute-force + LSH-bucketed ANN), text analysis
  * (language ID, quality scoring, token counting, fingerprinting) and a
  * multimodal binary-column pipeline — all over `documents` / `embeddings`.
  *
  * Cross-engine determinism: every hash is md5 (identical in Spark and
  * DuckDB); float work is either exact (sign tests, integer-ish sums) or
  * surfaced only through rankings with large gaps. Everything is a pure
  * DataFrame pipeline — no UDFs, no collect — so each op scales by
  * partitioning alone (the 100 TB path is the same plan over more tasks).
  */
object Extensions {

  /** DuckDB-side whitespace tokens with empties dropped (mirrors
    * [[graft.functions.TextFunctions.tokens]]).
    */
  // the DuckDB twin of TextFunctions.tokens: ALL-whitespace split
  private val toksSql = """list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')"""

  /** Above this many candidate pairs, the pair-verification joins fall
    * back from forced broadcasts to plain (stats-planned, usually shuffled)
    * joins — the MOR read path's byte-threshold discipline
    * ([[graft.table.GraftScan.MorBroadcastMaxBytes]]) applied to candidate
    * sets. Candidate counts grow ~linearly with corpus size (df/bucket caps
    * bound the per-gram fanout, but the number of grams scales), so at some
    * corpus size a forced broadcast stops fitting the driver/executor
    * budget — and a query that DIES there is worse than one that shuffles.
    * 1M pairs ≈ tens of MB broadcast. Override with
    * `graft.pairs.broadcast-max-rows`.
    */
  val PairBroadcastMaxRows: Long = 1000000L

  /** Key cap for the crawl loops' per-batch STATE probes (fp / chunk-hash
    * / gram / sig / model-head runtime filters) — a COST-EFFECTIVENESS
    * bound, deliberately far below [[graft.table.GraftTable
    * .scanWithRuntimeFilter]]'s driver-safety default: a bloom plane's
    * file-skip probability is ~(1-fpr)^k ≈ e^(-k·fpr), already ~0 at
    * k=1000 keys with fpr=1%, and a ≤128-way bucket plane saturates even
    * sooner — so probing with a mega-batch's 50k+ keys reads every file
    * anyway and pays a per-batch distinct+collect plus a 50k-literal
    * predicate for nothing (measured: +2x on the novelty gate's
    * corpus-half batches). Below the cap the probe is the production
    * small-batch win the specs measure; above it the loop reads the full
    * state directly — the same answer, minus the pointless collect. The
    * fuzzy loop's candidate-TEXT fetch keeps the wide default instead:
    * its key set is candidate-sized by construction, and an In cut there
    * bounds bytes read even when file skipping saturates.
    */
  val CrawlProbeMaxKeys: Int = 1024

  /** Materialize a candidate-pair set once (localCheckpoint — distributed,
    * lineage-cut, so the count below does NOT recompute the generation
    * pipeline and the verify joins reuse the same blocks) and measure it
    * against the broadcast budget.
    *
    * @return the pinned pair frame and whether it fits the budget
    */
  private[graft] def measuredPairs(pairs: DataFrame,
      alreadyPinned: Boolean = false): (DataFrame, Boolean) = {
    val cap = pairs.sparkSession.conf.getOption("graft.pairs.broadcast-max-rows")
      .map(_.toLong).getOrElse(PairBroadcastMaxRows)
    // callers that pinned `pairs` themselves (the streaming fuzzy loop
    // checkpoints its candidate set for the fetch's driver collect) pass
    // alreadyPinned — re-checkpointing a checkpointed frame re-materializes
    // its blocks for nothing, on the per-micro-batch hot path
    val pinned = if (alreadyPinned) pairs else pairs.localCheckpoint()
    (pinned, pinned.count() <= cap)
  }

  private def maybeBroadcast(df: DataFrame, fits: Boolean): DataFrame =
    if (fits) broadcast(df) else df

  /** The keyword-search inverted index: postings (token, doc_id, tf) in a
    * Graft table identity-partitioned on a 16-way md5 bucket of the token.
    * One pass over text + one (token, doc) hash aggregate — shared by the
    * x_keyword_search gate and the ScaleSmoke contract run so the smoke
    * exercises exactly the code the gate ships.
    */
  /** One batch of postings (token, doc_id, tf, bucket) — the unit both the
    * initial index build and an incremental refresh append.
    */
  private[graft] def postingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("bucket",
        pmod(graft.functions.SketchFunctions.hash60(col("token")), lit(16L)))

  private[graft] def buildInvertedIndex(s: SparkSession, docs: DataFrame,
      cat: graft.catalog.GraftCatalog): graft.table.GraftTable = {
    import graft.format.Transform
    val postings = postingsOf(docs)
    val t = cat.createTable("db.inverted", postings.schema,
      partitionBy = Seq("bucket" -> Transform.Identity))
    t.append(s, postings)
    t
  }

  /** Probe one term's posting list: the scan prunes to the term's bucket
    * partition at PLAN time (pruning metrics come from driver-side file
    * selection — no action needed to populate them), routed by the
    * driver-side twin of the writer's bucketing.
    */
  private[graft] def probeTerm(s: SparkSession, t: graft.table.GraftTable,
      term: String): (graft.table.GraftScan, DataFrame) = {
    import graft.format.Predicate
    val sc = t.scan(Predicate.Eq("bucket",
      graft.functions.SketchFunctions.hash60Local(term) % 16))
    (sc, sc.toDF(s).filter(col("token") === term).select(col("doc_id"), col("tf")))
  }

  /** POSITIONAL postings (token, doc_id, pos) — the phrase-query index
    * shape: one row per token OCCURRENCE (vs [[postingsOf]]'s one per
    * (token, doc)), same 16-way md5 token bucketing so term probes prune
    * identically. The ~tokens-sized row count is the standard positional-
    * index storage cost; it buys adjacency queries that never touch text.
    * pos is 0-based (only ever used through relative offsets, so the
    * oracle's 1-based subscripts join with the same `+ 1`).
    */
  private[graft] def positionalPostingsOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), posexplode(TF.tokens(col("text"))).as(Seq("pos", "token")))
      .select(col("token"), col("doc_id"), col("pos").cast("long").as("pos"))
      .withColumn("bucket",
        pmod(graft.functions.SketchFunctions.hash60(col("token")), lit(16L)))

  private[graft] def buildPositionalIndex(s: SparkSession, docs: DataFrame,
      cat: graft.catalog.GraftCatalog): graft.table.GraftTable = {
    import graft.format.Transform
    val postings = positionalPostingsOf(docs)
    val t = cat.createTable("db.pos_inverted", postings.schema,
      partitionBy = Seq("bucket" -> Transform.Identity))
    t.append(s, postings)
    t
  }

  /** BM25 scoring of a two-term OR query against a persisted inverted
    * index — shared by x_bm25 and the RRF fusion gate. Probes prune to
    * the terms' buckets; doc lengths and corpus stats derive from one
    * narrow index aggregate (text never re-read); idf is the raw-ratio
    * Robertson form with dyadic k1 = 1.25 / b = 0.75 (see the x_bm25
    * gate comment for the cross-engine determinism argument).
    * @return (scanA, scanB, (doc_id, score, n_terms))
    */
  private[graft] def bm25Scored(s: SparkSession, t: graft.table.GraftTable,
      termA: String, termB: String)
      : (graft.table.GraftScan, graft.table.GraftScan, DataFrame) = {
    val idx = t.toDF(s)
    // doclen is referenced twice (the corpus-stats aggregate AND the join
    // onto candidates); pin it once so the whole-index scan+aggregate runs
    // a single time per query — the same pinning discipline as
    // containmentNomination / triangleStats / pairJaccard.
    val doclen = idx.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
      .localCheckpoint()
    val stats = doclen.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_len"))
    val (scA, a) = probeTerm(s, t, termA)
    val (scB, b) = probeTerm(s, t, termB)
    val cand = a.withColumn("term", lit(termA))
      .unionByName(b.withColumn("term", lit(termB)))
    val dfs = cand.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("total_len").cast("double") / col("n_docs").cast("double")
    val idf = (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val tfn = (col("tf").cast("double") * lit(2.25)) /
      (col("tf").cast("double") +
        lit(1.25) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
    val scored = cand
      .join(broadcast(dfs), "term")
      .join(doclen, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib", idf * tfn)
      .groupBy("doc_id")
      .agg(sum(col("contrib")).as("score"), count(lit(1)).as("n_terms"))
    (scA, scB, scored)
  }

  /** Rare-5-shingle containment nomination — the x_containment candidate
    * generator, shared with ScaleSmoke contract 3 so the smoke certifies
    * shipped code. The exploded 5-gram stream is PINNED once
    * (localCheckpoint): without it the md5-heavy shingle expression
    * evaluates three times — the df aggregate plus BOTH sides of the
    * rare-gram self-join — which profiled as the dominant cost of the
    * gate. The pinned inverted index (grams with df ∈ [2, 8]) bounds the
    * self-join fanout at Σ df² ≤ 8·Σ df.
    * @return (rare grams, nominated candidate pairs)
    */
  private[graft] def containmentNomination(docs: DataFrame): (DataFrame, DataFrame) = {
    val nom = docs.select(col("doc_id"),
      explode(array_distinct(TF.shingles(col("text"), 5))).as("g"))
      .localCheckpoint()
    val rare = nom.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 8)).select("g")
    val inv = nom.join(rare, "g").localCheckpoint()
    val cand = inv.select(col("g"), col("doc_id").as("doc_a"))
      .join(inv.select(col("g"), col("doc_id").as("doc_b")), "g")
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    (rare, cand)
  }

  /** Degree-oriented triangle statistics over the basket graph of
    * `items` (l_orderkey, l_partkey) pairs — the x_triangles pipeline,
    * shared with the ScaleSmoke graph contract so the smoke certifies
    * shipped code. Every undirected co-purchase edge points from its
    * lower-(degree, id) endpoint to the higher, bounding total wedge
    * fanout at Σ C(outdeg, 2) ≲ O(m^1.5) regardless of degree skew; the
    * closing probe is a hash join on the oriented edge set. Returns ONE
    * row: (n_edges, n_wedges, n_paths2, n_triangles, transitivity).
    */
  /** Undirected co-purchase edges (u < v, distinct) over (l_orderkey,
    * l_partkey) items, under the same basket-size cap as x_copurchase
    * (one window count on the orderkey partitioning the self-join reuses:
    * a degenerate mega-basket contributes C(64, 2) edges, never
    * C(huge, 2)). ONE construction shared by [[triangleStats]] and
    * x_pagerank, so the gates and the ScaleSmoke contract all certify
    * the same code.
    */
  /** The PLANTED-CLUSTER corpus the clustered recall gates share
    * (x_ann_recall_clustered + x_ann_index_multiprobe certify the SAME
    * corpus by construction — a drift between private copies would
    * silently invalidate the composition claim): group g = vec_id % 8,
    * clustered[i] = double(embedding[i]) + 0.25·[i%8 = g]. 0.25 is exact
    * in binary, so the shift adds deterministically in both engines; the
    * oracle derives the identical corpus with list_transform.
    */
  private[graft] def clusteredEmbeddings(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      transform(col("embedding"), (x, i) =>
        x.cast("double") + when(
          pmod(i.cast("bigint"), lit(8L)) === pmod(col("vec_id"), lit(8L)),
          lit(0.25)).otherwise(lit(0.0))).as("v"))

  /** The 8 frozen centroids of the planted-cluster corpus: the pure shift
    * vectors themselves — compile-time constants visible to both engines,
    * nothing data-dependent.
    */
  private[graft] val shiftCentroids: Seq[(Long, Array[Double])] =
    (0L until 8L).map(g => g -> Array.tabulate(64)(i => if (i % 8 == g) 0.25 else 0.0))

  /** The DRIFTED population for x_ann_index_rebuild: same base noise, but
    * the planted shift sits on CONTIGUOUS dim blocks [8g, 8g+8) instead
    * of the stride family i%8=g — a block centroid overlaps any stride
    * centroid in exactly ONE dim, so the old 8-cell index assigns these
    * vectors near-uniformly at random (measured: stale-probe recall
    * 2-5/10 across SFs) and only a rebuild with the new centroids
    * restores the floor (10/10). Ids offset by 970000 = 97·10000, so the
    * %97 panel exclusion is the SAME base-row set on both populations
    * and the drifted query (id 970000, base 0) is corpus-excluded.
    */
  private[graft] def blockEmbeddings(e: DataFrame): DataFrame =
    // Loud guard (ADVICE r13): the fixed 970000 offset silently assumes the
    // base fixture never reaches 970000 rows — a bigger future fixture would
    // collide drifted ids with base ids (duplicate vec_ids in brute force
    // AND the index) while engine/oracle parity masked it. raise_error keeps
    // the builder lazy and fails the first action that materializes it.
    e.select(when(col("vec_id") >= 970000L,
        raise_error(concat(lit("blockEmbeddings: base vec_id "), col("vec_id"),
          lit(" >= 970000 drift offset — grow the offset before the fixture"))))
      .otherwise(col("vec_id") + 970000L).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        x.cast("double") + when(
          shiftright(i, 3).cast("bigint") === pmod(col("vec_id"), lit(8L)),
          lit(0.25)).otherwise(lit(0.0))).as("v"))

  /** The 8 block centroids of the drifted population (cells 8..15 of the
    * rebuilt 16-cell index): pure contiguous-block shift vectors,
    * compile-time constants visible to both engines.
    */
  private[graft] val blockCentroids: Seq[(Long, Array[Double])] =
    (0L until 8L).map(g => (g + 8L) -> Array.tabulate(64)(i => if (i / 8 == g) 0.25 else 0.0))

  /** The pruned multi-probe top-10 + certified-recall block shared by
    * x_ann_index_multiprobe and x_stream_ann_ingest — the "same probe"
    * claim is enforced by construction, not by copy: the query's
    * nprobe=2 cell list becomes ONE In-predicate scan of the cell-
    * partitioned index `t` (pruning certified via scan metrics —
    * candidates come from the PRUNED read; the query row and its panel
    * peers are corpus-excluded like every recall gate), ranked by the
    * shared TakeOrderedAndProject ranker (never a single-partition
    * window — the pruned read is still nprobe/K of the corpus at scale),
    * every top-10 row hit-flagged against exact brute force with ≥8/10
    * REQUIREd in-process. `queryId` selects the query vector (default 0;
    * x_ann_index_rebuild probes from the GROWN population, whose id
    * offset is a multiple of 97 so the %97 panel exclusion removes the
    * query row from the corpus for any queryId ≡ 0 mod 97).
    * @return (rank, neighbor_id, hit, probe_pruned, cells_probed)
    */
  private[graft] def prunedMultiprobeTopK(s: SparkSession,
      t: graft.table.GraftTable, clustered: DataFrame,
      cents: Seq[(Long, Array[Double])], queryId: Long = 0L): DataFrame = {
    import graft.format.Predicate
    val q = clustered.filter(col("vec_id") === queryId).select(col("v").as("q"))
    val probeCells = q
      .select(VF.ivfProbeCellsExact(col("q"), cents, nprobe = 2))
      .head.getSeq[Long](0)
    val scan = t.scan(Predicate.In("cell", probeCells))
    val cand = scan.toDF(s).filter(col("vec_id") % 97 =!= 0)
      .select(col("vec_id").as("neighbor_id"), col("v").as("c_emb"))
      .crossJoin(broadcast(q))
      .withColumn("sim", nanvl(VF.cosineSimilarity(col("q"), col("c_emb")),
        lit(null).cast("double")))
      .filter(col("sim").isNotNull)
    val top = VF.rankTopK(cand, "neighbor_id", 10)
      .select("rank", "neighbor_id")
    val brute = VF.bruteForceTopK(
        clustered.filter(col("vec_id") % 97 =!= 0), q, "vec_id", "v", 10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    require(brute.size == 10, "clustered corpus must yield a full brute top-10")
    val pruned = scan.metrics.filesScanned < scan.metrics.filesTotal
    val out = top
      .withColumn("hit", col("neighbor_id").isInCollection(brute))
      .withColumn("probe_pruned", lit(pruned))
      .withColumn("cells_probed", lit(probeCells.length.toLong))
      .orderBy("rank")
      .localCheckpoint() // certified below, then returned as-is
    val hits = out.collect().count(_.getAs[Boolean]("hit"))
    require(hits >= 8,
      s"pruned-probe recall floor broken: $hits/10 from cells $probeCells")
    out
  }

  /** [[prunedMultiprobeTopK]] with the QUANTIZED coarse-rank composed in —
    * what the durable index probe actually reads at 100 TB. The index
    * table stores int8 CODES beside the floats; the probe is the same
    * nprobe=2 In-predicate pruned scan, but the coarse pass ranks by
    * [[graft.functions.VectorFunctions.quantizedCosine]] over (vec_id,
    * codes) ONLY — the float column is column-pruned out of the coarse
    * read, a 4× byte cut on the probe's dominant I/O — and only the m=50
    * coarse winners are re-ranked by exact float cosine for the top 10
    * (the x_sim_quantized reduction law, now against the durable index),
    * the winner ids PUSHED into the float fetch as an In filter so the
    * re-rank never scans the cells' float column either (without the
    * pushdown, codes + floats of the probed cells would read MORE bytes
    * than floats alone — the cut would be fake). `codes_only_scan` pins
    * both halves as ReadSchema/PushedFilters FACTS: the coarse
    * projection's index scan reads codes and never floats, and the
    * executing re-rank plan fetches floats under an In(vec_id) pushdown
    * with codes absent. Hit-flagged vs exact brute force with the same
    * ≥8/10 floor REQUIREd in-process as the float probe.
    * @return (rank, neighbor_id, hit, probe_pruned, cells_probed,
    *         codes_only_scan)
    */
  private[graft] def prunedQuantizedTopK(s: SparkSession,
      t: graft.table.GraftTable, clustered: DataFrame,
      cents: Seq[(Long, Array[Double])]): DataFrame = {
    import graft.format.Predicate
    val q = clustered.filter(col("vec_id") === 0).select(col("v").as("q"))
    val probeCells = q
      .select(VF.ivfProbeCellsExact(col("q"), cents, nprobe = 2))
      .head.getSeq[Long](0)
    val scan = t.scan(Predicate.In("cell", probeCells))
    val corpus = scan.toDF(s).filter(col("vec_id") % 97 =!= 0)
    // plan-string facts below would silently weaken if Spark truncated
    // the metadata (ReadSchema/PushedFilters) out of the dump — raise
    // the limit for the pin, restore after
    val metaLenKey = "spark.sql.maxMetadataStringLength"
    val metaLenPrior = s.conf.get(metaLenKey)
    s.conf.set(metaLenKey, "100000")
    val (codesOnly, coarseScans, rerankScans, topk) = try {
      // BOTH pins land on the plans quantizedTopK actually executed: the
      // staged variant returns its coarse DataFrame (already run — the
      // winner collect), so the coarse ReadSchema fact is the executing
      // scan's, not a reconstruction that could drift from the
      // implementation. ReadSchema there is (vec_id, cell, codes): the
      // 8-byte cell column rides along because the probe's In-filter
      // re-checks it as a residual DataFilter — the byte cut being
      // pinned is the FLOAT column's absence.
      val (coarseExec, tk) = VF.quantizedTopKStaged(corpus, q,
        "vec_id", "v", 10, 50, "codes")
      // the facts are about the INDEX TABLE's scans — the executed plans
      // also contain the query vector's own (float) scan, filtered out
      // here by table location
      def indexScans(df: DataFrame): List[String] =
        df.queryExecution.executedPlan.toString
          .linesIterator.filter(l =>
            l.contains("FileScan") && l.contains(t.location)).toList
      val cs = indexScans(coarseExec)
      val coarseCodesOnly = cs.nonEmpty && cs.forall(l =>
        l.contains("codes:array<int>") && !l.contains("v:array<double>"))
      // re-rank-half pin: the coarse winners collapsed to a driver-side
      // id list, so tk's lineage IS the re-rank — its index scan must
      // fetch floats under the pushed In(vec_id) winner filter with
      // codes absent
      val rs = indexScans(tk)
      val rerankPushed = rs.nonEmpty && rs.forall(l =>
          l.contains("v:array<double>") && l.contains("In(vec_id") &&
          !l.contains("codes:array<int>"))
      (coarseCodesOnly && rerankPushed, cs, rs, tk)
    } finally s.conf.set(metaLenKey, metaLenPrior)
    val brute = VF.bruteForceTopK(
        clustered.filter(col("vec_id") % 97 =!= 0), q, "vec_id", "v", 10)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    require(brute.size == 10, "clustered corpus must yield a full brute top-10")
    val pruned = scan.metrics.filesScanned < scan.metrics.filesTotal
    val out = topk
      .select(col("rank"), col("vec_id").as("neighbor_id"))
      .withColumn("hit", col("neighbor_id").isInCollection(brute))
      .withColumn("probe_pruned", lit(pruned))
      .withColumn("cells_probed", lit(probeCells.length.toLong))
      .withColumn("codes_only_scan", lit(codesOnly))
      .orderBy("rank")
      .localCheckpoint() // certified below, then returned as-is
    val hits = out.collect().count(_.getAs[Boolean]("hit"))
    require(hits >= 8,
      s"quantized pruned-probe recall floor broken: $hits/10 from cells $probeCells")
    require(codesOnly,
      "coarse must read codes only and the re-rank must fetch floats under " +
        s"the pushed winner filter; coarse scans:\n${coarseScans.mkString("\n")}\n" +
        s"re-rank scans:\n${rerankScans.mkString("\n")}")
    out
  }

  /** Streaming IVF-index ingest: replay the staged parquet directory as
    * a micro-batched stream and append every batch — assigned to its
    * [[graft.functions.VectorFunctions.ivfCellExact]] cell MAP-SIDE, no
    * stream state — to the identity-partitioned index table `t`. This is
    * the 100 TB vector-store maintenance shape: embeddings arrive
    * continuously, assignment is a per-row expression against frozen
    * centroids (never a re-clustering), and each micro-batch lands as
    * one atomic Graft commit so probes always read a consistent index
    * and a crashed ingest resumes from the checkpoint with no partial
    * files visible. Shared by x_stream_ann_ingest and
    * AnnStreamIngestSpec so the spec certifies the shipped ingest path.
    * @return number of non-empty micro-batches (== commits appended)
    */
  private[graft] def annStreamIngest(s: SparkSession, stage: String,
      schema: org.apache.spark.sql.types.StructType, t: graft.table.GraftTable,
      cents: Seq[(Long, Array[Double])], filesPerTrigger: Int): Int =
    streamIngestTransformed(s, stage, schema, t,
      _.withColumn("cell", VF.ivfCellExact(col("v"), cents)), filesPerTrigger)

  /** The shared micro-batched index-ingest rig under [[annStreamIngest]]
    * and [[keywordStreamIngest]]: replay the staged parquet directory as
    * an AvailableNow stream and append `derive(batch)` — a STATELESS
    * per-batch derivation (cell assignment, postings extraction) — to
    * the partitioned index table, one atomic Graft commit per non-empty
    * micro-batch. Exactly-once under CRASH recovery, not just graceful
    * completion: each append carries the GraftSink statementId discipline
    * (`<checkpoint>-batch-<batchId>`), so a micro-batch that committed to
    * the table but crashed before the stream's own commit log recorded it
    * replays as a table-side no-op. Restart semantics (same checkpoint ⇒
    * only new files) are additionally certified by AnnStreamIngestSpec.
    * @return number of non-empty micro-batches (== commits appended)
    */
  private[graft] def streamIngestTransformed(s: SparkSession, stage: String,
      schema: org.apache.spark.sql.types.StructType, t: graft.table.GraftTable,
      derive: DataFrame => DataFrame, filesPerTrigger: Int): Int =
    runMicroBatched(s, stage, schema, filesPerTrigger) { (b, batchId) =>
      t.append(s, derive(b),
        statementId = Some(s"$stage-ckpt-batch-$batchId")): Unit
    }

  /** The ONE micro-batched replay runner under every streaming-ingest
    * helper (index ingest, crawl dedup): AvailableNow over the staged
    * parquet directory, `body` per NON-EMPTY batch, checkpoint derived
    * from the stage path. On timeout the hung query is STOPPED before
    * throwing — a live stream left behind would keep committing under
    * any post-mortem inspection. One implementation so the timeout/
    * stop/batch-counting discipline cannot drift between helpers.
    * @return number of non-empty micro-batches
    */
  private[graft] def runMicroBatched(s: SparkSession, stage: String,
      schema: org.apache.spark.sql.types.StructType, filesPerTrigger: Int)(
      body: (DataFrame, Long) => Unit): Int = {
    var batches = 0
    val q = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", filesPerTrigger).parquet(stage)
      .writeStream
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        if (!b.isEmpty) {
          batches += 1
          body(b, batchId)
        }
      }
      .option("checkpointLocation", s"$stage-ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val done = q.awaitTermination(300000)
    if (!done && q.isActive) q.stop()
    require(done, s"runMicroBatched($stage): stream did not finish in 300s")
    batches
  }

  /** Streaming inverted-index ingest: each micro-batch of documents is
    * reduced to its [[postingsOf]] postings (token, doc_id, tf, bucket)
    * and appended to the bucket-partitioned index. Correct because a
    * document never spans micro-batches (the file source delivers whole
    * rows), so every (token, doc_id) tf is complete within its batch and
    * the streamed index equals the one-shot build row for row — the
    * continuous-crawl maintenance shape of a 100 TB lexical index.
    */
  private[graft] def keywordStreamIngest(s: SparkSession, stage: String,
      schema: org.apache.spark.sql.types.StructType, t: graft.table.GraftTable,
      filesPerTrigger: Int): Int =
    streamIngestTransformed(s, stage, schema, t, postingsOf, filesPerTrigger)

  /** The streaming crawl-dedup loop — the x_stream_incremental_dedup
    * pipeline body, shared with StreamIncrementalDedupSpec. Per
    * micro-batch of documents (doc_id, …, text): reduce to first-in-batch
    * (fp, min doc_id), anti-join the fingerprint `state` AS OF ARRIVAL
    * (history recrawls and earlier-batch admissions both reject), append
    * admitted ids to `results` and admitted fps to the state, each one
    * atomic statementId-keyed commit. The admitted set is PINNED per
    * batch (localCheckpoint): correctness, not perf — the state append
    * mutates the table the anti-join read, so a lazy plan recomputed
    * later could reject its own batch.
    *
    * CRASH-CONSISTENT by ordering + idempotency: results commits BEFORE
    * state. A crash between them replays the batch against a state that
    * does NOT yet hold its fps, so the recomputed admitted set is
    * identical, the results append no-ops on its statementId, and the
    * state append completes. A crash after both (or before either)
    * replays as two no-ops (or a clean re-run). The reverse order would
    * lose admissions forever: state-first would make the replayed
    * anti-join reject the batch's own fps before results ever committed.
    *
    * `filesPerTrigger` is THE batch-sizing knob the honest-cost note in
    * the gate names: each micro-batch pays ONE anti-join scan of the
    * fingerprint state, so the per-corpus state-scan count equals the
    * BATCH count, not the row count — size batches so that scan
    * amortizes (StreamIncrementalDedupSpec measures: same staged corpus,
    * 3 batches at the default vs 1 batch at filesPerTrigger=3, identical
    * admissions, state-scan/commit count 3 vs 1). And the scan itself is
    * a RUNTIME-FILTERED read: the batch's fp set is a bounded driver
    * collect (it is the batch, already reduced to first-in-batch), pushed
    * as an In probe so the state's fp-bloom and bucket planes skip files
    * — sound for the anti-join because a pruned-away state row's fp is
    * outside the batch set and could never reject anything. md5-uniform
    * min/max bounds cannot prune, but the bloom plane can: on SMALL
    * batches the probe reads only the files that plausibly hold the
    * batch's fps (measured in StreamIncrementalDedupSpec); above
    * `scanWithRuntimeFilter`'s key cap it degrades to the full scan —
    * never wrong, just unpruned (the S15 discipline).
    * @return number of non-empty micro-batches
    */
  private[graft] def streamIncrementalDedup(s: SparkSession, stage: String,
      schema: org.apache.spark.sql.types.StructType,
      state: graft.table.GraftTable, results: graft.table.GraftTable,
      filesPerTrigger: Int = 1,
      onStateScanMetrics: graft.table.ScanMetrics => Unit = _ => ()): Int =
    runMicroBatched(s, stage, schema, filesPerTrigger) { (b, batchId) =>
      val first = b.select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
        .groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
        .localCheckpoint() // read twice: the In-probe collect + the anti-join
      val stateScan = state.scanWithRuntimeFilter(first, "fp", "fp",
        maxKeys = CrawlProbeMaxKeys)
      onStateScanMetrics(stateScan.metrics)
      val adm = first
        .join(stateScan.toDF(s).select(col("fp")), Seq("fp"), "left_anti")
        .localCheckpoint() // pinned BEFORE the state mutates below
      results.append(s, adm.select(col("doc_id")),
        statementId = Some(s"$stage-res-$batchId"))
      state.append(s, adm.select(col("fp")),
        statementId = Some(s"$stage-fp-$batchId")): Unit
    }

  /** Stage `df` as `nSlices` parquet slices in slice order with
    * EXPLICITLY stamped strictly-increasing mtimes, so the file stream
    * source replays them deterministically oldest-first. The order
    * cannot be left to the filesystem clock: coarse (1 s) mtime
    * granularity can tie adjacent writes and replay them swapped — the
    * r10-ADVICE lesson. Shared by the streaming gates and
    * ScaleSmoke.stageSlices (via [[stagePreSliced]]) so the stamping
    * discipline cannot drift. `slice` must evaluate to 0..nSlices-1.
    */
  private[graft] def stageOrderedSlices(df: DataFrame, stage: String,
      slice: org.apache.spark.sql.Column, nSlices: Int,
      filesPerSlice: Int = 1): Unit =
    stagePreSliced(df.withColumn("_slice", slice), stage, nSlices, filesPerSlice)

  /** [[stageOrderedSlices]] body for callers that already carry a
    * `_slice` column (0..nSlices-1) — ScaleSmoke derives its slice from
    * event time on a column it must then drop, so it pre-slices.
    */
  private[graft] def stagePreSliced(withSlice: DataFrame, stage: String,
      nSlices: Int, filesPerSlice: Int): Unit = {
    import java.nio.file.{Files, Path, Paths}
    val sliced = withSlice.localCheckpoint()
    val stamped = scala.collection.mutable.Set[Path]()
    val base = System.currentTimeMillis()
    for (k <- 0 until nSlices) {
      sliced.filter(col("_slice") === k).drop("_slice")
        .coalesce(filesPerSlice).write.mode("append").parquet(stage)
      val walk = Files.walk(Paths.get(stage))
      try walk.forEach { f =>
        if (Files.isRegularFile(f) && !stamped.contains(f)) {
          Files.setLastModifiedTime(f,
            java.nio.file.attribute.FileTime.fromMillis(base + k * 1000L))
          stamped.add(f)
        }
      } finally walk.close()
    }
    sliced.unpersist(): Unit
  }

  /** Per-user funnel stages (view → click → purchase, each step strictly
    * AFTER the previous one's first occurrence) — the x_funnel pipeline
    * body, shared with ScaleSmoke contract 10 so the smoke certifies
    * shipped code. Three chained keyed windows over ONE user-id exchange;
    * NULL propagation implements the funnel ordering (see the gate
    * comment). Input: (user_id, event_type, ts).
    * @return (user_id, reached, gap12_us, gap23_us) — unordered
    */
  private[graft] def funnelStages(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
    val staged = ev.select("user_id", "event_type", "ts")
      .withColumn("t1", min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t2", min(when(col("event_type") === "click" &&
        col("ts") > col("t1"), col("ts"))).over(w))
      .withColumn("t3", min(when(col("event_type") === "purchase" &&
        col("ts") > col("t2"), col("ts"))).over(w))
    staged.groupBy("user_id")
      .agg(min(col("t1")).as("t1"), min(col("t2")).as("t2"), min(col("t3")).as("t3"))
      .select(col("user_id"),
        when(col("t3").isNotNull, 3L)
          .when(col("t2").isNotNull, 2L)
          .when(col("t1").isNotNull, 1L).otherwise(0L).as("reached"),
        (unix_micros(col("t2").cast("timestamp")) -
          unix_micros(col("t1").cast("timestamp"))).as("gap12_us"),
        (unix_micros(col("t3").cast("timestamp")) -
          unix_micros(col("t2").cast("timestamp"))).as("gap23_us"))
  }

  /** Per-user consecutive-event transition matrix — the
    * x_event_transitions pipeline body, shared with ScaleSmoke contract
    * 10. One keyed exchange + a lag window per user, then a hash agg onto
    * the |types|² matrix; ordering ties break by event_id. Input:
    * (user_id, event_type, ts, event_id).
    * @return (from_type, to_type, transitions, users) — unordered
    */
  private[graft] def transitionMatrix(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    ev.select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("transitions"),
        countDistinct(col("user_id")).as("users"))
  }

  /** Per-user session rollup over the shipped gap-sessionizer
    * ([[graft.streaming.Sessionize.sessionsBatch]]) — the x_sessionize
    * pipeline body, shared with ScaleSmoke contract 10. Input:
    * (user_id, ts).
    * @return (user_id, n_sessions, max_session_events, total_events) —
    *         unordered
    */
  private[graft] def sessionRollup(s: SparkSession, ev: DataFrame,
      gapMs: Long): DataFrame = {
    import s.implicits._
    import graft.streaming.Sessionize
    Sessionize.sessionsBatch(
        ev.select(col("user_id").as("userId"),
          col("ts").cast("timestamp").as("ts")).as[Sessionize.Event], gapMs)
      .groupBy(col("userId").as("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("events")).cast("long").as("max_session_events"),
        sum(col("events")).as("total_events"))
  }

  /** Per-lang bigram-LM quality rollup — the x_lm_score pipeline body,
    * shared with ScaleSmoke contract 12. Trains the fixed-point bigram
    * model on `docs` (doc_id, lang, text) and rolls the per-doc
    * floor-average scores up per language; all-integer (see the gate
    * comment for the CCNet-perplexity framing and the 100 TB plan shape).
    * @return (lang, docs, avg_score, min_score, max_score, n_low) —
    *         unordered
    */
  private[graft] def lmScoreRollup(docs: DataFrame): DataFrame = {
    val bg = docs
      .select(col("doc_id"), col("lang"),
        explode(TF.shingles(col("text"), 2)).as("bg"))
    val c2 = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
    val probs = lmProbs(c2)
    val perDoc = bg.join(probs, "bg")
      .groupBy("doc_id")
      .agg(min(col("lang")).as("lang"),
        expr("sum(q) div count(1)").as("score"))
    perDoc.groupBy("lang")
      .agg(count(lit(1)).as("docs"),
        expr("sum(score) div count(1)").as("avg_score"),
        min(col("score")).as("min_score"),
        max(col("score")).as("max_score"),
        sum(when(col("score") < 33000L, 1L).otherwise(0L)).as("n_low"))
  }

  /** Fixed-point bigram model from a (bg, c2) count table. c1 DERIVES
    * from c2 by head-word grouping — c1(w1) = Σ_w2 c2(w1 w2), the exact
    * multiset identity, so this is bit-identical to re-counting heads
    * from the corpus while reading a VOCAB-sized input instead of a
    * corpus-sized one (at 100 TB that second tokenize+explode pass is
    * the difference). One row per distinct bigram; w1 is a prefix of bg,
    * so c2 <= c1 and the fixed point q = (c2·1e6) div c1 is always in
    * [1, 1e6] when counts come from one corpus (a history-only model
    * probed by a later batch can still read 0 via a left-join miss).
    * Shared by x_lm_score and x_incremental_lm so the scale constant and
    * join shape cannot drift between the in-memory and durable-model
    * gates.
    */
  private[graft] def lmProbs(c2: DataFrame): DataFrame = {
    // pinned: c2 feeds BOTH join branches (directly and re-aggregated
    // into c1) — unpinned, the vocab-sized table's whole upstream
    // subtree (for x_lm_score, a corpus-sized tokenize+explode+count)
    // plans twice unless ReuseExchange happens to canonicalize the
    // branches identically. The pin makes the callers' one-scan claims
    // true by construction; the materialized rows are vocab-sized.
    val pinned = c2.localCheckpoint()
    val c1 = pinned.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    pinned.join(c1, substring_index(pinned("bg"), " ", 1) === c1("w1"))
      .select(col("bg"), expr("(c2 * 1000000) div c1").as("q"))
  }

  /** The incremental near-dup crawl fixture shared by
    * x_incremental_neardup and x_incremental_neardup_compacted: history
    * = even docs; batch = odd docs plus lightly-edited recrawls of every
    * 10th history doc (text + a 2-token tail, Jaccard » 0.5, disjoint
    * +1e9 ids).
    */
  private[graft] def neardupCrawlFixture(docs: DataFrame): (DataFrame, DataFrame) = {
    val hist = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
      .unionByName(hist.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("lang"),
          concat(col("text"), lit(" recrawl tail")).as("text")))
    (hist, batch)
  }

  /** Banded-MinHash signatures (band, sig, doc_id) — the durable
    * near-dup state's row shape (2 narrow rows per doc at bands=2,
    * rowsPerBand=3), shared by both incremental near-dup gates so the
    * signature construction cannot drift between them.
    */
  private[graft] def bandSigsOf(df: DataFrame): DataFrame = df
    .withColumn("mins", TF.shingleBandMinima(col("text"), 2, bands = 2, rowsPerBand = 3))
    .select(col("doc_id"),
      posexplode(TF.bandsFromMinima(col("mins"), 2, 3)).as(Seq("band", "sig")))
    .select(col("band").cast("long").as("band"), col("sig"), col("doc_id"))

  /** One crawl step of the incremental near-dup pipeline — shared by
    * x_incremental_neardup and x_incremental_neardup_compacted so the
    * nomination/verify/append semantics cannot drift between the plain
    * and mid-compaction gates (StateMaintenanceSpec cross-checks their
    * admissions row for row): nominate the batch against the persisted
    * band-signature table `t` by (band, sig) equi-join, exact-Jaccard
    * ≥ 0.5 verify via pairJaccard's measured-broadcast discipline
    * (history TEXT fetched only for nominated candidates), APPEND the
    * admitted docs' signatures back to the state — the single commit
    * this helper makes, so callers bracket it with file inventories —
    * and return the admitted batch rows. The id-only reject set is
    * PINNED: it gates both the state append and the caller's rollup
    * (measured 5.3 -> 5.0 s at sf0.1; the verify inputs were already
    * pinned inside pairJaccard, so the saving is the join itself).
    *
    * Streaming callers ([[streamIncrementalNeardup]]) pass
    * `stateStatementId` and a `commitResults` hook, which runs on the
    * admitted rows BETWEEN the (pinned) admission decision and the state
    * append — the results-BEFORE-state crash ordering the exact crawl
    * loop pins: a crash between the two commits replays against a state
    * that does not yet hold the batch's signatures, so the recomputed
    * admitted set is identical (the reject set derives only from state
    * and the pinned nomination, and the results rows the earlier attempt
    * committed are never nominated against — they are not in the
    * SIGNATURE table yet), the results append no-ops on its statementId,
    * and the state append completes. State-first would lose admissions
    * forever. Batch callers leave both defaulted: one unkeyed commit,
    * exactly the pre-r12 behavior.
    *
    * `fetchCandidates`, when installed, replaces the `hist` corpus as
    * the source of nominated partners' TEXT: it receives the pinned
    * candidate pairs (doc_a, doc_b) and must return (doc_id, text) rows
    * covering the doc_b side. This is the 100 TB read shape — the
    * streaming loop persists its corpus in a doc_id-bloom-indexed Graft
    * table and fetches ONLY the nominated ids via an In-probe pruned
    * scan ([[graft.table.GraftTable.scanWithRuntimeFilter]]), instead of
    * passing the whole corpus per batch. `hist` is untouched when the
    * hook is present. Fetched rows need not be deduplicated against the
    * batch: doc_b ids come from the SIGNATURE state, which never holds
    * this batch's sigs at verify time (even on crash-replay), so the
    * union cannot double a doc.
    */
  private[graft] def neardupAdmitAndAppend(s: SparkSession,
      t: graft.table.GraftTable, hist: DataFrame, batch: DataFrame,
      stateStatementId: Option[String] = None,
      commitResults: DataFrame => Unit = _ => (),
      fetchCandidates: Option[DataFrame => DataFrame] = None,
      onStateScanMetrics: graft.table.ScanMetrics => Unit = _ => ()): DataFrame = {
    val batchSigs = bandSigsOf(batch).localCheckpoint() // nominate AND re-append
    // the nomination reads the signature state through a RUNTIME-FILTERED
    // scan: the batch's sig set (2 narrow rows per doc — bounded by the
    // batch) pushes as an In probe so a sig-bloom state skips files that
    // cannot collide with this batch. Sound for the (band, sig) equi-join
    // — a pruned-away state row's sig is outside the batch set and could
    // never produce a candidate; the probe is a SUPERSET cut (sig only,
    // band re-checked by the join). Above the key cap it degrades to the
    // full scan (the S15 discipline).
    val stateScan = t.scanWithRuntimeFilter(batchSigs, "sig", "sig",
      maxKeys = CrawlProbeMaxKeys)
    onStateScanMetrics(stateScan.metrics)
    val cand0 = batchSigs.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
      .join(stateScan.toDF(s).select(col("band"), col("sig"), col("doc_id").as("doc_b")),
        Seq("band", "sig"))
      .select("doc_a", "doc_b").distinct()
    // with a pruned fetch installed, cand is read twice (the fetch
    // collects its doc_b ids for the In probe; pairJaccard joins it) —
    // pin it so the state nomination join runs once
    val cand = if (fetchCandidates.isDefined) cand0.localCheckpoint() else cand0
    val verifyText = fetchCandidates match {
      case Some(fetch) => batch.select("doc_id", "text").unionByName(fetch(cand))
      case None =>
        batch.select("doc_id", "text").unionByName(hist.select("doc_id", "text"))
    }
    val rejected = pairJaccard(verifyText, cand,
        pairsPinned = fetchCandidates.isDefined)
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a").as("doc_id")).distinct()
      .localCheckpoint()
    val admitted = batch.join(rejected, Seq("doc_id"), "left_anti")
    commitResults(admitted) // results BEFORE state — the crash ordering
    t.append(s, batchSigs.join(admitted.select("doc_id"), "doc_id")
      .select("band", "sig", "doc_id"), statementId = stateStatementId)
    admitted
  }

  /** The streaming FUZZY crawl loop — the x_stream_incremental_neardup
    * pipeline body, shared with StreamIncrementalNeardupSpec; the
    * near-dup twin of [[streamIncrementalDedup]], completing the
    * lifecycle matrix (batch / durable / compacted / STREAMING) the
    * exact family already has. Per micro-batch of documents: the ONE
    * shared [[neardupAdmitAndAppend]] nominates against the persisted
    * band-signature state AS OF ARRIVAL — history recrawls AND near-dups
    * of docs admitted by EARLIER micro-batches both reject, the
    * cross-batch distinction only durable state provides — verifies by
    * exact Jaccard >= 0.5, then commits admitted rows to `results` and
    * admitted signatures to the state, in that order, both
    * statementId-keyed (crash-window analysis on the helper).
    *
    * The crawl CORPUS — history pre-loaded by the caller plus every
    * admitted batch's rows, which this loop appends (the results
    * commits) — lives in ONE doc_id-bloom-indexed, doc_id-bucketed
    * Graft table, and the verify text for nominated candidates is
    * fetched from it by an In-probe PRUNED scan
    * ([[graft.table.GraftTable.scanWithRuntimeFilter]]): the batch's
    * nominated doc_b ids are a bounded driver collect (the candidate
    * set a band-collision join yields per batch, capped with a full-scan
    * fallback — the S15 discipline), pushed as an In predicate where the
    * bucket-partition, min/max and bloom planes all skip corpus files
    * before any text bytes are read. Per-batch fetch cost is therefore
    * candidate-sized, not corpus-sized — the shape that survives 100 TB,
    * where the corpus text dwarfs every batch. Each fetch's ScanMetrics
    * is surfaced through `onFetchMetrics`; the gate REQUIREs
    * filesScanned < filesTotal on every batch. Reading the corpus
    * (= results) inside the batch is safe under replay: the reject set
    * is pinned BEFORE this batch's results commit, and on a crash-replay
    * the extra already-committed rows are never nominated (their
    * signatures are not in the state yet), so they are dead rows the
    * probe never selects.
    *
    * Honest 100 TB cost accounting, the exact loop's discipline applied
    * here: each micro-batch pays one SIGNATURE-state scan for the
    * (band, sig) nomination join — and that read too is RUNTIME-FILTERED
    * (the batch's sig set as an In probe against a sig-bloom state, the
    * superset-cut detail on [[neardupAdmitAndAppend]]): md5-uniform sig
    * min/max bounds never prune, the bloom plane can on small batches,
    * and above the key cap the read degrades to the full scan.
    * `filesPerTrigger` remains the batch-sizing knob that amortizes the
    * state scan; the text fetch no longer scales with the corpus at all.
    * @return number of non-empty micro-batches
    */
  private[graft] def streamIncrementalNeardup(s: SparkSession, stage: String,
      schema: org.apache.spark.sql.types.StructType,
      state: graft.table.GraftTable, corpus: graft.table.GraftTable,
      filesPerTrigger: Int = 1,
      onFetchMetrics: graft.table.ScanMetrics => Unit = _ => (),
      onStateScanMetrics: graft.table.ScanMetrics => Unit = _ => ()): Int =
    runMicroBatched(s, stage, schema, filesPerTrigger) { (b, batchId) =>
      neardupAdmitAndAppend(s, state, corpus.toDF(s), b,
        stateStatementId = Some(s"$stage-sig-$batchId"),
        commitResults = adm => corpus.append(s, adm,
          statementId = Some(s"$stage-res-$batchId")): Unit,
        fetchCandidates = Some { cand =>
          val sc = corpus.scanWithRuntimeFilter(
            cand.select("doc_b"), "doc_b", "doc_id")
          onFetchMetrics(sc.metrics)
          sc.toDF(s).select("doc_id", "text")
        },
        onStateScanMetrics = onStateScanMetrics): Unit
    }

  /** The streaming LM-scoring crawl loop — the x_stream_incremental_lm
    * pipeline body, shared with StreamLmSpec; the model-state twin of
    * [[streamIncrementalDedup]], completing the LM count-log's lifecycle
    * matrix (batch: x_lm_score; durable + compacted: x_incremental_lm;
    * now STREAMING). Per micro-batch of documents: train the fixed-point
    * bigram model from the count-delta log AS OF ARRIVAL (the one shared
    * [[lmProbs]], which PINS the model at call time — each batch scores
    * under a frozen model that includes every EARLIER batch's deltas,
    * the cross-batch distinction), score the batch per-doc
    * (floor-average of modeled fixed points, unmodeled bigrams read 0),
    * then THREE statementId-keyed commits in fixed order: scores to
    * `results`, the batch's (bg, cnt) deltas to the `state` log, and a
    * MERGE folding the deltas into the compact `model` table (matched
    * bg: c2 += cnt; unmatched: insert) — the W7 machinery keyed like
    * every other crawl commit.
    *
    * The MODEL table is what each batch READS; the delta LOG stays the
    * source of truth, and the gate REQUIREs model ≡ log-sum after the
    * crawl. Before r13 each batch re-summed the whole delta log — a scan
    * that grew with crawl COUNT; the model read is bounded by vocab
    * regardless of how many crawls accumulated, and is further
    * RUNTIME-FILTERED by the batch's head-word set (w1-bucketed,
    * w1-bloom'd — the soundness argument for why head-pruning keeps the
    * fixed point exact is at the probe site below).
    *
    * Crash windows (results → log → merge, replay-idempotent at each):
    * after results only — the replay scores under a model WITHOUT the
    * batch's deltas (the merge is LAST), recomputes identical scores,
    * no-ops the results append, completes log + merge. After log, before
    * merge — same identical rescoring (the model still lacks the batch),
    * results and log no-op, the merge completes. Merge-before-results
    * would be WRONG the same two ways state-first always is: a crash
    * would lose scores forever, and the replayed batch would score under
    * a model polluted by its own counts.
    * @return number of non-empty micro-batches
    */
  private[graft] def streamIncrementalLm(s: SparkSession, stage: String,
      schema: org.apache.spark.sql.types.StructType,
      state: graft.table.GraftTable, model: graft.table.GraftTable,
      results: graft.table.GraftTable,
      filesPerTrigger: Int = 1,
      onModelScanMetrics: graft.table.ScanMetrics => Unit = _ => ()): Int =
    runMicroBatched(s, stage, schema, filesPerTrigger) { (b, batchId) =>
      val bb = b.select(col("doc_id"), col("lang"),
          explode(TF.shingles(col("text"), 2)).as("bg"))
        .localCheckpoint() // In-probe collect + scoring join + delta rollup
      // the model read is RUNTIME-FILTERED by HEAD WORD, not bigram: the
      // fixed point q = (c2·1e6) div c1 needs c1(w1) = Σ over ALL bigrams
      // starting with w1, so pruning by bg would undercount c1 — pruning
      // by the batch's distinct w1 set keeps every row of every probed
      // head (bloom/min-max never drop a matching file), making the
      // pruned-model scores BIT-EQUAL to the full read (extra rows from
      // false-positive files carry unprobed heads only, and those bgs
      // never join a batch bigram whose head is by construction probed).
      // The model is w1-bucketed + w1-bloom'd for exactly this probe;
      // above the key cap the read degrades to the full scan.
      val modelScan = model.scanWithRuntimeFilter(
        bb.select(substring_index(col("bg"), " ", 1).as("w1")), "w1", "w1",
        maxKeys = CrawlProbeMaxKeys)
      onModelScanMetrics(modelScan.metrics)
      // lmProbs pins the model internally at CALL time, so the merge
      // below cannot leak this batch's deltas into its own model even
      // under lazy recomputation
      val probs = lmProbs(modelScan.toDF(s).select(col("bg"), col("c2")))
      val perDoc = bb.join(probs, Seq("bg"), "left")
        .groupBy("doc_id")
        .agg(min(col("lang")).as("lang"),
          expr("sum(coalesce(q, cast(0 as bigint))) div count(1)").as("score"),
          sum(when(col("q").isNotNull, 1L).otherwise(0L)).as("modeled"))
      val deltas = bb.groupBy("bg").agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // read twice: the log append + the model MERGE
      results.append(s, perDoc,
        statementId = Some(s"$stage-res-$batchId"))
      state.append(s, deltas,
        statementId = Some(s"$stage-lm-$batchId"))
      model.merge(s,
        deltas.withColumn("w1", substring_index(col("bg"), " ", 1)),
        Seq("bg" -> "bg"),
        whenMatchedUpdate = Map("c2" -> (col("t.c2") + col("s.cnt"))),
        whenNotMatchedInsert = Some(Map(
          "bg" -> col("s.bg"), "c2" -> col("s.cnt"), "w1" -> col("s.w1"))),
        statementId = Some(s"$stage-lmm-$batchId")): Unit
    }

  /** The streaming novelty-scoring crawl loop — the
    * x_stream_incremental_novelty pipeline body, shared with
    * StreamNoveltySpec; completes the first-seen gram state's lifecycle
    * matrix (batch: x_ngram_novelty; durable + compacted:
    * x_incremental_novelty; now STREAMING). Per micro-batch of
    * documents: per-doc distinct 3-grams, anti-join the durable
    * first-seen table AS OF ARRIVAL — grams seen in history AND grams
    * first claimed by EARLIER batches both read as non-novel, the
    * cross-batch distinction — min-doc-claims the unseen grams within
    * the batch, commits per-doc novelty scores to `results` and THEN the
    * batch's first-seen rows to the state, both statementId-keyed.
    * Crash between the commits: the replay recomputes the unseen set
    * against a state without the batch's claims — identical scores, the
    * results append no-ops, the state append completes (state-first
    * would zero the replayed batch's own novelty and lose the scores).
    * Same per-batch state-scan cost knob as every crawl loop
    * (`filesPerTrigger`) — and like the exact loop's, the state scan is
    * a RUNTIME-FILTERED read: the batch's distinct-gram set pushes as an
    * In probe (bounded by the batch the knob sizes), so the first-seen
    * table's g-bloom and bucket planes skip files that cannot hold any
    * batch gram — sound for the anti-join because a pruned-away state
    * row's gram is outside the batch set and could never mark anything
    * non-novel. Natural-language grams are not md5-uniform, so the
    * min/max plane can contribute here too; above the key cap the read
    * degrades to the full scan (the S15 discipline).
    * @return number of non-empty micro-batches
    */
  private[graft] def streamIncrementalNovelty(s: SparkSession, stage: String,
      schema: org.apache.spark.sql.types.StructType,
      state: graft.table.GraftTable, results: graft.table.GraftTable,
      filesPerTrigger: Int = 1,
      onStateScanMetrics: graft.table.ScanMetrics => Unit = _ => ()): Int =
    runMicroBatched(s, stage, schema, filesPerTrigger) { (b, batchId) =>
      val bg = b.select(col("doc_id"), col("lang"),
          explode(array_distinct(TF.shingles(col("text"), 3))).as("g"))
        .localCheckpoint() // In-probe collect + anti-join + rollup read it
      val stateScan = state.scanWithRuntimeFilter(bg, "g", "g",
        maxKeys = CrawlProbeMaxKeys)
      onStateScanMetrics(stateScan.metrics)
      val unseen = bg.select("doc_id", "g")
        .join(stateScan.toDF(s).select(col("g")), Seq("g"), "left_anti")
        .groupBy("g").agg(min(col("doc_id")).as("first_doc"))
        .localCheckpoint() // pinned BEFORE the state mutates; read twice
      val perDoc = bg
        .join(unseen.withColumnRenamed("first_doc", "fd"), Seq("g"), "left")
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("fd") === col("doc_id"), lit(1L)).otherwise(lit(0L))).as("novel"))
      results.append(s, perDoc, statementId = Some(s"$stage-res-$batchId"))
      state.append(s, unseen, statementId = Some(s"$stage-fs-$batchId")): Unit
    }

  /** Non-overlapping `w`-token chunks of (doc_id, lang, text) keyed by
    * md5 of the chunk text — the ONE chunker under [[chunkDedupStats]]
    * (the x_chunk_dedup gate + ScaleSmoke contract 11) and
    * x_incremental_chunk_dedup's durable state, so the two cannot drift
    * (a w / tokenizer / hash change applied to one would silently break
    * the "x_chunk_dedup's state made durable" composition claim while
    * both gates still matched their own oracles). Chunk length by
    * arithmetic, not size(slice(..)): a second slice per chunk would
    * re-allocate the array (no CSE in interpreted HOFs — the repo-wide
    * discipline).
    * @return (doc_id, lang, ci, n_tok, h) — UNPINNED; callers pin
    */
  private[graft] def chunksOf(docs: DataFrame, w: Int): DataFrame = docs
    .select(col("doc_id"), col("lang"), TF.tokens(col("text")).as("t"))
    .filter(size(col("t")) > 0)
    .select(col("doc_id"), col("lang"), col("t"),
      posexplode(sequence(lit(1), size(col("t")), lit(w))).as(Seq("ci", "start")))
    .select(col("doc_id"), col("lang"), col("ci").cast("long").as("ci"),
      least(lit(w.toLong), (size(col("t")) - col("start") + 1).cast("long")).as("n_tok"),
      md5(array_join(slice(col("t"), col("start"), lit(w)), " ")).as("h"))

  /** Keep-first ledger rows over a chunk stream — the ONE keep-first
    * rule under every durable chunk-dedup state (x_incremental_chunk_dedup
    * and the streaming crawl loop), so the rule cannot drift between the
    * batch-refresh and streaming legs: min doc per hash, then min chunk
    * within that doc, returned WITH the kept occurrence's (lang, n_tok)
    * payload so a ledger doubles as the per-crawl keep rollup. Input is
    * [[chunksOf]]-shaped (doc_id, lang, ci, n_tok, h); the input is
    * PINNED here (read by both keep-first aggregates and the payload
    * join — and streaming callers anti-join mutable state upstream, so
    * the pin also fences the ledger from the state append that follows).
    * @return (h, f_doc, f_ci, lang, n_tok) — one row per distinct h
    */
  private[graft] def chunkKeepFirstLedger(chunks: DataFrame): DataFrame = {
    val hc = chunks.localCheckpoint()
    val fd = hc.groupBy("h").agg(min(col("doc_id")).as("f_doc"))
    // keys derives from hc, so the payload join below is a self-join —
    // its h is renamed so every column reference resolves to exactly one
    // side (DetectAmbiguousSelfJoin rejects df("col") disambiguation)
    val keys = hc.join(fd, "h").filter(col("doc_id") === col("f_doc"))
      .groupBy("h", "f_doc").agg(min(col("ci")).as("f_ci"))
      .withColumnRenamed("h", "_graft_kh")
    hc.join(keys, col("h") === col("_graft_kh") &&
        col("doc_id") === col("f_doc") && col("ci") === col("f_ci"))
      .select(col("h"), col("f_doc"), col("f_ci"), col("lang"), col("n_tok"))
  }

  /** The streaming chunk-level crawl loop — the
    * x_stream_incremental_chunk_dedup pipeline body, shared with
    * StreamChunkDedupSpec; the sub-document twin of
    * [[streamIncrementalDedup]], completing the chunk-hash state's
    * lifecycle matrix (batch / durable / streaming). Per micro-batch of
    * documents: chunk via the ONE shared [[chunksOf]], anti-join the
    * durable keep-first ledger AS OF ARRIVAL on the chunk hash — history
    * chunks AND chunks first kept by EARLIER micro-batches both reject,
    * the cross-batch distinction only durable state provides — then
    * run the ONE shared [[chunkKeepFirstLedger]] keep-first over the
    * unseen chunks and append the batch's first-occurrences as ONE
    * atomic statementId-keyed commit. A single commit per batch makes
    * the crash analysis trivial: a replayed batch either no-ops on its
    * statementId or re-runs cleanly against the pre-batch state — there
    * is no multi-commit window at all (the ledger IS both state and
    * result; a downstream shard writer would key its own commits the
    * same way).
    *
    * Honest 100 TB cost: each batch pays one ledger scan for the
    * anti-join — the same sized knob as the exact loop's, exposed as
    * `filesPerTrigger`. And like the exact loop's, the scan is a
    * RUNTIME-FILTERED read: the batch's chunk-hash set (bounded by the
    * batch — `filesPerTrigger` sizes it) pushes as an In probe, so the
    * ledger's h-bloom and bucket planes skip files on small batches —
    * sound for the anti-join because a pruned-away ledger row's hash is
    * outside the batch set and could never reject anything; md5-uniform
    * min/max bounds can never prune this state, the bloom plane can.
    * Above `scanWithRuntimeFilter`'s key cap it degrades to the full
    * scan (the S15 discipline).
    * @return number of non-empty micro-batches
    */
  private[graft] def streamIncrementalChunkDedup(s: SparkSession, stage: String,
      schema: org.apache.spark.sql.types.StructType,
      state: graft.table.GraftTable, w: Int, filesPerTrigger: Int = 1,
      onStateScanMetrics: graft.table.ScanMetrics => Unit = _ => ()): Int =
    runMicroBatched(s, stage, schema, filesPerTrigger) { (b, batchId) =>
      val bc = chunksOf(b, w)
        .localCheckpoint() // read twice: the In-probe collect + the anti-join
      val stateScan = state.scanWithRuntimeFilter(bc, "h", "h",
        maxKeys = CrawlProbeMaxKeys)
      onStateScanMetrics(stateScan.metrics)
      val unseen = bc.join(stateScan.toDF(s).select(col("h")), Seq("h"), "left_anti")
      state.append(s, chunkKeepFirstLedger(unseen),
        statementId = Some(s"$stage-chunks-$batchId")): Unit
    }

  /** Corpus-wide chunk-level keep-first dedup rollup — the x_chunk_dedup
    * pipeline body, shared with ScaleSmoke contract 11. Non-overlapping
    * `w`-token chunks keyed by md5 of the chunk text; keep-first is two
    * narrow aggregates (min doc per hash, min chunk within that doc) and
    * chunk text never travels — the exploded stream carries (hash, count)
    * only and is PINNED once (read by the first-occurrence aggregate AND
    * the probe; an unpinned stream re-tokenizes the corpus per read, the
    * pre-r8 pairJaccard 405 s failure shape). Input: (doc_id, lang, text).
    * @return per-lang (docs, chunks, kept_chunks, tokens, kept_tokens,
    *         dup_chunk_rate) — unordered
    */
  private[graft] def chunkDedupStats(docs: DataFrame, w: Int = 16): DataFrame = {
    val chunks = chunksOf(docs, w)
      .localCheckpoint() // read twice: first-occurrence aggs + probe
    val fdoc = chunks.groupBy("h").agg(min(col("doc_id")).as("f_doc"))
    val fci = chunks.join(fdoc, "h")
      .filter(col("doc_id") === col("f_doc"))
      .groupBy("h", "f_doc").agg(min(col("ci")).as("f_ci"))
    chunks.join(fci, "h")
      .withColumn("keep",
        col("doc_id") === col("f_doc") && col("ci") === col("f_ci"))
      .groupBy("lang")
      .agg(countDistinct(col("doc_id")).as("docs"),
        count(lit(1)).as("chunks"),
        sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("kept_chunks"),
        sum(col("n_tok")).as("tokens"),
        sum(when(col("keep"), col("n_tok")).otherwise(lit(0L))).as("kept_tokens"))
      .withColumn("dup_chunk_rate",
        lit(1.0) - col("kept_chunks").cast("double") / col("chunks").cast("double"))
  }

  private[graft] def basketEdges(items: DataFrame, cap: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val capped = items
      .withColumn("basket", count(lit(1)).over(Window.partitionBy("l_orderkey")))
      .filter(col("basket") <= cap)
    val a = capped.select(col("l_orderkey").as("k"), col("l_partkey").as("u"))
    val b = capped.select(col("l_orderkey").as("k"), col("l_partkey").as("v"))
    a.join(b, Seq("k")).filter(col("u") < col("v")).select("u", "v").distinct()
  }

  /** Exact fixed-point PageRank over a SYMMETRIZED edge list (u, v) — the
    * x_pagerank iteration body, shared with the ScaleSmoke iterative-rank
    * contract so the smoke certifies shipped code. Mass starts at S/N
    * (S = 10^12), each node ships p div outdeg along its edges, damped
    * update base + (85·Σ) div 100 — every step exact BIGINT floor
    * arithmetic, engine-identical (see the x_pagerank gate comment for why
    * float PageRank can never be oracle-gated). The loop-invariant
    * edges ⋈ outdeg join is HOISTED (r9 verdict #5): outdeg never changes
    * across iterations, so it pins onto the edge list ONCE and each round
    * is a single edge-sized join + one hash aggregate (the previous shape
    * paid two edge-sized joins per round), lineage cut per round.
    * @return (node, p) — unordered; callers rank by (p desc, node)
    */
  private[graft] def pagerankScores(edgesIn: DataFrame, iters: Int = 5): DataFrame = {
    val edges = edgesIn.localCheckpoint()
    val outdeg = edges.groupBy(col("u")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    val nN = outdeg.count()
    // a degenerate corpus (no order with 2+ distinct parts survives the
    // sample) has no graph: return the empty ranking rather than
    // dividing the mass by zero
    if (nN == 0) return outdeg.select(col("u").as("node"), lit(0L).as("p"))
    val p0 = 1000000000000L / nN
    val base = (15L * p0) / 100L
    val edgesW = edges.join(outdeg, "u").localCheckpoint()
    var p = outdeg.select(col("u").as("node"), lit(p0).as("p"))
    for (_ <- 1 to iters) {
      p = edgesW
        .join(p.select(col("node").as("u"), col("p")), "u")
        .select(col("v").as("node"), expr("p div outdeg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_sum"))
        .select(col("node"),
          (lit(base) + expr("(85 * in_sum) div 100")).as("p"))
        .localCheckpoint()
    }
    p
  }

  /** Exact fixed-point HITS authorities over a BIPARTITE edge list (c, p)
    * — the x_hits iteration body, shared with the ScaleSmoke iterative-rank
    * contract. Each iteration rescales by (v · S) div max(v) through
    * DECIMAL(38) (see the x_hits gate comment for the overflow-boundary
    * argument); max is the only driver value per half-round. Edges are
    * pinned once; each half-round is one edge join + hash agg + scalar max.
    * @return (p, a) final-iteration authorities — unordered
    */
  private[graft] def hitsAuthorities(edgesIn: DataFrame, iters: Int = 3,
      S: Long = 1000000L): DataFrame = {
    val edges = edgesIn.localCheckpoint()
    // a degenerate corpus with zero edges has no fixed point: return the
    // empty authorities frame rather than NPE on agg(max).head of an empty
    // first iteration (the pagerankScores guard, mirrored)
    if (edges.isEmpty)
      return edges.select(col("p"), lit(0L).as("a"))
    var hub = edges.select(col("c")).distinct().withColumn("h", lit(S))
    var auth: DataFrame = null
    for (i <- 1 to iters) {
      val aRaw = edges.join(hub, "c").groupBy("p").agg(sum(col("h")).as("a"))
        .localCheckpoint()
      val aMax = aRaw.agg(max(col("a"))).head.getLong(0)
      auth = aRaw.select(col("p"),
          expr(s"cast((cast(a as decimal(38,0)) * $S) div $aMax as bigint)").as("a"))
        .localCheckpoint()
      if (i < iters) { // the final hub update would feed an unused pass
        val hRaw = edges.join(auth, "p").groupBy("c").agg(sum(col("a")).as("h"))
          .localCheckpoint()
        val hMax = hRaw.agg(max(col("h"))).head.getLong(0)
        hub = hRaw.select(col("c"),
            expr(s"cast((cast(h as decimal(38,0)) * $S) div $hMax as bigint)").as("h"))
          .localCheckpoint()
      }
    }
    auth
  }

  private[graft] def triangleStats(s: SparkSession, items: DataFrame): DataFrame = {
    val edges = basketEdges(items).localCheckpoint()
    val deg = edges.select(col("u").as("node"))
      .union(edges.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val oriented = withDeg.select(
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("u")).otherwise(col("v")).as("src"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("v")).otherwise(col("u")).as("dst"),
        when(col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          col("dv")).otherwise(col("du")).as("ddst"))
      .localCheckpoint()
    val w1 = oriented.select(col("src"), col("dst").as("d1"), col("ddst").as("r1"))
    val w2 = oriented.select(col("src"), col("dst").as("d2"), col("ddst").as("r2"))
    // pin the wedge set: it is the pipeline's dominant volume (the
    // Σ C(outdeg, 2) join), and both its own count and the closing probe
    // read it — without the checkpoint the self-join would run twice
    val wedges = w1.join(w2, Seq("src"))
      .filter(col("r1") < col("r2") || (col("r1") === col("r2") && col("d1") < col("d2")))
      .select("src", "d1", "d2").localCheckpoint()
    val closed = wedges.join(
      oriented.select(col("src").as("d1"), col("dst").as("d2")), Seq("d1", "d2"))
    // unoriented 2-paths Σ C(deg, 2) — exact BIGINT from the degree
    // table, the transitivity denominator (each triangle closes 3 of
    // them; the ORIENTED wedge set above each triangle closes exactly 1,
    // so it is the join volume, not the normalizer). coalesce: an empty
    // graph sums to NULL, and the summary row must read (0,0,0,0,0.0),
    // not NPE
    val nP = deg.agg(coalesce(sum(col("deg") * (col("deg") - lit(1L))), lit(0L)).as("p"))
      .head.getLong(0) / 2 // Σ deg·(deg−1) is even; halve exactly
    val nE = edges.count()
    val nW = wedges.count()
    val nT = closed.count()
    import s.implicits._
    Seq((nE, nW, nP, nT)).toDF("n_edges", "n_wedges", "n_paths2", "n_triangles")
      .withColumn("transitivity",
        when(col("n_paths2") > 0,
          (lit(3.0) * col("n_triangles").cast("double")) / col("n_paths2").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Probe one term's positional posting list (pruned like [[probeTerm]]). */
  private[graft] def probeTermPositions(s: SparkSession, t: graft.table.GraftTable,
      term: String): (graft.table.GraftScan, DataFrame) = {
    import graft.format.Predicate
    val sc = t.scan(Predicate.Eq("bucket",
      graft.functions.SketchFunctions.hash60Local(term) % 16))
    (sc, sc.toDF(s).filter(col("token") === term).select(col("doc_id"), col("pos")))
  }

  /** Exact-Jaccard verification of candidate pairs WITHOUT shuffling text
    * or over-computing shingles: the pair set is measured
    * ([[measuredPairs]]) and — when it fits the budget — broadcast; the
    * (interpreted, md5-heavy) shingle expression runs ONCE PER MATCHED DOC
    * — the corpus streams through a broadcast id-join, so un-nominated
    * docs never evaluate it and text never crosses the wire — and the
    * per-doc arrays then join to the pair set. Evaluations are thereby
    * min-bounded both ways: ≤ matched docs (≤ 2·|pairs|) and ≤ corpus —
    * computing ABOVE the pair join instead (the previous shape) re-shingled
    * a doc once per pair and ran 30x-clone corpora ~14x over budget, while
    * computing for the whole corpus would waste work when candidates are
    * sparse (the common 100 TB case). Past the broadcast budget the joins
    * degrade to stats-planned shuffled joins (row volume through the
    * exchange stays O(matched + |pairs|), never corpus-squared) instead of
    * dying on an oversized broadcast.
    */
  private[graft] def pairJaccard(docs: DataFrame, pairs: DataFrame,
      pairsPinned: Boolean = false): DataFrame = {
    val (cand, fits) = measuredPairs(pairs, alreadyPinned = pairsPinned)
    val ids = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    // pinned: both join sides below read it, and without the checkpoint
    // the per-matched-doc shingle expression evaluates twice
    val matched = docs.select(col("doc_id"), col("text"))
      .join(maybeBroadcast(ids, fits), "doc_id")
      .withColumn("sh", TF.shingles(col("text"), 2))
      .select(col("doc_id"), col("sh"))
      .localCheckpoint()
    val withA = matched.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      .join(maybeBroadcast(cand, fits), "doc_a")
    val both = matched.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      .join(maybeBroadcast(withA, fits), "doc_b")
    both.withColumn("jaccard", TF.jaccardOf(col("sh_a"), col("sh_b")))
  }

  /** Distributed connected components by min-label propagation: each round
    * is one (src,dst) equi-join + min-aggregate — O(cluster diameter)
    * rounds, label state one row per clustered doc, lineage cut per round
    * so the plan stays flat at any scale.
    *
    * Near-dup clusters are shallow (diameter a handful of hops), so the
    * common path is plain propagation. A PATHOLOGICAL chain (one templated
    * corpus stitched into a long path) used to abort at `maxIters`; past
    * that point each round now adds a pointer-jumping step — label ←
    * label(label), labels being doc_ids so the parent lookup is a self-join
    * — which at least halves the remaining label depth per round, so
    * convergence lands within ~log2(n) extra rounds instead of O(n).
    * @return (doc_id, label) for every doc appearing in an edge
    */
  private[graft] def connectedComponents(edges: DataFrame, maxIters: Int = 20): DataFrame = {
    val bi = edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint()
    // fused first round: against identity labels, neighbor-min propagation
    // reduces to least(self, min(neighbor)) — one aggregate instead of the
    // identity join + change-count a full loop round would pay
    var labels = bi.groupBy(col("src"))
      .agg(min(col("dst")).as("nbr"))
      .select(col("src").as("doc_id"), least(col("src"), col("nbr")).as("label"))
      .localCheckpoint()
    val n = labels.count()
    val cap = maxIters + 2 * (64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n))) + 4
    var iters = 0
    var changed = true
    while (changed && iters < cap) {
      iters += 1
      val prop = bi.join(labels, bi("dst") === labels("doc_id"))
        .groupBy(bi("src")).agg(min(col("label")).as("nbr"))
      // carry a change flag through the same job: the convergence check is
      // then a cheap count on the just-materialized checkpoint, not a
      // second join against the previous labels
      val hop = labels.alias("l")
        .join(prop.alias("p"), col("l.doc_id") === col("p.src"), "left")
        .select(col("l.doc_id").as("doc_id"),
          least(col("l.label"), coalesce(col("p.nbr"), col("l.label"))).as("label"),
          (coalesce(col("p.nbr"), col("l.label")) < col("l.label")).as("chg"))
      val next =
        if (iters <= maxIters) hop.localCheckpoint()
        else {
          // doubling regime: jump through the just-hopped labels
          val h = hop.localCheckpoint()
          val parents = h.select(col("doc_id").as("p_id"), col("label").as("p_label"))
          h.alias("h")
            .join(parents.alias("pp"), col("h.label") === col("pp.p_id"), "left")
            .select(col("h.doc_id").as("doc_id"),
              least(col("h.label"), coalesce(col("pp.p_label"), col("h.label"))).as("label"),
              (col("h.chg") ||
                coalesce(col("pp.p_label"), col("h.label")) < col("h.label")).as("chg"))
            .localCheckpoint()
        }
      changed = next.filter(col("chg")).limit(1).count() > 0
      labels = next.drop("chg")
    }
    require(!changed, s"label propagation did not converge in $iters iterations")
    labels
  }

  /** Materialize an intermediate corpus consumed by several downstream
    * stages. The default localCheckpoint pins it in executor storage —
    * fastest at test scale, but at 100 TB it competes with shuffle memory
    * and dies with executors. `graft.pipeline.spill=table` lands it in a
    * single-use Graft table instead: durable across executor loss,
    * re-readable through the full scan stack (stats/column pruning), and
    * reclaimed with its temp warehouse.
    */
  private[queries] def materializeCorpus(s: SparkSession, df: DataFrame): DataFrame =
    s.conf.getOption("graft.pipeline.spill") match {
      case Some("table") =>
        val t = TableOps.newCatalog().createTable("tmp.corpus_spill", df.schema)
        t.append(s, df)
        t.toDF(s)
      case _ => df.localCheckpoint()
    }

  /** Candidate pairs from signature buckets, with the in-bucket all-pairs
    * explode BOUNDED: a bucket of b members normally yields b·(b-1)/2 rows
    * from one group — a boilerplate-heavy corpus at 100 TB plants a
    * mega-bucket whose quadratic explode becomes one straggler task. Buckets
    * over `graft.neardup.max-bucket` (default 256) are split into sub-buckets
    * by a secondary hash (all-pairs within each) plus one bridge group of the
    * sub-bucket minima, so pair count is O(b·cap + (b/cap)²) and cluster
    * connectivity survives the split (every sub-bucket links through its
    * min). Below the cap the expansion is exactly the original all-pairs —
    * the common path pays one `when` per bucket row, nothing more.
    *
    * CONTRACT vs the gate oracles: the DuckDB twins of the neardup queries
    * enumerate EVERY same-sig pair, so above the cap the candidate sets
    * intentionally diverge (cross-sub-bucket pairs beyond the bridge minima
    * are the sacrifice that bounds the straggler task). The gate corpora
    * keep every bucket far under the default 256 — verified empirically by
    * the gates themselves staying green at all three SFs — while the
    * capped behavior is proven separately by the 3000-member planted-
    * bucket spec. Lowering graft.neardup.max-bucket under a gate corpus's
    * max bucket size WILL fail the oracle compare, by design.
    */
  private[graft] def boundedBucketPairs(buckets: DataFrame): DataFrame = {
    val cap = buckets.sparkSession.conf.getOption("graft.neardup.max-bucket")
      .map(_.toInt).getOrElse(256)
    def allPairs(df: DataFrame): DataFrame = df
      .select(explode(col("members")).as("doc_a"), col("members"))
      .select(col("doc_a"), explode(col("members")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b")) // also drops null mins of empty sub-buckets
    val candidates = buckets.filter(size(col("members")) > 1)
    // Branch-union, NOT a per-row `when`: wrapping every bucket in a
    // conditional group array put an extra generator stage and interpreted
    // sub-bucket lambdas on the 99.99% of buckets below the cap (measured
    // ~2x on the whole near-dup family at sf0.1). The two branches share
    // the bucket aggregation's exchange (ReuseExchange plans it once), so
    // the expensive signature computation is not duplicated.
    val small = allPairs(candidates.filter(size(col("members")) <= cap))
    def sub(i: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      filter(col("members"), m => pmod(hash(m), col("nsub")) === i)
    val big = candidates.filter(size(col("members")) > cap)
      .withColumn("nsub", ceil(size(col("members")).cast("double") / cap).cast("int"))
      .withColumn("groups", concat(
        transform(sequence(lit(0), col("nsub") - 1), sub(_)),
        array(transform(sequence(lit(0), col("nsub") - 1), i => array_min(sub(i))))))
      .select(explode(col("groups")).as("members"))
      .filter(size(col("members")) > 1)
    small.union(allPairs(big))
  }

  /** Shared near-dup edge builder (shingle → k=4 MinHash sig → bucket pairs
    * → exact-Jaccard ≥ 0.5) over any (doc_id, text) corpus — the x_neardup_
    * jaccard pipeline reused as a building block.
    */
  /** The ONE candidate pipeline both near-dup consumers share: 2-shingles,
    * per-doc minhash signature (with the 'empty:' sentinel for shingle-less
    * docs — a NULL sig would both fuse them into one phantom bucket and
    * sort differently across engines), bucket-capped candidate pairs, and
    * the exact Jaccard verification. Shingle digests materialize in the
    * Generate (hashed once per row); only (doc_id, sig) leaves the node.
    * Returns (doc_a, doc_b, jaccard) for pairs with jaccard >= minJaccard.
    */
  private[graft] def verifiedNearDupPairs(docs: DataFrame,
                                            minJaccard: Double = 0.5): DataFrame =
    Extensions.pairJaccard(docs.select("doc_id", "text"), neardupCandidatePairs(docs))
      .filter(col("jaccard") >= minJaccard)

  /** The candidate HALF of the shared pipeline alone: (doc_a, doc_b) pairs
    * from the minhash signature buckets, unverified. Exposed so alternative
    * verification metrics (exact Jaccard above, edit distance in
    * x_neardup_edit) reuse one candidate generator instead of forking the
    * sentinel/bucket-cap discipline.
    */
  private[graft] def neardupCandidatePairs(docs: DataFrame): DataFrame =
    boundedBucketPairs(
      neardupSigs(docs).groupBy("sig").agg(collect_list(col("doc_id")).as("members")))

  /** The signature stage of [[neardupCandidatePairs]] alone: (doc_id, sig).
    * Exposed so the bucket-occupancy canary spec can measure the EXACT sig
    * buckets the candidate generator will build — the near-dup oracles are
    * plain sig self-joins that assume every bucket is below the
    * graft.neardup.max-bucket cap, so the canary pins that assumption to
    * the fixture rather than trusting it silently.
    */
  private[graft] def neardupSigs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .withColumn("sh", TF.shingles(col("text"), 2))
      .select(col("doc_id"), explode(array(TF.itemHashes(col("sh")))).as("_h"))
      .select(col("doc_id"),
        coalesce(TF.minhashFromHashes(col("_h"), k = 4),
          concat(lit("empty:"), col("doc_id").cast("string"))).as("sig"))

  /** Edit-distance verification of candidate pairs, same shuffle discipline
    * as [[pairJaccard]]: the measured pair set broadcasts when it fits the
    * budget (shuffled joins past it), the corpus streams through the two
    * joins, and only the matched rows' texts are carried — at 100 TB no
    * text enters an exchange keyed by anything but the candidate probe.
    * levenshtein is the O(|a|·|b|) DP in BOTH engines (integer-exact, so
    * the oracle comparison is bit-free of float concerns); it runs only on
    * the ~|pairs| matched rows, never corpus×corpus.
    */
  private[queries] def pairEditDistance(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val (cand, fits) = measuredPairs(pairs)
    val withA = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
      .join(maybeBroadcast(cand, fits), "doc_a")
    val both = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
      .join(maybeBroadcast(withA, fits), "doc_b")
    both.withColumn("edit_dist", levenshtein(col("text_a"), col("text_b")))
  }

  /** The planted-clone embedding corpus both embedding-dedup gates share:
    * every 10th vector re-appears under id+100000 (an exact cosine-1.0
    * duplicate), and each row carries its 8-bit sign-LSH cell. ONE home for
    * the planting constants — the two gates' DuckDB twins must stay
    * byte-consistent with this construction, so it must not fork.
    */
  private[queries] def plantedEmbeddingCorpus(e: DataFrame): DataFrame = {
    val planted = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"), col("label"))
    e.unionByName(planted)
      .withColumn("bucket", VF.lshBucket(col("embedding"), bits = 8))
  }

  /** The x_heavy_hitters pipeline over any (doc_id, text) corpus — exposed
    * so the randomized property test replays the IDENTICAL operator
    * (sampling decision, both thresholds, ordering) over corpora the gate
    * fixture never exercises.
    */
  private[queries] def heavyHitters(docs: DataFrame): DataFrame = {
    val occ = docs
      .select(col("doc_id"), posexplode(TF.tokens(col("text"))).as(Seq("pos", "token")))
    val sampleKey = substring(
      md5(concat_ws(":", col("doc_id"), col("pos") + 1, col("token"))), 1, 1) === "0"
    val samp = occ.filter(sampleKey).groupBy("token").agg(count(lit(1)).as("sc"))
    val cand = samp.crossJoin(broadcast(samp.agg(sum(col("sc")).as("ts"))))
      .filter(col("sc") * 128 >= col("ts")).select("token")
    // NULL-text docs contribute ZERO, matching both the explode side
    // (posexplode drops null arrays) and the oracle's NULL-skipping SUM —
    // a bare size() would feed -1 per null row under non-ANSI sessions
    val total = docs.agg(
      sum(when(col("text").isNull, 0).otherwise(size(TF.tokens(col("text")))))
        .cast("long").as("total"))
    occ.join(broadcast(cand), "token")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * 64 >= col("total"))
      .select(col("token"), col("freq"),
        (col("freq").cast("double") / col("total")).as("share"))
      .orderBy(col("freq").desc, col("token"))
  }

  private[queries] def neardupEdges(docs: DataFrame): DataFrame =
    verifiedNearDupPairs(docs)
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))

  val entries: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(

    // X1: exact dedup — hash-groupBy on content; survivors keep min doc_id.
    // At 100 TB this is ONE shuffle on a 128-bit key; group state is tiny.
    ("x_dedup_exact",
      (s: SparkSession, d: String) =>
        Tables.documents(s, d)
          .groupBy(TF.fingerprint(col("text")).as("content_hash"))
          .agg(count(lit(1)).as("copies"), min(col("doc_id")).as("keep_id"))
          .filter(col("copies") > 1)
          .orderBy("content_hash"),
      """SELECT md5(text) AS content_hash, count(*) AS copies, min(doc_id) AS keep_id
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin),

    // X2a: near-dup via normalized bag-of-words (order/multiplicity
    // insensitive = token-set Jaccard == 1 buckets).
    ("x_dedup_bow",
      (s: SparkSession, d: String) =>
        Tables.documents(s, d)
          .withColumn("bow_sig", TF.bagOfWordsSignature(col("text")))
          .groupBy("lang")
          .agg(count(lit(1)).as("docs"), countDistinct(col("bow_sig")).as("distinct_bow"))
          .orderBy("lang"),
      s"""SELECT lang, count(*) AS docs,
        |  count(DISTINCT md5(array_to_string(list_sort(list_distinct($toksSql)), ' '))) AS distinct_bow
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),

    // X2b: MinHash signatures — k=4 permutations simulated by seeded md5;
    // docs sharing all 4 minima are near-dup candidates. The band-bucket
    // join at scale is a shuffle on the signature (LSH).
    ("x_dedup_minhash",
      (s: SparkSession, d: String) => {
        // two-step: token digests materialize in the Generate (hashed ONCE
        // per row — explode(array(..)) is a one-row generator whose output
        // attribute the 4 slice minima then reference), never re-hashed
        // per slice and never shuffled (the groupBy key is the signature)
        Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array(TF.itemHashes(TF.tokens(col("text"))))).as("_h"))
          // per-doc sentinel for token-less docs (same discipline as the
          // neardup family): without it every empty doc collapses into ONE
          // NULL-signature "duplicate" bucket, and NULL additionally sorts
          // first in Spark but last in DuckDB — a phantom bucket AND an
          // ordering divergence in one
          .select(col("doc_id"),
            coalesce(TF.minhashFromHashes(col("_h"), k = 4),
              concat(lit("empty:"), col("doc_id").cast("string"))).as("minhash_sig"))
          .groupBy("minhash_sig")
          .agg(count(lit(1)).as("bucket_size"), min(col("doc_id")).as("keep_id"))
          .filter(col("bucket_size") > 1)
          .orderBy("minhash_sig")
      },
      s"""WITH hashes AS (
        |  SELECT doc_id, list_transform(list_distinct($toksSql), t -> md5(t)) AS h
        |  FROM documents),
        |sigs AS (
        |  SELECT doc_id, COALESCE(md5(
        |    list_min(list_transform(h, x -> substring(x, 1, 8))) ||
        |    list_min(list_transform(h, x -> substring(x, 9, 8))) ||
        |    list_min(list_transform(h, x -> substring(x, 17, 8))) ||
        |    list_min(list_transform(h, x -> substring(x, 25, 8)))),
        |    'empty:' || CAST(doc_id AS VARCHAR)) AS minhash_sig
        |  FROM hashes)
        |SELECT minhash_sig, count(*) AS bucket_size, min(doc_id) AS keep_id
        |FROM sigs GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin),

    // X2c: SimHash — 16 hex-position majority votes over token md5s; near
    // dups differ in few bits. Here: signature cardinality per lang.
    ("x_dedup_simhash",
      (s: SparkSession, d: String) => {
        Tables.documents(s, d)
          .withColumn("simhash", TF.simhash(col("text"), bits = 16))
          .groupBy("lang")
          .agg(count(lit(1)).as("docs"), countDistinct(col("simhash")).as("distinct_simhash"))
          .orderBy("lang")
      },
      { val bit = (p: Int) =>
          s"CASE WHEN list_sum(list_transform($toksSql, t -> CASE WHEN substring(md5(t), $p, 1) >= '8' THEN 1 ELSE -1 END)) >= 0 THEN '1' ELSE '0' END"
        s"""SELECT lang, count(*) AS docs,
          |  count(DISTINCT ${(1 to 16).map(bit).mkString(" || ")}) AS distinct_simhash
          |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin }),

    // X6a: KMV DISTINCT-COUNT SKETCH ([[graft.functions.SketchFunctions]]):
    // the mergeable cardinality sketch a 100 TB pipeline uses where exact
    // countDistinct would shuffle the full value set. State = the k
    // smallest 60-bit md5 hashes — so unlike HLL (whose register layout is
    // engine-internal) DuckDB reproduces the sketch BIT-EXACTLY, kth hash,
    // estimate and all. The query also proves the merge law on disjoint
    // halves (sketch(even) ⊎ sketch(odd) re-topk'd == sketch(all)) — the
    // executor-combine shape at scale — and surfaces the exact count for
    // accuracy eyeballing. Plan: map-side partial-distinct on the hash +
    // TakeOrderedAndProject (each task keeps ≤ k rows); no global sort,
    // no full-value shuffle.
    ("x_distinct_sketch",
      (s: SparkSession, d: String) => {
        import graft.functions.{SketchFunctions => SK}
        val k = 256
        val li = Tables.lineitem(s, d)
        val full = SK.kmvSketch(li, col("l_orderkey"), k)
        val even = SK.kmvSketch(li.filter(col("l_orderkey") % 2 === 0), col("l_orderkey"), k)
        val odd = SK.kmvSketch(li.filter(col("l_orderkey") % 2 =!= 0), col("l_orderkey"), k)
        val merged = SK.kmvEstimate(SK.kmvMerge(Seq(even, odd), k), k)
          .select(col("kth_hash").as("kth_hash_merged"),
            col("est_distinct").as("est_merged"))
        val exact = li.agg(countDistinct(col("l_orderkey")).as("exact_distinct"))
        SK.kmvEstimate(full, k)
          .crossJoin(merged).crossJoin(exact) // three 1-row frames
          .withColumn("merge_ok", col("kth_hash") === col("kth_hash_merged"))
      },
      """WITH hashes AS (
        |  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM lineitem),
        |mins AS (SELECT h FROM hashes ORDER BY h LIMIT 256),
        |full_s AS (SELECT count(*) AS n, max(h) AS kth_hash FROM mins),
        |evens AS (
        |  SELECT h FROM (
        |    SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |    FROM lineitem WHERE l_orderkey % 2 = 0)
        |  ORDER BY h LIMIT 256),
        |odds AS (
        |  SELECT h FROM (
        |    SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |    FROM lineitem WHERE l_orderkey % 2 <> 0)
        |  ORDER BY h LIMIT 256),
        |merged AS (
        |  SELECT DISTINCT h FROM (SELECT h FROM evens UNION ALL SELECT h FROM odds)
        |  ORDER BY h LIMIT 256),
        |merged_s AS (SELECT count(*) AS n, max(h) AS kth_hash_merged FROM merged),
        |exact AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct FROM lineitem)
        |SELECT CAST(f.n AS INTEGER) AS k, f.kth_hash,
        |  CASE WHEN f.n < 256 THEN f.n
        |    ELSE CAST(floor((CAST(f.n AS DOUBLE) - 1.0) * 1152921504606846976.0
        |      / CAST(f.kth_hash AS DOUBLE)) AS BIGINT) END AS est_distinct,
        |  m.kth_hash_merged,
        |  CASE WHEN m.n < 256 THEN m.n
        |    ELSE CAST(floor((CAST(m.n AS DOUBLE) - 1.0) * 1152921504606846976.0
        |      / CAST(m.kth_hash_merged AS DOUBLE)) AS BIGINT) END AS est_merged,
        |  e.exact_distinct,
        |  f.kth_hash = m.kth_hash_merged AS merge_ok
        |FROM full_s f, merged_s m, exact e""".stripMargin),

    // X6d: PER-GROUP KMV SKETCHES ([[graft.functions.SketchFunctions
    // .kmvSketchByGroup]]): distinct-count-BY-GROUP without shuffling the
    // value set — the skew-safe alternative to countDistinct-by-group,
    // whose reducer for a heavy-hitter group holds that group's ENTIRE
    // distinct set at 100 TB. Here every group's reducer state is k rows
    // by construction: partial-distinct on (group, hash) map-side, one
    // exchange of deduped pairs, window row_number keeps k per group.
    // DuckDB reproduces kth hash and estimate per group bit-exactly; the
    // exact counts ride along for accuracy eyeballing.
    ("x_group_sketch",
      (s: SparkSession, d: String) => {
        import graft.functions.{SketchFunctions => SK}
        val o = Tables.orders(s, d)
        val sk = SK.kmvSketchByGroup(o, col("o_orderpriority"), col("o_custkey"), 128)
        val exact = o.groupBy(col("o_orderpriority").as("g"))
          .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
        sk.join(exact, "g")
          .select(col("g").as("priority"), col("k"), col("kth_hash"),
            col("est_distinct"), col("exact_distinct"))
          .orderBy("priority")
      },
      """WITH hashes AS (
        |  SELECT DISTINCT o_orderpriority AS g,
        |    CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        |  FROM orders),
        |rn AS (
        |  SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
        |  FROM hashes),
        |sk AS (
        |  SELECT g, count(*) AS n, max(h) AS kth_hash
        |  FROM rn WHERE rn <= 128 GROUP BY g),
        |ex AS (
        |  SELECT o_orderpriority AS g,
        |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_distinct
        |  FROM orders GROUP BY 1)
        |SELECT sk.g AS priority, CAST(sk.n AS INTEGER) AS k, sk.kth_hash,
        |  CASE WHEN sk.n < 128 THEN sk.n
        |    ELSE CAST(floor((CAST(sk.n AS DOUBLE) - 1.0) * 1152921504606846976.0
        |      / CAST(sk.kth_hash AS DOUBLE)) AS BIGINT) END AS est_distinct,
        |  ex.exact_distinct
        |FROM sk JOIN ex ON sk.g = ex.g ORDER BY 1""".stripMargin),

    // X6f: SAMPLE-BASED QUANTILES ([[graft.functions.ScaleFunctions
    // .sampledQuantiles]]): p50/p95/p99 of l_extendedprice from a
    // deterministic md5 sample (2-hex prefix < '04' ≈ 1.6%) — the only
    // sort in the plan is over the sample; the corpus does one map-side
    // filter (the RangePartitioner idea, surfaced as an operator).
    // Nearest-rank picks of exact DECIMAL elements, ties broken by the
    // row's md5 — no interpolation, no percentile sketch — so DuckDB
    // reproduces every picked value bit-exactly. Exact quantiles would
    // sort 100 TB; the sample error is O(1/sqrt(n_sample)) in rank space.
    // The picked DECIMAL(12,2) is surfaced as DOUBLE: the pick itself is
    // an exact element either way, but decimal RENDERING differs between
    // engines' hashing harnesses ("904.00" vs "904.0"); one exact cast of
    // the same decimal on both sides removes the ambiguity.
    ("x_quantile_sample",
      (s: SparkSession, d: String) => {
        import graft.functions.{ScaleFunctions => SC}
        val li = Tables.lineitem(s, d)
        SC.sampledQuantiles(li,
          col("l_extendedprice").cast("decimal(12,2)"),
          concat(col("l_orderkey").cast("string"), lit(":"),
            col("l_linenumber").cast("string")),
          "04", Seq("p50" -> 0.5, "p95" -> 0.95, "p99" -> 0.99))
          .withColumn("value", col("value").cast("double"))
      },
      """WITH s AS (
        |  SELECT CAST(l_extendedprice AS DECIMAL(12,2)) AS v,
        |    md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS tb
        |  FROM lineitem
        |  WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '04'),
        |r AS (
        |  SELECT v, row_number() OVER (ORDER BY v, tb) AS rn,
        |    count(*) OVER () AS n
        |  FROM s),
        |q(label, p) AS (VALUES ('p50', CAST(0.5 AS DOUBLE)),
        |  ('p95', CAST(0.95 AS DOUBLE)), ('p99', CAST(0.99 AS DOUBLE)))
        |SELECT q.label AS quantile, CAST(r.v AS DOUBLE) AS value, CAST(r.n AS BIGINT) AS sample_n
        |FROM r JOIN q
        |  ON r.rn = CAST(floor(CAST(r.n - 1 AS DOUBLE) * q.p) AS BIGINT) + 1
        |ORDER BY 1""".stripMargin),

    // X6g: quantile-bucketed curriculum — sort rows into quantile bins
    // WITHOUT sorting the corpus: the sampled quantile thresholds
    // (x_quantile_sample's operator) come back as 3 exact DECIMAL
    // elements, broadcast into one map-side CASE, and the corpus does a
    // single pass + hash agg. The standard shape for quality-curriculum
    // assignment ("which quartile is this document in?") at 100 TB, where
    // a global ORDER BY + ntile would be the naive killer. Thresholds are
    // exact picked elements, so both engines make identical bin decisions.
    ("x_quality_buckets",
      (s: SparkSession, d: String) => {
        import graft.functions.{ScaleFunctions => SC}
        val li = Tables.lineitem(s, d)
        val price = col("l_extendedprice").cast("decimal(12,2)")
        // 3 threshold rows: a bounded driver read (k thresholds, like the
        // k x dim centroid collect in the IVF trainer)
        val th = SC.sampledQuantiles(li, price,
            concat(col("l_orderkey").cast("string"), lit(":"),
              col("l_linenumber").cast("string")),
            "04", Seq("q1" -> 0.25, "q2" -> 0.5, "q3" -> 0.75))
          .select("quantile", "value").collect()
          .map(r => r.getString(0) -> r.getDecimal(1)).toMap
        li.withColumn("bucket",
            when(price <= lit(th("q1")), "b1")
              .when(price <= lit(th("q2")), "b2")
              .when(price <= lit(th("q3")), "b3")
              .otherwise("b4"))
          .groupBy("bucket")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
          .orderBy("bucket")
      },
      """WITH s AS (
        |  SELECT CAST(l_extendedprice AS DECIMAL(12,2)) AS v,
        |    md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS tb
        |  FROM lineitem
        |  WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '04'),
        |r AS (
        |  SELECT v, row_number() OVER (ORDER BY v, tb) AS rn,
        |    count(*) OVER () AS n
        |  FROM s),
        |q(label, p) AS (VALUES ('q1', CAST(0.25 AS DOUBLE)),
        |  ('q2', CAST(0.5 AS DOUBLE)), ('q3', CAST(0.75 AS DOUBLE))),
        |th AS (
        |  SELECT q.label, r.v FROM r JOIN q
        |  ON r.rn = CAST(floor(CAST(r.n - 1 AS DOUBLE) * q.p) AS BIGINT) + 1)
        |SELECT CASE
        |    WHEN CAST(l_extendedprice AS DECIMAL(12,2)) <= (SELECT v FROM th WHERE label = 'q1') THEN 'b1'
        |    WHEN CAST(l_extendedprice AS DECIMAL(12,2)) <= (SELECT v FROM th WHERE label = 'q2') THEN 'b2'
        |    WHEN CAST(l_extendedprice AS DECIMAL(12,2)) <= (SELECT v FROM th WHERE label = 'q3') THEN 'b3'
        |    ELSE 'b4' END AS bucket,
        |  count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin),

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

    // X2e: embedding-cosine near-dup — the vector-space analogue of the
    // text near-dup family: sign-LSH buckets generate candidates (a hash
    // shuffle on (bucket), never all-pairs), exact cosine verifies. The
    // corpus carries planted duplicates (vec_id+100000 clones), and the
    // verification threshold 0.99 sits far above the corpus's true max
    // pair similarity (~0.51) and far below a clone's ~1.0, so float noise
    // cannot flip any pair across it in either engine.
    ("x_neardup_embedding",
      (s: SparkSession, d: String) => {
        val corpus = plantedEmbeddingCorpus(Tables.embeddings(s, d))
        val a = corpus.select(col("bucket"), col("vec_id").as("id_a"),
          col("embedding").as("emb_a"), col("label").as("label_a"))
        val b = corpus.select(col("bucket"), col("vec_id").as("id_b"),
          col("embedding").as("emb_b"))
        a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b"))
          .filter(VF.cosineSimilarity(col("emb_a"), col("emb_b")) >= 0.99)
          .groupBy(col("label_a").as("label"))
          .agg(count(lit(1)).as("n_pairs"), countDistinct(col("id_a")).as("distinct_sources"))
          .orderBy("label")
      },
      """WITH corpus AS (
        |  SELECT vec_id, embedding, label FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, embedding, label FROM embeddings WHERE vec_id % 10 = 0),
        |pairs AS (
        |  SELECT a.label AS label, a.vec_id AS id_a
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.99)
        |SELECT label, count(*) AS n_pairs, count(DISTINCT id_a) AS distinct_sources
        |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin),

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

    // X7: AS-OF join ([[graft.operators.AsofJoin]]) — purchase→latest-
    // prior-click attribution per user, the event-to-state lookup shape an
    // equi-join cannot express and Spark has no operator for. The
    // implementation is union + ordered carry-forward (one exchange on the
    // key, per-partition sort, zero row amplification — never the
    // BroadcastNestedLoopJoin an inequality join would plan); DuckDB's
    // NATIVE ASOF JOIN is the oracle, so the two engines implement the
    // operator independently and must agree row-for-row. Clicks dedupe to
    // one row per (user, instant) first (max event_id) — the determinism
    // contract both engines share. Gap surfaces in integer microseconds
    // (NTZ→LTZ cast exact under the UTC session).
    ("x_asof_join",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts")
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("event_id")).as("click_id"))
        graft.operators.AsofJoin.asofJoin(purchases, clicks, "user_id", "ts", "ts")
          .select(col("event_id"), col("user_id"), col("asof_click_id").as("click_id"),
            (unix_micros(col("ts").cast("timestamp")) -
              unix_micros(col("asof_ts").cast("timestamp"))).as("gap_us"))
          .orderBy("event_id")
      },
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, ts, max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, c.click_id,
        |  CAST(date_diff('microsecond', c.ts, p.ts) AS BIGINT) AS gap_us
        |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY 1""".stripMargin),

    // X7b: range (point-in-interval) join ([[graft.operators.RangeJoin]]) —
    // each purchase opens a 1-hour attribution window; count the user's
    // clicks landing inside it. The binning decomposition (intervals
    // explode to covered grid bins, points bin once, hash join on
    // (key, bin), exact containment filter) — never the per-key inequality
    // scan a BETWEEN join plans. Window end is half-open, so a click at
    // exactly +1h does NOT attribute; both engines agree on the boundary.
    // Purchases with no clicks keep 0 via the left join of the aggregate.
    ("x_range_join",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val windows = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("ts").as("w_start"))
          .withColumn("w_end", col("w_start") + expr("INTERVAL 1 HOUR"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
        val matched = graft.operators.RangeJoin.pointInInterval(
            clicks, windows, "user_id", "ts", "w_start", "w_end")
          .groupBy(col("iv_purchase_id").as("purchase_id"))
          .agg(count(lit(1)).as("clicks_1h"), max(col("click_id")).as("last_click_id"))
        windows.select(col("purchase_id"), col("user_id"))
          .join(matched, Seq("purchase_id"), "left")
          .select(col("purchase_id"), col("user_id"),
            coalesce(col("clicks_1h"), lit(0L)).as("clicks_1h"),
            col("last_click_id"))
          .orderBy("purchase_id")
      },
      """WITH p AS (
        |  SELECT event_id AS purchase_id, user_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT event_id AS click_id, user_id, ts
        |  FROM events WHERE event_type = 'click')
        |SELECT p.purchase_id, p.user_id,
        |  count(c.click_id) AS clicks_1h,
        |  max(c.click_id) AS last_click_id
        |FROM p LEFT JOIN c ON c.user_id = p.user_id
        |  AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin),

    // X7c: trailing-window features — per-supplier shipped quantity and
    // line count over the trailing 30 days, the feature-engineering staple
    // (fraud velocity, demand trailing sums). A native RANGE-frame window:
    // ONE exchange on the key, a per-partition sort, zero joins — the frame
    // bound does what the x_range_join bin join does when the "interval" is
    // anchored at every row. Sums follow the q1 dsum convention (exact
    // DECIMAL accumulation surfaced as DOUBLE — never order-dependent FP).
    // The window runs over everything before July 1995 but only June
    // surfaces, so early rows serve only as frame history (cheap slice of
    // the output, full-fidelity frames at the month boundary).
    ("x_window_features",
      (s: SparkSession, d: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_suppkey"))
          .orderBy(unix_date(col("l_shipdate").cast("date")))
          .rangeBetween(-29, 0)
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") < to_timestamp(lit("1995-07-01")))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
            col("l_shipdate"),
            count(lit(1)).over(w).as("n_30d"),
            sum(col("l_quantity").cast("decimal(18,2)")).over(w)
              .cast("double").as("qty_30d"))
          .filter(col("l_shipdate") >= to_timestamp(lit("1995-06-01")))
          .drop("l_shipdate")
          .orderBy("l_orderkey", "l_linenumber")
      },
      """SELECT l_orderkey, l_linenumber, l_suppkey, n_30d, qty_30d FROM (
        |  SELECT l_orderkey, l_linenumber, l_suppkey, l_shipdate,
        |    count(*) OVER w AS n_30d,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) OVER w AS DOUBLE) AS qty_30d
        |  FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-07-01'
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY CAST(l_shipdate AS DATE)
        |    RANGE BETWEEN INTERVAL 29 DAYS PRECEDING AND CURRENT ROW))
        |WHERE l_shipdate >= TIMESTAMP '1995-06-01'
        |ORDER BY 1, 2""".stripMargin),

    // X4m: out-of-vocabulary rate — the vocabulary-based quality signal
    // (a doc full of tokens outside the corpus's common vocabulary is
    // noise/garble/alien language). Vocab = exact top-16 tokens by
    // (freq DESC, token) via TakeOrderedAndProject (distributed top-N,
    // never a single-partition window over the vocabulary), then a
    // broadcast left join scores every token; per-language rate is one
    // division of exact BIGINTs, so both engines emit identical doubles.
    ("x_oov_rate",
      (s: SparkSession, d: String) => {
        val tok = Tables.documents(s, d)
          .select(col("lang"), explode(TF.tokens(col("text"))).as("token"))
        val vocab = tok.groupBy("token").agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("token")).limit(16)
          .select(col("token"), lit(1L).as("in_vocab"))
        tok.join(broadcast(vocab), Seq("token"), "left")
          .groupBy("lang")
          .agg(count(lit(1)).as("total_tokens"),
            sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).as("oov_tokens"))
          .withColumn("oov_rate",
            col("oov_tokens").cast("double") / col("total_tokens"))
          .orderBy("lang")
      },
      s"""WITH tok AS (SELECT lang, unnest($toksSql) AS token FROM documents),
        |vocab AS (
        |  SELECT token FROM tok GROUP BY token
        |  ORDER BY count(*) DESC, token LIMIT 16)
        |SELECT lang, count(*) AS total_tokens,
        |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS oov_tokens,
        |  CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS oov_rate
        |FROM tok LEFT JOIN vocab v ON tok.token = v.token
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // X8: time-series gap fill ([[graft.operators.GapFill]]) — densify a
    // sparse per-key daily series onto one shared calendar: missing days
    // surface as explicit zeros plus a last-observation-carried-forward
    // column. The fixture thins events to ~75 kept rows via a modulus
    // derived FROM the corpus size (count/75 — the r7 lesson: absolute
    // fixture constants go vacuous at some SF; relative ones do not), so
    // real gaps exist at every SF. The modulus reaches the filter as a
    // broadcast 1-row cross join — no driver-side count round trip.
    ("x_gap_fill",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
        val m = ev.agg(greatest(floor(count(lit(1)) / 75), lit(1L)).as("m"))
        val kept = ev.crossJoin(broadcast(m)).filter(pmod(col("user_id"), col("m")) === 0)
        val daily = kept.groupBy("event_type", "day").agg(count(lit(1)).as("n"))
        val bounds = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        graft.operators.GapFill.fillDaily(daily, bounds, Seq("event_type"), "day", "n")
          .orderBy("event_type", "day")
      },
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, user_id FROM events),
        |tot AS (
        |  SELECT greatest(CAST(floor(count(*) / 75.0) AS BIGINT), 1) AS m FROM ev),
        |kept AS (SELECT event_type, day FROM ev, tot WHERE user_id % m = 0),
        |daily AS (SELECT event_type, day, count(*) AS n FROM kept GROUP BY 1, 2),
        |bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        |cal AS (
        |  SELECT k.event_type, CAST(u.day AS DATE) AS day
        |  FROM (SELECT DISTINCT event_type FROM kept) k
        |  CROSS JOIN (
        |    SELECT unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS day FROM bounds) u)
        |SELECT c.event_type, c.day, coalesce(dd.n, 0) AS n,
        |  last_value(dd.n IGNORE NULLS) OVER (
        |    PARTITION BY c.event_type ORDER BY c.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_locf
        |FROM cal c LEFT JOIN daily dd
        |  ON dd.event_type = c.event_type AND dd.day = c.day
        |ORDER BY 1, 2""".stripMargin),

    // X4a: token counting — whitespace + a BPE-ish regex segmentation —
    // and exact average via decimal-free integer sums.
    ("x_text_stats",
      (s: SparkSession, d: String) =>
        Tables.documents(s, d)
          .withColumn("ws_tokens", TF.tokenCount(col("text")))
          .withColumn("bpe_tokens", size(TF.bpeTokens(col("text"))).cast("long"))
          .groupBy("lang", "source")
          .agg(count(lit(1)).as("docs"),
            sum(col("ws_tokens")).as("total_ws_tokens"),
            sum(col("bpe_tokens")).as("total_bpe_tokens"),
            (sum(col("ws_tokens")).cast("double") / count(lit(1))).as("avg_tokens"),
            max(col("n_chars")).as("max_chars"))
          .orderBy("lang", "source"),
      s"""SELECT lang, source, count(*) AS docs,
        |  CAST(SUM(len($toksSql)) AS BIGINT) AS total_ws_tokens,
        |  CAST(SUM(len(regexp_extract_all(text, '\\w+|[^\\w\\s]+'))) AS BIGINT) AS total_bpe_tokens,
        |  CAST(SUM(len($toksSql)) AS DOUBLE) / count(*) AS avg_tokens,
        |  max(n_chars) AS max_chars
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // X4b: corpus token frequencies (explode -> two-phase hash agg; the
    // classic word-count shape that map-side combines at scale).
    ("x_token_frequencies",
      (s: SparkSession, d: String) =>
        Tables.documents(s, d)
          .select(explode(TF.tokens(col("text"))).as("token"))
          .groupBy("token")
          .agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("token"))
          .limit(20),
      s"""SELECT token, count(*) AS freq
        |FROM (SELECT unnest($toksSql) AS token FROM documents)
        |GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20""".stripMargin),

    // X4c: language ID — n-gram/stopword marker heuristic (deterministic,
    // mirrored in the oracle) scored against the labeled lang column.
    ("x_lang_id",
      (s: SparkSession, d: String) =>
        Tables.documents(s, d)
          .withColumn("predicted", TF.langId(col("text"),
            Seq("en" -> Seq("the", "a"), "en-weak" -> Seq("the")), default = "other"))
          .groupBy("lang", "predicted")
          .agg(count(lit(1)).as("docs"))
          .orderBy("lang", "predicted"),
      s"""SELECT lang,
        |  CASE WHEN list_contains($toksSql, 'the') AND list_contains($toksSql, 'a') THEN 'en'
        |       WHEN list_contains($toksSql, 'the') THEN 'en-weak'
        |       ELSE 'other' END AS predicted,
        |  count(*) AS docs
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // X4d: quality scoring + filter — token-count bounds and stopword ratio
    // (exact integer/ratio math both sides).
    ("x_quality_filter",
      (s: SparkSession, d: String) =>
        Tables.documents(s, d)
          .withColumn("passes", TF.qualityPass(col("text"), 10, 500,
            Seq("the", "a", "data", "value"), 0.3))
          .groupBy("lang")
          .agg(count(lit(1)).as("docs"), sum(when(col("passes"), 1L).otherwise(0L)).as("passing"))
          .orderBy("lang"),
      s"""WITH scored AS (
        |  SELECT lang, len($toksSql) AS n_tokens,
        |    CAST(len(list_filter($toksSql, x -> x IN ('the', 'a', 'data', 'value'))) AS DOUBLE)
        |      / len($toksSql) AS stop_ratio
        |  FROM documents)
        |SELECT lang, count(*) AS docs,
        |  CAST(SUM(CASE WHEN n_tokens BETWEEN 10 AND 500 AND stop_ratio < 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS passing
        |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin),

    // X2d: shingle→MinHash→bucket-join→exact-Jaccard near-dup pairs (the
    // textbook n-gram pipeline). The candidate key is MinHash over 2-gram
    // SHINGLES, not raw tokens: the shingle universe is |vocab|^2, so bucket
    // sizes stay O(1) as the corpus grows (token-level minima collide into
    // corpus-sized buckets — a skew bomb in the self-join; measured 2.7M
    // candidate pairs at sf0.1 vs 230 with shingles). Exact Jaccard (ints +
    // one double division) then filters the survivors.
    ("x_neardup_jaccard",
      (s: SparkSession, d: String) => {
        // Shuffle discipline: the only shuffled payload is (doc_id, sig) —
        // the shingle arrays never enter an exchange. Candidate pairs come
        // from bucket-local pair generation on the tiny signature table;
        // Jaccard verification then streams the corpus twice against the
        // BROADCAST pair set. (Also: no filter on the derived sig column —
        // Catalyst pushes such filters into the parquet scan, re-evaluating
        // the whole interpreted hash tree per row; degenerate shingle-less
        // docs get a per-doc sentinel bucket instead, which the
        // bucket-size > 1 cut then drops.)
        verifiedNearDupPairs(Tables.documents(s, d))
          .select("doc_a", "doc_b", "jaccard")
          .orderBy("doc_a", "doc_b")
      },
      s"""WITH toks AS (
        |  SELECT doc_id, $toksSql AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS sh
        |  FROM toks),
        |sigs AS (
        |  SELECT doc_id, sh, md5(
        |    list_min(list_transform(sh, x -> substring(md5(x), 1, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x), 9, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x), 17, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x), 25, 8)))) AS sig
        |  FROM sh)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        |FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
        |ORDER BY 1, 2""".stripMargin),

    // X2f: duplicate-CLUSTER resolution — pair detection alone can't drive
    // "keep one copy": near-dup is transitive in practice (A~B, B~C), so
    // the keep/drop decision needs connected components over the pair
    // graph. Distributed min-label propagation: each iteration is one
    // (src,dst)-join + min-aggregate — O(cluster diameter) rounds, each a
    // plain shuffle, label state one row per clustered doc; lineage is cut
    // per round (localCheckpoint) so the plan stays flat at any scale. The
    // oracle recomputes components via a recursive CTE.
    ("x_dup_clusters",
      (s: SparkSession, d: String) => {
        val labels = connectedComponents(neardupEdges(Tables.documents(s, d)))
        labels.groupBy(col("label").as("cluster_rep"))
          .agg(count(lit(1)).as("n_members"), max(col("doc_id")).as("max_doc"))
          .orderBy(col("cluster_rep"))
      },
      s"""WITH RECURSIVE toks AS (
        |  SELECT doc_id, $toksSql AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS sh
        |  FROM toks),
        |sigs AS (
        |  SELECT doc_id, sh, md5(
        |    list_min(list_transform(sh, x -> substring(md5(x), 1, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x), 9, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x), 17, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x), 25, 8)))) AS sig
        |  FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS doc_id, min(dst) AS label FROM reach GROUP BY 1)
        |SELECT label AS cluster_rep, count(*) AS n_members, max(doc_id) AS max_doc
        |FROM labels GROUP BY 1 ORDER BY 1""".stripMargin),

    // X-pipeline: the END-TO-END training-data preparation flow every piece
    // above exists for, composed as one job: quality filter → exact dedup
    // (keep min doc_id per content hash) → near-dup cluster resolution
    // (keep each component's representative) → deterministic split. Every
    // stage is a shuffle-bounded DataFrame op (filter / hash-agg / the CC
    // rounds / projection), so the 100 TB plan is the same plan.
    ("x_pipeline",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val quality = docs.filter(
          TF.qualityPass(col("text"), 10, 500, Seq("the", "a", "data", "value"), 0.3))
        val keepIds = quality
          .groupBy(TF.fingerprint(col("text")).as("h"))
          .agg(min(col("doc_id")).as("doc_id"))
          .select("doc_id")
        // materialize the filtered+deduped corpus once: it feeds the edge
        // builder (streamed twice for pair verification) and the final
        // anti-join — recomputing the quality expression 3x would dominate
        val surv = materializeCorpus(s, quality.join(keepIds, "doc_id"))
        val labels = connectedComponents(neardupEdges(surv))
        val dropIds = labels.filter(col("label") =!= col("doc_id")).select("doc_id")
        val kept = surv.join(dropIds, Seq("doc_id"), "left_anti")
        val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
        kept
          .withColumn("split",
            when(bucket < "cc", "train").when(bucket < "e6", "val").otherwise("test"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"),
            countDistinct(col("lang")).as("n_langs"))
          .orderBy(col("split"))
      },
      s"""WITH RECURSIVE toked AS (
        |  SELECT doc_id, text, lang, n_chars, $toksSql AS toks FROM documents),
        |q AS (
        |  SELECT * FROM toked
        |  WHERE len(toks) BETWEEN 10 AND 500
        |    AND CAST(len(list_filter(toks, x -> x IN ('the', 'a', 'data', 'value'))) AS DOUBLE)
        |      / len(toks) < 0.3),
        |ex AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
        |surv AS (SELECT q.* FROM q JOIN ex USING (doc_id)),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i + 1])) AS sh
        |  FROM surv),
        |sigs AS (
        |  SELECT doc_id, sh, md5(
        |    list_min(list_transform(sh, x -> substring(md5(x), 1, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x), 9, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x), 17, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x), 25, 8)))) AS sig
        |  FROM sh),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS doc_id, min(dst) AS label FROM reach GROUP BY 1),
        |kept AS (
        |  SELECT s.* FROM surv s LEFT JOIN labels l ON s.doc_id = l.doc_id
        |  WHERE l.doc_id IS NULL OR l.label = s.doc_id)
        |SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |            ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  count(DISTINCT lang) AS n_langs
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin),

    // X2e: banded MinHash (OR-of-ANDs LSH): 2 bands x 3 rows — docs sharing
    // ANY band signature are candidates, so recall exceeds the single AND-only
    // k=4 signature (255 verified pairs vs 227 at sf0.1); exact Jaccard then
    // verifies. The band count/width sits on the S-curve deliberately: this
    // corpus is overlap-heavy (templated docs), and 2-row bands admit the
    // j~0.2 tail — measured 49k candidates at 4x2 vs 1k at 2x3 for the SAME
    // verified output. Candidate generation is explode + equi-join on
    // (band, sig) — a shuffle, never all-pairs.
    ("x_neardup_banded",
      (s: SparkSession, d: String) => {
        // same shuffle discipline as x_neardup_jaccard: the band join
        // shuffles only (doc_id, band, sig); NULL band sigs (shingle-less
        // docs) drop out of the equi-join by SQL semantics — no filter on
        // the derived column, so nothing pushes the hash tree into the scan.
        val base = Tables.documents(s, d)
        // mins is a materialized column; the bands expression lives in the
        // posexplode generator, so the Project/Generate boundary stops
        // CollapseProject from inlining the fold once per band. The
        // shingle→distinct→hash→minima pipeline itself is the FUSED
        // codegen kernel (r10; bit-compat proven by TextKernelsSpec)
        val banded = base
          .withColumn("mins", TF.shingleBandMinima(col("text"), 2, bands = 2, rowsPerBand = 3))
          .select(col("doc_id"),
            posexplode(TF.bandsFromMinima(col("mins"), 2, 3)).as(Seq("band", "sig")))
        // bucket-local pair generation: ONE evaluation of the band pipeline
        // (a self-join would run it once per side), one shuffle of
        // (doc_id, band, sig); shingle-less docs yield a NULL bands array,
        // which posexplode drops entirely
        val pairs = boundedBucketPairs(
          banded.groupBy("band", "sig").agg(collect_list(col("doc_id")).as("members")))
          .distinct() // a pair may collide in >1 band
        Extensions.pairJaccard(base.select("doc_id", "text"), pairs)
          .filter(col("jaccard") >= 0.5)
          .select("doc_a", "doc_b", "jaccard")
          .orderBy("doc_a", "doc_b")
      },
      s"""WITH toks AS (
        |  SELECT doc_id, $toksSql AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS sh
        |  FROM toks),
        |bands AS (
        |  SELECT doc_id, b, md5(
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 0) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 1) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 2) * 8, 8)))) AS sig
        |  FROM sh, (SELECT unnest([0, 1]) AS b)
        |  WHERE len(sh) > 0),
        |pairs AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bands a JOIN bands b ON a.b = b.b AND a.sig = b.sig AND a.doc_id < b.doc_id)
        |SELECT p.doc_a, p.doc_b,
        |  CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.sh, y.sh))) AS jaccard
        |FROM pairs p JOIN sh x ON x.doc_id = p.doc_a JOIN sh y ON y.doc_id = p.doc_b
        |WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |    / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5
        |ORDER BY 1, 2""".stripMargin),

    // X4f: winnowing (rolling-hash) document fingerprints — the MOSS-style
    // robust fingerprint set: minima of sliding windows over shingle
    // hashes. Shared fingerprints across docs signal partial overlap that
    // whole-document hashing misses.
    ("x_winnow_fingerprint",
      (s: SparkSession, d: String) => {
        val fps = Tables.documents(s, d)
          .withColumn("hs", TF.shingleHashes(col("text"), 2))
          .withColumn("fp", explode(TF.winnowFromHashes(col("hs"), w = 4)))
        fps.groupBy("lang")
          .agg(count(lit(1)).as("fingerprints"),
            countDistinct(col("fp")).as("distinct_fingerprints"))
          .orderBy("lang")
      },
      s"""WITH toks AS (
        |  SELECT doc_id, lang, $toksSql AS t FROM documents),
        |hs AS (
        |  SELECT doc_id, lang, list_transform(
        |    list_transform(generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1]),
        |    g -> substring(md5(g), 1, 8)) AS hs
        |  FROM toks),
        |fps AS (
        |  SELECT doc_id, lang, unnest(CASE WHEN len(hs) < 4 THEN list_distinct(hs)
        |    ELSE list_distinct(list_transform(
        |      generate_series(1, len(hs) - 3), i -> list_min(hs[i:i+3]))) END) AS fp
        |  FROM hs)
        |SELECT lang, count(*) AS fingerprints,
        |  count(DISTINCT fp) AS distinct_fingerprints
        |FROM fps GROUP BY 1 ORDER BY 1""".stripMargin),

    // X6: gap-based sessionization — the custom-state operator
    // (flatMapGroups batch twin of the flatMapGroupsWithState streaming
    // path in graft.streaming.Sessionize; one userId shuffle, per-key fold).
    // The oracle recomputes sessions with the SQL lag/cumsum assignment.
    ("x_sessionize",
      (s: SparkSession, d: String) =>
        sessionRollup(s, Tables.events(s, d), gapMs = 30L * 60 * 1000)
          .orderBy("user_id"),
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(CAST(ts AS TIMESTAMP)) - epoch_ms(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sl AS (
        |  SELECT user_id,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |sess AS (SELECT user_id, sid, count(*) AS evs FROM sl GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |  CAST(max(evs) AS BIGINT) AS max_session_events,
        |  CAST(sum(evs) AS BIGINT) AS total_events
        |FROM sess GROUP BY 1 ORDER BY 1""".stripMargin),

    // X4e: document fingerprinting — content-hash dup ratio per source.
    ("x_fingerprint",
      (s: SparkSession, d: String) =>
        Tables.documents(s, d)
          .groupBy("source")
          .agg(count(lit(1)).as("docs"),
            countDistinct(TF.fingerprint(col("text"))).as("distinct_fp"))
          .withColumn("dup_docs", col("docs") - col("distinct_fp"))
          .orderBy("source"),
      """SELECT source, count(*) AS docs,
        |  count(DISTINCT md5(text)) AS distinct_fp,
        |  count(*) - count(DISTINCT md5(text)) AS dup_docs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),

    // X5: multimodal columns — text treated as an opaque binary blob with
    // typed metadata; "decode" is a deterministic byte-level feature
    // (first-byte + length + content digest), the real pipeline shape for
    // image/audio blobs (decode libs are stubbed; plumbing is real).
    ("x_multimodal_blobs",
      (s: SparkSession, d: String) =>
        Tables.documents(s, d)
          .withColumn("blob", encode(col("text"), "UTF-8"))
          .withColumn("meta", struct(
            octet_length(col("text")).cast("long").as("byte_len"),
            sha2(col("text"), 256).as("digest"),
            ascii(col("text")).cast("long").as("first_byte")))
          .groupBy("source")
          .agg(count(lit(1)).as("n_blobs"),
            sum(col("meta.byte_len")).as("total_bytes"),
            countDistinct(col("meta.digest")).as("distinct_blobs"),
            sum(col("meta.first_byte")).as("first_byte_sum"))
          .orderBy("source"),
      """SELECT source, count(*) AS n_blobs,
        |  CAST(SUM(octet_length(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
        |  count(DISTINCT sha256(text)) AS distinct_blobs,
        |  CAST(SUM(ascii(text)) AS BIGINT) AS first_byte_sum
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),

    // X5b: container-format sniffing — REAL binary-column work (no codec
    // stub): blobs get one of four magic-byte headers (doc_id % 5; one
    // class unprefixed -> 'unknown'), and the classifier routes them by
    // prefix compare. Map-side only; the shuffle carries (format, counts).
    ("x_multimodal_sniff",
      (s: SparkSession, d: String) => {
        import graft.operators.Multimodal
        val pfx = element_at(array(
          lit(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)),
          lit(Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)),
          lit("RIFF".getBytes("UTF-8")), lit("%PDF".getBytes("UTF-8")),
          lit(Array.empty[Byte])), (col("doc_id") % 5 + 1).cast("int"))
        Tables.documents(s, d)
          .withColumn("blob", concat(pfx, encode(col("text"), "UTF-8")))
          .withColumn("fmt", Multimodal.sniffFormat(col("blob")))
          .groupBy("fmt")
          .agg(count(lit(1)).as("n"),
            sum(octet_length(col("blob")).cast("long")).as("total_bytes"))
          .orderBy("fmt")
      },
      """WITH b AS (
        |  SELECT doc_id,
        |    (CASE CAST(doc_id % 5 AS INTEGER)
        |       WHEN 0 THEN '\x89PNG'::BLOB
        |       WHEN 1 THEN '\xFF\xD8\xFF\xE0'::BLOB
        |       WHEN 2 THEN 'RIFF'::BLOB
        |       WHEN 3 THEN '%PDF'::BLOB
        |       ELSE ''::BLOB END) || CAST(text AS BLOB) AS blob
        |  FROM documents),
        |f AS (
        |  SELECT CASE
        |    WHEN starts_with(hex(blob), '89504E47') THEN 'png'
        |    WHEN starts_with(hex(blob), 'FFD8FF') THEN 'jpeg'
        |    WHEN starts_with(hex(blob), '52494646') THEN 'riff'
        |    WHEN starts_with(hex(blob), '25504446') THEN 'pdf'
        |    WHEN starts_with(hex(blob), '494433') THEN 'mp3'
        |    WHEN substr(hex(blob), 9, 8) = '66747970' THEN 'mp4'
        |    ELSE 'unknown' END AS fmt, blob
        |  FROM b)
        |SELECT fmt, count(*) AS n,
        |  CAST(SUM(octet_length(blob)) AS BIGINT) AS total_bytes
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin),

    // X5c: REAL image decode (no stub): 48 JDK-encoded PNG/BMP/GIF blobs
    // with known dimensions plus 8 undecodable byte strings, stored through
    // a Graft table (binary through the full table stack), then header-
    // decoded via javax.imageio ([[graft.operators.ImageCodec]]) on the
    // scan side. Header-only parse — at 100 TB the cost is per-blob
    // metadata sniffing inside whole-stage codegen, not pixel decode.
    ("x_multimodal_decode",
      (s: SparkSession, d: String) => {
        import graft.operators.{ImageCodec, Multimodal}
        val rows = (0 until 48).map { i =>
          val fmt = Seq("png", "bmp", "gif")(i % 3)
          (i.toLong, ImageCodec.encodeImage(fmt, 16 + i, 12 + (i % 7)))
        } ++ (48 until 56).map(i => (i.toLong, s"not-an-image-$i".getBytes("UTF-8")))
        val df = s.createDataFrame(rows).toDF("img_id", "blob")
        val t = TableOps.newCatalog().createTable("db.images", df.schema)
        t.append(s, df)
        t.toDF(s)
          .withColumn("dec", Multimodal.decodeImage(col("blob")))
          .groupBy(coalesce(col("dec.format"), lit("undecodable")).as("format"))
          .agg(count(lit(1)).as("n"),
            coalesce(sum(col("dec.width")), lit(0)).cast("long").as("sum_width"),
            coalesce(sum(col("dec.height")), lit(0)).cast("long").as("sum_height"),
            max(col("dec.channels")).as("max_channels"))
          .orderBy("format")
      },
      """WITH imgs AS (
        |  SELECT CASE CAST(i % 3 AS INTEGER)
        |      WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'gif' END AS format,
        |    16 + i AS width, 12 + (i % 7) AS height
        |  FROM range(48) t(i))
        |SELECT format, count(*) AS n, CAST(sum(width) AS BIGINT) AS sum_width,
        |  CAST(sum(height) AS BIGINT) AS sum_height, 3 AS max_channels
        |FROM imgs GROUP BY 1
        |UNION ALL
        |SELECT 'undecodable', 8, 0, 0, CAST(NULL AS INTEGER)
        |ORDER BY 1""".stripMargin),

    // X5e: REAL feature extraction — FULL pixel decode, not just headers:
    // per-channel integer pixel sums over 30 JDK-encoded PNG/BMP gradients
    // ([[graft.operators.ImageCodec.decodeStatsRow]]; channel means =
    // sums / (w*h) in caller precision, the sums themselves exact BIGINTs).
    // The encoder gradient is a closed-form function of (x, y), so DuckDB
    // verifies the decoded sums WITHOUT any image library: it evaluates the
    // same formula over a bounded pixel grid. Lossless containers only
    // (PNG/BMP reproduce encoder pixels bit-exactly; JPEG/GIF sums are
    // codec-defined). This is the step that pays bytes-DECODED cost — the
    // honest shape of feature extraction at 100 TB; map-side, no shuffle.
    ("x_multimodal_features",
      (s: SparkSession, d: String) => {
        import graft.operators.{ImageCodec, Multimodal}
        val rows = (0 until 30).map { i =>
          val fmt = if (i % 2 == 0) "png" else "bmp"
          (i.toLong, ImageCodec.encodeImage(fmt, 16 + i, 12 + (i % 7)))
        }
        val df = s.createDataFrame(rows).toDF("img_id", "blob")
        val t = TableOps.newCatalog().createTable("db.feat_images", df.schema)
        t.append(s, df)
        t.toDF(s)
          .withColumn("dec", Multimodal.imageStats(col("blob")))
          .select(col("img_id"), col("dec.format").as("format"),
            col("dec.width").as("width"), col("dec.height").as("height"),
            col("dec.sum_r").as("sum_r"), col("dec.sum_g").as("sum_g"),
            col("dec.sum_b").as("sum_b"))
          .orderBy("img_id")
      },
      // the encoder writes rgb = ((x*31 + y*17) & 0xFF) << 8 | (x & 0xFF):
      // R = 0, G = (x*31 + y*17) mod 256, B = x mod 256 (x < 256 here)
      """WITH px AS (
        |  SELECT i,
        |    CAST(sum(CASE WHEN x < 16+i AND y < 12+(i%7)
        |      THEN (x*31 + y*17) % 256 END) AS BIGINT) AS sum_g,
        |    CAST(sum(CASE WHEN x < 16+i AND y < 12+(i%7)
        |      THEN x % 256 END) AS BIGINT) AS sum_b
        |  FROM range(30) t(i), range(46) xs(x), range(19) ys(y)
        |  GROUP BY i)
        |SELECT i AS img_id,
        |  CASE WHEN i % 2 = 0 THEN 'png' ELSE 'bmp' END AS format,
        |  CAST(16 + i AS INTEGER) AS width,
        |  CAST(12 + (i % 7) AS INTEGER) AS height,
        |  CAST(0 AS BIGINT) AS sum_r, sum_g, sum_b
        |FROM px ORDER BY 1""".stripMargin),

    // X5f: REAL resize (no stub): nearest-neighbor downscale to width 10
    // with PNG re-encode ([[graft.operators.ImageCodec.resizeRow]]).
    // Nearest-neighbor = integer pixel PICKS (target (x,y) copies source
    // (x*W/w', y*H/h') with floor division), so DuckDB verifies the
    // resized raster's exact channel sums by evaluating the same pick
    // formula over the encoder gradient — no image library, no
    // interpolation arithmetic (which is implementation-defined and was
    // why resize stayed a declared stub). roundtrip_ok re-decodes the
    // re-encoded PNG blob in the same query and proves the blob output
    // carries the identical raster (PNG is lossless). Map-side transform;
    // at 100 TB the cost is bytes-decoded, shuffle-free.
    ("x_multimodal_resize",
      (s: SparkSession, d: String) => {
        import graft.operators.{ImageCodec, Multimodal}
        val rows = (0 until 24).map { i =>
          val fmt = if (i % 2 == 0) "png" else "bmp"
          (i.toLong, ImageCodec.encodeImage(fmt, 16 + i, 12 + (i % 7)))
        }
        val df = s.createDataFrame(rows).toDF("img_id", "blob")
        val t = TableOps.newCatalog().createTable("db.resize_images", df.schema)
        t.append(s, df)
        t.toDF(s)
          .withColumn("rz", Multimodal.resizeImage(col("blob"), 10))
          .withColumn("rt", Multimodal.imageStats(col("rz.blob")))
          .select(col("img_id"),
            col("rz.width").as("width"), col("rz.height").as("height"),
            col("rz.sum_r").as("sum_r"), col("rz.sum_g").as("sum_g"),
            col("rz.sum_b").as("sum_b"),
            (col("rt.width") === col("rz.width") &&
              col("rt.height") === col("rz.height") &&
              col("rt.sum_r") === col("rz.sum_r") &&
              col("rt.sum_g") === col("rz.sum_g") &&
              col("rt.sum_b") === col("rz.sum_b")).as("roundtrip_ok"))
          .orderBy("img_id")
      },
      // source pixel (sx, sy): R = 0, G = (sx*31 + sy*17) mod 256,
      // B = sx mod 256; target (x, y) picks sx = x*W//10, sy = y*H//dh
      """WITH dims AS (
        |  SELECT i, 16 + i AS w0, 12 + (i % 7) AS h0,
        |    ((12 + (i % 7)) * 10) // (16 + i) AS dh
        |  FROM range(24) t(i)),
        |px AS (
        |  SELECT i,
        |    CAST(sum(((x * w0 // 10) * 31 + (y * h0 // dh) * 17) % 256) AS BIGINT) AS sum_g,
        |    CAST(sum((x * w0 // 10) % 256) AS BIGINT) AS sum_b
        |  FROM dims, range(10) xs(x), range(12) ys(y)
        |  WHERE y < dh
        |  GROUP BY i)
        |SELECT d.i AS img_id, CAST(10 AS INTEGER) AS width,
        |  CAST(d.dh AS INTEGER) AS height, CAST(0 AS BIGINT) AS sum_r,
        |  p.sum_g, p.sum_b, TRUE AS roundtrip_ok
        |FROM dims d JOIN px p ON d.i = p.i ORDER BY 1""".stripMargin),

    // X5g: REAL multi-frame sampling (no stub): every 2nd frame of 12
    // animated GIFs ([[graft.operators.ImageCodec.frameSampleRow]]) —
    // GIF is the multi-frame container the JDK ships a codec for, so it
    // stands in for video (seek / decode / extract / skip is the same
    // operator shape as an mp4 sampler). Frames are grayscale gradients
    // (a 256-level gray palette survives GIF palettization bit-exactly),
    // so DuckDB verifies each sampled frame's exact pixel sum in closed
    // form. explode() of the per-blob array is row-local; the per-row
    // output is bounded by frames/stride.
    ("x_multimodal_frames",
      (s: SparkSession, d: String) => {
        import graft.operators.{ImageCodec, Multimodal}
        val rows = (0 until 12).map { v =>
          (v.toLong, ImageCodec.encodeAnimatedGif(8 + v, 6 + (v % 3), 4 + (v % 5)))
        }
        val df = s.createDataFrame(rows).toDF("vid_id", "blob")
        val t = TableOps.newCatalog().createTable("db.videos", df.schema)
        t.append(s, df)
        t.toDF(s)
          .withColumn("fr", explode(Multimodal.sampleFrames(col("blob"), 2)))
          .select(col("vid_id"), col("fr.frame").as("frame"),
            col("fr.width").as("width"), col("fr.height").as("height"),
            col("fr.sum_g").as("sum_gray"))
          .orderBy("vid_id", "frame")
      },
      // frame f pixel (x, y) = (x*31 + y*17 + f*7) mod 256, gray so
      // sum_r = sum_g = sum_b; the query surfaces sum_g as sum_gray
      """WITH vids AS (
        |  SELECT v, 8 + v AS w0, 6 + (v % 3) AS h0, 4 + (v % 5) AS nf
        |  FROM range(12) t(v)),
        |fr AS (
        |  SELECT v, w0, h0, f FROM vids, range(8) fs(f)
        |  WHERE f < nf AND f % 2 = 0),
        |px AS (
        |  SELECT v, f, CAST(sum((x * 31 + y * 17 + f * 7) % 256) AS BIGINT) AS s
        |  FROM fr, range(19) xs(x), range(8) ys(y)
        |  WHERE x < w0 AND y < h0
        |  GROUP BY v, f)
        |SELECT fr.v AS vid_id, CAST(fr.f AS INTEGER) AS frame,
        |  CAST(fr.w0 AS INTEGER) AS width, CAST(fr.h0 AS INTEGER) AS height,
        |  px.s AS sum_gray
        |FROM fr JOIN px ON fr.v = px.v AND fr.f = px.f
        |ORDER BY 1, 2""".stripMargin),

    // X5d: REAL audio decode (no stub), the audio sibling of
    // x_multimodal_decode: 48 JDK-encoded WAV/AIFF/AU blobs with known
    // sample rate / channels / frame count plus 8 undecodable byte strings,
    // stored through a Graft table, then header-decoded via
    // javax.sound.sampled ([[graft.operators.AudioCodec]]) on the scan
    // side. Header-only parse — format chunk, no sample decode; the same
    // map-side metadata-extraction shape as the image path at 100 TB.
    ("x_multimodal_audio",
      (s: SparkSession, d: String) => {
        import graft.operators.{AudioCodec, Multimodal}
        val rows = (0 until 48).map { i =>
          val fmt = Seq("wav", "aiff", "au")(i % 3)
          (i.toLong, AudioCodec.encodeAudio(fmt, 8000 + i * 100, 1 + i % 2, 100 + i))
        } ++ (48 until 56).map(i => (i.toLong, s"not-audio-$i".getBytes("UTF-8")))
        val df = s.createDataFrame(rows).toDF("clip_id", "blob")
        val t = TableOps.newCatalog().createTable("db.clips", df.schema)
        t.append(s, df)
        t.toDF(s)
          .withColumn("dec", Multimodal.decodeAudio(col("blob")))
          .groupBy(coalesce(col("dec.format"), lit("undecodable")).as("format"))
          .agg(count(lit(1)).as("n"),
            coalesce(sum(col("dec.sample_rate")), lit(0)).cast("long").as("sum_rate"),
            coalesce(sum(col("dec.frames")), lit(0)).cast("long").as("sum_frames"),
            max(col("dec.channels")).as("max_channels"),
            max(col("dec.bits")).as("max_bits"))
          .orderBy("format")
      },
      // JDK extension strings: WAVE -> 'wav', AIFF -> 'aif', AU -> 'au'
      """WITH clips AS (
        |  SELECT CASE CAST(i % 3 AS INTEGER)
        |      WHEN 0 THEN 'wav' WHEN 1 THEN 'aif' ELSE 'au' END AS format,
        |    8000 + i * 100 AS rate, 100 + i AS frames, 1 + i % 2 AS channels
        |  FROM range(48) t(i))
        |SELECT format, count(*) AS n, CAST(sum(rate) AS BIGINT) AS sum_rate,
        |  CAST(sum(frames) AS BIGINT) AS sum_frames,
        |  CAST(max(channels) AS INTEGER) AS max_channels, 16 AS max_bits
        |FROM clips GROUP BY 1
        |UNION ALL
        |SELECT 'undecodable', 8, 0, 0, CAST(NULL AS INTEGER), CAST(NULL AS INTEGER)
        |ORDER BY 1""".stripMargin),

    // X5h: REAL mp3 header decode — the JDK ships no MPEG codec, but none
    // is needed for metadata: the frame header is 4 bytes of public-spec
    // bitfields (version / layer / bitrate index / sample-rate index /
    // channel mode), parsed by pure integer arithmetic
    // ([[graft.operators.MediaHeaders.decodeMp3Row]]), after skipping any
    // leading ID3v2 tag via its syncsafe length. 42 hand-assembled frames
    // sweep both version axes, all three layers, the full bitrate-index
    // range and every channel mode (every 5th blob behind an ID3 tag);
    // 8 undecodable byte strings (bad sync, free/bad bitrate index,
    // truncated ID3, empty) must all yield NULL — strict single-position
    // sync is what makes NULL a meaningful signal. DuckDB recomputes every
    // field from the same public tables in closed form: the fixture
    // parameters ARE the expected answer, so the oracle needs no codec
    // either. Map-side metadata sniff; per-blob cost is 4 bytes read.
    ("x_multimodal_mp3",
      (s: SparkSession, d: String) => {
        import graft.operators.{MediaHeaders, Multimodal}
        val rows = (0 until 42).map { i =>
          val vb = Seq(3, 2, 0)(i % 3)
          val lb = Seq(1, 1, 2, 3)(i % 4)
          val id3 = if (i % 5 == 0) 17 + i else -1
          (i.toLong, MediaHeaders.encodeMp3(vb, lb, 1 + (i % 14), (i / 3) % 3,
            i % 4, i % 2, id3))
        } ++ Seq[(Long, Array[Byte])](
          (42L, "not-mp3-42".getBytes("UTF-8")),
          (43L, "not-mp3-43".getBytes("UTF-8")),
          (44L, "not-mp3-44".getBytes("UTF-8")),
          (45L, Array(0xFF.toByte, 0x00.toByte, 0x00.toByte, 0x00.toByte)),
          (46L, MediaHeaders.encodeMp3(3, 1, 0, 0, 0, 0, -1)), // free bitrate
          (47L, MediaHeaders.encodeMp3(3, 1, 15, 0, 0, 0, -1)), // bad bitrate
          (48L, "ID3".getBytes("UTF-8") ++ Array[Byte](4, 0, 0, 0x7F, 0x7F, 0x7F, 0x7F)),
          (49L, Array.empty[Byte]))
        val df = s.createDataFrame(rows).toDF("clip_id", "blob")
        val t = TableOps.newCatalog().createTable("db.mp3_clips", df.schema)
        t.append(s, df)
        t.toDF(s)
          .withColumn("dec", Multimodal.decodeMp3(col("blob")))
          .select(col("clip_id"), col("dec.version").as("version"),
            col("dec.layer").as("layer"),
            col("dec.bitrate_kbps").as("bitrate_kbps"),
            col("dec.sample_rate").as("sample_rate"),
            col("dec.channels").as("channels"),
            col("dec.frame_bytes").as("frame_bytes"))
          .orderBy("clip_id")
      },
      // the public MPEG tables, re-stated as DuckDB lists; frame length is
      // slot arithmetic (Layer I counts 4-byte slots; Layer III halves the
      // coefficient for MPEG2/2.5)
      """WITH p AS (
        |  SELECT i, [3, 2, 0][CAST(i % 3 AS INTEGER) + 1] AS vb,
        |    [1, 1, 2, 3][CAST(i % 4 AS INTEGER) + 1] AS lb,
        |    1 + CAST(i % 14 AS INTEGER) AS br,
        |    CAST((i // 3) % 3 AS INTEGER) AS sr,
        |    CAST(i % 4 AS INTEGER) AS cm, CAST(i % 2 AS INTEGER) AS pad
        |  FROM range(42) t(i)),
        |d AS (
        |  SELECT i, vb, 4 - lb AS layer, pad,
        |    CASE vb WHEN 3 THEN 'mpeg1' WHEN 2 THEN 'mpeg2'
        |      ELSE 'mpeg2.5' END AS version,
        |    CASE WHEN vb = 3 AND lb = 3 THEN
        |        [32,64,96,128,160,192,224,256,288,320,352,384,416,448][br]
        |      WHEN vb = 3 AND lb = 2 THEN
        |        [32,48,56,64,80,96,112,128,160,192,224,256,320,384][br]
        |      WHEN vb = 3 THEN
        |        [32,40,48,56,64,80,96,112,128,160,192,224,256,320][br]
        |      WHEN lb = 3 THEN
        |        [32,48,56,64,80,96,112,128,144,160,176,192,224,256][br]
        |      ELSE [8,16,24,32,40,48,56,64,80,96,112,128,144,160][br]
        |    END AS kbps,
        |    CASE vb WHEN 3 THEN [44100,48000,32000][sr + 1]
        |      WHEN 2 THEN [22050,24000,16000][sr + 1]
        |      ELSE [11025,12000,8000][sr + 1] END AS rate,
        |    CASE WHEN cm = 3 THEN 1 ELSE 2 END AS chans
        |  FROM p)
        |SELECT i AS clip_id, version, CAST(layer AS INTEGER) AS layer,
        |  CAST(kbps AS INTEGER) AS bitrate_kbps,
        |  CAST(rate AS INTEGER) AS sample_rate,
        |  CAST(chans AS INTEGER) AS channels,
        |  CAST(CASE WHEN layer = 1 THEN (12 * kbps * 1000 // rate + pad) * 4
        |    WHEN layer = 2 THEN 144 * kbps * 1000 // rate + pad
        |    ELSE (CASE WHEN vb = 3 THEN 144 ELSE 72 END) * kbps * 1000 // rate + pad
        |  END AS INTEGER) AS frame_bytes
        |FROM d
        |UNION ALL
        |SELECT 42 + u, NULL, NULL, NULL, NULL, NULL, NULL FROM range(8) t(u)
        |ORDER BY clip_id""".stripMargin),

    // X5i: REAL mp4 header decode — again no codec needed for metadata:
    // an MP4 file is a tree of length-prefixed boxes, walked by pure byte
    // arithmetic ([[graft.operators.MediaHeaders.decodeMp4Row]]): ftyp's
    // major brand, moov/mvhd's timescale + duration, the first video-sized
    // trak/tkhd's 16.16 fixed-point dimensions, and the track count.
    // 24 hand-assembled files sweep brands, timescales, durations and
    // track layouts (none / one video / audio+video, where the 0x0 audio
    // track must be skipped for dimensions); 6 undecodable byte strings
    // (text, ftyp-only with no moov, a box whose size overruns the blob)
    // must yield NULL. Oracle is closed-form from the constructor
    // arguments — the box walk's answer IS the fixture's parameters.
    ("x_multimodal_mp4",
      (s: SparkSession, d: String) => {
        import graft.operators.{MediaHeaders, Multimodal}
        val rows = (0 until 24).map { i =>
          val brand = Seq("isom", "mp42", "avc1", "dash")(i % 4)
          val tracks = (i % 3) match {
            case 0 => Seq.empty[(Int, Int)]
            case 1 => Seq((320 + i, 240 + i))
            case _ => Seq((0, 0), (640 + i, 360 + i)) // audio track first
          }
          (i.toLong, MediaHeaders.encodeMp4(brand, 600 + 100L * i, 1200 + 750L * i, tracks))
        } ++ Seq[(Long, Array[Byte])](
          (24L, "definitely not an mp4 container".getBytes("UTF-8")),
          (25L, MediaHeaders.encodeMp4("isom", 600, 1200, Nil).take(20)), // ftyp only, no moov
          (26L, Array[Byte](0, 0, 0, 64) ++ "ftyp".getBytes("UTF-8")), // size overruns blob
          (27L, Array[Byte](0, 0, 0, 2) ++ "ftyp".getBytes("UTF-8")), // size < header
          (28L, Array.empty[Byte]),
          (29L, "x".getBytes("UTF-8")))
        val df = s.createDataFrame(rows).toDF("vid_id", "blob")
        val t = TableOps.newCatalog().createTable("db.mp4_clips", df.schema)
        t.append(s, df)
        t.toDF(s)
          .withColumn("dec", Multimodal.decodeMp4(col("blob")))
          .select(col("vid_id"), col("dec.brand").as("brand"),
            col("dec.timescale").as("timescale"),
            col("dec.duration").as("duration"),
            expr("(dec.duration * 1000) div dec.timescale").as("duration_ms"),
            col("dec.width").as("width"), col("dec.height").as("height"),
            col("dec.n_tracks").as("n_tracks"))
          .orderBy("vid_id")
      },
      """WITH p AS (
        |  SELECT i, ['isom', 'mp42', 'avc1', 'dash'][CAST(i % 4 AS INTEGER) + 1] AS brand,
        |    600 + 100 * i AS ts, 1200 + 750 * i AS dur, CAST(i % 3 AS INTEGER) AS m
        |  FROM range(24) t(i))
        |SELECT i AS vid_id, brand, CAST(ts AS BIGINT) AS timescale,
        |  CAST(dur AS BIGINT) AS duration,
        |  CAST(dur * 1000 // ts AS BIGINT) AS duration_ms,
        |  CAST(CASE m WHEN 1 THEN 320 + i WHEN 2 THEN 640 + i END AS INTEGER) AS width,
        |  CAST(CASE m WHEN 1 THEN 240 + i WHEN 2 THEN 360 + i END AS INTEGER) AS height,
        |  CAST(m AS INTEGER) AS n_tracks
        |FROM p
        |UNION ALL
        |SELECT 24 + u, NULL, NULL, NULL, NULL, NULL, NULL, NULL FROM range(6) t(u)
        |ORDER BY vid_id""".stripMargin),

    // X4f: PII SCRUB — the redaction pass every training-data pipeline runs
    // before release: emails / phone-shaped numbers / IPv4 literals found by
    // regex are replaced with typed tokens, and the job reports per-language
    // redaction counts for audit. Pure row-local regexp_replace +
    // regexp_count (codegen'd, no UDF): at 100 TB this is a map-only pass —
    // no shuffle of the text, the only exchange is the final tiny per-lang
    // rollup. The corpus carries no natural PII, so the fixture plants a
    // deterministic email/phone/IP on doc_id multiples of 3/5/7 (both
    // engines derive the same plant from doc_id — no data movement).
    // Patterns stay in the RE2-compatible subset (char classes, bounded
    // quantifiers, \b) so Spark (java.util.regex) and DuckDB (RE2) agree.
    ("x_pii_scrub",
      (s: SparkSession, d: String) => {
        val emailPat = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
        val phonePat = """\b\d{3}-\d{4}\b"""
        val ipPat = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""
        val planted = Tables.documents(s, d)
          .withColumn("text2", concat(col("text"),
            when(col("doc_id") % 3 === 0,
              concat(lit(" contact user"), col("doc_id").cast("string"), lit("@example.com")))
              .otherwise(lit("")),
            when(col("doc_id") % 5 === 0,
              concat(lit(" call 555-"),
                lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
              .otherwise(lit("")),
            when(col("doc_id") % 7 === 0,
              concat(lit(" host 10.0."), (col("doc_id") % 256).cast("string"),
                lit("."), ((col("doc_id") * 7) % 256).cast("string")))
              .otherwise(lit(""))))
        planted
          .withColumn("scrubbed",
            regexp_replace(regexp_replace(regexp_replace(col("text2"),
              emailPat, "[EMAIL]"), phonePat, "[PHONE]"), ipPat, "[IP]"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            count(when(col("scrubbed") =!= col("text2"), 1)).as("docs_redacted"),
            sum(regexp_count(col("text2"), lit(emailPat))).cast("long").as("n_emails"),
            sum(regexp_count(col("text2"), lit(phonePat))).cast("long").as("n_phones"),
            sum(regexp_count(col("text2"), lit(ipPat))).cast("long").as("n_ips"),
            sum(length(col("text2")) - length(col("scrubbed"))).cast("long").as("len_delta"))
          .orderBy("lang")
      },
      """WITH planted AS (
        |  SELECT lang, text
        |    || CASE WHEN doc_id % 3 = 0
        |         THEN ' contact user' || doc_id || '@example.com' ELSE '' END
        |    || CASE WHEN doc_id % 5 = 0
        |         THEN ' call 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |    || CASE WHEN doc_id % 7 = 0
        |         THEN ' host 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256) ELSE '' END
        |    AS text2
        |  FROM documents),
        |scrub AS (
        |  SELECT lang, text2,
        |    regexp_replace(regexp_replace(regexp_replace(text2,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |      '\b\d{3}-\d{4}\b', '[PHONE]', 'g'),
        |      '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g') AS scrubbed
        |  FROM planted)
        |SELECT lang, count(*) AS n_docs,
        |  count(CASE WHEN scrubbed <> text2 THEN 1 END) AS docs_redacted,
        |  CAST(sum(len(regexp_extract_all(text2,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) AS n_emails,
        |  CAST(sum(len(regexp_extract_all(text2, '\b\d{3}-\d{4}\b'))) AS BIGINT) AS n_phones,
        |  CAST(sum(len(regexp_extract_all(text2,
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))) AS BIGINT) AS n_ips,
        |  CAST(sum(len(text2) - len(scrubbed)) AS BIGINT) AS len_delta
        |FROM scrub GROUP BY 1 ORDER BY 1""".stripMargin),

    // X4g: DETERMINISTIC CORPUS SHUFFLE — training-order randomization
    // without a global sort. shard = first md5 hex char of (seed, doc_id)
    // (16 shards), within-shard order = the full hash: both are pure row
    // functions, so the shuffle is reproducible across engines, runs,
    // repartitions and late-arriving files, with ZERO coordination. The
    // 100 TB write path is repartition(shard).sortWithinPartitions(hash) —
    // a single hash exchange + local sort per shard, never a global
    // ORDER BY rand(); this gate proves the assignment + ordering contract
    // via per-shard stats and the arg-min/arg-max docs of each shard's
    // hash order (only tiny projected columns move, not text).
    ("x_corpus_shuffle",
      (s: SparkSession, d: String) => {
        val h = md5(concat(lit("epoch1:"), col("doc_id").cast("string")))
        Tables.documents(s, d)
          .withColumn("h", h)
          .withColumn("shard", substring(col("h"), 1, 1))
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("lang")).as("n_langs"),
            sum(col("n_chars")).cast("long").as("sum_chars"),
            min_by(col("doc_id"), col("h")).as("first_doc"),
            max_by(col("doc_id"), col("h")).as("last_doc"))
          .orderBy("shard")
      },
      """SELECT substr(md5('epoch1:' || doc_id), 1, 1) AS shard,
        |  count(*) AS n_docs, count(DISTINCT lang) AS n_langs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  arg_min(doc_id, md5('epoch1:' || doc_id)) AS first_doc,
        |  arg_max(doc_id, md5('epoch1:' || doc_id)) AS last_doc
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),

    // X4: deterministic train/val/test split — the assignment is a pure
    // function of doc_id (first md5 hex byte: <0xcc train ~80%, <0xe6 val
    // ~10%, else test), so it is stable across engines, runs, repartitions
    // and incremental arrivals: a re-run or a late batch lands every doc in
    // the same split with no coordination. Embarrassingly parallel (one
    // projection + one map-side-combined agg); no shuffle of the text.
    ("x_train_split",
      (s: SparkSession, d: String) => {
        val bucket = substring(md5(col("doc_id").cast("string")), 1, 2)
        Tables.documents(s, d)
          .withColumn("split",
            when(bucket < "cc", "train").when(bucket < "e6", "val").otherwise("test"))
          .groupBy(col("split"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("doc_id")).as("n_unique"),
            sum(col("n_chars")).as("sum_chars"),
            countDistinct(col("lang")).as("n_langs"))
          .orderBy(col("split"))
      },
      """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 'train'
        |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |            ELSE 'test' END AS split,
        |  count(*) AS n_docs, count(DISTINCT doc_id) AS n_unique,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars, count(DISTINCT lang) AS n_langs
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin),

    // X4c: SEQUENCE PACKING — group consecutive documents into fixed
    // token-budget training sequences (the "pack to 2048 tokens" step
    // before tokenizer sharding). Deterministic: docs ordered by doc_id
    // WITHIN a (lang, md5-subshard) shard, running token total, a doc's
    // sequence is the budget bin its span starts in. The window is
    // partitioned per shard, never global — per-shard sequential packing
    // is the 100 TB shape (a single global ordering would serialize the
    // world through one task), and the md5 subshard keeps parallelism
    // ~16x above the language cardinality while staying a pure function
    // of the row (same packing on any re-run, reproducible in the oracle).
    ("x_pack_sequences",
      (s: SparkSession, d: String) => {
        val shard = substring(md5(col("doc_id").cast("string")), 5, 1)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang", "shard").orderBy("doc_id")
        Tables.documents(s, d)
          .withColumn("shard", shard)
          .withColumn("n_tok", size(TF.tokens(col("text"))).cast("long"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          .withColumn("seq_id", floor((col("cum") - col("n_tok")) / lit(256.0)))
          .groupBy(col("lang"), col("shard"), col("seq_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tokens"))
          .orderBy(col("lang"), col("shard"), col("seq_id"))
      },
      s"""WITH c AS (
        |  SELECT lang, substr(md5(CAST(doc_id AS VARCHAR)), 5, 1) AS shard,
        |    doc_id, CAST(len($toksSql) AS BIGINT) AS n_tok,
        |    sum(CAST(len($toksSql) AS BIGINT))
        |      OVER (PARTITION BY lang, substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)
        |            ORDER BY doc_id) AS cum
        |  FROM documents)
        |SELECT lang, shard, CAST(floor((cum - n_tok) / 256.0) AS BIGINT) AS seq_id,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS sum_tokens
        |FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin),

    // X4h: DOMAIN MIXING — the pretraining-mixture step: given per-source
    // target weights and a token budget (n_chars as the proxy), derive
    // per-source keep RATES (rate = weight-share of budget / source size,
    // capped at 1) and materialize the mixture with the same md5-threshold
    // row function the sampler uses. Planted weights derive from the source
    // name (1 + idx%5). Everything is integer arithmetic end-to-end — the
    // keep threshold is a 16-bit integer computed with BIGINT div, and the
    // row hash is the md5 prefix parsed as an integer — so both engines
    // make bit-identical keep decisions (no float rate ever exists). At
    // scale: per-source totals are a tiny agg (rows = #sources) broadcast
    // back onto the corpus; the mixture pass itself is map-only. (At
    // 100 TB-scale char counts, rescale the 65536 granularity factor so
    // w*total*2^16 stays under 2^63 — the shape is unchanged.)
    ("x_domain_mix",
      (s: SparkSession, d: String) => {
        // weight parse is guarded the SAME way on both engines: a source
        // not shaped 'srcN' falls back to ordinal 0 (weight 1) — the bare
        // substring cast made Spark silently NULL the source out of the
        // mixture while DuckDB hard-errored on the identical input
        val docs = Tables.documents(s, d)
          .withColumn("w",
            (lit(1) + coalesce(
              nullif(regexp_extract(col("source"), "^src(\\d+)$", 1), lit(""))
                .cast("int"), lit(0)) % 5).cast("long"))
        val bySrc = docs.groupBy("source", "w")
          .agg(sum(col("n_chars")).cast("long").as("chars_s"))
        val tot = docs.agg(sum(col("n_chars")).cast("long").as("total_chars"))
        val rates = bySrc.crossJoin(tot) // budget = total/2, weight sum = 60
          .withColumn("t",
            expr("least(CAST(65536 AS BIGINT), (w * total_chars * 65536) div (120 * chars_s))"))
        docs
          .join(broadcast(rates.select("source", "t")), "source")
          .filter(conv(substring(md5(col("doc_id").cast("string")), 7, 4),
            16, 10).cast("long") < col("t"))
          .groupBy("source")
          .agg(max(col("t")).as("mix_threshold"),
            count(lit(1)).as("n_kept"),
            sum(col("n_chars")).cast("long").as("chars_kept"))
          .orderBy("source")
      },
      """WITH s AS (
        |  SELECT source, CAST(1 + COALESCE(
        |      TRY_CAST(regexp_extract(source, '^src(\d+)$', 1) AS INTEGER), 0) % 5
        |    AS BIGINT) AS w,
        |    CAST(sum(n_chars) AS BIGINT) AS chars_s
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total_chars FROM documents),
        |r AS (
        |  SELECT source, least(CAST(65536 AS BIGINT),
        |    (w * total_chars * 65536) // (120 * chars_s)) AS t
        |  FROM s, tot),
        |kept AS (
        |  SELECT d.source, d.n_chars, r.t
        |  FROM documents d JOIN r USING (source)
        |  WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 7, 4))::BIGINT < r.t)
        |SELECT source, CAST(max(t) AS BIGINT) AS mix_threshold, count(*) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS chars_kept
        |FROM kept GROUP BY 1 ORDER BY 1""".stripMargin),

    // X4d: deterministic STRATIFIED SAMPLING — per-stratum (lang) keep
    // rates applied via an md5(doc_id)-prefix threshold: a pure function
    // of the row, so the sample is stable across runs, repartitions and
    // late-arriving batches, composes independently with the train/val/
    // test split (disjoint hash offsets), and needs zero shuffles or
    // sampling state — the only shape that reproduces on a 100 TB re-run.
    ("x_stratified_sample",
      (s: SparkSession, d: String) => {
        val bucket = substring(md5(col("doc_id").cast("string")), 3, 2)
        Tables.documents(s, d)
          .filter(when(col("lang") === "en", bucket < "40").otherwise(bucket < "80"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("lang"))
      },
      """SELECT lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 3, 2) <
        |  CASE WHEN lang = 'en' THEN '40' ELSE '80' END
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // X4f: REPETITION rate — the intra-document duplicate-token signal the
    // Gopher-style quality filters threshold on. Per-doc ratio is a pure
    // row function; the per-lang rate aggregates INTEGER token counts and
    // divides once (never an avg over per-doc doubles, whose float sum is
    // partition-order-dependent and would break cross-engine parity).
    ("x_repetition",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
          .withColumn("n_tok", size(TF.tokens(col("text"))).cast("long"))
          .withColumn("n_dup",
            (col("n_tok") - size(array_distinct(TF.tokens(col("text"))))).cast("long"))
        docs.groupBy(col("lang"))
          .agg((sum(col("n_dup")).cast("double") / sum(col("n_tok")).cast("double"))
              .as("dup_rate"),
            sum(when(col("n_dup").cast("double") / col("n_tok") > 0.2, 1L)
              .otherwise(0L)).as("n_repetitive"))
          .orderBy(col("lang"))
      },
      s"""WITH t AS (
        |  SELECT lang, CAST(len(toks) AS BIGINT) AS n,
        |    CAST(len(toks) - len(list_distinct(toks)) AS BIGINT) AS dup
        |  FROM (SELECT lang, $toksSql AS toks FROM documents))
        |SELECT lang, CAST(sum(dup) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS dup_rate,
        |  CAST(sum(CASE WHEN CAST(dup AS DOUBLE) / n > 0.2 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_repetitive
        |FROM t GROUP BY 1 ORDER BY 1""".stripMargin),

    // X4e: DECONTAMINATION — drop training documents sharing any 3-gram
    // with the held-out eval set (the standard benchmark-leak check before
    // a training run). The eval side is small by construction (benchmarks
    // are MB-scale against a TB-scale corpus), so its distinct gram set
    // BROADCASTS and the train corpus streams through one probe + anti-join
    // — no shuffle of text, no all-pairs anything; same plan at 100 TB.
    ("x_decontaminate",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val evalGrams = docs.filter(col("doc_id") % 97 === 0)
          .select(explode(TF.shingles(col("text"), 3)).as("gram")).distinct()
        val train = docs.filter(col("doc_id") % 97 =!= 0)
        val contaminated = train
          .select(col("doc_id"), explode(TF.shingles(col("text"), 3)).as("gram"))
          .join(broadcast(evalGrams), "gram")
          .select("doc_id").distinct()
        train.join(contaminated, Seq("doc_id"), "left_anti")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_clean"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("lang"))
      },
      s"""WITH toked AS (
        |  SELECT doc_id, lang, n_chars, $toksSql AS t FROM documents),
        |grams AS (
        |  SELECT doc_id, lang, n_chars,
        |    CASE WHEN len(t) < 3 THEN [] ELSE list_transform(
        |      generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) END AS sh
        |  FROM toked),
        |ev AS (SELECT DISTINCT unnest(sh) AS gram FROM grams WHERE doc_id % 97 = 0),
        |bad AS (
        |  SELECT DISTINCT doc_id
        |  FROM (SELECT doc_id, unnest(sh) AS gram FROM grams WHERE doc_id % 97 <> 0) tr
        |  JOIN ev USING (gram))
        |SELECT g.lang, count(*) AS n_clean, CAST(sum(g.n_chars) AS BIGINT) AS sum_chars
        |FROM grams g LEFT JOIN bad b ON g.doc_id = b.doc_id
        |WHERE g.doc_id % 97 <> 0 AND b.doc_id IS NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // X2g: near-dup candidates verified by EDIT DISTANCE instead of set
    // Jaccard — the complementary metric: Jaccard is order-blind (a
    // shuffled copy scores 1.0), levenshtein is order-sensitive, so this is
    // the verifier that distinguishes re-ordered boilerplate from true
    // near-copies. Candidates come from the SAME minhash bucket generator
    // as the Jaccard family (one candidate discipline, two verifiers); the
    // DP runs only on the broadcast-matched pairs. Threshold in pure
    // integers: dist/max_len <= 0.4 as 5*dist <= 2*max_len.
    // GATE CONTRACT — ASCII corpus only: Spark's levenshtein counts
    // CODEPOINT edits, DuckDB's counts BYTE edits, so the oracle (not the
    // operator) diverges on multi-byte text; the spec pins the fixture's
    // ASCII-ness so any future corpus change fails loudly, not silently.
    // The oracle is also a PLAIN sig self-join (no bucket cap): sound only
    // while every fixture sig bucket stays under graft.neardup.max-bucket
    // — pinned by BucketCapSpec's fixture-occupancy canary.
    ("x_neardup_edit",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        pairEditDistance(docs, neardupCandidatePairs(docs))
          .withColumn("max_len", greatest(length(col("text_a")), length(col("text_b"))))
          .filter(col("edit_dist") * 5 <= col("max_len") * 2)
          .select(col("doc_a"), col("doc_b"), col("edit_dist").cast("long").as("edit_dist"),
            col("max_len").cast("long").as("max_len"))
          .orderBy("doc_a", "doc_b")
      },
      s"""WITH toks AS (
        |  SELECT doc_id, text, $toksSql AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, text, list_distinct(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS sh
        |  FROM toks),
        |sigs AS (
        |  SELECT doc_id, text, COALESCE(md5(
        |    list_min(list_transform(sh, x -> substring(md5(x), 1, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x), 9, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x), 17, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x), 25, 8)))),
        |    'empty:' || CAST(doc_id AS VARCHAR)) AS sig
        |  FROM sh)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist,
        |  CAST(greatest(len(a.text), len(b.text)) AS BIGINT) AS max_len
        |FROM sigs a JOIN sigs b ON a.sig = b.sig AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.text, b.text) * 5 <= greatest(len(a.text), len(b.text)) * 2
        |ORDER BY 1, 2""".stripMargin),

    // X4i: cross-document duplicated-n-gram fraction (the Gopher/C4
    // "fraction of characters in duplicated n-grams" quality signal, at
    // 5-gram granularity): for each doc, the share of its DISTINCT 5-token
    // shingles that appear in any OTHER doc's shingle set. Exact-copy docs
    // score 1.0, templated docs score high, organic docs near 0 — the
    // corpus-level boilerplate detector that per-doc repetition (x_repetition)
    // cannot see. Plan: one shingle-keyed agg builds the document-frequency
    // table, then the probe side joins back on the shingle. The exploded
    // (doc_id, gram) stream is PINNED once (localCheckpoint — the
    // containmentNomination discipline): the interpreted md5-free but
    // still HOF-heavy tokenize+shingle expression is the dominant cost,
    // and without the pin it evaluates on BOTH the df aggregate and the
    // probe side (measured 3.8 -> 3.0 s at sf0.1; the pinned stream is
    // shuffle-format compact). One final doc-keyed agg.
    // Integer counts + ONE double division, so the oracle matches
    // bit-exactly. At 100 TB the df>=2 set is the boilerplate set — small
    // by nature; AQE broadcasts it under the threshold, and the fallback
    // is a plain hash join on the shingle (the x_decontaminate probe
    // shape), never all-pairs.
    ("x_boilerplate_ngrams",
      (s: SparkSession, d: String) => {
        val sh = Tables.documents(s, d)
          .select(col("doc_id"), explode(array_distinct(TF.shingles(col("text"), 5))).as("g"))
          .localCheckpoint()
        val shared = sh.groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 2).select(col("g"), lit(1L).as("is_shared"))
        sh.join(shared, Seq("g"), "left")
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_shingles"),
            sum(coalesce(col("is_shared"), lit(0L))).as("n_shared"))
          .withColumn("dup_frac", col("n_shared").cast("double") / col("n_shingles"))
          .filter(col("dup_frac") >= 0.5)
          .orderBy("doc_id")
      },
      s"""WITH toks AS (
        |  SELECT doc_id, $toksSql AS t FROM documents),
        |sh AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(t) - 4),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))) AS g
        |  FROM toks),
        |df AS (SELECT g, count(*) AS df FROM sh GROUP BY 1),
        |scored AS (
        |  SELECT doc_id, count(*) AS n_shingles,
        |    CAST(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared
        |  FROM sh JOIN df USING (g) GROUP BY 1)
        |SELECT doc_id, n_shingles, n_shared,
        |  CAST(n_shared AS DOUBLE) / n_shingles AS dup_frac
        |FROM scored
        |WHERE CAST(n_shared AS DOUBLE) / n_shingles >= 0.5
        |ORDER BY doc_id""".stripMargin),

    // X4j: TF-IDF term scoring — the classic two-aggregate shape: term
    // frequency per (doc, term), document frequency per term, score =
    // tf · (N/df). The idf is the RAW inverse document frequency (no log):
    // tf·N is exact BIGINT, the single double division is IEEE-identical in
    // both engines — whereas ln() is correctly-rounded in neither, so a
    // log-idf oracle would hash-diverge in the last bit. Plan: explode →
    // two-phase hash agg (map-side combine carries (term,count) partials,
    // never raw tokens), df from the already-distinct tf pairs (no second
    // pass over the corpus), corpus size broadcast as a 1-row join. Top-k
    // via TakeOrderedAndProject — no global sort at any scale.
    ("x_tfidf",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val tf = docs.select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
          .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        // tf cast to double BEFORE the multiply: a BIGINT tf·N product has
        // an overflow cliff at extreme corpus sizes (an ANSI-mode abort);
        // double·long → double is the same IEEE operation sequence in both
        // engines at any scale, no cliff
        tf.join(df_, "term").crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            (col("tf").cast("double") * col("n_docs") / col("df")).as("tfidf"))
          .orderBy(col("tfidf").desc, col("term"), col("doc_id"))
          .limit(15)
      },
      s"""WITH terms AS (
        |  SELECT doc_id, unnest($toksSql) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents)
        |SELECT doc_id, term, tf, df,
        |  CAST(tf AS DOUBLE) * n_docs / df AS tfidf
        |FROM tf JOIN df USING (term) CROSS JOIN n
        |ORDER BY 5 DESC, 2, 1 LIMIT 15""".stripMargin),

    // X4k: heavy hitters by SAMPLE-THEN-VERIFY — the two-pass frequent-items
    // shape for streams whose full vocabulary is too wide to aggregate:
    // pass 1 aggregates only a deterministic 1/16 occurrence sample (md5 of
    // doc:pos:token — occurrence-level, so a token's sample count tracks its
    // frequency; sampling on the token alone would be all-or-nothing),
    // candidacy bar = ≥ 1/128 of the sampled stream — HALF the 1/64 report
    // bar, so a frequent token whose deterministic sample under-represents
    // it by up to 2x still reaches the exact pass (the standard
    // sample-then-verify discipline: the sample only nominates, the exact
    // counts decide; extras cost one probe row each). Pass 2 counts ONLY
    // the candidates exactly (broadcast semi-join probe — agg state is
    // |candidates|, not |vocab|) and applies the real ≥ 1/64 support test
    // against the exact total (computed generator-free as sum of per-doc
    // token counts — no third explode pass). At 100 TB this replaces a
    // full-vocabulary groupBy (whose map-side combine state IS the
    // vocabulary) with a sampled agg + a bounded exact pass — the
    // deterministic, oracle-reproducible stand-in for Misra-Gries (whose
    // state is merge-order-dependent and therefore unverifiable across
    // engines). Both engines make identical sample decisions, so
    // candidates — and thus the output — match bit-exactly.
    ("x_heavy_hitters",
      (s: SparkSession, d: String) => heavyHitters(Tables.documents(s, d)),
      s"""WITH toks AS (
        |  SELECT doc_id, $toksSql AS t FROM documents),
        |occ AS (
        |  SELECT doc_id, i, t[i] AS token
        |  FROM toks, unnest(generate_series(1, len(t))) AS u(i)),
        |samp AS (
        |  SELECT token, count(*) AS sc FROM occ
        |  WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR) || ':' || token), 1, 1) = '0'
        |  GROUP BY 1),
        |cand AS (
        |  SELECT token FROM samp, (SELECT SUM(sc) AS ts FROM samp)
        |  WHERE sc * 128 >= ts),
        |exact AS (
        |  SELECT token, count(*) AS freq
        |  FROM occ JOIN cand USING (token) GROUP BY 1)
        |SELECT token, freq, CAST(freq AS DOUBLE) / total AS share
        |FROM exact, (SELECT CAST(SUM(len(t)) AS BIGINT) AS total FROM toks)
        |WHERE freq * 64 >= total
        |ORDER BY 2 DESC, 1""".stripMargin),

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

    // X2h: SEMANTIC dedup (the SemDeDup shape) — duplicate CLUSTERS at the
    // embedding level: sign-LSH cells nominate candidates (capped by the
    // same boundedBucketPairs discipline as the text family — never
    // all-pairs), exact cosine ≥ 0.99 verifies (planted clones at 1.0 vs
    // corpus max ~0.5 — the float threshold sits in a chasm, so both
    // engines make identical edge decisions), and connected components
    // resolve transitive groups to (cluster, size, keep_id). The oracle
    // recomputes components from BRUTE-FORCE pairs via a recursive CTE —
    // agreement additionally proves the LSH cells lost no true pair.
    ("x_semantic_dedup",
      (s: SparkSession, d: String) => {
        // 16-bit cells (65k), not the 8-bit default: LSH cells are NOT
        // equivalence classes, so unlike minhash sig buckets their occupancy
        // grows linearly with the corpus — 256 cells saturate around ~65k
        // vectors and boundedBucketPairs' sub-bucket split would then drop
        // true clone pairs the brute-force oracle keeps. Identical vectors
        // share any sign-cell, so widening cells never loses a planted pair.
        val corpus = plantedEmbeddingCorpus(Tables.embeddings(s, d))
          .withColumn("bucket", VF.lshBucket(col("embedding"), bits = 16))
        val pairs = boundedBucketPairs(
          corpus.groupBy("bucket").agg(collect_list(col("vec_id")).as("members")))
        val withA = corpus.select(col("vec_id").as("doc_a"), col("embedding").as("emb_a"))
          .join(broadcast(pairs), "doc_a")
        // Spark orders NaN above every real number, so a NaN cosine (a
        // NaN-lane vector pair) would PASS >= 0.99 here while the oracle's
        // NOT isnan drops it — nanvl folds NaN into NULL (null >= 0.99 is
        // null → dropped) in ONE cosine evaluation; a separate isnan
        // predicate would re-run the O(d) fold per inlined reference
        val edges = corpus.select(col("vec_id").as("doc_b"), col("embedding").as("emb_b"))
          .join(broadcast(withA), "doc_b")
          .filter(nanvl(VF.cosineSimilarity(col("emb_a"), col("emb_b")), lit(null)) >= 0.99)
          .select(col("doc_a").as("src"), col("doc_b").as("dst"))
        // cluster_rep IS the keep-id (min-label CC converges every label to
        // the component minimum); max(doc_id) surfaces an independent value
        connectedComponents(edges)
          .groupBy(col("label").as("cluster_rep"))
          .agg(count(lit(1)).as("n_members"), max(col("doc_id")).as("max_member"))
          .orderBy("cluster_rep")
      },
      """WITH RECURSIVE corpus AS (
        |  SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id % 10 = 0),
        |pairs AS (
        |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
        |  WHERE NOT isnan(list_cosine_similarity(a.embedding, b.embedding))
        |    AND list_cosine_similarity(a.embedding, b.embedding) >= 0.99),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION ALL SELECT doc_b, doc_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT DISTINCT src, src FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
        |labels AS (
        |  SELECT src AS doc_id, min(dst) AS label FROM reach GROUP BY 1)
        |SELECT label AS cluster_rep, count(*) AS n_members, max(doc_id) AS max_member
        |FROM labels GROUP BY 1 ORDER BY 1""".stripMargin),

    // X4l: corpus profile — the summary card every pipeline run starts and
    // ends with (the "describe corpus" of training data): per-language doc
    // counts, token totals, EXACT distinct vocabulary (two-phase distinct —
    // at 100 TB swap in the KMV sketch gate's estimator; here the exact
    // count is itself the oracle), char totals and token-length extremes.
    // All integers + single divisions; one pass over the corpus plus the
    // distinct-vocabulary aggregation.
    ("x_corpus_profile",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
          .withColumn("n_tokens", TF.tokenCount(col("text")))
        val perLang = docs.groupBy("lang")
          .agg(count(lit(1)).as("docs"),
            sum(col("n_tokens")).as("tokens"),
            sum(col("n_chars")).cast("long").as("chars"),
            min(col("n_tokens")).as("min_tokens"),
            max(col("n_tokens")).as("max_tokens"),
            // guarded division: a language whose docs ALL tokenize to zero
            // tokens divides by 0 — Spark (non-ANSI) yields NULL but
            // DuckDB's IEEE mode yields Infinity; the when(...) / NULLIF
            // pair makes both engines emit NULL for that corpus shape
            when(sum(col("n_tokens")) > 0,
              sum(col("n_chars")).cast("double") / sum(col("n_tokens")))
              .as("chars_per_token"))
        val vocab = docs
          .select(col("lang"), explode(TF.tokens(col("text"))).as("tok"))
          .groupBy("lang").agg(countDistinct(col("tok")).as("vocab"))
        // LEFT join: a language whose docs are all token-less has no vocab
        // group, and an inner join would silently erase the language from
        // its own profile — vocabulary 0 is the truthful summary
        perLang.join(vocab, Seq("lang"), "left")
          .withColumn("vocab", coalesce(col("vocab"), lit(0L)))
          .orderBy("lang")
      },
      s"""WITH toked AS (
        |  SELECT lang, n_chars, len($toksSql) AS n_tokens, $toksSql AS t
        |  FROM documents),
        |agg AS (
        |  SELECT lang, count(*) AS docs,
        |    CAST(SUM(n_tokens) AS BIGINT) AS tokens,
        |    CAST(SUM(n_chars) AS BIGINT) AS chars,
        |    CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
        |    CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
        |    CAST(SUM(n_chars) AS DOUBLE) / NULLIF(SUM(n_tokens), 0) AS chars_per_token
        |  FROM toked GROUP BY 1),
        |vocab AS (
        |  SELECT lang, count(DISTINCT tok) AS vocab
        |  FROM (SELECT lang, unnest(t) AS tok FROM toked) GROUP BY 1)
        |SELECT a.*, COALESCE(v.vocab, 0) AS vocab
        |FROM agg a LEFT JOIN vocab v USING (lang) ORDER BY a.lang""".stripMargin),

    // X4m: document CHUNKING — overlapping token windows (W=32, stride=24,
    // overlap 8), the unit-of-embedding prep for retrieval/RAG pipelines
    // and long-document training: row-local window arithmetic (one
    // generator per doc, no shuffle — the map-only shape at any scale),
    // every token covered by >= 1 window, the last window short rather
    // than dropped. Chunk text leaves as an md5 fingerprint (the gate
    // checks identity, not payload); start positions are pure integer
    // arithmetic so both engines cut identical windows.
    ("x_chunk_windows",
      (s: SparkSession, d: String) => {
        val W = 32; val S = 24
        Tables.documents(s, d).filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), TF.tokens(col("text")).as("t"))
          .filter(size(col("t")) > 0)
          .select(col("doc_id"), col("t"),
            posexplode(sequence(lit(1), greatest(lit(1), size(col("t")) - (W - S)), lit(S)))
              .as(Seq("chunk_index", "start")))
          .select(col("doc_id"), col("chunk_index").cast("long").as("chunk_index"),
            size(slice(col("t"), col("start"), lit(W))).cast("long").as("chunk_tokens"),
            md5(array_join(slice(col("t"), col("start"), lit(W)), " ")).as("chunk_md5"))
          .orderBy("doc_id", "chunk_index")
      },
      s"""WITH toks AS (
        |  SELECT doc_id, $toksSql AS t FROM documents
        |  WHERE doc_id % 7 = 0),
        |starts AS (
        |  SELECT doc_id, t, (s - 1) // 24 AS k, s AS start
        |  FROM toks, unnest(generate_series(1, greatest(1, len(t) - 8), 24)) AS u(s)
        |  WHERE len(t) > 0)
        |SELECT doc_id, CAST(k AS BIGINT) AS chunk_index,
        |  CAST(len(t[start : start + 31]) AS BIGINT) AS chunk_tokens,
        |  md5(array_to_string(t[start : start + 31], ' ')) AS chunk_md5
        |FROM starts ORDER BY 1, 2""".stripMargin),

    // X1d: SUB-DOCUMENT (chunk-level) exact dedup — the C4/RefinedWeb
    // line-level dedup shape the doc-level family cannot express: repeated
    // boilerplate units are removed corpus-wide (keep-FIRST occurrence by
    // (doc_id, chunk_index)) while their host documents survive with the
    // rest of their content — doc-level dedup either keeps the boilerplate
    // (docs differ) or drops whole documents. Fixture plants both shapes
    // in-query: a shared boilerplate tail appended to every 5th doc
    // (cross-doc repeated chunks) and full re-crawls (+500000 for every
    // 20th doc — every chunk a dup). Non-overlapping 16-token chunks, key
    // = md5 of the chunk text; keep-first is TWO narrow aggregates (min
    // doc per hash, then min chunk within that doc — mirrored exactly, no
    // composite-key encoding with an overflow cliff) + a hash-keyed probe
    // join. Chunk text never travels: the exploded stream carries (hash,
    // 16-token count) only, and the stream is PINNED once (read by the
    // first-occurrence aggregate AND the probe). At 100 TB the first-
    // occurrence table is the durable state — persist it exactly like
    // x_incremental_dedup's fingerprints for incremental crawls. Output:
    // per-language kept/total chunk+token accounting and the dup-chunk
    // rate (one mirrored division).
    ("x_chunk_dedup",
      (s: SparkSession, d: String) => {
        val boiler = " subscribe to our newsletter all rights reserved contact us privacy policy terms of service cookie notice"
        val docs0 = Tables.documents(s, d).select("doc_id", "lang", "text")
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(boiler))).otherwise(col("text")))
        val corpus = docs0.unionByName(docs0.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 500000L).as("doc_id"), col("lang"), col("text")))
        chunkDedupStats(corpus).orderBy("lang")
      },
      """WITH docs0 AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 5 = 0 THEN text ||
        |      ' subscribe to our newsletter all rights reserved contact us privacy policy terms of service cookie notice'
        |    ELSE text END AS text
        |  FROM documents),
        |corpus AS (
        |  SELECT doc_id, lang, text FROM docs0
        |  UNION ALL
        |  SELECT doc_id + 500000, lang, text FROM docs0 WHERE doc_id % 20 = 0),
        |toked AS (
        |  SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |  FROM corpus),
        |chunks AS (
        |  SELECT doc_id, lang, (s - 1) // 16 AS ci,
        |    CAST(len(t[s : s + 15]) AS BIGINT) AS n_tok,
        |    md5(array_to_string(t[s : s + 15], ' ')) AS h
        |  FROM (SELECT * FROM toked WHERE len(t) > 0),
        |    unnest(generate_series(1, len(t), 16)) AS u(s)),
        |fdoc AS (SELECT h, min(doc_id) AS f_doc FROM chunks GROUP BY 1),
        |fci AS (
        |  SELECT c.h, f.f_doc, min(c.ci) AS f_ci
        |  FROM chunks c JOIN fdoc f ON c.h = f.h AND c.doc_id = f.f_doc
        |  GROUP BY 1, 2),
        |marked AS (
        |  SELECT c.lang, c.doc_id, c.n_tok,
        |    (c.doc_id = f.f_doc AND c.ci = f.f_ci) AS keep
        |  FROM chunks c JOIN fci f ON c.h = f.h)
        |SELECT lang, count(DISTINCT doc_id) AS docs, count(*) AS chunks,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
        |  CAST(sum(n_tok) AS BIGINT) AS tokens,
        |  CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
        |  1.0 - CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS dup_chunk_rate
        |FROM marked GROUP BY 1 ORDER BY 1""".stripMargin),

    // X1e: INCREMENTAL chunk-level dedup — x_chunk_dedup's first-occurrence
    // state made DURABLE, as that gate's own comment promises (r10 verdict
    // #3): the (chunk_md5, f_doc, f_ci) keep-first table persists as a
    // hash-bucketed Graft table between crawl batches, exactly like the
    // doc-level fingerprint state one level up. A crawl batch PROBES the
    // state by anti-join on the chunk hash (a seen hash can never be kept
    // again — boilerplate planted in history stays dead in every future
    // crawl), runs keep-first WITHIN the batch over the unseen hashes
    // (the same two narrow aggregates as x_chunk_dedup — min doc per
    // hash, min chunk within that doc), and APPENDS the batch's
    // first-occurrences so the next crawl sees them as history. The
    // recrawled history docs (+500000) score 100% dup chunks — the
    // incremental path rejects them from STATE alone, no history text
    // re-chunked. The state is built INCREMENTALLY in two crawls and
    // binpack-COMPACTED mid-sequence before the batch probes it — the
    // maintenance proof that took the fingerprint/postings/band-signature
    // states a verdict cycle each to acquire, folded in from day one
    // (`compacted` = files strictly decreased, `state_preserved` = zero
    // rows lost). Certified: the batch refresh commit is append-only
    // (every post-compaction file survives byte-identical), the table
    // holds exactly 4 commits (append, append, compact, append), and the
    // final inventory equals the whole-corpus distinct chunk-hash count —
    // nothing lost, nothing duplicated, through build, rewrite, and
    // refresh alike. The oracle recomputes the decision from raw text
    // with no state, no commits, no compaction.
    ("x_incremental_chunk_dedup",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        val W = 16
        val boiler = " subscribe to our newsletter all rights reserved contact us privacy policy terms of service cookie notice"
        val docs0 = Tables.documents(s, d).select("doc_id", "lang", "text")
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(boiler))).otherwise(col("text")))
        val hist = docs0.filter(col("doc_id") % 2 === 0)
        val batch = docs0.filter(col("doc_id") % 2 === 1)
          .unionByName(hist.filter(col("doc_id") % 20 === 0)
            .select((col("doc_id") + 500000L).as("doc_id"), col("lang"), col("text")))
        // the SHARED chunker (chunksOf member) — the durable state must
        // chunk exactly like the batch gate it persists for; keep-first is
        // the ONE shared chunkKeepFirstLedger (also under the streaming
        // crawl loop), narrowed to this state's 3-column shape
        def chunked(df: DataFrame): DataFrame = chunksOf(df, W)
        def keepFirst(chunks: DataFrame): DataFrame =
          chunkKeepFirstLedger(chunks).select("h", "f_doc", "f_ci")
        val hf1 = keepFirst(chunked(hist.filter(col("doc_id") % 4 === 0)))
        val cat = TableOps.newCatalog()
        val t = cat.createTable("db.chunk_first", hf1.schema,
          partitionBy = Seq("h" -> Transform.Bucket(4)))
        t.append(s, hf1)
        // second crawl extends the state through the SAME incremental path
        // the batch takes: probe, keep-first over unseen, append
        t.append(s, keepFirst(
          chunked(hist.filter(col("doc_id") % 4 === 2))
            .join(t.toDF(s).select(col("h")), Seq("h"), "left_anti")))
        // mid-sequence maintenance on the live keep-first state
        val (compacted, statePreserved) = TableOps.compactionProof(s, t)
        val filesBefore = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        val bc = chunked(batch).localCheckpoint() // probe + rollup read it
        val bFirst = keepFirst(bc
            .join(t.toDF(s).select(col("h")), Seq("h"), "left_anti"))
          .localCheckpoint() // read twice: the state append + the keep probe
        t.append(s, bFirst) // the batch extends the durable keep-first state
        val filesAfter = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        val stateChunks = t.toDF(s).count()
        bc.join(bFirst, Seq("h"), "left")
          .withColumn("keep", col("f_doc").isNotNull &&
            col("doc_id") === col("f_doc") && col("ci") === col("f_ci"))
          .groupBy("lang")
          .agg(countDistinct(col("doc_id")).as("docs"),
            count(lit(1)).as("chunks"),
            sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("kept_chunks"),
            sum(col("n_tok")).as("tokens"),
            sum(when(col("keep"), col("n_tok")).otherwise(lit(0L))).as("kept_tokens"))
          .withColumn("dup_chunk_rate",
            lit(1.0) - col("kept_chunks").cast("double") / col("chunks").cast("double"))
          .withColumn("compacted", lit(compacted))
          .withColumn("state_preserved", lit(statePreserved))
          .withColumn("append_only",
            lit(filesBefore.subsetOf(filesAfter) && filesAfter.size > filesBefore.size))
          .withColumn("incremental_commits", lit(t.meta.snapshots.size.toLong))
          .withColumn("state_chunks", lit(stateChunks))
          .orderBy("lang")
      },
      """WITH docs0 AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 5 = 0 THEN text ||
        |      ' subscribe to our newsletter all rights reserved contact us privacy policy terms of service cookie notice'
        |    ELSE text END AS text
        |  FROM documents),
        |hist AS (SELECT doc_id, lang, text FROM docs0 WHERE doc_id % 2 = 0),
        |batch AS (
        |  SELECT doc_id, lang, text FROM docs0 WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 500000, lang, text FROM docs0
        |  WHERE doc_id % 2 = 0 AND doc_id % 20 = 0),
        |toked_h AS (
        |  SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |  FROM hist),
        |chunks_h AS (
        |  SELECT doc_id, (s - 1) // 16 AS ci,
        |    md5(array_to_string(t[s : s + 15], ' ')) AS h
        |  FROM (SELECT * FROM toked_h WHERE len(t) > 0),
        |    unnest(generate_series(1, len(t), 16)) AS u(s)),
        |toked_b AS (
        |  SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |  FROM batch),
        |chunks_b AS (
        |  SELECT doc_id, lang, (s - 1) // 16 AS ci,
        |    CAST(len(t[s : s + 15]) AS BIGINT) AS n_tok,
        |    md5(array_to_string(t[s : s + 15], ' ')) AS h
        |  FROM (SELECT * FROM toked_b WHERE len(t) > 0),
        |    unnest(generate_series(1, len(t), 16)) AS u(s)),
        |unseen AS (
        |  SELECT h, doc_id, ci FROM chunks_b c
        |  WHERE NOT EXISTS (SELECT 1 FROM chunks_h x WHERE x.h = c.h)),
        |bfd AS (SELECT h, min(doc_id) AS f_doc FROM unseen GROUP BY 1),
        |bfirst AS (
        |  SELECT u.h, f.f_doc, min(u.ci) AS f_ci
        |  FROM unseen u JOIN bfd f ON u.h = f.h AND u.doc_id = f.f_doc
        |  GROUP BY 1, 2),
        |marked AS (
        |  SELECT c.lang, c.doc_id, c.n_tok,
        |    (b.f_doc IS NOT NULL AND c.doc_id = b.f_doc AND c.ci = b.f_ci) AS keep
        |  FROM chunks_b c LEFT JOIN bfirst b ON c.h = b.h),
        |state AS (
        |  SELECT count(DISTINCT h) AS n FROM (
        |    SELECT h FROM chunks_h UNION ALL SELECT h FROM chunks_b))
        |SELECT lang, count(DISTINCT doc_id) AS docs, count(*) AS chunks,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
        |  CAST(sum(n_tok) AS BIGINT) AS tokens,
        |  CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
        |  1.0 - CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS dup_chunk_rate,
        |  true AS compacted, true AS state_preserved,
        |  true AS append_only, CAST(4 AS BIGINT) AS incremental_commits,
        |  (SELECT n FROM state) AS state_chunks
        |FROM marked GROUP BY 1 ORDER BY 1""".stripMargin),

    // X1f: the STREAMING chunk-level crawl loop — completes the
    // chunk-hash state's lifecycle matrix (batch: x_chunk_dedup; durable
    // + compacted: x_incremental_chunk_dedup; now STREAMING), the
    // sub-document twin of x_stream_incremental_dedup. Three
    // doc_id-ordered slices (odds split at their midpoint, recrawls
    // +1e9 last); per micro-batch the shared streamIncrementalChunkDedup
    // chunks via the ONE chunksOf, anti-joins the durable keep-first
    // ledger AS OF ARRIVAL — history chunks AND chunks first kept by
    // EARLIER batches both reject, the cross-batch distinction — runs
    // the ONE shared chunkKeepFirstLedger over the unseen chunks, and
    // appends the batch's first-occurrences as ONE atomic
    // statementId-keyed commit (single-commit batches: the crash window
    // collapses — any replay no-ops on its statementId or re-runs
    // cleanly; the ledger is both state and result). The oracle is the
    // STATELESS global keep-first rule (min doc per unseen hash, min
    // chunk within that doc) — it equals the streamed admissions because
    // ANY doc_id-monotone slicing makes arrival-first == min-doc-first,
    // so the midpoint cut never appears in the SQL. After the crawl:
    // compactionProof on the live ledger, then a REPROBE — every batch
    // chunk hash must be in the final ledger (its own keep, an earlier
    // batch's, or history's), so a ledger row lost to the rewrite or a
    // replayed commit fails loudly.
    ("x_stream_incremental_chunk_dedup",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        val W = 16
        val boiler = " subscribe to our newsletter all rights reserved contact us privacy policy terms of service cookie notice"
        val docs0 = Tables.documents(s, d).select("doc_id", "lang", "text")
          .withColumn("text", when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(boiler))).otherwise(col("text")))
        val hist = docs0.filter(col("doc_id") % 2 === 0)
        val batch = docs0.filter(col("doc_id") % 2 === 1)
          .unionByName(hist.filter(col("doc_id") % 20 === 0)
            .select((col("doc_id") + 1000000000L).as("doc_id"), col("lang"), col("text")))
        val stage = TableOps.newTempDir("graft-sicd")
        val t = FixtureClock.timed { // history ledger build + staging I/O
          val cat = TableOps.newCatalog()
          val ledger = chunkKeepFirstLedger(chunksOf(hist, W))
          // h-bloom indexed so each batch's runtime-filtered anti-join
          // probe can skip ledger files (md5 min/max never prunes)
          val tbl = cat.createTable("db.chunk_first_s", ledger.schema,
            partitionBy = Seq("h" -> Transform.Bucket(4)),
            properties = Map(graft.format.TableProperties.BloomColumns -> "h"))
          tbl.append(s, ledger)
          val ids = batch.agg(min(col("doc_id")),
            max(when(col("doc_id") < 1000000000L, col("doc_id")))).head
          val mid = (ids.getLong(0) + ids.getLong(1)) / 2
          stageOrderedSlices(batch, stage,
            when(col("doc_id") <= mid, 0)
              .when(col("doc_id") < 1000000000L, 1).otherwise(2), 3)
          tbl
        }
        val batches = streamIncrementalChunkDedup(s, stage, batch.schema, t, W)
        val commits = t.meta.snapshots.size // before the compaction commit
        require(batches == 3 && commits == 4, // hist + one per micro-batch
          s"chunk crawl must run micro-batched: $batches batches, $commits commits")
        val (compacted, statePreserved) = TableOps.compactionProof(s, t)
        val bcAll = chunksOf(batch, W).localCheckpoint() // rollup + reprobe
        val reprobeClean = bcAll.select("h").distinct()
          .join(t.toDF(s).select(col("h")), Seq("h"), "left_anti").isEmpty
        require(reprobeClean,
          "compacted ledger must hold every already-crawled chunk hash")
        bcAll
          .join(t.toDF(s).select(col("h"), col("f_doc"), col("f_ci")), Seq("h"), "left")
          .withColumn("keep", col("f_doc").isNotNull &&
            col("doc_id") === col("f_doc") && col("ci") === col("f_ci"))
          .groupBy("lang")
          .agg(countDistinct(col("doc_id")).as("docs"),
            count(lit(1)).as("chunks"),
            sum(when(col("keep"), lit(1L)).otherwise(lit(0L))).as("kept_chunks"),
            sum(col("n_tok")).as("tokens"),
            sum(when(col("keep"), col("n_tok")).otherwise(lit(0L))).as("kept_tokens"))
          .withColumn("dup_chunk_rate",
            lit(1.0) - col("kept_chunks").cast("double") / col("chunks").cast("double"))
          .withColumn("ingest_commits", lit(commits.toLong))
          .withColumn("compacted", lit(compacted))
          .withColumn("state_preserved", lit(statePreserved))
          .withColumn("reprobe_clean", lit(reprobeClean))
          .orderBy("lang")
      },
      """WITH docs0 AS (
        |  SELECT doc_id, lang,
        |    CASE WHEN doc_id % 5 = 0 THEN text ||
        |      ' subscribe to our newsletter all rights reserved contact us privacy policy terms of service cookie notice'
        |    ELSE text END AS text
        |  FROM documents),
        |hist AS (SELECT doc_id, lang, text FROM docs0 WHERE doc_id % 2 = 0),
        |batch AS (
        |  SELECT doc_id, lang, text FROM docs0 WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 1000000000, lang, text FROM docs0
        |  WHERE doc_id % 2 = 0 AND doc_id % 20 = 0),
        |toked_h AS (
        |  SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |  FROM hist),
        |chunks_h AS (
        |  SELECT doc_id, (s - 1) // 16 AS ci,
        |    md5(array_to_string(t[s : s + 15], ' ')) AS h
        |  FROM (SELECT * FROM toked_h WHERE len(t) > 0),
        |    unnest(generate_series(1, len(t), 16)) AS u(s)),
        |toked_b AS (
        |  SELECT doc_id, lang,
        |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |  FROM batch),
        |chunks_b AS (
        |  SELECT doc_id, lang, (s - 1) // 16 AS ci,
        |    CAST(len(t[s : s + 15]) AS BIGINT) AS n_tok,
        |    md5(array_to_string(t[s : s + 15], ' ')) AS h
        |  FROM (SELECT * FROM toked_b WHERE len(t) > 0),
        |    unnest(generate_series(1, len(t), 16)) AS u(s)),
        |unseen AS (
        |  SELECT h, doc_id, ci FROM chunks_b c
        |  WHERE NOT EXISTS (SELECT 1 FROM chunks_h x WHERE x.h = c.h)),
        |bfd AS (SELECT h, min(doc_id) AS f_doc FROM unseen GROUP BY 1),
        |bfirst AS (
        |  SELECT u.h, f.f_doc, min(u.ci) AS f_ci
        |  FROM unseen u JOIN bfd f ON u.h = f.h AND u.doc_id = f.f_doc
        |  GROUP BY 1, 2),
        |marked AS (
        |  SELECT c.lang, c.doc_id, c.n_tok,
        |    (b.f_doc IS NOT NULL AND c.doc_id = b.f_doc AND c.ci = b.f_ci) AS keep
        |  FROM chunks_b c LEFT JOIN bfirst b ON c.h = b.h)
        |SELECT lang, count(DISTINCT doc_id) AS docs, count(*) AS chunks,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS kept_chunks,
        |  CAST(sum(n_tok) AS BIGINT) AS tokens,
        |  CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT) AS kept_tokens,
        |  1.0 - CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE)
        |      / CAST(count(*) AS DOUBLE) AS dup_chunk_rate,
        |  CAST(4 AS BIGINT) AS ingest_commits, true AS compacted,
        |  true AS state_preserved, true AS reprobe_clean
        |FROM marked GROUP BY 1 ORDER BY 1""".stripMargin),

    // X2i: CONTAINMENT dedup — the ASYMMETRIC near-dup metric:
    // |sh(A)∩sh(B)| / |sh(A)| catches an excerpt/quote A living inside a
    // longer B, which Jaccard structurally misses (a 15-token excerpt of a
    // 400-token doc has Jaccard ~0.04 but containment 1.0). Fixture plants
    // excerpts in-query: the first 15 tokens of every 25th doc re-enter
    // under id+200000. Candidates via a RARE-5-shingle inverted index (df
    // in [2,8]): nomination runs on 5-grams — a |vocab|^5 universe where
    // only true excerpts/near-dups collide — while the metric runs on
    // 3-grams. Nominating on the metric's own 3-grams measured 192s at
    // sf0.1: in a small-vocabulary corpus the average 3-gram df is ~7, so
    // nearly EVERY shingle passes a df cap and the index nominates ~1M
    // pairs; the 5-gram universe keeps df concentrated at the true-dup
    // pairs (the same reason the minhash family signs shingles, not
    // tokens). The df cap still bounds the self-join fanout on planted
    // boilerplate (Σ df² ≤ 8·Σdf), and the oracle MIRRORS the nomination,
    // so both engines see the identical candidate set by construction.
    // Verification reuses the pairJaccard broadcast discipline: only the
    // matched rows' shingle arrays are ever computed.
    ("x_containment",
      (s: SparkSession, d: String) => {
        val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val excerpts = base.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 200000L).as("doc_id"),
            array_join(slice(TF.tokens(col("text")), 1, 15), " ").as("text"))
        val docs = base.unionByName(excerpts)
        val (_, nominated) = containmentNomination(docs)
        val (cand, fits) = measuredPairs(nominated)
        // metric 3-grams computed ONCE per nominated doc (pairJaccard's
        // per-matched-doc discipline), then joined to the pair set
        val ids = cand.select(col("doc_a").as("doc_id"))
          .union(cand.select(col("doc_b").as("doc_id"))).distinct()
        val matched = docs.join(maybeBroadcast(ids, fits), "doc_id")
          .withColumn("sh", array_distinct(TF.shingles(col("text"), 3)))
          .select(col("doc_id"), col("sh"))
          .localCheckpoint() // both verify sides read it (see pairJaccard)
        val withA = matched.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
          .join(maybeBroadcast(cand, fits), "doc_a")
        val both = matched.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
          .join(maybeBroadcast(withA, fits), "doc_b")
        both.filter(size(col("sh_a")) > 0)
          .withColumn("containment",
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") / size(col("sh_a")))
          .filter(col("containment") >= 0.9)
          .select(col("doc_a"), col("doc_b"),
            size(col("sh_a")).cast("long").as("n_shingles_a"), col("containment"))
          .orderBy("doc_a", "doc_b")
      },
      s"""WITH ex AS (
        |  SELECT doc_id + 200000 AS doc_id,
        |    array_to_string(($toksSql)[1:15], ' ') AS text
        |  FROM documents WHERE doc_id % 25 = 0),
        |docs AS (
        |  SELECT doc_id, text FROM documents UNION ALL SELECT doc_id, text FROM ex),
        |toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
        |  FROM docs),
        |sh3 AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(t) < 3 THEN [] ELSE
        |    list_transform(generate_series(1, len(t) - 2),
        |      i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) END) AS sh
        |  FROM toks),
        |inv AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    generate_series(1, len(t) - 4),
        |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))) AS g
        |  FROM toks),
        |rare AS (SELECT g FROM inv GROUP BY g HAVING count(*) BETWEEN 2 AND 8),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM inv a JOIN rare USING (g) JOIN inv b USING (g)
        |  WHERE a.doc_id <> b.doc_id)
        |SELECT c.doc_a, c.doc_b, CAST(len(a.sh) AS BIGINT) AS n_shingles_a,
        |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS containment
        |FROM cand c JOIN sh3 a ON a.doc_id = c.doc_a JOIN sh3 b ON b.doc_id = c.doc_b
        |WHERE len(a.sh) > 0
        |  AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) >= 0.9
        |ORDER BY 1, 2""".stripMargin),

    // X1b: INCREMENTAL dedup — dedup a new batch against the accumulated
    // corpus, with the history as a bloom-indexed, bucket-partitioned
    // Graft TABLE rather than a transient DataFrame: the durable dedup
    // state a daily 100 TB ingest actually keeps (append-only fingerprints;
    // next batch appends its admitted fps — snapshot history doubles as the
    // ingest audit log). Fixture plants both rejection classes in-query:
    // re-crawled history docs (+300000 ids, caught by the history
    // anti-join) and within-batch resubmissions (+400000 ids, caught by
    // min-keep). Shuffle discipline: text never moves — the batch reduces
    // to (fp, doc_id) before any exchange, the anti-join is hash-only on
    // the 128-bit fingerprint, and the admitted ids rejoin the batch
    // rows map-side-broadcast for the final per-lang rollup.
    ("x_incremental_dedup",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars", "text")
        val hist = docs.filter(col("doc_id") % 2 === 0)
        val batch = docs.filter(col("doc_id") % 2 === 1)
          .unionByName(hist.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 300000L).as("doc_id"), col("lang"), col("n_chars"), col("text")))
          .unionByName(docs.filter(col("doc_id") % 20 === 1)
            .select((col("doc_id") + 400000L).as("doc_id"), col("lang"), col("n_chars"), col("text")))
        val fps = hist.select(TF.fingerprint(col("text")).as("fp"))
        val cat = TableOps.newCatalog()
        val t = cat.createTable("db.fingerprints", fps.schema,
          partitionBy = Seq("fp" -> Transform.Bucket(4)),
          properties = Map(graft.format.TableProperties.BloomColumns -> "fp"))
        t.append(s, fps)
        val batchFp = batch.select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
        val firstIn = batchFp.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
        val admitted = firstIn
          .join(t.toDF(s).select(col("fp")), Seq("fp"), "left_anti")
          .select("doc_id")
        batch.join(broadcast(admitted), "doc_id")
          .groupBy("lang")
          .agg(count(lit(1)).as("admitted"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .orderBy("lang")
      },
      """WITH docs AS (SELECT doc_id, lang, n_chars, text FROM documents),
        |batch AS (
        |  SELECT doc_id, lang, n_chars, text FROM docs WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 300000, lang, n_chars, text FROM docs
        |  WHERE doc_id % 2 = 0 AND doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 400000, lang, n_chars, text FROM docs WHERE doc_id % 20 = 1),
        |hist AS (SELECT md5(text) AS fp FROM docs WHERE doc_id % 2 = 0),
        |first_in AS (
        |  SELECT md5(text) AS fp, min(doc_id) AS doc_id FROM batch GROUP BY 1),
        |admitted AS (
        |  SELECT f.doc_id FROM first_in f
        |  WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = f.fp))
        |SELECT b.lang, count(*) AS admitted, CAST(sum(b.n_chars) AS BIGINT) AS sum_chars
        |FROM batch b JOIN admitted a ON b.doc_id = a.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // X1s: STREAMING incremental dedup against the DURABLE fingerprint
    // state — the production crawl loop, composing the two gates that
    // each prove half of it: g_stream_dedup_watermark dedups in-stream
    // but keeps no durable state; x_incremental_dedup dedups against the
    // persisted fingerprint table but in one batch. Here every
    // micro-batch (1) reduces to first-in-batch (fp, min doc_id), (2)
    // anti-joins the fingerprint TABLE as of arrival — history recrawls
    // and docs admitted by EARLIER micro-batches both reject, (3)
    // appends its admitted fps to the state and its admitted ids to the
    // results table, each one atomic commit, so a crashed crawl resumes
    // with the state reflecting exactly the batches that committed. The
    // admitted set is PINNED per batch (localCheckpoint) — correctness,
    // not perf: the state append mutates the very table the anti-join
    // read, so a lazy plan recomputed for the results append could
    // reject its own batch. Slices are staged in doc_id order with
    // explicitly stamped mtimes (coarse filesystem clocks can tie and
    // swap adjacent slices — the r10-ADVICE lesson), which makes
    // arrival-first == min-doc_id-first, so the stateless oracle (the
    // exact x_incremental_dedup rule) computes the same admissions with
    // no notion of streams, batches, or state.
    //
    // Honest 100 TB cost accounting: the per-batch anti-join reads the
    // fingerprint state ONCE PER MICRO-BATCH (md5-uniform keys defeat
    // per-file skipping — every state file plausibly holds some batch
    // fp), so micro-batch granularity is a knob you SIZE, not a free
    // lunch: streamIncrementalDedup's filesPerTrigger parameter IS that
    // knob (state scans per corpus == batch count, measured in
    // StreamIncrementalDedupSpec) — amortize the state scan over batches
    // large enough to matter (the daily-crawl shape of
    // x_incremental_dedup is this pipeline with one batch), and the
    // fp-bucket partitioning keeps the join co-partitioned so the state
    // side never reshuffles.
    ("x_stream_incremental_dedup",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        import org.apache.spark.sql.types.{LongType, StructType}
        val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars", "text")
        val hist = docs.filter(col("doc_id") % 2 === 0)
        val batch = docs.filter(col("doc_id") % 2 === 1)
          .unionByName(hist.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 300000L).as("doc_id"), col("lang"), col("n_chars"), col("text")))
          .unionByName(docs.filter(col("doc_id") % 20 === 1)
            .select((col("doc_id") + 400000L).as("doc_id"), col("lang"), col("n_chars"), col("text")))
        val stage = TableOps.newTempDir("graft-sid")
        val (t, res) = FixtureClock.timed { // history build + staging I/O
          val cat = TableOps.newCatalog()
          val fps = hist.select(TF.fingerprint(col("text")).as("fp"))
          val tbl = cat.createTable("db.fp_stream", fps.schema,
            partitionBy = Seq("fp" -> Transform.Bucket(4)),
            properties = Map(graft.format.TableProperties.BloomColumns -> "fp"))
          tbl.append(s, fps)
          val resT = cat.createTable("db.admitted_stream",
            new StructType().add("doc_id", LongType))
          // 3 slices in doc_id order: originals, then recrawls (+300000),
          // then resubmissions (+400000) — stamped strictly increasing
          stageOrderedSlices(batch, stage,
            when(col("doc_id") < 300000L, 0)
              .when(col("doc_id") < 400000L, 1).otherwise(2), 3)
          (tbl, resT)
        }
        val batches = streamIncrementalDedup(s, stage, batch.schema, t, res)
        val stateCommits = t.meta.snapshots.size // before the compaction commit
        require(batches == 3 && res.meta.snapshots.size == 3 &&
            stateCommits == 4, // hist + one per micro-batch
          s"crawl must run micro-batched: $batches batches, " +
            s"${res.meta.snapshots.size}/$stateCommits commits")
        // maintenance composes with the live crawl state: binpack the
        // accumulated small bucket files, then REPROBE — the whole crawl
        // replayed against the compacted state must admit NOTHING (every
        // fp is now history; a lost state row would silently re-admit)
        val (compacted, statePreserved) = TableOps.compactionProof(s, t)
        val reprobeClean = batch
          .select(TF.fingerprint(col("text")).as("fp")).distinct()
          .join(t.toDF(s).select(col("fp")), Seq("fp"), "left_anti")
          .isEmpty
        require(reprobeClean,
          "compacted state must reject the entire already-crawled batch")
        batch.join(broadcast(res.toDF(s)), "doc_id")
          .groupBy("lang")
          .agg(count(lit(1)).as("admitted"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .withColumn("ingest_commits", lit(res.meta.snapshots.size.toLong))
          .withColumn("state_commits", lit(stateCommits.toLong))
          .withColumn("compacted", lit(compacted))
          .withColumn("state_preserved", lit(statePreserved))
          .withColumn("reprobe_clean", lit(reprobeClean))
          .orderBy("lang")
      },
      """WITH docs AS (SELECT doc_id, lang, n_chars, text FROM documents),
        |batch AS (
        |  SELECT doc_id, lang, n_chars, text FROM docs WHERE doc_id % 2 = 1
        |  UNION ALL
        |  SELECT doc_id + 300000, lang, n_chars, text FROM docs
        |  WHERE doc_id % 2 = 0 AND doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 400000, lang, n_chars, text FROM docs WHERE doc_id % 20 = 1),
        |hist AS (SELECT md5(text) AS fp FROM docs WHERE doc_id % 2 = 0),
        |first_in AS (
        |  SELECT md5(text) AS fp, min(doc_id) AS doc_id FROM batch GROUP BY 1),
        |admitted AS (
        |  SELECT f.doc_id FROM first_in f
        |  WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = f.fp))
        |SELECT b.lang, count(*) AS admitted, CAST(sum(b.n_chars) AS BIGINT) AS sum_chars,
        |  CAST(3 AS BIGINT) AS ingest_commits, CAST(4 AS BIGINT) AS state_commits,
        |  true AS compacted, true AS state_preserved, true AS reprobe_clean
        |FROM batch b JOIN admitted a ON b.doc_id = a.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // X7c: KEYWORD SEARCH over a PERSISTED inverted index — the lexical
    // retrieval twin of x_ann_index. The index is a Graft table of postings
    // (token, doc_id, tf), identity-partitioned on a 16-way md5 bucket of
    // the token: the build is one pass over text + one (token, doc) hash
    // aggregate, and a term probe PRUNES to 1/16 of the index partitions
    // (certified through scan metrics like every other pruned gate). The
    // AND-of-terms query intersects two pruned posting scans on doc_id and
    // ranks by summed term frequency (exact BIGINTs, id tie-break,
    // TakeOrderedAndProject) — document text is never touched at query
    // time, which is the entire point of an inverted index at 100 TB.
    // DuckDB has no index; the oracle recomputes tf from raw text, so
    // agreement proves the index lost nothing.
    ("x_keyword_search",
      (s: SparkSession, d: String) => {
        val t = buildInvertedIndex(s, Tables.documents(s, d), TableOps.newCatalog())
        val (scA, a) = probeTerm(s, t, "merge")
        val (scB, b) = probeTerm(s, t, "window")
        a.join(b.withColumnRenamed("tf", "tf_b"), "doc_id")
          .select(col("doc_id"), (col("tf") + col("tf_b")).as("score"))
          .withColumn("pruned_a",
            lit(scA.metrics.filesScanned < scA.metrics.filesTotal))
          .withColumn("pruned_b",
            lit(scB.metrics.filesScanned < scB.metrics.filesTotal))
          .orderBy(col("score").desc, col("doc_id")).limit(20)
      },
      s"""WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
        |  GROUP BY 1, 2)
        |SELECT a.doc_id, a.tf + b.tf AS score,
        |  true AS pruned_a, true AS pruned_b
        |FROM tf a JOIN tf b USING (doc_id)
        |WHERE a.token = 'merge' AND b.token = 'window'
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),

    // X7d: INCREMENTAL keyword-index refresh — the maintenance shape the
    // x_ann_index_refresh gate certifies for vectors, applied to the
    // lexical index: a new document batch's postings APPEND to the bucket-
    // partitioned index (the bucketing is a pure token hash, so arriving
    // postings route to the same partitions with nothing recomputed —
    // no frozen state even needed). Certified: the refresh commit is
    // append-only (every pre-refresh file survives byte-identical), the
    // table holds exactly 2 commits, a post-refresh probe still prunes,
    // and the AND-query over the refreshed index equals the whole-corpus
    // answer DuckDB computes with no index at all — the refresh lost
    // nothing.
    ("x_keyword_index_refresh",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val t = buildInvertedIndex(s, docs.filter(col("doc_id") % 2 === 0),
          TableOps.newCatalog())
        val filesBefore = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        t.append(s, postingsOf(docs.filter(col("doc_id") % 2 === 1)))
        val filesAfter = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        val (scA, a) = probeTerm(s, t, "merge")
        val (scB, b) = probeTerm(s, t, "window")
        a.join(b.withColumnRenamed("tf", "tf_b"), "doc_id")
          .select(col("doc_id"), (col("tf") + col("tf_b")).as("score"))
          .withColumn("append_only",
            lit(filesBefore.subsetOf(filesAfter) && filesAfter.size > filesBefore.size))
          .withColumn("incremental_commits", lit(t.meta.snapshots.size.toLong))
          .withColumn("pruned",
            lit(scA.metrics.filesScanned < scA.metrics.filesTotal &&
              scB.metrics.filesScanned < scB.metrics.filesTotal))
          .orderBy(col("score").desc, col("doc_id")).limit(20)
      },
      s"""WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
        |  GROUP BY 1, 2)
        |SELECT a.doc_id, a.tf + b.tf AS score,
        |  true AS append_only, CAST(2 AS BIGINT) AS incremental_commits,
        |  true AS pruned
        |FROM tf a JOIN tf b USING (doc_id)
        |WHERE a.token = 'merge' AND b.token = 'window'
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),

    // X7e: COMPACTION composes with the persisted inverted index — the
    // postings-table twin of x_incremental_dedup_compacted, certifying the
    // interaction that gate cannot: a term probe must still PARTITION-
    // PRUNE after the rewrite (compaction rewrites every small file into
    // new ones — if the new manifests lost the bucket partition values,
    // probes would silently degrade to full-index scans, the failure mode
    // a 100 TB index dies on with no wrong answers to flag it). Fixture:
    // index built in two appends (32 small bucket files), compacted
    // (16 remain — `compacted` certifies the fold), then the standard
    // AND-of-terms query over two pruned probes must equal the oracle's
    // index-free recompute from raw text.
    ("x_keyword_index_compacted",
      (s: SparkSession, d: String) => {
        val docs = Tables.documents(s, d)
        val t = buildInvertedIndex(s, docs.filter(col("doc_id") % 2 === 0),
          TableOps.newCatalog())
        t.append(s, postingsOf(docs.filter(col("doc_id") % 2 === 1)))
        val filesBefore = t.scan().dataFiles.size
        t.compact(s) // maintenance on the live index
        val filesAfter = t.scan().dataFiles.size
        val (scA, a) = probeTerm(s, t, "merge")
        val (scB, b) = probeTerm(s, t, "window")
        a.join(b.withColumnRenamed("tf", "tf_b"), "doc_id")
          .select(col("doc_id"), (col("tf") + col("tf_b")).as("score"))
          .withColumn("compacted", lit(filesAfter < filesBefore))
          .withColumn("pruned",
            lit(scA.metrics.filesScanned < scA.metrics.filesTotal &&
              scB.metrics.filesScanned < scB.metrics.filesTotal))
          .orderBy(col("score").desc, col("doc_id")).limit(20)
      },
      s"""WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
        |  GROUP BY 1, 2)
        |SELECT a.doc_id, a.tf + b.tf AS score,
        |  true AS compacted, true AS pruned
        |FROM tf a JOIN tf b USING (doc_id)
        |WHERE a.token = 'merge' AND b.token = 'window'
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),

    // X7f: STREAMING inverted-index ingest — completes the postings
    // index's lifecycle matrix (batch build: x_keyword_search;
    // incremental refresh: x_keyword_index_refresh; compaction:
    // x_keyword_index_compacted; now continuous ingest), the lexical
    // twin of x_stream_ann_ingest. Documents replay as 3 micro-batches
    // through the shared rig; each batch reduces to its postings
    // map-side + one batch-local (token, doc) aggregate — correct
    // because a doc never spans micro-batches, so every (token, doc_id)
    // tf completes within its batch — and appends as one atomic commit
    // routed to the same md5 token buckets (pure hash, nothing
    // recomputed). After the replay: the standard AND-of-terms query
    // over two partition-pruned probes, pruning certified ACROSS the 3
    // independent appends, `ingest_commits`=3 pinned. The oracle
    // recomputes tf from raw text with no notion of streams, batches,
    // or the index — agreement proves continuous ingest lost nothing
    // vs the one-shot build.
    ("x_stream_keyword_ingest",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val stage = TableOps.newTempDir("graft-kwstream")
        val t = FixtureClock.timed { // staging I/O is fixture
          docs.repartition(6).write.mode("overwrite").parquet(stage)
          TableOps.newCatalog().createTable("db.inverted_stream",
            postingsOf(docs.limit(0)).schema,
            partitionBy = Seq("bucket" -> Transform.Identity))
        }
        val nBatches = keywordStreamIngest(s, stage, docs.schema, t,
          filesPerTrigger = 2)
        require(nBatches == 3 && t.meta.snapshots.size == 3,
          s"ingest must run micro-batched: $nBatches batches, " +
            s"${t.meta.snapshots.size} commits")
        // maintenance composes with the streamed index: binpack the 3
        // appends' small per-bucket files, THEN probe — `pruned` below
        // certifies term probes survived the rewrite
        val (compacted, statePreserved) = TableOps.compactionProof(s, t)
        val (scA, a) = probeTerm(s, t, "merge")
        val (scB, b) = probeTerm(s, t, "window")
        a.join(b.withColumnRenamed("tf", "tf_b"), "doc_id")
          .select(col("doc_id"), (col("tf") + col("tf_b")).as("score"))
          .withColumn("pruned",
            lit(scA.metrics.filesScanned < scA.metrics.filesTotal &&
              scB.metrics.filesScanned < scB.metrics.filesTotal))
          .withColumn("ingest_commits", lit(nBatches.toLong))
          .withColumn("compacted", lit(compacted))
          .withColumn("state_preserved", lit(statePreserved))
          .orderBy(col("score").desc, col("doc_id")).limit(20)
      },
      s"""WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
        |  GROUP BY 1, 2)
        |SELECT a.doc_id, a.tf + b.tf AS score,
        |  true AS pruned, CAST(3 AS BIGINT) AS ingest_commits,
        |  true AS compacted, true AS state_preserved
        |FROM tf a JOIN tf b USING (doc_id)
        |WHERE a.token = 'merge' AND b.token = 'window'
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),

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

    // X6i: PER-GROUP sampled quantiles ([[graft.functions.ScaleFunctions
    // .groupedQuantiles]]) — x_quantile_sample partitioned by a group key:
    // per-language length distributions, the per-domain statistic every
    // corpus report needs. One exchange on the group key; each window
    // partition holds only that group's md5-prefix SAMPLE (rate-bounded —
    // a giant group costs its sample, not its size), nearest-rank PICKED
    // elements with md5 tie-breaks, so both engines draw the identical
    // sample and pick the identical BIGINT values.
    ("x_group_quantiles",
      (s: SparkSession, d: String) => {
        import graft.functions.{ScaleFunctions => SC}
        SC.groupedQuantiles(Tables.documents(s, d), col("lang"),
            col("n_chars"), col("doc_id"), "80",
            Seq("p50" -> 0.5, "p90" -> 0.9))
          .withColumnRenamed("group", "lang")
      },
      """WITH s AS (
        |  SELECT lang, n_chars AS v, md5(CAST(doc_id AS VARCHAR)) AS tb
        |  FROM documents
        |  WHERE n_chars IS NOT NULL
        |    AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'),
        |r AS (
        |  SELECT lang, v, tb,
        |    row_number() OVER (PARTITION BY lang ORDER BY v, tb) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM s),
        |q(label, p) AS (VALUES ('p50', CAST(0.5 AS DOUBLE)),
        |  ('p90', CAST(0.9 AS DOUBLE)))
        |SELECT r.lang, q.label AS quantile, r.v AS value,
        |  CAST(r.n AS BIGINT) AS sample_n
        |FROM r JOIN q
        |  ON r.rn = CAST(floor(CAST(r.n - 1 AS DOUBLE) * q.p) AS BIGINT) + 1
        |ORDER BY 1, 2""".stripMargin),

    // X9a: FUNNEL analysis — ordered-step matching per user (view → click
    // → purchase, each step strictly AFTER the previous one's first
    // occurrence): the product-analytics operator the plain relational
    // surface has no single op for. Three chained keyed windows over ONE
    // user-id exchange (consecutive Window ops on the same partitioning
    // reuse the shuffle — plan shape every self-join formulation pays 3x
    // for); each step's `when` gates on the previous step's timestamp, so
    // NULL propagation implements the funnel ordering for free. Gaps
    // surface as integer microseconds; at 100 TB this is one shuffle of
    // (user, ts, type) — no joins, no per-step passes over the corpus.
    ("x_funnel",
      (s: SparkSession, d: String) =>
        funnelStages(Tables.events(s, d)).orderBy("user_id"),
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
        |u AS (SELECT DISTINCT user_id FROM events)
        |SELECT u.user_id,
        |  CASE WHEN s3.t3 IS NOT NULL THEN CAST(3 AS BIGINT)
        |       WHEN s2.t2 IS NOT NULL THEN 2
        |       WHEN s1.t1 IS NOT NULL THEN 1 ELSE 0 END AS reached,
        |  CAST(date_diff('microsecond', s1.t1, s2.t2) AS BIGINT) AS gap12_us,
        |  CAST(date_diff('microsecond', s2.t2, s3.t3) AS BIGINT) AS gap23_us
        |FROM u
        |LEFT JOIN s1 ON u.user_id = s1.user_id
        |LEFT JOIN s2 ON u.user_id = s2.user_id
        |LEFT JOIN s3 ON u.user_id = s3.user_id
        |ORDER BY 1""".stripMargin),

    // X9b: RETENTION COHORTS — users cohorted by first-seen day, counted
    // as active per whole-week offset: the second classic product metric.
    // One hash agg for the (small: |users|-row) cohort table, broadcast
    // back onto the per-day activity set; offsets are exact integer day
    // arithmetic on UTC dates (never week-truncation, whose start-of-week
    // rules differ across engines). Active-user counts are exact distinct
    // — the per-group KMV sketch gate is the estimator twin at 100 TB.
    ("x_retention_cohorts",
      (s: SparkSession, d: String) => {
        val ev = Tables.events(s, d)
        val firsts = ev.groupBy("user_id").agg(to_date(min(col("ts"))).as("cohort_day"))
        ev.select(col("user_id"), to_date(col("ts")).as("day"))
          .join(broadcast(firsts), "user_id")
          .withColumn("week_offset",
            (datediff(col("day"), col("cohort_day")) / 7).cast("long"))
          .groupBy("cohort_day", "week_offset")
          .agg(countDistinct(col("user_id")).as("active_users"))
          .orderBy("cohort_day", "week_offset")
      },
      """WITH f AS (
        |  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        |  FROM events GROUP BY 1)
        |SELECT f.cohort_day,
        |  CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE)) // 7 AS BIGINT)
        |    AS week_offset,
        |  count(DISTINCT e.user_id) AS active_users
        |FROM events e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // X9c: event-sequence TRANSITION MATRIX — per-user consecutive-event
    // bigrams (the Markov-chain view of behavioral data; the input to
    // next-action models and anomaly scores). One keyed exchange + a lag
    // window per user, then a hash agg onto the |types|² matrix — tiny
    // output no matter the corpus. Ordering ties break by event_id, so
    // same-timestamp events sequence identically in both engines; counts
    // are exact BIGINTs.
    ("x_event_transitions",
      (s: SparkSession, d: String) =>
        transitionMatrix(Tables.events(s, d)).orderBy("from_type", "to_type"),
      """WITH seq AS (
        |  SELECT user_id, event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_type
        |  FROM events)
        |SELECT from_type, to_type, count(*) AS transitions,
        |  count(DISTINCT user_id) AS users
        |FROM seq WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // X9d: SKYLINE (Pareto frontier) — parts no other part beats on BOTH
    // criteria (cheaper price AND larger size): the multi-criteria
    // selection operator relational algebra has no primitive for (skyline
    // work exists as Spark SQL extensions in the EDBT'23 literature). The
    // distributed shape: one corpus-linear hash agg collapses the corpus
    // to min-price-per-size (|size domain| rows — 50 here), then the
    // strictly-decreasing price envelope is a window over that DOMAIN-
    // BOUNDED set (never the corpus; at 100 TB the agg still reduces to
    // |domain| rows and the frontier math is unchanged), and survivors
    // broadcast back to count supporting rows. Exact DECIMAL/INT
    // comparisons throughout; the oracle is an INDEPENDENT brute-force
    // NOT-EXISTS dominance test, so agreement proves the envelope
    // formulation correct, not just reproducible.
    ("x_skyline",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val pts = Tables.part(s, d).select(col("p_size"),
          col("p_retailprice").cast("decimal(12,2)").as("price"))
        val bySize = pts.groupBy("p_size").agg(min(col("price")).as("min_price"))
        // window over ≤ |size domain| rows: bounded by the value domain,
        // not the corpus — the single partition holds ~50 rows by contract
        val larger = Window.orderBy(col("p_size").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val frontier = bySize
          .withColumn("best_larger", min(col("min_price")).over(larger))
          .filter(col("best_larger").isNull || col("min_price") < col("best_larger"))
          // fresh names: frontier descends from pts, so the support join
          // below is a self-join — qualify to keep the analyzer honest
          .select(col("p_size").as("sky_size"), col("min_price"))
        pts.join(broadcast(frontier),
            col("p_size") === col("sky_size") && col("price") === col("min_price"))
          .groupBy(col("sky_size"), col("min_price"))
          .agg(count(lit(1)).as("n"))
          .select(col("sky_size").as("p_size"),
            col("min_price").cast("double").as("min_price"), col("n"))
          .orderBy("p_size")
      },
      """WITH pts AS (
        |  SELECT p_size, CAST(p_retailprice AS DECIMAL(12,2)) AS price FROM part),
        |sky AS (SELECT p_size, min(price) AS min_price FROM pts GROUP BY 1),
        |frontier AS (
        |  SELECT s.p_size, s.min_price FROM sky s
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM sky t
        |    WHERE t.p_size > s.p_size AND t.min_price <= s.min_price))
        |SELECT f.p_size, CAST(f.min_price AS DOUBLE) AS min_price, count(*) AS n
        |FROM pts p JOIN frontier f
        |  ON p.p_size = f.p_size AND p.price = f.min_price
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin),

    // X7e: BM25-RANKED retrieval over the persisted inverted index — the
    // relevance upgrade of x_keyword_search's summed-tf ranking. Every
    // input derives from the INDEX (probes prune to the terms' buckets;
    // doc lengths + corpus stats are one narrow (doc_id, tf) aggregate
    // over it) — text is never re-read at query time. The idf is the
    // RAW-RATIO Robertson form (N - df + 0.5)/(df + 0.5) with NO log:
    // +,-,*,/ are IEEE-correctly-rounded in both engines, so a mirrored
    // expression tree bit-matches, while ln() is correctly rounded in
    // neither (the same discipline as x_tfidf). k1 = 1.25 and b = 0.75 are
    // DYADIC (exactly representable), so even the constants cannot differ.
    // Per-doc score sums ≤ 2 term contributions — 2-term double addition
    // is commutative, so aggregation order cannot diverge. DuckDB has no
    // index; its oracle recomputes tf/df/dl from raw text, so agreement
    // proves the index serves the exact corpus statistics.
    ("x_bm25",
      (s: SparkSession, d: String) => {
        val t = buildInvertedIndex(s, Tables.documents(s, d), TableOps.newCatalog())
        val (scA, scB, scored) = bm25Scored(s, t, "merge", "window")
        scored
          .withColumn("pruned",
            lit(scA.metrics.filesScanned < scA.metrics.filesTotal &&
              scB.metrics.filesScanned < scB.metrics.filesTotal))
          .orderBy(col("score").desc, col("doc_id")).limit(20)
      },
      s"""WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
        |  GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len
        |          FROM dl),
        |dfs AS (SELECT token, count(*) AS df FROM tf
        |        WHERE token IN ('merge', 'window') GROUP BY 1),
        |scored AS (
        |  SELECT t.doc_id,
        |    ((CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5) /
        |     (CAST(f.df AS DOUBLE) + 0.5)) *
        |    ((CAST(t.tf AS DOUBLE) * 2.25) /
        |     (CAST(t.tf AS DOUBLE) + 1.25 * (0.25 + 0.75 *
        |        (CAST(l.dl AS DOUBLE) /
        |         (CAST(s.total_len AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))
        |      AS contrib
        |  FROM tf t JOIN dfs f USING (token) JOIN dl l USING (doc_id)
        |  CROSS JOIN stats s)
        |SELECT doc_id, sum(contrib) AS score, count(*) AS n_terms,
        |  true AS pruned
        |FROM scored GROUP BY 1
        |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin),

    // X7f: PHRASE search over a POSITIONAL inverted index — adjacency
    // queries ("merge group" as consecutive tokens, not AND-of-terms) that
    // never touch document text: both terms' occurrence lists come from
    // PRUNED bucket scans of the positional index ([[positionalPostingsOf]])
    // and the phrase match is an equi-join on (doc_id, pos + 1) — exact
    // BIGINT arithmetic, no text, no windows. Phrase tf per doc ranks with
    // id tie-breaks. The index holds one row per token occurrence — the
    // standard positional-index storage cost, written once and bucket-
    // partitioned so every future phrase probe reads 2/16 of it. The
    // oracle recomputes positions from raw text with 1-based subscripts —
    // the same relative `+ 1` join, proving base-offset independence.
    ("x_phrase_search",
      (s: SparkSession, d: String) => {
        val t = buildPositionalIndex(s, Tables.documents(s, d), TableOps.newCatalog())
        val (scA, a) = probeTermPositions(s, t, "merge")
        val (scB, b) = probeTermPositions(s, t, "group")
        a.join(b.withColumnRenamed("pos", "pos_b"),
            a("doc_id") === b("doc_id") && col("pos_b") === col("pos") + lit(1L))
          .groupBy(a("doc_id").as("doc_id"))
          .agg(count(lit(1)).as("phrase_tf"))
          .withColumn("pruned",
            lit(scA.metrics.filesScanned < scA.metrics.filesTotal &&
              scB.metrics.filesScanned < scB.metrics.filesTotal))
          .orderBy(col("phrase_tf").desc, col("doc_id")).limit(20)
      },
      s"""WITH pos AS (
        |  SELECT doc_id, unnest(toks) AS token,
        |    CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos
        |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
        |m AS (
        |  SELECT a.doc_id, count(*) AS phrase_tf
        |  FROM pos a JOIN pos b
        |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |  WHERE a.token = 'merge' AND b.token = 'group'
        |  GROUP BY 1)
        |SELECT doc_id, phrase_tf, true AS pruned
        |FROM m ORDER BY phrase_tf DESC, doc_id LIMIT 20""".stripMargin),

    // X4j: WINDOWED CO-OCCURRENCE + raw PMI — the collocation signal
    // (which token pairs appear together more than chance) behind phrase
    // mining and tokenizer-merge candidates. Pair generation is ONE doc-id
    // exchange: a single Window computes lead(1..3) together (one sort,
    // three offsets), so every token emits ≤ 3 pairs map-side after the
    // sort — pair volume is 3·tokens by construction, NEVER vocab² (the
    // agg output is bounded by observed pairs, and the ≥ 5 support filter
    // lands before any join). Unordered pairs canonicalize via
    // least/greatest (byte-identical on the ASCII token contract the
    // neardup-edit canary pins). The score is RAW PMI — c_ab·N/(c_a·c_b),
    // no log, same discipline as x_tfidf/x_bm25 — computed from exact
    // BIGINTs in one mirrored double expression; ties break on the pair.
    ("x_cooccurrence",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), posexplode(TF.tokens(col("text"))).as(Seq("pos", "token")))
        val w = Window.partitionBy("doc_id").orderBy("pos")
        val led = toks.select(col("token").as("t"),
          array((1 to 3).map(i => lead(col("token"), i).over(w)): _*).as("nbrs"))
        val pairs = led.select(col("t"), explode(col("nbrs")).as("u"))
          .filter(col("u").isNotNull)
          .select(least(col("t"), col("u")).as("a"),
            greatest(col("t"), col("u")).as("b"))
        val pc = pairs.groupBy("a", "b").agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 5)
        // the pair total has a CLOSED FORM from per-doc token counts —
        // Σ_docs Σ_{k=1..3} max(len−k, 0) — so the normalizer is one
        // map-side aggregate over the corpus, not a second run of the
        // window/explode pipeline (which recomputes per referencing plan)
        val total = Tables.documents(s, d)
          .select(size(TF.tokens(col("text"))).cast("long").as("len"))
          .agg(sum(greatest(col("len") - 1, lit(0L)) +
            greatest(col("len") - 2, lit(0L)) +
            greatest(col("len") - 3, lit(0L))).as("n_pairs"))
        val uni = toks.groupBy(col("token")).agg(count(lit(1)).as("c"))
        pc
          .join(uni.select(col("token").as("a"), col("c").as("c_a")), "a")
          .join(uni.select(col("token").as("b"), col("c").as("c_b")), "b")
          .crossJoin(broadcast(total))
          .withColumn("pmi_raw",
            (col("c_ab").cast("double") * col("n_pairs").cast("double")) /
              (col("c_a").cast("double") * col("c_b").cast("double")))
          .select("a", "b", "c_ab", "pmi_raw")
          .orderBy(col("pmi_raw").desc, col("a"), col("b")).limit(20)
      },
      s"""WITH pos AS (
        |  SELECT doc_id, unnest(toks) AS token,
        |    generate_subscripts(toks, 1) AS pos
        |  FROM (SELECT doc_id, $toksSql AS toks FROM documents)),
        |led AS (
        |  SELECT token AS t,
        |    lead(token, 1) OVER w AS n1,
        |    lead(token, 2) OVER w AS n2,
        |    lead(token, 3) OVER w AS n3
        |  FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
        |pairs AS (
        |  SELECT least(t, u) AS a, greatest(t, u) AS b
        |  FROM (SELECT t, unnest([n1, n2, n3]) AS u FROM led)
        |  WHERE u IS NOT NULL),
        |pc AS (SELECT a, b, count(*) AS c_ab FROM pairs
        |       GROUP BY 1, 2 HAVING count(*) >= 5),
        |total AS (
        |  SELECT CAST(sum(greatest(len - 1, 0) + greatest(len - 2, 0) +
        |    greatest(len - 3, 0)) AS BIGINT) AS n_pairs
        |  FROM (SELECT CAST(len($toksSql) AS BIGINT) AS len FROM documents)),
        |uni AS (SELECT token, count(*) AS c FROM pos GROUP BY 1)
        |SELECT p.a, p.b, p.c_ab,
        |  (CAST(p.c_ab AS DOUBLE) * CAST(t.n_pairs AS DOUBLE)) /
        |  (CAST(ua.c AS DOUBLE) * CAST(ub.c AS DOUBLE)) AS pmi_raw
        |FROM pc p JOIN uni ua ON p.a = ua.token
        |JOIN uni ub ON p.b = ub.token
        |CROSS JOIN total t
        |ORDER BY pmi_raw DESC, a, b LIMIT 20""".stripMargin),

    // X8a: ANOMALY DAYS — per-event-type daily volumes z-tested against
    // that type's own full daily history, with the FLAG decided in exact
    // integer arithmetic: cross-multiplying z² > 9 into
    // (x·n − S)² > 9·(n·Q − S²) (S = Σx, Q = Σx² — both one hash agg)
    // removes mean/stddev floats from the decision entirely, so a
    // borderline day cannot flip between engines on a rounding ulp. The
    // surfaced z² IS one mirrored double expression over those exact
    // BIGINTs (ranking only). Zero-variance types guard to z² = 0 / flag
    // false on both sides. Daily counts aggregate BEFORE the per-type
    // stats join (broadcast — |types| rows), so the corpus contributes
    // one shuffle of (type, day) cells, never raw events. At counts past
    // ~3e9/day the BIGINT squares need the DECIMAL(38)/HUGEINT widening
    // (same upgrade x_embed_quantize documents for its sums).
    ("x_anomaly_days",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("cnt"))
        val stats = daily.groupBy("event_type").agg(
          count(lit(1)).as("n"), sum(col("cnt")).as("s"),
          sum(col("cnt") * col("cnt")).as("q"))
        daily.join(broadcast(stats), "event_type")
          .withColumn("dev", col("cnt") * col("n") - col("s"))
          .withColumn("denom", col("n") * col("q") - col("s") * col("s"))
          .withColumn("z2", when(col("denom") > 0,
            (col("dev").cast("double") * col("dev").cast("double")) /
              col("denom").cast("double")).otherwise(lit(0.0)))
          .withColumn("is_anomaly",
            col("denom") > 0 && col("dev") * col("dev") > lit(9L) * col("denom"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("event_type").orderBy(col("z2").desc, col("day"))))
          .filter(col("rk") <= 3)
          .select("event_type", "day", "cnt", "z2", "is_anomaly")
          .orderBy("event_type", "day")
      },
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type, count(*) AS n, CAST(sum(cnt) AS BIGINT) AS s,
        |    CAST(sum(cnt * cnt) AS BIGINT) AS q
        |  FROM daily GROUP BY 1),
        |scored AS (
        |  SELECT d.event_type, d.day, d.cnt,
        |    d.cnt * t.n - t.s AS dev, t.n * t.q - t.s * t.s AS denom
        |  FROM daily d JOIN stats t USING (event_type)),
        |ranked AS (
        |  SELECT event_type, day, cnt,
        |    CASE WHEN denom > 0
        |      THEN (CAST(dev AS DOUBLE) * CAST(dev AS DOUBLE)) /
        |           CAST(denom AS DOUBLE)
        |      ELSE 0.0 END AS z2,
        |    denom > 0 AND dev * dev > 9 * denom AS is_anomaly
        |  FROM scored),
        |top AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY z2 DESC, day) AS rk FROM ranked)
        |SELECT event_type, day, cnt, z2, is_anomaly
        |FROM top WHERE rk <= 3 ORDER BY event_type, day""".stripMargin),

    // X8b: CO-PURCHASE pair mining (frequent itemsets at the pair level) —
    // the market-basket signal behind "bought together" and product-graph
    // edges. Baskets self-join ONLY within an order (the join key), so
    // pair volume is Σ C(basket, 2) — bounded by a basket-size cap of 64
    // (one window count over the SAME orderkey partitioning the distinct
    // and the join already use): a degenerate mega-basket (one retailer
    // account ordering the whole catalog) costs C(64,2), never C(huge,2) —
    // the quadratic-blowup guard every pair generator in this file
    // carries. Support counts are exact BIGINTs; top-k ties break on the
    // pair, so the ranking is deterministic even where support is flat
    // (most pairs occur once in a sparse catalog — the realistic shape).
    ("x_copurchase",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val items = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val capped = items
          .withColumn("basket", count(lit(1)).over(Window.partitionBy("l_orderkey")))
          .filter(col("basket") <= 64)
        val a = capped.select(col("l_orderkey").as("k"), col("l_partkey").as("pa"))
        val b = capped.select(col("l_orderkey").as("k"), col("l_partkey").as("pb"))
        a.join(b, Seq("k")).filter(col("pa") < col("pb"))
          .groupBy("pa", "pb").agg(count(lit(1)).as("support"))
          .orderBy(col("support").desc, col("pa"), col("pb")).limit(20)
      },
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |capped AS (
        |  SELECT l_orderkey, l_partkey FROM (
        |    SELECT l_orderkey, l_partkey,
        |      count(*) OVER (PARTITION BY l_orderkey) AS basket FROM items)
        |  WHERE basket <= 64)
        |SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS support
        |FROM capped a JOIN capped b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY 1, 2 ORDER BY support DESC, pa, pb LIMIT 20""".stripMargin),

    // X8c: TRIANGLE COUNT on the co-purchase graph — the global clustering
    // signal (are "bought together" relations transitive?), implemented as
    // the DEGREE-ORIENTED wedge join: every undirected edge points from
    // its lower-(degree, id) endpoint to the higher, so wedge fanout per
    // node is Σ C(outdeg, 2) ≲ O(m^1.5) TOTAL regardless of skew — a
    // celebrity part with degree 10⁵ generates wedges only toward its
    // handful of higher-rank peers, never C(10⁵, 2). This is the standard
    // scalable formulation (three hash shuffles: degree agg, wedge
    // self-join on the pivot, closing probe on the (d1, d2) edge set);
    // naive all-wedges would put the skew square through the exchange.
    // The graph samples 1/4 of orders by md5 prefix (corpus-relative knob
    // — edge count tracks order count, keeping the wedge set ~2M at
    // sf0.1); baskets are cliques, so Σ C(basket≥3, 3) guarantees real
    // triangles at every SF. Output is one summary row; closure = 3T/W is
    // the one mirrored double division.
    ("x_triangles",
      (s: SparkSession, d: String) =>
        triangleStats(s, Tables.lineitem(s, d)
          .filter(substring(md5(col("l_orderkey").cast("string")), 1, 1) < "4")
          .select(col("l_orderkey"), col("l_partkey")).distinct()),
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) < '4'),
        |capped AS (
        |  SELECT l_orderkey, l_partkey FROM (
        |    SELECT l_orderkey, l_partkey,
        |      count(*) OVER (PARTITION BY l_orderkey) AS basket FROM items)
        |  WHERE basket <= 64),
        |edges AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM capped a JOIN capped b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |deg AS (
        |  SELECT node, count(*) AS deg FROM (
        |    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)
        |  GROUP BY 1),
        |oriented AS (
        |  SELECT
        |    CASE WHEN du < dv OR (du = dv AND u < v) THEN u ELSE v END AS src,
        |    CASE WHEN du < dv OR (du = dv AND u < v) THEN v ELSE u END AS dst,
        |    CASE WHEN du < dv OR (du = dv AND u < v) THEN dv ELSE du END AS ddst
        |  FROM (SELECT e.u, e.v, a.deg AS du, b.deg AS dv
        |        FROM edges e JOIN deg a ON e.u = a.node
        |        JOIN deg b ON e.v = b.node)),
        |wedges AS (
        |  SELECT a.src, a.dst AS d1, b.dst AS d2
        |  FROM oriented a JOIN oriented b ON a.src = b.src
        |  WHERE a.ddst < b.ddst OR (a.ddst = b.ddst AND a.dst < b.dst)),
        |t AS (SELECT count(*) AS n_triangles FROM wedges w
        |      JOIN oriented o ON w.d1 = o.src AND w.d2 = o.dst),
        |e AS (SELECT count(*) AS n_edges FROM edges),
        |w AS (SELECT count(*) AS n_wedges FROM wedges),
        |p AS (SELECT CAST(sum(deg * (deg - 1)) AS BIGINT) // 2 AS n_paths2
        |      FROM deg)
        |SELECT e.n_edges, w.n_wedges, p.n_paths2, t.n_triangles,
        |  CASE WHEN p.n_paths2 > 0
        |    THEN (3.0 * CAST(t.n_triangles AS DOUBLE)) / CAST(p.n_paths2 AS DOUBLE)
        |    ELSE 0.0 END AS transitivity
        |FROM e, w, p, t""".stripMargin),

    // X8d: SESSION PATH mining — the top user journeys (ordered event-type
    // sequences per 30-min-gap session, truncated to 5 steps), the
    // behavioral summary x_funnel (fixed steps) and x_event_transitions
    // (bigrams) cannot show. Session assignment is x_sessionize's
    // lag/cumsum shape on ONE user-id exchange; within-session ranks and
    // the path aggregate share a second (user, session) exchange (the rank
    // filter cuts volume to ≤ 5 rows per session BEFORE the aggregate).
    // Path strings build from collect_list(struct(rn, type)) + array_sort
    // — the sort on the embedded rank makes the unordered aggregate
    // deterministic (DuckDB's ordered string_agg is the native twin).
    // Same-timestamp events sequence by event_id on BOTH sides.
    ("x_session_paths",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val prev = lag(col("ts"), 1).over(w)
        val gapped = Tables.events(s, d)
          .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
            col("event_id"), col("event_type"))
          .withColumn("new_s",
            when(prev.isNull ||
              unix_millis(col("ts")) - unix_millis(prev) > 1800000L, lit(1L))
              .otherwise(lit(0L)))
        val sid = gapped.withColumn("sid", sum(col("new_s")).over(w))
        val rn = sid.withColumn("rn", row_number().over(
          Window.partitionBy("user_id", "sid").orderBy(col("ts"), col("event_id"))))
        rn.filter(col("rn") <= 5)
          .groupBy("user_id", "sid")
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("rn"), col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path")).limit(15)
      },
      """WITH g AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_ms(CAST(ts AS TIMESTAMP)) -
        |              epoch_ms(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sl AS (
        |  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM g),
        |rn AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, sid
        |    ORDER BY ts, event_id) AS rn
        |  FROM sl),
        |paths AS (
        |  SELECT user_id, sid, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM rn WHERE rn <= 5 GROUP BY 1, 2)
        |SELECT path, count(*) AS n FROM paths
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 15""".stripMargin),

    // X8e: PAGERANK in exact FIXED-POINT integers — 5 power iterations
    // over the (symmetrized) co-purchase sample graph with every step pure
    // BIGINT: mass starts at S/N (S = 10^12), each node ships
    // p div outdeg along its edges, and the damped update is
    // base + (85·Σ) div 100 with base = (15·(S div N)) div 100. Floor
    // division is engine-identical on non-negative BIGINTs, so after any
    // number of iterations both engines hold the SAME integers — the
    // float-PageRank alternative diverges across engines AND across
    // partitionings (summation order), which is why no float iterative
    // rank can ever be oracle-gated. Each Spark iteration is one edge
    // join + one hash aggregate with lineage cut (localCheckpoint — the
    // BSP loop discipline of connectedComponents); the oracle unrolls the
    // same 5 iterations as chained CTEs. Ranking is by exact integer,
    // ties on node id.
    ("x_pagerank",
      (s: SparkSession, d: String) => {
        val items = Tables.lineitem(s, d)
          .filter(substring(md5(col("l_orderkey").cast("string")), 1, 1) < "4")
          .select(col("l_orderkey"), col("l_partkey")).distinct()
        val und = basketEdges(items)
        val edges = und.union(und.select(col("v").as("u"), col("u").as("v")))
        pagerankScores(edges).orderBy(col("p").desc, col("node")).limit(10)
      },
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 1) < '4'),
        |capped AS (
        |  SELECT l_orderkey, l_partkey FROM (
        |    SELECT l_orderkey, l_partkey,
        |      count(*) OVER (PARTITION BY l_orderkey) AS basket FROM items)
        |  WHERE basket <= 64),
        |und AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM capped a JOIN capped b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |edges AS (SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und),
        |outdeg AS (SELECT u AS node, count(*) AS outdeg FROM edges GROUP BY 1),
        |c AS (SELECT 1000000000000 // count(*) AS p0,
        |        (15 * (1000000000000 // count(*))) // 100 AS base
        |      FROM outdeg),
        |p0 AS (SELECT node, (SELECT p0 FROM c) AS p FROM outdeg),
        |p1 AS (SELECT e.v AS node, (SELECT base FROM c) +
        |         (85 * CAST(sum(p.p // o.outdeg) AS BIGINT)) // 100 AS p
        |       FROM edges e JOIN outdeg o ON e.u = o.node
        |       JOIN p0 p ON e.u = p.node GROUP BY 1),
        |p2 AS (SELECT e.v AS node, (SELECT base FROM c) +
        |         (85 * CAST(sum(p.p // o.outdeg) AS BIGINT)) // 100 AS p
        |       FROM edges e JOIN outdeg o ON e.u = o.node
        |       JOIN p1 p ON e.u = p.node GROUP BY 1),
        |p3 AS (SELECT e.v AS node, (SELECT base FROM c) +
        |         (85 * CAST(sum(p.p // o.outdeg) AS BIGINT)) // 100 AS p
        |       FROM edges e JOIN outdeg o ON e.u = o.node
        |       JOIN p2 p ON e.u = p.node GROUP BY 1),
        |p4 AS (SELECT e.v AS node, (SELECT base FROM c) +
        |         (85 * CAST(sum(p.p // o.outdeg) AS BIGINT)) // 100 AS p
        |       FROM edges e JOIN outdeg o ON e.u = o.node
        |       JOIN p3 p ON e.u = p.node GROUP BY 1),
        |p5 AS (SELECT e.v AS node, (SELECT base FROM c) +
        |         (85 * CAST(sum(p.p // o.outdeg) AS BIGINT)) // 100 AS p
        |       FROM edges e JOIN outdeg o ON e.u = o.node
        |       JOIN p4 p ON e.u = p.node GROUP BY 1)
        |SELECT node, p FROM p5 ORDER BY p DESC, node LIMIT 10""".stripMargin),

    // X8f: OLS TREND detection — per-event-type least-squares slope of
    // daily volume over the day index, from the closed-form aggregate
    // identity slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²): ONE pass of
    // exact BIGINT sums (x = epoch-day, y = daily count), no iteration,
    // no centering pass — the one-shuffle regression shape that works at
    // any scale. The RISING flag is the exact SIGN of the numerator
    // (integer comparison — a flat-vs-rising call can't flip on float
    // rounding); the surfaced slope is the one mirrored double division.
    // Numerator/denominator are also emitted as exact integers, so the
    // gate hash-checks the algebra, not just the rounded quotient. Counts
    // past ~1e9/day need the DECIMAL(38)/HUGEINT widening (documented on
    // x_anomaly_days).
    ("x_ols_trend",
      (s: SparkSession, d: String) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("y"))
          .withColumn("x", unix_date(col("day")).cast("long"))
        daily.groupBy("event_type").agg(
            count(lit(1)).as("n"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .withColumn("slope_num", col("n") * col("sxy") - col("sx") * col("sy"))
          .withColumn("slope_den", col("n") * col("sxx") - col("sx") * col("sx"))
          .withColumn("slope", when(col("slope_den") > 0,
            col("slope_num").cast("double") / col("slope_den").cast("double"))
            .otherwise(lit(0.0)))
          .withColumn("rising", col("slope_num") > 0)
          .select("event_type", "n", "slope_num", "slope_den", "slope", "rising")
          .orderBy("event_type")
      },
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS y
        |  FROM events GROUP BY 1, 2),
        |sums AS (
        |  SELECT event_type, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM (SELECT event_type, y,
        |          CAST(date_diff('day', DATE '1970-01-01', day) AS BIGINT) AS x
        |        FROM daily)
        |  GROUP BY 1)
        |SELECT event_type, n,
        |  n * sxy - sx * sy AS slope_num,
        |  n * sxx - sx * sx AS slope_den,
        |  CASE WHEN n * sxx - sx * sx > 0
        |    THEN CAST(n * sxy - sx * sy AS DOUBLE) /
        |         CAST(n * sxx - sx * sx AS DOUBLE)
        |    ELSE 0.0 END AS slope,
        |  n * sxy - sx * sy > 0 AS rising
        |FROM sums ORDER BY event_type""".stripMargin),

    // X4k: SIMPSON DIVERSITY of the per-language token distribution —
    // the log-free twin of Shannon entropy (entropy's ln is correctly
    // rounded in neither engine; Simpson's λ = Σc²/T² is pure integer
    // sums + one mirrored division, the same reasoning that picked raw
    // idf for x_tfidf). λ is the collision probability of two random
    // tokens; 1/λ is the effective vocabulary size — the corpus-health
    // number that catches a degenerate crawl (boilerplate-dominated
    // languages collapse toward 1/λ ≈ a handful of tokens) where raw
    // vocab counts look healthy. One (lang, token) hash agg then a
    // |langs|-row agg; per-token counts past ~3e9 need the same
    // DECIMAL(38)/HUGEINT widening as every integer-square gate here.
    ("x_simpson_diversity",
      (s: SparkSession, d: String) => {
        val tc = Tables.documents(s, d)
          .select(col("lang"), explode(TF.tokens(col("text"))).as("token"))
          .groupBy("lang", "token").agg(count(lit(1)).as("c"))
        tc.groupBy("lang").agg(
            count(lit(1)).as("vocab"),
            sum(col("c")).as("total"),
            sum(col("c") * col("c")).as("sum_sq"))
          .withColumn("simpson",
            lit(1.0) - (col("sum_sq").cast("double") /
              (col("total").cast("double") * col("total").cast("double"))))
          .withColumn("effective_vocab",
            (col("total").cast("double") * col("total").cast("double")) /
              col("sum_sq").cast("double"))
          .orderBy("lang")
      },
      s"""WITH tc AS (
        |  SELECT lang, token, count(*) AS c
        |  FROM (SELECT lang, unnest($toksSql) AS token FROM documents)
        |  GROUP BY 1, 2),
        |agg AS (
        |  SELECT lang, count(*) AS vocab, CAST(sum(c) AS BIGINT) AS total,
        |    CAST(sum(c * c) AS BIGINT) AS sum_sq
        |  FROM tc GROUP BY 1)
        |SELECT lang, vocab, total, sum_sq,
        |  1.0 - (CAST(sum_sq AS DOUBLE) /
        |         (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))) AS simpson,
        |  (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)) /
        |    CAST(sum_sq AS DOUBLE) AS effective_vocab
        |FROM agg ORDER BY lang""".stripMargin),

    // X2j: FUZZY eval-set decontamination — the NEAR-DUP cross-corpus
    // variant of x_decontaminate (whose any-shared-3-gram test catches
    // verbatim leaks but misses a lightly-edited eval copy): train docs
    // are dropped when banded-MinHash nomination + exact-Jaccard ≥ 0.5
    // verification matches them to ANY eval doc. Candidates come from an
    // equi-join of the two sides' (band, sig) keys — per-signature join
    // volume is |train_sig| · |eval_sig|, LINEAR in the train occupancy
    // because the eval factor is capped by the eval suite's size (eval
    // suites are tiny and broadcast whole at any corpus scale — the same
    // asymmetry x_decontaminate exploits). Verification reuses
    // pairJaccard's measured-broadcast discipline over the id-disjoint
    // union of the two corpora: shingles once per matched doc, text never
    // shuffles. The fixture plants lightly-edited leaks in-query (eval
    // text + a 2-token suffix, Jaccard ≈ n/(n+3) » 0.5), so both the
    // planted and any organic train↔eval near-dups must be caught — the
    // oracle mirrors nomination AND verification, so agreement proves the
    // band join lost no leak the oracle sees.
    ("x_fuzzy_decontaminate",
      (s: SparkSession, d: String) => {
        val base = Tables.documents(s, d).select(col("doc_id"), col("lang"), col("text"))
        val evalDocs = base.filter(col("doc_id") % 50 === 0)
        val planted = evalDocs.filter(col("doc_id") % 100 === 0)
          .select((col("doc_id") + 1000000000L).as("doc_id"), col("lang"),
            concat(col("text"), lit(" leaked copy")).as("text"))
        val train = base.filter(col("doc_id") % 50 =!= 0).unionByName(planted)
        def bandsOf(df: DataFrame): DataFrame = df
          .withColumn("mins", TF.shingleBandMinima(col("text"), 2, bands = 2, rowsPerBand = 3))
          .select(col("doc_id"),
            posexplode(TF.bandsFromMinima(col("mins"), 2, 3)).as(Seq("band", "sig")))
        val cand = bandsOf(train).select(col("doc_id").as("doc_a"), col("band"), col("sig"))
          .join(bandsOf(evalDocs).select(col("doc_id").as("doc_b"), col("band"), col("sig")),
            Seq("band", "sig"))
          .select("doc_a", "doc_b").distinct()
        val leaks = pairJaccard(
            train.select("doc_id", "text").unionByName(evalDocs.select("doc_id", "text")),
            cand)
          .filter(col("jaccard") >= 0.5)
          .select(col("doc_a").as("doc_id")).distinct()
        val kept = train.join(leaks, Seq("doc_id"), "left_anti")
          .groupBy("lang").agg(count(lit(1)).as("kept"))
        train.groupBy("lang").agg(count(lit(1)).as("train_docs"))
          .join(kept, Seq("lang"), "left")
          .withColumn("kept", coalesce(col("kept"), lit(0L)))
          .select(col("lang"), col("train_docs"),
            (col("train_docs") - col("kept")).as("dropped"), col("kept"))
          .orderBy("lang")
      },
      s"""WITH ev AS (
        |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 50 = 0),
        |tr AS (
        |  SELECT doc_id, lang, text FROM documents WHERE doc_id % 50 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000000 AS doc_id, lang, text || ' leaked copy' AS text
        |  FROM documents WHERE doc_id % 100 = 0),
        |sh_tr AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
        |        FROM tr)),
        |sh_ev AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS t
        |        FROM ev)),
        |b_tr AS (
        |  SELECT doc_id, b, md5(
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 0) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 1) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 2) * 8, 8)))) AS sig
        |  FROM sh_tr, (SELECT unnest([0, 1]) AS b) WHERE len(sh) > 0),
        |b_ev AS (
        |  SELECT doc_id, b, md5(
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 0) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 1) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 2) * 8, 8)))) AS sig
        |  FROM sh_ev, (SELECT unnest([0, 1]) AS b) WHERE len(sh) > 0),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, e.doc_id AS doc_b
        |  FROM b_tr a JOIN b_ev e ON a.b = e.b AND a.sig = e.sig),
        |leak AS (
        |  SELECT DISTINCT c.doc_a AS doc_id
        |  FROM cand c JOIN sh_tr x ON x.doc_id = c.doc_a
        |  JOIN sh_ev y ON y.doc_id = c.doc_b
        |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5)
        |SELECT t.lang, count(*) AS train_docs,
        |  CAST(sum(CASE WHEN l.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dropped,
        |  CAST(sum(CASE WHEN l.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS kept
        |FROM tr t LEFT JOIN leak l USING (doc_id)
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // X2k: INCREMENTAL near-dup dedup — the FUZZY twin of
    // x_incremental_dedup's exact-fingerprint state: the accumulated
    // corpus is represented by a PERSISTED band-signature Graft table
    // ((band, sig, doc_id), sig-bucketed), and a new batch dedups against
    // it by (band, sig) equi-join nomination + exact-Jaccard ≥ 0.5 verify
    // (pairJaccard's measured-broadcast discipline; ids disjoint by
    // construction). History TEXT is needed only for the handful of
    // nominated candidates — the durable state is signatures, 2 narrow
    // rows per doc, which is what makes daily fuzzy dedup affordable at
    // 100 TB (re-signing the accumulated corpus every day would not be).
    // Admitted docs' signatures then APPEND to the state table — the
    // certified maintenance step: every pre-refresh file survives
    // byte-identical and the table holds exactly 2 commits, so tomorrow's
    // batch sees today's admissions with nothing recomputed. The fixture
    // plants lightly-edited recrawls of history docs (text + a 2-token
    // tail, Jaccard » 0.5); the 2-band OR catches them at the banded
    // LSH's real recall (an added shingle can displace a band minimum, so
    // an individual recrawl may legitimately escape nomination — BOTH
    // engines agree on exactly which, which is the point of mirroring the
    // nomination). The oracle recomputes everything from raw text,
    // proving the persisted signature state lost nothing.
    ("x_incremental_neardup",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        val (hist, batch) =
          neardupCrawlFixture(Tables.documents(s, d).select("doc_id", "lang", "text"))
        val cat = TableOps.newCatalog()
        val histSigs = bandSigsOf(hist)
        val t = cat.createTable("db.neardup_sigs", histSigs.schema,
          partitionBy = Seq("sig" -> Transform.Bucket(4)),
          properties = Map(graft.format.TableProperties.BloomColumns -> "sig"))
        t.append(s, histSigs)
        val filesBefore = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        val admitted = neardupAdmitAndAppend(s, t, hist, batch)
        val filesAfter = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        admitted.groupBy("lang").agg(count(lit(1)).as("admitted"))
          .withColumn("append_only",
            lit(filesBefore.subsetOf(filesAfter) && filesAfter.size > filesBefore.size))
          .withColumn("incremental_commits", lit(t.meta.snapshots.size.toLong))
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
        |b_h AS (
        |  SELECT doc_id, b, md5(
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 0) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 1) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 2) * 8, 8)))) AS sig
        |  FROM sh_h, (SELECT unnest([0, 1]) AS b) WHERE len(sh) > 0),
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
        |  true AS append_only, CAST(2 AS BIGINT) AS incremental_commits
        |FROM batch b LEFT JOIN rej r USING (doc_id)
        |WHERE r.doc_id IS NULL GROUP BY 1 ORDER BY 1""".stripMargin),

    // X2l: STATE-TABLE COMPACTION composes with incremental NEAR-dup —
    // the last of the three persisted dedup states named by r9 verdict #1
    // (fingerprints and postings got their compaction gates in r10; this
    // closes the band-signature table). The signature state accumulates
    // one small file set per crawl batch forever, so compaction must
    // eventually rewrite it — and a lost or duplicated (band, sig, doc_id)
    // row would silently change tomorrow's NOMINATIONS (a missing row
    // admits a true near-dup; a phantom row can reject a novel doc), with
    // no wrong answer today to flag it. The fixture builds the state in
    // TWO appends, binpack-compacts mid-sequence (`compacted` = files
    // strictly decreased, `state_preserved` = zero signature rows lost),
    // dedups the recrawl-bearing batch against the COMPACTED table
    // (nomination by (band, sig) equi-join + exact-Jaccard ≥ 0.5 verify,
    // pairJaccard's measured-broadcast discipline), and finally APPENDS
    // the admitted docs' signatures — proving append still composes after
    // a rewrite (`append_only`, 4 commits: append, append, compact,
    // append). The oracle recomputes the whole decision from raw text
    // with no state, no compaction, no commits — agreement proves the
    // maintenance event is invisible to the dedup decision.
    ("x_incremental_neardup_compacted",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        val (hist, batch) =
          neardupCrawlFixture(Tables.documents(s, d).select("doc_id", "lang", "text"))
        val cat = TableOps.newCatalog()
        val sigs1 = bandSigsOf(hist.filter(col("doc_id") % 4 === 0))
        val t = cat.createTable("db.neardup_sigs_c", sigs1.schema,
          partitionBy = Seq("sig" -> Transform.Bucket(4)),
          properties = Map(graft.format.TableProperties.BloomColumns -> "sig"))
        t.append(s, sigs1)
        t.append(s, bandSigsOf(hist.filter(col("doc_id") % 4 === 2)))
        // mid-sequence maintenance on the live signature state; the crawl
        // step below is the SHARED neardupAdmitAndAppend — the only
        // difference from x_incremental_neardup is this rewrite
        val (compacted, statePreserved) = TableOps.compactionProof(s, t)
        val filesPostCompact = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        val admitted = neardupAdmitAndAppend(s, t, hist, batch)
        val filesFinal = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        admitted.groupBy("lang").agg(count(lit(1)).as("admitted"))
          .withColumn("compacted", lit(compacted))
          .withColumn("state_preserved", lit(statePreserved))
          .withColumn("append_only",
            lit(filesPostCompact.subsetOf(filesFinal) && filesFinal.size > filesPostCompact.size))
          .withColumn("maintenance_commits", lit(t.meta.snapshots.size.toLong))
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
        |b_h AS (
        |  SELECT doc_id, b, md5(
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 0) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 1) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 2) * 8, 8)))) AS sig
        |  FROM sh_h, (SELECT unnest([0, 1]) AS b) WHERE len(sh) > 0),
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
        |  true AS compacted, true AS state_preserved, true AS append_only,
        |  CAST(4 AS BIGINT) AS maintenance_commits
        |FROM batch b LEFT JOIN rej r USING (doc_id)
        |WHERE r.doc_id IS NULL GROUP BY 1 ORDER BY 1""".stripMargin),

    // X2m: the STREAMING fuzzy crawl loop — near-dup's missing lifecycle
    // leg (r11 verdict #2), composing the ONE shared neardupAdmitAndAppend
    // into the ONE shared runMicroBatched with x_stream_incremental_dedup's
    // results-BEFORE-state crash ordering, both commits statementId-keyed.
    // Two ordered slices: slice 0 = the odd docs; slice 1 = lightly-edited
    // recrawls of history evens (+1e9) AND of slice-0 odds (+2e9) — the
    // +2e9 class can reject ONLY via the band-signature state carrying
    // slice 0's admissions across the batch boundary, which is the
    // distinction that makes this a crawl loop and not a batch job. The
    // oracle has no streams, batches, or state: it replays the SEQUENTIAL
    // rule in two CTE levels — A0 = odds with no verified (>= 0.5 exact
    // Jaccard) partner among HIST signatures; A1 = slice-1 docs with no
    // verified partner among HIST + A0 — which equals the streamed
    // admissions because slices arrive in stamped order and nomination
    // within a batch sees only the state (same-batch docs never nominate
    // each other, in engine and oracle alike). Per-batch verify text is
    // fetched from the persisted CORPUS table (hist pre-loaded + results
    // appended per batch; the signature state is 2 narrow rows per doc)
    // by an In-probe PRUNED scan of the nominated ids — files skipped
    // via the doc_id bucket/min-max/bloom planes, REQUIREd per batch
    // via ScanMetrics (the r12 graded-weak full-corpus pass). After
    // the crawl: binpack-compact the live signature state, then REPROBE
    // the whole batch against it — every sig-bearing doc must reject
    // (admitted docs via their own signatures, rejected docs via their
    // original partners), so a signature row lost by the rewrite or a
    // statementId replay fails loudly, not silently.
    ("x_stream_incremental_neardup",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
        val hist = docs.filter(col("doc_id") % 2 === 0)
        val odds = docs.filter(col("doc_id") % 2 === 1)
        // recrawl classes are SPARSE (%200 / %100, vs the durable gate's
        // %10 / %20) by design: per-batch nominated candidates must cover
        // far fewer doc_id buckets than the corpus has files, so the
        // pruned-fetch REQUIRE below is a real demonstration at every SF
        // — the production regime, where a micro-batch's candidates are
        // minuscule next to the accumulated corpus
        val batch = odds
          .unionByName(hist.filter(col("doc_id") % 200 === 0)
            .select((col("doc_id") + 1000000000L).as("doc_id"), col("lang"),
              concat(col("text"), lit(" recrawl tail")).as("text")))
          .unionByName(odds.filter(col("doc_id") % 100 === 1)
            .select((col("doc_id") + 2000000000L).as("doc_id"), col("lang"),
              concat(col("text"), lit(" recrawl tail")).as("text")))
        val stage = TableOps.newTempDir("graft-sind")
        val (t, corpusT, histSnap) = FixtureClock.timed { // history build + staging I/O
          val cat = TableOps.newCatalog()
          val histSigs = bandSigsOf(hist)
          val tbl = cat.createTable("db.neardup_sigs_s", histSigs.schema,
            partitionBy = Seq("sig" -> Transform.Bucket(4)),
            properties = Map(graft.format.TableProperties.BloomColumns -> "sig"))
          tbl.append(s, histSigs)
          // the crawl CORPUS — history pre-loaded, admitted rows appended
          // per batch: doc_id-bucketed AND bloom-indexed so each batch's
          // candidate-text fetch prunes to the nominated ids' files (the
          // x_incremental_dedup state shape, applied to TEXT). Bucket
          // count SIZED TO THE CORPUS: partitionBy writes one file per
          // bucket value present per commit, so an oversized bucket count
          // taxes every commit with file fanout (128 buckets on this
          // sf-scale corpus doubled the gate's wall time) while 64 keeps
          // the per-batch candidate probe (≤75 ids at sf0.1, hitting
          // ~44/64 buckets) comfortably below a full read — at 100 TB
          // you'd size this to data the same way.
          val corp = cat.createTable("db.neardup_corpus_s", batch.schema,
            partitionBy = Seq("doc_id" -> Transform.Bucket(64)),
            properties = Map(graft.format.TableProperties.BloomColumns -> "doc_id"))
          corp.append(s, hist)
          stageOrderedSlices(batch, stage,
            when(col("doc_id") < 1000000000L, 0).otherwise(1), 2)
          (tbl, corp, corp.meta.currentSnapshotId.get)
        }
        val fetches = scala.collection.mutable.Buffer.empty[graft.table.ScanMetrics]
        val batches = streamIncrementalNeardup(s, stage, batch.schema, t, corpusT,
          onFetchMetrics = fetches += _)
        val stateCommits = t.meta.snapshots.size // before the compaction commit
        require(batches == 2 && corpusT.meta.snapshots.size == 3 &&
            stateCommits == 3, // hist + one per micro-batch (corpus: +hist load)
          s"fuzzy crawl must run micro-batched: $batches batches, " +
            s"${corpusT.meta.snapshots.size}/$stateCommits commits")
        // the 100 TB fact, REQUIREd per batch: the candidate-text fetch
        // read a PRUNED corpus scan — the bounded In probe of nominated
        // ids let the bucket-partition/min-max/bloom planes skip files —
        // never a full corpus pass (the r12 graded-weak shape)
        val fetchPruned = fetches.nonEmpty &&
          fetches.forall(m => m.filesTotal > 1 && m.filesScanned < m.filesTotal)
        require(fetchPruned, "candidate-text fetch must prune the corpus scan: " +
          fetches.map(m => s"${m.filesScanned}/${m.filesTotal}").mkString(", "))
        val (compacted, statePreserved) = TableOps.compactionProof(s, t)
        val probeSigs = bandSigsOf(batch)
        val cand2 = probeSigs.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
          .join(t.toDF(s).select(col("band"), col("sig"), col("doc_id").as("doc_b")),
            Seq("band", "sig"))
          .select("doc_a", "doc_b").distinct()
        val rej2 = pairJaccard(
            batch.select("doc_id", "text").unionByName(hist.select("doc_id", "text")),
            cand2)
          .filter(col("jaccard") >= 0.5)
          .select(col("doc_a").as("doc_id")).distinct()
        val reprobeClean = probeSigs.select("doc_id").distinct()
          .join(rej2, Seq("doc_id"), "left_anti").isEmpty
        require(reprobeClean,
          "compacted signature state must reject the entire already-crawled batch")
        // admissions = corpus minus the pre-stream history snapshot (time
        // travel, not a fixture-id filter): the corpus table doubles as
        // the results ledger
        val resDf = corpusT.toDF(s).join(
          corpusT.atSnapshot(histSnap).toDF(s).select("doc_id"),
          Seq("doc_id"), "left_anti")
        resDf.groupBy("lang").agg(count(lit(1)).as("admitted"))
          .withColumn("corpus_commits", lit(corpusT.meta.snapshots.size.toLong))
          .withColumn("state_commits", lit(stateCommits.toLong))
          .withColumn("compacted", lit(compacted))
          .withColumn("state_preserved", lit(statePreserved))
          .withColumn("reprobe_clean", lit(reprobeClean))
          .withColumn("fetch_pruned", lit(fetchPruned))
          .orderBy("lang")
      },
      """WITH docs AS (SELECT doc_id, lang, text FROM documents),
        |hist AS (SELECT doc_id, lang, text FROM docs WHERE doc_id % 2 = 0),
        |s0 AS (SELECT doc_id, lang, text FROM docs WHERE doc_id % 2 = 1),
        |s1 AS (
        |  SELECT doc_id + 1000000000 AS doc_id, lang, text || ' recrawl tail' AS text
        |  FROM docs WHERE doc_id % 200 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000000 AS doc_id, lang, text || ' recrawl tail' AS text
        |  FROM docs WHERE doc_id % 100 = 1),
        |sh_h AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |        FROM hist)),
        |sh_0 AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |        FROM s0)),
        |sh_1 AS (
        |  SELECT doc_id, list_distinct(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS sh
        |  FROM (SELECT doc_id,
        |          list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
        |        FROM s1)),
        |b_h AS (
        |  SELECT doc_id, b, md5(
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 0) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 1) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 2) * 8, 8)))) AS sig
        |  FROM sh_h, (SELECT unnest([0, 1]) AS b) WHERE len(sh) > 0),
        |b_0 AS (
        |  SELECT doc_id, b, md5(
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 0) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 1) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 2) * 8, 8)))) AS sig
        |  FROM sh_0, (SELECT unnest([0, 1]) AS b) WHERE len(sh) > 0),
        |b_1 AS (
        |  SELECT doc_id, b, md5(
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 0) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 1) * 8, 8))) ||
        |    list_min(list_transform(sh, x -> substring(md5(x) || md5(x || '#'), 1 + (b * 3 + 2) * 8, 8)))) AS sig
        |  FROM sh_1, (SELECT unnest([0, 1]) AS b) WHERE len(sh) > 0),
        |cand0 AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, h.doc_id AS doc_b
        |  FROM b_0 a JOIN b_h h ON a.b = h.b AND a.sig = h.sig),
        |rej0 AS (
        |  SELECT DISTINCT c.doc_a AS doc_id
        |  FROM cand0 c JOIN sh_0 x ON x.doc_id = c.doc_a
        |  JOIN sh_h y ON y.doc_id = c.doc_b
        |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5),
        |a0 AS (SELECT doc_id FROM s0
        |  WHERE doc_id NOT IN (SELECT doc_id FROM rej0)),
        |st_b AS (
        |  SELECT doc_id, b, sig FROM b_h
        |  UNION ALL
        |  SELECT doc_id, b, sig FROM b_0
        |  WHERE doc_id IN (SELECT doc_id FROM a0)),
        |st_sh AS (
        |  SELECT doc_id, sh FROM sh_h
        |  UNION ALL
        |  SELECT doc_id, sh FROM sh_0
        |  WHERE doc_id IN (SELECT doc_id FROM a0)),
        |cand1 AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, t.doc_id AS doc_b
        |  FROM b_1 a JOIN st_b t ON a.b = t.b AND a.sig = t.sig),
        |rej1 AS (
        |  SELECT DISTINCT c.doc_a AS doc_id
        |  FROM cand1 c JOIN sh_1 x ON x.doc_id = c.doc_a
        |  JOIN st_sh y ON y.doc_id = c.doc_b
        |  WHERE CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        |      / len(list_distinct(list_concat(x.sh, y.sh))) >= 0.5),
        |adm AS (
        |  SELECT b.doc_id, b.lang FROM s0 b JOIN a0 USING (doc_id)
        |  UNION ALL
        |  SELECT b.doc_id, b.lang FROM s1 b
        |  WHERE b.doc_id NOT IN (SELECT doc_id FROM rej1))
        |SELECT lang, count(*) AS admitted,
        |  CAST(3 AS BIGINT) AS corpus_commits, CAST(3 AS BIGINT) AS state_commits,
        |  true AS compacted, true AS state_preserved, true AS reprobe_clean,
        |  true AS fetch_pruned
        |FROM adm GROUP BY 1 ORDER BY 1""".stripMargin),

    // X7g: HYBRID retrieval by RECIPROCAL-RANK FUSION — the modern search
    // shape: a lexical BM25 list (from the persisted inverted index, via
    // [[bm25Scored]]) and a dense cosine list (brute-force exact top-k,
    // the x_sim_topk baseline) fuse by RRF(d) = Σ 1/(60 + rank_i(d)),
    // which needs NO score normalization across the two incomparable
    // scales — only RANKS cross the fusion boundary, so the doubles that
    // could diverge stay inside each list (the same rank-only discipline
    // x_sim_topk pins). 1/(60 + r) is one exact-input division and the
    // two-list sum is commutative, so the fused scores bit-match. Items
    // on one list only take the other term as 0 (coalesce, mirrored).
    // The global rank window runs over the CANDIDATE lists (≤ 50 + 50
    // rows after each side's own top-k), never the corpus — fusion cost
    // is independent of corpus size, which is what makes RRF the 100 TB
    // hybrid-search shape.
    ("x_rrf_fusion",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val t = buildInvertedIndex(s, Tables.documents(s, d), TableOps.newCatalog())
        val (_, _, scored) = bm25Scored(s, t, "merge", "window")
        // top-50 FIRST via orderBy+limit (TakeOrderedAndProject — a
        // distributed partial top-k), so the global rank window only ever
        // sees 50 rows; ranking the full candidate set through one window
        // partition would funnel every term-matching doc into a single
        // task at corpus scale
        val lex = scored.filter(col("doc_id") =!= 0)
          .orderBy(col("score").desc, col("doc_id")).limit(50)
          .withColumn("r_lex",
            row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
          .select("doc_id", "r_lex")
        val e = Tables.embeddings(s, d)
        val q = e.filter(col("vec_id") === 0).select(col("embedding").as("q"))
        val vec = VF.bruteForceTopK(e.filter(col("vec_id") =!= 0), q,
            "vec_id", "embedding", 50)
          .select(col("vec_id").as("doc_id"), col("rank").as("r_vec"))
        lex.join(vec, Seq("doc_id"), "full_outer")
          .withColumn("rrf",
            coalesce(lit(1.0) / (lit(60.0) + col("r_lex").cast("double")), lit(0.0)) +
              coalesce(lit(1.0) / (lit(60.0) + col("r_vec").cast("double")), lit(0.0)))
          .orderBy(col("rrf").desc, col("doc_id")).limit(20)
      },
      s"""WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest($toksSql) AS token FROM documents)
        |  GROUP BY 1, 2),
        |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
        |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS total_len
        |          FROM dl),
        |dfs AS (SELECT token, count(*) AS df FROM tf
        |        WHERE token IN ('merge', 'window') GROUP BY 1),
        |bm AS (
        |  SELECT t.doc_id, sum(
        |    ((CAST(s.n_docs AS DOUBLE) - CAST(f.df AS DOUBLE) + 0.5) /
        |     (CAST(f.df AS DOUBLE) + 0.5)) *
        |    ((CAST(t.tf AS DOUBLE) * 2.25) /
        |     (CAST(t.tf AS DOUBLE) + 1.25 * (0.25 + 0.75 *
        |        (CAST(l.dl AS DOUBLE) /
        |         (CAST(s.total_len AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))
        |    ) AS score
        |  FROM tf t JOIN dfs f USING (token) JOIN dl l USING (doc_id)
        |  CROSS JOIN stats s GROUP BY 1),
        |lex AS (
        |  SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r_lex
        |  FROM bm WHERE doc_id <> 0 ORDER BY 2 LIMIT 50),
        |q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |sims AS (
        |  SELECT vec_id, list_cosine_similarity(embedding, qe) AS sim
        |  FROM embeddings, q WHERE vec_id <> 0),
        |vec AS (
        |  SELECT vec_id AS doc_id,
        |    CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT) AS r_vec
        |  FROM sims ORDER BY 2 LIMIT 50)
        |SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.r_lex, v.r_vec,
        |  COALESCE(1.0 / (60.0 + CAST(l.r_lex AS DOUBLE)), 0.0) +
        |  COALESCE(1.0 / (60.0 + CAST(v.r_vec AS DOUBLE)), 0.0) AS rrf
        |FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin),

    // X4l: PER-SOURCE document capping — the mixture guard that keeps one
    // over-crawled domain from dominating a pretraining mix (the CAP-based
    // complement of x_domain_mix's budget thresholds and
    // x_stratified_sample's rate thresholds): every source keeps its
    // md5-first N documents. Selection is BY HASH ORDER, not arrival
    // order, so the kept set is a deterministic function of content ids —
    // stable under recomputation, partitioning, and incremental re-runs
    // (an arrival-order cap keeps different docs every run). One window
    // exchange on source; rank ties are impossible (md5(id) collisions
    // aside, id breaks them). At 100 TB a giant source pays one
    // shuffle of its (source, md5) keys — never text.
    ("x_domain_cap",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val cap = 80
        val docs0 = Tables.documents(s, d)
        val totals = docs0.groupBy("source").agg(count(lit(1)).as("total"))
        // phase 1: per-source 2-hex-digit prefix threshold targeting ~4·cap
        // expected survivors — pfx = ceil(256·4·cap / total), clamped to
        // [1, 256]. The pool {h : first-2-hex(h) < pfx} is a PREFIX of the
        // (h, id) order, so whenever it holds ≥ cap docs it provably
        // contains the true top-cap — the window in phase 2 then sorts
        // ~4·cap rows per source instead of the whole source (a giant
        // domain would otherwise funnel its entire key set into ONE task).
        val thresholds = totals.withColumn("pfx",
          least(lit(256L), greatest(lit(1L),
            expr(s"(${256L * 4 * cap} + total - 1) div total"))))
        // pinned once: the guard count and the windowed answer both read
        // the survivor pool (without the pin the corpus-wide md5 + prefix
        // filter would run twice)
        val survivors = docs0
          .withColumn("h", md5(col("doc_id").cast("string")))
          .join(broadcast(thresholds), "source")
          .filter(conv(substring(col("h"), 1, 2), 16, 10).cast("long") < col("pfx"))
          .localCheckpoint()
        // loud guard (the sampledQuantiles discipline): hash fluctuation
        // could in principle under-fill a pool; refuse rather than
        // silently under-keep. Sources smaller than the target keep a
        // pfx of 256 and survive whole, so they can never trip it.
        // LEFT join from the thresholds side: a source whose pool came up
        // EMPTY has no survivors row at all — aggregating from the
        // survivors side would let exactly the worst under-fill pass the
        // guard silently.
        val short = thresholds.join(
            survivors.groupBy("source").agg(count(lit(1)).as("sv")),
            Seq("source"), "left")
          .filter(coalesce(col("sv"), lit(0L)) <
            least(lit(cap.toLong), col("total"))).count()
        require(short == 0L,
          s"domain-cap prefix pre-filter under-sampled $short source(s); raise the margin")
        survivors
          .withColumn("rk", row_number().over(
            Window.partitionBy("source").orderBy(col("h"), col("doc_id"))))
          .filter(col("rk") <= cap)
          .groupBy("source")
          .agg(count(lit(1)).as("kept"), sum(col("n_chars")).as("kept_chars"),
            max(col("h")).as("cut_hash"))
          .join(totals, "source")
          .select(col("source"), col("total"), col("kept"),
            (col("total") - col("kept")).as("capped_out"),
            col("kept_chars"), col("cut_hash"))
          .orderBy("source")
      },
      """WITH ranked AS (
        |  SELECT source, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents),
        |kept AS (
        |  SELECT source, count(*) AS kept,
        |    CAST(sum(n_chars) AS BIGINT) AS kept_chars, max(h) AS cut_hash
        |  FROM ranked WHERE rk <= 80 GROUP BY 1),
        |tot AS (SELECT source, count(*) AS total FROM documents GROUP BY 1)
        |SELECT t.source, t.total, k.kept, t.total - k.kept AS capped_out,
        |  k.kept_chars, k.cut_hash
        |FROM kept k JOIN tot t USING (source) ORDER BY 1""".stripMargin),

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

    // X8g: BOOTSTRAP confidence interval by the POISSON bootstrap — the
    // one-pass distributed bootstrap: classic resampling draws n rows per
    // replicate (a shuffle per replicate, unusable at scale), while the
    // Poisson approximation gives every row an independent Poisson(1)
    // weight per replicate — here DETERMINISTIC, from two md5 hex digits
    // of (doc_id, replicate) against the integer-exact inverse-CDF
    // thresholds 0x5E/0xBC/0xEB/0xFB (P(w=0)=94/256 ≈ e⁻¹, …, discretized
    // to 1/256 steps so both engines draw the IDENTICAL weight by string
    // comparison of lowercase hex — no float RNG anywhere). One map-side
    // 40-way explode + one hash agg: replicate sums are exact BIGINTs,
    // each mean is one mirrored division, and the CI picks nearest-rank
    // elements (5th/95th) of the 40 replicate means with replicate-id
    // tie-breaks — the x_quantile_sample pick discipline, so no
    // interpolation arithmetic can diverge.
    ("x_bootstrap_ci",
      (s: SparkSession, d: String) => {
        import org.apache.spark.sql.expressions.Window
        val b = 40
        val weighted = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
          .select(col("doc_id"), col("n_chars"),
            posexplode(sequence(lit(0), lit(b - 1))).as(Seq("pos", "r")))
          .withColumn("h2", substring(md5(concat(col("doc_id").cast("string"),
            lit("_"), col("r").cast("string"))), 1, 2))
          .withColumn("w",
            when(col("h2") < "5e", lit(0L)).when(col("h2") < "bc", lit(1L))
              .when(col("h2") < "eb", lit(2L)).when(col("h2") < "fb", lit(3L))
              .otherwise(lit(4L)))
        val reps = weighted.groupBy("r")
          .agg(sum(col("w")).as("sw"), sum(col("w") * col("n_chars")).as("swx"))
          .withColumn("mean_r", when(col("sw") > 0,
            col("swx").cast("double") / col("sw").cast("double")))
          // NULLS LAST to mirror DuckDB's ASC default (Spark defaults to
          // NULLS FIRST): a zero-weight replicate (sw=0 → mean_r NULL,
          // possible on a degenerate corpus) must occupy the same rank on
          // both engines or the nearest-rank CI picks diverge.
          .withColumn("rk", row_number().over(
            Window.orderBy(col("mean_r").asc_nulls_last, col("r"))))
        val grand = Tables.documents(s, d)
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sx"))
        grand.crossJoin(broadcast(
            reps.agg(min(when(col("rk") === 2, col("mean_r"))).as("ci_lo"),
              min(when(col("rk") === b - 2, col("mean_r"))).as("ci_hi"))))
          .select(col("n_docs"),
            (col("sx").cast("double") / col("n_docs").cast("double")).as("mean_chars"),
            col("ci_lo"), col("ci_hi"), lit(b.toLong).as("n_replicates"))
      },
      """WITH weighted AS (
        |  SELECT doc_id, n_chars, r,
        |    CASE WHEN h2 < '5e' THEN 0 WHEN h2 < 'bc' THEN 1
        |         WHEN h2 < 'eb' THEN 2 WHEN h2 < 'fb' THEN 3 ELSE 4 END AS w
        |  FROM (
        |    SELECT doc_id, n_chars, r,
        |      substr(md5(CAST(doc_id AS VARCHAR) || '_' || CAST(r AS VARCHAR)),
        |        1, 2) AS h2
        |    FROM documents, (SELECT unnest(range(40)) AS r))),
        |reps AS (
        |  SELECT r, CAST(sum(w) AS BIGINT) AS sw,
        |    CAST(sum(w * n_chars) AS BIGINT) AS swx
        |  FROM weighted GROUP BY 1),
        |means AS (
        |  SELECT r,
        |    CASE WHEN sw > 0 THEN CAST(swx AS DOUBLE) / CAST(sw AS DOUBLE) END
        |      AS mean_r
        |  FROM reps),
        |ranked AS (
        |  SELECT mean_r, row_number() OVER (ORDER BY mean_r, r) AS rk FROM means),
        |ci AS (
        |  SELECT min(CASE WHEN rk = 2 THEN mean_r END) AS ci_lo,
        |    min(CASE WHEN rk = 38 THEN mean_r END) AS ci_hi
        |  FROM ranked),
        |grand AS (
        |  SELECT count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sx
        |  FROM documents)
        |SELECT g.n_docs,
        |  CAST(g.sx AS DOUBLE) / CAST(g.n_docs AS DOUBLE) AS mean_chars,
        |  c.ci_lo, c.ci_hi, CAST(40 AS BIGINT) AS n_replicates
        |FROM grand g, ci c""".stripMargin),

    // X4m: N-GRAM NOVELTY over crawl order — each document's fraction of
    // 3-grams the corpus has never seen in any EARLIER document (by id):
    // the diminishing-returns signal of continued crawling (novelty decay
    // is the stop-crawling curve; x_boilerplate_ngrams measures the
    // opposite tail — grams seen everywhere). A gram's first appearance
    // is one min-aggregate over the exploded distinct-gram stream; the
    // per-doc novelty is the probe join back on the gram key (the
    // boilerplate-ngrams exchange shape — never a self-join). At 100 TB
    // the first-seen table is vocabulary-sized and would persist as a
    // durable Graft table between crawl batches, exactly like the
    // incremental-dedup fingerprint state. Integer counts, one mirrored
    // division per language.
    ("x_ngram_novelty",
      (s: SparkSession, d: String) => {
        val grams = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            explode(array_distinct(TF.shingles(col("text"), 3))).as("g"))
        val first = grams.groupBy("g").agg(min(col("doc_id")).as("first_doc"))
        grams.join(first, "g")
          .groupBy("doc_id", "lang")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("first_doc") === col("doc_id"), lit(1L))
              .otherwise(lit(0L))).as("novel"))
          .groupBy("lang")
          .agg(count(lit(1)).as("docs"), sum(col("n_grams")).as("grams"),
            sum(col("novel")).as("novel"))
          .withColumn("novelty_rate",
            col("novel").cast("double") / col("grams").cast("double"))
          .orderBy("lang")
      },
      s"""WITH toks AS (
        |  SELECT doc_id, lang, $toksSql AS t FROM documents),
        |g AS (
        |  SELECT doc_id, lang, unnest(list_distinct(
        |    CASE WHEN len(t) < 3 THEN [] ELSE
        |      list_transform(generate_series(1, len(t) - 2),
        |        i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) END)) AS g
        |  FROM toks),
        |first AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY 1),
        |per_doc AS (
        |  SELECT doc_id, lang, count(*) AS n_grams,
        |    sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS novel
        |  FROM g JOIN first USING (g) GROUP BY 1, 2),
        |per_lang AS (
        |  SELECT lang, count(*) AS docs,
        |    CAST(sum(n_grams) AS BIGINT) AS grams,
        |    CAST(sum(novel) AS BIGINT) AS novel
        |  FROM per_doc GROUP BY 1)
        |SELECT lang, docs, grams, novel,
        |  CAST(novel AS DOUBLE) / CAST(grams AS DOUBLE) AS novelty_rate
        |FROM per_lang ORDER BY lang""".stripMargin),

    // X10b: HITS (hubs & authorities) on the BIPARTITE purchase graph
    // (customer → part): authority(part) = Σ hub(its buyers), hub(cust) =
    // Σ authority(their parts) — "parts popular with influential buyers",
    // the recommendation signal degree alone misses. Like x_pagerank,
    // every step is EXACT integer arithmetic so the iteration is
    // oracle-gateable: the float version's per-iteration L2 normalization
    // can never hash-match across engines, so each iteration here
    // re-scales by (v · S) div max(v) — max is an exact integer
    // aggregate, floor division engine-identical, and the fixed point is
    // scale-free so max-normalization is the CORRECT choice, not a
    // compromise. 3 unrolled iterations; each is one edge join + hash
    // agg + one scalar max (the only driver value), lineage cut per
    // round. Edge list is linear in lineitem (a join, never a pair
    // blow-up), distinct on (cust, part).
    // X1c: STATE-TABLE COMPACTION composes with incremental dedup — the
    // maintenance event a real 100 TB ingest hits daily that no other gate
    // proved: the persisted fingerprint state grows by small appends
    // forever, so at some point compaction MUST rewrite it, and the next
    // batch's admissions must be unchanged (r9 verdict #1). The fixture
    // builds the state in TWO appends (8 small bucket files), compacts
    // mid-sequence (binpack folds them to one file per bucket — `compacted`
    // certifies files strictly decreased while `state_preserved` certifies
    // zero rows lost), then dedups a batch carrying both rejection classes
    // (re-crawled history docs +300000, within-batch resubmissions
    // +400000) against the COMPACTED table. The oracle has no compaction
    // concept at all — agreement proves maintenance is invisible to
    // correctness, which is the entire contract of a rewrite commit.
    ("x_incremental_dedup_compacted",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars", "text")
        val hist1 = docs.filter(col("doc_id") % 3 === 0)
        val hist2 = docs.filter(col("doc_id") % 3 === 1)
        val batch = docs.filter(col("doc_id") % 3 === 2)
          .unionByName(docs.filter(col("doc_id") % 3 =!= 2)
            .filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 300000L).as("doc_id"), col("lang"),
              col("n_chars"), col("text")))
          .unionByName(docs.filter(col("doc_id") % 30 === 2)
            .select((col("doc_id") + 400000L).as("doc_id"), col("lang"),
              col("n_chars"), col("text")))
        val fps1 = hist1.select(TF.fingerprint(col("text")).as("fp"))
        val cat = TableOps.newCatalog()
        val t = cat.createTable("db.fingerprints", fps1.schema,
          partitionBy = Seq("fp" -> Transform.Bucket(4)),
          properties = Map(graft.format.TableProperties.BloomColumns -> "fp"))
        t.append(s, fps1)
        t.append(s, hist2.select(TF.fingerprint(col("text")).as("fp")))
        // mid-sequence maintenance on the live state table
        val (compacted, statePreserved) = TableOps.compactionProof(s, t)
        val batchFp = batch.select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
        val firstIn = batchFp.groupBy("fp").agg(min(col("doc_id")).as("doc_id"))
        val admitted = firstIn
          .join(t.toDF(s).select(col("fp")), Seq("fp"), "left_anti")
          .select("doc_id")
        batch.join(broadcast(admitted), "doc_id")
          .groupBy("lang")
          .agg(count(lit(1)).as("admitted"), sum(col("n_chars")).cast("long").as("sum_chars"))
          .withColumn("compacted", lit(compacted))
          .withColumn("state_preserved", lit(statePreserved))
          .withColumn("maintenance_commits", lit(t.meta.snapshots.size.toLong))
          .orderBy("lang")
      },
      """WITH docs AS (SELECT doc_id, lang, n_chars, text FROM documents),
        |batch AS (
        |  SELECT doc_id, lang, n_chars, text FROM docs WHERE doc_id % 3 = 2
        |  UNION ALL
        |  SELECT doc_id + 300000, lang, n_chars, text FROM docs
        |  WHERE doc_id % 3 <> 2 AND doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 400000, lang, n_chars, text FROM docs WHERE doc_id % 30 = 2),
        |hist AS (SELECT md5(text) AS fp FROM docs WHERE doc_id % 3 <> 2),
        |first_in AS (
        |  SELECT md5(text) AS fp, min(doc_id) AS doc_id FROM batch GROUP BY 1),
        |admitted AS (
        |  SELECT f.doc_id FROM first_in f
        |  WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fp = f.fp))
        |SELECT b.lang, count(*) AS admitted, CAST(sum(b.n_chars) AS BIGINT) AS sum_chars,
        |  true AS compacted, true AS state_preserved,
        |  CAST(3 AS BIGINT) AS maintenance_commits
        |FROM batch b JOIN admitted a ON b.doc_id = a.doc_id
        |GROUP BY 1 ORDER BY 1""".stripMargin),

    // X4n: INCREMENTAL n-gram novelty — x_ngram_novelty's first-seen gram
    // state made DURABLE (r9 verdict #3): the gram→first-doc table persists
    // as a bucket-partitioned Graft table between crawl batches, exactly
    // like the incremental-dedup fingerprint state. A crawl batch PROBES
    // the state (anti-join on the gram key — grams never self-join), takes
    // batch-first grams as its novel set, and APPENDS them so the next
    // batch sees them as history. The state builds INCREMENTALLY in two
    // crawls (the second extends it through the same probe/append path
    // the batch takes) and binpack-COMPACTS mid-sequence before the batch
    // probes it — the maintenance proof every persisted state carries
    // (`compacted` = files strictly decreased, `state_preserved` = zero
    // rows lost). Certified: the batch refresh commit is append-only
    // (every post-compaction file survives byte-identical), the state
    // holds exactly 4 commits, and the final inventory equals the
    // whole-corpus distinct-gram count — nothing lost, nothing duplicated,
    // through build, rewrite, and refresh alike. The oracle recomputes
    // batch novelty from raw text with no state at all.
    ("x_incremental_novelty",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        def gramsOf(df: DataFrame) = df.select(col("doc_id"), col("lang"),
          explode(array_distinct(TF.shingles(col("text"), 3))).as("g"))
        val docs = Tables.documents(s, d)
        val hist = docs.filter(col("doc_id") % 2 === 0)
        val batch = docs.filter(col("doc_id") % 2 === 1)
        val fs1 = gramsOf(hist.filter(col("doc_id") % 4 === 0))
          .groupBy("g").agg(min(col("doc_id")).as("first_doc"))
        val cat = TableOps.newCatalog()
        val t = cat.createTable("db.first_seen", fs1.schema,
          partitionBy = Seq("g" -> Transform.Bucket(4)))
        t.append(s, fs1)
        // second crawl extends the state through the SAME probe/append
        // path the batch takes below
        t.append(s, gramsOf(hist.filter(col("doc_id") % 4 === 2))
          .select("doc_id", "g")
          .join(t.toDF(s).select(col("g")), Seq("g"), "left_anti")
          .groupBy("g").agg(min(col("doc_id")).as("first_doc")))
        // mid-sequence maintenance on the live first-seen state
        val (compacted, statePreserved) = TableOps.compactionProof(s, t)
        val filesBefore = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        // pinned: the batch gram stream feeds both the unseen-gram probe
        // and the per-doc novelty rollup
        val bg = gramsOf(batch).localCheckpoint()
        val unseen = bg.select("doc_id", "g")
          .join(t.toDF(s).select(col("g")), Seq("g"), "left_anti")
          .groupBy("g").agg(min(col("doc_id")).as("first_doc"))
          .localCheckpoint() // read twice: the state append + the rollup join
        t.append(s, unseen) // the batch extends the durable first-seen state
        val filesAfter = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        val stateGrams = t.toDF(s).count()
        bg.join(unseen.withColumnRenamed("first_doc", "fd"), Seq("g"), "left")
          .groupBy("doc_id", "lang")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("fd") === col("doc_id"), lit(1L)).otherwise(lit(0L))).as("novel"))
          .groupBy("lang")
          .agg(count(lit(1)).as("docs"), sum(col("n_grams")).as("grams"),
            sum(col("novel")).as("novel"))
          .withColumn("novelty_rate",
            col("novel").cast("double") / col("grams").cast("double"))
          .withColumn("compacted", lit(compacted))
          .withColumn("state_preserved", lit(statePreserved))
          .withColumn("append_only",
            lit(filesBefore.subsetOf(filesAfter) && filesAfter.size > filesBefore.size))
          .withColumn("incremental_commits", lit(t.meta.snapshots.size.toLong))
          .withColumn("state_grams", lit(stateGrams))
          .orderBy("lang")
      },
      s"""WITH toks AS (
        |  SELECT doc_id, lang, $toksSql AS t FROM documents),
        |g AS (
        |  SELECT doc_id, lang, unnest(list_distinct(
        |    CASE WHEN len(t) < 3 THEN [] ELSE
        |      list_transform(generate_series(1, len(t) - 2),
        |        i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) END)) AS g
        |  FROM toks),
        |hist AS (SELECT DISTINCT g FROM g WHERE doc_id % 2 = 0),
        |bg AS (SELECT doc_id, lang, g FROM g WHERE doc_id % 2 = 1),
        |unseen AS (
        |  SELECT g, min(doc_id) AS fd FROM bg
        |  WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.g = bg.g)
        |  GROUP BY 1),
        |per_doc AS (
        |  SELECT b.doc_id, b.lang, count(*) AS n_grams,
        |    sum(CASE WHEN u.fd = b.doc_id THEN 1 ELSE 0 END) AS novel
        |  FROM bg b LEFT JOIN unseen u USING (g) GROUP BY 1, 2),
        |per_lang AS (
        |  SELECT lang, count(*) AS docs,
        |    CAST(sum(n_grams) AS BIGINT) AS grams,
        |    CAST(sum(novel) AS BIGINT) AS novel
        |  FROM per_doc GROUP BY 1)
        |SELECT lang, docs, grams, novel,
        |  CAST(novel AS DOUBLE) / CAST(grams AS DOUBLE) AS novelty_rate,
        |  true AS compacted, true AS state_preserved,
        |  true AS append_only, CAST(4 AS BIGINT) AS incremental_commits,
        |  (SELECT count(DISTINCT g) FROM g) AS state_grams
        |FROM per_lang ORDER BY lang""".stripMargin),

    // X4r: the STREAMING novelty crawl loop — the last durable state's
    // missing streaming leg (batch: x_ngram_novelty; durable + compacted:
    // x_incremental_novelty): with this gate EVERY persisted state in the
    // repo (fingerprints, band signatures, chunk ledger, postings, IVF
    // index, LM counts, first-seen grams) carries the full batch /
    // durable / compacted / streaming lifecycle. Two doc_id-ordered
    // slices (odds split at their midpoint); per batch the shared
    // streamIncrementalNovelty anti-joins the first-seen table AS OF
    // ARRIVAL — a gram first claimed by slice 0 reads as non-novel for
    // slice 1, the cross-batch distinction — and commits per-doc scores
    // BEFORE the batch's first-seen claims, both statementId-keyed. The
    // oracle is the STATELESS whole-batch rule (a gram's first_doc = the
    // global min batch doc holding it, if unseen in history), valid
    // because ANY doc_id-monotone slicing makes arrival-first ==
    // min-doc-first — the in-gate midpoint cut never appears in the SQL.
    // After the crawl: compactionProof on the live first-seen state, a
    // full-batch REPROBE (every crawled gram must be first-seen by now —
    // a state row lost to the rewrite or a replayed commit fails loudly),
    // and the inventory law: state rows == the whole corpus's distinct
    // gram count.
    ("x_stream_incremental_novelty",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        def gramsOf(df: DataFrame) = df.select(col("doc_id"), col("lang"),
          explode(array_distinct(TF.shingles(col("text"), 3))).as("g"))
        val docs = Tables.documents(s, d)
        val hist = docs.filter(col("doc_id") % 2 === 0)
        val batch = docs.filter(col("doc_id") % 2 === 1)
          .select("doc_id", "lang", "text")
        val stage = TableOps.newTempDir("graft-snov")
        val (t, res) = FixtureClock.timed { // history state + staging I/O
          val cat = TableOps.newCatalog()
          val fs = gramsOf(hist).groupBy("g").agg(min(col("doc_id")).as("first_doc"))
          // g-bloom indexed so each batch's runtime-filtered anti-join
          // probe can skip first-seen files it cannot match
          val tbl = cat.createTable("db.first_seen_s", fs.schema,
            partitionBy = Seq("g" -> Transform.Bucket(4)),
            properties = Map(graft.format.TableProperties.BloomColumns -> "g"))
          tbl.append(s, fs)
          val resT = cat.createTable("db.novelty_s",
            new org.apache.spark.sql.types.StructType()
              .add("doc_id", org.apache.spark.sql.types.LongType)
              .add("lang", org.apache.spark.sql.types.StringType)
              .add("n_grams", org.apache.spark.sql.types.LongType)
              .add("novel", org.apache.spark.sql.types.LongType))
          val ids = batch.agg(min(col("doc_id")), max(col("doc_id"))).head
          val mid = (ids.getLong(0) + ids.getLong(1)) / 2
          stageOrderedSlices(batch, stage,
            when(col("doc_id") <= mid, 0).otherwise(1), 2)
          (tbl, resT)
        }
        val batches = streamIncrementalNovelty(s, stage, batch.schema, t, res)
        val stateCommits = t.meta.snapshots.size // before the compaction commit
        require(batches == 2 && res.meta.snapshots.size == 2 &&
            stateCommits == 3, // hist + one per micro-batch
          s"novelty crawl must run micro-batched: $batches batches, " +
            s"${res.meta.snapshots.size}/$stateCommits commits")
        val (compacted, statePreserved) = TableOps.compactionProof(s, t)
        val reprobeClean = gramsOf(batch).select("g").distinct()
          .join(t.toDF(s).select(col("g")), Seq("g"), "left_anti").isEmpty
        require(reprobeClean,
          "compacted first-seen state must hold every already-crawled gram")
        val stateGrams = t.toDF(s).count()
        res.toDF(s).groupBy("lang")
          .agg(count(lit(1)).as("docs"), sum(col("n_grams")).as("grams"),
            sum(col("novel")).as("novel"))
          .withColumn("novelty_rate",
            col("novel").cast("double") / col("grams").cast("double"))
          .withColumn("ingest_commits", lit(res.meta.snapshots.size.toLong))
          .withColumn("state_commits", lit(stateCommits.toLong))
          .withColumn("compacted", lit(compacted))
          .withColumn("state_preserved", lit(statePreserved))
          .withColumn("reprobe_clean", lit(reprobeClean))
          .withColumn("state_grams", lit(stateGrams))
          .orderBy("lang")
      },
      s"""WITH toks AS (
        |  SELECT doc_id, lang, $toksSql AS t FROM documents),
        |g AS (
        |  SELECT doc_id, lang, unnest(list_distinct(
        |    CASE WHEN len(t) < 3 THEN [] ELSE
        |      list_transform(generate_series(1, len(t) - 2),
        |        i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]) END)) AS g
        |  FROM toks),
        |hist AS (SELECT DISTINCT g FROM g WHERE doc_id % 2 = 0),
        |bg AS (SELECT doc_id, lang, g FROM g WHERE doc_id % 2 = 1),
        |unseen AS (
        |  SELECT g, min(doc_id) AS fd FROM bg
        |  WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.g = bg.g)
        |  GROUP BY 1),
        |per_doc AS (
        |  SELECT b.doc_id, b.lang, count(*) AS n_grams,
        |    sum(CASE WHEN u.fd = b.doc_id THEN 1 ELSE 0 END) AS novel
        |  FROM bg b LEFT JOIN unseen u USING (g) GROUP BY 1, 2),
        |per_lang AS (
        |  SELECT lang, count(*) AS docs,
        |    CAST(sum(n_grams) AS BIGINT) AS grams,
        |    CAST(sum(novel) AS BIGINT) AS novel
        |  FROM per_doc GROUP BY 1)
        |SELECT lang, docs, grams, novel,
        |  CAST(novel AS DOUBLE) / CAST(grams AS DOUBLE) AS novelty_rate,
        |  CAST(2 AS BIGINT) AS ingest_commits, CAST(3 AS BIGINT) AS state_commits,
        |  true AS compacted, true AS state_preserved, true AS reprobe_clean,
        |  (SELECT count(DISTINCT g) FROM g) AS state_grams
        |FROM per_lang ORDER BY lang""".stripMargin),

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

    // X3j: STREAMING index maintenance — the missing leg of the vector
    // story (x_ann_index_refresh proves BATCH refresh; this gate proves
    // the index stays correct when embeddings arrive as a STREAM). The
    // clustered corpus replays as 3 micro-batches through the shared
    // [[annStreamIngest]]: each batch is cell-assigned map-side against
    // the frozen shift centroids (a per-row expression — no re-cluster,
    // no stream state) and appended to the identity-partitioned Graft
    // index as one atomic commit, so a concurrent probe always reads a
    // consistent snapshot and a crashed ingest resumes from its
    // checkpoint. After the replay the gate runs x_ann_index_multiprobe's
    // EXACT probe: nprobe=2 cell list -> ONE In-predicate scan whose
    // metrics certify partition pruning survived 3 independent appends
    // (each append laid its own files under the cell partitions),
    // candidates from the pruned read, top-10 hit-flagged against exact
    // brute force with >=8/10 REQUIREd. The oracle is the batch-built
    // index's answer — agreement proves micro-batched ingest lost
    // nothing vs building the index in one shot (the g_stream_ingest
    // discipline applied to the vector store), and `ingest_commits`=3
    // pins that the stream really ran micro-batched.
    ("x_stream_ann_ingest",
      (s: SparkSession, d: String) => {
        import graft.format.{Predicate, Transform}
        import org.apache.spark.sql.types.LongType
        val clustered = clusteredEmbeddings(Tables.embeddings(s, d))
        val cents = shiftCentroids
        val stage = TableOps.newTempDir("graft-annstream")
        val (t, schema) = FixtureClock.timed { // staging I/O is fixture
          clustered.repartition(6).write.mode("overwrite").parquet(stage)
          val cat = TableOps.newCatalog()
          val tbl = cat.createTable("db.ann_stream",
            clustered.schema.add("cell", LongType),
            partitionBy = Seq("cell" -> Transform.Identity))
          (tbl, clustered.schema)
        }
        val nBatches = annStreamIngest(s, stage, schema, t, cents,
          filesPerTrigger = 2)
        require(nBatches == 3 && t.meta.snapshots.size == 3,
          s"ingest must run micro-batched: $nBatches batches, " +
            s"${t.meta.snapshots.size} commits")
        // maintenance composes with the streamed index: binpack the 3
        // appends' small per-cell files, THEN probe — `probe_pruned`
        // below certifies pruning survived the rewrite (the silent-
        // degradation guard every persisted state in the repo carries)
        val (compacted, statePreserved) = TableOps.compactionProof(s, t)
        prunedMultiprobeTopK(s, t, clustered, cents)
          .withColumn("ingest_commits", lit(nBatches.toLong))
          .withColumn("compacted", lit(compacted))
          .withColumn("state_preserved", lit(statePreserved))
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
        |  true AS probe_pruned, CAST(2 AS BIGINT) AS cells_probed,
        |  CAST(3 AS BIGINT) AS ingest_commits,
        |  true AS compacted, true AS state_preserved
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
        val preSwapPreserved = postSwapOld.except(preSwapRows).isEmpty &&
          preSwapRows.except(postSwapOld).isEmpty
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

    ("x_hits",
      (s: SparkSession, d: String) => {
        // The rescale product v·S can exceed BIGINT once a raw score tops
        // ~9.2e12 (≈9M buyers each at hub=S) — and DuckDB's sum() widens
        // to HUGEINT while Spark's stays long, so the engines would
        // diverge exactly at the overflow boundary. Both sides therefore
        // widen the product explicitly (DECIMAL(38) in [[hitsAuthorities]],
        // HUGEINT in the oracle); the quotient is ≤ S by construction
        // (v ≤ max(v)), so the result always fits back in BIGINT. The raw
        // SUM itself is bounded by degree·S ≤ 9.2e18 up to ~9.2e12 edges
        // per node — beyond any real bipartite purchase graph.
        val edges = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
          .distinct()
        hitsAuthorities(edges).orderBy(col("a").desc, col("p")).limit(10)
          .select(col("p").as("part"), col("a").as("authority"))
      },
      """WITH edges AS (
        |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |h0 AS (SELECT DISTINCT c, CAST(1000000 AS BIGINT) AS h FROM edges),
        |a1r AS (SELECT e.p, CAST(sum(h.h) AS BIGINT) AS a
        |        FROM edges e JOIN h0 h USING (c) GROUP BY 1),
        |a1 AS (SELECT p, CAST((CAST(a AS HUGEINT) * 1000000)
        |         // (SELECT max(a) FROM a1r) AS BIGINT) AS a FROM a1r),
        |h1r AS (SELECT e.c, CAST(sum(a.a) AS BIGINT) AS h
        |        FROM edges e JOIN a1 a USING (p) GROUP BY 1),
        |h1 AS (SELECT c, CAST((CAST(h AS HUGEINT) * 1000000)
        |         // (SELECT max(h) FROM h1r) AS BIGINT) AS h FROM h1r),
        |a2r AS (SELECT e.p, CAST(sum(h.h) AS BIGINT) AS a
        |        FROM edges e JOIN h1 h USING (c) GROUP BY 1),
        |a2 AS (SELECT p, CAST((CAST(a AS HUGEINT) * 1000000)
        |         // (SELECT max(a) FROM a2r) AS BIGINT) AS a FROM a2r),
        |h2r AS (SELECT e.c, CAST(sum(a.a) AS BIGINT) AS h
        |        FROM edges e JOIN a2 a USING (p) GROUP BY 1),
        |h2 AS (SELECT c, CAST((CAST(h AS HUGEINT) * 1000000)
        |         // (SELECT max(h) FROM h2r) AS BIGINT) AS h FROM h2r),
        |a3r AS (SELECT e.p, CAST(sum(h.h) AS BIGINT) AS a
        |        FROM edges e JOIN h2 h USING (c) GROUP BY 1),
        |a3 AS (SELECT p, CAST((CAST(a AS HUGEINT) * 1000000)
        |         // (SELECT max(a) FROM a3r) AS BIGINT) AS a FROM a3r)
        |SELECT p AS part, a AS authority FROM a3
        |ORDER BY a DESC, p LIMIT 10""".stripMargin),

    // X4n: BIGRAM-LM QUALITY SCORING — the CCNet/Gopher "perplexity
    // filter" shape: train an n-gram language model ON the corpus, score
    // every document by how predictable its text is under that model, and
    // gate low-scoring documents out of the training mix. Kept in exact
    // integers for cross-engine parity: the per-bigram conditional
    // probability p(w2|w1) = c(w1 w2)/c(w1·) becomes the fixed point
    // (c2 * 1e6) div c1, and a document's score is the floor-average of
    // its bigrams' fixed points — a monotone proxy for mean per-token
    // likelihood (the log/geometric mean of true perplexity is
    // float-territory; an arithmetic mean of the SAME per-bigram
    // likelihoods ranks low-predictability docs the same way and stays
    // hash-comparable). Plan shape, sized for 100 TB: both count tables
    // are map-side-combined hash aggregates; the MODEL (probs) is
    // vocabulary²-bounded — built by a vocab-sized join of c2 against c1,
    // NOT by joining the corpus twice — and at scale is exactly the
    // artifact you would persist as a Graft table between crawls (the
    // KenLM binary of this pipeline). The single corpus-sized exchange is
    // the probe join of the bigram stream against the model on the bigram
    // key. c2*1e6 needs c2 ≤ 9.2e12 — beyond any single bigram's corpus
    // frequency before DECIMAL widening is needed (x_anomaly_days note).
    ("x_lm_score",
      (s: SparkSession, d: String) =>
        lmScoreRollup(Tables.documents(s, d)).orderBy("lang"),
      s"""WITH toks AS (
        |  SELECT doc_id, lang, $toksSql AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, unnest(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS bg
        |  FROM toks),
        |c2 AS (SELECT bg, count(*) AS c2 FROM bg GROUP BY 1),
        |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c1
        |       FROM bg GROUP BY 1),
        |probs AS (
        |  SELECT c2.bg, (c2.c2 * 1000000) // c1.c1 AS q
        |  FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.w1),
        |ds AS (
        |  SELECT b.doc_id, min(b.lang) AS lang,
        |    CAST(sum(probs.q) AS BIGINT) // count(*) AS score
        |  FROM bg b JOIN probs ON b.bg = probs.bg GROUP BY 1)
        |SELECT lang, count(*) AS docs,
        |  CAST(sum(score) AS BIGINT) // count(*) AS avg_score,
        |  min(score) AS min_score, max(score) AS max_score,
        |  CAST(SUM(CASE WHEN score < 33000 THEN 1 ELSE 0 END) AS BIGINT) AS n_low
        |FROM ds GROUP BY 1 ORDER BY 1""".stripMargin),

    // X4o: IMPORTANCE RESAMPLING over hashed n-gram features — the DSIR
    // recipe (Xie et al. 2023, public): pick training data whose feature
    // distribution matches a TARGET domain by (1) hashing each document's
    // bigrams into a small fixed feature space, (2) weighting every
    // feature bucket by the target-vs-corpus frequency ratio, (3) scoring
    // each document by its average bucket weight, and (4) keeping it with
    // probability proportional to that importance weight. Everything is
    // deterministic and engine-neutral: buckets are the first 2 hex chars
    // of md5(bigram) (256 cells — the hashed-feature table is CONSTANT
    // size no matter the corpus, which is the whole point of hashed DSIR:
    // the model broadcasts at any scale), ratios are the fixed point
    // (target_cnt * 2^20) div corpus_cnt, and the accept/reject coin is
    // the first 5 hex chars of a salted md5 of the doc id read as an
    // integer in [0, 2^20) — accept iff u < weight, so acceptance
    // probability IS the importance weight, reproducibly on both engines
    // (Spark conv(hex,16,10); DuckDB CAST('0x'||hex)). Target here =
    // lang='en' (the fixture's languages share a synthetic vocabulary, so
    // the separation is modest — en tilts ~459k/2^20 vs ~449k — but the
    // acceptance math is exactly the production shape). One corpus-sized
    // pass against a broadcast 256-row weight table; no shuffle wider
    // than the per-doc aggregate.
    ("x_importance_resample",
      (s: SparkSession, d: String) => {
        // pinned: the hashed-feature stream feeds BOTH the weight
        // aggregate and the probe join — unpinned, Spark re-tokenizes
        // and re-hashes the corpus once per read (no common-subplan
        // reuse across a self-join; the repo-wide pin discipline). The
        // materialized rows are narrow: (doc_id, lang, 2-hex bucket).
        val feats = Tables.documents(s, d)
          .select(col("doc_id"), col("lang"),
            explode(TF.shingles(col("text"), 2)).as("bg"))
          .select(col("doc_id"), col("lang"),
            substring(md5(col("bg")), 1, 2).as("b"))
          .localCheckpoint()
        val w = feats.groupBy("b")
          .agg(count(lit(1)).as("cc"),
            sum(when(col("lang") === "en", 1L).otherwise(0L)).as("tc"))
          .select(col("b"), expr("(tc * 1048576) div cc").as("w"))
        val perDoc = feats.join(broadcast(w), "b")
          .groupBy("doc_id")
          .agg(min(col("lang")).as("lang"),
            expr("sum(w) div count(1)").as("wdoc"))
          .withColumn("u",
            expr("conv(substring(md5(concat('is_', cast(doc_id as string))), 1, 5), 16, 10)")
              .cast("long"))
        perDoc.groupBy("lang")
          .agg(count(lit(1)).as("docs"),
            sum(when(col("u") < col("wdoc"), 1L).otherwise(0L)).as("kept"),
            sum(col("wdoc")).as("total_weight"))
          .orderBy("lang")
      },
      s"""WITH toks AS (
        |  SELECT doc_id, lang, $toksSql AS t FROM documents),
        |feats AS (
        |  SELECT doc_id, lang, substr(md5(bg), 1, 2) AS b FROM (
        |    SELECT doc_id, lang, unnest(list_transform(
        |      generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS bg
        |    FROM toks)),
        |w AS (
        |  SELECT b, (SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1048576)
        |      // count(*) AS w
        |  FROM feats GROUP BY 1),
        |pd AS (
        |  SELECT f.doc_id, min(f.lang) AS lang,
        |    CAST(sum(w.w) AS BIGINT) // count(*) AS wdoc
        |  FROM feats f JOIN w USING (b) GROUP BY 1),
        |pu AS (
        |  SELECT lang, wdoc,
        |    CAST(('0x' || substr(md5('is_' || CAST(doc_id AS VARCHAR)), 1, 5))
        |      AS BIGINT) AS u
        |  FROM pd)
        |SELECT lang, count(*) AS docs,
        |  CAST(SUM(CASE WHEN u < wdoc THEN 1 ELSE 0 END) AS BIGINT) AS kept,
        |  CAST(sum(wdoc) AS BIGINT) AS total_weight
        |FROM pu GROUP BY 1 ORDER BY 1""".stripMargin),

    // X4p: INCREMENTAL LM SCORING against a DURABLE model — closes the
    // promise in x_lm_score's comment ("the artifact you would persist as
    // a Graft table between crawls"): the bigram counts live in a
    // bucket-partitioned Graft table as a COUNT-DELTA LOG (each crawl
    // appends its batch's (bg, cnt) partials; the model is the sum per
    // bigram on read — the log-structured-aggregate state shape whose
    // appends never rewrite history and whose maintenance is plain file
    // compaction). A new crawl batch is scored under the model trained on
    // HISTORY ONLY — bigrams the model has never seen score 0 via the
    // left join (out-of-model text reads as improbable, the real
    // new-crawl quality signal) — then appends its own counts so the next
    // batch's model includes it. Certified in-gate, same ritual as every
    // persisted state: mid-sequence binpack compaction (`compacted` =
    // files strictly decreased, `state_preserved` = zero rows lost, via
    // the shared TableOps.compactionProof), append-only file inventory
    // across the batch append, 4 commits pinned, and COUNT CONSERVATION —
    // after the batch append the state's summed counts equal the whole
    // corpus's bigram total, which the oracle recomputes from raw text
    // with no notion of state, appends, or compaction.
    ("x_incremental_lm",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        def bgOf(df: DataFrame) = df.select(col("doc_id"), col("lang"),
          explode(TF.shingles(col("text"), 2)).as("bg"))
        def countsOf(df: DataFrame) = bgOf(df)
          .groupBy("bg").agg(count(lit(1)).as("cnt"))
        val docs = Tables.documents(s, d)
        val hist = docs.filter(col("doc_id") % 2 === 0)
        val batch = docs.filter(col("doc_id") % 2 === 1)
        val cat = TableOps.newCatalog()
        val t = cat.createTable("db.lm_counts", new org.apache.spark.sql.types.StructType()
          .add("bg", org.apache.spark.sql.types.StringType)
          .add("cnt", org.apache.spark.sql.types.LongType),
          partitionBy = Seq("bg" -> Transform.Bucket(4)))
        t.append(s, countsOf(hist.filter(col("doc_id") % 4 === 0)))
        t.append(s, countsOf(hist.filter(col("doc_id") % 4 === 2)))
        // mid-sequence maintenance on the live count log
        val (compacted, statePreserved) = TableOps.compactionProof(s, t)
        val filesBefore = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        // model = the summed log, READ FROM THE STATE (not recomputed
        // from text), through the shared lmProbs (ONE state scan; c1
        // derives from c2 by head-word grouping inside the helper)
        val probs = lmProbs(
          t.toDF(s).groupBy("bg").agg(sum(col("cnt")).as("c2")))
        // pinned: the batch bigram stream feeds both the scoring join
        // and the state append
        val bb = bgOf(batch).localCheckpoint()
        val perDoc = bb.join(probs, Seq("bg"), "left")
          .groupBy("doc_id")
          .agg(min(col("lang")).as("lang"),
            expr("sum(coalesce(q, cast(0 as bigint))) div count(1)").as("score"),
            // in-model bigram count: the honest "unmodeled" basis (a doc
            // can score 0 with SOME bigrams modeled — floor(1/3) = 0)
            sum(when(col("q").isNotNull, 1L).otherwise(0L)).as("modeled"))
        t.append(s, bb.groupBy("bg").agg(count(lit(1)).as("cnt")))
        val filesAfter = t.scan().dataFiles.map(f => (f.path, f.fileSizeBytes)).toSet
        val stateTotal = t.toDF(s).agg(sum(col("cnt"))).head.getLong(0)
        perDoc.groupBy("lang")
          .agg(count(lit(1)).as("docs"),
            expr("sum(score) div count(1)").as("avg_score"),
            min(col("score")).as("min_score"),
            max(col("score")).as("max_score"),
            sum(when(col("modeled") === 0L, 1L).otherwise(0L)).as("n_unmodeled"))
          .withColumn("compacted", lit(compacted))
          .withColumn("state_preserved", lit(statePreserved))
          .withColumn("append_only",
            lit(filesBefore.subsetOf(filesAfter) && filesAfter.size > filesBefore.size))
          .withColumn("incremental_commits", lit(t.meta.snapshots.size.toLong))
          .withColumn("state_total", lit(stateTotal))
          .orderBy("lang")
      },
      s"""WITH toks AS (
        |  SELECT doc_id, lang, $toksSql AS t FROM documents),
        |bg AS (
        |  SELECT doc_id, lang, unnest(list_transform(
        |    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS bg
        |  FROM toks),
        |hist AS (SELECT bg FROM bg WHERE doc_id % 2 = 0),
        |c2 AS (SELECT bg, count(*) AS c2 FROM hist GROUP BY 1),
        |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c1
        |       FROM hist GROUP BY 1),
        |probs AS (
        |  SELECT c2.bg, (c2.c2 * 1000000) // c1.c1 AS q
        |  FROM c2 JOIN c1 ON split_part(c2.bg, ' ', 1) = c1.w1),
        |batch AS (SELECT doc_id, lang, bg FROM bg WHERE doc_id % 2 = 1),
        |ds AS (
        |  SELECT b.doc_id, min(b.lang) AS lang,
        |    CAST(sum(coalesce(p.q, 0)) AS BIGINT) // count(*) AS score,
        |    count(p.q) AS modeled
        |  FROM batch b LEFT JOIN probs p USING (bg) GROUP BY 1)
        |SELECT lang, count(*) AS docs,
        |  CAST(sum(score) AS BIGINT) // count(*) AS avg_score,
        |  min(score) AS min_score, max(score) AS max_score,
        |  CAST(SUM(CASE WHEN modeled = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unmodeled,
        |  true AS compacted, true AS state_preserved, true AS append_only,
        |  CAST(4 AS BIGINT) AS incremental_commits,
        |  (SELECT count(*) FROM bg) AS state_total
        |FROM ds GROUP BY 1 ORDER BY 1""".stripMargin),

    // X4q: STREAMING LM scoring under an EVOLVING model — completes the
    // LM count-log's lifecycle matrix (batch: x_lm_score; durable +
    // compacted: x_incremental_lm; now STREAMING), and it is the first
    // streaming gate whose per-batch ANSWER (not just its state) is
    // order-dependent: each micro-batch scores under the model AS OF
    // ARRIVAL, then folds in its own deltas, so a later batch's scores
    // reflect every earlier batch's counts — the cross-batch distinction
    // only durable model state provides (a bigram first seen by slice 0
    // scores nonzero for slice 1). Since r13 each batch READS the
    // compact MODEL table (vocab-bounded, maintained by a per-batch
    // MERGE — r12 verdict #4) instead of re-summing the whole delta log;
    // the log stays the source of truth and `model_matches_log` REQUIREs
    // model ≡ log-sum after the crawl. Three statementId-keyed commits
    // per batch, results → delta log → model MERGE; a crash anywhere
    // between them replays with identical scores because the merge is
    // LAST, so the replayed batch never sees its own counts (the crash
    // analysis on the helper; StreamLmSpec replays both windows). The
    // oracle replays the sequence as two CTE levels (slice 0 scored
    // under HIST counts; slice 1 under HIST + slice 0) with no streams
    // or state; slices are the %4 parity classes of the odd docs — a
    // data-independent split both engines name identically. After the
    // crawl: compactionProof on the live count log and COUNT
    // CONSERVATION (state total == the whole corpus's bigram count, the
    // x_incremental_lm integrity law surviving micro-batched appends).
    ("x_stream_incremental_lm",
      (s: SparkSession, d: String) => {
        import graft.format.Transform
        import org.apache.spark.sql.types.{LongType, StringType, StructType}
        val docs = Tables.documents(s, d)
        val hist = docs.filter(col("doc_id") % 2 === 0)
        val batch = docs.filter(col("doc_id") % 2 === 1)
          .select("doc_id", "lang", "text")
        val stage = TableOps.newTempDir("graft-slm")
        val (t, model, res) = FixtureClock.timed { // history counts + staging I/O
          val cat = TableOps.newCatalog()
          val histCounts = hist
            .select(col("doc_id"), explode(TF.shingles(col("text"), 2)).as("bg"))
            .groupBy("bg").agg(count(lit(1)).as("cnt"))
            .localCheckpoint() // seeds BOTH the delta log and the model
          val tbl = cat.createTable("db.lm_counts_s", new StructType()
            .add("bg", StringType).add("cnt", LongType),
            partitionBy = Seq("bg" -> Transform.Bucket(4)))
          tbl.append(s, histCounts)
          // the COMPACT model table each batch reads (bounded by vocab,
          // runtime-filtered by the batch's head-word set — w1-bucketed
          // and w1-bloom'd for that probe); the delta log above stays
          // the source of truth
          val mdl = cat.createTable("db.lm_model_s", new StructType()
            .add("bg", StringType).add("c2", LongType).add("w1", StringType),
            partitionBy = Seq("w1" -> Transform.Bucket(4)),
            properties = Map(graft.format.TableProperties.BloomColumns -> "w1"))
          mdl.append(s, histCounts.select(col("bg"), col("cnt").as("c2"),
            substring_index(col("bg"), " ", 1).as("w1")))
          val resT = cat.createTable("db.lm_scores_s", new StructType()
            .add("doc_id", LongType).add("lang", StringType)
            .add("score", LongType).add("modeled", LongType))
          stageOrderedSlices(batch, stage,
            when(pmod(col("doc_id"), lit(4L)) === 1L, 0).otherwise(1), 2)
          (tbl, mdl, resT)
        }
        val batches = streamIncrementalLm(s, stage, batch.schema, t, model, res)
        val stateCommits = t.meta.snapshots.size // before the compaction commit
        require(batches == 2 && res.meta.snapshots.size == 2 &&
            stateCommits == 3 && // hist + one per micro-batch
            model.meta.snapshots.size == 3, // hist + one MERGE per batch
          s"LM crawl must run micro-batched: $batches batches, " +
            s"${res.meta.snapshots.size}/$stateCommits/" +
            s"${model.meta.snapshots.size} commits")
        val (compacted, statePreserved) = TableOps.compactionProof(s, t)
        val stateTotal = t.toDF(s).agg(sum(col("cnt"))).head.getLong(0)
        // the model-maintenance invariant, REQUIREd: the merged-in-place
        // model equals the delta log's sum, row for row
        val logSum = t.toDF(s).groupBy("bg").agg(sum(col("cnt")).as("c2"))
        val modelDf = model.toDF(s).select("bg", "c2")
        val modelMatchesLog = modelDf.except(logSum).isEmpty &&
          logSum.except(modelDf).isEmpty
        require(modelMatchesLog, "model table must equal the delta-log sum")
        res.toDF(s).groupBy("lang")
          .agg(count(lit(1)).as("docs"),
            expr("sum(score) div count(1)").as("avg_score"),
            min(col("score")).as("min_score"),
            max(col("score")).as("max_score"),
            sum(when(col("modeled") === 0L, 1L).otherwise(0L)).as("n_unmodeled"))
          .withColumn("ingest_commits", lit(res.meta.snapshots.size.toLong))
          .withColumn("state_commits", lit(stateCommits.toLong))
          .withColumn("compacted", lit(compacted))
          .withColumn("state_preserved", lit(statePreserved))
          .withColumn("state_total", lit(stateTotal))
          .withColumn("model_commits", lit(model.meta.snapshots.size.toLong))
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
        |s0 AS (SELECT doc_id, lang, bg FROM bg WHERE doc_id % 4 = 1),
        |s1 AS (SELECT doc_id, lang, bg FROM bg WHERE doc_id % 4 = 3),
        |c2_0 AS (SELECT bg, count(*) AS c2 FROM hist GROUP BY 1),
        |c1_0 AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c1
        |         FROM hist GROUP BY 1),
        |p0 AS (
        |  SELECT c2_0.bg, (c2 * 1000000) // c1 AS q
        |  FROM c2_0 JOIN c1_0 ON split_part(c2_0.bg, ' ', 1) = c1_0.w1),
        |d0 AS (
        |  SELECT b.doc_id, min(b.lang) AS lang,
        |    CAST(sum(coalesce(p.q, 0)) AS BIGINT) // count(*) AS score,
        |    count(p.q) AS modeled
        |  FROM s0 b LEFT JOIN p0 p USING (bg) GROUP BY 1),
        |h1 AS (SELECT bg FROM hist UNION ALL SELECT bg FROM s0),
        |c2_1 AS (SELECT bg, count(*) AS c2 FROM h1 GROUP BY 1),
        |c1_1 AS (SELECT split_part(bg, ' ', 1) AS w1, count(*) AS c1
        |         FROM h1 GROUP BY 1),
        |p1 AS (
        |  SELECT c2_1.bg, (c2 * 1000000) // c1 AS q
        |  FROM c2_1 JOIN c1_1 ON split_part(c2_1.bg, ' ', 1) = c1_1.w1),
        |d1 AS (
        |  SELECT b.doc_id, min(b.lang) AS lang,
        |    CAST(sum(coalesce(p.q, 0)) AS BIGINT) // count(*) AS score,
        |    count(p.q) AS modeled
        |  FROM s1 b LEFT JOIN p1 p USING (bg) GROUP BY 1),
        |ds AS (SELECT * FROM d0 UNION ALL SELECT * FROM d1)
        |SELECT lang, count(*) AS docs,
        |  CAST(sum(score) AS BIGINT) // count(*) AS avg_score,
        |  min(score) AS min_score, max(score) AS max_score,
        |  CAST(SUM(CASE WHEN modeled = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unmodeled,
        |  CAST(2 AS BIGINT) AS ingest_commits, CAST(3 AS BIGINT) AS state_commits,
        |  true AS compacted, true AS state_preserved,
        |  (SELECT count(*) FROM bg) AS state_total,
        |  CAST(3 AS BIGINT) AS model_commits, true AS model_matches_log
        |FROM ds GROUP BY 1 ORDER BY 1""".stripMargin),

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
        val modelMatchesLog = modelDf.except(logSum).isEmpty &&
          logSum.except(modelDf).isEmpty
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
        require(repaired.except(scratch).isEmpty && scratch.except(repaired).isEmpty,
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
        require(repaired.except(scratch).isEmpty && scratch.except(repaired).isEmpty,
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
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  )
}
