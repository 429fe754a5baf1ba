package graft.queries

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication gates: exact / near-dup (MinHash, SimHash, banded, edit, Jaccard, embedding, semantic) / containment / chunk / decontamination families (SURVEY §2.9 X1-X2).
  *
  * One slice of [[Extensions.entries]] (split in r14 so no single file
  * holds a third of the source); each tuple is (gate key, Spark query,
  * DuckDB oracle SQL) and the semantics are unchanged from the monolith.
  * Self-typed to the aggregator so gate bodies use its shared helpers.
  */
trait ExtensionsDedupGates { this: Extensions.type =>

  private[queries] def dedupGates: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(


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
  )
}
