package graft.queries

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis gates: tokens, language ID, quality, TF-IDF, heavy hitters, chunking, profile, PII, shuffle/split/mix, OOV, novelty, LM scoring (SURVEY §2.9 X4).
  *
  * One slice of [[Extensions.entries]] (split in r14 so no single file
  * holds a third of the source); each tuple is (gate key, Spark query,
  * DuckDB oracle SQL) and the semantics are unchanged from the monolith.
  * Self-typed to the aggregator so gate bodies use its shared helpers.
  */
trait ExtensionsTextGates { this: Extensions.type =>

  private[queries] def textGates: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(


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
  )
}
