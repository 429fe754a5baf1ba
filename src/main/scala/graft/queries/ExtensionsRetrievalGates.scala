package graft.queries

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval and temporal gates: inverted index lifecycle, BM25, phrase, RRF, AS-OF / range joins, window features, gap fill, sessionize (SURVEY §2.9 X7-X8).
  *
  * One slice of [[Extensions.entries]] (split in r14 so no single file
  * holds a third of the source); each tuple is (gate key, Spark query,
  * DuckDB oracle SQL) and the semantics are unchanged from the monolith.
  * Self-typed to the aggregator so gate bodies use its shared helpers.
  */
trait ExtensionsRetrievalGates { this: Extensions.type =>

  private[queries] def retrievalGates: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(


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
  )
}
