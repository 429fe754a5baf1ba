package graft.queries

import graft.functions.{TextFunctions => TF, VectorFunctions => VF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sketch / graph / behavioral / statistics gates: KMV, quantiles, funnels, cohorts, transitions, PageRank, HITS, triangles, OLS, bootstrap, skyline (SURVEY §2.9 X6, X9-X12).
  *
  * One slice of [[Extensions.entries]] (split in r14 so no single file
  * holds a third of the source); each tuple is (gate key, Spark query,
  * DuckDB oracle SQL) and the semantics are unchanged from the monolith.
  * Self-typed to the aggregator so gate bodies use its shared helpers.
  */
trait ExtensionsAnalyticsGates { this: Extensions.type =>

  private[queries] def analyticsGates: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(


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
  )
}
