package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scale-out helpers for the shapes that break at 100 TB: skewed join keys
  * and exact-distinct memory blowups (SURVEY.md §4 "Optimize for scale").
  */
object ScaleFunctions {

  /** Salted equi-join for skewed keys: the large side gets a random-free,
    * deterministic salt derived from a high-cardinality column; the small
    * side is exploded `saltFactor` ways so every salted key still matches.
    * Use when AQE's skew-join split isn't available (e.g. non-shuffle-join
    * consumers) or a single key dwarfs everything else.
    *
    * @param salting column on the LARGE side with per-row variation (an id);
    *                salt = pmod(hash(salting), saltFactor)
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salting: Column, saltFactor: Int,
                 joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1)
    // only join types that DON'T preserve the small side: the small side is
    // replicated saltFactor times, so a right/full outer join would emit
    // saltFactor null-padded rows for every unmatched small-side key
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti", "cross")
    require(ok.contains(joinType.toLowerCase.replace(" ", "_")),
      s"saltedJoin does not support '$joinType': the replicated small side " +
        "would duplicate unmatched rows under small-side-preserving joins")
    val l = large.withColumn("_salt", pmod(hash(salting), lit(saltFactor)))
    val s = small.withColumn("_salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(s, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** COUNT(DISTINCT) with a bounded-memory sketch (HyperLogLog++): the scale
    * substitute for exact distinct (which expands every row at 100 TB).
    * `rsd` = relative standard deviation (default 5%).
    */
  def approxDistinct(col0: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(col0, rsd)

  /** Deterministic proportional sample by key hash — repeatable across runs
    * AND engines: md5 of the key's string form, the same portable scheme
    * sampledQuantiles uses (Spark's murmur3 hash() cannot be reproduced by
    * an external oracle). Keeps rows whose 24-bit md5 prefix falls below
    * `fraction` of the space; DuckDB twin:
    * ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 6))::BIGINT < floor(f * 16777216).
    */
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    df.filter(conv(substring(md5(keyCol.cast("string")), 1, 6), 16, 10).cast("long") <
      lit(math.floor(fraction * (1 << 24)).toLong))
  }

  /** Quantiles WITHOUT a global sort — the 100 TB shape (the same idea
    * Spark's own RangePartitioner uses: sort a sample, not the data). A
    * deterministic md5 sample (rows whose hex prefix < `rateHexCeil`, e.g.
    * "04" keeps 4/256 ≈ 1.6%) is the only thing ever sorted; the full
    * corpus does one map-side filter and nothing else. Estimates are
    * nearest-rank picks from the sorted sample (position floor((n-1)·p)+1)
    * — picked ELEMENTS, not interpolated arithmetic, so values are exact
    * and the whole computation is engine-reproducible (md5 + integer
    * positions; ties broken by the row's md5). Standard error is
    * O(1/sqrt(sample size)) in rank space.
    *
    * Deliberately NOT percentile()/approx_percentile: exact percentile
    * sorts the corpus, and both engines' interpolation/sketch internals
    * are implementation-defined — nearest-rank-of-sample is scalable AND
    * bit-reproducible.
    *
    * @param sampleKey   unique row key (sampling + tie-break basis)
    * @param rateHexCeil sample = rows with md5 2-hex prefix below this
    * @param ps          (label, p) quantile requests, 0 < p < 1
    * @param maxSampleRows hard cap on the sample size: before anything is
    *                    sorted, a key-column-only count of the sample runs
    *                    and the call fails loudly if it exceeds this. Makes
    *                    the 100 TB contract self-enforcing — a careless
    *                    rateHexCeil ("ff") can no longer degenerate into a
    *                    single-task sort of the corpus. The pre-count is a
    *                    map-only pass over ONE column (the sample key);
    *                    pass None to skip it when the rate is already known
    *                    to be safe.
    * @return (quantile, value, sample_n) one row per requested p
    */
  def sampledQuantiles(df: DataFrame, valueCol: Column, sampleKey: Column,
                       rateHexCeil: String, ps: Seq[(String, Double)],
                       maxSampleRows: Option[Long] = Some(10000000L)): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0 && p < 1 })
    // the ceil is compared against lowercase md5 hex: anything outside
    // [0-9a-f]+ silently degenerates — "" keeps NO rows (zero-row result),
    // a string above "ff" keeps EVERY row (the maxSampleRows guard below
    // catches that by volume, this require catches it by syntax)
    require(rateHexCeil.nonEmpty && rateHexCeil.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"rateHexCeil must be non-empty lowercase hex, got '$rateHexCeil'")
    import org.apache.spark.sql.expressions.Window
    // sample-volume guard: count ONLY the sample key column through the
    // same filter (column-pruned, map-only — no sort, no shuffle) and
    // refuse before the coalesce(1) sort below can become a corpus sort
    maxSampleRows.foreach { cap =>
      require(cap > 0, s"maxSampleRows must be positive, got $cap")
      val sampleN = df
        .select(md5(sampleKey.cast("string")).as("tb"))
        .filter(substring(col("tb"), 1, rateHexCeil.length) < rateHexCeil)
        .count()
      require(sampleN <= cap,
        s"sampledQuantiles: rateHexCeil '$rateHexCeil' selects $sampleN rows, " +
          s"above the $cap-row sample cap — that sample would be sorted on a " +
          "single task. Lower the rate (more hex digits / smaller ceiling) " +
          "or raise maxSampleRows deliberately.")
    }
    // NULL values are excluded (quantiles of the non-null population, the
    // same rule aggregate quantile functions use — and engines disagree on
    // where NULL sorts, so keeping them would break reproducibility)
    val keyed = df.select(valueCol.as("v"), md5(sampleKey.cast("string")).as("tb"))
      .filter(col("v").isNotNull)
      .filter(substring(col("tb"), 1, rateHexCeil.length) < rateHexCeil)
    // the sample (rate-bounded) is the only global sort in the plan; rn and
    // n come from the same single-partition pass (the count window adds no
    // exchange on one partition — and no second scan of the corpus)
    val sorted = keyed.orderBy(col("v"), col("tb")).coalesce(1)
      .sortWithinPartitions(col("v"), col("tb"))
      .withColumn("rn", monotonically_increasing_id() + 1)
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
    val wanted = ps.map { case (label, p) =>
      struct(lit(label).as("label"), lit(p).as("p"))
    }
    // position arithmetic is (n-1)·p in DOUBLE — oracles must use DOUBLE
    // literals too (a DECIMAL 0.95 lands on exact integers where binary64
    // 0.95 floors one lower; same IEEE expression or no reproducibility)
    sorted
      .withColumn("q", explode(array(wanted: _*)))
      .filter(col("rn") === floor((col("n") - 1).cast("double") * col("q.p")) + 1)
      .select(col("q.label").as("quantile"), col("v").as("value"),
        col("n").as("sample_n"))
      .orderBy("quantile")
  }

  /** Per-GROUP sampled quantiles — [[sampledQuantiles]] partitioned by a
    * group key (per-language length distributions, per-source quality
    * spreads — the per-domain statistic a corpus report needs). Same
    * determinism contract: the md5-prefix sample is the only thing ever
    * sorted, quantiles are nearest-rank PICKED elements with md5
    * tie-breaks, everything engine-reproducible. The plan pays ONE
    * exchange on the group key, and every window partition holds only
    * that group's SAMPLE (rate-bounded) — never the group itself; a
    * giant group costs its sample, not its size. Groups whose sample is
    * empty are absent from the output (both engines draw the identical
    * sample, so absence reproduces too).
    *
    * @param maxSamplePerGroup guard twin of [[sampledQuantiles]]'s cap,
    *        enforced per group via one hash-agg pre-pass over the sample
    *        keys (no sort): refuse loudly before any window partition
    *        could become a corpus-sized sort.
    * @return (group, quantile, value, sample_n) per group × requested p
    */
  def groupedQuantiles(df: DataFrame, groupCol: Column, valueCol: Column,
                       sampleKey: Column, rateHexCeil: String,
                       ps: Seq[(String, Double)],
                       maxSamplePerGroup: Option[Long] = Some(10000000L)): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (_, p) => p > 0 && p < 1 })
    require(rateHexCeil.nonEmpty && rateHexCeil.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"rateHexCeil must be non-empty lowercase hex, got '$rateHexCeil'")
    import org.apache.spark.sql.expressions.Window
    val keyed = df
      .select(groupCol.as("g"), valueCol.as("v"),
        md5(sampleKey.cast("string")).as("tb"))
      .filter(col("v").isNotNull)
      .filter(substring(col("tb"), 1, rateHexCeil.length) < rateHexCeil)
    maxSamplePerGroup.foreach { cap =>
      require(cap > 0, s"maxSamplePerGroup must be positive, got $cap")
      val worst = keyed.groupBy(col("g")).agg(count(lit(1)).as("c"))
        .agg(max(col("c"))).head
      val maxN = if (worst.isNullAt(0)) 0L else worst.getLong(0)
      require(maxN <= cap,
        s"groupedQuantiles: rateHexCeil '$rateHexCeil' selects $maxN rows for " +
          s"some group, above the $cap-row per-group sample cap — that window " +
          "partition would sort on a single task. Lower the rate or raise " +
          "maxSamplePerGroup deliberately.")
    }
    val w = Window.partitionBy(col("g"))
    val ranked = keyed
      .withColumn("rn", row_number().over(w.orderBy(col("v"), col("tb"))))
      .withColumn("n", count(lit(1)).over(w))
    val wanted = ps.map { case (label, p) =>
      struct(lit(label).as("label"), lit(p).as("p"))
    }
    ranked
      .withColumn("q", explode(array(wanted: _*)))
      .filter(col("rn") === floor((col("n") - 1).cast("double") * col("q.p")) + 1)
      .select(col("g").as("group"), col("q.label").as("quantile"),
        col("v").as("value"), col("n").as("sample_n"))
      .orderBy("group", "quantile")
  }
}
