package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed cardinality sketches (SURVEY.md §2.9 X-family): KMV
  * (k-minimum-values) distinct-count estimation.
  *
  * Why KMV and not HyperLogLog: Spark ships HLL++ as
  * `approx_count_distinct`, but its register layout is engine-internal —
  * no cross-engine oracle can re-derive it. KMV's state is just the k
  * smallest values of a uniform hash, so a DuckDB oracle reproduces the
  * sketch BIT-EXACTLY from the same md5 hash (both engines agree on md5
  * and on integer order), while keeping the properties that matter at
  * 100 TB:
  *
  *  - **Mergeable**: sketch(A ∪ B) = top-k(min) of sketch(A) ∪ sketch(B).
  *    Partial sketches from 1000 executors (or 1000 days of partitions)
  *    merge by keeping the k smallest hashes — the same shape as any
  *    distributive aggregate.
  *  - **Bounded state**: k hashes (k·8 bytes) regardless of input size.
  *  - **One cheap pass**: the plan is map-side partial-distinct on the
  *    60-bit hash, then TakeOrderedAndProject (each task keeps ≤ k rows,
  *    the driver merges k·partitions) — the full value set is never
  *    collected or globally sorted.
  *
  * Estimator: with h_k = the k-th smallest of distinct 60-bit hashes,
  * E[distinct] ≈ (k-1) · 2^60 / h_k (the classic KMV estimator). The
  * division is done in DOUBLE then floored — both engines evaluate the
  * identical IEEE expression, so even the estimate matches exactly.
  */
object SketchFunctions {

  /** 2^60 — the hash space of a 15-hex-digit (60-bit) md5 prefix; fits a
    * signed BIGINT with headroom.
    */
  val HashSpace: Double = 1152921504606846976.0

  /** Uniform 60-bit hash of a column: md5 of the string form, first 15 hex
    * digits as BIGINT. Stringly on purpose — DuckDB derives the identical
    * value with `('0x' || substr(md5(v), 1, 15))::BIGINT`.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Driver-side twin of [[hash60]] for a literal string — probe routing
    * (e.g. the inverted-index bucket of a query term) must match the
    * writer's bucketing bit-for-bit.
    */
  def hash60Local(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** The KMV sketch: k smallest distinct 60-bit hashes of `c`, ascending.
    * distinct() dedups map-side first (partial hash aggregate), so the
    * exchange carries per-partition-distinct hashes only; orderBy.limit(k)
    * plans TakeOrderedAndProject — no global sort. NULL inputs are
    * excluded, matching countDistinct (and Spark sorts NULL first while
    * other engines sort it last — a kept NULL would both inflate the
    * estimate by a phantom value and break cross-engine reproducibility).
    */
  def kmvSketch(df: DataFrame, c: Column, k: Int): DataFrame =
    df.select(hash60(c).as("h")).where(col("h").isNotNull)
      .distinct().orderBy("h").limit(k)

  /** Merge partial sketches: keep the k smallest distinct hashes of the
    * union — the executor-side combine step at scale.
    */
  def kmvMerge(sketches: Seq[DataFrame], k: Int): DataFrame = {
    require(sketches.nonEmpty, "kmvMerge needs at least one partial sketch")
    sketches.reduce(_ unionByName _).distinct().orderBy("h").limit(k)
  }

  /** Per-GROUP KMV sketches in one pass: for every value of `groupCol`,
    * the k smallest distinct hashes of `valueCol`, plus the per-group
    * estimate — distinct-count-by-group without shuffling the value set.
    *
    * Plan shape at scale: one partial-distinct aggregate on (group, hash)
    * (map-side combine dedups before the exchange), then ONE hash
    * exchange of per-partition-distinct (group, hash) pairs, then a
    * window row_number per group to keep k — state per group is k rows,
    * never a collect_set. Compare exact countDistinct-by-group, which
    * moves every distinct value to one reducer per group and holds the
    * whole set; for a heavy-hitter group at 100 TB that reducer is the
    * job. Skew-safe by construction: every group's reducer state is k·8
    * bytes.
    *
    * @return (groupCol, k, kth_hash, est_distinct) one row per group
    */
  def kmvSketchByGroup(df: DataFrame, groupCol: Column, valueCol: Column,
                       k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.select(groupCol.as("g"), hash60(valueCol).as("h"))
      .where(col("h").isNotNull) // countDistinct semantics, see kmvSketch
      .distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g")).orderBy(col("h"))))
      .filter(col("rn") <= k)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), max(col("h")).as("kth_hash"))
      .select(col("g"),
        col("n").cast("int").as("k"),
        col("kth_hash"),
        when(col("n") < k, col("n"))
          .otherwise(floor(
            (col("n").cast("double") - 1.0) * lit(HashSpace)
              / col("kth_hash").cast("double")).cast("long"))
          .as("est_distinct"))
  }

  /** Distinct-count estimate from a sketch: (k-1) · 2^60 / h_k, floored.
    * Returns one row (k, kth_hash, est_distinct). If the input has fewer
    * than k distinct values the sketch IS the value set and the exact
    * count is returned instead (the standard KMV small-range rule).
    */
  def kmvEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("n"), max(col("h")).as("kth_hash"))
      .select(
        col("n").cast("int").as("k"),
        col("kth_hash"),
        when(col("n") < k, col("n"))
          .otherwise(floor(
            (col("n").cast("double") - 1.0) * lit(HashSpace)
              / col("kth_hash").cast("double")).cast("long"))
          .as("est_distinct"))
}
