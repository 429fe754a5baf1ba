package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — match each point row to every interval
  * row with the same key whose half-open window `[start, end)` contains the
  * point. The attribution/enrichment staple (click → campaign window,
  * reading → maintenance window) that an equi-join cannot express.
  *
  * Spark has no range-join operator, and the naive encoding — a join whose
  * only equi-key is the business key plus a `BETWEEN` residual — degrades
  * to one shuffled partition per key with an O(points·intervals) residual
  * scan per key (or, with no key, a BroadcastNestedLoopJoin over the whole
  * cross product). This is the standard binning decomposition instead:
  * overlay a fixed grid of `binWidthMicros`-wide bins on the timeline,
  * explode each interval to the bins it covers, bin each point once, and
  * hash-join on `(key, bin)` before applying the exact containment filter.
  * Cost: one hash exchange of `points + intervals·binsPerInterval` rows
  * and an exact filter — no nested loop, no per-key serialization beyond
  * ordinary hash-partition skew. Choose `binWidthMicros` near the typical
  * interval length: each interval then explodes to ~2 bins and each point
  * probes exactly one.
  *
  * Scale guard: a single pathological interval spanning the whole timeline
  * would explode to millions of grid bins and amplify the build side
  * unboundedly — `maxBinsPerInterval` (default 4096) fails the job loudly
  * (with the offending span) instead of silently materializing it. Clamp
  * or split oversized intervals upstream; raising the cap is a conscious
  * act, not a default.
  *
  * Contract: intervals are half-open `[start, end)` (the calendar/window
  * convention — adjacent windows tile without double-matching); rows with
  * NULL or empty/inverted windows (`end <= start`) match nothing; NULL-ts
  * points match nothing. Output = every (point, interval) containment
  * pair: all point columns pass through, interval columns surface under
  * `prefix` (default "iv_"). Overlapping intervals yield one output row
  * per containing interval, by definition.
  */
object RangeJoin {

  /** @param points   probe side; all its columns pass through
    * @param intervals build side: key + [startTs, endTs) + payload columns
    * @param key       equi-join key present on both sides
    * @param pointTs   point instant column (castable to timestamp)
    * @param startTs   interval start (inclusive), castable to timestamp
    * @param endTs     interval end (exclusive), castable to timestamp
    * @param binWidthMicros grid width; pick ~ the typical interval span
    * @param maxBinsPerInterval loud-failure cap on per-interval explosion
    * @param prefix    interval columns surface as prefix+name
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, key: String,
                      pointTs: String, startTs: String, endTs: String,
                      binWidthMicros: Long = 3600L * 1000000L,
                      maxBinsPerInterval: Int = 4096,
                      prefix: String = "iv_"): DataFrame = {
    require(binWidthMicros > 0, "binWidthMicros must be positive")
    require(maxBinsPerInterval > 0, "maxBinsPerInterval must be positive")
    require(!points.columns.exists(_.startsWith("_rj_")) &&
      !intervals.columns.exists(_.startsWith("_rj_")),
      "column names starting with _rj_ are reserved by pointInInterval")
    val ivCols = intervals.columns.filterNot(_ == key).toSeq
    val collide = ivCols.map(prefix + _).toSet intersect points.columns.toSet
    require(collide.isEmpty, s"prefixed interval columns collide with point columns: ${collide.mkString(", ")}")

    // exact floor division (negative-safe): subtract the non-negative
    // remainder so the division is of an exact multiple, then divide in
    // DECIMAL — double division would round the numerator past 2^53
    // (timestamps beyond ~year 2255, e.g. 9999-12-31 sentinels) and could
    // land a point in the adjacent bin, silently dropping its matches
    def bin(c: Column): Column = {
      val u = unix_micros(c.cast("timestamp"))
      ((u - pmod(u, lit(binWidthMicros))).cast("decimal(20,0)") / binWidthMicros)
        .cast("long")
    }

    val iv = intervals
      .withColumn("_rj_s", bin(col(startTs)))
      // end is exclusive: the last covered bin holds instant end - 1us
      .withColumn("_rj_e", bin(col(endTs)) -
        when(pmod(unix_micros(col(endTs).cast("timestamp")), lit(binWidthMicros)) === 0, 1)
          .otherwise(0))
      .filter(col("_rj_s").isNotNull && col("_rj_e") >= col("_rj_s"))
      // the guard feeds the join key (not a dropped side column), so column
      // pruning can never optimize the loud failure away
      .withColumn("_rj_e", when(
          col("_rj_e") - col("_rj_s") + 1 > maxBinsPerInterval,
          raise_error(concat(
            lit(s"pointInInterval: interval spans more than $maxBinsPerInterval bins ("),
            col("_rj_e") - col("_rj_s") + 1,
            lit(s" at binWidthMicros=$binWidthMicros); clamp or split the interval, or widen the bin")
          )).cast("long")
        ).otherwise(col("_rj_e")))
      .withColumn("_rj_bin", explode(sequence(col("_rj_s"), col("_rj_e"))))
      .select(Seq(col(key), col("_rj_bin")) ++
        ivCols.map(c => col(c).as(prefix + c)): _*)

    points
      .withColumn("_rj_bin", bin(col(pointTs)))
      .join(iv, Seq(key, "_rj_bin"))
      .filter(col(pointTs).cast("timestamp") >= col(prefix + startTs).cast("timestamp") &&
        col(pointTs).cast("timestamp") < col(prefix + endTs).cast("timestamp"))
      .drop("_rj_bin")
  }
}
