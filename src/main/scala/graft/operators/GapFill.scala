package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap fill — densify a per-key daily series onto a continuous
  * calendar, zero-filling missing days and carrying the last observation
  * forward (LOCF). The feature/report densification staple: downstream
  * models and dashboards need "no rows that day" surfaced as an explicit
  * zero (and "sensor silent" as the last seen value), not as an absent row.
  *
  * Shape: the key roster (distinct keys of the sparse input) cross-joins a
  * calendar exploded from ONE global [start, end] span row — the calendar
  * is `span_days` rows per key, generated map-side from a broadcast 1-row
  * bound, so the only real exchanges are the input aggregation and one
  * keyed window for LOCF. Never a per-key driver loop, never a join
  * against a materialized calendar table.
  *
  * Scale guard: the calendar explosion is `keys × span_days` rows — a
  * mis-derived span (epoch-zero sentinel dates are the classic) would
  * quietly generate centuries per key, so spans past `maxSpanDays`
  * (default 36600, ~a century) fail loudly rather than materialize.
  *
  * Contract: `daily` has at most one row per (keys, day) — aggregate
  * upstream; `bounds` is one row with DATE columns `d0`/`d1` (inclusive
  * span, typically min/max day of the wider corpus so every key shares
  * one calendar). Output: one row per (keys, day) with `<value>` zero
  * when absent and `<value>_locf` carrying the last observed value (NULL
  * before the first observation).
  */
object GapFill {

  /** @param daily  sparse per-(keys, day) aggregate; extra columns dropped
    * @param bounds 1-row frame with DATE cols d0, d1 (inclusive span)
    * @param keys   series identity columns
    * @param day    DATE column in `daily`
    * @param value  numeric column to zero-fill and carry forward
    * @param maxSpanDays loud-failure cap on the calendar span
    */
  def fillDaily(daily: DataFrame, bounds: DataFrame, keys: Seq[String],
                day: String, value: String,
                maxSpanDays: Int = 36600): DataFrame = {
    require(keys.nonEmpty, "fillDaily needs at least one key column")
    require(bounds.columns.toSet == Set("d0", "d1"),
      s"bounds must be exactly (d0, d1), got ${bounds.columns.mkString(", ")}")
    val span = datediff(col("d1"), col("d0")) + 1
    // span < 1 (inverted bounds) must ALSO fail loudly: Spark's
    // sequence(d0, d1) silently generates a DESCENDING calendar when
    // d0 > d1 — the epoch-zero-sentinel blowup the cap exists to stop
    val cal = daily.select(keys.map(col): _*).distinct()
      .crossJoin(broadcast(bounds
        .select(when(span > maxSpanDays || span < 1, raise_error(concat(
            lit(s"fillDaily: calendar span outside [1, $maxSpanDays] days ("), span,
            lit("); check the bounds derivation")))
          .cast("date")).otherwise(col("d0")).as("d0"), col("d1"))))
      .withColumn(day, explode(sequence(col("d0"), col("d1"))))
      .drop("d0", "d1")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(day))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily.select((keys :+ day :+ value).map(col): _*),
        keys :+ day, "left")
      .withColumn(value + "_locf", last(col(value), ignoreNulls = true).over(w))
      .withColumn(value, coalesce(col(value), lit(0L)))
  }
}
