package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — for each left row, the LAST right row with
  * `right.ts <= left.ts` (inclusive) under the same key; left rows with no
  * prior right row keep NULLs. The attribution/feature-lookup staple
  * (event → latest prior state) that plain equi-joins cannot express.
  *
  * Spark has no asof operator, and the naive encodings both die at scale:
  * an inequality join plans BroadcastNestedLoopJoin (O(n·m) row
  * amplification per key), and a correlated latest-row subquery rescans
  * the right side per left row. This is the union + ordered carry-forward
  * shape instead: tag both sides, UNION them (no join node at all), and
  * one window partitioned by the key and ordered by (ts, side) carries the
  * last-seen right payload into each left row. Cost: ONE exchange on the
  * key and a per-partition sort of n+m rows — zero amplification, no
  * nested loop. A pathologically hot key serializes its own partition
  * (same contract as any keyed window); pre-split upstream if one key
  * dominates.
  *
  * Contract: right rows are unique per (key, ts) — dedupe upstream (e.g.
  * keep max id per instant) — so the carried payload is deterministic.
  * Same-instant rows MATCH (right sorts before left at equal ts). Right
  * rows with NULL ts are dropped (they can precede nothing); left rows
  * with NULL ts sort first and therefore match nothing.
  */
object AsofJoin {

  /** @param left    probe side; all its columns pass through
    * @param right   build side: key + rightTs + payload columns
    * @param key     equi-join key present on both sides
    * @param leftTs  left ordering column (orderable, typically timestamp)
    * @param rightTs right ordering column (same type family)
    * @param prefix  matched right columns surface as prefix+rightTs and
    *                prefix+payload (NULL when no right row precedes)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String,
               prefix: String = "asof_"): DataFrame = {
    require(!left.columns.exists(_.startsWith("_asof_")) &&
      !right.columns.exists(_.startsWith("_asof_")),
      "column names starting with _asof_ are reserved by asofJoin")
    val payloadCols = right.columns.filterNot(c => c == key || c == rightTs).toSeq
    val rPayload = struct((rightTs +: payloadCols).map(col): _*)
    val payloadType = right.select(rPayload).schema.head.dataType
    val lNorm = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_r", lit(null).cast(payloadType))
    val rNorm = right
      .select(Seq(col(key)) ++
        left.columns.filterNot(_ == key).toSeq.map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightTs).as("_asof_ts"), lit(0).as("_asof_side"),
          rPayload.as("_asof_r")): _*)
      .filter(col("_asof_ts").isNotNull)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_asof_ts"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lNorm.unionByName(rNorm)
      .withColumn("_asof_match", last(col("_asof_r"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
      .select(left.columns.toSeq.map(col) ++
        (rightTs +: payloadCols).map(f =>
          col(s"_asof_match.$f").as(prefix + f)): _*)
  }
}
