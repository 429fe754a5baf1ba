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

  /** Deterministic proportional sample by key hash (repeatable across runs
    * and engines, unlike `df.sample`): keeps rows whose 32-bit hash bucket
    * falls below `fraction`.
    */
  def hashSample(df: DataFrame, keyCol: Column, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    df.filter(pmod(hash(keyCol), lit(1000000)) < lit((fraction * 1000000).toInt))
  }
}
