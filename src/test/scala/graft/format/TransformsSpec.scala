package graft.format

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.time.LocalDateTime

/** Reference fixtures: the transform I/O table at docs/07-partitioning.md:44-52
  * plus the bucket-consistency invariant (driver-side murmur3 must equal
  * Spark's hash() so equality pruning on bucket partitions is exact).
  */
class TransformsSpec extends SparkSpec {

  private val ts = LocalDateTime.of(2024, 3, 15, 14, 30, 0)
  private val micros = Canonical.toMicros(ts)

  test("time transforms derive the documented values (docs/07:44-52)") {
    assert(Transform.Year(TimestampNTZType, micros).contains(2024L))
    assert(Transform.Month(TimestampNTZType, micros).contains("2024-03"))
    assert(Transform.Day(TimestampNTZType, micros).contains("2024-03-15"))
    assert(Transform.Hour(TimestampNTZType, micros).contains("2024-03-15-14"))
  }

  test("truncate: string prefix and numeric floor (docs/07:50-51)") {
    assert(Transform.Truncate(3)(StringType, "abcdef").contains("abc"))
    assert(Transform.Truncate(10)(LongType, 1234L).contains(1230L))
    assert(Transform.Truncate(10)(LongType, -7L).contains(-10L)) // floor, not trunc-to-zero
  }

  test("bucket: driver-side murmur3 matches Spark's hash() for every supported type") {
    val n = 16
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(
        42L, 7, "hello", java.sql.Date.valueOf("2024-03-15"),
        java.sql.Timestamp.valueOf("2024-03-15 14:30:00")))),
      StructType(Seq(
        StructField("l", LongType), StructField("i", IntegerType),
        StructField("s", StringType), StructField("d", DateType),
        StructField("t", TimestampType))))
    val row = df.select(
      pmod(hash(col("l")), lit(n)), pmod(hash(col("i")), lit(n)),
      pmod(hash(col("s")), lit(n)), pmod(hash(col("d")), lit(n)),
      pmod(hash(col("t")), lit(n))).head()

    val b = Transform.Bucket(n)
    assert(b(LongType, 42L).contains(row.getInt(0).toLong))
    assert(b(IntegerType, 7L).contains(row.getInt(1).toLong))
    assert(b(StringType, "hello").contains(row.getInt(2).toLong))
    assert(b(DateType, Canonical.toDays(java.sql.Date.valueOf("2024-03-15"))).contains(row.getInt(3).toLong))
    assert(b(TimestampType, Canonical.toMicros(java.sql.Timestamp.valueOf("2024-03-15 14:30:00"))).contains(row.getInt(4).toLong))
  }

  test("transform round-trip: name -> fromString") {
    val all = Seq(Transform.Identity, Transform.Year, Transform.Month, Transform.Day,
      Transform.Hour, Transform.Bucket(8), Transform.Truncate(4))
    all.foreach(t => assert(Transform.fromString(t.name) == t))
  }

  test("monotonic transforms preserve order (hidden-partition range derivation)") {
    val a = Canonical.toMicros(LocalDateTime.of(2024, 1, 5, 3, 0))
    val b = Canonical.toMicros(LocalDateTime.of(2024, 7, 20, 3, 0))
    for (t <- Seq(Transform.Year, Transform.Month, Transform.Day, Transform.Hour)) {
      val (ta, tb) = (t(TimestampNTZType, a).get, t(TimestampNTZType, b).get)
      assert(Canonical.compare(ta, tb) <= 0, s"${t.name} broke order")
    }
  }
}
