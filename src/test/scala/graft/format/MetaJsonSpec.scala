package graft.format

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** JSON codec round-trips for the whole metadata tree (docs/01:67-99). */
class MetaJsonSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    GraftSchema.withId(StructField("id", LongType), 1),
    GraftSchema.withId(StructField("ts", TimestampNTZType), 2),
    GraftSchema.withId(StructField("name", StringType, nullable = true), 3)))

  test("TableMetadata round-trips through JSON") {
    val meta = TableMetadata(
      formatVersion = 1, tableUuid = "u-1", location = "/tmp/t",
      lastUpdatedMs = 123L, lastColumnId = 3,
      schemas = Map(0 -> schema), currentSchemaId = 0,
      specs = Map(0 -> PartitionSpec(0, Seq(
        PartitionField(2, "ts_day", Transform.Day),
        PartitionField(1, "id_bucket", Transform.Bucket(16))))),
      defaultSpecId = 0, lastSequenceNumber = 2,
      snapshots = Seq(
        Snapshot(1, None, 1, 1000L, "append", Map("added-records" -> "10"), "ml1.json", 0, 0),
        Snapshot(2, Some(1L), 2, 2000L, "delete", Map.empty, "ml2.json", 0, 0)),
      currentSnapshotId = Some(2L),
      refs = Map("main" -> Ref(2L, isBranch = true), "tag-v1" -> Ref(1L, isBranch = false)),
      properties = Map("k" -> "v"),
      statementLog = Seq("q1" -> 1L, "q2" -> 2L))
    val back = MetaJson.metadataFromJson(MetaJson.metadataToJson(meta))
    assert(back == meta)
    // column IDs survive the schema serialization
    assert(GraftSchema.fieldId(back.currentSchema("ts")) == 2)
    // metadata written before refs were typed stored plain numbers: they
    // read back as TAGS (the old semantics — snapshot-schema pins)
    val legacy = MetaJson.metadataToJson(meta)
      .replaceAll("""\{\s*"snapshot-id"\s*:\s*2,\s*"type"\s*:\s*"branch"\s*\}""", "2")
    assert(legacy != MetaJson.metadataToJson(meta), "rewrite must hit the branch ref")
    val fromLegacy = MetaJson.metadataFromJson(legacy)
    assert(fromLegacy.refs("main") == Ref(2L, isBranch = false))
    assert(fromLegacy.refs("tag-v1") == Ref(1L, isBranch = false))
  }

  test("manifest + manifest list round-trip with stats and partition tuples") {
    val files = Seq(
      DataFile("data/a.parquet", "data", Map("ts_day" -> Some("2024-01-15"), "b" -> None),
        100L, 4096L, 0, 0,
        Map(1 -> ColStats(Some("1"), Some("99"), Some(0L)),
          3 -> ColStats(Some("apple"), Some("zebra"), Some(5L)))),
      DataFile("data/del.parquet", "position-deletes", Map.empty, 7L, 512L, 0, 0, Map.empty))
    assert(MetaJson.manifestFromJson(MetaJson.manifestToJson(files)) == files)

    val mfs = Seq(ManifestMeta("metadata/m1.json", "data", 2, 107L, 0,
      Map("ts_day" -> FieldSummary(Some("2024-01-01"), Some("2024-01-31"), containsNull = true))))
    assert(MetaJson.manifestListFromJson(MetaJson.manifestListToJson(mfs)) == mfs)
  }

  test("canonical values round-trip through JSON strings per type") {
    val cases: Seq[(DataType, Any)] = Seq(
      (LongType, 42L), (DoubleType, 1.5), (StringType, "x y"),
      (DateType, 19737), (TimestampNTZType, 1705312200000000L),
      (BooleanType, true), (DecimalType(10, 2), BigDecimal("123.45")))
    cases.foreach { case (dt, v) =>
      assert(Canonical.fromJsonString(dt, Canonical.toJsonString(dt, v)) == v, s"$dt")
    }
  }
}
