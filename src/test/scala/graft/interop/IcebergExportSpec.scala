package graft.interop

import graft.SparkSpec
import graft.catalog.GraftCatalog
import graft.format.{Predicate, Transform}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Round-trip: export a snapshot as Iceberg v2 metadata (vN.metadata.json +
  * Avro manifest list + Avro manifests) and re-read it with a plain Avro
  * reader — the exported file inventory must reproduce the live scan.
  */
class IcebergExportSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("cat", StringType),
    StructField("day", DateType), StructField("v", DoubleType)))

  private def mk(rows: Seq[(Long, String, String, Double)]) =
    spark.createDataFrame(rows.map { case (a, b, c, d) =>
      Row(a, b, java.sql.Date.valueOf(c), d) }.asJava, schema)

  test("exported Iceberg metadata reproduces the live file list (data + deletes)") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ice", schema,
      partitionBy = Seq("cat" -> Transform.Identity, "day" -> Transform.Day),
      properties = Map("enable-iceberg-merge-on-read" -> "true"))
    t.append(spark, mk(Seq(
      (1L, "a", "2024-01-01", 1.0), (2L, "a", "2024-01-02", 2.0),
      (3L, "b", "2024-01-01", 3.0), (4L, "b", "2024-01-02", 4.0))))
    t.delete(spark, Seq(Predicate.Eq("id", 3L))) // MOR -> position-delete file

    val metaPath = IcebergExport.exportCurrent(spark, t)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(metaPath)))

    val exported = IcebergExport.readExportedFiles(metaPath)
    val liveScan = t.scan()
    val liveData = liveScan.dataFiles
      .map(f => graft.format.GraftUtil.resolve(t.location, f.path) -> f.recordCount).toMap
    val liveDeletes = liveScan.deleteFiles
      .map(f => graft.format.GraftUtil.resolve(t.location, f.path) -> f.recordCount).toMap

    val (expData, expDeletes) = exported.partition(_._1 == 0)
    assert(expData.map(e => e._2 -> e._3).toMap == liveData,
      "exported data-file inventory must equal the live scan")
    assert(expDeletes.map(e => e._2 -> e._3).toMap == liveDeletes,
      "exported delete-file inventory must equal the live scan")

    // an independent reader planning ONLY from the exported metadata
    // reproduces the live rows (deletes applied)
    val viaExport = IcebergExport.readAsDataFrame(spark, metaPath)
      .select("id", "cat", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val live = t.toDF(spark).select("id", "cat", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(viaExport == live, "exported-metadata reader must reproduce the live rows")
    assert(!viaExport.exists(_._1 == 3L), "the MOR-deleted row must stay deleted")

    // the metadata document carries the spec-shaped schema + partition spec
    val metaText = java.nio.file.Files.readString(java.nio.file.Paths.get(metaPath))
    assert(metaText.contains("\"format-version\":2"))
    assert(metaText.contains("\"transform\":\"identity\""))
    assert(metaText.contains("\"transform\":\"day\""))
    assert(metaText.contains("\"type\":\"date\""))
    assert(metaText.contains(s"\"current-snapshot-id\":${t.meta.currentSnapshotId.get}"))
  }

  test("external equality-delete files (content=2) are refused loudly, not ignored") {
    import org.apache.avro.file.{DataFileReader, DataFileWriter}
    import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}

    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ice_eqdel", schema,
      properties = Map("enable-iceberg-merge-on-read" -> "true"))
    t.append(spark, mk(Seq(
      (1L, "a", "2024-01-01", 1.0), (2L, "a", "2024-01-02", 2.0),
      (3L, "b", "2024-01-01", 3.0))))
    t.delete(spark, Seq(Predicate.Eq("id", 3L))) // MOR -> position-delete manifest
    val metaPath = IcebergExport.exportCurrent(spark, t)

    // stage what an EXTERNAL v2 writer (e.g. Flink) would leave: flip the
    // position-delete manifest's per-entry content field from 1 (position
    // deletes) to 2 (equality deletes), schema and list untouched
    val dir = java.nio.file.Paths.get(metaPath).getParent
    val manifest = java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("manifest-deletes")).toSeq.head
    val reader = new DataFileReader[GenericRecord](
      manifest.toFile, new GenericDatumReader[GenericRecord]())
    val avroSchema = reader.getSchema
    val entries = reader.iterator().asScala.toVector
    reader.close()
    entries.foreach(_.get("data_file").asInstanceOf[GenericRecord].put("content", 2))
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    writer.create(avroSchema, manifest.toFile)
    entries.foreach(writer.append)
    writer.close()

    // the inventory reader surfaces the content=2 entry faithfully...
    val exported = IcebergExport.readExportedFiles(metaPath)
    assert(exported.exists(_._1 == 2), "staged equality-delete entry must be visible")
    // ...and the DataFrame read path REFUSES rather than resurrecting row 3
    val ex = intercept[RuntimeException] {
      IcebergExport.readAsDataFrame(spark, metaPath).collect()
    }
    assert(ex.getMessage.contains("equality-delete") && ex.getMessage.contains("content=2"),
      s"refusal must name the unsupported shape, got: ${ex.getMessage}")
  }

  test("data manifests carry spec-serialized column stats maps") {
    import org.apache.avro.file.DataFileReader
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    import java.nio.{ByteBuffer, ByteOrder}

    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.icest", schema)
    t.append(spark, mk(Seq(
      (5L, "aa", "2024-01-01", 1.0), (42L, "zz", "2024-02-03", 2.0))))
    val metaPath = IcebergExport.exportCurrent(spark, t)

    val dir = java.nio.file.Paths.get(metaPath).getParent
    val manifest = java.nio.file.Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.startsWith("manifest-data")).toSeq.head
    val reader = new DataFileReader[GenericRecord](
      manifest.toFile, new GenericDatumReader[GenericRecord]())
    val entries = reader.iterator().asScala.toSeq
    reader.close()
    assert(entries.nonEmpty)

    // per-file maps: collect (fieldId, bytes) across ALL files
    def statsEntries(field: String): Seq[(Int, Any)] =
      entries.flatMap { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        Option(df.get(field)).toSeq.flatMap(_.asInstanceOf[java.util.List[GenericRecord]]
          .asScala.map(kv => kv.get("key").asInstanceOf[Int] -> kv.get("value")))
      }

    val idOfId = graft.format.GraftSchema.fieldId(t.schema.fields.find(_.name == "id").get)
    val idOfCat = graft.format.GraftSchema.fieldId(t.schema.fields.find(_.name == "cat").get)
    def longs(field: String) = statsEntries(field).filter(_._1 == idOfId)
      .map(_._2.asInstanceOf[ByteBuffer].duplicate().order(ByteOrder.LITTLE_ENDIAN).getLong)
    def strs(field: String) = statsEntries(field).filter(_._1 == idOfCat).map { case (_, v) =>
      val b = v.asInstanceOf[ByteBuffer]
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a)
      new String(a, java.nio.charset.StandardCharsets.UTF_8)
    }
    // table-wide bounds across files: min of lowers, max of uppers
    assert(longs("lower_bounds").min == 5L)
    assert(longs("upper_bounds").max == 42L)
    assert(strs("lower_bounds").min == "aa" && strs("upper_bounds").max == "zz")
    assert(statsEntries("null_value_counts").exists(_._1 == idOfId))
  }

  test("export carries the full snapshot history: time travel via exported metadata") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ice_hist", schema)
    t.append(spark, mk(Seq((1L, "a", "2024-01-01", 1.0), (2L, "a", "2024-01-02", 2.0))))
    val snap1 = t.meta.currentSnapshotId.get
    t.append(spark, mk(Seq((3L, "b", "2024-01-01", 3.0))))
    t.delete(spark, Seq(Predicate.Eq("id", 1L)))

    val metaPath = IcebergExport.exportCurrent(spark, t)
    val metaText = java.nio.file.Files.readString(java.nio.file.Paths.get(metaPath))
    assert(t.meta.snapshots.size == 3 &&
      t.meta.snapshots.forall(s => metaText.contains(s""""snapshot-id":${s.snapshotId}""")),
      "every snapshot must appear in the exported metadata")
    assert(metaText.contains("\"snapshot-log\":[{"), "snapshot-log must be populated")
    assert(metaText.contains("\"parent-snapshot-id\":"), "parents must travel")

    // current snapshot through export = live rows
    val cur = IcebergExport.readAsDataFrame(spark, metaPath).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(cur == Set(2L, 3L))
    // historical snapshot through export = rows as of snap1
    val hist = IcebergExport.readAsDataFrame(spark, metaPath, Some(snap1)).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(hist == Set(1L, 2L), "exported history must reproduce the old snapshot")
  }

  test("metadata TREE: latest-version resolution + byte-identical filesystem-only read") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ice_tree", schema,
      properties = Map("enable-iceberg-merge-on-read" -> "true"))
    t.append(spark, mk(Seq((1L, "a", "2024-01-01", 1.0), (2L, "a", "2024-01-02", 2.0))))
    IcebergExport.exportCurrent(spark, t) // an OLDER version document in the tree
    val snap1 = t.meta.currentSnapshotId.get
    t.append(spark, mk(Seq((3L, "b", "2024-01-01", 3.0), (4L, "b", "2024-01-03", 4.0))))
    t.delete(spark, Seq(Predicate.Eq("id", 2L))) // MOR position delete
    val latest = IcebergExport.exportCurrent(spark, t)
    val treeDir = java.nio.file.Paths.get(latest).getParent.toString

    // the tree has two version documents; resolution picks the newest by
    // last-sequence-number — no version-hint side file needed
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(treeDir)).iterator().asScala
      .count(_.getFileName.toString.endsWith(".metadata.json")) == 2)
    assert(IcebergExport.latestMetadata(treeDir) == latest)

    // directory-only read: BYTE-identical to the live table — same schema
    // (names, types, order, from the metadata document, not parquet
    // inference) and the same full row multiset
    val viaTree = IcebergExport.readTree(spark, treeDir)
    val live = t.toDF(spark)
    assert(viaTree.schema == live.schema,
      s"metadata-driven schema diverged:\n${viaTree.schema}\nvs\n${live.schema}")
    val key = (r: Row) => (r.getLong(0), r.getString(1), r.getDate(2).toString, r.getDouble(3))
    assert(viaTree.collect().map(key).sortBy(_._1).toSeq ==
      live.collect().map(key).sortBy(_._1).toSeq)

    // time travel through the tree: rows and schema as of snap1
    val hist = IcebergExport.readTree(spark, treeDir, Some(snap1))
    assert(hist.collect().map(key).map(_._1).toSet == Set(1L, 2L))

    // a version-hint.text (the HadoopTables filesystem-table convention an
    // EXTERNAL writer leaves) overrides content-based resolution
    val older = java.nio.file.Files.list(java.nio.file.Paths.get(treeDir)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".metadata.json"))
      .filterNot(_.toString == latest).next()
    val olderVersion = older.getFileName.toString.stripPrefix("v").stripSuffix(".metadata.json")
    val hintPath = java.nio.file.Paths.get(treeDir, "version-hint.text")
    java.nio.file.Files.writeString(hintPath, olderVersion)
    try assert(IcebergExport.latestMetadata(treeDir) == older.toString,
      "version-hint.text must override content-based resolution")
    finally java.nio.file.Files.delete(hintPath)

    // an external writer's NNNNN-<uuid>.metadata.json names resolve too
    // (content-based: highest last-sequence-number wins)
    val extDir = java.nio.file.Files.createTempDirectory("graft-ext-tree")
    java.nio.file.Files.copy(older, extDir.resolve("00001-aaaa.metadata.json"))
    java.nio.file.Files.copy(java.nio.file.Paths.get(latest),
      extDir.resolve("00002-bbbb.metadata.json"))
    assert(IcebergExport.latestMetadata(extDir.toString)
      .endsWith("00002-bbbb.metadata.json"))
  }

  test("metadata-driven projection: dropped columns disappear, added columns read as NULL") {
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ice_evo", schema)
    t.append(spark, mk(Seq((1L, "a", "2024-01-01", 1.0))))
    val snapOld = t.meta.currentSnapshotId.get
    t.addColumn("score", IntegerType)
    t.dropColumn("v")
    t.append(spark, spark.createDataFrame(
      Seq(Row(2L, "b", java.sql.Date.valueOf("2024-01-02"), 7)).asJava,
      t.meta.currentSchema))
    val metaPath = IcebergExport.exportCurrent(spark, t)

    val cur = IcebergExport.readAsDataFrame(spark, metaPath)
    assert(cur.columns.toSeq == Seq("id", "cat", "day", "score"),
      s"current read must follow the CURRENT schema: ${cur.columns.toSeq}")
    val byId = cur.collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(byId(1L).isEmpty, "pre-evolution file must read the added column as NULL")
    assert(byId(2L).contains(7))
    // the old snapshot reads under ITS schema-id: v present, score absent
    val old = IcebergExport.readAsDataFrame(spark, metaPath, Some(snapOld))
    assert(old.columns.toSeq == Seq("id", "cat", "day", "v"),
      s"historical read must follow the snapshot's schema: ${old.columns.toSeq}")
  }

  test("nested struct/list/map schemas export with IDs (docs/11 interop + docs/06 nesting)") {
    val nested = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(
        StructField("uid", IntegerType), StructField("tags", ArrayType(StringType))))),
      StructField("attrs", MapType(StringType, DoubleType)),
      graft.functions.TimeFunctions.uuidField("row_uuid")))
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.ice_nested", nested)
    t.append(spark, spark.createDataFrame(
      Seq(Row(1L, Row(10, Seq("x", "y")), Map("a" -> 1.5),
        "0b8ed446-0000-4000-8000-000000000000")).asJava, t.meta.currentSchema))
    t.addColumn("meta.note", StringType) // second schema version must export too

    val metaPath = IcebergExport.exportCurrent(spark, t)
    val metaText = java.nio.file.Files.readString(java.nio.file.Paths.get(metaPath))
    assert(metaText.contains("\"type\":\"struct\",\"fields\""))
    assert(metaText.contains("\"type\":\"list\"") && metaText.contains("\"element-id\":"))
    assert(metaText.contains("\"type\":\"map\"") && metaText.contains("\"key-id\":"))
    assert(metaText.contains("\"name\":\"note\""), "evolved schema version must export")
    // uuid annotation exports as STRING, not Iceberg 'uuid': the parquet
    // files store VARCHAR(36), while spec uuid is fixed_len_byte_array(16)
    // — declaring uuid would make external readers choke on the column
    assert(metaText.contains("\"name\":\"row_uuid\",\"required\":false,\"type\":\"string\""),
      "uuid columns must export the type the files actually contain")
    // both schema versions present, and rows still readable via export
    assert("\"schema-id\":\\d+".r.findAllIn(metaText).size >= 2)
    val rows = IcebergExport.readAsDataFrame(spark, metaPath).count()
    assert(rows == 1L)

    // list/map node IDs must be IDENTICAL across schema versions (an
    // external reader resolves columns by stable ID through time travel)
    val elementIds = "\"element-id\":(\\d+)".r.findAllMatchIn(metaText).map(_.group(1)).toSeq
    assert(elementIds.size == 2 && elementIds.distinct.size == 1,
      s"tags element-id must be stable across schemas, got $elementIds")
    val keyIds = "\"key-id\":(\\d+)".r.findAllMatchIn(metaText).map(_.group(1)).toSeq
    assert(keyIds.distinct.size == 1, s"attrs key-id must be stable, got $keyIds")
    // and last-column-id must dominate every assigned ID
    val lastColId = "\"last-column-id\":(\\d+)".r.findFirstMatchIn(metaText).get.group(1).toLong
    val allIds = "\"(?:element-id|key-id|value-id|id)\":(\\d+)".r
      .findAllMatchIn(metaText).map(_.group(1).toLong).toSeq
    assert(allIds.forall(_ <= lastColId),
      s"last-column-id $lastColId must cover max assigned id ${allIds.max}")
  }

  test("position-delete parquet files carry Iceberg's reserved field ids") {
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val cat = new GraftCatalog(tempWarehouse())
    val t = cat.createTable("db.delid", schema,
      properties = Map("enable-iceberg-merge-on-read" -> "true"))
    t.append(spark, mk(Seq((1L, "a", "2024-01-01", 1.0), (2L, "b", "2024-01-02", 2.0))))
    t.delete(spark, Seq(Predicate.Eq("id", 1L)))
    val dels = t.scan().deleteFiles
    assert(dels.nonEmpty, "expected a position-delete file")
    dels.foreach { f =>
      val p = graft.format.GraftUtil.resolve(t.location, f.path)
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new HPath(p), spark.sparkContext.hadoopConfiguration))
      try {
        val s = reader.getFileMetaData.getSchema
        // Iceberg spec: an external engine resolves delete columns by ID
        def idOf(name: String): Int =
          s.getFields.asScala.find(_.getName == name).get.getId.intValue
        assert(idOf("file_path") == 2147483546, s"file_path id in $p")
        assert(idOf("pos") == 2147483545, s"pos id in $p")
      } finally reader.close()
    }
  }
}
