package graft.interop

import graft.format._
import graft.table.GraftTable
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import java.io.File
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Apache-Iceberg-format metadata export (reference docs/03:55-109,
  * docs/11:53-87 — multi-engine interop happens through the open metadata
  * layout: `vN.metadata.json` + Avro manifest list + Avro manifests).
  *
  * Exports a Graft table as Iceberg v2 metadata: EVERY schema version (with
  * nested struct/list/map types, field IDs preserved), every partition spec
  * (transform names are spec-compatible: identity / year / month / day /
  * hour / bucket[N] / truncate[W]), and the FULL snapshot history — each
  * snapshot gets its own Avro manifest list, data manifests (one per
  * partition spec, so partition evolution travels too) and optional
  * position-delete manifest — all under `<table>/metadata-iceberg/`. Time
  * transform partition values are converted from Graft's formatted strings
  * to the spec's epoch-relative integers (day → days since epoch, etc.).
  *
  * Scope notes: data manifests carry the per-column stats maps
  * (null_value_counts, lower_bounds, upper_bounds — spec single-value
  * binary serialization) so external engines can prune; column_sizes /
  * value_counts / nan_value_counts are omitted (optional, and FP columns
  * carry no bounds by Graft's NaN policy);
  * list/map element/key/value node IDs are synthesized deterministically
  * above last-column-id at export time (Graft tracks IDs for struct fields
  * only — see [[graft.format.GraftSchema]]).
  */
object IcebergExport {

  /** Export the full table (all snapshots).
    * @return absolute path of the written vN.metadata.json */
  /** Snapshot-keyed export memoization shared by the catalog servers
    * (REST + Glue): export once per (table, current snapshot), serve the
    * cached metadata path while the snapshot is unchanged. ONE copy of the
    * invalidation rule — the two servers previously each hand-rolled it.
    */
  def cachedExport(cache: java.util.concurrent.ConcurrentHashMap[String, (Long, String)],
                   name: String, table: GraftTable,
                   spark: org.apache.spark.sql.SparkSession, snapshotId: Long): String =
    cache.compute(name, (_, prev) =>
      if (prev != null && prev._1 == snapshotId) prev
      else (snapshotId, exportCurrent(spark, table)))._2

  def exportCurrent(spark: org.apache.spark.sql.SparkSession, table: GraftTable): String = {
    val m = table.meta
    val current = m.currentSnapshot.getOrElse(sys.error(s"${table.name}: no snapshot to export"))
    val outDir = Paths.get(m.location, "metadata-iceberg")
    Files.createDirectories(outDir)

    def specSource(spec: PartitionSpec, schemaId: Int): Map[String, org.apache.spark.sql.types.StructField] = {
      val schema = m.schemas.getOrElse(schemaId, m.currentSchema)
      spec.fields.map { pf =>
        pf.name -> schema.fields.find(f => GraftSchema.fieldId(f) == pf.sourceId)
          .orElse(m.schemas.values.flatMap(_.fields).find(f => GraftSchema.fieldId(f) == pf.sourceId))
          .getOrElse(sys.error(s"partition source ${pf.sourceId} not in any schema"))
      }.toMap
    }

    // Partition field IDs are assigned once, table-wide, monotonically
    // across specs (the Iceberg rule) — the same ID serves the JSON spec
    // and every Avro partition record referencing it.
    val partFieldId: Map[(Int, Int), Int] = {
      var next = 999
      m.specs.toSeq.sortBy(_._1).flatMap { case (specId, sp) =>
        sp.fields.indices.map { i => next += 1; (specId, i) -> next }
      }.toMap
    }

    /** manifest_entry Avro schema for one partition spec. */
    def entrySchemaFor(spec: PartitionSpec, schemaId: Int): Schema = {
      val src = specSource(spec, schemaId)
      val partFieldsJson = spec.fields.zipWithIndex.map { case (pf, i) =>
        val avroType = icebergPartitionAvroType(pf.transform, src(pf.name).dataType)
        s"""{"name":"${avroName(pf.name)}","type":["null",$avroType],"default":null,"field-id":${partFieldId((spec.specId, i))}}"""
      }.mkString(",")
      new Schema.Parser().parse(
        s"""{"type":"record","name":"manifest_entry","fields":[
           |{"name":"status","type":"int","field-id":0},
           |{"name":"snapshot_id","type":["null","long"],"default":null,"field-id":1},
           |{"name":"sequence_number","type":["null","long"],"default":null,"field-id":3},
           |{"name":"file_sequence_number","type":["null","long"],"default":null,"field-id":4},
           |{"name":"data_file","type":{"type":"record","name":"r2","fields":[
           |  {"name":"content","type":"int","field-id":134},
           |  {"name":"file_path","type":"string","field-id":100},
           |  {"name":"file_format","type":"string","field-id":101},
           |  {"name":"partition","type":{"type":"record","name":"r102","fields":[$partFieldsJson]},"field-id":102},
           |  {"name":"record_count","type":"long","field-id":103},
           |  {"name":"file_size_in_bytes","type":"long","field-id":104},
           |  {"name":"null_value_counts","type":["null",{"type":"array","logicalType":"map","items":
           |    {"type":"record","name":"k121_v122","fields":[
           |      {"name":"key","type":"int","field-id":121},
           |      {"name":"value","type":"long","field-id":122}]}}],"default":null,"field-id":110},
           |  {"name":"lower_bounds","type":["null",{"type":"array","logicalType":"map","items":
           |    {"type":"record","name":"k126_v127","fields":[
           |      {"name":"key","type":"int","field-id":126},
           |      {"name":"value","type":"bytes","field-id":127}]}}],"default":null,"field-id":125},
           |  {"name":"upper_bounds","type":["null",{"type":"array","logicalType":"map","items":
           |    {"type":"record","name":"k129_v130","fields":[
           |      {"name":"key","type":"int","field-id":129},
           |      {"name":"value","type":"bytes","field-id":130}]}}],"default":null,"field-id":128}
           |]},"field-id":2}]}""".stripMargin)
    }

    val listSchema = new Schema.Parser().parse(
      """{"type":"record","name":"manifest_file","fields":[
        |{"name":"manifest_path","type":"string","field-id":500},
        |{"name":"manifest_length","type":"long","field-id":501},
        |{"name":"partition_spec_id","type":"int","field-id":502},
        |{"name":"content","type":"int","field-id":517},
        |{"name":"sequence_number","type":"long","field-id":515},
        |{"name":"min_sequence_number","type":"long","field-id":516},
        |{"name":"added_snapshot_id","type":"long","field-id":503},
        |{"name":"added_files_count","type":"int","field-id":504},
        |{"name":"existing_files_count","type":"int","field-id":505},
        |{"name":"deleted_files_count","type":"int","field-id":506},
        |{"name":"added_rows_count","type":"long","field-id":512},
        |{"name":"existing_rows_count","type":"long","field-id":513},
        |{"name":"deleted_rows_count","type":"long","field-id":514}]}""".stripMargin)

    /** One snapshot → manifests (per content, per spec) + a manifest list. */
    def exportSnapshot(snap: Snapshot): String = {
      val scan = table.atSnapshot(snap.snapshotId)
      def writeManifests(files: Seq[DataFile], content: Int, suffix: String): Seq[(String, Long, Seq[DataFile], Int, Int)] =
        files.groupBy(_.specId).toSeq.sortBy(_._1).map { case (specId, fs) =>
          val spec = m.specs.getOrElse(specId, PartitionSpec.unpartitioned)
          val src = specSource(spec, snap.schemaId)
          val entrySchema = entrySchemaFor(spec, snap.schemaId)
          val path = outDir.resolve(s"manifest-$suffix-${snap.snapshotId}-$specId.avro")
          val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](entrySchema))
          writer.create(entrySchema, path.toFile)
          val dfSchema = entrySchema.getField("data_file").schema()
          val partSchema = dfSchema.getField("partition").schema()
          fs.foreach { f =>
            val part = new GenericData.Record(partSchema)
            spec.fields.foreach { pf =>
              val v = f.partition.get(pf.name).flatten.map { stored =>
                icebergPartitionValue(pf.transform, src(pf.name).dataType, stored)
              }.orNull
              part.put(avroName(pf.name), v)
            }
            val dataFile = new GenericData.Record(dfSchema)
            dataFile.put("content", content)
            dataFile.put("file_path", GraftUtil.resolve(m.location, f.path))
            dataFile.put("file_format", "PARQUET")
            dataFile.put("partition", part)
            dataFile.put("record_count", f.recordCount)
            dataFile.put("file_size_in_bytes", f.fileSizeBytes)
            // Per-column stats maps (Iceberg spec single-value binary
            // serialization) — data files only: position-delete stats use
            // Iceberg's reserved 214748364x field ids, which Graft delete
            // files don't carry.
            if (content == 0) {
              val writeSchema = m.schemas.getOrElse(f.schemaId, m.currentSchema)
              val idToType = writeSchema.fields
                .map(fl => GraftSchema.fieldId(fl) -> fl.dataType).toMap
              def kvArray(schemaField: String,
                          mk: (Int, ColStats, org.apache.spark.sql.types.DataType) => Option[Any]):
                  java.util.List[GenericRecord] = {
                val itemSchema = dfSchema.getField(schemaField).schema()
                  .getTypes.get(1).getElementType
                val out = new java.util.ArrayList[GenericRecord]()
                f.stats.toSeq.sortBy(_._1).foreach { case (id, st) =>
                  idToType.get(id).foreach { dt =>
                    mk(id, st, dt).foreach { v =>
                      val r = new GenericData.Record(itemSchema)
                      r.put("key", id); r.put("value", v); out.add(r)
                    }
                  }
                }
                out
              }
              val nulls = kvArray("null_value_counts",
                (_, st, _) => st.nullCount.map(n => n: java.lang.Long))
              val lowers = kvArray("lower_bounds",
                (_, st, dt) => st.min.flatMap(s => icebergSingleValue(dt, s)))
              val uppers = kvArray("upper_bounds",
                (_, st, dt) => st.max.flatMap(s => icebergSingleValue(dt, s)))
              if (!nulls.isEmpty) dataFile.put("null_value_counts", nulls)
              if (!lowers.isEmpty) dataFile.put("lower_bounds", lowers)
              if (!uppers.isEmpty) dataFile.put("upper_bounds", uppers)
            }
            val entry = new GenericData.Record(entrySchema)
            entry.put("status", 1) // ADDED (exported snapshot owns every file)
            entry.put("snapshot_id", snap.snapshotId)
            entry.put("sequence_number", snap.sequenceNumber)
            entry.put("file_sequence_number", snap.sequenceNumber)
            entry.put("data_file", dataFile)
            writer.append(entry)
          }
          writer.close()
          (path.toString, Files.size(path), fs, specId, content)
        }

      val manifests = writeManifests(scan.dataFiles, 0, "data") ++
        writeManifests(scan.deleteFiles, 1, "deletes")
      val listPath = outDir.resolve(s"snap-${snap.snapshotId}.avro")
      val listWriter = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](listSchema))
      listWriter.create(listSchema, listPath.toFile)
      manifests.foreach { case (p, len, fs, specId, content) =>
        val r = new GenericData.Record(listSchema)
        r.put("manifest_path", p)
        r.put("manifest_length", len)
        r.put("partition_spec_id", specId)
        r.put("content", content)
        r.put("sequence_number", snap.sequenceNumber)
        r.put("min_sequence_number", snap.sequenceNumber)
        r.put("added_snapshot_id", snap.snapshotId)
        r.put("added_files_count", fs.size)
        r.put("existing_files_count", 0)
        r.put("deleted_files_count", 0)
        r.put("added_rows_count", fs.map(_.recordCount).sum)
        r.put("existing_rows_count", 0L)
        r.put("deleted_rows_count", 0L)
        listWriter.append(r)
      }
      listWriter.close()
      listPath.toString
    }

    val ordered = m.snapshots.sortBy(_.sequenceNumber)
    val listPaths: Map[Long, String] =
      ordered.map(s => s.snapshotId -> exportSnapshot(s)).toMap

    // ---- vN.metadata.json ----
    val schemasJson = m.schemas.toSeq.sortBy(_._1).map { case (id, s) =>
      s"""{"type":"struct","schema-id":$id,"fields":[${structFieldsJson(s)}]}"""
    }.mkString(",")
    val specsJson = m.specs.toSeq.sortBy(_._1).map { case (_, sp) =>
      val fieldsJson = sp.fields.zipWithIndex.map { case (pf, i) =>
        s"""{"name":${q(pf.name)},"transform":${q(pf.transform.name)},""" +
          s""""source-id":${pf.sourceId},"field-id":${partFieldId((sp.specId, i))}}"""
      }.mkString(",")
      s"""{"spec-id":${sp.specId},"fields":[$fieldsJson]}"""
    }.mkString(",")
    val snapshotsJson = ordered.map { s =>
      val parent = s.parentId.map(p => s""""parent-snapshot-id":$p,""").getOrElse("")
      s"""{
         |  "snapshot-id":${s.snapshotId},
         |  $parent
         |  "sequence-number":${s.sequenceNumber},
         |  "timestamp-ms":${s.timestampMs},
         |  "manifest-list":${q(listPaths(s.snapshotId))},
         |  "schema-id":${s.schemaId},
         |  "summary":{"operation":${q(icebergOperation(s.operation))}}
         |}""".stripMargin
    }.mkString(",")
    val snapshotLogJson = ordered.map(s =>
      s"""{"timestamp-ms":${s.timestampMs},"snapshot-id":${s.snapshotId}}""").mkString(",")
    val refsJson = (m.refs + ("main" -> graft.format.Ref(current.snapshotId, isBranch = true)))
      .toSeq.sortBy(_._1).map { case (name, r) =>
        s"""${q(name)}:{"snapshot-id":${r.snapshotId},"type":"${if (r.isBranch) "branch" else "tag"}"}"""
      }.mkString(",")
    val lastPartitionId = if (partFieldId.isEmpty) 999 else partFieldId.values.max
    // last-column-id must cover every assigned ID, including the synthetic
    // list/map node IDs (NodeIdBase block per field) when nested collections
    // exist — an Iceberg writer allocating new IDs above it must not collide.
    val hasCollections =
      m.schemas.values.exists(_.fields.exists(f => hasCollectionType(f.dataType)))
    val lastColumnId =
      if (!hasCollections) m.lastColumnId
      else NodeIdBase + (m.schemas.values.map(GraftSchema.maxId).max + 1) * NodeIdsPerField
    val metaJson =
      s"""{
         |"format-version":2,
         |"table-uuid":${q(m.tableUuid)},
         |"location":${q(m.location)},
         |"last-sequence-number":${m.lastSequenceNumber},
         |"last-updated-ms":${m.lastUpdatedMs},
         |"last-column-id":$lastColumnId,
         |"current-schema-id":${m.currentSchemaId},
         |"schemas":[$schemasJson],
         |"default-spec-id":${m.defaultSpecId},
         |"partition-specs":[$specsJson],
         |"last-partition-id":$lastPartitionId,
         |"default-sort-order-id":0,
         |"sort-orders":[{"order-id":0,"fields":[]}],
         |"properties":{},
         |"current-snapshot-id":${current.snapshotId},
         |"refs":{$refsJson},
         |"snapshots":[$snapshotsJson],
         |"snapshot-log":[$snapshotLogJson],
         |"metadata-log":[]
         |}""".stripMargin
    val metaPath = outDir.resolve(s"v${current.snapshotId}.metadata.json")
    Files.writeString(metaPath, metaJson)
    metaPath.toString
  }

  /** Synthetic list/map node IDs live in a block derived from the OWNING
    * field's stable ID, so the same column keeps the same element/key/value
    * IDs in every exported schema version — cross-version column resolution
    * (time travel in an external reader) stays by-ID correct.
    */
  private val NodeIdBase = 1000000
  private val NodeIdsPerField = 100

  private def hasCollectionType(dt: DataType): Boolean = dt match {
    case s: StructType => s.fields.exists(f => hasCollectionType(f.dataType))
    case _: ArrayType | _: MapType => true
    case _ => false
  }

  /** Iceberg-JSON struct fields (nested types serialized recursively).
    * A `graft.logical-type` annotation (time / uuid — see
    * [[graft.format.GraftSchema.LogicalTypeKey]]) overrides the physical
    * type: Graft stores TIME as INT64 micros-since-midnight, which is
    * exactly Iceberg's physical `time` encoding, so the export emits the
    * real type and any Iceberg reader gets spec-correct values.
    */
  private def structFieldsJson(s: org.apache.spark.sql.types.StructType): String =
    s.fields.map { f =>
      val fid = GraftSchema.fieldId(f)
      // deterministic per-field allocator: k-th collection node under field
      // `fid` (pre-order) always gets NodeIdBase + fid*NodeIdsPerField + k
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val nodeId = () => NodeIdBase + fid * NodeIdsPerField + counter.getAndIncrement()
      val tpe =
        if (f.metadata.contains(GraftSchema.LogicalTypeKey))
          f.metadata.getString(GraftSchema.LogicalTypeKey) match {
            // TIME is physically spec-exact (INT64 micros) — export the
            // real type. UUID is NOT: Graft stores VARCHAR(36) strings,
            // while Iceberg's uuid encoding is fixed_len_byte_array(16),
            // so declaring 'uuid' would make every external reader choke
            // on the column — export what the files actually contain.
            case "time" => q("time")
            case _ => icebergTypeJson(f.dataType, nodeId)
          }
        else icebergTypeJson(f.dataType, nodeId)
      s"""{"id":$fid,"name":${q(f.name)},"required":false,"type":$tpe}"""
    }.mkString(",")

  /** Read back an exported snapshot's manifest list + manifests; returns
    * (content, file_path, record_count) tuples — the round-trip check.
    * `snapshotId` selects a historical snapshot (time travel through the
    * EXPORTED metadata); default is current-snapshot-id.
    */
  def readExportedFiles(metadataJsonPath: String,
                        snapshotId: Option[Long] = None): Seq[(Int, String, Long)] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(Files.readString(Paths.get(metadataJsonPath)))
    val wanted: Long = snapshotId.getOrElse(j \ "current-snapshot-id" match {
      case JInt(i) => i.toLong; case JLong(l) => l
      case other => sys.error(s"bad current-snapshot-id: $other")
    })
    val listPath = (j \ "snapshots") match {
      case JArray(snaps) =>
        snaps.collectFirst {
          case s if (s \ "snapshot-id") == JInt(BigInt(wanted)) ||
                    (s \ "snapshot-id") == JLong(wanted) =>
            (s \ "manifest-list") match {
              case JString(p) => p
              case _ => sys.error("snapshot has no manifest-list")
            }
        }.getOrElse(sys.error(s"snapshot $wanted not in exported metadata"))
      case _ => sys.error("no snapshots array in metadata")
    }
    val manifests = readAvro(listPath).map { r =>
      (r.get("manifest_path").toString, r.get("content").asInstanceOf[Int])
    }
    manifests.flatMap { case (mp, _) =>
      readAvro(mp).map { e =>
        val df = e.get("data_file").asInstanceOf[GenericRecord]
        (df.get("content").asInstanceOf[Int], df.get("file_path").toString,
          df.get("record_count").asInstanceOf[Long])
      }
    }
  }

  /** Resolve a metadata TREE — the `metadata-iceberg/` directory that
    * successive [[exportCurrent]] calls accumulate, or an EXTERNAL
    * writer's Iceberg metadata directory — to its LATEST metadata
    * document, filesystem-only: no catalog server, no Graft manifests.
    *
    * Resolution order mirrors what Iceberg's own filesystem-table layout
    * provides: a `version-hint.text` file wins when present (its content
    * N names `vN.metadata.json` — the HadoopTables convention); otherwise
    * every `*.metadata.json` (covering both Graft's `vN.` names and the
    * `NNNNN-<uuid>.` names other writers produce) is parsed and the
    * highest (`last-sequence-number`, `last-updated-ms`) wins — the same
    * ordering a hint file would encode, derived from the documents
    * themselves so a tree copied between engines needs no side files.
    */
  def latestMetadata(metadataDir: String): String = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val dir = Paths.get(metadataDir)
    require(Files.isDirectory(dir), s"$metadataDir is not a directory")
    val hint = dir.resolve("version-hint.text")
    if (Files.exists(hint)) {
      val n = Files.readString(hint).trim
      val hinted = dir.resolve(s"v$n.metadata.json")
      require(Files.exists(hinted),
        s"version-hint.text names version $n but ${hinted.getFileName} is absent")
      return hinted.toString
    }
    val stream = Files.list(dir)
    val docs =
      try stream.iterator().asScala
        .filter(_.getFileName.toString.matches("[^/]*\\.metadata\\.json"))
        .toVector
      finally stream.close()
    require(docs.nonEmpty, s"no *.metadata.json documents under $metadataDir")
    def num(f: JValue): Long = f match {
      case JInt(i) => i.toLong; case JLong(l) => l; case _ => 0L
    }
    docs.maxBy { p =>
      val j = JsonMethods.parse(Files.readString(p))
      (num(j \ "last-sequence-number"), num(j \ "last-updated-ms"))
    }.toString
  }

  /** The Spark StructType a metadata document declares for a snapshot —
    * the current schema, or (time travel) the schema-id the selected
    * snapshot was written under. Inverse of the export's schema
    * serialization, so a filesystem-only reader projects and orders
    * columns from the METADATA — the GraftTable-equivalent behavior —
    * instead of trusting parquet footer inference.
    */
  def metadataSchema(metadataJsonPath: String,
                     snapshotId: Option[Long] = None): org.apache.spark.sql.types.StructType = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val j = JsonMethods.parse(Files.readString(Paths.get(metadataJsonPath)))
    def num(f: JValue): Long = f match {
      case JInt(i) => i.toLong; case JLong(l) => l
      case other => sys.error(s"expected a number, got $other")
    }
    val wantedSchema: Long = snapshotId match {
      case None => num(j \ "current-schema-id")
      case Some(snap) => (j \ "snapshots") match {
        case JArray(snaps) => snaps.collectFirst {
          case s if num(s \ "snapshot-id") == snap => num(s \ "schema-id")
        }.getOrElse(sys.error(s"snapshot $snap not in metadata"))
        case _ => sys.error("no snapshots array in metadata")
      }
    }
    (j \ "schemas") match {
      case JArray(schemas) => schemas.collectFirst {
        case s if num(s \ "schema-id") == wantedSchema =>
          sparkTypeOf(s).asInstanceOf[org.apache.spark.sql.types.StructType]
      }.getOrElse(sys.error(s"schema $wantedSchema not in metadata"))
      case _ => sys.error("no schemas array in metadata")
    }
  }

  /** Iceberg JSON type → Spark type: the inverse of [[icebergTypeJson]] /
    * [[icebergPrimitive]] (the `time` case mirrors the export's physical
    * INT64-micros representation).
    */
  private def sparkTypeOf(t: org.json4s.JValue): DataType = {
    import org.json4s._
    val DecimalRe = """decimal\((\d+),\s*(\d+)\)""".r
    t match {
      case JString(s) => s match {
        case "boolean" => BooleanType
        case "int" => IntegerType
        case "long" => LongType
        case "float" => FloatType
        case "double" => DoubleType
        case "string" => StringType
        case "binary" => BinaryType
        case "date" => DateType
        case "timestamptz" => TimestampType
        case "timestamp" => TimestampNTZType
        case "time" => LongType
        case DecimalRe(p, sc) => DecimalType(p.toInt, sc.toInt)
        case other => sys.error(s"no Spark mapping for Iceberg type '$other'")
      }
      case o: JObject => (o \ "type") match {
        case JString("struct") => (o \ "fields") match {
          case JArray(fs) => org.apache.spark.sql.types.StructType(fs.map { f =>
            val name = (f \ "name") match {
              case JString(n) => n; case other => sys.error(s"bad field name: $other")
            }
            val required = (f \ "required") == JBool(true)
            org.apache.spark.sql.types.StructField(name, sparkTypeOf(f \ "type"), !required)
          })
          case _ => sys.error("struct without fields")
        }
        case JString("list") =>
          ArrayType(sparkTypeOf(o \ "element"), (o \ "element-required") != JBool(true))
        case JString("map") =>
          MapType(sparkTypeOf(o \ "key"), sparkTypeOf(o \ "value"),
            (o \ "value-required") != JBool(true))
        case other => sys.error(s"unknown nested type tag: $other")
      }
      case other => sys.error(s"unparseable Iceberg type: $other")
    }
  }

  /** [[readAsDataFrame]] over a metadata TREE: resolve the latest document
    * with [[latestMetadata]], then plan/read from it — the whole external-
    * read path with a directory as the only input (docs/11 offline
    * multi-engine loop, read side).
    */
  def readTree(spark: org.apache.spark.sql.SparkSession,
               metadataDir: String,
               snapshotId: Option[Long] = None): org.apache.spark.sql.DataFrame =
    readAsDataFrame(spark, latestMetadata(metadataDir), snapshotId)

  /** Plan and read a snapshot purely from exported Iceberg metadata — the
    * docs/11 interop criterion made executable: an independent reader (no
    * Graft manifests touched) lists data files from the Avro manifests,
    * reads the parquet, applies position deletes by (file, pos)
    * anti-join, and projects to the snapshot's METADATA-declared schema
    * (columns the metadata dropped disappear; columns added after a file
    * was written read as NULL — the same resolution a GraftTable scan
    * performs). Returns exactly the snapshot's live rows.
    */
  def readAsDataFrame(spark: org.apache.spark.sql.SparkSession,
                      metadataJsonPath: String,
                      snapshotId: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, broadcast, lit}
    val files = readExportedFiles(metadataJsonPath, snapshotId)
    val dataPaths = files.collect { case (0, p, _) => p }
    val deletePaths = files.collect { case (1, p, _) => p }
    // Equality deletes (content=2): REFUSE, loudly. The reference marks them
    // unsupported (docs/08-dml.md:179-186) and Graft never writes them, but
    // an EXTERNAL v2 writer (Flink, notably) routinely does — silently
    // collecting only content 0/1 would RESURRECT the rows those files
    // delete, a silent wrong answer. Failing beats lying (r17 verdict #1).
    val eqDeletes = files.collect { case (2, p, _) => p }
    if (eqDeletes.nonEmpty) sys.error(
      s"equality-delete files (content=2) are not supported; reading this " +
        s"snapshot without applying them would resurrect deleted rows: " +
        s"${eqDeletes.take(3).mkString(", ")}" +
        (if (eqDeletes.size > 3) s" (+${eqDeletes.size - 3} more)" else ""))
    require(dataPaths.nonEmpty, "exported snapshot has no data files")
    val schema = metadataSchema(metadataJsonPath, snapshotId)
    // read under the METADATA schema, not footer inference: files from
    // several schema versions coexist in one snapshot, and inference would
    // pick one file's footer and silently drop the other versions' columns.
    // Spark clips the requested schema per file by name — a column (or
    // nested subfield) a file lacks reads as NULL, exactly the resolution
    // a GraftTable scan performs. (By-NAME, not Iceberg's by-id: the
    // manifests carry no per-file write schema, and Graft files keep names
    // consistent with their schema version — a column renamed across
    // versions is the one case ids would resolve and names cannot.)
    val raw = spark.read.schema(schema).parquet(dataPaths: _*)
    val merged =
      if (deletePaths.isEmpty) raw
      else {
        // the hidden _metadata column resolves only on the unprojected file
        // scan, so deletes are applied BEFORE the metadata-schema projection
        val withPos = raw.withColumn("_if_file", col("_metadata.file_path"))
          .withColumn("_if_pos", col("_metadata.row_index"))
        val dels = spark.read.parquet(deletePaths: _*)
          .select(col("file_path").as("_id_file"), col("pos").as("_id_pos"))
        // normalize URI scheme differences between _metadata.file_path and
        // the absolute paths recorded at export time
        val norm = (c: org.apache.spark.sql.Column) =>
          org.apache.spark.sql.functions.regexp_replace(c, "^file:/+", "/")
        withPos.join(broadcast(dels),
            norm(col("_if_file")) === norm(col("_id_file")) &&
              col("_if_pos") === col("_id_pos"),
            "left_anti")
          .drop("_if_file", "_if_pos")
      }
    val mergedByName = merged.schema.fields.map(f => f.name -> f.dataType).toMap
    merged.select(schema.fields.toSeq.map { f =>
      mergedByName.get(f.name) match {
        case Some(fromType) => resolveByName(col(f.name), fromType, f.dataType).as(f.name)
        case None => lit(null).cast(f.dataType).as(f.name)
      }
    }: _*)
  }

  /** Name-based recursive resolution of a read column to the metadata-
    * declared type: struct subfields missing in the file (added after it
    * was written) read as NULL, extra subfields drop, leaves cast. A plain
    * cast cannot WIDEN a struct, so evolved nested schemas need the
    * rebuild. Name-based rather than by-id — the manifests don't record a
    * per-file write schema, and Graft's files keep names consistent with
    * their schema version, so names resolve exactly what ids would.
    */
  private def resolveByName(src: org.apache.spark.sql.Column,
                            from: DataType, to: DataType): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, struct, transform, transform_values, when}
    (from, to) match {
      case (f, t) if f == t => src
      case (f: StructType, t: StructType) =>
        val children = t.fields.map { tf =>
          f.fields.find(_.name == tf.name) match {
            case Some(ff) => resolveByName(src.getField(tf.name), ff.dataType, tf.dataType).as(tf.name)
            case None => lit(null).cast(tf.dataType).as(tf.name)
          }
        }
        // struct() of null children is a non-null row; a null parent struct
        // must stay null through resolution
        when(src.isNotNull, struct(children.toSeq: _*)).otherwise(lit(null).cast(t))
      case (f: ArrayType, t: ArrayType) =>
        transform(src, x => resolveByName(x, f.elementType, t.elementType))
      case (f: MapType, t: MapType) =>
        transform_values(src.cast(MapType(t.keyType, f.valueType, f.valueContainsNull)),
          (_, v) => resolveByName(v, f.valueType, t.valueType))
      case _ => src.cast(to)
    }
  }

  private def readAvro(path: String): Seq[GenericRecord] = {
    val reader = DataFileReader.openReader(new File(path),
      new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toVector finally reader.close()
  }

  private def q(s: String): String = Json.q(s)

  private def avroName(s: String): String = s.replaceAll("[^A-Za-z0-9_]", "_")

  private def icebergOperation(op: String): String = op match {
    case "append" | "delete" | "overwrite" | "replace" => op
    case "merge" | "update" => "overwrite"
    case _ => "overwrite"
  }


  /** Iceberg JSON type: a quoted string for primitives, a nested object for
    * struct/list/map (docs/03's metadata layout; nested types are first-class
    * in the Iceberg spec). Struct fields carry their real Graft IDs; list
    * element / map key+value node IDs are synthesized from `idAlloc`.
    */
  private def icebergTypeJson(dt: DataType, nodeId: () => Int): String = dt match {
    case s: StructType =>
      // nested struct fields carry their own stable IDs (and their own
      // node-ID blocks for collections beneath them)
      s"""{"type":"struct","fields":[${structFieldsJson(s)}]}"""
    case a: ArrayType =>
      val id = nodeId()
      s"""{"type":"list","element-id":$id,"element":${icebergTypeJson(a.elementType, nodeId)},"element-required":false}"""
    case mt: MapType =>
      val kId = nodeId(); val vId = nodeId()
      s"""{"type":"map","key-id":$kId,"key":${icebergTypeJson(mt.keyType, nodeId)},""" +
        s""""value-id":$vId,"value":${icebergTypeJson(mt.valueType, nodeId)},"value-required":false}"""
    case other => q(icebergPrimitive(other))
  }

  private def icebergPrimitive(dt: DataType): String = dt match {
    case _: BooleanType => "boolean"
    case _: ByteType | _: ShortType | _: IntegerType => "int"
    case _: LongType => "long"
    case _: FloatType => "float"
    case _: DoubleType => "double"
    case d: DecimalType => s"decimal(${d.precision}, ${d.scale})"
    case _: StringType => "string"
    case _: BinaryType => "binary"
    case _: DateType => "date"
    case _: TimestampType => "timestamptz"
    case _: TimestampNTZType => "timestamp"
    case other => sys.error(s"no Iceberg mapping for ${other.simpleString}")
  }

  /** Avro type of a partition value in the spec's encoding. Iceberg
    * readers derive the manifest read schema from the PARTITION SPEC
    * (truncate's result type = the SOURCE type), so these must match the
    * spec exactly — a long where the spec says int fails Avro schema
    * resolution in external engines. Decimal identity/truncate partitions
    * remain string-typed (a spec deviation — the avro writer here has no
    * fixed/decimal path); exportable but not externally readable on that
    * column.
    */
  private def icebergPartitionAvroType(t: Transform, srcType: DataType): String = t match {
    case Transform.Identity => srcType match {
      case _: ByteType | _: ShortType | _: IntegerType | _: DateType => "\"int\""
      case _: LongType | _: TimestampType | _: TimestampNTZType => "\"long\""
      case _: FloatType => "\"float\""
      case _: DoubleType => "\"double\""
      case _: BooleanType => "\"boolean\""
      case _ => "\"string\""
    }
    case Transform.Year | Transform.Month | Transform.Day | Transform.Hour => "\"int\""
    case _: Transform.Bucket => "\"int\""
    case _: Transform.Truncate => srcType match {
      case _: ByteType | _: ShortType | _: IntegerType => "\"int\""
      case _: LongType => "\"long\""
      case _ => "\"string\""
    }
    case _ => "\"string\""
  }

  /** Convert a stored (canonical-JSON) Graft partition value into the
    * Iceberg spec's representation: time transforms become epoch-relative
    * ints (docs/03 partition encoding; Graft stores them formatted).
    */
  private def icebergPartitionValue(t: Transform, srcType: DataType, stored: String): AnyRef = {
    val canonical = Canonical.fromJsonString(t.resultType(srcType), stored)
    t match {
      case Transform.Year =>
        Int.box(canonical.asInstanceOf[Long].toInt - 1970)
      case Transform.Month =>
        val Array(y, mo) = stored.split('-').map(_.toInt)
        Int.box((y - 1970) * 12 + (mo - 1))
      case Transform.Day =>
        Int.box(java.time.LocalDate.parse(stored).toEpochDay.toInt)
      case Transform.Hour =>
        val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd-HH")
        val ldt = java.time.LocalDateTime.parse(stored, fmt)
        Int.box((ldt.toEpochSecond(java.time.ZoneOffset.UTC) / 3600L).toInt)
      case _: Transform.Bucket => Int.box(canonical.asInstanceOf[Long].toInt)
      case Transform.Identity => srcType match {
        case _: ByteType | _: ShortType | _: IntegerType | _: DateType =>
          Int.box(canonical.asInstanceOf[Number].intValue())
        case _: LongType | _: TimestampType | _: TimestampNTZType =>
          Long.box(canonical.asInstanceOf[Number].longValue())
        case _: FloatType => Float.box(canonical.asInstanceOf[Number].floatValue())
        case _: DoubleType => Double.box(canonical.asInstanceOf[Number].doubleValue())
        case _: BooleanType => Boolean.box(canonical.asInstanceOf[Boolean])
        case _ => stored
      }
      case _: Transform.Truncate => srcType match {
        // boxing mirrors icebergPartitionAvroType: int-family stays int
        case _: ByteType | _: ShortType | _: IntegerType =>
          Int.box(canonical.asInstanceOf[Number].intValue())
        case _: LongType => Long.box(canonical.asInstanceOf[Number].longValue())
        case _ => stored
      }
      case _ => stored
    }
  }

  /** Iceberg-spec single-value binary serialization of one stored
    * (canonical-JSON) column bound: little-endian fixed-width numerics,
    * UTF-8 strings, minimal big-endian unscaled decimals. None for types
    * the spec table doesn't cover here (the maps are optional per-column).
    */
  private[interop] def icebergSingleValue(dt: DataType, stored: String): Option[java.nio.ByteBuffer] = {
    import java.nio.{ByteBuffer, ByteOrder}
    def le(n: Int) = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    val canonical = Canonical.fromJsonString(dt, stored)
    val buf = dt match {
      case _: ByteType | _: ShortType | _: IntegerType =>
        Some(le(4).putInt(canonical.asInstanceOf[Long].toInt))
      case _: LongType => Some(le(8).putLong(canonical.asInstanceOf[Long]))
      case _: DateType => Some(le(4).putInt(canonical.asInstanceOf[Int]))
      case _: TimestampType | _: TimestampNTZType =>
        Some(le(8).putLong(canonical.asInstanceOf[Long]))
      case _: FloatType => Some(le(4).putFloat(canonical.asInstanceOf[Double].toFloat))
      case _: DoubleType => Some(le(8).putDouble(canonical.asInstanceOf[Double]))
      case _: BooleanType =>
        Some(ByteBuffer.allocate(1).put(
          if (canonical.asInstanceOf[Boolean]) 1.toByte else 0.toByte))
      case _: StringType =>
        Some(ByteBuffer.wrap(stored.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      case d: DecimalType =>
        // unscaled value at the COLUMN's scale (a stored "12.3" on a
        // scale-2 column must serialize as 1230, not 123)
        Some(ByteBuffer.wrap(canonical.asInstanceOf[BigDecimal].underlying()
          .setScale(d.scale).unscaledValue().toByteArray))
      case _ => None
    }
    buf.map { b => b.rewind(); b }
  }
}
