package graft.table

import graft.catalog.{CommitConflictException, GraftCatalog}
import graft.format._
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Paths

/** A Graft table: the user-facing handle over the metadata tree.
  *
  * Handles are stateless — every operation loads the current metadata
  * pointer, giving each query snapshot isolation for free (reference
  * docs/08-acid-transactions.md:30-49: a query binds to one snapshot at
  * start; immutable files do the rest) and making handles safe to share.
  */
class GraftTable(val catalog: GraftCatalog, val name: String)
    extends GraftDml with GraftMaintenance with GraftEvolution with GraftMetaTables {

  def load(): (Int, TableMetadata) = catalog.loadMetadata(name)
  def meta: TableMetadata = load()._2
  def schema: org.apache.spark.sql.types.StructType = meta.currentSchema
  def location: String = meta.location
  def properties: Map[String, String] = meta.properties

  // -------------------------------------------------------------------
  // Scans + time travel (docs/05-snapshots-time-travel.md:60-80)
  // -------------------------------------------------------------------

  def scan(predicates: Predicate*): GraftScan = {
    val m = meta
    new GraftScan(this, m, m.currentSnapshot, predicates)
  }

  def toDF(spark: SparkSession, predicates: Predicate*): DataFrame =
    scan(predicates: _*).toDF(spark)

  /** Runtime-filter scan for a selective equi-join (the metadata-plane twin
    * of Spark's row-level runtime filters / DPP): collect the dim side's
    * distinct join keys — bounded by `maxKeys`, the same cost class as a
    * broadcast — and push them as an `IN` predicate into THIS table's scan,
    * where the partition, min/max and bloom planes all get to skip files
    * before any fact bytes are read. Sound for inner/semi joins on
    * `factCol = dimCol` (rows with keys outside the dim set cannot survive
    * the join); when the dim side exceeds `maxKeys` the filter is skipped
    * and the scan degrades to `scan(preds)` — never wrong, just unpruned.
    */
  def scanWithRuntimeFilter(dim: DataFrame, dimCol: String, factCol: String,
                            maxKeys: Int = 100000, preds: Seq[Predicate] = Nil): GraftScan = {
    // Driver-local dims (the pinned batch plane) read their keys WITHOUT a
    // Spark job: the LocalRelation's rows are walked on the driver and the
    // distinct/cap applied here — the per-micro-batch state probe
    // previously paid one distinct+limit job per read. Distributed dims
    // (and local dims of non-extractable shape/type) keep the bounded
    // distinct+limit job. The key SET is identical either way.
    val keys0: Seq[Any] = localKeysOf(dim, dimCol, maxKeys).getOrElse {
      dim.select(Cols.q(dimCol)).distinct().limit(maxKeys + 1)
        .collect().iterator.map(_.get(0)).toSeq
    }
    if (keys0.length > maxKeys) scan(preds: _*)
    else {
      val keys = keys0.filter(_ != null)
      scan((preds :+ Predicate.In(factCol, keys)): _*)
    }
  }

  /** Distinct `dimCol` values straight off a driver-local dim's plan
    * (LocalRelation, possibly under the pin's coalesce(1) — matched as
    * Repartition), converted to the same external types the collect path
    * yields. None when the plan is distributed, the column is computed
    * rather than stored, or the type is outside the simple set.
    */
  private def localKeysOf(dim: DataFrame, dimCol: String,
                          maxKeys: Int): Option[Seq[Any]] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LocalRelation, Repartition}
    import org.apache.spark.sql.types._
    val lr = dim.queryExecution.optimizedPlan match {
      case l: LocalRelation => Some(l)
      case r: Repartition => r.child match {
        case l: LocalRelation => Some(l)
        case _ => None
      }
      case _ => None
    }
    lr.flatMap { l =>
      val idx = l.output.indexWhere(_.name == dimCol)
      if (idx < 0) None
      else {
        val dt = l.output(idx).dataType
        val conv: Any => Any = dt match {
          case LongType | IntegerType | ShortType | ByteType |
               DoubleType | FloatType | BooleanType => identity
          case StringType => v => v.toString // UTF8String -> String
          case _ => return None
        }
        Some(l.data.iterator
          .map(r => if (r.isNullAt(idx)) null else conv(r.get(idx, dt)))
          .toSeq.distinct.take(maxKeys + 1))
      }
    }
  }

  private def resolveSnapshot(m: TableMetadata, id: Long): Snapshot =
    m.snapshot(id).getOrElse(sys.error(s"snapshot $id not found (expired?)"))

  /** AT(SNAPSHOT_ID => id) (docs/05:141-171). */
  def atSnapshot(id: Long, predicates: Predicate*): GraftScan = {
    val m = meta
    new GraftScan(this, m, Some(resolveSnapshot(m, id)), predicates)
  }

  /** Read a named ref. A BRANCH head reads with the table's CURRENT schema
    * (Iceberg's branch rule — branch commits never advance
    * currentSnapshotId, so without this a metadata-only evolution after
    * the branch commit would be invisible to branch readers); a TAG keeps
    * the pinned snapshot's schema. The distinction lives on the ref
    * ([[graft.format.Ref]]), never inferred from the snapshot: a tag
    * pointing at a branch-staged snapshot is still a pin.
    */
  def atRef(ref: String, predicates: Predicate*): GraftScan = {
    val m = meta
    val r = m.refs.getOrElse(ref, sys.error(s"unknown ref $ref"))
    new GraftScan(this, m, Some(resolveSnapshot(m, r.snapshotId)), predicates,
      branchHead = r.isBranch, tagPin = !r.isBranch)
  }

  /** AT(TIMESTAMP => ts): latest snapshot with timestamp <= ts (docs/05:60-64). */
  def asOf(timestampMs: Long, predicates: Predicate*): GraftScan = {
    val m = meta
    // Unpublished branch commits live in m.snapshots (they must survive GC
    // and publish) but are NOT main history: timestamp travel over them
    // would leak staged rows to main readers. A branch commit is eligible
    // only once it is an ancestor of main's head (i.e. post-publish).
    lazy val mainAncestors: Set[Long] = {
      val acc = scala.collection.mutable.Set.empty[Long]
      var cur = m.currentSnapshotId.flatMap(m.snapshot)
      while (cur.isDefined) { acc += cur.get.snapshotId; cur = cur.get.parentId.flatMap(m.snapshot) }
      acc.toSet
    }
    val snap = m.snapshots.filter(s => s.timestampMs <= timestampMs &&
        (!s.summary.contains("branch") || mainAncestors(s.snapshotId)))
      .sortBy(s => (s.timestampMs, s.sequenceNumber)).lastOption
    new GraftScan(this, m, snap, predicates)
  }

  /** AT(OFFSET => -seconds) (docs/05:65-67). */
  def atOffset(offsetSeconds: Long, predicates: Predicate*): GraftScan =
    asOf(System.currentTimeMillis() + offsetSeconds * 1000L, predicates: _*)

  /** BEFORE(STATEMENT => id): state just before the statement's commit
    * (docs/05:69-72).
    */
  def before(statementId: String, predicates: Predicate*): GraftScan = {
    val m = meta
    val snapId = m.statementLog.find(_._1 == statementId)
      .getOrElse(sys.error(s"unknown statement $statementId"))._2
    val snap = m.snapshot(snapId).getOrElse(sys.error(s"snapshot $snapId expired"))
    new GraftScan(this, m, snap.parentId.flatMap(m.snapshot), predicates)
  }

  // -------------------------------------------------------------------
  // Commit machinery (docs/08:16-28 atomic commit; 53-78 OCC retry)
  // -------------------------------------------------------------------

  private[table] def metadataDir: String = Paths.get(location, "metadata").toString

  private[table] def readManifestList(m: TableMetadata, s: Snapshot): Seq[ManifestMeta] = {
    val p = GraftUtil.resolve(m.location, s.manifestListPath)
    ManifestCache.get(p)(MetaJson.manifestListFromJson(GraftUtil.readString(Paths.get(p))))
  }

  private[table] def readManifest(m: TableMetadata, mf: ManifestMeta): Seq[DataFile] = {
    val p = GraftUtil.resolve(m.location, mf.path)
    ManifestCache.get(p)(MetaJson.manifestFromJson(GraftUtil.readString(Paths.get(p))))
  }

  /** Write one manifest file + compute its partition summaries (docs/03:77-109). */
  private[table] def writeManifest(m: TableMetadata, files: Seq[DataFile],
                                   content: String = "data"): ManifestMeta = {
    require(files.nonEmpty, "manifest must not be empty")
    val relPath = s"metadata/manifest-${java.util.UUID.randomUUID()}.json"
    GraftUtil.writeStringAtomic(
      Paths.get(GraftUtil.resolve(m.location, relPath)), MetaJson.manifestToJson(files))
    val specId = files.head.specId
    val spec = m.specs.getOrElse(specId, PartitionSpec.unpartitioned)
    val summaries = spec.fields.map { pf =>
      val srcDt = m.schemas.values.flatMap(_.fields)
        .find(f => GraftSchema.fieldId(f) == pf.sourceId).map(_.dataType)
      val outDt = srcDt.map(pf.transform.resultType)
      val vals = files.flatMap(_.partition.get(pf.name))
      val nonNull = vals.flatten
      val canon = outDt.map(dt => nonNull.map(Canonical.fromJsonString(dt, _))).getOrElse(Nil)
      val lower = canon.reduceOption((a, b) => if (Canonical.compare(a, b) <= 0) a else b)
      val upper = canon.reduceOption((a, b) => if (Canonical.compare(a, b) >= 0) a else b)
      pf.name -> FieldSummary(
        lower.zip(outDt).map { case (v, dt) => Canonical.toJsonString(dt, v) }.headOption,
        upper.zip(outDt).map { case (v, dt) => Canonical.toJsonString(dt, v) }.headOption,
        containsNull = vals.exists(_.isEmpty))
    }.toMap
    ManifestMeta(relPath, content, files.size, files.map(_.recordCount).sum, specId, summaries)
  }

  private[table] def writeManifestList(m: TableMetadata, snapshotId: Long,
                                       manifests: Seq[ManifestMeta]): String = {
    val relPath = s"metadata/snap-$snapshotId-${java.util.UUID.randomUUID()}.manifest-list.json"
    GraftUtil.writeStringAtomic(
      Paths.get(GraftUtil.resolve(m.location, relPath)), MetaJson.manifestListToJson(manifests))
    relPath
  }

  /** The statement-log replay resolution: Some(snapshot to stand in for
    * the already-committed statement), None if the statement is new. If
    * the statement's snapshot has since been EXPIRED, its effect is still
    * folded into current table state (expiry never unapplies commits — it
    * only bounds time travel), so the replay resolves to the CURRENT
    * snapshot as a no-op: re-applying would double-ingest, and erroring
    * would wedge a stream that merely resumed after the data-retention
    * window (the log entry outlives its snapshot for exactly this case —
    * see TableProperties.StatementLogRetainLast).
    */
  private[table] def replayedSnapshot(m: TableMetadata,
      statementId: Option[String]): Option[Snapshot] =
    statementId.flatMap(stmt => m.statementLog.find(_._1 == stmt).map {
      case (_, sid) =>
        m.snapshot(sid).orElse(m.currentSnapshot).getOrElse(
          sys.error(s"statement $stmt: snapshot $sid expired and the " +
            "table has no current snapshot to stand in as the no-op result"))
    })

  /** Assemble + commit a snapshot from a full manifest set. Retries CAS
    * conflicts by re-running `manifestsFor` against the fresh base
    * (docs/08:55-69); `manifestsFor` may throw CommitConflictException to
    * abort (e.g. a COW rewrite whose source files were concurrently removed).
    */
  private[table] def commitSnapshot(
      operation: String,
      statementId: Option[String],
      extraSummary: Map[String, String] = Map.empty,
      maxAttempts: Int = 5,
      branch: Option[String] = None)(
      manifestsFor: TableMetadata => Seq[ManifestMeta]): Snapshot = {
    var attempt = 0
    while (true) {
      attempt += 1
      val (v, m) = load()
      // Idempotent replay: a statement that already committed (streaming
      // micro-batch retried by the checkpoint machinery, docs/08:154 "each
      // DML = one commit") returns its snapshot instead of double-applying.
      replayedSnapshot(m, statementId).foreach(snap => return snap)
      val manifests = manifestsFor(m)
      val snapId = m.lastSequenceNumber + 1
      val dataMfs = manifests.filter(_.content == "data")
      val mlPath = writeManifestList(m, snapId, manifests)
      val stmt = statementId.getOrElse(java.util.UUID.randomUUID().toString)
      // a branch commit's parent is the branch head (falling back to main's
      // head when the branch is being created by this very commit)
      val parentId = branch.flatMap(m.refs.get).map(_.snapshotId).orElse(m.currentSnapshotId)
      val snap = Snapshot(
        snapshotId = snapId,
        parentId = parentId,
        sequenceNumber = snapId,
        timestampMs = System.currentTimeMillis(),
        operation = operation,
        summary = extraSummary ++ Map(
          "statement-id" -> stmt,
          "total-data-files" -> dataMfs.map(_.fileCount.toLong).sum.toString,
          "total-records" -> dataMfs.map(_.recordCount).sum.toString,
          "total-delete-files" ->
            manifests.filter(_.content == "position-deletes").map(_.fileCount.toLong).sum.toString),
        manifestListPath = mlPath,
        schemaId = m.currentSchemaId,
        specId = m.defaultSpecId)
      val next = branch match {
        // branch commit: the snapshot lands in history and advances ONLY the
        // ref — main (current-snapshot-id) does not see it until publish
        case Some(b) => m.copy(
          lastSequenceNumber = snapId,
          snapshots = m.snapshots :+ snap,
          refs = m.refs + (b -> graft.format.Ref(snapId, isBranch = true)),
          statementLog = m.statementLog :+ (stmt -> snapId))
        case None => m.copy(
          lastSequenceNumber = snapId,
          snapshots = m.snapshots :+ snap,
          currentSnapshotId = Some(snapId),
          statementLog = m.statementLog :+ (stmt -> snapId))
      }
      try {
        catalog.commit(name, v, next)
        return snap
      } catch {
        case e: CommitConflictException if attempt < maxAttempts => // retry from new base
        case e: CommitConflictException =>
          throw new CommitConflictException(s"$name: giving up after $attempt attempts: ${e.getMessage}")
      }
    }
    sys.error("unreachable")
  }

  /** Commit a metadata-only change (schema evolution, properties, refs). */
  private[table] def commitMetadata(maxAttempts: Int = 5)(
      f: TableMetadata => TableMetadata): TableMetadata = {
    var attempt = 0
    while (true) {
      attempt += 1
      val (v, m) = load()
      val next = f(m)
      try { catalog.commit(name, v, next); return next }
      catch { case e: CommitConflictException if attempt < maxAttempts => }
    }
    sys.error("unreachable")
  }

  // -------------------------------------------------------------------
  // Writes
  // -------------------------------------------------------------------

  /** INSERT INTO ... (append): write files once, commit with retry — disjoint
    * appends always succeed (docs/08:83-96).
    */
  def append(spark: SparkSession, df: DataFrame, statementId: Option[String] = None): Snapshot = {
    val (_, m0) = load()
    // replay short-circuit BEFORE the write, not just inside the commit:
    // append is the streaming sink's path, and a replayed micro-batch
    // would otherwise re-write its whole batch of data files only to
    // orphan them when commitSnapshot no-ops on the statement log — a
    // crash-looping stream would grind disk for nothing (commitSnapshot
    // still re-checks against a FRESH load, so a statement committed by a
    // concurrent writer between here and the CAS is caught there).
    replayedSnapshot(m0, statementId).foreach(snap => return snap)
    val newFiles = GraftWriter.write(spark, df, m0, m0.currentSchemaId, m0.defaultSpecId)
    if (newFiles.isEmpty) {
      // empty input: still a (no-op) snapshot so the statement is recorded
      return commitSnapshot("append", statementId,
        Map("added-data-files" -> "0", "added-records" -> "0")) { m =>
        m.currentSnapshot.map(readManifestList(m, _)).getOrElse(Nil)
      }
    }
    val newManifest = writeManifest(m0, newFiles)
    commitSnapshot("append", statementId, Map(
      "added-data-files" -> newFiles.size.toString,
      "added-records" -> newFiles.map(_.recordCount).sum.toString)) { m =>
      m.currentSnapshot.map(readManifestList(m, _)).getOrElse(Nil) :+ newManifest
    }
  }

  /** INSERT OVERWRITE semantics: replace the whole table content. */
  def overwrite(spark: SparkSession, df: DataFrame, statementId: Option[String] = None): Snapshot = {
    val (_, m0) = load()
    val newFiles = GraftWriter.write(spark, df, m0, m0.currentSchemaId, m0.defaultSpecId)
    val manifests = if (newFiles.isEmpty) Nil else Seq(writeManifest(m0, newFiles))
    commitSnapshot("overwrite", statementId, Map(
      "added-data-files" -> newFiles.size.toString,
      "added-records" -> newFiles.map(_.recordCount).sum.toString))(_ => manifests)
  }

  /** CREATE OR REPLACE body (docs/01:182) for an EXISTING table: one CAS
    * commit that installs a freshly-id'd schema (ids continue from
    * lastColumnId — never reused, same discipline as DROP COLUMN), a new
    * default partition spec, and a "replace" snapshot holding `data` (or
    * nothing). Table identity and history are untouched: pre-replace
    * snapshots remain time-travelable until retention expires them.
    * Everything — id assignment, optional data write, snapshot — happens
    * inside the commit closure, so a CAS retry rebuilds against the fresh
    * base instead of committing stale ids.
    */
  def replaceWith(
      schema: org.apache.spark.sql.types.StructType,
      partitionBy: Seq[(String, Transform)] = Nil,
      properties: Map[String, String] = Map.empty,
      spark: Option[SparkSession] = None,
      data: Option[DataFrame] = None): TableMetadata =
    commitMetadata() { m =>
      val (schemaWithIds, lastCol) = GraftSchema.assignIds(
        GraftSchema.deepNullable(schema).asInstanceOf[org.apache.spark.sql.types.StructType],
        m.lastColumnId)
      val newSchemaId = m.schemas.keys.max + 1
      val newSpecId = m.specs.keys.max + 1
      val spec = PartitionSpec(newSpecId, PartitionSpec.fieldsFor(schemaWithIds, partitionBy))
      val mNew = m.copy(
        schemas = m.schemas + (newSchemaId -> schemaWithIds),
        currentSchemaId = newSchemaId,
        lastColumnId = lastCol,
        specs = m.specs + (newSpecId -> spec),
        defaultSpecId = newSpecId)
      val manifests = data match {
        case Some(df) =>
          val files = GraftWriter.write(spark.getOrElse(df.sparkSession), df,
            mNew, newSchemaId, newSpecId)
          if (files.isEmpty) Nil else Seq(writeManifest(mNew, files))
        case None => Nil
      }
      val snapId = m.lastSequenceNumber + 1
      val mlPath = writeManifestList(mNew, snapId, manifests)
      val stmt = java.util.UUID.randomUUID().toString
      val dataMfs = manifests.filter(_.content == "data")
      val snap = Snapshot(
        snapshotId = snapId,
        parentId = m.currentSnapshotId,
        sequenceNumber = snapId,
        timestampMs = System.currentTimeMillis(),
        operation = "replace",
        summary = Map(
          // distinguishes TABLE replacement (fresh field-id space) from
          // compaction's file-level "replace" operation — changelog's
          // cross-replace guard keys on this
          "table-replaced" -> "true",
          "statement-id" -> stmt,
          "total-data-files" -> dataMfs.map(_.fileCount.toLong).sum.toString,
          "total-records" -> dataMfs.map(_.recordCount).sum.toString,
          "total-delete-files" -> "0"),
        manifestListPath = mlPath,
        schemaId = newSchemaId,
        specId = newSpecId)
      mNew.copy(
        lastSequenceNumber = snapId,
        snapshots = m.snapshots :+ snap,
        currentSnapshotId = Some(snapId),
        properties = properties,
        // surviving BRANCH refs demote to TAGS: the replace mints a fresh
        // field-id space, so a branch that kept following the live schema
        // would resolve every pre-replace file to NULLs (silent data loss
        // in an audit read). As tags they stay readable under their own
        // pinned schema; appends/publish through them are refused — stage
        // new work on a fresh branch of the replaced table.
        refs = m.refs.map { case (n, r) => n -> r.copy(isBranch = false) },
        statementLog = m.statementLog :+ (stmt -> snapId))
    }

  /** Live data files of the current (or given) snapshot. */
  def liveFiles(m: TableMetadata, s: Option[Snapshot]): Seq[DataFile] =
    s.map(sn => readManifestList(m, sn).filter(_.content == "data").flatMap(readManifest(m, _)))
      .getOrElse(Nil)

  /** ROLLBACK: new snapshot whose content is an old snapshot's manifest list
    * (docs/05:151-160) — history is preserved, the rollback is itself a commit.
    */
  def rollbackTo(snapshotId: Long, statementId: Option[String] = None): Snapshot = {
    val (_, m0) = load()
    val target = m0.snapshot(snapshotId).getOrElse(sys.error(s"snapshot $snapshotId not found"))
    commitSnapshot("rollback", statementId,
      Map("rolled-back-to" -> snapshotId.toString)) { m => readManifestList(m, target) }
  }

  /** CHERRY-PICK (docs/05:163-171, v2 branching): re-apply ONE snapshot's
    * changes on top of the current head — the classic "rolled back past a
    * good commit, replay it" move. Supported for additive snapshots
    * (append / stream ingest): the manifests the snapshot added relative to
    * its parent are appended to the current manifest set. Snapshots that
    * removed or rewrote files (delete/update/merge/replace) are refused —
    * replaying a rewrite against a diverged base silently resurrects or
    * drops rows, so those need a fresh DML statement instead.
    */
  def cherryPick(snapshotId: Long, statementId: Option[String] = None): Snapshot = {
    val (_, m0) = load()
    val target = m0.snapshot(snapshotId).getOrElse(sys.error(s"snapshot $snapshotId not found"))
    require(target.operation == "append",
      s"cherry-pick supports append snapshots; snapshot $snapshotId is '${target.operation}'")
    val parentMfs = target.parentId.flatMap(m0.snapshot)
      .map(p => readManifestList(m0, p).map(_.path).toSet).getOrElse(Set.empty)
    val added = readManifestList(m0, target).filterNot(mf => parentMfs.contains(mf.path))
    require(added.nonEmpty, s"snapshot $snapshotId added no manifests; nothing to cherry-pick")
    val addedPaths = added.flatMap(readManifest(m0, _)).map(_.path).toSet
    commitSnapshot("append", statementId, Map(
      "cherry-picked-from" -> snapshotId.toString,
      "added-data-files" -> addedPaths.size.toString)) { m =>
      val current = m.currentSnapshot.map(readManifestList(m, _)).getOrElse(Nil)
      // double-apply guard: if any of the files are already live on the
      // head, this snapshot's changes are (partially) present
      val live = current.filter(_.content == "data").flatMap(readManifest(m, _)).map(_.path).toSet
      val dup = addedPaths.intersect(live)
      if (dup.nonEmpty)
        throw new graft.catalog.CommitConflictException(
          s"$name: cherry-pick of $snapshotId would double-apply ${dup.size} file(s) (e.g. ${dup.head})")
      current ++ added
    }
  }

  /** Write-audit-publish staging (docs/05:141-171's branching taken to its
    * standard lakehouse use): append on a branch — the snapshot enters
    * history and advances only the ref, so readers of the table see nothing
    * — audit via `atRef(branch)`, then [[publish]] fast-forwards main.
    */
  def appendToBranch(spark: SparkSession, df: DataFrame, branch: String,
                     statementId: Option[String] = None): Snapshot = {
    val (_, m0) = load()
    // a TAG is immutable by definition — appending through one would turn
    // a pin into a movable head (Iceberg refuses this the same way)
    m0.refs.get(branch).foreach(r =>
      require(r.isBranch, s"$name: ref '$branch' is a tag — cannot append to a tag"))
    val newFiles = GraftWriter.write(spark, df, m0, m0.currentSchemaId, m0.defaultSpecId)
    val newManifest = if (newFiles.isEmpty) None else Some(writeManifest(m0, newFiles))
    commitSnapshot("append", statementId, Map(
      "added-data-files" -> newFiles.size.toString,
      "added-records" -> newFiles.map(_.recordCount).sum.toString,
      "branch" -> branch), branch = Some(branch)) { m =>
      val base = m.refs.get(branch).map(_.snapshotId).flatMap(m.snapshot).orElse(m.currentSnapshot)
      base.map(readManifestList(m, _)).getOrElse(Nil) ++ newManifest
    }
  }

  /** Publish a staged branch: fast-forward main to the branch head and DROP
    * the branch ref — its commits are main history now, so keeping the ref
    * would (a) pin the published chain from retention forever (refs are GC
    * roots) and (b) make a later `appendToBranch` of the same name fork
    * from the stale published head once main advances, guaranteeing the
    * next publish is refused. Refuses when main has advanced past the
    * branch's fork point (a fast-forward would silently drop those commits
    * — re-stage on a fresh branch instead).
    */
  def publish(branch: String): TableMetadata = commitMetadata() { m =>
    val r = m.refs.getOrElse(branch, sys.error(s"unknown branch '$branch'"))
    require(r.isBranch, s"$name: ref '$branch' is a tag — only branches publish")
    val head = r.snapshotId
    def ancestors(id: Long): Set[Long] = {
      val s = m.snapshot(id)
      Set(id) ++ s.flatMap(_.parentId).map(ancestors).getOrElse(Set.empty)
    }
    val chain = ancestors(head)
    require(m.currentSnapshotId.forall(chain.contains),
      s"$name: branch '$branch' does not descend from main's head " +
        s"(${m.currentSnapshotId.getOrElse(-1L)}); fast-forward publish refused")
    m.copy(currentSnapshotId = Some(head), refs = m.refs - branch)
  }

  /** Branch/tag refs (docs/05:141-149). Default is a TAG (immutable pin,
    * snapshot-schema reads); `isBranch = true` creates a movable branch
    * head that tracks the table's live schema — see [[atRef]].
    */
  def setRef(refName: String, snapshotId: Long, isBranch: Boolean = false): TableMetadata =
    commitMetadata() { m =>
      require(m.snapshot(snapshotId).isDefined, s"snapshot $snapshotId not found")
      m.copy(refs = m.refs + (refName -> graft.format.Ref(snapshotId, isBranch)))
    }

  /** DROP a branch/tag ref. Abandons un-published staged work: the chain
    * stops being a GC root, so the next snapshot expiry reclaims it.
    */
  def dropRef(refName: String): TableMetadata = commitMetadata() { m =>
    require(m.refs.contains(refName), s"unknown ref '$refName'")
    m.copy(refs = m.refs - refName)
  }

  def setProperty(key: String, value: String): TableMetadata =
    commitMetadata()(m => m.copy(properties = m.properties + (key -> value)))

  def removeProperty(key: String): TableMetadata =
    commitMetadata()(m => m.copy(properties = m.properties - key))

  /** Apply several metadata transforms (schema changes, property edits) as
    * ONE CAS commit — the atomicity unit of a multi-change ALTER TABLE.
    * Per-change commits would let a failing later change leave the earlier
    * ones durably applied (retrying the statement then double-applies
    * them); folding inside one commitMetadata makes the whole statement
    * succeed or leave the table untouched.
    */
  def alterAtomically(ops: Seq[TableMetadata => TableMetadata]): TableMetadata =
    commitMetadata() { m =>
      val folded = ops.foldLeft(m)((acc, op) => op(acc))
      // each schema-evolution op minted its own schema version during the
      // fold; only the LAST is observable after this single commit, so
      // drop the intermediates (new in this fold, not current, referenced
      // by no snapshot) — an N-change ALTER must not append N full schema
      // copies to the metadata every load() parses
      val referenced = folded.snapshots.map(_.schemaId).toSet + folded.currentSchemaId
      folded.copy(schemas = folded.schemas.filter { case (id, _) =>
        m.schemas.contains(id) || referenced.contains(id) })
    }
}
