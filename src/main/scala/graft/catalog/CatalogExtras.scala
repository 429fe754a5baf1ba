package graft.catalog

import graft.format.GraftUtil
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** Stored views over Graft tables (SURVEY §2.1 D15; reference docs/12:168-172
  * — the UNION ALL hot+cold view). A view is persisted SQL text plus the
  * Graft tables it references; materialization registers each referenced
  * table's current snapshot as a temp view and runs the SQL, so the view
  * always reads freshly-committed state.
  */
class GraftViews(catalog: GraftCatalog) {

  private def viewPath(name: String) =
    Paths.get(catalog.warehouse, name.split('.') :+ "view.sql": _*)

  def createView(name: String, sqlText: String, references: Seq[String]): Unit = {
    val body = references.mkString(",") + "\n" + sqlText
    GraftUtil.writeStringAtomic(viewPath(name), body)
  }

  def viewExists(name: String): Boolean = Files.exists(viewPath(name))

  def dropView(name: String): Unit = Files.deleteIfExists(viewPath(name))

  /** Materialize: register referenced tables under their short names, run SQL. */
  def view(spark: SparkSession, name: String): DataFrame = {
    val body = GraftUtil.readString(viewPath(name))
    val (refLine, sql) = body.span(_ != '\n')
    val refs = refLine.split(',').map(_.trim).filter(_.nonEmpty)
    refs.foreach { tableName =>
      val short = tableName.split('.').last
      catalog.loadTable(tableName).toDF(spark).createOrReplaceTempView(short)
    }
    spark.sql(sql.trim)
  }
}

/** Namespace → catalog routing (SURVEY §2.1 D4/D5: catalog integrations and
  * catalog-linked databases, reference docs/04:60-110). A router resolves
  * `namespace.table` against whichever catalog the namespace is linked to —
  * the multi-catalog pattern of docs/11:53-87.
  */
class CatalogRouter(default: GraftCatalog) {
  private val routes = new ConcurrentHashMap[String, GraftCatalog]()

  /** CREATE CATALOG INTEGRATION + catalog-linked database. */
  def linkNamespace(namespace: String, catalog: GraftCatalog): Unit =
    routes.put(namespace, catalog)

  def catalogFor(name: String): GraftCatalog = {
    val ns = name.split('.').dropRight(1).mkString(".")
    Option(routes.get(ns)).getOrElse(default)
  }

  def loadTable(name: String): graft.table.GraftTable = catalogFor(name).loadTable(name)

  def listLinked: Map[String, String] =
    routes.asScala.map { case (ns, cat) => ns -> cat.warehouse }.toMap
}

/** Task schedule expressions (reference docs/10:174-183, docs/12:174-186):
  * `SCHEDULE = 'USING CRON <min> <hour> <dom> <mon> <dow> [tz]'` or the
  * interval form `SCHEDULE = '<N> MINUTE[S]'`. Cron fields support `*`,
  * numbers, names (JAN-DEC / SUN-SAT), ranges, steps and comma lists; the
  * day-of-month / day-of-week pair follows classic cron OR-when-both-
  * restricted semantics. Interval schedules are anchored at RESUME time —
  * the reference starts a task's interval clock when the task is resumed.
  */
object TaskSchedule {
  import java.time.{Instant, ZoneId}
  import java.time.temporal.ChronoUnit

  sealed trait Schedule {
    /** Earliest fire time strictly after `after`; `anchor` is the task's
      * last RESUME time (interval schedules count from it; cron ignores it).
      */
    def nextFire(anchor: Instant, after: Instant): Instant
  }

  final case class EveryMinutes(n: Int) extends Schedule {
    require(n > 0, s"interval must be positive, got $n")
    def nextFire(anchor: Instant, after: Instant): Instant = {
      val step = n.toLong * 60
      val elapsed = math.max(0L, after.getEpochSecond - anchor.getEpochSecond)
      anchor.plusSeconds((elapsed / step + 1) * step)
    }
  }

  final case class Cron(minutes: Set[Int], hours: Set[Int], dom: Set[Int],
                        months: Set[Int], dow: Set[Int],
                        domStar: Boolean, dowStar: Boolean, zone: ZoneId)
      extends Schedule {
    private def dayMatches(t: java.time.ZonedDateTime): Boolean = {
      val domOk = dom(t.getDayOfMonth)
      val dowOk = dow(t.getDayOfWeek.getValue % 7) // cron: 0=Sunday
      if (!domStar && !dowStar) domOk || dowOk else domOk && dowOk
    }
    private def matches(t: java.time.ZonedDateTime): Boolean =
      minutes(t.getMinute) && hours(t.getHour) &&
        months(t.getMonthValue) && dayMatches(t)

    def nextFire(anchor: Instant, after: Instant): Instant = {
      var t = after.atZone(zone).truncatedTo(ChronoUnit.MINUTES).plusMinutes(1)
      var steps = 0
      val limit = 366 * 24 * 60 * 4 // four years of minutes
      while (!matches(t)) {
        // skip whole non-matching days/hours in one hop so sparse schedules
        // (yearly crons) resolve in thousands of steps, not millions
        if (!months(t.getMonthValue) || !dayMatches(t))
          t = t.plusDays(1).truncatedTo(ChronoUnit.DAYS)
        else if (!hours(t.getHour))
          t = t.plusHours(1).truncatedTo(ChronoUnit.HOURS)
        else t = t.plusMinutes(1)
        steps += 1
        require(steps < limit, s"cron schedule never fires within 4 years")
      }
      t.toInstant
    }
  }

  private val monthNames =
    Seq("JAN", "FEB", "MAR", "APR", "MAY", "JUN",
        "JUL", "AUG", "SEP", "OCT", "NOV", "DEC").zip(1 to 12).toMap
  private val dowNames =
    Seq("SUN", "MON", "TUE", "WED", "THU", "FRI", "SAT").zipWithIndex.toMap

  /** Resolve one cron value, KEEPING dow 7 as 7 so ranges like `5-7` /
    * `FRI-SUN` expand as written; callers normalize 7→0 after expansion.
    */
  private def num(s: String, names: Map[String, Int], lo: Int, hi: Int): Int = {
    val v = names.getOrElse(s.toUpperCase,
      try s.toInt catch { case _: NumberFormatException =>
        sys.error(s"bad cron field value '$s'") })
    require(v >= lo && v <= hi || (hi == 6 && v == 7), s"cron value $v out of [$lo,$hi]")
    v
  }

  /** One cron field -> (matching values, is-it-unrestricted). Vixie cron:
    * a field counts as unrestricted (for the dom/dow OR rule) whenever it
    * STARTS with `*`, so `*\/2` is still a star field. Dow ranges expand
    * before the 7→0 Sunday normalization (`FRI-SUN` = {5,6,7} → {5,6,0});
    * a name for 7 used as a range END keeps the written order, so `0-7`
    * covers the whole week rather than collapsing to `0 to 0`.
    */
  private def field(spec: String, lo: Int, hi: Int,
                    names: Map[String, Int] = Map.empty): (Set[Int], Boolean) = {
    val isDow = hi == 6
    val vals = spec.split(',').toSeq.flatMap { part =>
      val (rangePart, step) = part.split('/') match {
        case Array(r)    => (r, 1)
        case Array(r, s) => (r, s.toInt)
        case _           => sys.error(s"bad cron field '$part'")
      }
      require(step > 0, s"cron step must be positive in '$part'")
      val (a, b) = rangePart match {
        case "*"                  => (lo, hi)
        case r if r.contains('-') =>
          val Array(x, y) = r.split('-')
          val (va, vb) = (num(x, names, lo, hi), num(y, names, lo, hi))
          // dow names map SUN→0, so FRI-SUN arrives as 5-0: a Sunday END of
          // a descending range means the top of the week (7), not day 0.
          if (isDow && vb == 0 && va > 0) (va, 7) else (va, vb)
        case r =>
          val v = num(r, names, lo, hi)
          // vixie's dow field spans 0-7 (both ends Sunday), so an anchored
          // step expands through 7: '5/2' = {5,7} = Fri+Sun, '7/2' = {7} =
          // Sun (normalized below) — capping at 6 would silently drop the
          // Sunday hit ('5/2') or make the range empty ('7/2')
          if (part.contains('/')) (v, if (isDow) 7 else hi) else (v, v)
      }
      require(a <= b, s"cron range '$part' is empty ($a > $b)")
      a to b by step
    }
    val norm = if (isDow) vals.map(v => if (v == 7) 0 else v) else vals
    (norm.toSet, spec.startsWith("*"))
  }

  /** Parse a SCHEDULE = '...' string. */
  def parse(text: String): Schedule = {
    val t = text.trim
    val cronPrefix = "(?i)^USING\\s+CRON\\s+".r
    cronPrefix.findFirstIn(t) match {
      case Some(p) =>
        val rest = t.substring(p.length).trim.split("\\s+")
        require(rest.length == 5 || rest.length == 6,
          s"cron needs 5 fields + optional timezone, got: '$t'")
        val (mins, _)        = field(rest(0), 0, 59)
        val (hrs, _)         = field(rest(1), 0, 23)
        val (dom, domStar)   = field(rest(2), 1, 31)
        val (mon, _)         = field(rest(3), 1, 12, monthNames)
        val (dow, dowStar)   = field(rest(4), 0, 6, dowNames)
        val zone = if (rest.length == 6) ZoneId.of(rest(5)) else ZoneId.of("UTC")
        Cron(mins, hrs, dom, mon, dow, domStar, dowStar, zone)
      case None =>
        val interval = "(?i)^(\\d+)\\s+MINUTES?$".r
        t match {
          case interval(n) => EveryMinutes(n.toInt)
          case _ => sys.error(s"unrecognized schedule '$text'")
        }
    }
  }
}

/** Scheduled-task registry + dispatcher (SURVEY §2.1 D16; reference
  * docs/10:174-183, docs/12:174-186). Tasks are created SUSPENDED (the
  * reference default), carry a parsed [[TaskSchedule.Schedule]], and fire
  * under a VIRTUAL clock: [[advanceTo]] replays every due (task, fireTime)
  * pair in strict chronological order — exactly what a warehouse scheduler
  * does, minus the wall clock, so runs are deterministic and testable.
  * Interval schedules anchor at RESUME; a task resumed mid-history only
  * fires from its resume point forward (no catch-up storm).
  */
class TaskRegistry(start: java.time.Instant = java.time.Instant.EPOCH) {
  import java.time.Instant
  final case class Task(name: String, schedule: String, body: () => Unit,
                        suspended: Boolean = true,
                        sched: TaskSchedule.Schedule,
                        anchor: Instant, nextFire: Option[Instant])
  private val tasks = new ConcurrentHashMap[String, Task]()
  private var clock: Instant = start
  private val runs = scala.collection.mutable.ArrayBuffer[(String, Instant, String)]()

  def now: Instant = synchronized(clock)

  def createTask(name: String, schedule: String)(body: => Unit): Unit = synchronized {
    tasks.put(name, Task(name, schedule, () => body,
      sched = TaskSchedule.parse(schedule), anchor = clock, nextFire = None))
  }

  /** CREATE TASK ... AS <sql> (docs/10:174-183, docs/12:174-186): the body
    * is SQL text — one statement or a BEGIN s1; s2; ...; END block — run
    * statement-by-statement against the fire-time active session. DML/DDL
    * statements are Spark commands and execute eagerly.
    */
  def createSqlTask(name: String, schedule: String, sqlBody: String): Unit =
    createTask(name, schedule) {
      val spark = SparkSession.active
      TaskRegistry.splitSqlBody(sqlBody).foreach(spark.sql(_))
    }

  /** ALTER TASK ... RESUME: task becomes schedulable; its interval clock
    * (and first fire) count from the current virtual time.
    */
  def resume(name: String): Unit = synchronized {
    // a typo must error, not silently "succeed" while the real task stays
    // suspended (execute() already raises for the same mistake)
    require(tasks.containsKey(name), s"unknown task $name")
    tasks.computeIfPresent(name, (_, t) =>
      t.copy(suspended = false, anchor = clock,
        nextFire = Some(t.sched.nextFire(clock, clock))))
  }
  def suspend(name: String): Unit = synchronized {
    require(tasks.containsKey(name), s"unknown task $name")
    tasks.computeIfPresent(name, (_, t) => t.copy(suspended = true, nextFire = None))
  }

  /** EXECUTE TASK — runs regardless of suspension (manual trigger). */
  def execute(name: String): Unit =
    Option(tasks.get(name)).getOrElse(sys.error(s"unknown task $name")).body()

  /** Advance the virtual clock to `to`, firing every due (task, fireTime)
    * in chronological order (ties broken by task name). Returns the fires.
    */
  def advanceTo(to: Instant): Seq[(String, Instant)] = synchronized {
    require(!to.isBefore(clock), s"clock cannot go backwards ($clock -> $to)")
    val fired = scala.collection.mutable.ArrayBuffer[(String, Instant)]()
    var continue = true
    while (continue) {
      val due = tasks.asScala.values
        .filter(t => !t.suspended && t.nextFire.exists(!_.isAfter(to)))
        .toSeq.sortBy(t => (t.nextFire.get, t.name))
      due.headOption match {
        case Some(t) =>
          val at = t.nextFire.get
          clock = at
          // advance the schedule and record the fire BEFORE running the
          // body: a throwing body must not lose already-executed history
          // (the reference's TASK_HISTORY records FAILED runs, docs/10) or
          // leave this fire eternally re-due.
          tasks.computeIfPresent(t.name, (_, cur) =>
            cur.copy(nextFire = Some(cur.sched.nextFire(cur.anchor, at))))
          try {
            t.body()
            runs += ((t.name, at, "SUCCEEDED"))
          } catch {
            case e: Throwable => runs += ((t.name, at, "FAILED")); throw e
          }
          fired += ((t.name, at))
        case None => continue = false
      }
    }
    clock = to
    fired.toSeq
  }

  /** Full run history: (task, scheduled fire time) in execution order —
    * the TASK_HISTORY view's essentials. Includes FAILED fires.
    */
  def history: Seq[(String, Instant)] = synchronized(runs.map(r => (r._1, r._2)).toSeq)

  /** TASK_HISTORY with run state: (task, fire time, SUCCEEDED|FAILED). */
  def historyWithState: Seq[(String, Instant, String)] = synchronized(runs.toSeq)

  /** Run every non-suspended task once (a manual scheduler tick, schedule
    * ignored) — the legacy pre-virtual-clock surface, kept for callers
    * that drive their own scheduler.
    */
  def runDue(): Seq[String] = {
    val due = tasks.asScala.values.filter(!_.suspended).toSeq.sortBy(_.name)
    due.foreach(_.body())
    due.map(_.name)
  }

  def list: Seq[(String, String, Boolean)] =
    tasks.asScala.values.map(t => (t.name, t.schedule, t.suspended)).toSeq.sortBy(_._1)
}

object TaskRegistry {
  /** Split a task body into statements: strip one `BEGIN ... END` wrapper
    * (word-bounded at BOTH ends, optional trailing `;`; a body that opens
    * with BEGIN but lacks a word-bounded END is rejected rather than
    * silently truncated), then split on `;` outside single-quoted literals
    * (doubled '' escapes flip the flag twice — safe), outside
    * double-quoted identifiers, and outside `--` line comments.
    */
  private[graft] def splitSqlBody(body: String): Seq[String] = {
    var t = body.trim
    val upper = t.toUpperCase
    // a bare BEGIN opens a statement BLOCK (must close with END); the
    // transaction STATEMENT — BEGIN immediately terminated by ';' (any
    // whitespace before it) or followed by the word TRANSACTION/WORK —
    // goes through the plain statement splitter instead
    val txnLike = upper.startsWith("BEGIN") && {
      val next = upper.drop(5).dropWhile(_.isWhitespace)
      next.startsWith(";") ||
        Seq("TRANSACTION", "WORK").exists(w => next.startsWith(w) &&
          (next.length == w.length || !Character.isLetterOrDigit(next.charAt(w.length))))
    }
    val beginLike = !txnLike && upper.startsWith("BEGIN") &&
      (t.length == 5 || !Character.isLetterOrDigit(t.charAt(5)))
    if (beginLike) {
      val inner = t.stripSuffix(";").trim
      val iu = inner.toUpperCase
      require(iu.endsWith("END") &&
        inner.length > 3 && !Character.isLetterOrDigit(inner.charAt(inner.length - 4)),
        s"task body starts with BEGIN but has no matching END: '$body'")
      t = inner.substring(5, inner.length - 3)
    }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    val cur = new StringBuilder
    var inQuote = false  // inside '...'
    var inIdent = false  // inside "..."
    var inComment = false // inside -- ... \n
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (inComment) {
        cur += c
        if (c == '\n') inComment = false
      } else c match {
        case '\'' if !inIdent => inQuote = !inQuote; cur += c
        case '"' if !inQuote  => inIdent = !inIdent; cur += c
        case '-' if !inQuote && !inIdent && i + 1 < t.length && t.charAt(i + 1) == '-' =>
          inComment = true; cur += c
        case ';' if !inQuote && !inIdent => out += cur.toString; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    out += cur.toString
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }
}

/** Result caching (SURVEY §2.4 S7; reference docs/01:163, docs/09:88):
  * repeated identical queries are served from a cached materialization keyed
  * by the optimized logical plan. Entries are pinned with `persist()`; the
  * caller owns explicit invalidation (`clear`), but staleness is handled
  * structurally — a commit changes the table's file list, so the new read's
  * optimized plan no longer `sameResult`s the cached one and misses.
  * Superseded entries would therefore pin storage forever in a long-lived
  * driver; the cache is FIFO-bounded and evicts with `unpersist`.
  */
class ResultCache(maxEntries: Int = 32) {
  // plain buffer — every access is serialized on this object's monitor
  private val cache = scala.collection.mutable.ArrayBuffer[
    (org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame)]()

  /** Serve `df` from cache when an entry's optimized plan `sameResult`s it
    * (Catalyst's semantic plan equality — exprId/layout insensitive).
    */
  def cached(df: DataFrame): DataFrame = synchronized {
    val plan = df.queryExecution.optimizedPlan
    cache.find(_._1.sameResult(plan)) match {
      case Some((_, hit)) => hit
      case None =>
        df.persist()
        // store the POST-persist optimized plan: Spark's CacheManager now
        // substitutes an InMemoryRelation, and later lookups of the same
        // query arrive with that substitution already applied.
        val stored = df.sparkSession.sessionState
          .executePlan(df.queryExecution.logical).optimizedPlan
        cache += ((stored, df))
        while (cache.size > maxEntries) {
          cache.remove(0)._2.unpersist()
        }
        df
    }
  }

  def size: Int = synchronized(cache.size)
  def clear(): Unit = synchronized {
    cache.foreach(_._2.unpersist()); cache.clear()
  }
}
