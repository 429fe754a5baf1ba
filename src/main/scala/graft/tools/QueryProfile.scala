package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-query Spark-job profiler for the bench gates (optimization guide
  * §1: measure first). Runs named SparkEntry queries exactly the way
  * Bench does (same session shape, same per-query cache/tempdir hygiene)
  * with a listener that attributes wall time to individual Spark jobs by
  * call site, so a gate's seconds decompose into "which action, launched
  * from which line, with how many tasks".
  *
  * Run: SPARK_GRAFT_QUERIES=x_hits,x_triangles sbt "runMain graft.tools.QueryProfile"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_PROFILE_RUNS (default 2 —
  *      the second run approximates Bench's warm-JVM steady state).
  */
object QueryProfile {
  private final case class JobRow(jobId: Int, site: String, start: Long,
      var end: Long = 0L, var tasks: Int = 0, var taskTimeMs: Long = 0L,
      var stages: Int = 0)

  private final class Profiler extends SparkListener {
    val jobs = mutable.LinkedHashMap[Int, JobRow]()
    private val stageToJob = mutable.HashMap[Int, Int]()
    var enabled = false
    val jobsPerExec = mutable.HashMap[String, Int]()
    override def onJobStart(e: SparkListenerJobStart): Unit = if (enabled) {
      val site = Option(e.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
      val execId = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.sql.execution.id"))).getOrElse("-")
      jobsPerExec.synchronized {
        jobsPerExec(execId) = jobsPerExec.getOrElse(execId, 0) + 1
      }
      jobs(e.jobId) = JobRow(e.jobId, site, e.time)
      jobs(e.jobId).stages = e.stageIds.size
      e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobs.get(e.jobId).foreach(_.end = e.time)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
      stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
        j.tasks += 1
        if (e.taskInfo != null) j.taskTimeMs += e.taskInfo.duration
      }
    def reset(): Unit = { jobs.clear(); stageToJob.clear()
      jobsPerExec.synchronized(jobsPerExec.clear()) }
  }

  /** Per-SQL-execution attribution: action name + plan head + duration.
    * When `planDir` is set, also keeps the formatted plan of every
    * execution so the per-query top plans can be dumped to files
    * (plans/r18 before/after evidence).
    */
  private final class ExecLog(planDir: Option[String])
      extends org.apache.spark.sql.util.QueryExecutionListener {
    val rows = mutable.ArrayBuffer[(String, String, Double, String)]()
    var enabled = false
    private def head(qe: org.apache.spark.sql.execution.QueryExecution): String = {
      val s = qe.executedPlan.toString.linesIterator
        .filter(_.exists(_.isLetter)).take(2).mkString(" | ")
      s.replaceAll("#\\d+[L]?", "").take(150)
    }
    override def onSuccess(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
      if (enabled) {
        val plan = if (planDir.isDefined)
          try qe.explainString(org.apache.spark.sql.execution.FormattedMode)
          catch { case _: Throwable => "" }
        else ""
        rows.synchronized { rows += ((funcName, head(qe), durationNs / 1e9, plan)): Unit }
      }
    override def onFailure(funcName: String,
        qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // A/B experiment confs: SPARK_GRAFT_PROFILE_CONF="k=v;k=v"
    sys.env.getOrElse("SPARK_GRAFT_PROFILE_CONF", "").split(';')
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); b = b.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names: Seq[String] = (if (args.nonEmpty) args.toSeq
      else sys.env.getOrElse("SPARK_GRAFT_QUERIES", "").split(",").toSeq)
      .map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "pass query names as args or SPARK_GRAFT_QUERIES")
    val prof = new Profiler
    spark.sparkContext.addSparkListener(prof)
    // SPARK_GRAFT_PLAN_DIR=plans/r18 + SPARK_GRAFT_PLAN_TAG=before dumps the
    // top executions' formatted plans per query as <query>_<tag>.txt
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR").filter(_.nonEmpty)
    val planTag = sys.env.getOrElse("SPARK_GRAFT_PLAN_TAG", "before")
    val execLog = new ExecLog(planDir)
    spark.listenerManager.register(execLog)

    // 10ms stack sampler on the main thread: attributes the driver-only gap
    val samples = mutable.HashMap[String, Int]()
    val mainThread = Thread.currentThread()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      def interest(e: StackTraceElement): Boolean = {
        val c = e.getClassName
        c.startsWith("graft.") || c.contains("janino") || c.contains("codehaus") ||
        c.startsWith("org.apache.spark.sql.catalyst.optimizer") ||
        c.startsWith("org.apache.spark.sql.catalyst.analysis") ||
        c.startsWith("org.apache.spark.sql.execution.adaptive") ||
        c.startsWith("org.apache.spark.sql.execution.datasources") ||
        c.startsWith("org.apache.spark.sql.execution.streaming") ||
        c.startsWith("org.apache.parquet") || c.startsWith("java.io") ||
        c.startsWith("java.nio") || c.startsWith("sun.nio")
      }
      while (sampling) {
        // streaming gates do their work on the stream-execution thread while
        // main blocks in awaitTermination: sample whichever is busy
        val st = {
          val all = Thread.getAllStackTraces
          import scala.jdk.CollectionConverters._
          val streamT = all.asScala.collectFirst {
            case (t, s) if t.getName.contains("stream execution") &&
              t.getState == Thread.State.RUNNABLE && s.nonEmpty => s
          }
          streamT.getOrElse(mainThread.getStackTrace)
        }
        if (st.nonEmpty) {
          val key = if (st.exists(_.getClassName.contains("ThreadUtils")) &&
              st.exists(f => f.getMethodName == "awaitResult" || f.getMethodName == "await"))
            "WAIT-on-jobs: " + st.reverseIterator
              .find(f => f.getClassName.startsWith("graft."))
              .map(f => f.getClassName.split('.').last + "." + f.getMethodName)
              .getOrElse("?")
          else st.find(interest).map { f =>
            val g = st.find(_.getClassName.startsWith("graft."))
              .map(x => x.getClassName.split('.').last + "." + x.getMethodName + " <- ")
              .getOrElse("")
            g + f.getClassName.split('.').last + "." + f.getMethodName
          }.getOrElse("other: " + st.head.getClassName.split('.').last + "." +
            st.head.getMethodName)
          samples.synchronized { samples(key) = samples.getOrElse(key, 0) + 1 }
        }
        Thread.sleep(10)
      }
    })
    sampler.setDaemon(true)
    // the all-thread poll perturbs sub-second measurements: opt-in only
    if (sys.env.get("SPARK_GRAFT_PROFILE_STACKS").contains("1")) sampler.start()
    else sampling = false

    for (run <- 1 to runs; name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      graft.queries.TableOps.reclaimTempDirs()
      graft.queries.FixtureClock.reset()
      prof.reset(); prof.enabled = true
      execLog.rows.clear(); execLog.enabled = true
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable => println(s"!! $name failed: ${e.getMessage.take(200)}")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      prof.enabled = false
      execLog.enabled = false
      // listener bus is async; give it a beat to drain
      Thread.sleep(300)
      val rows = prof.jobs.values.toSeq
      val jobWall = rows.map(r => math.max(0L, r.end - r.start)).sum / 1e3
      println(f"\n== $name run$run: wall=$wall%.2fs jobs=${rows.size} " +
        f"jobWall=$jobWall%.2fs tasks=${rows.map(_.tasks).sum} " +
        f"taskTime=${rows.map(_.taskTimeMs).sum / 1e3}%.2fs " +
        f"gap=${wall - jobWall}%.2fs (driver/planning/commit)")
      val bySite = rows.groupBy(_.site).map { case (site, js) =>
        (site, js.map(r => math.max(0L, r.end - r.start)).sum / 1e3,
          js.size, js.map(_.tasks).sum, js.map(_.taskTimeMs).sum / 1e3)
      }.toSeq.sortBy(-_._2)
      bySite.take(18).foreach { case (site, w, nj, nt, tt) =>
        println(f"   $w%7.3fs  jobs=$nj%3d tasks=$nt%5d taskTime=$tt%7.2fs  $site")
      }
      val ex = execLog.rows.synchronized(execLog.rows.toVector)
      val jpe = prof.jobsPerExec.synchronized(prof.jobsPerExec.toMap)
      val hist = jpe.values.groupBy(identity).view.mapValues(_.size).toSeq.sortBy(_._1)
      println(s"   -- jobs/execution histogram (jobs -> n execs): " +
        hist.map { case (j, n) => s"$j->$n" }.mkString(" ") +
        s"  (no-exec jobs: ${jpe.getOrElse("-", 0)})")
      println(f"   -- ${ex.size} SQL executions, sum=${ex.map(_._3).sum}%.2fs; top:")
      ex.sortBy(-_._3).take(25).foreach { case (fn2, plan, sec, _) =>
        println(f"   $sec%7.3fs  $fn2%-16s $plan")
      }
      // dump the top plans (final run only, so the warm-JVM plans are kept)
      if (run == runs) planDir.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        val body = new StringBuilder
        body ++= f"# $name ($planTag): top SQL executions by wall time, warm run\n"
        ex.sortBy(-_._3).take(8).zipWithIndex.foreach { case ((fn2, _, sec, plan), i) =>
          body ++= f"\n===== exec#$i action=$fn2 wall=$sec%.3fs =====\n$plan\n"
        }
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"${name}_$planTag.txt"),
          body.toString.getBytes("UTF-8")): Unit
      }
      println(f"   -- main-thread samples (10ms): top frames")
      samples.synchronized {
        samples.toSeq.sortBy(-_._2).take(20).foreach { case (f2, n) =>
          println(f"   ${n * 0.01}%6.2fs  $f2")
        }
        samples.clear()
      }
    }
    spark.stop()
  }
}
