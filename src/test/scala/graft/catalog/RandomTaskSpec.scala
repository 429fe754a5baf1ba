package graft.catalog

import org.scalatest.funsuite.AnyFunSuite
import java.time.Instant
import scala.collection.mutable
import scala.util.Random

/** Model-based property for the task dispatcher: random schedules and
  * random resume/suspend/advance interleavings must fire exactly the
  * (task, time) pairs a brute-force minute-scan model predicts, in
  * chronological order with name tie-breaks. The model shares NO logic
  * with the dispatcher (no nextFire, no priority queue) — it re-derives
  * fires by checking every minute in the advanced interval.
  */
class RandomTaskSpec extends AnyFunSuite {

  test("random schedules: dispatcher matches a brute-force minute-scan model") {
    for (seed <- 1 to 3) {
      val rng = new Random(seed)
      val t0 = Instant.parse("2024-01-01T00:00:00Z")
      val reg = new TaskRegistry(t0)

      final case class M(schedule: String, var suspended: Boolean = true,
                         var anchor: Instant = t0)
      val model = mutable.LinkedHashMap[String, M]()
      var clock = t0

      (1 to 5).foreach { i =>
        val n = s"t$i"
        val sched = rng.nextInt(3) match {
          case 0 => s"${5 + rng.nextInt(116)} MINUTE"
          case 1 => s"USING CRON ${rng.nextInt(60)} * * * *"
          case _ => s"USING CRON ${rng.nextInt(60)} ${rng.nextInt(24)} * * *"
        }
        reg.createTask(n, sched) {}
        model(n) = M(sched)
      }

      def fireAt(m: M, t: Instant): Boolean = {
        if (m.suspended) return false
        val z = t.atZone(java.time.ZoneOffset.UTC)
        m.schedule.split("\\s+") match {
          case Array(n, "MINUTE") =>
            val step = n.toLong * 60
            val d = t.getEpochSecond - m.anchor.getEpochSecond
            d > 0 && d % step == 0
          case Array("USING", "CRON", min, "*", "*", "*", "*") =>
            z.getMinute == min.toInt
          case Array("USING", "CRON", min, hour, "*", "*", "*") =>
            z.getMinute == min.toInt && z.getHour == hour.toInt
          case other => fail(s"unexpected schedule ${other.mkString(" ")}")
        }
      }

      def modelFires(to: Instant): Seq[(String, Instant)] = {
        val out = mutable.ArrayBuffer[(String, Instant)]()
        var t = clock.plusSeconds(60)
        while (!t.isAfter(to)) {
          model.toSeq.sortBy(_._1).foreach { case (n, m) =>
            if (fireAt(m, t)) out += ((n, t))
          }
          t = t.plusSeconds(60)
        }
        out.toSeq
      }

      for (step <- 1 to 15) {
        rng.nextInt(4) match {
          case 0 =>
            val n = s"t${1 + rng.nextInt(5)}"
            reg.resume(n)
            model(n).suspended = false; model(n).anchor = clock
          case 1 =>
            val n = s"t${1 + rng.nextInt(5)}"
            reg.suspend(n)
            model(n).suspended = true
          case _ =>
            val to = clock.plusSeconds(60L * (1 + rng.nextInt(300)))
            val got = reg.advanceTo(to)
            val want = modelFires(to)
            assert(got == want, s"seed=$seed step=$step clock=$clock to=$to\n" +
              s"schedules=${model.map { case (k, v) => s"$k:${v.schedule}${if (v.suspended) "(susp)" else ""}" }.mkString(", ")}")
            clock = to
        }
      }
    }
  }
}
