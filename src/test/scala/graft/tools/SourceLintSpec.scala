package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Repo hygiene: no raw control characters in Scala sources. A single NUL
  * byte makes git/grep classify a file as binary, hiding its diffs from
  * review — use "\\u0000"-style escapes instead.
  */
class SourceLintSpec extends AnyFunSuite {

  test("no raw control characters in src/main or src/test sources") {
    val roots = Seq("src/main", "src/test").map(Paths.get(_)).filter(Files.exists(_))
    val bad = roots.flatMap { root =>
      val walk = Files.walk(root)
      try {
        walk.iterator().asScala
          .filter(p => p.toString.endsWith(".scala"))
          .filter { p =>
            val bytes = Files.readAllBytes(p)
            bytes.exists(b => (b >= 0 && b < 0x20) && b != '\n' && b != '\r' && b != '\t')
          }
          .toList
      } finally walk.close()
    }
    assert(bad.isEmpty, s"raw control characters in: ${bad.mkString(", ")}")
  }
}
