package graft.format

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pruning soundness (SURVEY §5.3a): for random per-file row sets and random
  * predicates, `mayMatch` must NEVER return false when a row in the file
  * matches the predicate. (Returning true for a non-matching file is allowed —
  * pruning is advisory.) Also pins the docs/03:117-133 worked example.
  */
class PredicateSpec extends AnyFunSuite {

  /** Deterministic generator-driven check (no scalatestplus bridge in the
    * offline cache): 500 seeded samples per property.
    */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 500)(check: A => Unit): Unit = {
    var seed = Seed(42L)
    (1 to n).foreach { _ =>
      check(gen.pureApply(Gen.Parameters.default, seed))
      seed = seed.next
    }
  }

  private val schema = StructType(Seq(
    GraftSchema.withId(StructField("x", LongType), 1),
    GraftSchema.withId(StructField("s", StringType), 2)))

  private def boundsOf(rows: Seq[(Option[Long], Option[String])], col: String): Predicate.Bounds = {
    val n = rows.size.toLong
    col match {
      case "x" =>
        val vs = rows.flatMap(_._1)
        Predicate.Bounds(vs.minOption, vs.maxOption, Some(n - vs.size), Some(n))
      case "s" =>
        val vs = rows.flatMap(_._2)
        Predicate.Bounds(vs.minOption, vs.maxOption, Some(n - vs.size), Some(n))
    }
  }

  private def ctxOf(rows: Seq[(Option[Long], Option[String])]) =
    Predicate.PruneContext(schema, c => Some(boundsOf(rows, c)), _ => Nil)

  private def evalLeaf(p: Predicate, row: (Option[Long], Option[String])): Boolean = p match {
    case Predicate.Eq("x", v) => row._1.contains(Canonical.of(LongType, v).get)
    case Predicate.NotEq("x", v) => row._1.exists(_ != Canonical.of(LongType, v).get)
    case Predicate.Lt("x", v) => row._1.exists(_ < Canonical.of(LongType, v).get.asInstanceOf[Long])
    case Predicate.LtEq("x", v) => row._1.exists(_ <= Canonical.of(LongType, v).get.asInstanceOf[Long])
    case Predicate.Gt("x", v) => row._1.exists(_ > Canonical.of(LongType, v).get.asInstanceOf[Long])
    case Predicate.GtEq("x", v) => row._1.exists(_ >= Canonical.of(LongType, v).get.asInstanceOf[Long])
    case Predicate.In("x", vs) => row._1.exists(x => vs.map(v => Canonical.of(LongType, v).get).contains(x))
    case Predicate.IsNull("x") => row._1.isEmpty
    case Predicate.NotNull("x") => row._1.nonEmpty
    case Predicate.Eq("s", v) => row._2.contains(v.toString)
    case Predicate.StartsWith("s", p0) => row._2.exists(_.startsWith(p0))
    case Predicate.IsNull("s") => row._2.isEmpty
    case Predicate.NotNull("s") => row._2.nonEmpty
    case Predicate.And(l, r) => evalLeaf(l, row) && evalLeaf(r, row)
    case Predicate.Or(l, r) => evalLeaf(l, row) || evalLeaf(r, row)
    case Predicate.True => true
    case other => sys.error(s"unhandled $other")
  }

  private val genRow: Gen[(Option[Long], Option[String])] = for {
    x <- Gen.option(Gen.choose(-50L, 50L))
    s <- Gen.option(Gen.oneOf("apple", "banana", "cherry", "kiwi", "zebra"))
  } yield (x, s)

  private val genLeaf: Gen[Predicate] = Gen.oneOf(
    Gen.choose(-60L, 60L).map(v => Predicate.Eq("x", v)),
    Gen.choose(-60L, 60L).map(v => Predicate.NotEq("x", v)),
    Gen.choose(-60L, 60L).map(v => Predicate.Lt("x", v)),
    Gen.choose(-60L, 60L).map(v => Predicate.LtEq("x", v)),
    Gen.choose(-60L, 60L).map(v => Predicate.Gt("x", v)),
    Gen.choose(-60L, 60L).map(v => Predicate.GtEq("x", v)),
    Gen.listOfN(3, Gen.choose(-60L, 60L)).map(vs => Predicate.In("x", vs)),
    Gen.const(Predicate.IsNull("x")),
    Gen.const(Predicate.NotNull("x")),
    Gen.oneOf("apple", "banana", "coconut").map(v => Predicate.Eq("s", v)),
    Gen.oneOf("a", "ba", "z", "ki").map(p => Predicate.StartsWith("s", p)),
    Gen.const(Predicate.IsNull("s")))

  private val genPred: Gen[Predicate] = for {
    a <- genLeaf; b <- genLeaf; c <- genLeaf
    combine <- Gen.oneOf[(Predicate, Predicate) => Predicate](Predicate.And(_, _), Predicate.Or(_, _))
    combine2 <- Gen.oneOf[(Predicate, Predicate) => Predicate](Predicate.And(_, _), Predicate.Or(_, _))
  } yield combine2(combine(a, b), c)

  test("pruning soundness: a file containing a matching row is never pruned") {
    val gen = for { rows <- Gen.nonEmptyListOf(genRow); p <- genPred } yield (rows, p)
    forAllSeeded(gen, 800) { case (rows, pred) =>
      val anyMatch = rows.exists(r => evalLeaf(pred, r))
      val may = Predicate.mayMatch(pred, ctxOf(rows))
      if (anyMatch) assert(may, s"unsound prune: $pred on $rows")
    }
  }

  test("worked example docs/03:117-133: bounds include vs skip") {
    // file A: o_orderdate in [2024-01-01, 2024-01-31]; file B: [2024-03-01, 2024-03-31]
    val dt = DateType
    def day(s: String) = Canonical.toDays(s)
    val fileA = Predicate.Bounds(Some(day("2024-01-01")), Some(day("2024-01-31")), Some(0L), Some(100L))
    val fileB = Predicate.Bounds(Some(day("2024-03-01")), Some(day("2024-03-31")), Some(0L), Some(100L))
    val schema2 = StructType(Seq(GraftSchema.withId(StructField("d", dt), 1)))
    def ctx(b: Predicate.Bounds) = Predicate.PruneContext(schema2, _ => Some(b), _ => Nil)
    val q = Predicate.And(
      Predicate.GtEq("d", "2024-01-10"), Predicate.LtEq("d", "2024-01-20"))
    assert(Predicate.mayMatch(q, ctx(fileA)))   // include
    assert(!Predicate.mayMatch(q, ctx(fileB)))  // skip
  }

  test("malformed literals degrade to keep-the-file, never crash the plan") {
    val fileA = Predicate.Bounds(Some(Canonical.toDays("2024-01-01")),
      Some(Canonical.toDays("2024-01-31")), Some(0L), Some(100L))
    val schema2 = StructType(Seq(GraftSchema.withId(StructField("d", DateType), 1)))
    val ctx = Predicate.PruneContext(schema2, _ => Some(fileA), _ => Nil)
    // canon("not-a-date") must be None -> conservatively kept, and the
    // exact row-level filter decides; a DateTimeParseException here would
    // fail the whole scan at plan time
    assert(Canonical.of(DateType, "not-a-date").isEmpty)
    assert(Canonical.of(LongType, "forty-two").isEmpty)
    assert(Predicate.mayMatch(Predicate.Gt("d", "not-a-date"), ctx))
    // duplicate hidden-partition names are refused at spec build, not
    // silently collapsed into one Map key with the wrong transform
    val idSchema = StructType(Seq(GraftSchema.withId(StructField("id", LongType), 1)))
    val e = intercept[IllegalArgumentException](PartitionSpec.fieldsFor(idSchema,
      Seq("id" -> Transform.Bucket(4), "id" -> Transform.Bucket(16))))
    assert(e.getMessage.contains("duplicate partition field"), e.getMessage)
  }

  test("hidden-partition derivation: day(ts) range query prunes other days (docs/07:30-40)") {
    val schema3 = StructType(Seq(GraftSchema.withId(StructField("ts", TimestampNTZType), 1)))
    def fileForDay(d: String): Predicate.PruneContext = Predicate.PruneContext(
      schema3, _ => None,
      _ => Seq((Transform.Day, Predicate.Bounds(Some(d), Some(d), Some(0L), Some(10L)))))
    val q = Predicate.And(
      Predicate.GtEq("ts", "2024-01-15T00:00:00"),
      Predicate.Lt("ts", "2024-01-16T00:00:00"))
    assert(Predicate.mayMatch(q, fileForDay("2024-01-15")))
    assert(!Predicate.mayMatch(q, fileForDay("2024-01-17")))
    assert(!Predicate.mayMatch(q, fileForDay("2024-01-10")))
  }

  test("bucket partitions prune equality but not ranges") {
    val schema4 = StructType(Seq(GraftSchema.withId(StructField("id", LongType), 1)))
    val b = Transform.Bucket(16)
    val bucketOf42 = b(LongType, 42L).get
    def fileForBucket(v: Long): Predicate.PruneContext = Predicate.PruneContext(
      schema4, _ => None,
      _ => Seq((b, Predicate.Bounds(Some(v), Some(v), Some(0L), Some(10L)))))
    assert(Predicate.mayMatch(Predicate.Eq("id", 42L), fileForBucket(bucketOf42.asInstanceOf[Long])))
    val otherBucket = (bucketOf42.asInstanceOf[Long] + 1) % 16
    assert(!Predicate.mayMatch(Predicate.Eq("id", 42L), fileForBucket(otherBucket)))
    // ranges cannot prune through a non-monotonic transform
    assert(Predicate.mayMatch(Predicate.Gt("id", 42L), fileForBucket(otherBucket)))
  }
}
