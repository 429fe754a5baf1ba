package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NULL / degenerate text rows through the text-function surface — the
  * testdata corpus carries no NULL or empty documents, so without this
  * sweep a NULL-text crawl row would be the first ever to exercise these
  * paths in production. Contract pinned here: every expression NULLs (or
  * empties) through, nothing throws, and NULL never silently becomes a
  * countable token.
  */
class HostileInputSpec extends SparkSpec {

  private def hostile() = {
    import spark.implicits._
    Seq(
      (1L, Option("the quick brown fox")), // normal
      (2L, Option("")),                    // empty string
      (3L, Option("   \t  ")),             // whitespace only
      (4L, Option.empty[String]),          // NULL text
      (5L, Option("x" * 100000)))          // one giant token
      .toDF("doc_id", "text")
  }

  test("tokenizer family: NULL/empty/whitespace rows yield empty-or-NULL, never a crash") {
    val TF = TextFunctions
    val out = hostile().select(
      col("doc_id"),
      TF.tokens(col("text")).as("toks"),
      TF.tokenCount(col("text")).as("n"),
      TF.bpeTokens(col("text")).as("bpe"),
      TF.fingerprint(col("text")).as("fp"),
      TF.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1).getSeq[String](1) == Seq("the", "quick", "brown", "fox"))
    assert(out(2).getSeq[String](1).isEmpty && out(2).getLong(2) == 0L)
    assert(out(3).getSeq[String](1).isEmpty && out(3).getLong(2) == 0L)
    assert(out(4).isNullAt(1) || out(4).getSeq[String](1).isEmpty,
      "NULL text must not fabricate tokens")
    assert(out(4).isNullAt(4), "fingerprint of NULL text must be NULL, not a real hash")
    assert(out(5).getLong(2) == 1L, "one giant token counts once")
    // shingles of a 4-token doc at k=3: 2 shingles; degenerate docs: none
    assert(out(1).getSeq[String](5).length == 2)
    assert(out(2).isNullAt(5) || out(2).getSeq[String](5).isEmpty)
  }

  test("aggregation gates ignore NULL-text rows instead of grouping them as a token") {
    val counted = hostile()
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
      .groupBy("token").count().collect()
    // explode of NULL/empty arrays contributes nothing — only real tokens
    val tokens = counted.map(_.getString(0)).toSet
    assert(!tokens.contains(null) && !tokens.contains(""),
      s"NULL/empty leaked into the token stream: $tokens")
    assert(tokens.contains("the") && tokens.size == 5, s"got $tokens")
  }

  test("quality + langId on degenerate rows: defined, deterministic, no exceptions") {
    val TF = TextFunctions
    val rows = hostile().select(
      col("doc_id"),
      TF.langId(col("text"), Seq("en" -> Seq("the")), default = "other").as("lang"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(rows(1) == "en")
    assert(Set("other", null).contains(rows(4)),
      s"NULL text must classify as default-or-NULL, got ${rows(4)}")
    assert(Set("other", null).contains(rows(2)))
  }

  test("signProject on NULL/empty/short vectors: NULL-or-null-lanes, never a crash") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("emb", ArrayType(FloatType))))
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, Seq(1.0f, -2.0f, 0.5f)),       // well-formed
      org.apache.spark.sql.Row(2L, Seq.empty[Float]),             // empty vector
      org.apache.spark.sql.Row(3L, null),                         // NULL vector
      org.apache.spark.sql.Row(4L, Seq(3.0f)),                    // short vector
      org.apache.spark.sql.Row(5L, Seq[java.lang.Float](1.0f, null, 2.0f)) // NULL lane
    ).asJava, schema)
    val got = df.select(col("id"), VectorFunctions.signProject(
        VectorFunctions.quantizeInt8(col("emb"))("codes"),
        VectorFunctions.signMatrix(3, 2)).as("p"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Any](1))).toMap
    // the contract is dim-uniform, non-null-lane input; degenerate rows
    // must stay inert — the guard projects them to NULL (never a
    // fabricated finite vector: an unguarded padded fold silently returns
    // its zero; and never an array of null lanes a .isNotNull filter keeps)
    assert(got(1L) != null && got(1L).forall(_ != null), "well-formed row projects")
    for (id <- Seq(2L, 3L, 4L, 5L))
      assert(got(id) == null,
        s"degenerate row $id must project to NULL: ${got(id)}")
  }
}
