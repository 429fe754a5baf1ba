package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-vector functions for similarity search (SURVEY.md §2.9 X3):
  * higher-order-function math over `array<float>` columns — stays in
  * WholeStageCodegen, no UDFs, no driver round-trips.
  *
  * Accumulation is in DOUBLE (floats are cast element-wise) so results are
  * deterministic left-fold sums regardless of Tungsten layout.
  */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  def cosineSimilarity(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  def euclideanDistance(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => {
      val diff = x.cast("double") - y.cast("double"); diff * diff
    }), lit(0.0), (acc, v) => acc + v))

  /** Sign-hyperplane LSH bucket over the first `bits` dimensions: a cheap,
    * exact-arithmetic space partition. At 100 TB this is the partition key —
    * an ANN probe touches one bucket, not the corpus.
    */
  def lshBucket(a: Column, bits: Int = 8): Column =
    concat_ws("", transform(slice(a, 1, bits),
      x => when(x >= lit(0.0f), "1").otherwise("0")))

  /** Distributed top-k ranking without a global window: `orderBy.limit(k)`
    * plans TakeOrderedAndProject (each partition keeps k rows, the driver
    * merges k·numPartitions), then rank is derived over the k surviving rows
    * in one single-partition sorted pass — no WindowExec, no corpus-wide
    * single-partition shuffle.
    */
  private def rankTopK(scored: DataFrame, idCol: String, k: Int): DataFrame =
    scored.select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
      .coalesce(1)
      .sortWithinPartitions(col("sim").desc, col(idCol))
      .withColumn("rank", (monotonically_increasing_id() + 1).cast("long"))
      .select(col("rank"), col(idCol), col("sim"))

  /** Brute-force exact top-k by cosine against a single query vector (the
    * correctness baseline; O(n·d) one pass, query broadcast).
    *
    * @param df         table with (idCol, vecCol)
    * @param queryVec   1-row DataFrame with a `q` array column
    * @return (rank, idCol, sim) rows, rank 1..k
    */
  def bruteForceTopK(df: DataFrame, queryVec: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val sim = cosineSimilarity(col(vecCol), col("q"))
    rankTopK(df.crossJoin(broadcast(queryVec)).withColumn("sim", sim), idCol, k)
  }

  /** IVF-style ANN: assign every vector to its nearest of `centroids`
    * (a small broadcast list — at scale, k-means centroids; any fixed,
    * deterministic set works), then search only the query's cell(s).
    *
    * `ivfAssign` is the index-build step (one pass, one new column to
    * partition/bucket the table by); [[ivfTopK]] probes `nprobe` nearest
    * cells — the recall/latency knob of every IVF index.
    */
  def ivfAssign(vec: Column, centroids: Seq[Seq[Float]]): Column = {
    require(centroids.nonEmpty)
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      struct(euclideanDistance(vec, lit(c.toArray)).as("d"), lit(i).as("cell"))
    }
    array_min(array(dists: _*)).getField("cell")
  }

  def ivfTopK(df: DataFrame, queryVec: DataFrame, idCol: String, vecCol: String,
              k: Int, centroids: Seq[Seq[Float]], nprobe: Int = 1): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.size)
    val assigned = df.withColumn("_cell", ivfAssign(col(vecCol), centroids))
    // the query's nprobe nearest cells, as an exploded (broadcastable) list
    val qCells = queryVec.select(col("q"), posexplode(array(
      centroids.zipWithIndex.map { case (c, i) =>
        struct(euclideanDistance(col("q"), lit(c.toArray)).as("d"), lit(i).as("cell"))
      }: _*)))
      .select(col("q"), col("col.d"), col("col.cell").as("_cell"))
      .orderBy("d").limit(nprobe)
      .select("q", "_cell")
    val sim = cosineSimilarity(col(vecCol), col("q"))
    rankTopK(assigned.join(broadcast(qCells), "_cell").withColumn("sim", sim),
      idCol, k)
  }

  /** LSH-accelerated ANN top-k: restrict the scan to the query's sign bucket
    * (the scale path; falls back to fewer than k results when the bucket is
    * small — callers widen `bits` down / probe neighbor buckets as needed).
    */
  def lshTopK(df: DataFrame, queryVec: DataFrame, idCol: String,
              vecCol: String, k: Int, bits: Int = 8): DataFrame = {
    val bucketed = df.withColumn("_bucket", lshBucket(col(vecCol), bits))
    val q = queryVec.withColumn("_qbucket", lshBucket(col("q"), bits))
    val sim = cosineSimilarity(col(vecCol), col("q"))
    rankTopK(bucketed.join(broadcast(q), col("_bucket") === col("_qbucket"))
      .withColumn("sim", sim), idCol, k)
  }
}
