package graft.queries

import graft.SparkSpec

/** The end-to-end prep pipeline must produce IDENTICAL output whether its
  * intermediate corpus is pinned via localCheckpoint (default) or spilled
  * to a temp Graft table (`graft.pipeline.spill=table`, the 100 TB shape:
  * durable across executor loss, no storage-memory contention).
  */
class PipelineSpillSpec extends SparkSpec {

  test("x_pipeline: spill=table output matches the checkpoint default") {
    val d = "/root/testdata/sf0.001"
    val run = Extensions.entries.find(_._1 == "x_pipeline").get._2
    val viaCheckpoint = run(spark, d).collect().toSeq
    spark.conf.set("graft.pipeline.spill", "table")
    try {
      val viaTable = run(spark, d).collect().toSeq
      assert(viaTable == viaCheckpoint)
      assert(viaTable.nonEmpty)
    } finally spark.conf.unset("graft.pipeline.spill")
  }
}
