package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 synthetic-observations source: parallel
  * deterministic generation, column pruning, and compatibility with
  * the hydro pipeline. */
class SyntheticSourceSpec extends AnyFunSuite {
  import TestSpark.spark

  private def read(sites: Int, parts: Int = 4) =
    spark.read.format("graft.sources.v2.SyntheticObservations")
      .option("sites", sites).option("partitions", parts).load()

  test("generates 2 series per site across partitions") {
    assert(read(100, 4).count() == 200)
    assert(read(7, 3).count() == 14) // uneven split covers every site
  }

  test("deterministic: same seed same rows, independent of partitioning") {
    val a = read(50, 2).collect().map(_.toString).sorted
    val b = read(50, 5).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("rows match the WaterML time-series schema and feed the pipeline") {
    val ds = read(30)
    assert(ds.schema == graft.sources.WaterML.timeSeries)
    val merged = graft.pipeline.HydroPipeline.mergeSites(
      graft.pipeline.HydroPipeline.toFeatures(ds))
    assert(merged.count() == 30) // one merged row per site
    // both variable branches populated for every site
    assert(merged.filter(
      col("properties.streamFlow.variableCode").isNull ||
      col("properties.gageHeight.variableCode").isNull).count() == 0)
  }

  test("top-level column pruning reaches the scan") {
    val df = read(10).select(col("name"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("name") && !scan.contains("sourceInfo"),
      s"scan not pruned: $scan")
  }
}
