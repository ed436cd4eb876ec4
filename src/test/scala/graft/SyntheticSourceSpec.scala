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

  test("ungrouped count(*) pushes down completely: O(1) even at a two-billion-row configuration") {
    // plan proof FIRST on a small config — if the pushdown is absent
    // we fail here instead of generating 2B rows below
    val small = read(10).groupBy().count()
    val smallPlan = small.queryExecution.executedPlan.toString
    assert(smallPlan.contains("PushedAggregates: [COUNT(*)]"),
      s"count(*) not pushed to the scan:\n$smallPlan")
    assert(small.collect().map(_.getLong(0)).toSeq == Seq(20L))
    // now the scale proof: a row count no generator loop could answer
    // in test time returns instantly from the pushed scan
    val big = spark.read.format("graft.sources.v2.SyntheticObservations")
      .option("sites", 1000000000L).option("partitions", 4).load()
    assert(big.count() == 2000000000L)
    // negative control: a residual filter blocks the pushdown (Spark
    // only offers an aggregate once the whole subtree is pushed), so
    // the generating scan + real aggregation run and the count is
    // filter-dependent — the assertion above cannot pass vacuously
    val filtered = read(10).filter(col("name").isNotNull).groupBy().count()
    val fPlan = filtered.queryExecution.executedPlan.toString
    assert(!fPlan.contains("PushedAggregates"),
      s"filtered count unexpectedly pushed:\n$fPlan")
    assert(fPlan.contains("HashAggregate") || fPlan.contains("SortAggregate"),
      s"filtered count lost its aggregation node:\n$fPlan")
    assert(filtered.collect().map(_.getLong(0)).toSeq == Seq(20L))
  }
}
