package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The paged-GET DataSource V2 source: zero-egress tests drive the
  * exact production code path with file:// URLs over the canned
  * WaterML pages (java.net.URL treats file and http uniformly, so
  * only the scheme differs from a live run). */
class HttpObservationsSpec extends AnyFunSuite {
  import TestSpark.spark

  // file:///...state_%s.json template over src/test/resources/waterml
  private val template: String = {
    val xx = getClass.getResource("/waterml/state_xx.json")
    assert(xx != null, "fixture /waterml/state_xx.json missing from classpath")
    xx.toString.replace("state_xx.json", "state_%s.json")
  }

  private def read(states: String, extra: Map[String, String] = Map.empty) = {
    val base = spark.read.format("graft.sources.v2.HttpObservations")
      .option("urlTemplate", template).option("states", states)
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  test("paged fetch flattens timeSeries and skips null elements, matching the batch parser") {
    val viaHttp = read("xx,yy").collect().map(_.toString).sorted
    val dir = Paths.get(new java.net.URI(template.replace("state_%s.json", "")))
    val viaBatch = graft.sources.WaterML
      .timeSeriesOf(spark, dir.toString + "/state_*.json")
      .collect().map(_.toString).sorted
    assert(viaHttp.nonEmpty)
    assert(viaHttp.sameElements(viaBatch),
      s"DSv2 and batch parse disagree:\n${viaHttp.mkString("\n")}\nvs\n${viaBatch.mkString("\n")}")
  }

  test("rows match the WaterML schema and feed the hydro pipeline") {
    val ds = read("xx,yy")
    assert(ds.schema == graft.sources.WaterML.timeSeries)
    assert(graft.pipeline.HydroPipeline.toFeatures(ds).count() > 0)
  }

  test("partition granularity: statesPerPartition groups pages") {
    assert(read("xx,yy").rdd.getNumPartitions == 2)
    assert(read("xx,yy", Map("statesPerPartition" -> "2")).rdd.getNumPartitions == 1)
    // result is partitioning-independent
    assert(read("xx,yy", Map("statesPerPartition" -> "2")).count() == read("xx,yy").count())
  }

  test("a page without timeSeries contributes zero rows") {
    val tmp = Files.createTempDirectory("httpobs")
    Files.writeString(tmp.resolve("state_zz.json"), """{"value": {"queryInfo": {}}}""")
    val df = spark.read.format("graft.sources.v2.HttpObservations")
      .option("urlTemplate", tmp.toUri.toString + "state_%s.json")
      .option("states", "zz").load()
    assert(df.count() == 0)
  }

  test("a malformed page fails loudly with the page and url in the message") {
    val tmp = Files.createTempDirectory("httpobs")
    Files.writeString(tmp.resolve("state_bad.json"), """{"value": {"timeSeries": [""")
    val e = intercept[Exception] {
      spark.read.format("graft.sources.v2.HttpObservations")
        .option("urlTemplate", tmp.toUri.toString + "state_%s.json")
        .option("states", "bad").load().count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("'bad'") && m.contains("state_bad.json")),
      s"no loud page failure in: ${messages(e)}")
  }

  test("top-level column pruning reaches the scan") {
    val df = read("yy").select(col("name"))
    val scan = df.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("name") && !scan.contains("sourceInfo"),
      s"scan not pruned: $scan")
    assert(df.collect().map(_.getString(0)).forall(_.startsWith("USGS:")))
  }

  test("default page list is the reference's 49 states") {
    assert(graft.sources.v2.HttpObservations.DefaultStates.length == 49)
    assert(!graft.sources.v2.HttpObservations.DefaultStates.contains("al"))
  }
}
