package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.HydroPipeline
import graft.sources.WaterML

/** The incremental re-reduce path (reference `out:{reduce:'joined'}`,
  * mongodb.js:96-115): per-site state is associative and idempotent,
  * so chunked ingestion, re-delivered batches, and any merge order all
  * converge to the one-shot merge. */
class IncrementalMergeSpec extends AnyFunSuite {
  import TestSpark.spark

  private val fixtures = "src/test/resources/waterml"
  private lazy val features =
    HydroPipeline.toFeatures(WaterML.timeSeriesOf(spark, fixtures))
  // split features by series-id hash: a site's two variable series can
  // land in different chunks, exercising the cross-batch merge
  private def chunk(i: Int): DataFrame =
    features.filter(pmod(xxhash64(col("properties.id")), lit(2)) === i)
  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("re-reduce over chunked batches equals the one-shot merge, in either order") {
    val oneShot = rows(HydroPipeline.mergeSites(features))
    val s0 = HydroPipeline.mergeSitesState(chunk(0))
    val s1 = HydroPipeline.mergeSitesState(chunk(1))
    assert(rows(HydroPipeline.finalizeState(HydroPipeline.mergeStates(s0, s1))) == oneShot)
    assert(rows(HydroPipeline.finalizeState(HydroPipeline.mergeStates(s1, s0))) == oneShot)
    assert(oneShot.nonEmpty)
  }

  test("re-reduce is idempotent: merging a batch twice changes nothing") {
    val full = HydroPipeline.mergeSitesState(features)
    val again = HydroPipeline.mergeStates(full, HydroPipeline.mergeSitesState(chunk(1)))
    assert(rows(again) == rows(full))
  }

  test("upsert recovers state from a crash between the publish renames") {
    val dir = Files.createTempDirectory("merge-crash").resolve("joined").toString
    HydroPipeline.upsertMergedState(spark, dir, chunk(0))
    // simulate a crash that died after retiring the published state
    // but before publishing the staging dir: the state lives only at
    // `.old` and the increment (chunk 1) will be re-delivered
    val f = new java.io.File(dir)
    assert(f.renameTo(new java.io.File(dir + ".old")))
    HydroPipeline.upsertMergedState(spark, dir, chunk(1))
    // chunk(0)'s sites must have been restored, not silently dropped
    val oneShot = rows(HydroPipeline.mergeSites(features))
    assert(rows(HydroPipeline.mergedFromState(spark, dir)) == oneShot)
  }

  test("parquet upsert converges to the one-shot merge and survives re-delivery") {
    val dir = Files.createTempDirectory("merge-state").resolve("joined").toString
    HydroPipeline.upsertMergedState(spark, dir, chunk(0))
    HydroPipeline.upsertMergedState(spark, dir, chunk(1))
    val oneShot = rows(HydroPipeline.mergeSites(features))
    assert(rows(HydroPipeline.mergedFromState(spark, dir)) == oneShot)
    // re-delivering an already-merged batch is a no-op
    HydroPipeline.upsertMergedState(spark, dir, chunk(1))
    assert(rows(HydroPipeline.mergedFromState(spark, dir)) == oneShot)
    // the two-phase swap leaves no staging/retired directories behind
    val parent = new java.io.File(dir).getParentFile.list().toSet
    assert(parent == Set("joined"), s"leftover dirs: $parent")
  }
}
