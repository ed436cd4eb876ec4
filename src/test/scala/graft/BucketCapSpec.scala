package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps

/** The stop-key bucket cap (DedupOps.bucketPairs maxBucket) — the one
  * guard between the near-dup family and O(bucket²) pair blowup at
  * 100 TB. A synthetic stop-key bucket (one blocking value shared by
  * more members than the cap) must be excluded WHOLESALE while every
  * other bucket's pairs survive untouched; on real data the capped
  * query must be a strict, verified subset of the uncapped one. */
object BucketCapSpec {
  case class M(doc_id: Long, sh: Seq[Long])
  case class B(minsh: String, members: Seq[M])
}

class BucketCapSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._
  import BucketCapSpec._

  // one stop-key bucket of 5 (over any cap ≤ 4), two normal buckets,
  // one singleton (never pairs regardless of cap)
  private val stop = (1L to 5L).map(i => M(i, Seq(i, 100L)))
  private val buckets = Seq(
    B("stopkey", stop),
    B("ok1", Seq(M(10, Seq(5)), M(11, Seq(5)))),
    B("ok2", Seq(M(20, Seq(7)), M(21, Seq(7)), M(22, Seq(8)))),
    B("solo", Seq(M(30, Seq(9))))).toDF

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select($"x.doc_id", $"y.doc_id").as[(Long, Long)].collect().toSet

  test("capped candidate pairs are a subset of the uncapped pairs") {
    val uncapped = pairSet(DedupOps.bucketPairs(buckets))
    val capped = pairSet(DedupOps.bucketPairs(buckets, Some(3)))
    assert(capped.subsetOf(uncapped))
    // uncapped really emits the quadratic stop-bucket population:
    // C(5,2) + C(2,2)-form pairs = 10 + 1 + 3
    assert(uncapped.size == 14)
  }

  test("a stop-key bucket past the cap is excluded wholesale; every other pair survives") {
    val capped = pairSet(DedupOps.bucketPairs(buckets, Some(3)))
    val stopIds = stop.map(_.doc_id).toSet
    assert(capped.forall { case (a, b) => !stopIds(a) && !stopIds(b) },
      s"stop-key bucket leaked pairs: $capped")
    assert(capped == Set((10L, 11L), (20L, 21L), (20L, 22L), (21L, 22L)))
  }

  test("cap at exactly the bucket size admits the bucket (boundary is inclusive)") {
    val capped = pairSet(DedupOps.bucketPairs(buckets, Some(5)))
    assert(capped == pairSet(DedupOps.bucketPairs(buckets)))
  }

  test("nearDupNgramCapped is a strict verified subset of nearDupNgram on real data") {
    val uncapped = DedupOps.nearDupNgram(spark, sf)
    val capped = DedupOps.nearDupNgramCapped(spark, sf) // maxBucket = 3
    // subset: every capped pair exists uncapped with the same jaccard
    assert(capped.except(uncapped).count() == 0)
    // strict: sf0.001 has min-shingle buckets of size 4 and 5 whose
    // verified pairs the cap must drop — if this ever equals, the cap
    // silently stopped engaging (the negative control)
    assert(capped.count() < uncapped.count())
    assert(capped.count() > 0)
  }

  test("nearDupEditCapped is a strict verified subset of nearDupEdit on real data") {
    val uncapped = DedupOps.nearDupEdit(spark, sf)
    val capped = DedupOps.nearDupEditCapped(spark, sf) // maxBlock = 2
    // subset: every capped pair exists uncapped with the same distance
    assert(capped.except(uncapped).count() == 0)
    // strict: sf0.001 has a 16-char-prefix block of 4 docs whose 9
    // verified pairs the cap must drop — equality means the cap
    // silently stopped engaging (the negative control)
    assert(capped.count() < uncapped.count())
    assert(capped.count() > 0)
  }

  test("a boilerplate-prefix corpus is excluded wholesale by the edit block cap") {
    // the 100 TB failure mode in miniature: most docs open with the
    // same 16+ chars (licence header), so they all share one block
    val boiler = (1L to 6L).map(i =>
      (i, s"COPYRIGHT 2024 ACME corpus page number $i"))
    // differ past char 16, so both share the "unique alpha doc" block
    val normal = Seq((10L, s"unique alpha document nine"), (11L, s"unique alpha document nina"))
    val dir = java.nio.file.Files.createTempDirectory("graft-editcap").toString
    (boiler ++ normal).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val capped = DedupOps.nearDupEditCapped(spark, dir)
    val got = capped.select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    // boilerplate block (6 > cap 2) contributes nothing; the normal
    // 1-char-apart pair survives with its distance intact
    assert(got == Set((10L, 11L)), s"got $got")
    assert(capped.filter($"doc_a" === 10L).select($"dist").as[Long].head() == 1L)
    // and uncapped on the same corpus would have emitted the O(block²)
    // boilerplate pairs — the cap is what removed them
    assert(DedupOps.nearDupEdit(spark, dir).count() == 15 + 1)
  }

  test("hardNegativesCapped keeps exactly the per-anchor top-m by (jaccard desc, doc_b)") {
    import org.apache.spark.sql.expressions.Window
    val m = 2
    val uncapped = DedupOps.hardNegatives(spark, sf)
    val capped = DedupOps.hardNegativesCapped(spark, sf, m = m)
    // bound: never more than m rows per anchor
    assert(capped.groupBy($"doc_a").count().filter($"count" > m).count() == 0)
    // exactness: identical to re-ranking the uncapped population
    val w = Window.partitionBy($"doc_a").orderBy($"jaccard".desc, $"doc_b")
    val expected = uncapped
      .withColumn("neg_rank", row_number().over(w).cast("bigint"))
      .filter($"neg_rank" <= m)
    assert(capped.except(expected).count() == 0)
    assert(expected.except(capped).count() == 0)
    assert(capped.count() > 0)
  }
}
