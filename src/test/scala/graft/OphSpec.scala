package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps

/** q243 one-permutation-hashing MinHash. Three obligations:
  * (1) identical docs ALWAYS collide (identical signature → identical
  * band buckets — the J = 1 guarantee LSH banding gives for free),
  * including short docs whose signature is mostly rotation-densified,
  * (2) no false positives: every emitted pair verifies at J ≥ τ,
  * (3) soundness vs exact recall on the real corpus: the OPH pair set
  * (strictly above the rounding boundary) is contained in the
  * prefix-join exact-recall set at the same τ. */
class OphSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("exact duplicates always collide; disjoint docs never verify") {
    val long1 = (1 to 40).map(i => s"alpha bravo charlie token$i").mkString(" ")
    val other = (1 to 40).map(i => s"delta echo foxtrot word$i").mkString(" ")
    val short1 = "tiny five word doc here"
    val docs = Seq(
      (1L, long1), (2L, long1),   // exact dup, many shingles
      (3L, other),                // disjoint from everything
      (4L, short1), (5L, short1)  // exact dup, 3 shingles → 13+ empty bins
    ).toDF("doc_id", "text")
    val got = DedupOps.nearDupOPHOf(docs, threshold = 0.5, bins = 16, bands = 4)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0), (4L, 5L, 1.0)))
  }

  test("real corpus: verified pairs sit inside the exact-recall set") {
    val oph = DedupOps.nearDupOPH(spark, sf)
      .select($"doc_a", $"doc_b", $"jaccard")
      .as[(Long, Long, Double)].collect()
    assert(oph.nonEmpty, "OPH found nothing on the real corpus")
    assert(oph.forall(_._3 >= 0.5), "emitted pair below threshold")
    // prefixJoinNearDup at τ = 1/2 has guaranteed recall for true
    // J ≥ 1/2; OPH pairs at the display-rounding boundary (exactly
    // 0.5 after round-at-4) may have true J just below τ, so compare
    // strictly above it
    val exact = DedupOps.prefixJoinNearDup(spark, sf, num = 1, den = 2)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val above = oph.filter(_._3 > 0.5).map(p => (p._1, p._2)).toSet
    assert(above.subsetOf(exact),
      s"OPH emitted pairs outside the exact set: ${above.diff(exact).take(3)}")
  }
}
