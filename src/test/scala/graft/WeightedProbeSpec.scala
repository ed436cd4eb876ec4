package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{DedupOps, SimilarityOps}

/** q181 multi-probe LSH and q182 IDF-weighted containment — the
  * economy and discrimination properties each exists for. */
class WeightedProbeSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("multi-probe reads a subset of the 1-ball probes and scores exactly") {
    val mp = SimilarityOps.multiProbeTopK(spark, sf)
      .as[(Long, Int, Double)].collect().toSeq
    assert(mp.size == 10)
    // every multi-probe hit exists in the full Hamming-1-ball result
    // population with the IDENTICAL exact cosine (annTopK probes a
    // superset of buckets, so its candidate pool contains ours)
    val ball = SimilarityOps.annTopK(spark, sf, k = 1000)
      .as[(Long, Int, Double)].collect().toSeq.toMap2
    mp.foreach { case (id, label, cos) =>
      assert(ball.contains(id), s"vec $id not in the 1-ball population")
      assert(ball(id) == ((label, cos)), s"score drift for vec $id")
    }
    // and the cosines are the true brute-force values (probing cannot
    // change a score, only candidate membership)
    val brute = SimilarityOps.bruteForceTopK(spark, sf, k = 5000)
      .as[(Long, Int, Double)].collect().toSeq.toMap2
    mp.foreach { case (id, _, cos) => assert(brute(id)._2 == cos) }
  }

  implicit private class Map2[A, B, C](s: Seq[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = s.map(t => t._1 -> ((t._2, t._3))).toMap
  }

  test("IDF weighting discounts boilerplate: unweighted hit, weighted miss on a crafted corpus") {
    // 8 docs share a long boilerplate block (its grams become common →
    // low idf). X and Y are boilerplate + disjoint unique halves:
    // unweighted containment is high (the shared block dominates the
    // count) but the WEIGHTED score collapses because the shared grams
    // are exactly the low-idf ones — the case the metric exists for.
    val boiler = "alpha bravo charlie delta echo foxtrot golf hotel india " +
      "juliet kilo lima mike november oscar papa quebec romeo sierra tango"
    // 8-word unique halves: the shared block is ~20 grams at idf 1.0
    // (df = all docs) while each doc adds ~10 grams at idf ≈ 2.5, so
    // unweighted C ≈ 20/30 ≥ 0.6 but weighted ≈ 20/(20+25) < 0.6
    val uniq = (0 until 8).map(i => (0 until 8).map(j => s"u${i}x$j").mkString(" "))
    val dir = java.nio.file.Files.createTempDirectory("graft-widf").toString
    uniq.zipWithIndex.map { case (u, i) => (i.toLong + 1L, s"$boiler $u") }
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // unweighted containment finds the boilerplate-dominated pairs
    val unweighted = DedupOps.nearDupContainment(spark, dir, threshold = 0.6).count()
    assert(unweighted > 0, "crafted corpus produced no unweighted hits")
    // IDF weighting kills them: the shared grams are the common ones
    val weighted = DedupOps.nearDupWeighted(spark, dir, threshold = 0.6).count()
    assert(weighted < unweighted,
      s"IDF weighting discounted nothing: $weighted vs $unweighted")
  }

  test("weighted and unweighted agree on real data's rare-content duplicates") {
    // the sf corpus's near-dups are full-doc perturbations (shared
    // content IS the rare content), so the weighted metric must keep
    // finding them — the positive control against over-discounting
    val w = DedupOps.nearDupWeighted(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    val c = DedupOps.nearDupContainment(spark, sf)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(w.nonEmpty)
    assert((w intersect c).nonEmpty)
  }
}
