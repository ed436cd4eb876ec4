package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps

/** q164 asymmetric containment near-dup — the metric exists to catch
  * subset duplication (a short doc quoted wholesale inside a longer
  * one) that symmetric Jaccard scores below any sane threshold. The
  * synthetic corpus has no subset dups (its near-dups are full-doc
  * perturbations, so every containment hit is also a Jaccard hit);
  * the asymmetric catch is therefore proven on a constructed
  * quote-inclusion pair, and the real-data tests pin the
  * containment ≥ jaccard ordering and the shared candidate build. */
class ContainmentSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("containment >= jaccard on every emitted pair; decisions on the rounded value") {
    val rows = DedupOps.nearDupContainment(spark, sf)
      .select($"containment", $"jaccard").as[(Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (c, j) =>
      assert(c >= j, s"containment $c < jaccard $j")
      assert(c >= 0.8 && c <= 1.0)
    }
  }

  test("containment pairs share q25's candidate build: every high-jaccard pair appears") {
    // J >= t ⇒ C >= t (min ≤ union), and both run over the identical
    // min-md5-blocked candidate population — so the Jaccard-verified
    // pairs at the containment threshold must be a subset of the
    // containment output. If blocking or shingling ever diverges
    // between the two, this breaks first.
    val cont = DedupOps.nearDupContainment(spark, sf, threshold = 0.8)
      .select($"doc_a", $"doc_b")
    val jacc = DedupOps.nearDupNgram(spark, sf, threshold = 0.8)
      .select($"doc_a", $"doc_b")
    assert(jacc.except(cont).count() == 0)
  }

  test("a wholesale quote inclusion is caught at containment 1.0 while Jaccard misses it") {
    // doc 2 is a contiguous 12-word segment of doc 1, arranged so
    // doc 1's corpus-global min-md5 shingle lies inside the quoted
    // segment (the pair blocks into one bucket): containment = 1.0
    // exactly (10 of 10 shingles contained), Jaccard = 10/28 = 0.3571
    // — below q25's 0.5 threshold. This is the Broder containment
    // case in miniature.
    val long = "ten three mike whiskey zulu sierra seven two papa alpha " +
      "bravo charlie delta echo foxtrot golf hotel india juliet kilo " +
      "lima victor eight quebec four xray nine november tango one"
    val seg = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val dir = java.nio.file.Files.createTempDirectory("graft-containment").toString
    Seq((1L, long), (2L, seg), (3L, "unrelated words entirely elsewhere"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DedupOps.nearDupContainment(spark, dir)
      .select($"doc_a", $"doc_b", $"containment", $"jaccard")
      .as[(Long, Long, Double, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0, 0.3571)), s"got $got")
    // and the Jaccard family genuinely misses it at its default threshold
    assert(DedupOps.nearDupNgram(spark, dir).count() == 0)
  }
}
