package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** q162 SemDeDup at-scale contract (the round-16 verdict's top item):
  * with corpus-proportional k = max(2, ⌈n/target⌉) the within-cluster
  * pair generation stays O(n·target) — which requires that the MAX
  * cluster size stays ≈ target-bounded as the corpus grows, instead
  * of growing linearly with it (the fixed-k failure mode this spec
  * exists to forbid). Pinned across a real 4× row step
  * (sf0.001 → sf0.1 embeddings: 500 → 2000 rows). */
class SemDedupScaleSpec extends AnyFunSuite {
  import TestSpark.spark

  private def profile(dir: String): (Long, Long, Long) = {
    val df = SimilarityOps.semDedup(spark, dir).cache()
    val n = df.count()
    val sizes = df.groupBy(col("clabel")).count()
    val k = sizes.count()
    val mx = sizes.agg(max(col("count"))).head().getLong(0)
    df.unpersist()
    (n, k, mx)
  }

  test("corpus-proportional k: cluster count grows with rows, max cluster size does not") {
    val (n1, k1, m1) = profile("/root/testdata/sf0.001")
    val (n2, k2, m2) = profile("/root/testdata/sf0.1")
    val rowRatio = n2.toDouble / n1
    val maxRatio = m2.toDouble / m1
    info(s"sf0.001: n=$n1 clusters=$k1 maxCluster=$m1")
    info(s"sf0.1:   n=$n2 clusters=$k2 maxCluster=$m2")
    assert(rowRatio >= 4.0, "testdata no longer provides a real row step")
    // the model grows with the corpus…
    assert(k2 > k1, s"cluster count must scale with rows (k1=$k1 k2=$k2)")
    // …so cluster sizes must NOT: max cluster growth ≪ row growth
    assert(maxRatio <= rowRatio / 2.0,
      s"max cluster grew ${maxRatio}× on a ${rowRatio}× row step — " +
        "pair generation is drifting back toward O(n²/k) at fixed k")
  }
}
