package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{RelationalExt, SimilarityOps}

/** q183 windowed funnel and q184 learned-codebook IVF — the window
  * must bind (strictly fewer conversions than the unconstrained
  * funnel) and the learned-IVF serve must agree with brute force on
  * everything inside its probed lists. */
class LearnedIvfSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("the conversion window binds: windowed stage counts <= unconstrained, strictly somewhere") {
    val w = RelationalExt.funnelWindowed(spark, sf)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    val u = RelationalExt.funnel(spark, sf)
      .as[(Long, Long, Long)].collect().head
    assert(w.map(_._1).toSeq == Seq("1_view", "2_click", "3_purchase"))
    val Seq(wv, wc, wp) = w.map(_._2).toSeq
    // view stage is identical (no window constrains the first step)
    assert(wv == u._1)
    assert(wc <= u._2 && wp <= u._3)
    assert(wc < u._2 || wp < u._3,
      "the 1-hour window never excluded a conversion — vacuous constraint")
    // monotone funnel and rate consistency
    assert(wv >= wc && wc >= wp && wp >= 0)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(w(1)._3 == r4(wc.toDouble / wv))
    assert(w(2)._3 == r4(wp.toDouble / wc))
  }

  test("learned IVF: scores are exact brute-force cosines; recall against brute-force top-10 recorded") {
    val served = SimilarityOps.ivfLearnedTopK(spark, sf)
      .as[(Long, Int, Double)].collect().toSeq
    assert(served.size == 10)
    val brute = SimilarityOps.bruteForceTopK(spark, sf, k = 5000)
      .as[(Long, Int, Double)].collect().map(t => t._1 -> t._3).toMap
    served.foreach { case (id, _, cos) =>
      assert(brute(id) == cos, s"served score for $id is not the exact cosine")
    }
    // the IVF contract: high recall on this corpus (probed lists hold
    // the true neighbors' clusters); pin the floor so a codebook
    // regression (e.g. training drift) surfaces here
    val top10 = SimilarityOps.bruteForceTopK(spark, sf, k = 10)
      .as[(Long, Int, Double)].collect().map(_._1).toSet
    val recall = served.count(s => top10(s._1))
    assert(recall >= 5, s"learned-IVF recall@10 collapsed: $recall/10")
  }

  test("learned IVF candidates come only from the probed lists") {
    // every served vec's final-round cluster must be one of the
    // query's two nearest learned centroids — the probe contract
    val asg = SimilarityOps.kmeansLloyd(spark, sf)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._2).toMap
    val served = SimilarityOps.ivfLearnedTopK(spark, sf)
      .as[(Long, Int, Double)].collect()
    val probedClusters = served.map(s => asg(s._1)).toSet
    assert(probedClusters.size <= 2,
      s"served rows span ${probedClusters.size} clusters, nprobe is 2")
  }
}
