package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** q169 Lloyd k-means training — the broadcast-model/one-shuffle
  * Spark loop must equal an independent sequential Lloyd
  * implementation from the raw embeddings, and training must
  * demonstrably move the model (assignments change after round 1) or
  * the loop is a disguised nearest-seed assignment (q87's stand-in
  * shape, which this operator exists to upgrade). */
class KMeansSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private val k = 8
  private val iters = 3

  private lazy val vecs: Seq[(Long, Array[Double])] =
    Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) => (id, e.map(_.toDouble)) }.toSeq.sortBy(_._1)

  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Sequential reference: seed from vec_id < k, `iters` assignment
    * passes with an update after each but the last; (d2, cl) ties to
    * the lowest cluster id; empty clusters vanish. */
  private def reference(rounds: Int): Map[Long, Long] = {
    var cents: Seq[(Long, Array[Double])] =
      vecs.filter(_._1 < k).map { case (id, e) => (id, e) }
    def assign(): Map[Long, Long] =
      vecs.map { case (id, e) =>
        id -> cents.map { case (cl, c) => (d2(e, c), cl) }.minBy(x => (x._1, x._2))._2
      }.toMap
    for (_ <- 1 until rounds) {
      val asg = assign()
      val byCl = vecs.groupBy { case (id, _) => asg(id) }
      cents = byCl.toSeq.sortBy(_._1).map { case (cl, members) =>
        val dim = members.head._2.length
        val m = Array.tabulate(dim)(i => members.map(_._2(i)).sum / members.size)
        (cl, m)
      }
    }
    assign()
  }

  private lazy val got: Map[Long, Long] =
    SimilarityOps.kmeansLloyd(spark, sf, k = k, iters = iters)
      .select($"vec_id", $"cluster").as[(Long, Long)].collect().toMap

  test("distributed Lloyd equals the independent sequential reference") {
    val want = reference(iters)
    assert(got.size == vecs.size)
    val diff = got.collect { case (id, cl) if want(id) != cl => (id, cl, want(id)) }
    assert(diff.isEmpty, s"first diffs: ${diff.take(5)}")
  }

  test("training moves the model: round-3 assignments differ from nearest-seed") {
    val seedAssign = reference(1)
    assert(got != seedAssign,
      "3-round Lloyd equals the nearest-seed assignment — centroid " +
        "updates never changed a single assignment on this corpus")
    // and the clustering is non-degenerate: more than one cluster survives
    assert(got.values.toSet.size > 1)
  }
}
