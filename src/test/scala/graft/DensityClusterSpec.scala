package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** q242 DBSCAN-style density clustering. Two obligations:
  * (1) hand-computed DBSCAN roles on a synthetic geometry — a 3-core
  * chain with a border tail, a sub-minPts pair (edge but no core →
  * both noise), a blocked twin (identical vector, different label →
  * noise), and a single-core star (isolated-core self-pair path),
  * (2) role/label invariants on the real corpus: core ⇔ degree ≥
  * minPts, noise ⇔ cluster −1, every cluster label is a core's id
  * and the minimum of its members. */
class DensityClusterSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private def vec(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  test("synthetic geometry matches hand-computed DBSCAN roles") {
    // threshold 0.9 ≈ 25.8° aperture; minPts 2
    val e = Seq(
      // label 0: cores {1,2,3} (chain + chord), border 4 via 3, noise 5
      (1L, vec(0), 0), (2L, vec(10), 0), (3L, vec(20), 0),
      (4L, vec(40), 0), (5L, vec(90), 0),
      // label 1: one edge, neither endpoint reaches minPts → both noise
      (6L, vec(0), 1), (7L, vec(5), 1),
      // label 2: identical direction to id 1 but blocked by label → noise
      (8L, vec(0), 2),
      // label 3: star — 9 is the only core; 10/11 are its borders
      (9L, vec(13), 3), (10L, vec(0), 3), (11L, vec(26), 3)
    ).toDF("vec_id", "embedding", "label")
    val got = SimilarityOps.densityClustersOf(e, threshold = 0.9, minPts = 2)
      .select($"vec_id", $"n_neighbors", $"role", $"cluster")
      .as[(Long, Long, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = Map(
      1L -> ((2L, "core", 1L)), 2L -> ((2L, "core", 1L)), 3L -> ((3L, "core", 1L)),
      4L -> ((1L, "border", 1L)), 5L -> ((0L, "noise", -1L)),
      6L -> ((1L, "noise", -1L)), 7L -> ((1L, "noise", -1L)),
      8L -> ((0L, "noise", -1L)),
      9L -> ((2L, "core", 9L)), 10L -> ((1L, "border", 9L)), 11L -> ((1L, "border", 9L)))
    assert(got == want)
  }

  test("stop-block cap: boundary inclusion, wholesale exclusion, label-local identity") {
    // group sizes on the synthetic geometry: label 0 → 5 members,
    // label 1 → 2, label 2 → 1, label 3 → 3
    val e = Seq(
      (1L, vec(0), 0), (2L, vec(10), 0), (3L, vec(20), 0),
      (4L, vec(40), 0), (5L, vec(90), 0),
      (6L, vec(0), 1), (7L, vec(5), 1),
      (8L, vec(0), 2),
      (9L, vec(13), 3), (10L, vec(0), 3), (11L, vec(26), 3)
    ).toDF("vec_id", "embedding", "label")
    def run(cap: Option[Int]) =
      SimilarityOps.densityClustersOf(e, threshold = 0.9, minPts = 2, maxLabel = cap)
        .select($"vec_id", $"label", $"n_neighbors", $"role", $"cluster")
        .as[(Long, Int, Long, String, Long)].collect().toSet
    val uncapped = run(None)
    // boundary: cap == largest group ⇒ nothing excluded, bit-identical
    assert(run(Some(5)) == uncapped, "cap at the boundary must admit every label")
    // cap one below: label 0 (5 members) excluded WHOLESALE — its
    // members all read degree-0 noise; every other label's rows are
    // identical to the uncapped run (edges never cross labels)
    val capped = run(Some(4))
    val (cap0, capRest) = capped.partition(_._2 == 0)
    val (unc0, uncRest) = uncapped.partition(_._2 == 0)
    assert(capRest == uncRest, "admitted labels must be label-local identical")
    assert(cap0.map(_._1) == unc0.map(_._1), "excluded label keeps all its rows")
    assert(cap0.forall(r => r._3 == 0L && r._4 == "noise" && r._5 == -1L),
      "excluded label's members must be degree-0 noise")
    // subset: the capped run's non-noise rows are a subset of the
    // uncapped run's (the recall-loss-only contract)
    assert(capped.filter(_._4 != "noise").subsetOf(uncapped.filter(_._4 != "noise")))
  }

  test("real-corpus invariants: role gates, noise labels, min-member clusters") {
    val out = SimilarityOps.densityClusters(spark, sf).localCheckpoint(false)
    assert(out.filter(($"role" === "core") =!= ($"n_neighbors" >= 3)).count() == 0,
      "core ⇔ degree ≥ minPts violated")
    assert(out.filter(($"role" === "noise") =!= ($"cluster" === -1L)).count() == 0,
      "noise ⇔ cluster −1 violated")
    // every cluster label is the id of a core member and the minimum
    // CORE id labeled with it (borders may carry smaller ids — they
    // attach, they don't found)
    val coreIds = out.filter($"role" === "core")
      .select($"vec_id").as[Long].collect().toSet
    val labels = out.filter($"role" === "core")
      .groupBy($"cluster").agg(min($"vec_id").as("mn"))
      .as[(Long, Long)].collect()
    labels.foreach { case (cl, mn) =>
      assert(coreIds.contains(cl), s"cluster label $cl is not a core id")
      assert(cl == mn, s"cluster label $cl is not its min core member $mn")
    }
    // border labels always reference a founded (core) cluster
    val borderLabels = out.filter($"role" === "border")
      .select($"cluster").distinct().as[Long].collect()
    assert(borderLabels.forall(labels.map(_._1).toSet))
    assert(out.filter($"role" === "core").count() > 0, "no cores found")
  }
}
