package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** VERDICT r16 item 5: the ANN recall/read-budget trade MEASURED, not
  * asserted. q30 (Hamming-1 LSH), q181 (margin-guided multi-probe) and
  * q184 (learned-codebook IVF) each pin a point recall floor in their
  * own specs; this sweep runs the knobs — t ∈ {1,2,3} probed flips for
  * multi-probe, nprobe ∈ {1,2,4} coarse clusters for IVF — against the
  * exact q29 brute-force top-k and records the whole curve, so a knob
  * change that silently trades recall shows up as a failed floor or a
  * broken monotonicity invariant rather than a mystery on real data.
  *
  * The structural invariants hold by construction and are asserted as
  * such:
  *  - multi-probe's flip set is a PREFIX of the margin-sorted plane
  *    list and IVF's probe set a prefix of the distance-sorted
  *    cluster list, so candidate sets are NESTED as the knob grows;
  *    under the deterministic (cos desc, vec_id) total order a nested
  *    candidate superset can only improve recall@k — recall is
  *    monotone non-decreasing in t and nprobe;
  *  - q30's full Hamming-1 ball is a superset of every t-flip probe
  *    set over the same planes, so its recall bounds the multi-probe
  *    curve from above;
  *  - probing every cluster (nprobe = kClusters) reads the whole
  *    corpus: the IVF result must EQUAL brute force row for row — the
  *    curve's right endpoint is exactness, not an estimate.
  */
class RecallSweepSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private val K = 10
  private val queryIds = Seq(0L, 7L, 23L)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.collect().map(_.getLong(0)).toSeq

  private def recall(ann: Seq[Long], exact: Seq[Long]): Double =
    ann.toSet.intersect(exact.toSet).size.toDouble / exact.size

  test("recall@10 curve: multi-probe t and IVF nprobe, vs exact top-k") {
    val rows = queryIds.map { q =>
      val exact = ids(SimilarityOps.bruteForceTopK(spark, sf, q, K))
      assert(exact.size == K, s"query $q: brute force returned ${exact.size} rows")
      val mp = Seq(1, 2, 3).map(t =>
        t -> recall(ids(SimilarityOps.multiProbeTopK(spark, sf, q, K, t = t)), exact))
      val ball = recall(ids(SimilarityOps.annTopK(spark, sf, q, K)), exact)
      val ivf = Seq(1, 2, 4).map(p =>
        p -> recall(ids(SimilarityOps.ivfLearnedTopK(spark, sf, q, K, nprobe = p)), exact))
      (q, mp, ball, ivf)
    }
    // the measured curve, one line per query — the spec's deliverable
    info(f"${"query"}%-6s ${"mp t=1"}%7s ${"t=2"}%7s ${"t=3"}%7s ${"1-ball"}%7s " +
      f"${"ivf p=1"}%8s ${"p=2"}%7s ${"p=4"}%7s")
    rows.foreach { case (q, mp, ball, ivf) =>
      info(f"q=$q%-4d ${mp(0)._2}%7.2f ${mp(1)._2}%7.2f ${mp(2)._2}%7.2f " +
        f"$ball%7.2f ${ivf(0)._2}%8.2f ${ivf(1)._2}%7.2f ${ivf(2)._2}%7.2f")
    }
    rows.foreach { case (q, mp, ball, ivf) =>
      // nested-prefix probe sets => monotone recall in the knob
      assert(mp.map(_._2) == mp.map(_._2).sorted,
        s"query $q: multi-probe recall not monotone in t: $mp")
      assert(ivf.map(_._2) == ivf.map(_._2).sorted,
        s"query $q: IVF recall not monotone in nprobe: $ivf")
      // the full Hamming-1 ball bounds every t-prefix from above
      mp.foreach { case (t, r) =>
        assert(ball >= r, s"query $q: 1-ball recall $ball below t=$t recall $r")
      }
    }
    // aggregate floors over the query set, pinned from the measured
    // sf0.001 curve (a knob or hashing change that degrades recall
    // below these trips here before it reaches an oracle). Measured
    // 2026-08: mp t={1,2,3} mean {0.10, 0.13, 0.20}, 1-ball 0.33; ivf
    // p={1,2,4} mean {0.70, 0.80, 0.93}. The gap IS the finding: at
    // 6 random hyperplanes over a small corpus, sign-LSH fragments
    // true neighborhoods across buckets (64 buckets, ~tens of vectors
    // each), while the data-adapted k-means codebook keeps them
    // together at the same read budget — the reason q184's learned
    // IVF, not q30's LSH ball, is the scale path for ANN serving.
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    val mpT2 = mean(rows.map(_._2.find(_._1 == 2).get._2))
    val ivfP2 = mean(rows.map(_._4.find(_._1 == 2).get._2))
    assert(mpT2 >= 0.05, f"mean multi-probe t=2 recall $mpT2%.2f under floor 0.05")
    assert(ivfP2 >= 0.5, f"mean IVF nprobe=2 recall $ivfP2%.2f under floor 0.50")
  }

  test("IVF with nprobe = kClusters reads everything and equals brute force exactly") {
    queryIds.foreach { q =>
      def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getInt(1), r.getDouble(2))
      val bf = SimilarityOps.bruteForceTopK(spark, sf, q, K).collect().map(key).toSeq
      val all = SimilarityOps.ivfLearnedTopK(spark, sf, q, K, nprobe = 8, kClusters = 8)
        .collect().map(key).toSeq
      assert(all == bf, s"query $q: full-probe IVF diverges from brute force")
    }
  }
}
