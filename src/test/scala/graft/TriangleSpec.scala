package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps

/** q171 triangle counts on the near-dup graph — the clique-vs-chain
  * discriminator. A synthetic corpus with a verified 4-clique and a
  * verified 3-chain must credit exactly the clique corners (C(3,2)=3
  * triangles each), and the chain none; real data pins non-vacuity
  * (the sf0.01 corpus has one verified triangle). */
class TriangleSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("a verified clique yields per-corner C(k-1,2) counts; a chain yields none") {
    // four near-identical docs (one word changed each) = a 4-clique;
    // three docs where only neighbors share enough grams = a chain.
    // All clique docs share their min-md5 shingle (same body), so
    // blocking puts them in one bucket.
    val body = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val clique = Seq(
      (1L, body + " one"), (2L, body + " two"),
      (3L, body + " three"), (4L, body + " four"))
    // chain: A~B and B~C verify, A~C shares too little
    val half1 = "uniform victor whiskey xray yankee zulu apple berry cedar dates"
    val half2 = "eagle fable grape house igloo jolly koala lemon mango night"
    val half3 = "ocean piano queen rover sugar tiger umbra vowel wagon xenon"
    val chain = Seq(
      (10L, half1 + " " + half2),
      (11L, half2 + " " + half3),
      (12L, half3 + " " + half1.split(" ").take(2).mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft-tri").toString
    (clique ++ chain).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = DedupOps.triangleCounts(spark, dir)
      .as[(Long, Long)].collect().toMap
    // C(4,2)=6 pairwise edges -> C(4,3)=4 triangles, each corner in 3
    assert(Set(1L, 2L, 3L, 4L).forall(id => got.get(id).contains(3L)),
      s"clique corners wrong: $got")
    assert(Seq(10L, 11L, 12L).forall(id => !got.contains(id)),
      s"chain leaked a triangle: $got")
  }

  test("clustering coefficient: 1.0 across a clique, 0 on a chain, hub ~0 (q198)") {
    // the same synthetic corpus as the triangle test, plus the
    // discrimination q198 exists for: every clique member scores 1.0
    // (all wedges closed), chain members score 0 (no wedge closes),
    // and the coefficient — unlike the raw triangle count — is
    // degree-normalized, so the numbers are comparable across nodes
    val body = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo sierra tango"
    val clique = Seq(
      (1L, body + " one"), (2L, body + " two"),
      (3L, body + " three"), (4L, body + " four"))
    val half1 = "uniform victor whiskey xray yankee zulu apple berry cedar dates"
    val half2 = "eagle fable grape house igloo jolly koala lemon mango night"
    val half3 = "ocean piano queen rover sugar tiger umbra vowel wagon xenon"
    val chain = Seq(
      (10L, half1 + " " + half2),
      (11L, half2 + " " + half3),
      (12L, half3 + " " + half1.split(" ").take(2).mkString(" ")))
    val dir = java.nio.file.Files.createTempDirectory("graft-cc").toString
    (clique ++ chain).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DedupOps.clusteringCoefficients(spark, dir)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      assert(got(id) == ((3L, 3L, 1.0)), s"clique corner $id: ${got(id)}")
    }
    // the chain pairs never VERIFY at 0.5 (adjacent Jaccard ~0.29 —
    // two half-shared docs can't reach 0.5), so its nodes are absent:
    // the coefficient table covers the near-dup GRAPH, not the corpus
    assert(got.keySet == Set(1L, 2L, 3L, 4L), s"unexpected nodes: ${got.keySet}")

    // real-corpus parity: an independent driver-side adjacency-set
    // recompute over the verified edge list must agree row-for-row
    // (covers degree-1 nodes and open wedges the synthetic lacks)
    val real = DedupOps.clusteringCoefficients(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(real.nonEmpty)
    val edges = DedupOps.nearDupNgram(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_a"),
        org.apache.spark.sql.functions.col("doc_b"))
      .as[(Long, Long)].collect()
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    assert(real.keySet == adj.keySet, "node roster diverges from the edge list")
    real.foreach { case (id, (dg, tri, coef)) =>
      val nbrs = adj(id)
      assert(dg == nbrs.size.toLong, s"degree mismatch for $id")
      val t = nbrs.toSeq.combinations(2).count { case Seq(x, y) => adj(x).contains(y) }
      assert(tri == t.toLong, s"triangle mismatch for $id")
      val want = if (dg >= 2) math.floor(2.0 * t / (dg * (dg - 1)) * 1e6 + 0.5) / 1e6 else 0.0
      assert(coef == want, s"coefficient mismatch for $id")
      assert(coef >= 0.0 && coef <= 1.0)
    }
    // non-vacuity: degree-1 nodes exist and score 0 (no wedge to close)
    assert(real.exists { case (_, (dg, _, c)) => dg == 1L && c == 0.0 })
  }

  test("degree ordering collapses a 10^4-degree star's wedge set (the O(m^1.5) bound)") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val d = 10000
    val hub = (d / 2).toLong
    // a<b star edges with the hub in the MIDDLE of the id range — the
    // worst case for the naive id-ordered two-path join (in(hub) and
    // out(hub) are both ~d/2, so it materializes ~d²/4 wedge rows);
    // plus one spoke triangle (1,2,3) so correctness stays non-vacuous
    val star = (0L until d.toLong).filter(_ != hub)
      .map(s => if (s < hub) (s, hub) else (hub, s))
    val extra = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = (star ++ extra).toDF("doc_a", "doc_b")
    // the naive bound, measured: id-ordered wedges through the hub
    val naive = edges.toDF("a", "b").join(edges.toDF("b", "c"), "b").count()
    assert(naive >= (d.toLong / 2 - 1L) * (d.toLong / 2 - 1L),
      s"star no longer exercises the naive blow-up (wedges=$naive)")
    // the degree-ordered form: every star edge points INTO the hub
    // (max degree), so the hub contributes ZERO path wedges
    val o = DedupOps.orientByDegree(edges).cache()
    val orderedWedges = o.toDF("a", "b").join(o.toDF("b", "c"), "b").count()
    assert(orderedWedges <= 16L,
      s"degree ordering failed to collapse the hub (wedges=$orderedWedges vs naive=$naive)")
    assert(o.filter(col("u") === hub).count() == 0L, "hub kept out-edges")
    // and the counts are still exact: 4 triangles (1,2,3) + one per
    // extra edge with the hub — every corner of each credited once
    val got = DedupOps.triangleCorners(edges)
      .as[(Long, Long)].collect().toMap
    o.unpersist()
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, hub -> 3L),
      s"triangle credits wrong: $got")
  }

  test("real data: the verified triangle population is non-vacuous and consistent") {
    val tri = DedupOps.triangleCounts(spark, sf).as[(Long, Long)].collect()
    // total corner credits are divisible by 3 (every triangle has 3)
    assert(tri.map(_._2).sum % 3 == 0)
    // every triangle corner is a near-dup graph node
    val nodes = DedupOps.nearDupNgram(spark, sf)
      .select($"doc_a").union(DedupOps.nearDupNgram(spark, sf).select($"doc_b"))
      .as[Long].collect().toSet
    assert(tri.forall(t => nodes(t._1)))
  }
}
