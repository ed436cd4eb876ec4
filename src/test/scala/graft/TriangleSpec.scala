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
