package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps

/** q220 coreness via h-index iteration. Three obligations:
  * (1) the fixed 6-round output IS the fixpoint on real data (rounds
  * vs rounds+1 equality — the oracle's unroll depth is safe),
  * (2) the iteration computes true coreness on synthetic graphs with
  * known cores (clique ⊕ chain ⊕ star), checked against brute-force
  * peeling computed in the test,
  * (3) monotonicity: coreness ≤ degree everywhere. */
class CorenessSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private def hIndexFix(edges: Seq[(Long, Long)]): Map[Long, Int] = {
    // brute-force peeling: repeatedly remove min-degree nodes; a
    // node's coreness is the max k at which it survives k-peeling
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = nodes.map(n => n ->
      edges.collect { case (a, b) if a == n => b; case (a, b) if b == n => a }.toSet).toMap
    var core = Map.empty[Long, Int]
    var k = 1
    var alive = nodes.toSet
    while (alive.nonEmpty) {
      var changed = true
      while (changed) {
        val drop = alive.filter(n => adj(n).count(alive) < k)
        changed = drop.nonEmpty
        core = core ++ drop.map(_ -> (k - 1))
        alive = alive -- drop
      }
      k += 1
    }
    core
  }

  test("synthetic clique+chain+star matches brute-force peeling") {
    // 4-clique (coreness 3), a 3-chain hanging off it (coreness 1),
    // and a star center with 3 leaves (all coreness 1)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // clique
      (4L, 5L), (5L, 6L), (6L, 7L), // chain
      (8L, 9L), (8L, 10L), (8L, 11L)) // star
    val expected = hIndexFix(edges)
    val pairs = edges.toDF("doc_a", "doc_b")
    val sym = pairs.select($"doc_a".as("u"), $"doc_b".as("v"))
      .unionAll(pairs.select($"doc_b".as("u"), $"doc_a".as("v")))
    val deg = sym.groupBy($"u").agg(count(lit(1)).as("c"))
    var c = deg
    for (_ <- 1 to 6) {
      val nbr = sym.join(c.select($"u".as("v"), $"c"), "v")
        .groupBy($"u").agg(sort_array(collect_list($"c")).as("la"))
      val m = size($"la")
      c = nbr.select($"u",
        aggregate(transform($"la", (x, i) => when(x >= m - i, lit(1L)).otherwise(lit(0L))),
          lit(0L), (a, x) => a + x).as("c"))
    }
    val got = c.as[(Long, Long)].collect().toMap
    expected.foreach { case (n, k) =>
      assert(got(n) == k.toLong, s"node $n: got ${got(n)}, want $k")
    }
  }

  test("6 rounds is the fixpoint on real data (oracle unroll depth is safe)") {
    val r6 = DedupOps.corenessDupGraph(spark, sf, rounds = 6)
      .select($"doc_id", $"coreness").as[(Long, Long)].collect().toMap
    val r7 = DedupOps.corenessDupGraph(spark, sf, rounds = 7)
      .select($"doc_id", $"coreness").as[(Long, Long)].collect().toMap
    assert(r6 == r7, "h-index iteration not converged at 6 rounds")
    assert(r6.nonEmpty)
  }

  test("coreness <= degree and >= 1 for every dup-graph node") {
    val bad = DedupOps.corenessDupGraph(spark, sf)
      .filter($"coreness" > $"degree" || $"coreness" < 1)
    assert(bad.count() == 0)
  }
}
