package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** q175 vocabulary richness (exact + HLL envelope), q176 Heaps-law
  * growth curve, q177 Zipf slope — driver-side recomputes plus the
  * structural invariants each curve must satisfy. */
class VocabStatsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private def normWords(t: String): Seq[String] =
    t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
      .split(" ").toSeq.filter(_.nonEmpty)

  private lazy val docs: Seq[(Long, String, String)] =
    Tables.documents(spark, sf).select($"doc_id", $"text", $"source")
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)

  test("vocab richness: exact counts match a recompute and every sketch is in envelope") {
    val want = docs.flatMap { case (_, t, s) => normWords(t).map(s -> _) }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (src, ws) =>
        (src, ws.size.toLong, ws.map(_._2).distinct.size.toLong)
      }
    val got = TextOps.vocabRichnessSketch(spark, sf)
      .as[(String, Long, Long, Double, Boolean)].collect().toSeq
    assert(got.map(g => (g._1, g._2, g._3)) == want)
    assert(got.forall(_._5), "an HLL estimate left the 4-rsd envelope")
  }

  test("vocab overlap (q207): exact set arithmetic matches a driver recompute; every sketch in envelope") {
    val vocab = docs.groupBy(_._3)
      .map { case (s, ds) => s -> ds.flatMap(d => normWords(d._2)).toSet }
    val got = TextOps.vocabOverlapSketch(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6))))
      .toMap
    val srcs = vocab.keySet
    assert(got.keySet == (for (a <- srcs; b <- srcs if a < b) yield (a, b)).toSet)
    got.foreach { case ((a, b), (va, vb, both, jacc, env)) =>
      assert(va == vocab(a).size.toLong && vb == vocab(b).size.toLong, s"($a,$b) sizes")
      val inter = vocab(a).intersect(vocab(b)).size.toLong
      assert(both == inter, s"($a,$b) intersection")
      val want = inter.toDouble / vocab(a).union(vocab(b)).size.toDouble
      assert(jacc == math.floor(want * 1e6 + 0.5) / 1e6, s"($a,$b) jaccard")
      assert(env, s"($a,$b) sketch out of envelope")
    }
    // overlap is non-vacuous on this corpus (shared vocabulary exists)
    assert(got.values.exists(_._3 > 0L))
  }

  test("vocab growth: prefix sums match, curve is monotone and concave-ish (n_new bounded by n_tokens)") {
    val rows = TextOps.vocabGrowth(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    // exact recompute of both prefix sums
    var ct = 0L; var cv = 0L
    val seen = scala.collection.mutable.Set[String]()
    docs.foreach { case (id, t, _) =>
      val ws = normWords(t)
      val newW = ws.distinct.count(w => seen.add(w))
      ct += ws.size; cv += newW
      val r = rows.find(_._1 == id).get
      assert(r == ((id, ws.size.toLong, newW.toLong, ct, cv)), s"doc $id: $r")
    }
    // the curve saturates: the last doc contributes no new vocabulary
    // on this corpus (Heaps flattening — the signal the curve is for)
    assert(rows.last._3 == 0L)
    assert(rows.head._3 == rows.head._2 || rows.head._3 <= rows.head._2)
  }

  test("zipf slope: matches a driver-side least-squares recompute and is negative") {
    val got = TextOps.zipfSlope(spark, sf)
      .as[(String, Long, Double)].collect().toSeq
    val bySrc = docs.flatMap { case (_, t, s) => normWords(t).map(s -> _) }
      .groupBy(_._1)
    got.foreach { case (src, nTerms, slope) =>
      val counts = bySrc(src).groupBy(_._2).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (w, c) => (-c, w) }.take(100)
      assert(nTerms == counts.size.toLong)
      val terms = counts.zipWithIndex.map { case ((_, c), i) =>
        (math.log((i + 1).toDouble), math.log(c.toDouble)) }
      val n = terms.size.toDouble
      val sx = terms.foldLeft(0.0)(_ + _._1)
      val sy = terms.foldLeft(0.0)(_ + _._2)
      val sxy = terms.foldLeft(0.0)((a, t) => a + t._1 * t._2)
      val sxx = terms.foldLeft(0.0)((a, t) => a + t._1 * t._1)
      val want = BigDecimal((n * sxy - sx * sy) / (n * sxx - sx * sx))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(slope == want, s"$src: got $slope want $want")
      assert(slope < 0.0, s"$src: Zipf slope must be negative, got $slope")
    }
    assert(got.nonEmpty)
  }
}
