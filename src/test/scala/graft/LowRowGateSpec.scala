package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Audited floor for the small-result oracle gates (round-13/14
  * finding): a gate that compares few rows is only meaningful if
  * those rows carry earned values — an empty input or collapsed
  * group space could hash-match a broken operator. q09 was the one
  * truly vacuous case (0 rows on both engines; now anti-joins a
  * filtered right side with real orphans). For the rest, this spec
  * pins the property that makes each small result non-vacuous, so a
  * future data regeneration that silently empties a gate's input
  * fails HERE instead of hash-matching trivially.
  */
class LowRowGateSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q09 anti join has real orphans to lose (de-vacuated gate)") {
    val n = run("q09_anti_join").count()
    assert(n > 0, "anti join found no orphans — the gate is vacuous again")
    // and not everything: the join must actually eliminate customers
    assert(n < Tables.customer(spark, sf).count())
  }

  test("q03's single aggregate row sums a nonzero filtered population") {
    val pop = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .count()
    assert(pop > 0, "q03's filter matches nothing — its 1-row gate compares a sum of zero rows")
    assert(run("q03_agg_revenue").select($"total_revenue").as[Double].head() > 0)
  }

  test("q104's summary row reflects real trimming, not an empty pipeline") {
    val r = run("q104_trim_round_trip")
      .select($"n_docs", $"n_removed_total", $"residual_spans")
      .as[(Long, Long, Long)].head()
    assert(r._1 > 0, "no documents flowed through the trim round trip")
    assert(r._2 > 0, "nothing was trimmed — residual_spans = 0 is a no-op, not a proof")
    assert(r._3 == 0L)
  }

  test("returnflag-grouped gates cover the full 3-value group space with non-null measures") {
    val flags = Tables.lineitem(spark, sf)
      .select($"l_returnflag").distinct().count()
    assert(flags == 3)
    for (name <- Seq("q35_weighted_mean", "q42_quantiles", "q47_stats_agg",
        "q53_count_distinct", "q54_approx_distinct", "q55_agg_filter",
        "q100_approx_quantiles", "q123_column_stats", "q124_column_stats_sketch")) {
      val df = run(name)
      assert(df.count() == 3,
        s"$name no longer covers the full group space — a collapsed group would shrink it")
      val anyNull = df.columns.map(c => count(when(col(c).isNull, 1)).as(c))
      val nulls = df.agg(anyNull.head, anyNull.tail: _*).head()
      assert((0 until nulls.length).forall(i => nulls.getLong(i) == 0L),
        s"$name emits null measures: $nulls")
    }
  }

  test("source drift PSI matches a driver-side recompute and is nonnegative") {
    import graft.ops.RelationalExt
    val nBins = 10
    val docs = Tables.documents(spark, sf)
      .select($"source", $"n_chars").as[(String, Long)].collect()
    val mn = docs.map(_._2).min; val mx = docs.map(_._2).max
    def bin(c: Long): Int = (((c - mn) * nBins) / (mx - mn + 1)).toInt
    val corpus = docs.groupBy(d => bin(d._2)).view.mapValues(_.length.toLong).toMap
    val nTot = docs.length.toLong
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val byBin = rows.groupBy(d => bin(d._2)).view.mapValues(_.length.toLong).toMap
      val nSrc = rows.length.toLong
      val psi = (0 until nBins).foldLeft(0.0) { (acc, i) =>
        val pa = (byBin.getOrElse(i, 0L) + 1.0) / (nSrc + nBins)
        val pe = (corpus.getOrElse(i, 0L) + 1.0) / (nTot + nBins)
        acc + (pa - pe) * math.log(pa / pe)
      }
      src -> (nSrc, math.floor(psi * 1e6 + 0.5) / 1e6)
    }
    val got = RelationalExt.sourceDrift(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(got.length == expected.size)
    got.foreach { case (src, n, psi) =>
      assert((n, psi) == expected(src), s"source $src: got ($n, $psi)")
      // PSI is a sum of same-sign terms — a negative value means the
      // formula (not the data) broke
      assert(psi >= 0.0, s"source $src psi $psi")
    }
  }

  test("DSIR selection matches a driver-side importance-weight recompute") {
    import graft.ops.TextOps
    val dim = 256
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"source", $"text").as[(Long, String, String)].collect()
    def words(t: String): Seq[String] =
      t.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ").toSeq.filter(_.nonEmpty)
    def bucket(w: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (BigInt(hex.substring(0, 8), 16) % dim).toInt
    }
    val perDoc = docs.map { case (id, src, t) =>
      (id, src, words(t).map(bucket).groupBy(identity).view.mapValues(_.size.toLong).toMap)
    }
    val corpus = perDoc.flatMap(_._3).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val target = perDoc.filter(_._2 == "src0")
      .flatMap(_._3).groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val (nT, nC) = (target.values.sum, corpus.values.sum)
    val lnr = (0 until dim).map { b =>
      b -> (math.log((target.getOrElse(b, 0L) + 1.0) / (nT + dim)) -
        math.log((corpus.getOrElse(b, 0L) + 1.0) / (nC + dim)))
    }.toMap
    val expected = perDoc.filter(_._3.nonEmpty).map { case (id, _, bs) =>
      // bucket-order fold, exactly the engines' deterministic sum
      val logw = bs.toSeq.sortBy(_._1).foldLeft(0.0) { case (acc, (b, n)) =>
        acc + n.toDouble * lnr(b)
      }
      (id, logw)
    }.sortBy { case (id, w) => (-w, id) }.take(50)
      .map { case (id, w) => (id, math.floor(w * 1e6 + 0.5) / 1e6) }.toSeq
    val got = TextOps.dsirSelect(spark, sf)
      .as[(Long, Double)].collect().toSeq
    assert(got == expected, s"DSIR ranking diverged:\ngot  ${got.take(5)}\nwant ${expected.take(5)}")
    // the weights genuinely discriminate: not all identical
    assert(got.map(_._2).distinct.size > 1)
  }

  test("q116's df band admits the corpus vocabulary, not a single word") {
    val idx = run("q116_inverted_index")
    assert(idx.count() > 10,
      "df band excludes almost everything — the gate compares ~1 postings list")
    // postings are real lists, not singletons
    assert(idx.filter(size(split($"postings", ",")) > 10).count() > 10)
  }
}
