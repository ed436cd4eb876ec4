package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{SimilarityOps, TextOps}

/** q179 padding-waste audit and q180 incremental IVF append — the
  * properties each exists to deliver: length-sorted batching must
  * strictly cut padding waste, and the appended index must serve
  * bucket-pruned results identical to a full rebuild. */
class IncrementalIndexSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("padding waste: length-sorted batching strictly beats arrival order; totals are consistent") {
    val rows = TextOps.paddingWaste(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val byStrategy = rows.groupBy(_._1)
    assert(byStrategy.keySet == Set("by_arrival", "by_length"))
    // identical doc/token totals — batching must not lose a document
    val totals = byStrategy.view.mapValues(rs =>
      (rs.map(_._3).sum, rs.map(_._5).sum)).toMap
    assert(totals("by_arrival") == totals("by_length"))
    // per-batch waste = n_docs·max_len − sum_len recomputed
    rows.foreach { case (_, _, n, mx, sm, w) => assert(w == n * mx - sm) }
    // the motivating fact: sorting by length strictly cuts total waste
    val waste = byStrategy.view.mapValues(_.map(_._6).sum).toMap
    assert(waste("by_length") < waste("by_arrival"),
      s"length bucketing saved nothing: $waste")
  }

  test("incremental IVF: every served row matches the rebuild, and the probe bucket-prunes old+new files") {
    val res = SimilarityOps.ivfIncrementalAppend(spark, sf, table = "ivf_incr_spec")
    val plan = res.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"appended-index scan did not bucket-prune:\n$plan")
    assert(sel.get.group(1).toInt <= 2 && sel.get.group(2).toInt == 8,
      s"expected <=2 of 8 buckets read, got ${sel.get.matched}")
    val rows = res.as[(Long, Long, Int, Double, Boolean)].collect()
    assert(rows.length == 10)
    assert(rows.forall(_._5), s"append-serve diverged from rebuild-serve: ${rows.toSeq}")
    // non-vacuity of the maintenance path: at least one served hit is
    // an APPENDED vector (vec_id ≡ 7 mod 10) or, failing that, the
    // appended slice is genuinely present in the index table
    val appended = spark.table("ivf_incr_spec")
      .filter($"vec_id" % 10 === 7).count()
    assert(appended > 0, "append wrote nothing")
  }

  test("appendBucketed refuses a mismatched bucket spec loudly") {
    val df = Seq((1L, "a")).toDF("k", "v")
    graft.sources.Formats.writeBucketed(df, "append_spec_tbl", "k", 4)
    val e = intercept[Exception] {
      graft.sources.Formats.appendBucketed(df, "append_spec_tbl", "k", 8)
    }
    assert(e.getMessage != null)
  }
}
