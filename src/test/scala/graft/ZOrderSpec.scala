package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.RelationalExt
import graft.sources.Formats

/** Z-order layout clustering: writing files in interleaved-key order
  * must shrink every file's min/max envelope in BOTH dimensions —
  * that envelope IS what parquet footer-stats skipping prunes on, so
  * "envelopes narrow" is the data-skipping property stated directly.
  * A single-column sort is the negative control: it collapses its own
  * column's envelope and leaves the other dimension's as wide as the
  * natural layout. */
class ZOrderSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private val files = 16

  // per-file normalized span (max-min)/(globalMax-globalMin) averaged
  // over files, for both dimensions
  private def avgSpans(path: String): (Double, Double) = {
    val df = spark.read.parquet(path)
      .select($"o_custkey", $"o_days", input_file_name().as("f"))
    val g = df.agg(max($"o_custkey").as("cmax"), min($"o_custkey").as("cmin"),
      max($"o_days").as("dmax"), min($"o_days").as("dmin")).head()
    val spans = df.groupBy($"f").agg(
      (max($"o_custkey") - min($"o_custkey")).as("cs"),
      (max($"o_days") - min($"o_days")).as("ds"))
      .agg(avg($"cs"), avg($"ds")).head()
    (spans.getDouble(0) / (g.getLong(0) - g.getLong(1)),
      spans.getDouble(1) / (g.getLong(2) - g.getLong(3)))
  }

  test("z-ordered files have compact envelopes in BOTH dimensions; single sort only in its own") {
    val keyed = RelationalExt.zOrderKeysOrders(spark, sf)
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // natural layout: orderkey-ranged files (the as-generated shape)
    keyed.repartitionByRange(files, $"o_orderkey")
      .write.mode("overwrite").parquet(s"$tmp/natural")
    // negative control: cluster on ONE dimension only
    Formats.writeZOrdered(keyed, s"$tmp/bycust", $"o_custkey", files)
    // z-order on the interleaved key
    Formats.writeZOrdered(keyed, s"$tmp/zorder", $"zkey", files)
    val (natC, natD) = avgSpans(s"$tmp/natural")
    val (oneC, oneD) = avgSpans(s"$tmp/bycust")
    val (zC, zD) = avgSpans(s"$tmp/zorder")
    // natural files span essentially the whole domain in both dims
    assert(natC > 0.8 && natD > 0.8, s"natural layout unexpectedly clustered: $natC, $natD")
    // single-column sort: its own dim collapses, the other stays wide
    assert(oneC < 0.2, s"single-column sort did not cluster its own dim: $oneC")
    assert(oneD > 0.8, s"single-column sort should NOT cluster the other dim: $oneD")
    // z-order: BOTH dims narrow materially vs the natural layout
    assert(zC < 0.6 && zD < 0.6, s"z-order envelopes not compact: $zC, $zD")
    assert(zC < natC * 0.7 && zD < natD * 0.7,
      s"z-order did not beat the natural layout in both dims: ($zC vs $natC), ($zD vs $natD)")
    // and the clustered layout is a drop-in replacement: same rows
    val back = spark.read.parquet(s"$tmp/zorder")
    assert(back.count() == keyed.count())
    assert(back.exceptAll(keyed).count() == 0 && keyed.exceptAll(back).count() == 0,
      "z-ordered rewrite changed the table contents")
  }

  test("z-value interleave is monotone on each dimension when the other is fixed") {
    import graft.functions.ZOrder
    val xs = (0L until 64L).toDF("v")
    val fixed = xs.select($"v",
      ZOrder.zValue(lit(7L), $"v", bits = 6).as("zy"),
      ZOrder.zValue($"v", lit(7L), bits = 6).as("zx"))
      .orderBy($"v").collect()
    val zy = fixed.map(_.getLong(1)).toSeq
    val zx = fixed.map(_.getLong(2)).toSeq
    assert(zy == zy.sorted && zx == zx.sorted,
      "z-value must be monotone in each dimension (order-preserving interleave)")
    // and the curve genuinely interleaves: bit i of x lands at 2i
    assert(ZOrder.zValueSql("x", "y").contains("<< 0") &&
      ZOrder.zValueSql("x", "y").contains("<< 31"))
  }
}
