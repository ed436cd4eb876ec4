package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{RelationalExt, TextOps}

/** q172 token entropy, q173 per-source quantile normalization, q174
  * event-rate anomalies — driver-side recomputes plus the structural
  * properties each signal exists to provide. */
class SignalStatsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("token entropy: hand-computed values on a crafted corpus; evenness ordering") {
    // doc 1: four words evenly -> H = ln(4); doc 2: same length but
    // 5-of-8 mass on one word -> strictly lower entropy than even
    // 8-word doc; doc 3: one word -> H = 0
    val dir = java.nio.file.Files.createTempDirectory("graft-entropy").toString
    Seq((1L, "alpha bravo charlie delta"),
        (2L, "echo echo echo echo echo golf hotel india"),
        (3L, "juliet")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.tokenEntropy(spark, dir)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    def h(counts: Seq[Long]): Double = {
      val n = counts.sum.toDouble
      val raw = counts.map(_ / n).foldLeft(0.0)((acc, p) => acc - p * math.log(p))
      BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got(0) == ((1L, 4L, 4L, h(Seq(1, 1, 1, 1)))))
    assert(got(1) == ((2L, 8L, 4L, h(Seq(5, 1, 1, 1)))))
    assert(got(2) == ((3L, 1L, 1L, 0.0)))
    // evenness, not just type count: doc 2 has the same n_distinct as
    // doc 1 but strictly lower entropy
    assert(got(1)._4 < got(0)._4)
  }

  test("conversion latency (q215): driver funnel replay parity") {
    import org.apache.spark.sql.functions.col
    val r = RelationalExt.conversionLatency(spark, sf).collect().head
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(x => (x.getLong(0), x.getString(1), x.getAs[java.time.LocalDateTime](2)))
    def us(t: java.time.LocalDateTime): Long = {
      val i = t.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000
    }
    val byUser = ev.groupBy(_._1)
    val lats = byUser.toSeq.flatMap { case (u, rows) =>
      val views = rows.filter(_._2 == "view").map(x => us(x._3))
      if (views.isEmpty) None
      else {
        val tv = views.min
        val ps = rows.filter(x => x._2 == "purchase" && us(x._3) > tv).map(x => us(x._3))
        if (ps.isEmpty) None else Some((u, ps.min - tv))
      }
    }
    val sorted = lats.sortBy(identity(_)._2) // by latency; ties immaterial to value select
    val ordered = lats.sortBy { case (u, l) => (l, u) }.map(_._2)
    assert(r.getLong(0) == lats.length.toLong)
    assert(r.getLong(1) == ordered(math.ceil(ordered.length * 0.5).toInt - 1))
    assert(r.getLong(2) == ordered(math.ceil(ordered.length * 0.95).toInt - 1))
    assert(r.getLong(3) == ordered.max)
    assert(sorted.nonEmpty)
  }

  test("event gaps (q209): exact-microsecond recompute parity; p50 <= p95 <= max") {
    import org.apache.spark.sql.functions.col
    val got = RelationalExt.eventGapPercentiles(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("ts"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getAs[java.time.LocalDateTime](1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (tpe, rows) =>
      def us(t: java.time.LocalDateTime): Long = {
        val i = t.toInstant(java.time.ZoneOffset.UTC)
        i.getEpochSecond * 1000000L + i.getNano / 1000
      }
      val sorted = rows.sortBy(r => (us(r._2), r._3))
      val gaps = sorted.sliding(2).collect { case Array(a, b) => us(b._2) - us(a._2) }.toSeq.sorted
      val (n, p50, p95, mx) = got(tpe)
      assert(n == gaps.length.toLong, s"$tpe gap count")
      assert(p50 == gaps(math.ceil(gaps.length * 0.5).toInt - 1), s"$tpe p50")
      assert(p95 == gaps(math.ceil(gaps.length * 0.95).toInt - 1), s"$tpe p95")
      assert(mx == gaps.max, s"$tpe max")
      assert(p50 <= p95 && p95 <= mx)
    }
  }

  test("quality lift table (q204): driver recompute parity; deciles partition the corpus") {
    import org.apache.spark.sql.functions.col
    val got = TextOps.qualityLiftTable(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val docs = TextOps.linearQuality(spark, sf)
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // labels from the heuristic quality
    val labels = TextOps.qualityScore(spark, sf)
      .select(col("doc_id"), col("quality")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1) >= 0.5)).toMap
    val n = docs.size
    val ranked = docs.toSeq.sortBy { case (id, s) => (s, id) }.zipWithIndex
    val byDecile = ranked.groupBy { case (_, i) => i.toLong * 10 / n + 1 }
    assert(got.map(_._1).toSet == byDecile.keySet)
    got.foreach { case (dec, nDocs, meanScore, posRate) =>
      val members = byDecile(dec)
      assert(nDocs == members.size.toLong, s"decile $dec size")
      val ms = members.map(_._1._2).sum.toDouble / members.size
      assert(meanScore == math.floor(ms * 1e6 + 0.5) / 1e6, s"decile $dec mean")
      val pr = members.count(m => labels(m._1._1)).toDouble / members.size
      assert(posRate == math.floor(pr * 1e6 + 0.5) / 1e6, s"decile $dec rate")
    }
    assert(got.map(_._2).sum == n.toLong, "deciles must partition the corpus")
  }

  test("embedding outliers (q205): top-k matches a driver recompute; an injected corrupt vector ranks first") {
    import org.apache.spark.sql.functions.col
    val got = graft.ops.SimilarityOps.embeddingOutliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(got.length == 20 && got.map(_._1).toSeq == (1L to 20L))
    // driver recompute: exact centroid + L2^2, same ordering
    val all = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val dim = all.head._2.length
    val cent = (0 until dim).map(i =>
      all.map(_._2(i).toDouble).sum / all.length)
    val dists = all.map { case (id, v) =>
      id -> (0 until dim).foldLeft(0.0)((a, i) =>
        a + (v(i).toDouble - cent(i)) * (v(i).toDouble - cent(i)))
    }
    val want = dists.sortBy { case (id, d) => (-d, id) }.take(20)
    got.zip(want).foreach { case ((_, gid, gd2), (wid, wd2)) =>
      assert(gid == wid, s"outlier order: $gid vs $wid")
      assert(gd2 == math.round(wd2 * 1e6) / 1e6 ||
        gd2 == math.floor(wd2 * 1e6 + 0.5) / 1e6, s"d2 for $gid")
    }
    // a corrupted shard's vector (huge magnitude) must surface at rank 1
    val dir = java.nio.file.Files.createTempDirectory("graft-out").toString
    val spark2 = spark
    import spark2.implicits._
    val rows = all.take(50).map { case (id, v) => (id, v, 0) } :+
      ((9999L, Array.fill(dim)(100.0f), 0))
    rows.toSeq.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val top = graft.ops.SimilarityOps.embeddingOutliers(spark, dir, k = 3).collect()
    assert(top.head.getLong(1) == 9999L,
      "the corrupted vector must rank as the #1 outlier")
  }

  test("robust anomaly (q199): driver recompute parity; a spike the mean/sd masks is flagged") {
    import org.apache.spark.sql.functions.col
    // parity on the real corpus: exact-long median/MAD recompute
    val got = RelationalExt.robustRateAnomaly(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6))))
      .toMap
    assert(got.nonEmpty)
    val byType = got.toSeq.groupBy(_._1._1)
    def discMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s(math.ceil(s.length * 0.5).toInt - 1)
    }
    byType.foreach { case (tpe, rows) =>
      val counts = rows.map(_._2._1)
      val med = discMedian(counts)
      val mad = discMedian(counts.map(c => math.abs(c - med)))
      rows.foreach { case ((_, _), (n, gm, gmad, z, flag)) =>
        assert(gm == med && gmad == mad, s"$tpe med/MAD mismatch")
        val zRaw = if (mad == 0L) 0.0 else 0.6745 * (n - med).toDouble / mad.toDouble
        assert(z == math.floor(zRaw * 1e6 + 0.5) / 1e6, s"$tpe z mismatch")
        assert(flag == (mad != 0L && math.abs(zRaw) >= 3.5), s"$tpe flag mismatch")
      }
    }
    // the discriminating case (why MAD exists next to q174's sd): one
    // synthetic type with 32 quiet hours (~11 events) and TEN 1000-
    // event spikes — enough spike mass that the sd they inflate
    // swallows their own mean/sd z (≈1.8 < 2.0, MASKED), while the
    // median (11) and MAD (1) ignore them entirely (robust z ≈ 667)
    val dir = java.nio.file.Files.createTempDirectory("graft-mad").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 42).flatMap { h =>
      val n = if (h >= 32) 1000 else 10 + (h % 3)
      (0 until n).map(i =>
        (h.toLong * 1000 + i, new java.sql.Timestamp(base + h * 3600L * 1000),
          1L, "burst", 0.0, "{}"))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val robust = RelationalExt.robustRateAnomaly(spark, dir).collect()
      .filter(_.getLong(2) == 1000L)
    assert(robust.nonEmpty && robust.forall(_.getBoolean(6)),
      "robust z failed to flag the spikes")
    val meansd = RelationalExt.eventRateAnomaly(spark, dir).collect()
      .filter(_.getLong(2) == 1000L)
    assert(meansd.nonEmpty && meansd.forall(!_.getBoolean(4)),
      "fixture: the spikes must MASK themselves under mean/sd for the " +
        "discrimination to be demonstrated")
  }

  test("KS distance (q200): driver ECDF recompute parity; identical distributions score 0") {
    import org.apache.spark.sql.functions.col
    val got = TextOps.ksSourceDistance(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(got.nonEmpty)
    // independent driver-side recompute: per-source sorted quality
    // samples, ECDF gap maximized over the union of observed values
    val q = TextOps.qualityScore(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("quality")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
      .map { case (s, vs) => s -> vs.map(_._2).sorted }
    got.foreach { case ((a, b), ks) =>
      val (xa, xb) = (q(a), q(b))
      val pts = (xa ++ xb).distinct.sorted
      val want = pts.map { x =>
        math.abs(xa.count(_ <= x).toDouble / xa.length -
          xb.count(_ <= x).toDouble / xb.length)
      }.max
      assert(ks == math.floor(want * 1e6 + 0.5) / 1e6, s"($a,$b): ks=$ks want=$want")
      assert(ks >= 0.0 && ks <= 1.0)
    }
    // ordered pairs only, full pair coverage
    val srcs = q.keySet
    assert(got.keySet == (for (a <- srcs; b <- srcs if a < b) yield (a, b)).toSet)
    // identical distributions -> 0: two synthetic sources with the
    // same texts must land at exactly 0.0 (the CDFs coincide)
    val dir = java.nio.file.Files.createTempDirectory("graft-ks").toString
    val texts = Seq("alpha beta gamma delta", "one two three, four five!",
      "the quick brown fox jumps over the lazy dog")
    texts.zipWithIndex.flatMap { case (t, i) =>
      Seq((i.toLong, t, "en", "sA", t.length.toLong),
        (100L + i, t, "en", "sB", t.length.toLong))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val zero = TextOps.ksSourceDistance(spark, dir).collect()
    assert(zero.length == 1 && zero.head.getDouble(4) == 0.0,
      s"identical sources must score exactly 0: ${zero.toSeq}")
  }

  test("quantile normalization: per-source ranks span [0,1] and are monotone in quality") {
    val rows = TextOps.qualityQuantileNorm(spark, sf)
      .as[(Long, String, Double, Double)].collect()
    val bySrc = rows.groupBy(_._2)
    assert(bySrc.size > 1)
    bySrc.foreach { case (src, docs) =>
      val sorted = docs.sortBy(d => (d._3, d._1)).map(_._4)
      assert(sorted.head == 0.0, s"$src min rank ${sorted.head}")
      assert(sorted.last == 1.0, s"$src max rank ${sorted.last}")
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b },
        s"$src ranks not monotone in (quality, doc_id)")
    }
    // the calibration is non-trivial: identical raw qualities in two
    // sources map to different ranks somewhere (the reason q173 exists)
    val byQuality = rows.groupBy(_._3).filter(_._2.map(_._2).distinct.size > 1)
    assert(byQuality.exists { case (_, ds) => ds.map(_._4).distinct.size > 1 })
  }

  test("daily percentiles: discrete selection matches a driver-side sort; p50 <= p95") {
    val got = RelationalExt.dailyValuePercentiles(spark, sf)
      .as[(String, java.sql.Date, Long, Double, Double)].collect()
    assert(got.nonEmpty)
    val raw = Tables.events(spark, sf)
      .select($"event_type", org.apache.spark.sql.functions.to_date($"ts").as("day"), $"value")
      .as[(String, java.sql.Date, Double)].collect()
      .groupBy(r => (r._1, r._2))
    got.foreach { case (et, day, n, p50, p95) =>
      val vals = raw((et, day)).map(_._3).sorted
      assert(n == vals.length)
      assert(p50 == vals(math.ceil(n * 0.5).toLong.toInt - 1), s"p50 at ($et,$day)")
      assert(p95 == vals(math.ceil(n * 0.95).toLong.toInt - 1), s"p95 at ($et,$day)")
      assert(p50 <= p95)
    }
  }

  test("attribution: flags match a driver-side replay; both outcomes occur") {
    val got = RelationalExt.lastTouchAttribution(spark, sf)
      .as[(Long, Long, java.sql.Timestamp, Option[java.sql.Timestamp], Boolean)]
      .collect()
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"ts")
      .as[(Long, Long, String, java.sql.Timestamp)].collect()
      .groupBy(_._2)
    got.foreach { case (id, user, ts, tClick, attributed) =>
      val stream = ev(user).sortBy(e => (e._4.getTime, e._1))
      val prior = stream.takeWhile(e =>
        e._4.getTime < ts.getTime || (e._4.getTime == ts.getTime && e._1 < id))
      val want = prior.filter(_._3 == "click").lastOption.map(_._4)
      assert(tClick == want, s"t_click mismatch for purchase $id")
      val wantFlag = want.exists(t => ts.getTime - t.getTime <= 3600L * 1000L)
      assert(attributed == wantFlag, s"flag mismatch for purchase $id")
    }
    assert(got.exists(_._5) && got.exists(!_._5),
      "attribution window never discriminated on this corpus")
  }

  test("DAU/WAU: trailing distinct matches a driver-side recompute; dau <= wau") {
    val got = RelationalExt.dauWau(spark, sf)
      .as[(java.sql.Date, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val active = Tables.events(spark, sf)
      .select($"user_id", org.apache.spark.sql.functions.to_date($"ts").as("day"))
      .distinct().as[(Long, java.sql.Date)].collect()
    val days = active.map(_._2).distinct
    got.foreach { case (day, dau, wau, st) =>
      val d = day.toLocalDate
      val wantDau = active.count(_._2.toLocalDate == d)
      val wantWau = active.filter { case (_, ad) =>
        val a = ad.toLocalDate
        !a.isAfter(d) && !a.isBefore(d.minusDays(6))
      }.map(_._1).distinct.length
      assert(dau == wantDau && wau == wantWau, s"$day: ($dau,$wau) want ($wantDau,$wantWau)")
      assert(dau <= wau)
      assert(st == BigDecimal(dau.toDouble / wau)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.map(_._1.toLocalDate).toSet == days.map(_.toLocalDate).toSet)
  }

  test("deletion audit: every day clean, deletions non-vacuous, naive retention as negative control") {
    val got = RelationalExt.deletionAudit(spark, sf)
      .as[(java.sql.Date, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._4), "a retained slice leaked a rostered user")
    assert(got.map(_._2).sum > 0, "deletion roster matched nothing — vacuous audit")
    // negative control: a 'retention' that forgets the roster entirely
    // must show leaks under the same independent predicate
    val naiveLeaks = Tables.events(spark, sf)
      .filter($"user_id" % 50 === 0).count()
    assert(naiveLeaks == got.map(_._2).sum)
  }

  test("equi-depth histogram: buckets are near-equal depth and cover every row") {
    val got = RelationalExt.equiDepthHistogram(spark, sf)
      .as[(Int, Long)].collect().sortBy(_._1)
    val n = Tables.orders(spark, sf).count()
    assert(got.map(_._2).sum == n, "histogram dropped rows")
    assert(got.map(_._1).toSeq == (0 until got.length))
    // equal depth up to boundary ties: no bucket deviates from n/k by
    // more than the largest tie run could force
    val ideal = n.toDouble / 8
    got.foreach { case (b, c) =>
      assert(math.abs(c - ideal) <= ideal * 0.5, s"bucket $b depth $c vs ideal $ideal")
    }
  }

  test("group regression: matches a driver-side least squares; r2 in [0,1]") {
    val got = RelationalExt.groupRegression(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    val docs = TextOps.qualityQuantileNorm(spark, sf) // doc_id, source, quality
      .as[(Long, String, Double, Double)].collect()
    val lens = Tables.documents(spark, sf).select($"doc_id", $"n_chars")
      .as[(Long, Long)].collect().toMap
    // mirror TextOps.roundAt literally: floor(x·10^6 + 0.5)/10^6
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    got.foreach { case (src, nDocs, slope, intercept, r2) =>
      val pts = docs.filter(_._2 == src).sortBy(_._1)
        .map(d => (lens(d._1).toDouble, d._3))
      assert(nDocs == pts.length)
      val n = pts.length.toDouble
      val sx = pts.foldLeft(0.0)(_ + _._1)
      val sy = pts.foldLeft(0.0)(_ + _._2)
      val sxy = pts.foldLeft(0.0)((a, p) => a + p._1 * p._2)
      val sxx = pts.foldLeft(0.0)((a, p) => a + p._1 * p._1)
      val syy = pts.foldLeft(0.0)((a, p) => a + p._2 * p._2)
      val wSlope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(slope == r6(wSlope), s"$src slope")
      assert(intercept == r6((sy - wSlope * sx) / n), s"$src intercept")
      val wR2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
        ((n * sxx - sx * sx) * (n * syy - sy * sy))
      assert(r2 == r6(wR2), s"$src r2")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("skew audit: Gini matches a driver-side recompute and sits in [0,1)") {
    val got = RelationalExt.skewAudit(spark, sf)
      .as[(Long, Long, Long, Double, Long, Long, Long, Double)].collect()
    assert(got.length == 5)
    val counts = Tables.events(spark, sf).groupBy($"user_id").count()
      .as[(Long, Long)].collect().sortBy(c => (c._2, c._1))
    val n = counts.length.toLong
    val total = counts.map(_._2).sum
    val sRank = counts.zipWithIndex.map { case ((_, c), i) => (i + 1).toLong * c }.sum
    val wantGini = math.floor(
      (2.0 * sRank / (n * total) - (n + 1).toDouble / n) * 1e6 + 0.5) / 1e6
    got.foreach { case (_, _, _, _, nk, nr, mm, gini) =>
      assert(nk == n && nr == total)
      assert(mm == counts.map(_._2).max)
      assert(gini == wantGini)
      assert(gini >= 0.0 && gini < 1.0)
    }
    // top keys really are the heaviest, in (cnt desc, key) order
    val wantTop = counts.sortBy(c => (-c._2, c._1)).take(5).map(_._1).toSeq
    assert(got.sortBy(_._1).map(_._2).toSeq == wantTop)
  }

  test("join-cardinality profile: predicted join_rows equals the actual join count") {
    val got = RelationalExt.joinCardinalityProfile(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._9).toMap
    val actualOC = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey").count()
    val actualLO = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        $"l_orderkey" === $"o_orderkey").count()
    assert(got("orders.custkey=customer.custkey") == actualOC)
    assert(got("lineitem.orderkey=orders.orderkey") == actualLO)
  }

  test("gopher ablation: counts recompute from q144's per-doc flags; unique <= fail") {
    val abl = TextOps.gopherAblation(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(abl.length == 7)
    val rules = abl.map(_._1).toSeq
    // q144 emits one boolean column per rule — recompute the ablation
    // from those per-doc flags (an independent path through the code)
    val perDoc = TextOps.gopherRules(spark, sf).collect().map { r =>
      rules.map(n => n -> r.getBoolean(r.fieldIndex(n))).toMap
    }
    abl.foreach { case (rule, nFail, nUniq, nDocs, nKeep) =>
      assert(nDocs == perDoc.length)
      assert(nFail == perDoc.count(d => !d(rule)), s"$rule n_fail")
      assert(nUniq == perDoc.count(d => !d(rule) && d.filterNot(_._1 == rule).values.forall(identity)),
        s"$rule n_unique_fail")
      assert(nKeep == perDoc.count(_.values.forall(identity)))
      assert(nUniq <= nFail)
    }
    // the report is non-degenerate: some rule actually kills uniquely
    assert(abl.exists(_._3 > 0))
  }

  test("event-rate anomalies: z-scores match a driver-side recompute; flags non-vacuous") {
    val hourly = Tables.events(spark, sf)
      .groupBy($"event_type", org.apache.spark.sql.functions.date_trunc("hour", $"ts").as("hour"))
      .count()
      .as[(String, java.sql.Timestamp, Long)].collect()
    val want = hourly.groupBy(_._1).toSeq.flatMap { case (et, rows) =>
      val n = rows.length
      val s1 = rows.map(_._3).sum
      val s2 = rows.map(r => r._3 * r._3).sum
      val mu = s1.toDouble / n
      val sd = math.sqrt((s2.toDouble - s1.toDouble * s1.toDouble / n) / (n - 1))
      rows.map { case (_, hr, c) =>
        val z = if (sd == 0.0) 0.0 else (c.toDouble - mu) / sd
        ((et, hr), (c, BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
          sd != 0.0 && math.abs(z) >= 2.0))
      }
    }.toMap
    val got = RelationalExt.eventRateAnomaly(spark, sf)
      .as[(String, java.sql.Timestamp, Long, Double, Boolean)].collect()
    assert(got.length == want.size)
    got.foreach { case (et, hr, c, z, fl) =>
      assert(want((et, hr)) == ((c, z, fl)), s"mismatch at ($et, $hr)")
    }
    assert(got.exists(_._5), "no anomaly flagged — threshold never engages on this corpus")
    assert(got.exists(!_._5))
  }

  test("quality bootstrap (q217): driver replay of the hash-Poisson machinery; CI brackets the point estimate") {
    import org.apache.spark.sql.functions.{col, floor => sfloor, lit}
    val got = TextOps.qualityBootstrap(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(got.nonEmpty)
    got.foreach { case (src, _, mean, lo, hi, se) =>
      assert(lo <= hi && se >= 0.0, s"$src: degenerate CI ($lo, $hi, $se)")
      assert(lo <= mean && mean <= hi,
        s"$src: point estimate $mean outside its own bootstrap CI [$lo, $hi]")
    }
    // driver replay: take (source, qint) from the engine's own quality
    // column (q21's oracle-verified score), then replay ONLY the new
    // machinery — md5 double-hash draws, Poisson threshold weights,
    // exact-long weighted sums, sorted-mean CI — in plain Scala
    val qs = TextOps.qualityScore(spark, sf)
      .select(col("doc_id"), sfloor(col("quality") * lit(1e6) + lit(0.5)).cast("long"))
      .as[(Long, Long)].collect()
    val srcOf = Tables.documents(spark, sf).select($"doc_id", $"source")
      .as[(Long, String)].collect().toMap
    val p = 2147483647L
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val cdf = {
      val pmf = (0 to 8).map(k => math.exp(-1.0) / (1 to k).product)
      pmf.scanLeft(0.0)(_ + _).tail
    }
    val reps = 64
    val byScr = qs.map { case (id, qint) =>
      val hex = md5hex(s"pb_$id")
      val h1 = java.lang.Long.parseLong(hex.substring(16, 31), 16) % p
      val h2 = java.lang.Long.parseLong(hex.substring(0, 15), 16) % p
      val ws = (1 to reps).map { b =>
        val u = ((h1 + b * h2) % p).toDouble / p
        cdf.count(t => u >= t).toLong
      }
      (srcOf(id), qint, ws)
    }.groupBy(_._1)
    val want = byScr.map { case (src, rows) =>
      val n = rows.length.toLong
      val meanQ = math.floor(rows.map(_._2).sum.toDouble / (n * 1e6) * 1e6 + 0.5) / 1e6
      val means = (0 until reps).map { bi =>
        val sw = rows.map(_._3(bi)).sum
        val swq = rows.map(r => r._3(bi) * r._2).sum
        if (sw == 0L) 0.0 else swq.toDouble / (sw.toDouble * 1e6)
      }.sorted
      val lo = means(math.ceil(0.025 * reps).toInt.max(1) - 1)
      val hi = means(math.ceil(0.975 * reps).toInt - 1)
      val sm = means.foldLeft(0.0)(_ + _)
      val smm = means.foldLeft(0.0)((a, x) => a + x * x)
      val se = math.sqrt(math.max(0.0, (smm - sm * sm / reps) / (reps - 1)))
      src -> ((n, meanQ, math.floor(lo * 1e6 + 0.5) / 1e6,
        math.floor(hi * 1e6 + 0.5) / 1e6, math.floor(se * 1e6 + 0.5) / 1e6))
    }
    assert(got.length == want.size)
    got.foreach { case (src, n, m, lo, hi, se) =>
      assert(want(src) == ((n, m, lo, hi, se)), s"replay mismatch for $src")
    }
  }

  test("quality bootstrap (q217): CI width shrinks ~1/sqrt(n) as a source grows") {
    // same text distribution, one source 16x the other: the bigger
    // source's CI must be decisively tighter (expected ratio 1/4)
    val dir = java.nio.file.Files.createTempDirectory("graft-boot").toString
    val texts = (0 until 40).map(i => ("word " * (10 + (i * 7) % 90)).trim)
    val small = texts.zipWithIndex.map { case (t, i) =>
      (i.toLong, t, "en", "small", t.length.toLong)
    }
    val big = (0 until 16).flatMap(r => texts.zipWithIndex.map { case (t, i) =>
      ((1000 + r * 100 + i).toLong, t, "en", "big", t.length.toLong)
    })
    (small ++ big).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextOps.qualityBootstrap(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(4) - r.getDouble(3))).toMap
    assert(rows("big") > 0.0, "degenerate zero-width CI on the big source")
    assert(rows("big") < rows("small") * 0.6,
      s"width did not shrink: big=${rows("big")} small=${rows("small")}")
  }
}
