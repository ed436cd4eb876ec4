package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{CurationOps, RelationalExt, TextOps}

/** Semantic gates for q225/q226/q227 beyond the oracle hash:
  * KL's mathematical properties (non-negativity, zero iff identical,
  * asymmetry present), Hamilton apportionment's exact-budget and
  * within-one-seat guarantees, and the decay score's closed form. */
class SourceStatsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("source KL: non-negative everywhere, zero only against itself (excluded)") {
    val out = TextOps.sourceUnigramKL(spark, sf).collect()
    assert(out.nonEmpty)
    // Gibbs' inequality: KL >= 0 for any two distributions, and the
    // smoothed distributions of two different sources can only
    // coincide if their counts are identical word for word
    out.foreach { r =>
      assert(r.getDouble(3) >= 0.0,
        s"KL(${r.getString(0)}||${r.getString(1)}) negative")
    }
    // both directions present and (generically) different
    val m = out.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val asym = m.keys.count { case (a, b) => m((a, b)) != m((b, a)) }
    assert(asym > 0, "KL matrix came out perfectly symmetric — suspicious")
  }

  test("quota sample: budget exact, per-source within one of ideal share") {
    val out = CurationOps.quotaSample(spark, sf)
    assert(out.count() == 100, "sum of quotas must hit the budget exactly")
    val docs = Tables.documents(spark, sf).groupBy(col("source"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.values.sum.toDouble
    val got = out.groupBy(col("source")).agg(count(lit(1)).as("q")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    docs.foreach { case (s, n) =>
      val ideal = 100.0 * n / total
      val q = got.getOrElse(s, 0L).toDouble
      assert(math.abs(q - ideal) < 1.0 + 1e-9,
        s"source $s: quota $q vs ideal $ideal breaks the within-one guarantee")
    }
    // membership is the smallest-md5 prefix per source: rank gaps impossible
    val badRank = out.groupBy(col("source"))
      .agg(max(col("pick_rank")).as("mx"), count(lit(1)).as("c"))
      .filter(col("mx") =!= col("c"))
    assert(badRank.count() == 0, "pick_rank must be gapless 1..quota")
  }

  test("sem-lex agreement: identities hold on real data; forced overlap is found") {
    val r = graft.ops.DedupOps.semLexAgreement(spark, sf).collect()(0)
    assert(r.getLong(0) == r.getLong(3) + r.getLong(2), "sem_only + both != n_semantic")
    assert(r.getLong(1) == r.getLong(4) + r.getLong(2), "lex_only + both != n_lexical")
    // positive control: identical text AND identical embeddings for
    // docs 0/1 -> the pair lands in BOTH sets
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("semlex").toString
    val txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq((0L, txt, "en", "t", txt.length.toLong),
        (1L, txt, "en", "t", txt.length.toLong),
        (2L, "one two three four five six seven eight nine ten", "en", "t", 49L),
        (3L, "red green blue cyan magenta yellow black white gray pink", "en", "t", 56L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val v0 = Array.fill(8)(1.0f); val v2 = Array.tabulate(8)(i => (i + 1).toFloat)
    val v3 = Array.tabulate(8)(i => (8 - i).toFloat)
    Seq((0L, v0.toSeq, 0), (1L, v0.toSeq, 0), (2L, v2.toSeq, 1), (3L, v3.toSeq, 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val c = graft.ops.DedupOps.semLexAgreement(spark, dir).collect()(0)
    assert(c.getLong(2) >= 1, s"forced (0,1) overlap not found: ${c.mkString(",")}")
    assert(c.getDouble(5) > 0.0)
  }

  test("trimmed mean: drops exactly the planted outliers; untrimmed mean keeps them") {
    import spark.implicits._
    // 8 values of 10.0 plus outliers 0.0 and 1000.0: at alpha=10%,
    // k = (10*10) div 100 = 1 -> exactly the two extremes drop
    val rows = ((1 to 8).map(i => (i.toLong, java.sql.Timestamp.valueOf(
        f"2024-01-01 00:${i}%02d:00"), 1L, "pay", 10.0, "{}")) ++ Seq(
      (97L, java.sql.Timestamp.valueOf("2024-01-01 00:57:00"), 1L, "pay", 0.0, "{}"),
      (98L, java.sql.Timestamp.valueOf("2024-01-01 00:58:00"), 1L, "pay", 1000.0, "{}")))
    val dir = java.nio.file.Files.createTempDirectory("trim").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = RelationalExt.trimmedMean(spark, dir).collect()(0)
    assert(r.getLong(1) == 10L && r.getLong(2) == 8L)
    assert(math.abs(r.getDouble(4) - 10.0) < 1e-9,
      s"trimmed mean ${r.getDouble(4)} != 10.0")
    assert(math.abs(r.getDouble(3) - 108.0) < 1e-9,
      s"untrimmed mean ${r.getDouble(3)} != 108.0")
  }

  test("entry conversion: sessions partition, entries witness, a planted session converts") {
    val out = graft.streaming.EventStream.entryChannelConversion(spark, sf).collect()
    // sessions partition: sum over channels = total session count
    val total = graft.streaming.EventStream.sessionizeBatch(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == total, "entry channels must partition sessions")
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "converted exceeds sessions")
    }
    // planted: one session entering at 'view' that purchases 10 min in
    import spark.implicits._
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5L, "view", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), 5L, "purchase", 1.0, "{}"),
      // a second session for the same user 2h later, entering at error
      (3L, java.sql.Timestamp.valueOf("2024-01-01 12:30:00"), 5L, "error", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("entry").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.streaming.EventStream.entryChannelConversion(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map("view" -> ((1L, 1L)), "error" -> ((1L, 0L))),
      s"planted sessions mis-assigned: $got")
  }

  test("langid calibration: bands partition the corpus; confident English lands high and correct") {
    val out = TextOps.langIdCalibration(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == total, "bands must partition the corpus")
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // positive control: a doc that is pure English stopwords (margin
    // >= 11) must land in 3_high with accuracy 1.0
    import spark.implicits._
    val en = ("the and is in to of a that it was " * 3).trim
    val dir = java.nio.file.Files.createTempDirectory("cal").toString
    Seq((0L, en, "en", "t", en.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val hi = TextOps.langIdCalibration(spark, dir).collect()
    assert(hi.length == 1 && hi(0).getString(0) == "3_high" &&
      hi(0).getDouble(3) == 1.0, s"control misbanded: ${hi.mkString(",")}")
  }

  test("recency score: closed form on a constructed user history") {
    import spark.implicits._
    val ts = (0 to 3).map(d => (d.toLong, java.sql.Timestamp.valueOf(
      f"2024-02-${10 + d}%02d 12:00:00"), 7L, "view", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("rec").toString
    ts.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = RelationalExt.recencyEngagement(spark, dir).collect()(0)
    // ages 3,2,1,0 days -> score = 1/8 + 1/4 + 1/2 + 1 = 1.875
    assert(r.getLong(1) == 4L)
    assert(math.abs(r.getDouble(3) - 1.875) < 1e-9,
      s"score ${r.getDouble(3)} != 1.875")
  }

  test("novelty curve: first doc fully novel; seen-counts telescope to rows - vocab") {
    val out = graft.ops.DedupOps.noveltyCurve(spark, sf)
    val first = out.orderBy(col("doc_id")).limit(1).collect()(0)
    assert(first.getDouble(3) == 1.0, "the earliest doc can never have seen anything")
    // every shingle with p postings contributes exactly p-1 seen rows:
    // sum(n_seen) = total posting rows - vocabulary size
    val agg = out.agg(sum(col("n_seen")).as("s"), sum(col("n_shingles")).as("r"))
      .collect()(0)
    val docs = Tables.documents(spark, sf)
    val vocab = docs.select(explode(graft.ops.DedupOps.shingles(col("text"))).as("s"))
      .distinct().count()
    assert(agg.getLong(0) == agg.getLong(1) - vocab,
      s"telescoping identity broken: seen=${agg.getLong(0)} rows=${agg.getLong(1)} vocab=$vocab")
  }

  test("event lift: n_ab bounded by both margins; lift matches the hand formula") {
    val out = RelationalExt.eventCooccurrence(spark, sf).collect()
    assert(out.nonEmpty)
    val nu = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    out.foreach { r =>
      val (na, nb, nab) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nab <= math.min(na, nb), "pair count exceeds a margin")
      val want = math.floor(nab.toDouble * nu / (na.toDouble * nb) * 1e4 + 0.5) / 1e4
      assert(math.abs(r.getDouble(5) - want) < 1e-9,
        s"${r.getString(0)}/${r.getString(1)}: lift ${r.getDouble(5)} != $want")
    }
  }

  test("chi2 cells: expected preserves margins and contributions are non-negative") {
    val out = TextOps.langSourceChi2(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getDouble(4) >= 0.0, "negative chi2 contribution"))
    // expected counts must reproduce each row margin (up to rounding):
    // sum over sources of E[lang, source] = count(lang)
    val byLang = out.groupBy(_.getString(0)).map { case (l, rs) =>
      l -> rs.map(_.getDouble(3)).sum
    }
    val obs = Tables.documents(spark, sf).groupBy(col("lang"))
      .agg(count(lit(1))).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (l, e) =>
      assert(math.abs(e - obs(l)) < 1e-3, s"lang $l: ΣE=$e vs obs=${obs(l)}")
    }
  }

  test("rate trend: a planted linear series recovers its slope exactly") {
    import spark.implicits._
    // y = 10 + 3x over 6 days -> slope exactly 3
    val rows = (1 to 6).flatMap { d =>
      (0 until (10 + 3 * d)).map(i =>
        ((d * 1000 + i).toLong, java.sql.Timestamp.valueOf(
          f"2024-03-${d}%02d 09:00:00"), 1L, "lin", 1.0, "{}"))
    }
    val dir = java.nio.file.Files.createTempDirectory("trend").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = RelationalExt.dailyRateTrend(spark, dir).collect()(0)
    assert(r.getLong(1) == 6L)
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-9, s"slope ${r.getDouble(3)} != 3")
    assert(r.getBoolean(4))
  }

  test("threshold sweep: counts monotone non-increasing in tau; tau=0.5 matches q25") {
    val out = graft.ops.DedupOps.thresholdSweep(spark, sf)
      .orderBy(col("tau")).collect()
    assert(out.length == 4)
    out.sliding(2).foreach { w =>
      assert(w(0).getLong(1) >= w(1).getLong(1),
        "pair count must not grow as tau tightens")
    }
    val atHalf = out.find(_.getDouble(0) == 0.5).get.getLong(1)
    val q25 = graft.ops.DedupOps.nearDupNgram(spark, sf).count()
    assert(atHalf == q25, s"sweep at 0.5 ($atHalf) != q25 ($q25)")
  }

  test("user entropy: a scripted loop scores zero; bounds hold on real data") {
    import spark.implicits._
    // user 1 does view->buy->view->buy... over 10 events: 9
    // transitions split 5 view->buy / 4 buy->view, so
    // H = -(5/9 ln 5/9 + 4/9 ln 4/9); user 2 loops one
    // self-transition -> H = 0
    val rows = (0 until 10).map(i => (i.toLong,
      java.sql.Timestamp.valueOf(f"2024-01-01 00:${i}%02d:00"), 1L,
      if (i % 2 == 0) "view" else "buy", 1.0, "{}")) ++
      (0 until 5).map(i => ((100 + i).toLong,
        java.sql.Timestamp.valueOf(f"2024-01-01 01:${i}%02d:00"), 2L,
        "ping", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("uent").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = RelationalExt.userTransitionEntropy(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val h59 = -(5.0 / 9 * math.log(5.0 / 9) + 4.0 / 9 * math.log(4.0 / 9))
    assert(math.abs(got(1L) - h59) < 1e-5, s"alternator ${got(1L)} != $h59")
    assert(got(2L) == 0.0, "self-loop user must score exactly zero")
    // real data: 0 <= H <= ln(n_patterns)
    val bad = RelationalExt.userTransitionEntropy(spark, sf)
      .filter(col("entropy") < 0.0 ||
        col("entropy") > log(col("n_patterns").cast("double")) + 1e-6)
    assert(bad.count() == 0)
  }

  test("removal effect: a mandatory bridge scores 1.0, a bypassed channel less") {
    import spark.implicits._
    // users 1-3: view -> click -> purchase (click is the only bridge)
    // user 4:    view -> purchase           (view has a direct path)
    def path(u: Long, types: Seq[String], base: Int) = types.zipWithIndex.map {
      case (t, i) => ((base + i).toLong,
        java.sql.Timestamp.valueOf(f"2024-01-01 00:${base / 10 + i}%02d:00"), u, t, 1.0, "{}")
    }
    val rows = path(1L, Seq("view", "click", "purchase"), 10) ++
      path(2L, Seq("view", "click", "purchase"), 20) ++
      path(3L, Seq("view", "click", "purchase"), 30) ++
      path(4L, Seq("view", "purchase"), 40)
    val dir = java.nio.file.Files.createTempDirectory("mre").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = RelationalExt.removalEffectAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(3))).toMap
    // every journey converts -> base = 1.0
    assert(out.values.head._1 == 1.0, s"base ${out.values.head._1}")
    // removing view kills every journey (all start view): effect 1.0;
    // removing click kills 3 of 4
    assert(out("view")._2 == 1.0, s"view ${out("view")._2}")
    assert(math.abs(out("click")._2 - 0.75) < 1e-6, s"click ${out("click")._2}")
  }

  test("removal effect: 80 rounds is the fixpoint on real data") {
    val a = RelationalExt.removalEffectAttribution(spark, sf, rounds = 80)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val b = RelationalExt.removalEffectAttribution(spark, sf, rounds = 90)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    a.foreach { case (c, (vb, vr)) =>
      assert(math.abs(vb - b(c)._1) < 1e-6 && math.abs(vr - b(c)._2) < 1e-6,
        s"channel $c: value iteration not converged at 80 rounds")
    }
  }

  test("recency score: events beyond the horizon weigh exactly zero") {
    import spark.implicits._
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "view", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-06-01 00:00:00"), 1L, "view", 1.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("rec2").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = RelationalExt.recencyEngagement(spark, dir).collect()(0)
    // the January event is 152 days old (> horizon 40): only the
    // June event contributes, with weight 2^40/2^40 = 1
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-9)
  }
}
