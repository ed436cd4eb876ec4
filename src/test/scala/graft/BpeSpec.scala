package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** BPE vocabulary induction (q159) + tokenization (q160): every
  * assertion runs against an INDEPENDENT sequential driver-side
  * implementation of Sennrich-style BPE (argmax by (count DESC, left,
  * right), greedy left-to-right merge application), so a drift in the
  * distributed fold — especially the equal-symbol-run greedy subtlety
  * — cannot hide behind the oracle replay sharing its formulation. */
class BpeSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private val Eow = TextOps.BpeEow
  private val Rounds = 16

  private def normWords(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9]+", " ").trim.split(" ").toSeq.filter(_.nonEmpty)

  /** Sequential greedy left-to-right application — the semantics the
    * distributed fold must reproduce (incl. "aaa" under (a,a) merging
    * positions 0-1 and leaving the third 'a'). */
  private def refApply(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]; var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
        out += (l + r); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  private def refLearn(freq: Map[String, Long], merges: Int)
      : (Seq[(Int, String, String, Long)], Map[String, Vector[String]]) = {
    var state = freq.map { case (w, _) => w -> (w.map(_.toString).toVector :+ Eow) }
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    for (i <- 1 to merges) {
      val pc = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (w, syms) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          pc(p) = pc.getOrElse(p, 0L) + freq(w)
        }
      }
      val ((l, r), c) = pc.minBy { case ((a, b), n) => (-n, a, b) }
      learned += ((i, l, r, c))
      state = state.map { case (w, syms) => w -> refApply(syms, l, r) }
    }
    (learned.result(), state)
  }

  private def freqOf(texts: Seq[String]): Map[String, Long] =
    texts.flatMap(normWords).groupBy(identity)
      .map { case (w, ws) => w -> ws.length.toLong }

  private lazy val corpusFreq: Map[String, Long] =
    freqOf(Tables.documents(spark, sf).select("text").collect().toSeq
      .map(_.getString(0)))

  test("merge table equals a full driver-side relearning, rank for rank") {
    val (want, _) = refLearn(corpusFreq, Rounds)
    val got = TextOps.bpeMerges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == want)
  }

  test("per-doc BPE token counts match the reference tokenizer on every doc") {
    val (_, seg) = refLearn(corpusFreq, Rounds)
    val want = Tables.documents(spark, sf).select("doc_id", "text").collect().toSeq
      .flatMap { r =>
        val ws = normWords(r.getString(1))
        if (ws.isEmpty) None
        else Some((r.getLong(0), ws.length.toLong,
          ws.map(w => seg(w).length.toLong).sum))
      }.sortBy(_._1)
    val got = TextOps.bpeTokenCounts(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("per-source fertility equals the reference tokenizer's rollup (q170)") {
    val (_, seg) = refLearn(corpusFreq, Rounds)
    val want = Tables.documents(spark, sf).select("doc_id", "text", "source")
      .collect().toSeq
      .flatMap { r =>
        normWords(r.getString(1)).map(w => (r.getString(2), seg(w).length.toLong))
      }
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (src, toks) =>
        val nWords = toks.size.toLong
        val nTokens = toks.map(_._2).sum
        (src, nWords, nTokens,
          BigDecimal(nTokens.toDouble / nWords)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val got = TextOps.bpeFertility(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == want)
    // fertility is a real compression audit: after 16 merges it must
    // sit strictly between 1 token/word and the char+eow ceiling
    assert(got.forall { case (_, _, _, f) => f > 1.0 })
  }

  test("greedy equal-symbol runs and reassembly on a crafted corpus") {
    // 'aaa'/'aaaa' force the (a,a) merge into overlapping-run
    // territory where a non-greedy (or right-to-left) fold diverges:
    // greedy segments 'aaa' as [aa, a, </w>], never [a, aa, </w>]
    val docs = Seq(
      (0L, "aaa bb aaaa"),
      (1L, "aaa aaa bb aaaa baab"),
      (2L, "ab aab aaab ba")
    ).toDF("doc_id", "text")
    val (learned, state) = TextOps.bpeLearnState(spark, docs, merges = 3)
    val (want, wantState) =
      refLearn(freqOf(Seq("aaa bb aaaa", "aaa aaa bb aaaa baab", "ab aab aaab ba")), 3)
    assert(learned == want)
    val got = state.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toVector).toMap
    assert(got == wantState)
    // segments reassemble each word exactly (nothing dropped or
    // duplicated by the fold's skip handling)
    got.foreach { case (w, syms) => assert(syms.mkString == w + Eow) }
  }

  test("learning stays inside the iterative action budget") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    val merges = 8
    spark.sparkContext.addSparkListener(listener)
    try {
      TextOps.bpeLearnState(spark, Tables.documents(spark, sf), merges)
      // the listener bus drains asynchronously; give it a beat
      var last = -1
      var settled = 0
      while (settled < 3) {
        Thread.sleep(100)
        if (jobs.get == last) settled += 1 else { last = jobs.get; settled = 0 }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // one argmax ACTION per round (which also materializes the lazy
    // checkpoint); AQE may split an action into a small constant
    // number of scheduler jobs, but a regression to eager
    // checkpointing or per-round double actions blows this bound
    assert(jobs.get <= merges * 3 + 4,
      s"BPE learning ran ${jobs.get} scheduler jobs for $merges rounds")
  }

  test("prefix stability: the 16-budget run's snapshot at 8 IS the fresh 8-budget run") {
    // the ablation's one-loop optimization rests on this: the argmax
    // at round i depends only on rounds 1..i-1, so snapshotting a
    // larger run at budget b must reproduce the b-budget training
    // exactly - merges, counts, and the full dictionary segmentation
    val spark = TestSpark.spark
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    val (learned8, seg8) = graft.ops.TextOps.bpeLearnState(spark, docs, 8)
    val (learned16, snaps) = graft.ops.TextOps.bpeLearnSnapshots(spark, docs, Seq(8, 16))
    assert(learned16.take(8) == learned8, "merge sequences diverge in the shared prefix")
    val fresh = seg8.select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val snap = snaps(8).select("word", "syms").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(snap == fresh, "snapshot-at-8 segmentation differs from the fresh 8-run")
  }

  test("q235 ablation: fertility is monotone non-increasing in the merge budget") {
    // every extra merge can only shorten segmentations (a merge
    // replaces pairs, never splits), so per source the 16-merge
    // fertility must be <= the 8-merge fertility
    val out = graft.ops.TextOps.bpeFertilityAblation(TestSpark.spark, TestSpark.sf)
      .collect()
      .groupBy(_.getString(1))
      .map { case (src, rs) =>
        src -> rs.map(r => r.getLong(0) -> r.getDouble(4)).toMap
      }
    assert(out.nonEmpty)
    out.foreach { case (src, m) =>
      assert(m(16L) <= m(8L) + 1e-9,
        s"source $src: fertility rose with budget (${m(8L)} -> ${m(16L)})")
    }
  }
}
