package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.SimilarityOps

/** q224 product quantization. The right-endpoint invariant mirrors
  * RecallSweepSpec's IVF full-probe test: a shortlist as large as the
  * corpus makes the ADC stage pure candidate ordering — the exact
  * rerank must then EQUAL the exact L2 top-k row for row. At the
  * production shortlist the recall against exact L2 is measured with
  * a floor, and the codes must be well-formed (m columns in [0, k)). */
class PqSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private val K = 10

  private def exactL2TopK(queryId: Long, k: Int): Seq[Long] = {
    val e = Tables.embeddings(spark, sf)
    val q = e.filter(col("vec_id") === queryId).select(col("embedding").as("q_emb"))
    val d2 = aggregate(
      zip_with(col("embedding"), col("q_emb"),
        (x, w) => (x.cast("double") - w.cast("double")) * (x.cast("double") - w.cast("double"))),
      lit(0.0d), (acc, v) => acc + v)
    e.filter(col("vec_id") =!= queryId).crossJoin(broadcast(q))
      .select(col("vec_id"), d2.as("d2"))
      .orderBy(col("d2"), col("vec_id")).limit(k)
      .collect().map(_.getLong(0)).toSeq
  }

  test("codes are well-formed: m code columns, every code in [0, k)") {
    val out = SimilarityOps.pqRerank(spark, sf)
    val codeCols = out.columns.filter(_.startsWith("code"))
    assert(codeCols.length == 8)
    val bad = out.filter(codeCols.map(c => col(c) < 0 || col(c) >= 8).reduce(_ || _))
    assert(bad.count() == 0, "a code id escaped [0, k)")
  }

  test("corpus-wide shortlist makes PQ exact: equals the L2 top-k row for row") {
    val n = Tables.embeddings(spark, sf).count().toInt
    val full = SimilarityOps.pqRerank(spark, sf, shortlist = n, topK = K)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exactL2TopK(0L, K),
      "full-shortlist PQ must reduce to the exact ranking")
  }

  test("production shortlist keeps recall@10 above the floor") {
    val exact = exactL2TopK(0L, K).toSet
    val pq = SimilarityOps.pqRerank(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val recall = pq.intersect(exact).size.toDouble / K
    assert(recall >= 0.7, s"PQ recall@10 = $recall under the 0.7 floor")
  }

  test("ivf-pq: full probe + corpus shortlist reduces to the exact L2 ranking") {
    val n = Tables.embeddings(spark, sf).count().toInt
    val full = SimilarityOps.ivfPqTopK(spark, sf,
      nprobe = 8, shortlist = n, topK = K)
      .collect().map(_.getLong(0)).toSeq
    assert(full == exactL2TopK(0L, K),
      "probing every cell with a corpus-wide shortlist must be exact")
  }

  test("ivf-pq: production knobs keep recall@10 above the floor") {
    val exact = exactL2TopK(0L, K).toSet
    val got = SimilarityOps.ivfPqTopK(spark, sf).collect().map(_.getLong(0)).toSet
    val recall = got.intersect(exact).size.toDouble / K
    assert(recall >= 0.6, s"IVF-PQ recall@10 = $recall under the 0.6 floor")
  }

  test("ivf-pq: candidates come only from probed cells and codes are in range") {
    val out = SimilarityOps.ivfPqTopK(spark, sf).collect()
    assert(out.nonEmpty)
    val cells = out.map(_.getLong(1)).toSet
    assert(cells.size <= 2, s"nprobe=2 but ${cells.size} cells in output")
    val codeIdx = 2 until 10
    out.foreach(r => codeIdx.foreach { i =>
      val c = r.getLong(i)
      assert(c >= 0 && c < 8, s"code $c out of range")
    })
  }

  test("adc distances are non-negative and rerank order is by exact d2") {
    val df = SimilarityOps.pqRerank(spark, sf)
    val ai = df.columns.indexOf("approx_d2")
    val di = df.columns.indexOf("d2")
    val out = df.collect()
    assert(out.forall(_.getDouble(ai) >= 0.0), "negative ADC distance")
    val d2s = out.map(_.getDouble(di))
    assert(d2s.sameElements(d2s.sorted), "output not ordered by exact d2")
  }

  test("grouped training: all m codebooks cost ONE loop of jobs, not m loops") {
    // the lloydCentroidsGrouped scale fact as a scheduler budget: the
    // m=8 subspace codebooks train in one grouped loop (1 seed collect
    // + iters-1 update rounds, each one action), so a full pqRerank is
    // a HANDFUL of jobs. A regression to m sequential per-subspace
    // loops adds ~m*(iters) collect actions and blows this bound by
    // design. Bound is generous (AQE can split an action into a small
    // constant number of scheduler jobs).
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      SimilarityOps.pqRerank(spark, sf).collect()
      var last = -1
      var settled = 0
      while (settled < 3) {
        Thread.sleep(100)
        if (jobs.get == last) settled += 1 else { last = jobs.get; settled = 0 }
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    // one dim probe + 1 seed collect + (iters-1)=1 grouped update + the
    // serve ≈ 4 actions; ×3 for AQE sub-jobs, +4 slack. The old
    // 8-sequential-loop form ran 8×2 training actions alone and lands
    // ~3× past this bound.
    assert(jobs.get <= 16, s"pqRerank ran ${jobs.get} scheduler jobs — " +
      "did subspace training regress to per-subspace loops?")
  }
}
