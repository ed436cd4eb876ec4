package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Passage chunking (q140) and passage-grain BM25 (q141) invariants:
  * full coverage, exact window geometry, overlap, and the straddle
  * property the overlap exists to provide. */
class PassageSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private val W = 40
  private val S = 30
  private lazy val passages =
    TextOps.chunkPassages(spark, sf, window = W, stride = S).cache()
  private lazy val docLens = Tables.documents(spark, sf)
    .select($"doc_id",
      size(split(trim(regexp_replace(lower($"text"), "[^a-z0-9]+", " ")), " "))
        .cast("bigint").as("len"))

  test("chunk geometry: every passage but a doc's last is exactly window words, ids are dense from 0") {
    val perDoc = passages.groupBy($"doc_id").agg(
      count(lit(1)).as("n_passages"), max($"passage_id").as("max_pid"),
      min($"passage_id").as("min_pid"))
    assert(perDoc.filter($"min_pid" =!= 0 ||
      $"max_pid" =!= $"n_passages" - 1).count() == 0, "passage ids not dense from 0")
    val nonLast = passages.join(
      perDoc.select($"doc_id", $"max_pid"), "doc_id")
      .filter($"passage_id" < $"max_pid")
    assert(nonLast.filter($"n_words" =!= W).count() == 0,
      "a non-final passage is not exactly `window` words")
    assert(passages.filter($"n_words" > W || $"n_words" < 1).count() == 0)
  }

  test("chunk coverage: passage word counts reconstruct every word position of every doc") {
    // passage p covers positions [p*stride, p*stride + n_words); dense
    // ids + exact window geometry mean total coverage equals
    // len + (overlap per interior boundary): sum(n_words) =
    // len + max_pid * (window - stride) ... except the final passage,
    // whose length is len - max_pid*stride. Check that closed form.
    val perDoc = passages.groupBy($"doc_id").agg(
      sum($"n_words").as("sum_w"), max($"passage_id").as("max_pid"))
      .join(docLens, "doc_id")
    val bad = perDoc.filter(
      $"sum_w" =!= $"max_pid" * W + ($"len" - $"max_pid" * S))
    assert(bad.count() == 0, "coverage identity violated")
    // and the passage count matches the documented formula
    val cnt = perDoc.filter(
      $"max_pid" =!= greatest(ceil(($"len" - W).cast("double") / S), lit(0.0)).cast("long"))
    assert(cnt.count() == 0, "passage count diverges from 1 + ceil((len-window)/stride)")
  }

  test("chunk overlap: consecutive passages share exactly window - stride words") {
    val a = passages.select($"doc_id", $"passage_id", split($"passage", " ").as("wa"))
    val b = passages.select($"doc_id", ($"passage_id" - 1).as("passage_id"),
      split($"passage", " ").as("wb"))
    val joined = a.join(b, Seq("doc_id", "passage_id"))
      .filter(size($"wa") === W) // interior pairs (next passage exists ⇒ this one is full)
      .select(
        slice($"wa", S + 1, W - S).as("tail_a"),
        slice($"wb", 1, W - S).as("head_b"))
    assert(joined.count() > 0, "fixture sanity: multi-passage docs exist")
    assert(joined.filter($"tail_a" =!= $"head_b").count() == 0,
      "passage p's tail is not passage p+1's head — a straddling span would be unfindable")
  }

  test("passage BM25: every scored passage contains a query term; ranking is score-descending") {
    val q = Seq("data", "analysis", "model")
    val top = TextOps.bm25PassageTopK(spark, sf, q, k = 20, window = W, stride = S)
    // ordering from the TakeOrderedAndProject output itself (a join
    // would destroy it)
    val scores = top.select($"bm25").collect().map(_.getDouble(0)).toSeq
    assert(scores.nonEmpty)
    assert(scores == scores.sortBy(-_), "top-k not in descending score order")
    val joined = top.join(passages, Seq("doc_id", "passage_id"))
    assert(joined.count() == scores.length, "every scored passage exists in the chunk set")
    val noTerm = joined.filter(!q.map(t =>
      array_contains(split($"passage", " "), t)).reduce(_ || _))
    assert(noTerm.count() == 0, "a top passage contains no query term")
  }
}
