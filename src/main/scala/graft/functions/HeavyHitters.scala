package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed `Aggregator` — the
  * frequent-items member of the engine's mergeable-sketch family
  * (HLL q93, KLL-style quantiles q100): bounded memory (`capacity`
  * counters) regardless of input size, partial (map-side) aggregation
  * and shuffle-merge exactly like built-in aggregates, and the
  * MERGEABLE-summaries semantics of Agarwal et al. 2012 (merge = sum
  * counters, then subtract the (capacity+1)-th largest and drop
  * non-positive — error bounds ADD across merges instead of breaking).
  *
  * Guarantees (m = capacity, N = total items): every item with true
  * count > N/(m+1) is present in the summary, and every estimate sits
  * in [true − N/(m+1), true]. The driver-gate query (q108) exposes
  * those guarantees as oracle-hashable TRUE flags over the exact
  * top-k — the q100/q54 "sketch gated on its exact twin" pattern —
  * because the raw estimates themselves are partitioning-dependent
  * (which counters survive a decrement depends on arrival order).
  *
  * The corpus use case is template/boilerplate detection: the words
  * (or shingles) that dominate a 100 TB corpus found in one pass with
  * KBs of state per partition, no full word-count shuffle.
  */
class HeavyHitters(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], word: String): Map[String, Long] =
    b.get(word) match {
      case Some(c) => b.updated(word, c + 1L)
      case None if b.size < capacity => b.updated(word, 1L)
      // all counters occupied: decrement everything (the arriving
      // word's +1 and one unit of every counter annihilate — the
      // classic MG step), dropping zeros to free slots
      case None => b.collect { case (w, c) if c > 1L => w -> (c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(w => w -> (a.getOrElse(w, 0L) + b.getOrElse(w, 0L))).toMap
    if (sum.size <= capacity) sum
    else {
      // subtract the (capacity+1)-th largest count from every counter
      // and keep the positive ones — the mergeable-summaries combine
      val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(capacity)
      sum.collect { case (w, c) if c > cut => w -> (c - cut) }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
