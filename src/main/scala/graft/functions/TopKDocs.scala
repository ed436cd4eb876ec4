package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a BOUNDED-BUFFER custom aggregate — the scale
  * alternative to the `row_number() OVER (PARTITION BY g ORDER BY …)`
  * window, which sorts every group's full slice of the corpus to keep
  * k rows of it. This Aggregator's buffer never holds more than k
  * entries BY CONSTRUCTION (reduce inserts then truncates; merge
  * concatenates 2k then truncates), so map-side partial aggregation
  * ships k-sized states per group per partition and the shuffle moves
  * O(groups × k) — at 100 TB the window form moves and sorts the
  * corpus, this form moves kilobytes.
  *
  * Ordering is (value desc, id asc) — a total order, so the result is
  * deterministic under arbitrary splits and merge orders (same
  * contract the HeavyHitters sketch proves for its merge). The output
  * is a formatted "id:micro-units" string: the value is emitted in
  * exact integer micro-units because cross-engine double-to-string
  * formatting differs while integer formatting cannot.
  */
case class TopKDocs(k: Int)
    extends Aggregator[(Long, Double), Seq[(Double, Long)], String] {
  require(k > 0, s"k must be positive, got $k")

  // quality desc, then doc_id asc — total order
  private def ord: Ordering[(Double, Long)] =
    Ordering.by[(Double, Long), (Double, Long)] { case (q, id) => (-q, id) }

  override def zero: Seq[(Double, Long)] = Nil
  override def reduce(buf: Seq[(Double, Long)],
                      in: (Long, Double)): Seq[(Double, Long)] =
    ((in._2, in._1) +: buf).sorted(ord).take(k)
  override def merge(a: Seq[(Double, Long)],
                     b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    (a ++ b).sorted(ord).take(k)
  override def finish(buf: Seq[(Double, Long)]): String =
    buf.sorted(ord)
      .map { case (q, id) => s"$id:${math.round(q * 1e6)}" }
      .mkString(",")
  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
