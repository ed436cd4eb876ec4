package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §7 scale notes / builder
  * brief: "skewed keys → salting or AQE skew-join").
  *
  * AQE's runtime skew-join handling covers sort-merge joins whose
  * partitions it can split; explicit salting remains the tool when the
  * skew is in a *shuffle-hash/broadcast-ineligible* join or when one
  * hot key dominates so hard that even split partitions all carry the
  * same key. The transform here is the standard replicate-and-salt:
  * the skewed (large, hot-keyed) side gets a uniform random salt in
  * [0, f); the other side is replicated f times with every salt value;
  * the join key becomes (key, salt). Results are identical to the
  * unsalted join — verified by equivalence test — while the hot key's
  * rows spread over f reducers instead of one.
  */
object Skew {

  /** Inner equi-join with an f-way salted key. `leftSkewed` is the
    * side with hot keys (salted randomly, deterministic given the
    * seed); `right` is replicated f times. */
  def saltedJoin(leftSkewed: DataFrame, right: DataFrame,
                 leftKey: Column, rightKey: Column, factor: Int): DataFrame = {
    require(factor > 1, "salt factor must be > 1")
    val l = leftSkewed.withColumn("__salt",
      (rand(42) * factor).cast("int"))
    val r = right.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    l.join(r, leftKey === rightKey && l("__salt") === r("__salt"))
      .drop("__salt")
  }
}
