package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.L2Argmin

/** The codegen'd Lloyd-assignment kernel (q150/q162/q202/q210/q218/
  * q238 hot loop). Obligations: hand-computed argmin on floats AND
  * doubles, the lowest-cl strict-< tie rule, length-mismatch skip,
  * empty-model sentinel, and interpreted/codegen parity (the eval
  * path must agree with the generated code bit-for-bit — it is the
  * fallback the oracle never sees). */
class L2ArgminSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val model = Seq(
    1L -> Array(0.0, 0.0),
    2L -> Array(1.0, 0.0),
    5L -> Array(1.0, 0.0)) // duplicate of cl=2: tie must go to 2

  test("float input: hand-computed argmin, tie to lowest cl") {
    val df = Seq(
      (10L, Array(0.1f, 0.0f)),   // nearest cl=1 (d2=0.01)
      (11L, Array(0.9f, 0.1f)),   // nearest cl=2 (tie with 5 — strict < keeps 2)
      (12L, Array(0.5f, 0.0f))    // exact midpoint: d2 0.25 both — lowest cl wins → 1
    ).toDF("vec_id", "embedding")
    val best = L2Argmin.l2Argmin(col("embedding"), model)
    val got = df.select(col("vec_id"), best.getField("cl").as("cl"),
        best.getField("d2").as("d2"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(10L)._1 == 1L)
    assert(got(11L)._1 == 2L, "tie between equal centroids must keep the first (lowest cl)")
    assert(got(12L)._1 == 1L, "exact-midpoint tie must keep the lowest cl")
    // float upcast exactness: 0.1f widens to the double value of the
    // FLOAT 0.1 (0.100000001490116...), so d2 is that value squared
    val x = 0.1f.toDouble
    assert(got(10L)._2 == x * x)
  }

  test("double input, length-mismatch skip, empty model sentinel") {
    val mixed = Seq(1L -> Array(0.0, 0.0), 2L -> Array(1.0, 0.0, 0.0))
    val df = Seq((1L, Array(3.0, 4.0))).toDF("vec_id", "embedding")
    val best = L2Argmin.l2Argmin(col("embedding"), mixed)
    val got = df.select(best.getField("cl"), best.getField("d2"))
      .as[(Long, Double)].head()
    assert(got == ((1L, 25.0)), "3-dim centroid must be skipped for a 2-dim vector")
    val empty = L2Argmin.l2Argmin(col("embedding"), Seq.empty)
    val sentinel = df.select(empty.getField("cl"), empty.getField("d2"))
      .as[(Long, Double)].head()
    assert(sentinel == ((-1L, Double.MaxValue)))
  }

  test("interpreted eval agrees with codegen bit-for-bit") {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types._
    val expr = L2Argmin(
      BoundReference(0, ArrayType(FloatType, containsNull = false), nullable = false),
      model.map(_._1).toArray, model.map(_._2).toArray)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 50).map(_ => Array.fill(2)(rnd.nextFloat()))
    // interpreted path, driver-side
    val interp = rows.map { v =>
      val r = expr.eval(new GenericInternalRow(Array[Any](ArrayData.toArrayData(v))))
        .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
      (r.getDouble(0), r.getLong(1))
    }
    // codegen path, through the executor
    val best = L2Argmin.l2Argmin(col("embedding"), model)
    val gen = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), best.getField("d2"), best.getField("cl"))
      .as[(Long, Double, Long)].collect().sortBy(_._1)
      .map(r => (r._2, r._3)).toSeq
    assert(gen == interp)
  }
}
