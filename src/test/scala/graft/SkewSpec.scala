package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Skew

class SkewSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join") {
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey", $"l_quantity")
    val parts = Tables.part(spark, sf).select($"p_partkey", $"p_brand")
    val plain = li.join(parts, $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand").agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val salted = Skew.saltedJoin(li, parts, $"l_partkey", $"p_partkey", factor = 8)
      .groupBy($"p_brand").agg(count(lit(1)).as("n"), round(sum($"l_quantity"), 2).as("q"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("salt spreads a hot key across multiple salt values") {
    // one hot key repeated heavily
    val hot = Seq.fill(1000)(1L).toDF("k")
    val dim = Seq((1L, "x")).toDF("j", "v")
    val salted = hot.withColumn("__salt", (rand(42) * 8).cast("int"))
    val used = salted.select(countDistinct($"__salt")).head().getLong(0)
    assert(used >= 6, s"salt only used $used of 8 buckets")
    // and the join still matches every row
    assert(Skew.saltedJoin(hot, dim, $"k", $"j", 8).count() == 1000)
  }
}
