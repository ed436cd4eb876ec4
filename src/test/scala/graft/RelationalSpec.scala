package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every registered query runs and matches its declared column set") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val n = df.count()
      assert(n >= 0, s"$name failed to execute")
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has oracle sql or a documented omission") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // queries without oracle must be the non-SQL-expressible set
    assert(noOracle.forall(n => n.contains("minhash") || n.contains("simhash") ||
      n.contains("lsh") || n.contains("multimodal") || n.contains("stream") ||
      n.contains("ivf") || n.contains("approx")),
      s"missing oracle for: $noOracle")
  }

  test("q01 aggregates match hand-computed values on sf0.001") {
    val rows = SparkEntry.queries("q01_agg_pricing")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(9)).toMap
    val total = rows.values.sum
    val expected = Tables.lineitem(spark, sf)
      .filter(org.apache.spark.sql.functions.col("l_shipdate") <=
        org.apache.spark.sql.functions.to_timestamp_ntz(
          org.apache.spark.sql.functions.lit("1998-09-02"))).count()
    assert(total == expected)
  }

  test("SQL-surface ops leave no temp views behind and stay executable after the drop") {
    // the three spark.sql entry paths create per-call temp views;
    // analysis is eager so they must drop them before returning —
    // otherwise bench (reps × warmup × queries) grows the session
    // catalog without bound.
    val dfs = Seq(
      graft.ops.Relational.sqlSubquery(spark, sf),
      graft.ops.RelationalExt.aggFilterClause(spark, sf),
      graft.ops.RelationalExt.lateralTopN(spark, sf))
    val leaked = spark.catalog.listTables().collect().map(_.name).filter(n =>
      n.startsWith("customer_v_") || n.startsWith("lineitem_v_") ||
        n.startsWith("nation_v_") || n.startsWith("supplier_v_"))
    assert(leaked.isEmpty, s"leaked temp views: ${leaked.mkString(", ")}")
    // the resolved plans must not need the views at execution time
    dfs.foreach(df => assert(df.count() > 0))
  }

  test("q06 window rank: at most 3 rows per customer, rnk in 1..3") {
    val df = SparkEntry.queries("q06_window_rank")(spark, sf)
    import spark.implicits._
    val bad = df.groupBy($"o_custkey").count().filter($"count" > 3).count()
    assert(bad == 0)
    assert(df.filter($"rnk" < 1 || $"rnk" > 3).count() == 0)
  }
}
