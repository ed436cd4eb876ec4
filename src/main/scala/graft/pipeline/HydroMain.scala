package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Program entry for the hydro pipeline — the engine's analog of the
  * reference's `node harvest.js` run (harvest.js:146-149): read
  * WaterML responses, run source→features→merge→collect, print the
  * FeatureCollection JSON, and (optionally) write the distributed
  * JSON-lines form.
  *
  * Usage: HydroMain <watermlDir> [outDir]
  */
object HydroMain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: HydroMain <watermlDir> [outDir]")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-hydro")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val doc = HydroPipeline.run(spark, args(0))
      .select(to_json(struct(lit("FeatureCollection").as("type"), col("data"))))
      .head().getString(0)
    println(doc)
    args.lift(1).foreach { out =>
      val merged = HydroPipeline.mergeSites(
        HydroPipeline.toFeatures(
          graft.sources.WaterML.timeSeriesOf(spark, args(0))))
      HydroPipeline.writeFeatureCollectionStreamed(merged, out)
    }
    spark.stop()
  }
}
