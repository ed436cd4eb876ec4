package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source for USGS instantaneous-values WaterML-JSON responses.
  *
  * The reference harvests this feed over HTTP per US state and
  * stream-parses each response, emitting every non-null element of
  * `value.timeSeries[]` (reference harvest.js:12-17, 19-51, 70-87).
  * Here the responses are files on disk (one JSON object per file —
  * the zero-egress stand-in for the HTTP GET; a DSv2 TableProvider
  * over the REST API would slot in behind the same function), parsed
  * with a declared schema instead of the reference's schemaless
  * inserts (reference mongodb.js:8-11).
  *
  * Scale notes: the schema covers only the paths the pipeline reads —
  * Jackson skips unprojected subtrees, and at 1000-executor scale each
  * response file parses independently (one task per file; the
  * reference fetched states strictly sequentially, harvest.js:94-102).
  * PERMISSIVE mode + `_corrupt` column replaces the reference's
  * silent skip of malformed chunks.
  */
object WaterML {

  /** Exactly the field paths read by the reference's map functions
    * (reference mapreduce.js:3-34); everything else in the feed is
    * schema-pruned at parse time. */
  val geogLocation: StructType = StructType(Seq(
    StructField("srs", StringType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType)))

  val sourceInfo: StructType = StructType(Seq(
    StructField("siteName", StringType),
    StructField("siteCode", ArrayType(StructType(Seq(
      StructField("value", StringType))))),
    StructField("geoLocation", StructType(Seq(
      StructField("geogLocation", geogLocation))))))

  val variable: StructType = StructType(Seq(
    StructField("variableCode", ArrayType(StructType(Seq(
      StructField("value", StringType))))),
    StructField("unit", StructType(Seq(
      StructField("unitAbbreviation", StringType)))),
    StructField("noDataValue", DoubleType)))

  val timeSeries: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("sourceInfo", sourceInfo),
    StructField("variable", variable),
    StructField("values", ArrayType(StructType(Seq(
      StructField("value", ArrayType(StructType(Seq(
        StructField("value", StringType),
        StructField("dateTime", StringType)))))))))))

  val responseSchema: StructType = StructType(Seq(
    StructField("value", StructType(Seq(
      StructField("timeSeries", ArrayType(timeSeries)))),
      nullable = true),
    StructField("_corrupt", StringType)))

  /** Read one-or-many WaterML response files → one row per time
    * series. The isNotNull filter reproduces the reference's null-skip
    * of array elements (harvest.js:37 — explode alone keeps null
    * elements as null rows); a `timeSeries`-less response contributes
    * zero rows (harvest.js:34-41). */
  def timeSeriesOf(spark: SparkSession, path: String): DataFrame =
    flatten(spark.read
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(responseSchema)
      .json(path))

  /** Streaming twin of [[timeSeriesOf]]: new response files landing in
    * `path` flow through the same parse/flatten plan incrementally —
    * the engine's version of the reference's continuous per-state
    * harvest loop (harvest.js:90-102), with ingest decoupled from the
    * batch merge exactly as the reference decouples harvest from its
    * mapReduce stages. */
  def timeSeriesStreamOf(spark: SparkSession, path: String): DataFrame =
    flatten(spark.readStream
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(responseSchema)
      .json(path))

  private def flatten(raw: DataFrame): DataFrame =
    raw
      .select(explode(col("value.timeSeries")).as("ts"))
      .filter(col("ts").isNotNull)
      .select(col("ts.*"))
}
