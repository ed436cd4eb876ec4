package graft

import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{BINARY, DOUBLE, INT64}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift resilience for the events loader (round-14 outage
  * class): the testdata generator has shipped `ts` as legacy INT64
  * TIMESTAMP(NANOS) and as standard `timestamp[us]` across
  * regenerations, and a loader hard-coded to either encoding dies on
  * the other. This spec writes one tiny fixture in EACH physical
  * encoding — micros-NTZ (Spark write of TIMESTAMP_NTZ), micros-LTZ
  * (Spark write of TIMESTAMP), and nanos (parquet-java ExampleWriter,
  * since Spark cannot write TIMESTAMP(NANOS)) — and asserts
  * `Tables.events` returns byte-identical TIMESTAMP_NTZ rows from all
  * three. If a future regeneration flips the encoding again, the
  * loader absorbs it; if a NEW encoding appears, the loader's loud
  * failure (not silent wrong answers) is also pinned here.
  */
class EventsEncodingSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // Deliberately includes a sub-millisecond component (123456 us) so a
  // ns→us or us→ms truncation bug cannot hide, and values both before
  // and after an hour boundary so ordering survives conversion.
  private val rows = Seq(
    (1L, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0, 123456000), 10L, "click", 1.5, "{}"),
    (2L, java.time.LocalDateTime.of(2024, 1, 1, 0, 59, 59, 999999000), 11L, "view", 2.0, "{\"a\":1}"),
    (3L, java.time.LocalDateTime.of(2024, 3, 15, 12, 30, 0, 0), 10L, "purchase", 99.99, "{}")
  )

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-evt-$tag").toString

  private def sparkFixture(tsType: DataType): String = {
    val dir = tmpDir(tsType.simpleString)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val data = rows.map { case (id, ldt, uid, et, v, p) =>
      val tsVal: Any = tsType match {
        case TimestampNTZType => ldt
        // session tz is pinned UTC, so the instant carries the same
        // wall-clock fields as the NTZ fixture
        case TimestampType => java.sql.Timestamp.valueOf(ldt)
        case other         => fail(s"unhandled fixture type $other")
      }
      Row(id, tsVal, uid, et, v, p)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Spark cannot write INT64 TIMESTAMP(NANOS); drop to parquet-java's
    * example writer to produce a file physically identical to the old
    * generator's output. */
  private def nanosFixture(): String = {
    val dir = tmpDir("nanos")
    val msg: MessageType = Types.buildMessage()
      .required(INT64).named("event_id")
      .required(INT64)
      .as(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS)).named("ts")
      .required(INT64).named("user_id")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("event_type")
      .required(DOUBLE).named("value")
      .required(BINARY).as(LogicalTypeAnnotation.stringType()).named("props")
      .named("events")
    val writer = ExampleParquetWriter
      .builder(new HadoopPath(s"$dir/events.parquet"))
      .withType(msg)
      .build()
    val factory = new SimpleGroupFactory(msg)
    try rows.foreach { case (id, ldt, uid, et, v, p) =>
      val g = factory.newGroup()
      g.append("event_id", id)
      val epochNanos =
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L + ldt.getNano
      g.append("ts", epochNanos)
      g.append("user_id", uid)
      g.append("event_type", et)
      g.append("value", v)
      g.append("props", p)
      writer.write(g)
    } finally writer.close()
    dir
  }

  private def canonical(dir: String): Seq[String] = {
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampNTZType,
      s"$dir: loader contract is ts: TIMESTAMP_NTZ, got ${df.schema("ts").dataType}")
    df.orderBy($"event_id")
      .select($"event_id", date_format($"ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        $"user_id", $"event_type", $"value", $"props")
      .collect().map(_.mkString("|")).toSeq
  }

  test("events loader yields identical NTZ rows from micros-NTZ, micros-LTZ, and nanos files") {
    val ntz = canonical(sparkFixture(TimestampNTZType))
    assert(ntz.exists(_.contains("2024-01-01 00:00:00.123456")),
      s"sub-millisecond precision lost: $ntz")
    assert(canonical(sparkFixture(TimestampType)) == ntz)
    assert(canonical(nanosFixture()) == ntz)
  }

  test("embeddings loader normalizes array<double> files to the array<float> contract") {
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val vals = Seq((1L, Seq(0.25, -1.5, 3.0), 0), (2L, Seq(0.5, 0.75, -2.0), 1))
    def fixture(asDouble: Boolean): String = {
      val dir = tmpDir(if (asDouble) "embd" else "embf")
      val df =
        if (asDouble) vals.toDF("vec_id", "embedding", "label")
        else vals.map { case (id, e, l) => (id, e.map(_.toFloat), l) }
          .toDF("vec_id", "embedding", "label")
      df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      dir
    }
    def rows(dir: String): Seq[(Long, Seq[Float])] = {
      val df = Tables.embeddings(spark, dir)
      assert(df.schema("embedding").dataType == ArrayType(FloatType),
        s"loader contract is embedding: array<float>, got ${df.schema("embedding").dataType}")
      df.orderBy($"vec_id").select($"vec_id", $"embedding")
        .as[(Long, Seq[Float])].collect().toSeq
    }
    // float32-exact values round-trip identically through either encoding
    assert(rows(fixture(asDouble = true)) == rows(fixture(asDouble = false)))
    // and the float kernel accepts the normalized column
    val dir = fixture(asDouble = true)
    val sim = Tables.embeddings(spark, dir).as("a")
      .crossJoin(Tables.embeddings(spark, dir).as("b"))
      .select(graft.functions.CosineSimilarity.cosineSimilarity(
        $"a.embedding", $"b.embedding").as("c"))
    assert(sim.count() == 4)
  }

  test("events loader fails loudly on an unsupported ts type instead of guessing") {
    val dir = tmpDir("bad")
    Seq((1L, "not-a-timestamp")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Tables.events(spark, dir))
    assert(e.getMessage.contains("unsupported type"))
  }
}
