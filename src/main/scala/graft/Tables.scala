package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (TESTDATA.md).
  *
  * One parquet file (or directory) per table under a scale-factor dir.
  * Centralizing the reads keeps every operator behind a single scan
  * entry point: at cluster scale this is where partition discovery,
  * bucketing metadata, or a DSv2 catalog would plug in — queries stay
  * unchanged.
  *
  * The reference engine's analog is `mongodb.getCollection(name)`
  * (reference mongodb.js:26-45), which maps logical collection names to
  * storage; here the storage is columnar parquet so column pruning and
  * predicate pushdown reach the scan for free.
  */
object Tables {
  // Memoized parquet SCHEMA per path (not DataFrame per session): the
  // expensive, repeated part of spark.read.parquet is schema inference
  // — a footer-reading Spark job per call — while the StructType it
  // yields is immutable and session-independent. Caching the schema
  // and re-applying it via spark.read.schema(...) skips that job on
  // every later load (any session), and the cache holds only strings
  // and StructTypes: no DataFrame values, hence no strong
  // value→SparkSession chain, so dropped test sessions are fully
  // collectable (the previous WeakHashMap[SparkSession, DataFrame]
  // design pinned its own weak keys through df.sparkSession and could
  // never evict). File listing for a single parquet file is a
  // filesystem stat, not a job, and stays per-read.
  //
  // Cache entries are keyed on (path, mtime, length) — [[statKey]] —
  // not path alone: the driver regenerates the testdata parquet
  // between rounds, and a path-keyed entry surviving an in-place
  // regeneration with a DIFFERENT physical encoding would re-apply the
  // stale schema via spark.read.schema and bypass the loud-failure
  // contract (e.g. a cached LongType nanos schema over a new micros
  // file reads micros as nanos → timestamps silently off by 1000×).
  // A stat is a filesystem call, not a Spark job, so the guard is free.
  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, org.apache.spark.sql.types.StructType]

  /** Cache key that changes when the file (or partitioned-table
    * directory: replacing part-files updates the dir's mtime) is
    * regenerated in place. A missing path yields a stable key and the
    * subsequent schema inference fails loudly as before. */
  private def statKey(path: String): String = {
    val f = new java.io.File(path)
    s"$path@${f.lastModified}:${f.length}"
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.getOrElseUpdate(statKey(path), spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Scoped save-set-restore of the session-wide nanosAsLong conf,
    * shared by every nanos-timestamp read path (batch events load and
    * the streaming schema probe). The conf is session-global, so two
    * threads interleaving set/restore on the same SparkSession could
    * leak the conf or break a concurrent schema inference; the lock
    * serializes the (brief) schema-inference window. Single-JVM scope
    * is enough — the conf only matters on the driver at analysis time. */
  private val nanosConfLock = new Object
  private[graft] def withNanosAsLong[T](spark: SparkSession)(f: => T): T =
    nanosConfLock.synchronized {
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "true")
      try f
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** events loader, resilient to the physical encoding of `ts`.
    *
    * The generator has shipped this column two ways across testdata
    * regenerations: standard parquet `timestamp[us]` (current) and
    * legacy INT64 TIMESTAMP(NANOS) (older rounds). The contract here is
    * fixed regardless: callers always see `ts: TIMESTAMP_NTZ` (session
    * is pinned UTC, so the LTZ→NTZ cast is value-preserving), so the 17
    * event-family query bodies never change when the files do.
    *
    * Branch selection is by *inferred* schema, never by assumption:
    *   - inference succeeds → TimestampNTZType passes through,
    *     TimestampType casts to NTZ, LongType (a nanos file read under
    *     an already-set nanosAsLong conf) takes the integer ns→us path;
    *   - inference throws → that is the signature of a nanos file read
    *     WITHOUT the legacy conf (the analyzer rejects INT64
    *     TIMESTAMP(NANOS) during eager schema inference; a per-read
    *     datasource option cannot fix it) → retry under
    *     [[withNanosAsLong]] and convert. `div` keeps the ns→us
    *     conversion in integer space — a double division would lose
    *     precision above 2^53 ns (~1970+104 days). The conf is restored
    *     immediately after inference; the task-side scan does not
    *     re-read it (verified: count() succeeds after restore).
    * Any other `ts` type fails loudly — silently proceeding is how the
    * round-14 outage (17 queries dead on one hard-coded encoding) would
    * recur.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val path = s"$dir/events.parquet"
    val schema = eventsRawSchema(spark, path)
    val raw = spark.read.schema(schema).parquet(path)
    schema("ts").dataType match {
      case TimestampNTZType => raw
      case TimestampType    => raw.withColumn("ts", col("ts").cast(TimestampNTZType))
      case LongType =>
        raw.withColumn("ts", expr("CAST(timestamp_micros(ts div 1000) AS TIMESTAMP_NTZ)"))
      case other =>
        throw new IllegalStateException(
          s"$path: events.ts has unsupported type $other — expected TIMESTAMP_NTZ, " +
            "TIMESTAMP, or INT64 nanos; refusing to guess")
    }
  }

  /** Schema of an events parquet file, whatever its `ts` encoding:
    * plain inference first (covers both `timestamp[us]` variants); if
    * that throws — the signature of a legacy INT64 TIMESTAMP(NANOS)
    * file, which the analyzer rejects during eager inference — retry
    * under [[withNanosAsLong]] (yielding LongType for ts). Shared by
    * the batch loader and the streaming schema probe so both branch on
    * the same evidence. */
  private[graft] def eventsRawSchema(
      spark: SparkSession, path: String): org.apache.spark.sql.types.StructType = {
    val key = statKey(path)
    schemaCache.get(key).getOrElse {
      try schemaCache.getOrElseUpdate(key, spark.read.parquet(path).schema)
      catch {
        case scala.util.control.NonFatal(_) =>
          withNanosAsLong(spark) {
            schemaCache.getOrElseUpdate(key, spark.read.parquet(path).schema)
          }
      }
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")

  /** embeddings loader with the same schema-drift resilience as
    * [[events]] (the round-14 lesson applied before it recurs): the
    * engine contract is `embedding: array<float>` — the type the
    * codegen'd CosineSimilarity kernel requires — whatever precision
    * the generator shipped. `array<float>` passes through;
    * `array<double>` down-casts ONLY after a sampled losslessness
    * check (below); anything else fails loudly.
    *
    * The downcast must be provably lossless because the DuckDB oracle
    * reads the same parquet at its native precision: a genuinely
    * double-precision corpus silently narrowed to float32 would
    * diverge every embedding oracle gate at once — the same
    * one-regeneration-kills-a-family outage class the schema branching
    * exists to prevent. So the double branch samples rows and verifies
    * each value round-trips double→float→double exactly (float32-
    * generated data does; true float64 data fails within a handful of
    * rows with probability ~1), failing loudly with the remediation
    * options rather than absorbing the drift. Memoized per file state
    * — one small bounded job per regeneration, not per query. */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, exists}
    import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
    val raw = load(spark, dir, "embeddings")
    raw.schema("embedding").dataType match {
      case ArrayType(FloatType, _) => raw
      case ArrayType(DoubleType, _) =>
        val path = s"$dir/embeddings.parquet"
        losslessVerified.getOrElseUpdate(statKey(path), {
          val lossy = raw.select(col("embedding"))
            .where(col("embedding").isNotNull).limit(4096)
            .where(exists(col("embedding"), d =>
              d.isNotNull && d =!= d.cast(FloatType).cast(DoubleType)))
            .take(1)
          if (lossy.nonEmpty) throw new IllegalStateException(
            s"$path: embedding is array<double> with values that do NOT " +
              "round-trip through float32 — refusing the silent downcast " +
              "(the DuckDB oracles read this parquet at double precision, " +
              "so narrowing would diverge every embedding gate). Either " +
              "regenerate as float32 or run the oracles with a matching " +
              "CAST(... AS FLOAT[]) on the embedding column.")
          true
        })
        raw.withColumn("embedding", col("embedding").cast(ArrayType(FloatType)))
      case other =>
        throw new IllegalStateException(
          s"$dir/embeddings.parquet: embedding has unsupported type $other — " +
            "expected array<float> or array<double>; refusing to guess")
    }
  }

  // Downcast-losslessness verdicts per embeddings file state (see
  // [[embeddings]]); value is always true — a lossy file throws
  // instead of caching.
  private val losslessVerified = scala.collection.concurrent.TrieMap.empty[String, Boolean]

  // Embedding dimension per table FILE STATE, probed from the first
  // non-null row ONCE and memoized: the array element count is a
  // property of the data files (parquet list types carry no length),
  // so keying by statKey makes every later withBucket/ANN call on that
  // table a pure narrow map with no extra probe job — previously each
  // call paid a one-row Spark job — while an in-place regeneration
  // with a different dimension invalidates naturally.
  private val dimCache = scala.collection.concurrent.TrieMap.empty[String, Int]

  /** Dimension of the `embedding` column of `dir`'s embeddings table
    * (cached per file state). Fails loudly if every embedding is null —
    * there is no dimension to bucket against. */
  def embeddingDim(spark: SparkSession, dir: String): Int =
    dimCache.getOrElseUpdate(statKey(s"$dir/embeddings.parquet"), {
      import org.apache.spark.sql.functions.{col, size}
      embeddings(spark, dir).where(col("embedding").isNotNull)
        .select(size(col("embedding"))).take(1)
        .headOption.map(_.getInt(0))
        .getOrElse(throw new IllegalArgumentException(
          s"$dir/embeddings.parquet has no non-null embedding to probe a dimension from"))
    })
}
