package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Storage-format abstraction — the engine's equivalent of the
  * reference's collection layer (reference mongodb.js:26-53: logical
  * name → mongo collection, insert array-or-single). The engine is
  * parquet-first (columnar + stats + pushdown); JSON/CSV/ORC cover
  * interchange. A MongoDB deployment would swap `format("mongodb")`
  * in here — the connector is not in this image (SURVEY.md §7 risk
  * register), and nothing else in the engine would change.
  *
  * Scale notes: writes go through the normal committer (atomic,
  * task-retry-safe at 1000 executors); text formats carry no stats so
  * reads declare an explicit schema — schema inference over 100 TB of
  * JSON is a full extra scan.
  */
object Formats {
  val Supported: Seq[String] = Seq("parquet", "orc", "json", "csv")

  def write(df: DataFrame, path: String, format: String,
            mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(Supported.contains(format), s"unsupported format: $format")
    val w = df.write.mode(mode).format(format)
    (if (format == "csv") w.option("header", "true") else w).save(path)
  }

  def read(spark: SparkSession, path: String, format: String,
           schema: Option[StructType] = None): DataFrame = {
    require(Supported.contains(format), s"unsupported format: $format")
    val r = spark.read.format(format)
    val r2 = schema.map(r.schema).getOrElse(r)
    (if (format == "csv") r2.option("header", "true") else r2).load(path)
  }

  /** Persist with Hive-style directory partitioning: one directory
    * per distinct value tuple of `cols`, so a reader filtering on a
    * partition column never OPENS the other directories — partition
    * PRUNING, visible as `PartitionFilters` on the scan
    * (PlanSpec-asserted via q103). The layout complement of
    * [[writeBucketed]]: partitioning prunes coarse, low-cardinality
    * dimensions (source, date, language) at file-listing time;
    * bucketing co-locates high-cardinality join/probe keys within
    * what survives the pruning. At 100 TB the partition columns are
    * the difference between listing a handful of directories and
    * listing the corpus. Cardinality is the caveat: a high-cardinality
    * partition column explodes the directory count (and small-files
    * the table) — that key belongs in bucketing instead. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
                       format: String = "parquet"): Unit = {
    require(Supported.contains(format), s"unsupported format: $format")
    require(cols.nonEmpty, "writePartitioned needs at least one partition column")
    df.write.mode(SaveMode.Overwrite).format(format)
      .partitionBy(cols: _*).save(path)
  }

  /** Re-land ONLY the partitions present in `df`, leaving every other
    * partition of an existing [[writePartitioned]] layout untouched —
    * dynamic partition overwrite. This is the routine incremental
    * operation at 100 TB (one source re-crawled, one day re-processed):
    * static `SaveMode.Overwrite` deletes the whole root first, so
    * re-landing ONE partition would destroy the others. The
    * `partitionOverwriteMode=dynamic` WRITE OPTION (not session conf —
    * no cross-query planning state to leak, cf. the autoBucketedScan
    * save/restore in SimilarityOps) makes the committer replace exactly
    * the partition directories the incoming rows hash to. Same
    * committer atomicity per partition; a failed job leaves the old
    * partitions in place. */
  def overwritePartitions(df: DataFrame, path: String, cols: Seq[String],
                          format: String = "parquet"): Unit = {
    require(Supported.contains(format), s"unsupported format: $format")
    require(cols.nonEmpty, "overwritePartitions needs at least one partition column")
    df.write.mode(SaveMode.Overwrite).format(format)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(cols: _*).save(path)
  }

  /** Compact ONE partition of a [[writePartitioned]] layout: read only
    * that partition's directory (partition-pruned scan), coalesce it
    * to a single file, and re-land it via [[overwritePartitions]] —
    * siblings untouched. This is the routine small-files maintenance
    * op at 100 TB (a partition accumulates one file per micro-batch /
    * re-land until listing and open costs dominate scans); the unit of
    * work is deliberately ONE partition — the natural compaction
    * granularity — so the eager localCheckpoint that makes the
    * self-overwrite safe (the write must not stream from the very
    * files it replaces) holds one partition's rows, never the corpus.
    * Compacting a whole layout is a loop over its partitions, each
    * step independently atomic. */
  def compactPartition(spark: SparkSession, path: String,
                       partition: Seq[(String, String)],
                       format: String = "parquet"): Unit = {
    require(partition.nonEmpty, "compactPartition needs the partition value(s)")
    val pred = partition.map { case (c, v) => org.apache.spark.sql.functions.col(c) === v }
      .reduce(_ && _)
    val one = spark.read.format(format).load(path)
      .filter(pred)
      .repartition(1)
      .localCheckpoint()
    overwritePartitions(one, path, partition.map(_._1), format)
  }

  /** Persist as a bucketed + sorted catalog table: both sides of a
    * recurring equi-join bucketed on the join key read back
    * pre-partitioned and pre-sorted, so the join plans with NO shuffle
    * exchange and no sort — the "pre-partition the fact tables once,
    * join for free forever" pattern that matters most at 100 TB, where
    * the shuffle would otherwise move the whole table per query.
    * Bucket count is fixed at write time: pick it for target-cluster
    * parallelism (it caps join parallelism until AQE splits).
    *
    * The pre-write `repartition(buckets, key)` is load-bearing, not
    * cosmetic: Spark only trusts a bucketed table's `sortBy` order
    * when each bucket holds EXACTLY ONE file (SPARK-24528 — with
    * several files per bucket the rows interleave, so the reader
    * silently re-inserts a per-bucket Sort, costing the sort half of
    * the shuffle-free promise with no error). A bucketed write emits
    * one file per (task, bucket) pair; repartitioning on the bucket
    * key with the bucket count uses the same Murmur3 `pmod` hash the
    * bucket assignment uses, so every task owns exactly one bucket
    * and writes exactly one file.
    *
    * Re-run safety: `SaveMode.Overwrite` alone only overwrites a table
    * the CATALOG knows about. A stale warehouse directory from an
    * earlier session (in-memory catalog, nothing registered) fails the
    * write with LOCATION_ALREADY_EXISTS — so drop any catalog entry
    * and delete a leftover default-location directory first. The
    * default managed-table location for the default database is
    * `<spark.sql.warehouse.dir>/<lowercased table name>`. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    // the cleanup below derives the location as <warehouse>/<name> and
    // backtick-quotes the name — both wrong for qualified db.table
    // names (location would be <warehouse>/<db>.db/<name>, and the
    // quoted dotted string drops nothing) — so fail loud rather than
    // leave a stale directory the write then trips over
    require(!table.contains('.'),
      s"writeBucketed supports simple default-database table names only, got '$table'")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.repartition(buckets, df.col(key))
      .write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
  }
}
