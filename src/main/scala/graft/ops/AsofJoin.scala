package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of (backward) join — an operator the reference lacks entirely
  * (SURVEY.md §2b) and core Spark has no primitive for. Implemented by
  * composition (preference order (a) from SURVEY.md §7): union the two
  * keyed streams, sort within key by time, and carry the most recent
  * right-side row forward with last_value(ignoreNulls) — one shuffle,
  * no custom SparkPlan needed.
  *
  * Scale notes (100 TB): the union+window form shuffles each input
  * exactly once on the join key (same as a sort-merge join would) and
  * streams within partitions — no per-key buffering beyond the single
  * carried right row, so memory is O(1) per key regardless of how many
  * events a key has. Right-side ties on (key, time) are collapsed
  * up-front with max_by so the result is deterministic.
  */
object AsofJoin {

  /** For each event, the most recent order of the same customer at or
    * before the event time (inner as-of semantics: events before any
    * order are dropped). */
  def eventsToLatestOrder(spark: SparkSession, dir: String): DataFrame = {
    val orderStruct = struct(col("o_orderkey"), col("o_orderdate"))
    // collapse right-side ties deterministically: one order per
    // (custkey, orderdate), keeping the max orderkey
    val orders = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val right = orders.select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(0).as("src"),
      lit(null).cast("bigint").as("event_id"),
      struct(col("o_orderkey"), col("o_orderdate")).as("r"))
    val left = Tables.events(spark, dir).select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(1).as("src"),
      col("event_id"),
      lit(null).cast(
        "struct<o_orderkey:bigint,o_orderdate:timestamp_ntz>").as("r"))
    // at equal t the right row sorts first (src 0 < 1), so an order
    // placed exactly at the event time matches (<= semantics)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("src"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    right.unionByName(left)
      .withColumn("m", last(col("r"), ignoreNulls = true).over(w))
      .filter(col("src") === 1 && col("m").isNotNull)
      .select(
        col("event_id"), col("k").as("user_id"), col("t").as("ts"),
        col("m.o_orderkey").as("o_orderkey"),
        col("m.o_orderdate").as("o_orderdate"))
  }

  /** LEFT as-of with a TOLERANCE bound — the two semantics the plain
    * [[eventsToLatestOrder]] lacks, together (pandas
    * `merge_asof(tolerance=...)`): every event row is kept (left
    * semantics), and a backward match only counts when the matched
    * order is no staler than `toleranceDays`; stale or absent matches
    * yield NULL columns and `matched = false`. The staleness bound is
    * what makes as-of joins honest on sparse keys — without it a
    * price/feature lookup silently joins data years old.
    *
    * Same union+window carry as [[eventsToLatestOrder]] (one shuffle,
    * O(1) state per key); the tolerance is a row-local predicate on
    * the carried match, so it adds zero plan structure. The default
    * 8400 days is the TEST-SCALE setting: the synthetic corpus's
    * order→event gaps run 8223..8814 days, so this value exercises
    * both outcomes non-vacuously (5570 of 10000 matched at sf0.01) —
    * a production deployment sets minutes or hours. */
  def eventsToRecentOrderTolerant(spark: SparkSession, dir: String,
                                  toleranceDays: Int = 8400): DataFrame = {
    val orders = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val right = orders.select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(0).as("src"),
      lit(null).cast("bigint").as("event_id"),
      struct(col("o_orderkey"), col("o_orderdate")).as("r"))
    val left = Tables.events(spark, dir).select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(1).as("src"),
      col("event_id"),
      lit(null).cast(
        "struct<o_orderkey:bigint,o_orderdate:timestamp_ntz>").as("r"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("src"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // false (not null) when no order precedes the event: isNotNull =
    // false short-circuits the AND under three-valued logic
    val within = col("m").isNotNull &&
      col("m.o_orderdate") + expr(s"INTERVAL $toleranceDays DAYS") >= col("t")
    right.unionByName(left)
      .withColumn("m", last(col("r"), ignoreNulls = true).over(w))
      .filter(col("src") === 1)
      .select(
        col("event_id"), col("k").as("user_id"), col("t").as("ts"),
        when(within, col("m.o_orderkey")).as("o_orderkey"),
        when(within, col("m.o_orderdate")).as("o_orderdate"),
        within.as("matched"))
  }

  /** Forward as-of: for each order, the customer's EARLIEST event at
    * or after the order date — the mirror of [[eventsToLatestOrder]],
    * carrying the nearest right row backward with
    * first_value(ignoreNulls) over a forward frame. Same one-shuffle,
    * O(1)-state-per-key design. (Direction is orders→events because
    * the testdata's events all postdate every order; the composition
    * is symmetric.) */
  def ordersToNextEvent(spark: SparkSession, dir: String): DataFrame = {
    // collapse right-side ties deterministically: one event per
    // (user, ts), keeping the max event_id
    val events = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("event_id"))
    val right = events.select(
      col("user_id").as("k"), col("ts").as("t"),
      lit(1).as("src"),
      lit(null).cast("bigint").as("o_orderkey"),
      struct(col("event_id"), col("ts")).as("r"))
    val left = Tables.orders(spark, dir).select(
      col("o_custkey").as("k"), col("o_orderdate").as("t"),
      lit(0).as("src"),
      col("o_orderkey"),
      lit(null).cast(
        "struct<event_id:bigint,ts:timestamp_ntz>").as("r"))
    // at equal t the ORDER sorts first (src 0 < 1), so an event at
    // exactly the order date is visible in the forward frame
    // (>= semantics)
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("src"), col("o_orderkey"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    right.unionByName(left)
      .withColumn("m", first(col("r"), ignoreNulls = true).over(w))
      .filter(col("src") === 0 && col("m").isNotNull)
      .select(
        col("o_orderkey"), col("k").as("o_custkey"), col("t").as("o_orderdate"),
        col("m.event_id").as("event_id"),
        col("m.ts").as("ts"))
  }

  /** Interval (range) join: pairs of events of the same user where the
    * second falls within `windowHours` after the first — another
    * operator family the reference lacks (SURVEY.md §2b "range join").
    *
    * Scale path: a raw non-equi time predicate would force a
    * nested-loop join; bucketing time into window-width buckets turns
    * it into an equi-join on (user, bucket) with the left side probing
    * its own and the next bucket (any in-window pair differs by at
    * most one bucket), then the exact range refines. Shuffle volume is
    * 2x the left side — independent of the time span — and skew is
    * bounded per (user, bucket). */
  def eventPairsWithin(spark: SparkSession, dir: String, windowHours: Int = 4): DataFrame = {
    val winUs = windowHours * 3600L * 1000000L
    // fresh plan per leg (def): Spark 4.1 self-join dedup is unsafe
    // over shared cached lineages (see DedupOps.bucketPairs note)
    def evs = Tables.events(spark, dir).select(
      col("event_id"), col("user_id"), col("ts"),
      floor(unix_micros(col("ts").cast("timestamp")) / winUs).as("b0"))
    val a = evs.select(
      col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"),
      explode(array(col("b0"), col("b0") + 1)).as("bk"))
    val b = evs.select(
      col("event_id").as("b_id"), col("user_id").as("u2"),
      col("ts").as("b_ts"), col("b0").as("bk2"))
    a.join(b, col("user_id") === col("u2") && col("bk") === col("bk2"))
      .filter(
        col("b_ts") >= col("a_ts") &&
        col("b_ts") < col("a_ts") + expr(s"INTERVAL $windowHours HOURS") &&
        col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"), col("user_id"))
  }
}
