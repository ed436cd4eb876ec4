package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsofJoin
import graft.sources.Formats

class AsofFormatsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  test("asof join: every match is the latest order at or before the event") {
    val joined = AsofJoin.eventsToLatestOrder(spark, sf)
    assert(joined.filter($"o_orderdate" > $"ts").count() == 0)
    // no other order of the same customer lies strictly between the
    // matched orderdate and the event time
    val orders = Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderdate".as("other_date"))
    val better = joined.join(orders,
      $"user_id" === $"o_custkey" &&
        $"other_date" <= $"ts" && $"other_date" > $"o_orderdate")
    assert(better.count() == 0)
    assert(joined.count() > 0)
  }

  test("forward asof join: every match is the customer's earliest event at or after the order") {
    val joined = AsofJoin.ordersToNextEvent(spark, sf)
    assert(joined.filter($"ts" < $"o_orderdate").count() == 0)
    // no other event of the same user lies strictly between the order
    // date and the matched event time
    val events = Tables.events(spark, sf)
      .select($"user_id", $"ts".as("other_ts"))
    val better = joined.join(events,
      $"o_custkey" === $"user_id" &&
        $"other_ts" >= $"o_orderdate" && $"other_ts" < $"ts")
    assert(better.count() == 0)
    assert(joined.count() > 0)
  }

  test("asof join drops events that precede every order of the customer") {
    val joined = AsofJoin.eventsToLatestOrder(spark, sf)
    val firstOrder = Tables.orders(spark, sf)
      .groupBy($"o_custkey").agg(min($"o_orderdate").as("first_date"))
    val early = Tables.events(spark, sf).join(firstOrder,
      $"user_id" === $"o_custkey" && $"ts" < $"first_date")
      .select($"event_id")
    assert(joined.join(early, Seq("event_id"), "left_semi").count() == 0)
  }

  test("tolerant left as-of: every event kept, matches within tolerance, flags honest") {
    val tolDays = 8400
    val joined = AsofJoin.eventsToRecentOrderTolerant(spark, sf, tolDays).cache()
    try {
      // LEFT semantics: one output row per event, always
      assert(joined.count() == Tables.events(spark, sf).count())
      // every match is backward AND within the staleness bound
      assert(joined.filter($"matched" &&
        ($"o_orderdate" > $"ts" ||
          $"o_orderdate" + expr(s"INTERVAL $tolDays DAYS") < $"ts")).count() == 0)
      // flags are honest three-way: matched <=> non-null match columns
      assert(joined.filter($"matched" =!= $"o_orderkey".isNotNull).count() == 0)
      assert(joined.filter($"matched".isNull).count() == 0)
      // an unmatched event with SOME earlier order was rejected for
      // staleness only — its latest earlier order must violate the
      // bound (the tolerance really is the deciding predicate)
      val latest = AsofJoin.eventsToLatestOrder(spark, sf)
        .select($"event_id", $"o_orderdate".as("latest_date"))
      val rejected = joined.filter(!$"matched")
        .join(latest, Seq("event_id"))
      assert(rejected.filter(
        $"latest_date" + expr(s"INTERVAL $tolDays DAYS") >= $"ts").count() == 0)
      // both outcomes populated (non-vacuous at this tolerance)
      val n = joined.filter($"matched").count()
      assert(n > 0 && n < joined.count())
    } finally joined.unpersist()
  }

  test("interval join: pairs ordered, in-window, same user, no self-pairs") {
    val pairs = AsofJoin.eventPairsWithin(spark, sf, windowHours = 4)
    val e = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id".as("uid"))
    val checked = pairs
      .join(e.select($"event_id".as("a_id"), $"ts".as("a_ts")), "a_id")
      .join(e.select($"event_id".as("b_id"), $"ts".as("b_ts")), "b_id")
    assert(checked.filter($"b_ts" < $"a_ts" ||
      $"b_ts" >= $"a_ts" + org.apache.spark.sql.functions.expr("INTERVAL 4 HOURS")).count() == 0)
    assert(pairs.filter($"a_id" === $"b_id").count() == 0)
    assert(pairs.count() > 0)
  }

  test("weighted mean aggregator matches the closed form") {
    val got = SparkEntry.queries("q35_weighted_mean")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expect = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(round(sum($"l_extendedprice" * $"l_quantity") / sum($"l_quantity"), 2))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == expect)
  }

  test("all four formats round-trip rows and values") {
    val src = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity", $"l_returnflag", $"l_shipdate")
    val n = src.count()
    val checksum = src.agg(round(sum($"l_quantity"), 2)).head().getDouble(0)
    val base = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    Formats.Supported.foreach { fmt =>
      val p = s"$base/$fmt"
      Formats.write(src, p, fmt)
      val back = Formats.read(spark, p, fmt, Some(src.schema))
      assert(back.count() == n, s"$fmt row count")
      assert(back.agg(round(sum($"l_quantity"), 2)).head().getDouble(0) == checksum, s"$fmt checksum")
      assert(back.schema == src.schema, s"$fmt schema")
    }
  }

  test("sink is pluggable: an external DataSourceRegister short name routes through Formats.write") {
    // The MongoDB swap point (reference mongodb.js:26-53), exercised
    // for real: PluggableSink is registered ONLY via the ServiceLoader
    // file in test resources — the identical mechanism the Mongo
    // connector uses for "mongodb" — and is not in Formats.Supported,
    // so this write proves the format string is a live plug point, not
    // documentation. With the connector jar deployed the same call is
    // write(df, uri, "mongodb") and nothing else in the engine changes.
    import org.apache.spark.sql.SaveMode
    PluggableSink.received.set(null)
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "v")
    Formats.write(df, "graft://stations", "graftsink")
    val got = PluggableSink.received.get()
    assert(got != null, "external sink never received the frame")
    assert(got._1.contains("graft://stations") && got._2 == 3L &&
      got._3 == SaveMode.Overwrite)
    // and an unregistered format still fails loudly at resolution
    val err = intercept[Exception] {
      Formats.write(df, "/tmp/nowhere", "no_such_format")
    }
    assert(err.getMessage.toLowerCase.contains("data source") ||
      err.getMessage.contains("no_such_format"))
  }

  test("dynamic partition overwrite re-lands one partition and leaves siblings untouched") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-dpo").toString + "/docs"
    graft.sources.Formats.writePartitioned(docs, base, Seq("source"))
    val sources = docs.select($"source").distinct().collect().map(_.getString(0)).sorted
    assert(sources.length >= 2, "fixture needs at least two partitions")
    val target = sources.head
    val sibling = sources.last
    // record a sibling partition's files AND a content checksum before
    def files(src: String) = {
      val d = new java.io.File(s"$base/source=$src")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    val siblingFilesBefore = files(sibling)
    val totalBefore = spark.read.parquet(base).count()
    // re-land ONLY the target partition, with a marker modification
    val relanded = docs.filter($"source" === target)
      .withColumn("text", org.apache.spark.sql.functions.lit("relanded"))
    graft.sources.Formats.overwritePartitions(relanded, base, Seq("source"))
    // static overwrite would have destroyed source=<sibling>; dynamic
    // must leave its files byte-identical (same names, still readable)
    assert(files(sibling) == siblingFilesBefore,
      s"sibling partition $sibling was rewritten")
    val after = spark.read.parquet(base)
    assert(after.count() == totalBefore, "row count changed by partition re-land")
    assert(after.filter(col("source") === target && col("text") =!= "relanded").count() == 0,
      "target partition does not carry the re-landed content")
    assert(after.filter(col("source") === sibling && col("text") === "relanded").count() == 0,
      "sibling partition content was clobbered")
  }

  test("partition-scoped merge: delete/replace/insert land, untouched partitions' files survive") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-mrg").toString + "/docs"
    Formats.writePartitioned(docs, base, Seq("source"))
    val sources = docs.select($"source").distinct().collect().map(_.getString(0)).sorted
    assert(sources.length >= 2, "fixture needs at least two partitions")
    val target = sources.head
    val sibling = sources.last
    def files(src: String) = {
      val d = new java.io.File(s"$base/source=$src")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    val siblingBefore = files(sibling)
    val tp = docs.filter($"source" === target)
    val m = pmod(col("doc_id"), lit(3))
    val nDel = tp.filter(m === 0).count()
    val nEdit = tp.filter(m === 1).count()
    val nKeep = tp.filter(m === 2).count()
    val nIns = tp.filter(m === 2).count()
    assert(nDel > 0 && nEdit > 0 && nKeep > 0, "fixture must exercise every op")
    val changes = tp.filter(m === 0).withColumn("op", lit("delete"))
      .unionByName(tp.filter(m === 1)
        .withColumn("text", lit("edited")).withColumn("op", lit("upsert")))
      .unionByName(tp.filter(m === 2)
        .withColumn("doc_id", col("doc_id") + 10000000L)
        .withColumn("source", lit("src_fresh")).withColumn("op", lit("upsert")))
    Formats.mergeIntoPartitioned(spark, base, changes, "doc_id", "source")
    // a static overwrite (or a whole-partition re-land) would have
    // rewritten source=<sibling>; the merge must not even list it
    assert(files(sibling) == siblingBefore, s"sibling partition $sibling was rewritten")
    val after = spark.read.parquet(base)
    val t = after.filter(col("source") === target)
    assert(t.filter(pmod(col("doc_id"), lit(3)) === 0).count() == 0, "deletes survived")
    assert(t.filter(pmod(col("doc_id"), lit(3)) === 1 && col("text") =!= "edited").count() == 0,
      "an upsert of an existing key did not replace its row")
    assert(t.filter(pmod(col("doc_id"), lit(3)) === 2).count() == nKeep,
      "rows the batch never touched were lost")
    assert(t.count() == nEdit + nKeep, "target partition row count")
    // inserts created a partition that did not exist before the merge
    assert(after.filter(col("source") === "src_fresh").count() == nIns,
      "inserted keys did not land in the new partition")
    assert(after.filter(col("source") === sibling).count() ==
      docs.filter($"source" === sibling).count(), "sibling row count changed")
  }

  test("partition-scoped merge: a batch deleting a whole partition removes its directory") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-mrgdel").toString + "/docs"
    Formats.writePartitioned(docs, base, Seq("source"))
    val sources = docs.select($"source").distinct().collect().map(_.getString(0)).sorted
    val target = sources.head
    val sibling = sources.last
    // delete EVERY row of the target partition — the merged frame then
    // contains no rows for it, so dynamic overwrite alone would leave
    // the old directory (and all its rows) silently in place
    val changes = docs.filter($"source" === target).withColumn("op", lit("delete"))
    Formats.mergeIntoPartitioned(spark, base, changes, "doc_id", "source")
    assert(!new java.io.File(s"$base/source=$target").exists(),
      "fully-deleted partition's directory survived the merge")
    val after = spark.read.parquet(base)
    assert(after.filter(col("source") === target).count() == 0, "deleted rows still readable")
    assert(after.filter(col("source") === sibling).count() ==
      docs.filter($"source" === sibling).count(), "sibling row count changed")
  }

  test("partition-scoped merge: validateKeyPartition rejects a key moving partitions, admits clean batches") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-mrgval").toString + "/docs"
    Formats.writePartitioned(docs, base, Seq("source"))
    val sources = docs.select($"source").distinct().collect().map(_.getString(0)).sorted
    val target = sources.head
    val sibling = sources.last
    // an upsert claiming a sibling-partition key lives in `target` —
    // the partition-move the merge's precondition forbids (unvalidated
    // it would leave the old row alive in `sibling`: a silent dup)
    val moved = docs.filter($"source" === sibling).limit(1)
      .withColumn("source", lit(target)).withColumn("op", lit("upsert"))
    val ex = intercept[IllegalStateException] {
      Formats.mergeIntoPartitioned(spark, base, moved, "doc_id", "source",
        validateKeyPartition = true)
    }
    assert(ex.getMessage.contains("partitions the batch does not touch"))
    // the validation threw BEFORE anything was written
    assert(spark.read.parquet(base).count() == docs.count(),
      "failed validation must leave the layout untouched")
    // a batch respecting the precondition passes with validation on
    val clean = docs.filter($"source" === target).limit(5)
      .withColumn("text", lit("validated-edit")).withColumn("op", lit("upsert"))
    Formats.mergeIntoPartitioned(spark, base, clean, "doc_id", "source",
      validateKeyPartition = true)
    assert(spark.read.parquet(base)
      .filter(col("text") === "validated-edit").count() == 5)
  }

  test("partition-scoped merge equals a full rewrite for random change batches") {
    import org.apache.spark.sql.functions.col
    // property: for ANY keyed change batch, the incremental merge must
    // be indistinguishable from the naive full-corpus rewrite — the
    // reference implementation computed relationally, no layout at all
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"text", $"lang", $"source", $"n_chars").cache()
    Seq(13, 29).foreach { seed =>
      val base = java.nio.file.Files.createTempDirectory(s"graft-prop$seed").toString + "/docs"
      Formats.writePartitioned(docs, base, Seq("source"))
      // deterministic pseudo-random op assignment from the seed:
      // ~1/6 delete, ~1/6 edit, ~1/6 insert (re-keyed, mixed targets
      // including a fresh partition), rest untouched
      val h = pmod(xxhash64($"doc_id" + seed), lit(6))
      val dels = docs.filter(h === 0).withColumn("op", lit("delete"))
      val edits = docs.filter(h === 1)
        .withColumn("text", concat($"text", lit(s" prop$seed")))
        .withColumn("op", lit("upsert"))
      val ins = docs.filter(h === 2)
        .withColumn("doc_id", $"doc_id" + 5000000L)
        .withColumn("source",
          when(pmod($"doc_id", lit(2)) === 0, lit("src_prop")).otherwise($"source"))
        .withColumn("op", lit("upsert"))
      val changes = dels.unionByName(edits).unionByName(ins)
      Formats.mergeIntoPartitioned(spark, base, changes, "doc_id", "source")
      // reference: survivors + edits + inserts, computed without any
      // layout machinery
      val expected = docs.filter(h =!= 0 && h =!= 1)
        .unionByName(edits.drop("op")).unionByName(ins.drop("op"))
      val got = spark.read.parquet(base)
        .select($"doc_id", $"text", $"lang", $"source", $"n_chars")
      assert(got.count() == expected.count(), s"seed $seed: row count")
      assert(got.exceptAll(expected).count() == 0 &&
        expected.exceptAll(got).count() == 0,
        s"seed $seed: merged layout differs from the full-rewrite reference")
    }
    docs.unpersist()
  }

  test("partition compaction collapses one partition to a single file, siblings untouched") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("graft-cmp").toString + "/docs"
    // force many small files per partition dir — the state compaction exists to fix
    graft.sources.Formats.writePartitioned(docs.repartition(8), base, Seq("source"))
    def files(src: String) = {
      val d = new java.io.File(s"$base/source=$src")
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    }
    val sources = docs.select($"source").distinct().collect().map(_.getString(0)).sorted
    val target = sources.head
    val sibling = sources.last
    assert(files(target).size > 1, "fixture must start with multiple files per partition")
    val siblingBefore = files(sibling)
    // bit_xor, not sum: ANSI sum over 64-bit hashes overflows
    def checksum() = spark.read.parquet(base)
      .agg(org.apache.spark.sql.functions.expr("bit_xor(xxhash64(doc_id, text))"))
      .head().getLong(0)
    val checksumBefore = checksum()
    graft.sources.Formats.compactPartition(spark, base, Seq("source" -> target))
    assert(files(target).size == 1, "target partition not compacted to one file")
    assert(files(sibling) == siblingBefore, "compaction touched a sibling partition")
    assert(checksum() == checksumBefore, "compaction changed the data")
  }

  test("snapshot diff over bucketed snapshots plans with zero exchanges") {
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    // v2: drop ids ≡3 (mod 17), edit ≡5 — same shape as corpusDiff
    val m = pmod($"doc_id", lit(17))
    val v2 = docs.filter(m =!= 3).select($"doc_id",
      when(m === 5, concat($"text", lit(" v2 edit"))).otherwise($"text").as("text"))
    graft.sources.Formats.writeBucketed(docs, "snap_v1", "doc_id", 8)
    graft.sources.Formats.writeBucketed(v2, "snap_v2", "doc_id", 8)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val diff = graft.ops.CurationOps.snapshotDiff(
        spark.table("snap_v1"), spark.table("snap_v2"))
      val plan = diff.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed snapshot diff still shuffles:\n$plan")
      // negative control: the path-based (unbucketed) form MUST shuffle,
      // or the assertion above is vacuous
      val unbucketed = graft.ops.CurationOps.snapshotDiff(docs, v2)
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "control: unbucketed diff should shuffle")
      // and the bucketed plan computes the same statuses
      val got = diff.groupBy($"status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = unbucketed.groupBy($"status").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == want, s"bucketed vs unbucketed diff disagree: $got vs $want")
      assert(Set("removed", "changed", "unchanged").subsetOf(got.keySet),
        "fixture must exercise removed/changed/unchanged")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("bucketed tables join without a shuffle exchange") {
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_quantity")
    val o = Tables.orders(spark, sf).select($"o_orderkey", $"o_totalprice")
    graft.sources.Formats.writeBucketed(li, "li_b", "l_orderkey", 8)
    graft.sources.Formats.writeBucketed(o, "o_b", "o_orderkey", 8)
    // at test scale the planner rightly prefers broadcast (which skips
    // the bucketed scan); force the shuffle-family path — the one that
    // matters at 100 TB — to show bucketing removes the exchange
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), $"l_orderkey" === $"o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == li.join(o, $"l_orderkey" === $"o_orderkey").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("unresolvable format fails loudly at DataSource resolution") {
    // the pre-r16 eager require() is gone — unknown format strings now
    // pass through to Spark's registry so external connectors plug in
    // (see the pluggable-sink test); a genuinely absent provider must
    // still fail loudly, just at the Spark layer
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Formats.read(spark, "/tmp/x", "avro")
    }
    assert(e.getMessage.toLowerCase.contains("avro"))
  }
}
