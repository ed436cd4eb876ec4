package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextNorm

/** Second tranche of relational coverage (SURVEY.md §2b checklist):
  * statistical aggregates, grouping sets, navigation window
  * functions, distribution window functions, regex functions,
  * multiset intersection, multi-column distinct counting, approximate
  * distinct sketches, FILTER-clause aggregation, arithmetic
  * histograms, hash-based deterministic sampling, and sliding
  * event-time windows.
  *
  * Scale notes (100 TB design):
  *  - Every aggregate here plans map-side partial aggregation before
  *    its single shuffle; the window functions shuffle once on their
  *    partition key.
  *  - approx_count_distinct is the scale path for distinct counting —
  *    a fixed-size HLL sketch per group that merges associatively, vs
  *    exact count(DISTINCT) whose state grows with cardinality.
  *  - Hash sampling (md5-prefix) is stable under reruns and across
  *    engines, needs no sort, and samples uniformly per row — the
  *    right primitive for corpus subsampling at scale (vs TABLESAMPLE
  *    which is split-dependent).
  *  - The sliding window expands each event into exactly
  *    window/slide rows (2 here) map-side — no self-join.
  */
object RelationalExt {

  /** Sample-statistics aggregates per group: stddev, variance,
    * correlation and covariance (all sample forms — Spark and DuckDB
    * share the definitions). */
  def statsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_extendedprice")), 4).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("cov_qty_price"),
        count(lit(1)).as("n"))

  /** Explicit GROUPING SETS — each flag total, each status total, and
    * the grand total, with grouping() markers to disambiguate the
    * generated nulls. */
  def groupingSetsAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping(col("l_returnflag")).cast("bigint").as("g_flag"),
        grouping(col("l_linestatus")).cast("bigint").as("g_status"),
        count(lit(1)).as("n"),
        round(sum(col("l_extendedprice")), 2).as("total_price"))

  /** Navigation window functions over each customer's order history:
    * lag/lead plus first/last/nth value with explicit frames (the
    * default last_value frame ends at CURRENT ROW — always the
    * current order — so the full-partition frame is spelled out). */
  def windowNav(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      lag(col("o_totalprice"), 1).over(order).as("prev_price"),
      lead(col("o_totalprice"), 1).over(order).as("next_price"),
      first(col("o_orderdate")).over(full).as("first_date"),
      last(col("o_orderdate")).over(full).as("last_date"),
      nth_value(col("o_totalprice"), 2).over(full).as("second_price"))
  }

  /** Distribution window functions: quartile bucket, percent rank and
    * cumulative distribution over a totally-ordered slice (ties broken
    * by key, so every engine produces identical ranks). */
  def ntileStats(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") < 5)
      .select(
        col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        ntile(4).over(w).cast("bigint").as("quartile"),
        // percent_rank/cume_dist are exact rationals (k/n) that land
        // precisely on rounding half-boundaries — use the boundary-safe
        // floor form mirrored in the oracle SQL (TextOps.roundAt docs)
        TextOps.roundAt(percent_rank().over(w), 6).as("pct_rank"),
        TextOps.roundAt(cume_dist().over(w), 6).as("cum_dist"))
  }

  /** Regex function family: group extraction, match counting, global
    * replacement, and a match predicate. */
  def regexpFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(
      col("c_custkey"),
      regexp_extract(col("c_name"), "([0-9]+)", 1).as("cust_digits"),
      size(regexp_extract_all(col("c_name"), lit("[0-9]"), lit(0))).cast("bigint").as("n_digits"),
      regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
      col("c_name").rlike("00[0-4]$").cast("int").cast("bigint").as("ends_low"))

  /** Multiset intersection (INTERSECT ALL): order-placing customer
    * keys that also appear as high-balance customers, with
    * multiplicity = min(count left, count right). */
  def intersectAllKeys(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(col("o_custkey").as("custkey"))
      .intersectAll(
        Tables.customer(spark, dir)
          .filter(col("c_acctbal") > 5000)
          .select(col("c_custkey").as("custkey")))

  /** Exact multi-column distinct counting per group. At scale each
    * count(DISTINCT x) expands the aggregate; [[approxDistinct]] is
    * the sketch-based alternative. */
  def countDistinctAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        // tuple-distinct via concat_ws: DuckDB's multi-arg DISTINCT
        // tuple syntax builds a STRUCT whose hash the driver can't
        // compare; an injective string key keeps both engines scalar
        countDistinct(concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("n_lines"),
        count(lit(1)).as("n_rows"))

  /** HyperLogLog++ distinct sketches — the 100 TB path for distinct
    * counting: fixed-size state, associative merge, one shuffle.
    *
    * DuckDB's approx_count_distinct uses a different sketch, so the
    * raw estimates can never hash-match an oracle. Instead the gate
    * output carries the EXACT counts plus in-plan bounds flags
    * `abs(approx − exact) ≤ 5% · exact` (5× the configured rsd=0.01;
    * HLL++ is deterministic for a given input, so the flags are
    * stable): the oracle asserts the flags are literally TRUE next to
    * its own exact counts, which makes a drifting sketch a hash
    * MISMATCH rather than an unchecked number — a bounds assertion
    * the driver's equality compare can express. The raw-estimate form
    * is one agg away and the spec checks it independently. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    // Two aggregations + a 3-row broadcast join, NOT one mixed agg:
    // combining count(DISTINCT) with HLL sketches in a single
    // aggregate puts the sketches downstream of the distinct-rewrite's
    // Expand (x3 rows through every HLL update) — measured 6.5 s vs
    // 2.2 + 1.7 s for the split form at sf0.1.
    val li = Tables.lineitem(spark, dir)
    val exact = li.groupBy(col("l_returnflag")).agg(
      countDistinct(col("l_suppkey")).as("n_supp"),
      countDistinct(col("l_partkey")).as("n_part"))
    val approx = li.groupBy(col("l_returnflag")).agg(
      approx_count_distinct(col("l_suppkey"), 0.01).as("a_supp"),
      approx_count_distinct(col("l_partkey"), 0.01).as("a_part"))
    exact.join(broadcast(approx), Seq("l_returnflag"))
      .select(
        col("l_returnflag"), col("n_supp"), col("n_part"),
        (abs(col("a_supp") - col("n_supp")) <= col("n_supp") * 0.05).as("supp_within_5pct"),
        (abs(col("a_part") - col("n_part")) <= col("n_part") * 0.05).as("part_within_5pct"))
  }

  /** Mergeable distinct sketches — Apache DataSketches HLL via
    * hll_sketch_agg / hll_union_agg: build one sketch PER SOURCE
    * PARTITION (here per event_type), then merge the fixed-size
    * sketch states into the global count without rescanning — the
    * exact shape of "each day's ingest keeps its own sketch; the
    * dashboard unions 365 of them" at 100 TB, where re-counting
    * distinct users over the raw corpus is the thing you can never
    * afford. (approx_count_distinct in [[approxDistinct]] also merges
    * internally, but the sketch there is plan-private; here the sketch
    * is a first-class VALUE that survives between jobs.)
    *
    * Oracle strategy is the q54 pattern: exact counts + in-plan
    * |est − exact| ≤ 5%·exact flags (DataSketches HLL is deterministic
    * for a given input), so a drifting sketch turns into a hash
    * mismatch. The union row carries event_type 'ALL'; the spec
    * additionally proves register-level mergeability — union of the
    * per-type sketches estimates EXACTLY what one global sketch
    * estimates. */
  def sketchMerge(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    // exact and sketch sides split like approxDistinct (the
    // distinct-rewrite's Expand must not feed the sketch updates)
    val exact = e.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    val sk = e.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val perType = exact.join(broadcast(
        sk.select(col("event_type"), hll_sketch_estimate(col("sk")).as("est"))),
        Seq("event_type"))
    val allExact = e.agg(countDistinct(col("user_id")).as("n_exact"))
    val allEst = sk.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val all = allExact.crossJoin(broadcast(allEst))
      .select(lit("ALL").as("event_type"), col("n_exact"), col("est"))
    perType.unionByName(all)
      .select(col("event_type"), col("n_exact"),
        (abs(col("est") - col("n_exact")) <= col("n_exact") * 0.05).as("within_5pct"))
  }

  /** [[Relational.quantiles]]' 100 TB twin: approx_percentile with a
    * bounded-memory sketch instead of the exact percentile's full
    * per-group counts map — at scale the exact form's buffer grows
    * with group cardinality while the sketch stays fixed-size and
    * mergeable across partitions.
    *
    * Oracle strategy is the q54/q93 flag pattern: the gated columns
    * are the EXACT quantiles plus in-plan booleans asserting each
    * approx value lands inside the exact quantile envelope at
    * p ± 2/accuracy — the Greenwald-Khanna RANK-error guarantee
    * (≤ 1/accuracy) widened one extra granule so continuous-vs-rank
    * interpolation at the envelope edges cannot flap the flag. The
    * approx VALUES themselves are deliberately not emitted: sketch
    * merge order follows partitioning, so the value is not a
    * cross-engine constant — the bound is. */
  def approxQuantiles(spark: SparkSession, dir: String, accuracy: Int = 1000): DataFrame = {
    // accuracy < 8 pushes p ± eps outside [0, 1] and fails deep inside
    // percentile's analysis with an error far from the caller's
    // mistake; the q100 oracle also pins accuracy = 1000, so other
    // values are spec-territory, not gate-territory
    require(accuracy >= 8, s"accuracy must be >= 8 (eps = 2/accuracy must keep " +
      s"p +/- eps inside [0, 1] for p = 0.25), got $accuracy")
    val li = Tables.lineitem(spark, dir)
    val eps = 2.0 / accuracy
    val ps = Seq(0.25, 0.5, 0.75)
    val pctArray = ps.flatMap(p => Seq(p - eps, p, p + eps))
      .map(p => s"${p}D").mkString("array(", ", ", ")")
    // ONE pass: exact and approx aggregate together. q54's split-form
    // precedent does NOT apply here — that split dodges the
    // count(DISTINCT) rewrite's Expand multiplying rows through the
    // sketch updates; percentile triggers no such rewrite, so a second
    // scan plus a join would be pure waste.
    li.groupBy(col("l_returnflag"))
      .agg(expr(s"percentile(l_extendedprice, $pctArray)").as("ex"),
        expr(s"approx_percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D), $accuracy)").as("ap"))
      .select(
        col("l_returnflag") +:
          ps.zipWithIndex.flatMap { case (p, i) =>
            val name = s"p${(p * 100).toInt}"
            Seq(
              round(col("ex").getItem(i * 3 + 1), 4).as(name),
              (col("ap").getItem(i) >= col("ex").getItem(i * 3) &&
                col("ap").getItem(i) <= col("ex").getItem(i * 3 + 2))
                .as(s"${name}_in_bound"))
          }: _*)
  }

  /** SQL FILTER-clause aggregation — per-predicate conditional
    * aggregates in one pass (same plan shape as the CASE WHEN form,
    * exercised through the SQL surface). */
  def aggFilterClause(spark: SparkSession, dir: String): DataFrame = {
    // unique per-call view name — fixed names are session-global
    // state (see Relational.sqlSubquery)
    val v = s"lineitem_v_${viewSeq.incrementAndGet()}"
    Tables.lineitem(spark, dir).createOrReplaceTempView(v)
    // analysis is eager — the resolved plan no longer needs the view
    // (see Relational.sqlSubquery); drop it so repeated calls don't
    // grow the session catalog without bound.
    try spark.sql(
      s"""SELECT l_returnflag,
         | count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
         | count(*) FILTER (WHERE l_tax = 0) AS n_taxfree,
         | round(sum(l_extendedprice) FILTER (WHERE l_quantity >= 25), 2) AS rev_bulk,
         | count(*) AS n
         |FROM $v GROUP BY l_returnflag""".stripMargin)
    finally spark.catalog.dropTempView(v)
  }

  private val viewSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Arithmetic histogram: fixed-width price bins entirely in integer
    * arithmetic — a narrow map plus one aggregation, the
    * scale-friendly histogram (vs sort-based percentile binning). */
  def histogram(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(floor(col("l_extendedprice") / 10000).cast("bigint").as("price_bin"))
      .agg(
        count(lit(1)).as("n"),
        round(min(col("l_extendedprice")), 2).as("bin_min"),
        round(max(col("l_extendedprice")), 2).as("bin_max"))

  /** Deterministic ~1/8 sample by md5-prefix of the row key: stable
    * across runs, engines and partitionings (TABLESAMPLE is not), and
    * composable (sample of a sample re-uses other hex positions). */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1).isin("0", "1"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  /** Deterministic stratified sampling: per-stratum rates over a hash
    * of the row key — the class-rebalancing step of a training-data
    * pipeline (downsample the dominant class, keep the rare one)
    * without `sampleBy`'s seeded randomness, so the sample is stable
    * across runs, engines, partitionings, AND cluster sizes, and the
    * oracle checks the exact membership. The hash is a 16-bit md5
    * window mod 1000 compared against per-mille rates (the q75-style
    * hex-window parse, one conv). Scale: a pure narrow filter —
    * rates broadcast as a literal CASE, nothing shuffles. */
  def stratifiedSample(spark: SparkSession, dir: String,
                       perMille: Map[String, Int] =
                         Map("A" -> 200, "N" -> 50, "R" -> 500)): DataFrame = {
    val bucket = pmod(
      conv(substring(md5(concat_ws("_", col("l_orderkey"), col("l_linenumber"))), 1, 4), 16, 10)
        .cast("long"),
      lit(1000L))
    val rate = perMille.foldLeft(lit(0)) { case (acc, (k, v)) =>
      when(col("l_returnflag") === k, lit(v)).otherwise(acc)
    }
    Tables.lineitem(spark, dir)
      .filter(bucket < rate)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
  }

  /** Array function family over derived word lists: distinct count,
    * sorted slice join, membership, and max element — every step a
    * codegen'd collection expression, flattened to scalars so the
    * oracle compare stays scalar-only. */
  def arrayFuncs(spark: SparkSession, dir: String): DataFrame = {
    val words = TextNorm.words(col("text"))
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(array_distinct(words)).cast("bigint").as("n_uniq"),
      array_join(slice(sort_array(array_distinct(words)), 1, 5), ",").as("first5"),
      array_contains(words, "the").cast("int").cast("bigint").as("has_the"),
      array_max(words).as("max_word"))
  }

  /** Map functions over JSON-derived maps: key count, sorted key
    * list, and value lookup (from_json → map<string,string>). */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame = {
    val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
      org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType))
    Tables.events(spark, dir).select(
      col("event_id"),
      size(map_keys(m)).cast("bigint").as("n_keys"),
      array_join(sort_array(map_keys(m)), ",").as("keys_sorted"),
      element_at(m, "k").as("k_val"))
  }

  /** explode_outer: unnest that PRESERVES rows with empty/null arrays
    * (a null element row) — the digits-per-document example genuinely
    * produces empty arrays. */
  def explodeOuter(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      explode_outer(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0))).as("num"))

  /** unionByName with allowMissingColumns: schema-aligned union by
    * column NAME (not position), absent columns null-filled — the
    * schema-evolution-tolerant union. */
  def unionByNameMixed(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.customer(spark, dir).select(
      col("c_custkey").as("key"), col("c_acctbal").as("bal"), lit("cust").as("src"))
    val b = Tables.supplier(spark, dir).select(
      lit("supp").as("src"), col("s_suppkey").as("key")) // no bal, different order
    a.unionByName(b, allowMissingColumns = true)
  }

  /** Date arithmetic family: day offset, month-end, day diff, month
    * add (end-of-month clamping in both engines), ISO week, quarter. */
  def dateArith(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
      last_day(col("o_orderdate")).as("month_end"),
      datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).cast("bigint").as("days_since"),
      add_months(col("o_orderdate"), 2).as("plus2m"),
      weekofyear(col("o_orderdate")).cast("bigint").as("iso_week"),
      quarter(col("o_orderdate")).cast("bigint").as("qtr"))

  /** Salted hot-key join registered at the gate: identical results to
    * the plain equi-join (the oracle IS the plain join), while the
    * physical plan spreads each l_suppkey over 8 salt buckets — the
    * mitigation for a hot key that AQE cannot split (Skew.saltedJoin;
    * equivalence also unit-tested in SkewSpec). */
  def saltedJoinAgg(spark: SparkSession, dir: String): DataFrame =
    graft.ops.Skew.saltedJoin(
        Tables.lineitem(spark, dir), Tables.supplier(spark, dir),
        col("l_suppkey"), col("s_suppkey"), factor = 8)
      .groupBy(col("s_nationkey").cast("bigint").as("nationkey"))
      .agg(round(sum(col("l_extendedprice")), 2).as("revenue"),
        count(lit(1)).as("n"))

  /** SQL LATERAL correlated subquery: top-2 suppliers per nation —
    * the per-group-top-k shape through the lateral join front-end
    * (planned as a rewritten window/join, not a per-row re-execution). */
  def lateralTopN(spark: SparkSession, dir: String): DataFrame = {
    val seq = viewSeq.incrementAndGet()
    val nv = s"nation_v_$seq"
    val sv = s"supplier_v_$seq"
    Tables.nation(spark, dir).createOrReplaceTempView(nv)
    Tables.supplier(spark, dir).createOrReplaceTempView(sv)
    // analysis is eager — drop both views once the plan is resolved
    // (see Relational.sqlSubquery).
    try spark.sql(
      s"""SELECT n_name, t.s_name, t.s_acctbal
         |FROM $nv n,
         |LATERAL (SELECT s_name, s_acctbal FROM $sv s
         |         WHERE s.s_nationkey = n.n_nationkey
         |         ORDER BY s_acctbal DESC, s_name LIMIT 2) t""".stripMargin)
    finally {
      spark.catalog.dropTempView(nv)
      spark.catalog.dropTempView(sv)
    }
  }

  /** Outer joins: left join keeps customers with no orders (null
    * side aggregated with count of non-nulls), completing the
    * inner/semi/anti coverage. */
  def leftOuterJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("spend"))

  /** Full outer join over two keyed aggregates: high-value order
    * customers vs high-balance customers — either side may be absent,
    * flags mark which sides matched. */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).filter(col("o_totalprice") > 400000)
      .groupBy(col("o_custkey").as("key")).agg(count(lit(1)).as("n_big_orders"))
    val c = Tables.customer(spark, dir).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("key"), col("c_acctbal"))
    o.join(c, Seq("key"), "full_outer")
      .select(
        col("key"),
        coalesce(col("n_big_orders"), lit(0L)).as("n_big_orders"),
        col("c_acctbal").isNotNull.cast("int").cast("bigint").as("is_rich"))
  }

  /** Cartesian product of the two bounded dimensions — the one join
    * shape with no key (125 rows at any SF; anything bigger must be a
    * deliberate crossJoin call in this engine). */
  def crossJoinDims(spark: SparkSession, dir: String): DataFrame =
    Tables.nation(spark, dir).select(col("n_name"))
      .crossJoin(Tables.region(spark, dir).select(col("r_name")))

  /** IN-list predicates — the reference's single predicate form
    * (mongodb.js:59-67 builds {_id:{$in:[...]}}): literal membership
    * on two columns, pushed to the scan. */
  def inListFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
        col("o_orderstatus").isin("F", "P"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderstatus"))

  /** RANGE window frame (value-based, not row-based): trailing
    * revenue per supplier over the current day AND the 7 preceding
    * days — rangeBetween(-7, current) spans 8 distinct day values
    * inclusive, so the `rev_7d` column name counts the LOOKBACK, not
    * the window width. Ordered by day number so the frame bound is a
    * plain numeric offset — identical semantics in every engine (vs
    * interval bounds, whose support differs). */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val dayNum = datediff(col("l_shipdate"), to_date(lit("1995-01-01"))).cast("bigint")
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("day_num"))
      .rangeBetween(-7, Window.currentRow)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") < 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        dayNum.as("day_num"), col("l_extendedprice"))
      .withColumn("rev_7d", round(sum(col("l_extendedprice")).over(w), 2))
  }

  /** Null-semantics function family: nullif to introduce nulls,
    * coalesce/ifnull to recover them, null-safe equality (<=> here,
    * IS NOT DISTINCT FROM in SQL), and null-aware counting. */
  def nullSemantics(spark: SparkSession, dir: String): DataFrame = {
    val statusOrNull = nullif(col("o_orderstatus"), lit("O"))
    Tables.orders(spark, dir).select(
      col("o_orderkey"),
      statusOrNull.as("status_non_open"),
      coalesce(statusOrNull, lit("OPEN")).as("status_filled"),
      statusOrNull.eqNullSafe(nullif(col("o_orderpriority"), col("o_orderpriority")))
        .cast("int").cast("bigint").as("is_open_nullsafe"),
      (when(statusOrNull.isNull, 1).otherwise(0)).cast("bigint").as("null_flag"))
  }

  /** Sliding event-time windows (1 h window, 30 min slide): each event
    * lands in exactly 2 windows, expanded map-side by the window()
    * generator — no self-join, one shuffle on the window start.
    * Identical logic runs under Structured Streaming with a watermark
    * (EventStream.hourly is the tumbling twin). */
  def slidingWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(col("w.start").as("win_start"), col("n"), col("total"))

  /** Globally-ordered running sum WITHOUT a single-partition window —
    * the classic two-phase distributed prefix sum. A plain
    * `Window.orderBy(...)` with no partition key funnels the entire
    * dataset through ONE task (Spark even warns); this instead:
    *
    *  1. range-partitions on the sort key — partition i's keys all
    *     precede partition j's for i < j, so a per-partition running
    *     sum is globally correct up to a constant;
    *  2. computes that per-partition running sum with an ordinary
    *     partitioned window (parallel, spill-safe);
    *  3. aggregates ONE total per partition — a cluster-width frame
    *     (≤ nPartitions rows), on which the single-partition window
    *     is O(partitions), not O(rows) — into per-partition offsets;
    *  4. broadcast-joins the offsets back and adds.
    *
    * The result is row-identical to the naive global window
    * (spec-proven) at any scale: partition boundaries come from
    * RangePartitioner sampling, but the sum is invariant to where
    * the cuts fall. The value column must be numeric; rows where it
    * is null count as 0. */
  /** Ordered-funnel analysis (view → click → purchase, strictly in
    * time order) over the events stream: per stage, the count of users
    * whose FIRST qualifying event follows their entry into the
    * previous stage — the standard product-analytics funnel, fully
    * relational.
    *
    * Shape per stage: join events to the previous stage's per-user
    * entry time, filter to later events of the stage type, take
    * min(ts) per user. Every join and aggregate keys on user_id, so
    * after the first exchange the whole chain CAN reuse one
    * partitioning; the three event scans are the cost of the lazy
    * form — at 100 TB you persist events bucketed by user_id
    * ([[graft.sources.Formats.writeBucketed]]) and every stage's join
    * and aggregate plans with zero exchanges on the events side.
    * Nothing here sorts: a per-user sessionize-and-scan (the
    * mapGroups form) would sort every user's history; min-over-filter
    * needs only partial aggregation. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val view = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val click = ev.join(view, Seq("user_id"))
      .filter(col("event_type") === "click" && col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val purchase = ev.join(click, Seq("user_id"))
      .filter(col("event_type") === "purchase" && col("ts") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    view.agg(count(lit(1)).as("n_view"))
      .crossJoin(click.agg(count(lit(1)).as("n_click")))
      .crossJoin(purchase.agg(count(lit(1)).as("n_purchase")))
  }

  /** q183: conversion funnel with a TIME WINDOW — view → click →
    * purchase where each step must land within `windowExpr` of the
    * previous one (q117 is the unconstrained form; real funnels are
    * windowed, otherwise a purchase six months after a view counts as
    * a conversion). Long-form output with per-stage user counts and
    * the step conversion rate.
    *
    * Exactness: timestamps compare exactly (interval arithmetic is
    * integer microseconds on both engines); rates are ratios of exact
    * longs rounded at 4. Scale: the q117 shape — one aggregation per
    * stage on user_id with the previous stage's (user, ts) joined in;
    * each stage's frame shrinks, and the final assembly is three
    * one-row aggregates crossed and stacked. */
  def funnelWindowed(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val hour = expr("INTERVAL 1 HOUR")
    val view = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val click = ev.join(view, Seq("user_id"))
      .filter(col("event_type") === "click" &&
        col("ts") > col("t_view") && col("ts") <= col("t_view") + hour)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val purchase = ev.join(click, Seq("user_id"))
      .filter(col("event_type") === "purchase" &&
        col("ts") > col("t_click") && col("ts") <= col("t_click") + hour)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    view.agg(count(lit(1)).as("nv"))
      .crossJoin(click.agg(count(lit(1)).as("nc")))
      .crossJoin(purchase.agg(count(lit(1)).as("np")))
      .select(expr(
        """stack(3,
          | '1_view', nv, CAST(1.0 AS DOUBLE),
          | '2_click', nc, round(CAST(nc AS DOUBLE) / nv, 4),
          | '3_purchase', np, round(CAST(np AS DOUBLE) / nc, 4))
          | AS (stage, n_users, conv_from_prev)""".stripMargin))
      .orderBy(col("stage"))
  }

  /** q185: daily value percentiles per event type (exact
    * PERCENTILE_DISC semantics — the p50/p95 dashboard every
    * operations team keeps): rank rows within (type, day) by value
    * and SELECT the data value at position ⌈p·n⌉. Discrete selection
    * on purpose: it returns an actual observed value, so the result
    * is hash-exact cross-engine with no interpolation arithmetic
    * (Spark's `percentile` interpolates, engines disagree in ulps —
    * the same reason q42 rounds). ⌈p·n⌉ is computed identically on
    * both engines (p·n is one IEEE multiply). One (type, day) window
    * shuffle + one aggregation. */
  def dailyValuePercentiles(spark: SparkSession, dir: String): DataFrame = {
    val grp = Window.partitionBy(col("event_type"), col("day"))
    val w = grp.orderBy(col("value"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        to_date(col("ts")).as("day"), col("value"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(grp))
      .groupBy(col("event_type"), col("day"))
      .agg(
        max(col("n")).as("n_events"),
        max(when(col("rn") === ceil(col("n") * lit(0.5d)).cast("long"),
          col("value"))).as("p50"),
        max(when(col("rn") === ceil(col("n") * lit(0.95d)).cast("long"),
          col("value"))).as("p95"))
      .orderBy(col("event_type"), col("day"))
  }

  /** Weekly cohort retention: users grouped by the week of their
    * first event (the cohort), counted in each later week they were
    * active — the retention triangle.
    *
    * Scale: raw events collapse to distinct (user, week) activity
    * FIRST (one exchange, partial-aggregated — the only corpus-sized
    * shuffle), the cohort week comes from a min-over-window on the
    * collapsed rows (one exchange on user_id), and the final count
    * groups the triangle (cohort-weeks × offsets rows). No join: the
    * window carries the cohort onto every activity row in place. The
    * final count is a plain count, not count(DISTINCT): (user, week)
    * is unique after the collapse and week ↔ offset is bijective per
    * user, so a user can appear at most once per (cohort, offset) —
    * the distinct-expand would be pure overhead. */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
      .groupBy(col("user_id"), col("week")).agg(lit(1).as("__one")).drop("__one")
    val w = Window.partitionBy(col("user_id"))
    act.withColumn("cohort_week", min(col("week")).over(w))
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("bigint").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Incremental rollup maintenance (the materialized-view pattern):
    * a daily per-type aggregate kept as a PARTIAL-AGGREGATE STATE
    * table (count + sum — the mergeable pair), bootstrapped once from
    * history and refreshed by merging only the new batch's partials —
    * the history is never rescanned.
    *
    * The split here is deterministic (event_id mod — the q92 batch
    * convention): "history" bootstraps the state, the "arriving"
    * slice refreshes it, and the reported rollup must equal a from-
    * scratch aggregation over everything (the oracle). The refresh
    * aggregation's input is state rows + batch partials — days × types
    * rows, not events — so at 100 TB refreshing a year-long rollup
    * costs the new day's scan plus a state-sized merge. Averages are
    * DERIVED from the merged pair at read time; storing avg itself
    * would make the state non-mergeable (the mean of means bug). */
  /** Event-transition matrix (the first-order Markov summary of user
    * journeys): per-user event streams ordered by time, adjacent
    * pairs counted per (from, to) type — the sequence-analytics
    * complement of [[funnel]]'s fixed-path counting (the funnel asks
    * "who completed THIS path", the matrix asks "what paths exist").
    *
    * The window order carries event_id as tie-break: same-timestamp
    * events otherwise make `lead` nondeterministic — and cross-engine
    * compare impossible. Scale: ONE shuffle on user_id, per-user sort
    * bounded by a user's history (never the corpus), then a
    * type-pair-sized aggregation — the per-user sort is inherent to
    * sequence semantics, not an implementation choice. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Last-observation-carried-forward imputation over the event
    * stream: `error` events carry no measurement, so their `value` is
    * treated as missing and filled from the user's most recent
    * non-missing observation (`last(_, ignoreNulls)` over a
    * time-ordered per-user frame, `event_id` tie-break so `ts`
    * collisions are deterministic cross-engine). A user whose history
    * STARTS with errors keeps NULL — LOCF never invents a value.
    *
    * Scale: one `user_id` shuffle, per-user-history-bounded sort —
    * the q133 shape; a user_id-bucketed events table runs it
    * exchange-free. The fill itself copies an existing double (no
    * float arithmetic), so the output hashes exactly. */
  def locfImpute(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val v = when(col("event_type") === "error", lit(null).cast("double"))
      .otherwise(col("value"))
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"), col("value"))
      .withColumn("v", v)
      .withColumn("value_filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"),
        col("v").isNull.as("was_missing"), col("value_filled"))
  }

  /** The mergeable partial-aggregate pair per (event_type, day) —
    * the state [[incrementalRollup]] persists and the unit every
    * refresh (batch or per-micro-batch via foreachBatch) re-derives
    * from its slice of events. */
  def rollupPartials(df: DataFrame): DataFrame =
    df.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))

  /** Merge a state table with a refresh's partials: union + re-sum —
    * associative and commutative, so any chopping of the input into
    * refreshes yields the same state (the streaming twin's contract,
    * spec-proven boundary-independent). Input is state-sized. */
  def rollupMerge(state: DataFrame, refresh: DataFrame): DataFrame =
    state.unionByName(refresh)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n")).as("n"), sum(col("sv")).as("sv"))

  def incrementalRollup(spark: SparkSession, dir: String,
                        batchMod: Int = 10, batchRem: Int = 7): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_id"), col("event_type"), to_date(col("ts")).as("day"), col("value"))
    val statePath = spark.conf.get("spark.sql.warehouse.dir")
      .stripSuffix("/") + "/graft_rollup_state"
    rollupPartials(ev.filter(pmod(col("event_id"), lit(batchMod)) =!= batchRem))
      .write.mode("overwrite").parquet(statePath)
    val merged = rollupMerge(spark.read.parquet(statePath),
      rollupPartials(ev.filter(pmod(col("event_id"), lit(batchMod)) === batchRem)))
    // avg derives from the ROUNDED total, not the raw sum (the raw
    // merged sum differs from a single-pass sum by summation order),
    // and is NOT itself rounded: IEEE division of bit-identical
    // inputs is bit-identical, whereas a decimal round of a double
    // sitting exactly on a .00005 boundary is engine-dependent
    // (BigDecimal-of-binary rounds 2.34565→2.3456, shortest-decimal
    // implementations round →2.3457)
    merged.select(col("event_type"), col("day"), col("n"),
      round(col("sv"), 2).as("total"),
      (round(col("sv"), 2) / col("n")).as("avg_value"))
  }

  /** Declarative data-quality audit (the Deequ-style constraint
    * suite): each check is a named violation count — referential
    * integrity, ranges, nullability, uniqueness — reported as one
    * small frame a pipeline gates on before publishing.
    *
    * Scale: per-table checks FUSE into one pass per table (a single
    * conditional-sum aggregate — adding a check to a table adds a
    * column, not a scan); the referential check is the one join, an
    * anti join on the key. Nothing here is sampled: at 100 TB these
    * exact counts are one scheduled scan per table per publish, and
    * "violations = 0" is the gate the downstream MERGE trusts. */
  def qualityAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).agg(
      sum(when(col("l_quantity") < 1 || col("l_quantity") > 60, 1L).otherwise(0L)).as("qty_range"),
      sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("ship_null"),
      sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("price_pos"))
    val ord = Tables.orders(spark, dir).agg(
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("okey_dup"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("tprice_pos"))
    val orphans = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("cust_fk"))
    val wide = li.crossJoin(ord).crossJoin(orphans)
    wide.select(expr(
      """stack(6,
        | 'lineitem_quantity_in_1_60', qty_range,
        | 'lineitem_shipdate_not_null', ship_null,
        | 'lineitem_price_positive', price_pos,
        | 'orders_orderkey_unique', okey_dup,
        | 'orders_totalprice_positive', tprice_pos,
        | 'orders_custkey_references_customer', cust_fk)
        | AS (check_name, n_violations)""".stripMargin))
  }

  /** ANALYZE-style column statistics in ONE table pass: per column,
    * row/null counts, exact NDV, and min/max — the stats a
    * cost-based optimizer (or a data catalog) wants, computed as a
    * single wide aggregate and unpivoted IN THE PLAN (`stack`), so
    * adding a column adds expressions, never a scan. The multi-column
    * exact count(DISTINCT) plans as Spark's expand (k× the rows map-
    * side, still one shuffle); swap approx_count_distinct per column
    * for the sketch path when NDV precision can relax (q54's
    * trade-off, documented there). */
  /** [[columnStats]]' 100 TB twin for the NDV column (the q100/q54
    * sketch-twin pattern): exact multi-column count(DISTINCT) plans an
    * expand (k× the rows map-side) with per-group state proportional
    * to cardinality — at corpus scale the profiler runs
    * approx_count_distinct (fixed-size HLL registers, one ordinary
    * aggregate) instead. Output is the EXACT stats plus an in-plan
    * boolean asserting the sketch landed inside a 4·rsd envelope
    * (floored at ±1 for tiny cardinalities) — the oracle recomputes
    * the exact side and expects literal TRUE, so a sketch regression
    * fails the hash gate without the oracle ever evaluating a sketch. */
  def columnStatsSketch(spark: SparkSession, dir: String,
                        rsd: Double = 0.05): DataFrame = {
    val wide = Tables.lineitem(spark, dir).agg(
      countDistinct(col("l_quantity")).as("qty_ndv"),
      approx_count_distinct(col("l_quantity"), rsd).as("qty_ap"),
      countDistinct(col("l_extendedprice")).as("price_ndv"),
      approx_count_distinct(col("l_extendedprice"), rsd).as("price_ap"),
      countDistinct(col("l_discount")).as("disc_ndv"),
      approx_count_distinct(col("l_discount"), rsd).as("disc_ap"))
    wide.select(expr(
      """stack(3,
        | 'l_quantity', qty_ndv, qty_ap,
        | 'l_extendedprice', price_ndv, price_ap,
        | 'l_discount', disc_ndv, disc_ap)
        | AS (column_name, ndv, ap)""".stripMargin))
      .select(col("column_name"), col("ndv"),
        (abs(col("ap") - col("ndv")) <=
          greatest(lit(1.0), lit(4 * rsd) * col("ndv"))).as("in_envelope"))
  }

  /** Per-source distribution drift vs the corpus — the Population
    * Stability Index over equal-width document-length bins, the
    * standard monitor for "did this source's data shift" before a
    * training run trusts a refreshed corpus (PSI < 0.1 stable,
    * 0.1–0.25 moderate, > 0.25 major — the credit-scoring convention).
    *
    * Cross-engine exactness by construction: bin assignment is pure
    * BIGINT arithmetic ((n_chars − mn)·nBins div (mx − mn + 1) — no
    * float boundary to disagree on), counts pivot to one column per
    * bin, Laplace smoothing ((c+1)/(n+nBins)) avoids ln(0) without an
    * epsilon constant, and the PSI sum is a FIXED left-to-right chain
    * over the bin columns (the q155 pattern — never a float
    * aggregation whose order the engine chooses). ln parity is the
    * same libm contract the BM25/PMI oracles already hash-prove.
    *
    * Scale: one narrow pass bins the corpus (the min/max ride in as a
    * broadcast one-row aggregate), the pivot aggregation shuffles
    * (source, bin) counts only, and the corpus-wide expected row
    * broadcasts back — sources × nBins cells total, corpus-sized work
    * only in the first pass. */
  def sourceDrift(spark: SparkSession, dir: String, nBins: Int = 10): DataFrame = {
    val sized = Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"))
    val g = sized.agg(min(col("n_chars")).as("mn"), max(col("n_chars")).as("mx"))
    val binned = sized.crossJoin(broadcast(g))
      .withColumn("bin", expr(s"((n_chars - mn) * $nBins) div (mx - mn + 1)"))
    psiFromBinCounts(
      binned.groupBy(col("source"), col("bin")).agg(count(lit(1)).as("c")), nBins)
  }

  /** The mergeable (source, bin, c) state the drift monitor persists —
    * binned against a FIXED reference band [mn, mx] (the reference
    * snapshot's, NOT each batch's own: drift is measured against a
    * frozen yardstick, and a per-batch band would silently re-define
    * the bins every refresh). Counts are exact longs, so the merge is
    * associative+commutative addition — any chopping of the corpus
    * into ingest batches folds to the same state.
    *
    * Out-of-band rows CLAMP to the edge bins (standard PSI practice):
    * the frozen band never covers a drifted refresh by definition, and
    * an unclamped index would fall outside the pivot's 0..nBins-1
    * column list in [[psiFromBinCounts]] — silently vanishing from
    * both the bin counts and n_src, making precisely the most-drifted
    * documents invisible to the monitor that exists to flag them. */
  def driftBinPartials(docs: DataFrame, mn: Long, mx: Long,
                       nBins: Int = 10): DataFrame =
    docs.select(col("source"),
        greatest(lit(0L), least(lit(nBins - 1L),
          expr(s"((n_chars - $mn) * $nBins) div ($mx - $mn + 1)"))).as("bin"))
      .groupBy(col("source"), col("bin")).agg(count(lit(1)).as("c"))

  def driftBinMerge(state: DataFrame, refresh: DataFrame): DataFrame =
    state.unionByName(refresh)
      .groupBy(col("source"), col("bin")).agg(sum(col("c")).as("c"))

  /** PSI per source from a (source, bin, c) count table: pivot to one
    * column per bin, corpus-wide expected row broadcast back, fixed
    * left-to-right chain (see [[sourceDrift]]'s exactness contract).
    * Serves both the one-shot query and the folded streaming state. */
  private[graft] def psiFromBinCounts(binCounts: DataFrame, nBins: Int): DataFrame = {
    val bins = (0 until nBins).toList
    def cnt(i: Int) = coalesce(col(s"$i"), lit(0L))
    val bySource = binCounts.groupBy(col("source")).pivot("bin", bins).agg(sum(col("c")))
    val corpus = binCounts.groupBy(lit(1).as("one")).pivot("bin", bins).agg(sum(col("c")))
      .select(bins.map(i => cnt(i).as(s"e$i")) :+
        bins.map(i => cnt(i)).reduce(_ + _).as("n_tot"): _*)
    val withTotals = bySource
      .withColumn("n_src", bins.map(cnt).reduce(_ + _))
      .crossJoin(broadcast(corpus))
    val psi = bins.map { i =>
      val pa = (cnt(i) + lit(1L)).cast("double") / (col("n_src") + lit(nBins.toLong))
      val pe = (col(s"e$i") + lit(1L)).cast("double") / (col("n_tot") + lit(nBins.toLong))
      (pa - pe) * log(pa / pe)
    }.reduce(_ + _)
    withTotals.select(col("source"), col("n_src").as("n_docs"),
      TextOps.roundAt(psi, 6).as("psi"))
  }

  def columnStats(spark: SparkSession, dir: String): DataFrame = {
    val wide = Tables.lineitem(spark, dir).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("qty_nulls"),
      countDistinct(col("l_quantity")).as("qty_ndv"),
      min(col("l_quantity")).cast("double").as("qty_min"),
      max(col("l_quantity")).cast("double").as("qty_max"),
      sum(when(col("l_extendedprice").isNull, 1L).otherwise(0L)).as("price_nulls"),
      countDistinct(col("l_extendedprice")).as("price_ndv"),
      min(col("l_extendedprice")).cast("double").as("price_min"),
      max(col("l_extendedprice")).cast("double").as("price_max"),
      sum(when(col("l_discount").isNull, 1L).otherwise(0L)).as("disc_nulls"),
      countDistinct(col("l_discount")).as("disc_ndv"),
      min(col("l_discount")).cast("double").as("disc_min"),
      max(col("l_discount")).cast("double").as("disc_max"))
    wide.select(col("n_rows"), expr(
      """stack(3,
        | 'l_quantity', qty_nulls, qty_ndv, qty_min, qty_max,
        | 'l_extendedprice', price_nulls, price_ndv, price_min, price_max,
        | 'l_discount', disc_nulls, disc_ndv, disc_min, disc_max)
        | AS (column_name, n_nulls, ndv, min_d, max_d)""".stripMargin))
  }

  def globalRunningSum(df: DataFrame, order: Seq[org.apache.spark.sql.Column],
                       value: org.apache.spark.sql.Column, outName: String,
                       nPartitions: Int = 0): DataFrame = {
    val parts = if (nPartitions > 0) nPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__val", coalesce(value, lit(0L)))
    val wLocal = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val local = ranged.withColumn("__local", sum(col("__val")).over(wLocal))
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"))
      .agg(sum(col("__val")).as("__ptotal"))
      .withColumn("__offset", coalesce(sum(col("__ptotal")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(outName, col("__local") + col("__offset"))
      .drop("__pid", "__val", "__local", "__offset")
  }

  /** Per-GROUP running sum without a per-group global sort: the
    * grouped twin of [[globalRunningSum]]. Range-partition on
    * (group, order...), sum locally per (partition, group), then
    * per-group offsets from the O(partitions × groups-touched)
    * partition summaries — a giant group spans partitions and still
    * never funnels through one task, where
    * `Window.partitionBy(group)` would sort that group's entire
    * slice in a single task. `group` is a column NAME so both the
    * local window and the offset join key the same attribute. */
  def groupedRunningSum(df: DataFrame, group: String,
                        order: Seq[org.apache.spark.sql.Column],
                        value: org.apache.spark.sql.Column, outName: String,
                        nPartitions: Int = 0): DataFrame = {
    val parts = if (nPartitions > 0) nPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, col(group) +: order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__val", coalesce(value, lit(0L)))
    val wLocal = Window.partitionBy(col("__pid"), col(group)).orderBy(order: _*)
    val local = ranged.withColumn("__local", sum(col("__val")).over(wLocal))
    val wOff = Window.partitionBy(col("__g")).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged.groupBy(col("__pid"), col(group).as("__g"))
      .agg(sum(col("__val")).as("__ptotal"))
      .withColumn("__offset", coalesce(sum(col("__ptotal")).over(wOff), lit(0L)))
      .select(col("__pid").as("__opid"), col("__g"), col("__offset"))
    // fresh names on the offsets side: both frames descend from
    // `ranged`, so joining on the original attributes would be an
    // ambiguous self-join
    local.join(broadcast(offsets),
        col("__pid") === col("__opid") && col(group) === col("__g"))
      .withColumn(outName, col("__local") + col("__offset"))
      .drop("__pid", "__opid", "__g", "__val", "__local", "__offset")
  }

  /** Z-order keys for the orders table on (customer, order day) —
    * the two dimensions an orders workload actually filters by
    * (per-customer lookups AND date-range scans). Both dims quantize
    * to 16 bits with exact integer geometry (maxima ride in as a
    * broadcast one-row aggregate — no driver-side action at plan
    * time) and interleave via [[graft.functions.ZOrder.zValue]].
    * Sorting the table by `zkey` before writing
    * ([[graft.sources.Formats.writeZOrdered]]) gives every file a
    * compact min/max envelope in BOTH dimensions — parquet footer
    * stats then skip files for predicates on either one (ZOrderSpec
    * proves the envelopes narrow vs the natural layout). */
  def zOrderKeysOrders(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.ZOrder
    val o = Tables.orders(spark, dir)
    val days = datediff(col("o_orderdate"), lit("1992-01-01"))
      .cast("long").as("o_days")
    val keyed = o.select(col("o_orderkey"), col("o_custkey"), days)
    val mx = keyed.agg(max(col("o_custkey")).as("mc"), max(col("o_days")).as("md"))
    keyed.crossJoin(broadcast(mx))
      .select(col("o_orderkey"), col("o_custkey"), col("o_days"),
        ZOrder.zValue(
          ZOrder.quantize(col("o_custkey"), col("mc")),
          ZOrder.quantize(col("o_days"), col("md"))).as("zkey"))
  }

  /** q186: last-touch attribution — each purchase attributed to the
    * user's most recent PRECEDING click, flagged whether it landed
    * inside the 1-hour attribution window (the marketing-analytics
    * primitive; q34/q154's as-of joins match across TABLES, this is
    * the within-stream form every clickstream warehouse runs).
    *
    * One user-partitioned window ordered (ts, event_id) — the
    * same-timestamp tie is broken deterministically — carrying the
    * last click timestamp via `last(…, ignoreNulls)` over the
    * preceding-rows frame (the q145 LOCF shape); purchases filter
    * afterwards, so the window sees every event but the output is
    * purchase-sized. Timestamp arithmetic is exact integer
    * microseconds on both engines. */
  def lastTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .withColumn("t_click",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("t_click"),
        (col("t_click").isNotNull &&
          col("t_click") >= col("ts") - expr("INTERVAL 1 HOUR")).as("attributed"))
      .orderBy(col("event_id"))
  }

  /** q187: DAU / WAU / stickiness — daily active users, trailing
    * 7-day active users, and their ratio per day (the engagement
    * triple every product dashboard leads with). The trailing
    * distinct count is NOT a window function (distinct-over-range
    * isn't expressible as one): each active (user, day) row is
    * expanded map-side to the 7 target days it keeps the user active
    * for, then one countDistinct per target day — the explode is a
    * fixed ×7 (the q58 sliding-window device), and rows are already
    * collapsed to distinct (user, day) FIRST so the expansion is
    * bounded by active-pairs, not raw events. Days with activity only
    * in their trailing window (no DAU) still appear, dau = 0. */
  def dauWau(spark: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val dau = active.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val wau = active
      .select(col("user_id"), explode(sequence(
        col("day"), date_add(col("day"), 6))).as("day"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).as("wau"))
      // the expansion manufactures up to 6 days past the last real
      // one; an outer day roster would count windows with no anchor —
      // restrict to days that exist in the data
      .join(active.select(col("day")).distinct(), Seq("day"), "left_semi")
    wau.join(dau, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("dau"), lit(0L)).as("dau"), col("wau"),
        round(coalesce(col("dau"), lit(0L)).cast("double") / col("wau"), 4)
          .as("stickiness"))
      .orderBy(col("day"))
  }

  /** q188: deletion-propagation audit (the right-to-be-forgotten
    * pass): given a deletion roster — here the deterministic
    * user_id ≡ 0 (mod 50) slice standing in for a request list — the
    * per-day count of events that must go versus stay, with the
    * retained row count and an in-plan `clean` flag proving the
    * retained slice contains NO rostered user (the oracle asserts
    * every flag TRUE). The audit is what compliance actually signs
    * off on: not "we deleted", but "what remains provably contains
    * none of them". One broadcast-roster anti/semi pair over a single
    * corpus scan shape; at 100 TB the roster is a broadcast (request
    * lists are small) and the rewrite is a partition-level anti-join
    * write (the q105 dynamic-overwrite path). */
  def deletionAudit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), to_date(col("ts")).as("day"))
    // the roster is a FRAME (as a real request list would be), and
    // retention is an anti-join against it; the `clean` flag then
    // re-checks the anti-join's output with the INDEPENDENT predicate
    // form — two mechanisms must agree, so a join-semantics bug (null
    // keys, broadcast pruning) surfaces as a FALSE flag, not silence
    val roster = ev.select(col("user_id")).distinct()
      .filter(col("user_id") % 50L === 0L)
    val deleted = ev.join(roster, Seq("user_id"), "left_semi")
      .groupBy(col("day")).agg(count(lit(1)).as("n_delete"))
    val retained = ev.join(roster, Seq("user_id"), "left_anti")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_retain"),
        sum(when(col("user_id") % 50L === 0L, 1L).otherwise(0L)).as("n_leaked"))
    retained.join(deleted, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_delete"), lit(0L)).as("n_delete"),
        col("n_retain"),
        (col("n_leaked") === 0L).as("clean"))
      .orderBy(col("day"))
  }

  /** q189: equi-DEPTH histogram of order totalprice — the
    * optimizer-statistics companion to q56's equal-width form: k
    * buckets of (near-)equal row count with exact quantile
    * boundaries. Boundary b_i is the OBSERVED value at rank
    * ⌈i·n/k⌉ (the q185 discrete-selection rule — no interpolation,
    * hash-exact), and rows land in bucket min{i : v ≤ b_i} so the
    * histogram is reproducible from its boundary list alone (what a
    * real optimizer persists). Two passes: one rank window for the
    * boundaries (k rows out), one broadcast-boundaries narrow scan
    * for the counts. */
  def equiDepthHistogram(spark: SparkSession, dir: String,
                         k: Int = 8): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_totalprice").as("v"))
    val w = Window.orderBy(col("v"))
    val n = o.agg(count(lit(1)).as("n"))
    // rank window over a single global order: acceptable here because
    // the windowed frame collapses to k boundary ROWS immediately (at
    // 100 TB the swap-in is approxQuantile's G-K sketch or the q185
    // per-group form; the exact global sort is the oracle-checkable
    // reference this query exists to pin)
    val ranked = o.withColumn("rn", row_number().over(w).cast("long"))
      .crossJoin(broadcast(n))
    // bounds are ascending by construction (v at a larger rank ≥ v at
    // a smaller one), so array_sort of the unordered collect_list IS
    // the rank order — collect_list after orderBy is NOT contractually
    // order-preserving across the final aggregation shuffle, and an
    // out-of-order bounds array would silently mis-assign buckets
    val bounds = ranked
      .filter((1 to k).map(i =>
        col("rn") === ceil(col("n") * lit(i.toDouble) / k).cast("long"))
        .reduce(_ || _))
      .groupBy(col("rn")).agg(max(col("v")).as("bound"))
      .select(array_sort(collect_list(col("bound"))).as("bounds"))
    o.crossJoin(broadcast(bounds))
      .select(aggregate(
        col("bounds"),
        struct(lit(k - 1).cast("int").as("b"), lit(0).cast("int").as("i")),
        (acc, bd) => struct(
          when(col("v") <= bd && acc.getField("b") === lit(k - 1),
            acc.getField("i")).otherwise(acc.getField("b")).as("b"),
          (acc.getField("i") + 1).as("i")),
        acc => acc.getField("b")).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("bucket"))
  }

  /** q190: per-group regression aggregates — slope, intercept and r²
    * of quality on document length per source (the SQL REGR_* family,
    * computed the engine-portable way): every sum folds the group's
    * (x, y) pairs in doc_id ORDER (the q177 sorted-fold convention) —
    * engine regr_slope/corr implementations accumulate in
    * engine-chosen order and can never hash-match. x is the exact
    * n_chars long, y the shared rounded-at-6 quality score;
    * slope/intercept/r² are fixed IEEE trees rounded at 6. One
    * aggregation; per-group arrays bounded by group size. */
  def groupRegression(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("double").as("x"),
        TextOps.qualityCol.as("y"))
    def fsum(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      aggregate(col("ts"), lit(0.0d), (acc, t) => acc + f(t))
    docs.groupBy(col("source"))
      .agg(count(lit(1)).cast("double").as("n"),
        array_sort(collect_list(struct(col("doc_id"), col("x"), col("y")))).as("ts"))
      .select(col("source"), col("n").cast("bigint").as("n_docs"),
        TextOps.roundAt(
          (col("n") * fsum(t => t.getField("x") * t.getField("y")) -
            fsum(_.getField("x")) * fsum(_.getField("y"))) /
          (col("n") * fsum(t => t.getField("x") * t.getField("x")) -
            fsum(_.getField("x")) * fsum(_.getField("x"))), 6).as("slope"),
        TextOps.roundAt(
          (fsum(_.getField("y")) -
            ((col("n") * fsum(t => t.getField("x") * t.getField("y")) -
              fsum(_.getField("x")) * fsum(_.getField("y"))) /
             (col("n") * fsum(t => t.getField("x") * t.getField("x")) -
               fsum(_.getField("x")) * fsum(_.getField("x")))) *
            fsum(_.getField("x"))) / col("n"), 6).as("intercept"),
        TextOps.roundAt(
          ((col("n") * fsum(t => t.getField("x") * t.getField("y")) -
            fsum(_.getField("x")) * fsum(_.getField("y"))) *
           (col("n") * fsum(t => t.getField("x") * t.getField("y")) -
             fsum(_.getField("x")) * fsum(_.getField("y")))) /
          ((col("n") * fsum(t => t.getField("x") * t.getField("x")) -
            fsum(_.getField("x")) * fsum(_.getField("x"))) *
           (col("n") * fsum(t => t.getField("y") * t.getField("y")) -
             fsum(_.getField("y")) * fsum(_.getField("y")))), 6).as("r2"))
      .orderBy(col("source"))
  }

  /** q191: shuffle-skew audit of a join/aggregation key — the
    * diagnose-BEFORE-salting tool (q68 is the cure; this is the
    * diagnosis): per-key row counts summarized as the Gini
    * coefficient of the key distribution plus the top-5 heaviest
    * keys with their load share. Gini uses the rank formulation
    * `2·Σ(i·cᵢ)/(n·Σc) − (n+1)/n` over counts ranked ascending —
    * every sum is EXACT LONG arithmetic (rank×count products), so
    * there is no float fold order to coordinate; the final ratio is
    * one fixed IEEE tree rounded at 6. Int64 headroom: Σ rk·cnt ≤
    * n_keys·n_rows, so the sum wraps only past n_keys·n_rows ≈
    * 9.2e18 (e.g. 10⁶ keys × 10¹³ rows) — see the BASELINE.md
    * exact-long audit table.
    *
    * Scale: the per-key aggregation is one corpus shuffle with
    * map-side partials; everything after operates on the KEY
    * DISTRIBUTION (keys-sized, not corpus-sized) — the rank window
    * and summary run over key rows only. */
  def skewAudit(spark: SparkSession, dir: String, topK: Int = 5): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt"), col("user_id"))
    val summary = counts
      .withColumn("rk", row_number().over(w).cast("long"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("n_rows"),
        max(col("cnt")).as("max_mult"),
        sum(col("rk") * col("cnt")).as("s_rank"))
      .select(col("n_keys"), col("n_rows"), col("max_mult"),
        TextOps.roundAt(
          lit(2.0d) * col("s_rank") / (col("n_keys") * col("n_rows")) -
            (col("n_keys") + 1L).cast("double") / col("n_keys"), 6).as("gini"))
    counts.orderBy(col("cnt").desc, col("user_id")).limit(topK)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("cnt").desc, col("user_id"))).cast("long"))
      .crossJoin(broadcast(summary))
      .select(col("rank"), col("user_id"), col("cnt"),
        TextOps.roundAt(col("cnt").cast("double") / col("n_rows"), 6).as("share"),
        col("n_keys"), col("n_rows"), col("max_mult"), col("gini"))
      .orderBy(col("rank"))
  }

  /** q192: join-cardinality profile — for each candidate join edge,
    * the numbers an optimizer (or an engineer sizing a shuffle)
    * needs BEFORE running it: per-side row counts and key NDVs, max
    * key multiplicities, and the EXACT join output cardinality
    * Σ_k cl(k)·cr(k) computed from the two per-key count tables
    * (counts-sized join, never the fact tables). All exact longs —
    * the products and sums are integer arithmetic, associative, no
    * float coordination needed. Profiles the two orders/customer
    * edges the TPC-H-ish schema actually joins on. */
  def joinCardinalityProfile(spark: SparkSession, dir: String): DataFrame = {
    def profile(name: String, l: DataFrame, r: DataFrame): DataFrame = {
      val lc = l.toDF("k").groupBy(col("k")).agg(count(lit(1)).as("cl"))
      val rc = r.toDF("k").groupBy(col("k")).agg(count(lit(1)).as("cr"))
      // q247-convention post-hoc audit: join output cardinality is
      // EXACTLY the long sum that explodes in the wild (two 4e9-hot
      // keys wrap int64). n_matched, max(cl), max(cr) are wrap-free
      // and certify both every per-key product and the sum; a breach
      // raises like the oracle's BIGINT arithmetic instead of
      // returning a silently wrapped profile.
      val joined = lc.join(rc, Seq("k"))
        .agg(coalesce(sum(col("cl") * col("cr")), lit(0L)).as("join_rows_raw"),
          count(lit(1)).as("n_matched_keys"),
          coalesce(max(col("cl")), lit(0L)).as("mcl"),
          coalesce(max(col("cr")), lit(0L)).as("mcr"))
        .select(
          when(col("n_matched_keys").cast("double") *
              col("mcl").cast("double") * col("mcr").cast("double") < lit(9.0e18),
            col("join_rows_raw"))
            .otherwise(raise_error(lit(
              s"join cardinality profile '$name' would overflow int64 — " +
                "the join output itself exceeds long range")).cast("long"))
            .as("join_rows"),
          col("n_matched_keys"))
      lc.agg(count(lit(1)).as("ndv_left"), sum(col("cl")).as("rows_left"),
          max(col("cl")).as("max_mult_left"))
        .crossJoin(rc.agg(count(lit(1)).as("ndv_right"), sum(col("cr")).as("rows_right"),
          max(col("cr")).as("max_mult_right")))
        .crossJoin(joined)
        .select(lit(name).as("edge"), col("rows_left"), col("ndv_left"),
          col("max_mult_left"), col("rows_right"), col("ndv_right"),
          col("max_mult_right"), col("n_matched_keys"), col("join_rows"))
    }
    profile("orders.custkey=customer.custkey",
      Tables.orders(spark, dir).select(col("o_custkey")),
      Tables.customer(spark, dir).select(col("c_custkey")))
      .unionByName(profile("lineitem.orderkey=orders.orderkey",
        Tables.lineitem(spark, dir).select(col("l_orderkey")),
        Tables.orders(spark, dir).select(col("o_orderkey"))))
      .orderBy(col("edge"))
  }

  /** q174: hourly event-rate anomaly detection — per (event_type,
    * hour) z-scores of the event count against that type's hourly
    * distribution, with an |z| ≥ `zThresh` flag. The ingest-telemetry
    * monitor a pipeline runs on its own event stream (a dead
    * collector reads z ≪ 0, a replay storm z ≫ 0) — q157 watches
    * WHAT arrives (content drift), this watches HOW MUCH.
    *
    * Determinism: hourly counts are exact longs, so Σx and Σx² are
    * exact (int64 headroom: Σx² ≤ n_buckets·max_hourly² wraps only
    * past ~3e9 events in one hour — see the BASELINE.md exact-long
    * audit table); mean and the textbook variance
    * `(Σx² − (Σx)²/n)/(n−1)`
    * are then fixed IEEE expression trees both engines share — no
    * engine stddev function is used precisely because sample/pop
    * conventions and accumulation orders differ across engines. An
    * all-constant type (sd = 0) yields z = 0 rather than ±∞, and a
    * single-bucket type (n = 1, where (n−1) = 0 makes Spark's
    * non-ANSI divide return NULL but DuckDB's double divide return
    * NaN) is guarded EXPLICITLY to sd = 0 on both engines — engine
    * divide-by-zero conventions are never relied on. z is
    * rounded at 6 for output; the flag compares the RAW z.
    *
    * Scale: one (type, hour) aggregation with map-side partials, one
    * tiny per-type stats table broadcast back — the corpus shuffles
    * once. */
  /** q209: inter-event time-gap percentiles per event type — p50 /
    * p95 / max of the gaps between consecutive events of a type, in
    * exact integer microseconds. The arrival-process companion to
    * q185 (VALUE percentiles) and q174/q199 (hourly VOLUME): a
    * growing p95 gap is the earliest sign a producer is stalling,
    * visible long before an hourly bucket goes empty.
    *
    * Exactness: gaps are differences of integer-microsecond
    * timestamps (unix_micros ↔ epoch_us); both percentiles use the
    * q185 rank-⌈p·n⌉ discrete selection, so every output is an exact
    * long.
    *
    * Scale: one event_type window for the lag (the corpus's only
    * shuffle — same partitioning reused by the rank window and the
    * final aggregation, one Exchange total), types-sized output. */
  def eventGapPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val wLag = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, dir)
      .select(col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(wLag))
      .filter(col("prev").isNotNull)
      .select(col("event_type"), col("event_id"),
        // NTZ → TIMESTAMP is value-preserving under the pinned-UTC
        // session, making unix_micros ≡ DuckDB's epoch_us on the
        // same naive instants
        (unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("prev").cast("timestamp"))).as("gap_us"))
    val grp = Window.partitionBy(col("event_type"))
    val wRank = grp.orderBy(col("gap_us"), col("event_id"))
    gaps
      .withColumn("rn", row_number().over(wRank).cast("long"))
      .withColumn("n", count(lit(1)).over(grp))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_gaps"),
        max(when(col("rn") === ceil(col("n") * lit(0.5d)).cast("long"),
          col("gap_us"))).as("p50_us"),
        max(when(col("rn") === ceil(col("n") * lit(0.95d)).cast("long"),
          col("gap_us"))).as("p95_us"),
        max(col("gap_us")).as("max_us"))
      .orderBy(col("event_type"))
  }

  /** q215: conversion latency percentiles — p50/p95/max microseconds
    * from each user's FIRST view to their first purchase AFTER it
    * (q117/q183's funnel semantics turned into a latency
    * distribution; q209 measures the stream's arrival health, this
    * measures the USER's journey). Exact integer-microsecond gaps
    * (the q209 convention) and q185 rank-select percentiles — but
    * over ONE global group, so the rank comes from the two-phase
    * distributed ordinal ([[globalRunningSum]]), never a single-task
    * global window: conversions are user-count-sized and a global
    * Window.orderBy would funnel all of them through one task at
    * 100 TB.
    *
    * Scale: two user-keyed aggregations (view min, gated purchase
    * min) + one user-keyed join; the percentile machinery runs over
    * the conversions-sized latency table, range-partitioned. */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val view = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val purchase = ev.join(view, Seq("user_id"))
      .filter(col("event_type") === "purchase" && col("ts") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    val lat = view.join(purchase, Seq("user_id"))
      .select(col("user_id"),
        (unix_micros(col("t_purchase").cast("timestamp")) -
          unix_micros(col("t_view").cast("timestamp"))).as("lat_us"))
    val withRn = globalRunningSum(
      lat, Seq(col("lat_us"), col("user_id")), lit(1L), "rn")
    val nDf = lat.agg(count(lit(1)).as("n"))
    withRn.crossJoin(broadcast(nDf))
      .agg(max(col("n")).as("n_conversions"),
        max(when(col("rn") === ceil(col("n") * lit(0.5d)).cast("long"),
          col("lat_us"))).as("p50_us"),
        max(when(col("rn") === ceil(col("n") * lit(0.95d)).cast("long"),
          col("lat_us"))).as("p95_us"),
        max(col("lat_us")).as("max_us"))
  }

  /** q199: ROBUST hourly event-rate anomalies per type — the
    * median/MAD modified z-score (Iglewicz & Hoaglin 1993,
    * z = 0.6745·(x − med)/MAD, flag |z| ≥ 3.5) companion to
    * [[eventRateAnomaly]]'s mean/sd form. The difference is why both
    * exist: a traffic SPIKE inflates the mean and sd it is judged
    * against (masking — one 10× hour can drag the z of a 5× hour
    * under threshold), while the median and MAD ignore it; conversely
    * the robust form flags harder in heavy-tailed streams, so the
    * operational playbook is sd for well-behaved volumes, MAD when
    * the stream has bursts — exactly when anomaly detection matters.
    *
    * Exactness: hourly counts, both medians (count median and
    * deviation median) and every |x − med| are EXACT LONGS — the
    * medians use q185's PERCENTILE_DISC rank-⌈n/2⌉ selection, so no
    * interpolation arithmetic exists anywhere; the z is one fixed
    * IEEE tree (0.6745 · cast / cast) with the flag on the RAW value
    * and MAD = 0 (constant-rate types, singleton buckets) guarded to
    * z = 0 on both engines.
    *
    * Scale: the corpus shuffles ONCE into (type, hour) counts (lazily
    * checkpointed — both median passes and the output reuse it); the
    * two rank windows run over the bucket table (types × hours, tiny)
    * and the med/MAD dims broadcast back. */
  def robustRateAnomaly(spark: SparkSession, dir: String,
                        zThresh: Double = 3.5): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .localCheckpoint(false)
    val grp = Window.partitionBy(col("event_type"))
    def discMedian(df: DataFrame, value: String, alias: String): DataFrame = {
      val w = grp.orderBy(col(value), col("hour"))
      df.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("nb", count(lit(1)).over(grp))
        .groupBy(col("event_type"))
        .agg(max(when(col("rn") === ceil(col("nb") * lit(0.5d)).cast("long"),
          col(value))).as(alias))
    }
    val med = discMedian(hourly, "n_events", "med")
    val dev = hourly.join(broadcast(med), Seq("event_type"))
      .withColumn("dev", abs(col("n_events") - col("med")))
    val mad = discMedian(dev, "dev", "mad")
    val z = when(col("mad") === 0L, lit(0.0d))
      .otherwise(lit(0.6745d) * (col("n_events") - col("med")).cast("double") /
        col("mad").cast("double"))
    dev.join(broadcast(mad), Seq("event_type"))
      .select(col("event_type"), col("hour"), col("n_events"),
        col("med"), col("mad"),
        TextOps.roundAt(z, 6).as("robust_z"),
        (abs(z) >= zThresh).as("is_anomaly"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** q237: Markov removal-effect attribution (Anderl et al. 2016 —
    * the data-driven attribution model behind GA4's) — how much of
    * the conversion probability does each channel CARRY? Journeys are
    * per-user event paths truncated at the first purchase; the
    * transition matrix absorbs at PURCHASE (value 1) and DROP (end
    * without purchase, value 0); conversion probability is the
    * absorbing-chain value V(START); a channel's removal effect is
    * the relative drop in V(START) when transitions INTO it are
    * redirected to DROP — last-touch (q186) credits the final step,
    * this credits indispensability.
    *
    * Architecture: the corpus collapses in ONE user-keyed shuffle
    * (three windows + the pair build share the partitioning) into the
    * (state, target) count matrix — BOUNDED MODEL STATE (≤ (types+1)
    * ×(types+2) rows, the lloydCentroids collect rule); the value
    * iteration (80 synchronous rounds — the per-round contraction is
    * the non-absorbing transition mass ≈ 0.8, so 80 rounds leave a
    * ~2e-8 residual; the spec pins the fixpoint) runs driver-side on that matrix exactly
    * as the oracle replays it in SQL — per state, terms folded in
    * ASCENDING TARGET ORDER (foldLeft ↔ list_sum over list(… ORDER BY
    * t)), absorber targets contributing p·1.0 / 0.0, removed-channel
    * terms contributing literal 0.0 — so every double is
    * IEEE-identical across engines. Transition probabilities are one
    * division of exact longs; outputs round at 6.
    *
    * Scale: the only corpus-sized work is the journey shuffle;
    * everything after runs on the types-sized model. */
  def removalEffectAttribution(spark: SparkSession, dir: String,
                               rounds: Int = 80): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("rn", row_number().over(w).cast("long"))
    val firstP = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("rn")).as("fp"))
    val kept = ev.join(firstP, Seq("user_id"), "left")
      .filter(col("fp").isNull || col("rn") <= col("fp"))
    val w2 = Window.partitionBy(col("user_id")).orderBy(col("rn"))
    val w2d = Window.partitionBy(col("user_id")).orderBy(col("rn").desc)
    val wp = kept
      .withColumn("prev", lag(col("event_type"), 1).over(w2))
      .withColumn("krn", row_number().over(w2))
      .withColumn("krd", row_number().over(w2d))
    val trans = wp.filter(col("prev").isNotNull)
      .select(col("prev").as("s"), col("event_type").as("t"))
      .unionByName(wp.filter(col("krn") === 1)
        .select(lit("START").as("s"), col("event_type").as("t")))
      .unionByName(wp.filter(col("krd") === 1 && col("fp").isNull)
        .select(col("event_type").as("s"), lit("DROP").as("t")))
      .groupBy(col("s"), col("t")).agg(count(lit(1)).as("n"))
    // bounded model state: (types+1) x (types+2) rows
    val mat: Map[(String, String), Long] = trans.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val states = mat.keys.map(_._1).toSeq.distinct.sorted
    val rowTot = states.map(s =>
      s -> mat.collect { case ((`s`, _), n) => n }.sum).toMap
    def vIter(removed: Option[String]): Double = {
      var v = states.map(_ -> 0.0).toMap
      for (_ <- 1 to rounds) {
        v = states.map { s =>
          val terms = mat.toSeq.filter(_._1._1 == s).sortBy(_._1._2)
            .map { case ((_, t), n) =>
              val p = n.toDouble / rowTot(s).toDouble
              if (removed.contains(t)) 0.0
              else if (t == "purchase") p * 1.0
              else if (t == "DROP") 0.0
              else p * v.getOrElse(t, 0.0)
            }
          s -> terms.foldLeft(0.0)(_ + _)
        }.toMap
      }
      v.getOrElse("START", 0.0)
    }
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val base = vIter(None)
    val channels = mat.keys.map(_._2)
      .filter(t => t != "purchase" && t != "DROP").toSeq.distinct.sorted
    val rows = channels.map { c =>
      val rem = vIter(Some(c))
      val eff = if (base > 0) (base - rem) / base else 0.0
      (c, r6(base), r6(rem), r6(eff))
    }
    rows.toDF("channel", "base_conv", "removed_conv", "removal_effect")
      .orderBy(col("channel"))
  }

  /** q233: per-user behavioral predictability — Shannon entropy of
    * each user's first-order event-type TRANSITION distribution.
    * q133's corpus transition matrix says what users do in aggregate;
    * this scores each user: entropy 0 = a fully scripted loop (bot
    * signature), high entropy = erratic exploration — the
    * segmentation feature fraud and engagement models both consume.
    *
    * Exactness: transitions and their counts are exact longs (lag
    * over the per-user (ts, event_id) order); each (prev→cur) term
    * −p·ln p is one fixed IEEE tree (single mirrored ln) floor-scaled
    * to a 1e12 LONG (the q225 device), so the per-user Σ is an
    * order-independent integer sum. Single-event users have no
    * transitions and drop (entropy undefined, mirrored by the
    * oracle's inner grouping).
    *
    * Scale: ONE user-keyed shuffle feeds the lag window, the
    * transition-count aggregation and the user rollup (same
    * partitioning all the way down); nothing is held per user but
    * its transition-type counts. */
  def userTransitionEntropy(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("user_id"), col("prev"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val withTot = trans
      .withColumn("nt", sum(col("n")).over(Window.partitionBy(col("user_id"))))
    val p = col("n").cast("double") / col("nt").cast("double")
    val termScaled = floor(-(p * log(p)) * lit(1e12) + lit(0.5)).cast("long")
    withTot
      .groupBy(col("user_id"))
      .agg(max(col("nt")).as("n_trans"),
        count(lit(1)).as("n_patterns"),
        sum(termScaled).as("sc"))
      .select(col("user_id"), col("n_trans"), col("n_patterns"),
        TextOps.roundAt(col("sc").cast("double") / lit(1e12), 6).as("entropy"))
      .orderBy(col("user_id"))
  }

  /** q239: α-trimmed mean of event VALUE per type — the robust-
    * location completion of the family: q129 winsorizes (clips
    * outliers to the fence), q199 takes the median (discards all but
    * one order statistic); the trimmed mean DROPS the top and bottom
    * α% and averages the rest — the estimator of choice when the tail
    * is garbage but the bulk is informative (latencies with timeout
    * spikes, payments with test transactions). Both the trimmed and
    * the untrimmed mean are emitted so the gap IS the outlier mass.
    *
    * Exactness: the trim boundary is integer arithmetic (k =
    * (n·α) div 100; keep ranks k < rn ≤ n−k over the deterministic
    * (value, event_id) order); each kept value is floor-scaled at
    * 1e6 to an exact long (the q218 device — the OUTPUT is defined
    * as the 1e6-quantized mean), so both sums are order-independent
    * integer aggregations with one final division each. Long
    * headroom: |value|·10⁶ × rows per type ≲ 2⁶³ to ~10¹² rows at
    * value ~100.
    *
    * Scale: one (type)-keyed rank window + the rollup on the same
    * partitioning; no corpus-global sort. */
  def trimmedMean(spark: SparkSession, dir: String, alphaPct: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val grp = Window.partitionBy(col("event_type"))
    val ranked = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(grp))
      .withColumn("v6", floor(col("value") * 1e6 + lit(0.5)).cast("long"))
      .withColumn("k", expr(s"(n * $alphaPct) div 100"))
    ranked.groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        sum(col("v6")).as("s_all"),
        sum(when(col("rn") > col("k") && col("rn") <= col("n") - col("k"),
          col("v6")).otherwise(lit(0L))).as("s_trim"),
        sum(when(col("rn") > col("k") && col("rn") <= col("n") - col("k"), 1L)
          .otherwise(0L)).as("n_trim"))
      .select(col("event_type"), col("n"), col("n_trim"),
        TextOps.roundAt(col("s_all").cast("double") /
          (col("n").cast("double") * 1e6), 6).as("mean_all"),
        TextOps.roundAt(col("s_trim").cast("double") /
          (greatest(col("n_trim"), lit(1L)).cast("double") * 1e6), 6).as("mean_trimmed"))
      .orderBy(col("event_type"))
  }

  /** q231: daily-volume OLS trend per event type — the least-squares
    * slope of daily counts against the day index, the
    * growing-or-dying readout q223's changepoint and q221's EWMA
    * bracket (CUSUM says WHERE a shift happened, EWMA tracks level,
    * this fits the overall direction). Closed form over the day-rank
    * x and count y: slope = (D·Σxy − Σx·Σy)/(D·Σx² − (Σx)²).
    *
    * Exactness device: x is the per-type day RANK (1..D) and y the
    * exact count, so ALL FIVE sufficient statistics are EXACT LONGS —
    * order-independent integer aggregation, no ordered fold, and the
    * slope is one final division of exact operands (the q223 trick
    * applied to regression; q190's per-doc regression needs ordered
    * double folds because its x is a measured double — rank x buys
    * exactness for free). Singleton series (D = 1) → denominator 0,
    * guarded to slope 0 on both engines.
    *
    * Scale: one corpus collapse to (type, day) buckets, one rank
    * window over the time-bounded bucket table, one 5-column rollup
    * per type. */
  def dailyRateTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val ranked = daily.withColumn("x", row_number().over(w).cast("long"))
    val g = ranked.groupBy(col("event_type"))
      .agg(count(lit(1)).as("d"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
    val den = g("d") * g("sxx") - g("sx") * g("sx")
    val slope = when(den === 0L, lit(0.0d))
      .otherwise((g("d") * g("sxy") - g("sx") * g("sy")).cast("double") /
        den.cast("double"))
    g.select(col("event_type"), col("d").as("n_days"), col("sy").as("n_events"),
        TextOps.roundAt(slope, 6).as("slope"),
        (slope > 0.0d).as("growing"))
      .orderBy(col("event_type"))
  }

  /** q229: event-type co-occurrence lift over user baskets — for each
    * unordered type pair, lift = N·n_ab/(n_a·n_b): > 1 means users
    * who do one disproportionately do the other (the association
    * signal behind "viewers convert", feature cross-sell, and the
    * q133 transition matrix's order-free complement — transitions see
    * a→b sequences, lift sees coincidence regardless of order).
    *
    * Exactness: all counts exact longs over DISTINCT (user, type)
    * baskets; lift is one fixed IEEE tree under roundAt.
    *
    * Scale: the basket reduction is one distinct + one user-keyed
    * aggregation; pairs come from exploding each user's own sorted
    * type set (bounded by the type-universe size, the q25
    * bucket-explode device — never a corpus self-join); the rollup
    * output is type²-sized with the two type-count dims broadcast. */
  def eventCooccurrence(spark: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .localCheckpoint(false)
    val tc = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val nu = ut.agg(countDistinct(col("user_id")).as("nu"))
    val pairs = ut.groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("ts"))
      .select(explode(col("ts")).as("type_a"), col("ts"))
      .select(col("type_a"),
        explode(filter(col("ts"), t => t > col("type_a"))).as("type_b"))
      .groupBy(col("type_a"), col("type_b")).agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(tc.select(col("event_type").as("type_a"), col("n").as("n_a"))), "type_a")
      .join(broadcast(tc.select(col("event_type").as("type_b"), col("n").as("n_b"))), "type_b")
      .crossJoin(broadcast(nu))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_ab"),
        TextOps.roundAt(
          (col("n_ab").cast("double") * col("nu")) /
            (col("n_a").cast("double") * col("n_b").cast("double")), 4).as("lift"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** q227: recency-weighted user engagement — score = Σ 2^(−age_days)
    * over each user's events, a half-life-of-one-day exponential
    * decay: today's event counts 1, yesterday's ½, a week ago 1/128.
    * The ranking signal activity pipelines feed to retention models —
    * raw event counts overweight churned power users; this decays
    * them, and the q186/q187 windows can't express a smooth decay.
    *
    * Exactness device: with base 2 and integer ages every weight is
    * an exact power of two, so the per-user sum runs as EXACT LONGS —
    * weight = 2^(horizon−age) as a long (pow(2, k) is exact in double
    * for k ≤ 62 and the cast is exact), Σ order-independent, score =
    * Σ/2^horizon one exact-scaling division. Events older than
    * `horizon` days weigh 0 (also the overflow bound: Σ ≤ n_events ·
    * 2^horizon must stay under 2^63 — horizon 40 leaves 2^22 ≈ 4M
    * events per user of headroom; raise horizon → lower headroom,
    * the documented trade).
    *
    * Scale: corpus max day is a 1-row broadcast dim; one user-keyed
    * aggregation with map-side partials; no window, no sort. */
  def recencyEngagement(spark: SparkSession, dir: String,
                        horizon: Int = 40): DataFrame = {
    require(horizon <= 62, "2^horizon must stay in long range")
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
    val mx = ev.agg(max(col("day")).as("mxd"))
    val weighted = ev.crossJoin(broadcast(mx))
      .withColumn("age", datediff(col("mxd"), col("day")).cast("long"))
      .withColumn("w",
        when(col("age") <= horizon,
          pow(lit(2.0d), (lit(horizon.toLong) - col("age")).cast("double")).cast("long"))
          .otherwise(lit(0L)))
    weighted.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(col("day")).as("last_day"),
        sum(col("w")).as("sw"))
      .select(col("user_id"), col("n_events"), col("last_day"),
        TextOps.roundAt(col("sw").cast("double") / math.pow(2.0, horizon), 6)
          .as("score"))
      .orderBy(col("user_id"))
  }

  /** q256: stationary distribution of the event-transition Markov
    * chain — the long-run attention share per event type, the
    * equilibrium the q133 matrix implies but never states: q133 says
    * where users go NEXT, q237 what removing a channel costs, this is
    * where the chain SPENDS ITS TIME as t → ∞ — the steady-state load
    * profile a capacity plan or content-mix decision actually wants
    * (raw event frequencies ≠ stationary mass when transition
    * structure is asymmetric).
    *
    * Mechanism: exact transition counts (q133's pair construction
    * verbatim), row-normalized to P implicitly (each update term is
    * π_s · c_st/rt_s), 50 synchronous power rounds from the uniform
    * start with ascending-(s) folds per target and the q251 1e-12
    * per-round re-quantization. Closed-chain contract: the corpus
    * must be OUTGOING-CLOSED — every transition target also appears
    * as a source; an absorbing target would leak mass out of the
    * restricted chain, so the engine require()-crashes and the
    * oracle's `chk` CTE error()s on exactly the same inputs
    * (crash-vs-answer divergence eliminated; with lag pairs over
    * long user streams every observed type has outgoing mass here,
    * asserted by the spec).
    *
    * Exactness: counts exact longs; each round is a mirrored double
    * tree replayed by the oracle's unrolled MATERIALIZED CTEs; the
    * emitted π values are the 1e-12-quantized round-`iters` vector,
    * identical on both engines by construction (the q251 contract).
    *
    * Scale: ONE user-keyed shuffle to the types²-sized count matrix
    * (bounded model state — the q237 collect rule); iteration is
    * driver-side types² per round, corpus-free. */
  def stationaryDistribution(spark: SparkSession, dir: String,
                             iters: Int = 50): DataFrame =
    stationaryOf(Tables.events(spark, dir), iters)

  /** [[stationaryDistribution]] over any (user_id, event_id,
    * event_type, ts) frame — split out so specs can drive chains with
    * closed-form stationary vectors. */
  private[graft] def stationaryOf(events: DataFrame, iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = events.sparkSession
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val tc = events
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .withColumn("t", lead(col("event_type"), 1).over(w))
      .filter(col("t").isNotNull)
      .groupBy(col("event_type").as("s"), col("t"))
      .agg(count(lit(1)).as("c"))
    // types²-bounded model state — the q237 collect rule
    val cells = tc.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2)))
    val states = cells.map(_._1).distinct.sorted // states WITH outgoing mass
    val idx = states.zipWithIndex.toMap
    val k = states.length
    val cnt = Array.ofDim[Long](k, k)
    val rt = Array.ofDim[Long](k)
    cells.foreach { case (s, t, c) =>
      // a target type with no outgoing transitions would leak mass out
      // of the restricted chain; no such type exists here (spec-pinned)
      require(idx.contains(t), s"absorbing target state $t — chain not closed")
      cnt(idx(s))(idx(t)) += c
      rt(idx(s)) += c
    }
    def quant(x: Double): Double = math.floor(x * 1e12 + 0.5) / 1e12
    var pi = Array.fill(k)(quant(1.0 / k))
    for (_ <- 1 to iters) {
      val nx = Array.tabulate(k) { j =>
        var acc = 0.0
        var s = 0
        while (s < k) {
          acc += pi(s) * (cnt(s)(j).toDouble / rt(s)); s += 1
        }
        acc
      }
      pi = nx.map(quant)
    }
    import spark.implicits._
    states.indices.map(i => (states(i), rt(i), pi(i)))
      .toDF("event_type", "n_out", "pi")
      .orderBy(col("event_type"))
  }

  /** q255: CUPED variance reduction (Deng et al. 2013 — the
    * pre-experiment covariate adjustment every large A/B platform
    * runs): split the corpus timeline at its midpoint, treat each
    * user's PRE-period value sum per event type as the covariate for
    * their POST-period metric, and report θ = cov(pre, post)/var(pre)
    * plus the achieved variance reduction ρ² — the factor by which an
    * experiment on this metric could shrink its confidence intervals
    * (equivalently: how much smaller a sample buys the same power).
    * The A/B-readiness audit for the q216 correlation matrix's
    * strongest covariate: q216 says pre and post correlate, this says
    * what that correlation is WORTH experimentally.
    *
    * Exactness: event values quantize to 1e-3 longs, so the five
    * sufficient statistics per type (n, Σx, Σy, Σx², Σxy, Σy²) are
    * EXACT LONGS over the full users × types grid (absent users count
    * 0 — the honest population); everything after is one mirrored
    * double expression tree per output cell under roundAt (long →
    * double casts are IEEE-identical on both engines even past 2⁵³).
    * Zero-variance metrics guard to θ = 0, ρ² = 0.
    *
    * Overflow headroom (the q247 convention): Σx² and Σxy scale as
    * n_users·X² where X = max |per-user fixed-point period sum| —
    * int64 runs out when n·X² nears 2⁶³ (e.g. X ≈ 3e9/√n; at 1e6
    * users that is per-user period sums past ~3e6 value units).
    * Spark's non-ANSI long sum would WRAP silently there while the
    * oracle's DuckDB BIGINT multiply raises, so the rollup carries
    * max|x|/max|y| and raise_errors when n·X² (checked in double,
    * conservative margin) could exceed int64 — engine and oracle now
    * fail the same inputs loudly. Past that, rescale the 1e-3 value
    * quantization.
    *
    * Scale: one corpus collapse to (user, type, period) cells, one
    * grid fill against the types-sized dim (broadcast), one types-
    * sized rollup with map-side partials. */
  def cupedVarianceReduction(spark: SparkSession, dir: String): DataFrame =
    cupedOf(Tables.events(spark, dir))

  /** [[cupedVarianceReduction]] over any (user_id, event_type, ts,
    * value) frame — split out so specs can plant exactly-correlated
    * pre/post metrics with known θ and ρ². */
  private[graft] def cupedOf(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("day"),
        floor(col("value") * lit(1000.0) + lit(0.5)).cast("long").as("v"))
    val bounds = ev.agg(min(col("day")).as("mnd"), max(col("day")).as("mxd"))
    val cells = ev.crossJoin(broadcast(bounds))
      .withColumn("pre",
        datediff(col("day"), col("mnd")) * 2 < datediff(col("mxd"), col("mnd")))
      .groupBy(col("user_id"), col("event_type"))
      .agg(sum(when(col("pre"), col("v")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("v")).otherwise(0L)).as("y"))
    // the honest population: every user × every type (absent = 0)
    val users = ev.select(col("user_id")).distinct()
    val types = ev.select(col("event_type")).distinct()
    val grid = users.crossJoin(broadcast(types))
      .join(cells, Seq("user_id", "event_type"), "left")
      .select(col("event_type"),
        coalesce(col("x"), lit(0L)).as("x"), coalesce(col("y"), lit(0L)).as("y"))
    val g = grid.groupBy(col("event_type")).agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"),
      greatest(max(abs(col("x"))), max(abs(col("y")))).as("mxy"))
    val nD = col("n").cast("double")
    // post-hoc overflow audit (see docstring): n and max|x|,|y| are
    // wrap-free themselves, so they certify the long sums after the
    // fact; 9.0e18 leaves margin under 2⁶³ for the double check
    val sumsSafe =
      nD * col("mxy").cast("double") * col("mxy").cast("double") < lit(9.0e18)
    val vx = nD * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double")
    val cv = nD * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")
    val theta = when(vx === 0.0d, lit(0.0d)).otherwise(cv / vx)
    val rho2 = when(vx === 0.0d || vy === 0.0d, lit(0.0d))
      .otherwise((cv * cv) / (vx * vy))
    // The audit must ride EVERY derived output: if it guarded only
    // n_users, a consumer selecting just theta/var_reduction would let
    // Catalyst column-prune the raise_error away and read silently
    // wrapped sums — defeating the fail-the-same-inputs-loudly
    // contract. sumsSafe is a per-group scalar; the duplicated check
    // folds into one codegen'd branch per column.
    val overflowErr = raise_error(concat(
      lit("cuped sufficient statistics would overflow int64 for event_type "),
      col("event_type"), lit(" — rescale the value quantization")))
    def guarded(c: org.apache.spark.sql.Column, tpe: String) =
      when(sumsSafe, c).otherwise(overflowErr.cast(tpe))
    g.select(col("event_type"),
        guarded(col("n"), "long").as("n_users"),
        guarded(TextOps.roundAt(col("sy").cast("double") / (nD * lit(1000.0)), 6),
          "double").as("mean_post"),
        guarded(TextOps.roundAt(theta, 6), "double").as("theta"),
        guarded(TextOps.roundAt(rho2, 6), "double").as("var_reduction"))
      .orderBy(col("event_type"))
  }

  /** q254: Kaplan-Meier time-to-conversion survival (Kaplan & Meier
    * 1958) — S(t) = Π_{u≤t} (1 − d_u/n_u) over each user's days from
    * FIRST EVENT to FIRST PURCHASE, with honest RIGHT-CENSORING: a
    * user who never purchases is censored at the corpus end, not
    * counted as "converted never" or silently dropped (either is the
    * classic time-to-event bias — dropping non-converters OVERSTATES
    * conversion speed exactly when conversion is rare). S(t) reads
    * "fraction still unconverted after t days" — the curve behind
    * q215's latency percentiles (which only see CONVERTED users) and
    * q240's binary rates (which ignore time entirely). Standard tie
    * convention: conversions precede censorings at equal t, both
    * count in their own t's risk set.
    *
    * Exactness: all counts exact longs (risk set = reverse running
    * sum over the T-bounded day table); each factor's ln((n−d)/n)
    * floor-scales to a 1e12 LONG so the cumulative product is an
    * exact-integer prefix sum, exponentiated once per row (single
    * mirrored exp under roundAt); a day where everyone at risk
    * converts zeroes the curve exactly via the cumulative flag, never
    * a ln(0).
    *
    * Scale: two user-keyed reductions + a 1-row broadcast max-day;
    * everything after runs on the lifetime-bounded day table (model
    * state — the q246 histogram-window argument). */
  def survivalCurve(spark: SparkSession, dir: String): DataFrame =
    survivalCurveOf(Tables.events(spark, dir))

  /** [[survivalCurve]] over any (user_id, event_type, ts) frame —
    * split out so specs can drive hand-computed KM curves with
    * censoring actually exercised. */
  private[graft] def survivalCurveOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events
      .select(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("day"))
    val f = ev.groupBy(col("user_id")).agg(min(col("day")).as("fd"))
    val p = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("day")).as("pd"))
    val mx = ev.agg(max(col("day")).as("mxd"))
    val u = f.join(p, Seq("user_id"), "left").crossJoin(broadcast(mx))
      .select(
        when(col("pd").isNotNull, datediff(col("pd"), col("fd")))
          .otherwise(datediff(col("mxd"), col("fd"))).cast("long").as("t"),
        col("pd").isNull.as("cens"))
    val byT = u.groupBy(col("t")).agg(
      sum(when(!col("cens"), 1L).otherwise(0L)).as("d"),
      sum(when(col("cens"), 1L).otherwise(0L)).as("c"))
    val wDesc = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAsc = Window.orderBy(col("t").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withRisk = byT.withColumn("n_risk", sum(col("d") + col("c")).over(wDesc))
    val term = when(col("d") === 0L, lit(0L))
      .otherwise(floor(log((col("n_risk") - col("d")).cast("double") /
        col("n_risk")) * lit(1e12) + lit(0.5)).cast("long"))
    withRisk
      .withColumn("dead", max(when(col("d") === col("n_risk"), 1L).otherwise(0L))
        .over(wAsc))
      .withColumn("lt", sum(when(col("d") === col("n_risk"), lit(0L))
        .otherwise(term)).over(wAsc))
      .select(col("t"), col("n_risk"), col("d").as("n_converted"),
        col("c").as("n_censored"),
        when(col("dead") === 1L, lit(0.0d))
          .otherwise(TextOps.roundAt(
            exp(col("lt").cast("double") / lit(1e12)), 6)).as("survival"))
      .orderBy(col("t"))
  }

  /** q250: weekday × hour seasonality profile per event type — the
    * folded-over-weeks heatmap behind every ops dashboard: q16 counts
    * the raw hourly TIMELINE, q174/q199/q221 hunt anomalies against
    * rolling baselines; this is the BASELINE ITSELF, the (dow, hour)
    * profile an anomaly detector should normalize by before calling
    * anything a spike (a Monday-9am peak is seasonality, not anomaly).
    * Each observed cell carries its exact count, share of the type's
    * volume, and lift vs the uniform 1/168 cell expectation.
    *
    * Exactness: counts exact longs; share and lift are single
    * mirrored IEEE trees under roundAt. Weekday parity: Spark's
    * dayofweek is 1-based Sunday, DuckDB's 0-based Sunday — the
    * engine subtracts 1 so both emit Sunday = 0.
    *
    * Scale: one corpus collapse to (type, dow, hour) cells — 168 ×
    * types rows, model state — with the per-type totals broadcast
    * back. */
  def seasonalityProfile(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .select(col("event_type"),
        (dayofweek(col("ts")) - 1).cast("bigint").as("dow"),
        hour(col("ts")).cast("bigint").as("hod"))
      .groupBy(col("event_type"), col("dow"), col("hod"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.groupBy(col("event_type")).agg(sum(col("n")).as("nt"))
    cells.join(broadcast(tot), Seq("event_type"))
      .select(col("event_type"), col("dow"), col("hod"), col("n"),
        TextOps.roundAt(col("n").cast("double") / col("nt"), 6).as("share"),
        TextOps.roundAt(col("n").cast("double") * lit(168.0) / col("nt"), 4).as("lift"))
      .orderBy(col("event_type"), col("dow"), col("hod"))
  }

  /** q246: engagement-frequency histogram (the "power-user curve" /
    * L-ness readout): how many users were active on exactly k distinct
    * days — the shape chart product teams read before any mean DAU
    * number, and the distribution q187's DAU/WAU ratio only summarizes
    * (a 0.5 stickiness can be "everyone every other day" or "half
    * daily, half once"; this says which). Emits user share per
    * activity level plus the CCDF (share of users at ≥ k days — the
    * retention-floor readout).
    *
    * Exactness: all counts exact longs; shares are guarded divisions
    * under roundAt; CCDF from an exact reverse running sum over the
    * day-level histogram (bounded by the observation window's day
    * count — model state, not corpus).
    *
    * Scale: one distinct over (user, day) — a single exact-count
    * shuffle with map-side partials — then a user-keyed count and a
    * day-bounded rollup; the window runs on the histogram, never the
    * corpus. */
  def activeDaysHistogram(spark: SparkSession, dir: String): DataFrame =
    activeDaysHistogramOf(
      Tables.events(spark, dir)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct())

  /** The q246 rollup served from any distinct (user_id, day) activity
    * table — shared by the batch query and the streaming state twin so
    * the two cannot diverge. */
  def activeDaysHistogramOf(ud: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perUser = ud.groupBy(col("user_id")).agg(count(lit(1)).as("active_days"))
    val hist = perUser.groupBy(col("active_days")).agg(count(lit(1)).as("n_users"))
    val tot = hist.agg(sum(col("n_users")).as("nu"))
    // histogram is day-count-sized: the unpartitioned window is model
    // state by construction (same bound as q226's seat window)
    val wc = Window.orderBy(col("active_days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.crossJoin(broadcast(tot))
      .withColumn("n_at_least", sum(col("n_users")).over(wc))
      .select(col("active_days"), col("n_users"),
        TextOps.roundAt(col("n_users").cast("double") / col("nu"), 6).as("share"),
        col("n_at_least"),
        TextOps.roundAt(col("n_at_least").cast("double") / col("nu"), 6).as("ccdf"))
      .orderBy(col("active_days"))
  }

  /** q222: user-acquisition curve — daily NEW users (first-ever event
    * lands that day) plus the cumulative registered-user count. The
    * growth readout every event pipeline reports first, and the exact
    * computation is a textbook distinct-to-first-seen reduction:
    * "users new on day D" is NOT countDistinct(day, user) minus
    * anything — it is min(ts) per user, then a day rollup, so each
    * user is counted exactly once, ever. Cumulative total rides
    * [[globalRunningSum]]'s two-phase prefix sum — day-level rollups
    * are time-bounded but a 100 TB deployment still never funnels the
    * curve through one task.
    *
    * Exactness: all longs; day = date_trunc, the q118 convention. */
  def userAcquisition(spark: SparkSession, dir: String): DataFrame = {
    val firstSeen = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
      .select(date_trunc("day", col("first_ts")).as("day"))
    val daily = firstSeen.groupBy(col("day")).agg(count(lit(1)).as("n_new"))
    globalRunningSum(daily, Seq(col("day")), col("n_new"), "cum_users")
      .select(col("day"), col("n_new"), col("cum_users"))
      .orderBy(col("day"))
  }

  /** q223: CUSUM changepoint candidate per event type — where the
    * hourly volume's level shifted, the question the q221 EWMA tracks
    * but cannot localize. Classic CUSUM statistic S_j = Σ_{i≤j}(x_i −
    * μ): a level change makes |S| peak AT the change (before it, all
    * deviations share the pre-change sign; after, they reverse), so
    * the report is each type's argmax_j |S_j| hour with its magnitude
    * and position.
    *
    * Exactness device: S_j is NOT an ordered double fold — S_j =
    * C_j − j·(Σx)/n with C_j the EXACT integer cumulative count and j
    * the exact rank, so every S_j is ONE fixed IEEE tree over exact
    * longs (cast(C) − cast(j)·cast(Σx)/cast(n), identical on both
    * engines), and the argmax is deterministic via (|S| desc, hour
    * asc) ordering. Singleton series yield S_1 = 0 — no guard needed.
    *
    * Scale: one corpus collapse into (type, hour) buckets; both
    * windows and the argmax run over the time-bounded bucket table
    * partitioned by type. */
  def cusumChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val grp = Window.partitionBy(col("event_type"))
    val wOrd = grp.orderBy(col("hour"))
    val c = hourly
      .withColumn("cum", sum(col("n_events")).over(wOrd))
      .withColumn("j", row_number().over(wOrd).cast("long"))
      .withColumn("nb", count(lit(1)).over(grp))
      .withColumn("sx", sum(col("n_events")).over(grp))
    val s = c.withColumn("cusum",
      col("cum").cast("double") -
        col("j").cast("double") * col("sx").cast("double") / col("nb").cast("double"))
    val pick = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("cusum")).desc, col("hour"))
    s.withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("hour").as("cp_hour"),
        col("nb").as("n_hours"), col("j").as("cp_rank"),
        round(abs(col("cusum")), 6).as("max_abs_cusum"),
        (col("cusum") > 0.0d).as("level_dropped"))
      .orderBy(col("event_type"))
  }

  /** q221: EWMA-smoothed hourly event rates per type — the online
    * complement of [[eventRateAnomaly]] (global mean/sd) and
    * [[robustRateAnomaly]] (median/MAD): both judge each hour against
    * the WHOLE series, so a regime change (a feature launch doubling
    * steady-state volume) permanently poisons their baselines, while
    * the exponentially-weighted mean tracks it and flags only the
    * transition hours. α = 1/2 (the recurrence e ← (x + e)/2, seeded
    * with the first hour), spike = count ≥ `spikeFactor`× the
    * PREVIOUS hour's EWMA — judged against the pre-spike baseline so
    * the spike cannot mask itself.
    *
    * Determinism: EWMA is an ORDER-DEPENDENT fold, so both engines
    * fold the identical hour-sorted list left-to-right — Spark
    * `aggregate` over the prefix slice ↔ DuckDB `list_reduce` over
    * `list_slice`, seeded identically (a 1-element reduce is the
    * element; an empty-slice aggregate is the init) — one fixed IEEE
    * tree per value. α = 1/2 makes every fold step an exact-scaling
    * division. The flag compares RAW doubles (prev > 0 guards the
    * seed hour); only the emitted ewma is rounded.
    *
    * Scale: the corpus collapses ONCE into (type, hour) counts; the
    * per-type series is TIME-bounded model state (hours per type),
    * not corpus-bounded — the q185/q199 bucket-table shape — so the
    * recurrence folds once, linearly, driver-side over that bounded
    * state (see the body comment; the in-plan form re-folded every
    * prefix with an interpreted HOF — O(H²) interpreted steps). */
  def ewmaRateSmoothing(spark: SparkSession, dir: String,
                        spikeFactor: Double = 2.0): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    // The recurrence runs DRIVER-SIDE over the collected hourly table
    // (r21): the previous in-plan form re-folded each element's PREFIX
    // with an interpreted `aggregate` HOF — O(H²) interpreted steps
    // per type, ×2 for the prev column (~4.6M evaluations at sf0.1 =
    // 3.0 s of the query's 3.0 s; scale slope 0.97 — all fold, no
    // data). The hourly table is TIME-bounded model state (hours per
    // type — 8,760/type-year; the q185/q199 bucket-table class, never
    // corpus-sized), so collecting it is the house bounded-state
    // collect, and the linear left fold below executes the IDENTICAL
    // IEEE op sequence ((x + e) / 2 per step, seeded with hour 1) the
    // interpreted fold did — outputs are bit-identical and the oracle
    // (list_reduce over list_slice) is unchanged. The corpus still
    // collapses distributively to (type, hour) counts first.
    // hour's runtime class tracks the events file's physical ts
    // encoding (Timestamp vs LocalDateTime — the Tables.events
    // schema-drift contract), so the fold is type-agnostic and the
    // local relation re-declares the exact incoming type: the output
    // schema is bit-for-bit the old plan's.
    val hourType = hourly.schema("hour").dataType
    val local = hourly.collect().map(r => (r.getString(0), r.get(1), r.getLong(2)))
    val hourOrd: Ordering[Any] =
      Ordering.fromLessThan((a, b) => a.asInstanceOf[Comparable[Any]].compareTo(b) < 0)
    val out = local.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      val sorted = rows.sortBy(_._2)(hourOrd)
      var e = 0.0d
      sorted.zipWithIndex.map { case ((_, hour, n), i) =>
        val prev = if (i == 0) 0.0d else e
        e = if (i == 0) n.toDouble else (n.toDouble + e) / 2.0d
        org.apache.spark.sql.Row(tpe, hour, n, e,
          prev > 0.0d && n.toDouble >= prev * spikeFactor)
      }
    }
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("event_type", StringType), StructField("hour", hourType),
      StructField("n_events", LongType), StructField("ewma_raw", DoubleType),
      StructField("is_spike", BooleanType)))
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(out.asJava, schema)
      .select(col("event_type"), col("hour"), col("n_events"),
        round(col("ewma_raw"), 6).as("ewma"), col("is_spike"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** q246's streaming state: the distinct (user_id, day) activity
    * table. Fully mergeable — set union is associative, commutative
    * AND idempotent — so the contract is the widest in the state
    * family: batches may arrive in any order and may re-deliver
    * events (at-least-once), and the histogram re-derives from the
    * state each time. State is (users × observation days)-sized —
    * the dedup-index class, never corpus-sized. */
  def activeDaysStateMerge(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(
        batch.select(col("user_id"), date_trunc("day", col("ts")).as("day")))
      .distinct()

  /** The q246 histogram served from the merged state. */
  def activeDaysHistogramFromState(state: DataFrame): DataFrame =
    activeDaysHistogramOf(state)

  /** Empty activity state with the right schema. */
  def activeDaysStateEmpty(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, java.sql.Timestamp)].toDF("user_id", "day")
  }

  /** q222's streaming state: the (user_id, first_day) MIN-MERGE table.
    * Fully mergeable (min is associative + commutative + idempotent),
    * so unlike [[ewmaStateAppend]] the contract is unordered: batches
    * may arrive in ANY order and may even re-deliver events — a
    * user's first-seen day only ever ratchets DOWN, and the
    * acquisition curve is re-derived from the state, so a late early
    * event correctly MOVES the user's cohort (the mutation a
    * curve-increment state could never express). State is
    * users-sized — the dedup-index state class, not corpus-sized. */
  def acquisitionStateMerge(state: DataFrame, batch: DataFrame): DataFrame =
    state.unionByName(
        batch.groupBy(col("user_id"))
          .agg(min(date_trunc("day", col("ts"))).as("first_day")))
      .groupBy(col("user_id")).agg(min(col("first_day")).as("first_day"))

  /** The q222 curve served from the merged state. */
  def acquisitionCurveFromState(state: DataFrame): DataFrame = {
    val daily = state.groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("n_new"))
    globalRunningSum(daily, Seq(col("day")), col("n_new"), "cum_users")
      .select(col("day"), col("n_new"), col("cum_users"))
      .orderBy(col("day"))
  }

  /** Empty acquisition state with the right schema. */
  def acquisitionStateEmpty(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, java.sql.Timestamp)].toDF("user_id", "first_day")
  }

  /** q221's streaming state: (event_type, n_hours, ewma), appendable
    * per micro-batch of FINALIZED hourly buckets. Unlike the
    * count/sum/index states of the q121/q167/q180 family this fold is
    * ORDER-DEPENDENT, so the streaming contract is narrower and
    * explicit: batches must arrive in hour order and carry whole
    * hours (what a watermarked hourly aggregation emits on close) —
    * under that contract appending batch-by-batch is bit-identical to
    * the one-shot q221 fold, which StreamingMultimodalSpec proves
    * across different chop points. Types absent from a batch pass
    * through unchanged; a type's first batch seeds the EWMA with its
    * first hour (the q221 convention). */
  def ewmaStateAppend(state: DataFrame, batch: DataFrame): DataFrame = {
    val arr = batch.groupBy(col("event_type"))
      .agg(array_sort(collect_list(struct(col("hour"), col("n_events")))).as("ts"),
        count(lit(1)).as("nb"))
    val vals = transform(col("ts"), t => t.getField("n_events").cast("double"))
    arr.join(state, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        (coalesce(col("n_hours"), lit(0L)) + coalesce(col("nb"), lit(0L))).as("n_hours"),
        when(col("ts").isNull, col("ewma"))
          .when(col("ewma").isNull,
            aggregate(slice(vals, lit(2), size(col("ts")) - 1),
              element_at(vals, 1), (a, x) => (a + x) / lit(2.0d)))
          .otherwise(
            aggregate(vals, col("ewma"), (a, x) => (a + x) / lit(2.0d)))
          .as("ewma"))
  }

  /** Empty EWMA state with the right schema, for bootstrap. */
  def ewmaStateEmpty(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq.empty[(String, Long, Double)].toDF("event_type", "n_hours", "ewma")
  }

  def eventRateAnomaly(spark: SparkSession, dir: String,
                       zThresh: Double = 2.0): DataFrame = {
    val hourly = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_events"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nb"),
        sum(col("n_events")).as("s1"),
        sum(col("n_events") * col("n_events")).as("s2"))
      .select(col("event_type"),
        (col("s1").cast("double") / col("nb")).as("mu"),
        when(col("nb") <= 1L, lit(0.0d))
          .otherwise(sqrt((col("s2").cast("double") -
            col("s1").cast("double") * col("s1").cast("double") / col("nb")) /
            (col("nb") - 1L))).as("sd"))
    val z = when(col("sd") === 0.0d, lit(0.0d))
      .otherwise((col("n_events").cast("double") - col("mu")) / col("sd"))
    hourly.join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"), col("hour"), col("n_events"),
        round(z, 6).as("z"), (abs(z) >= zThresh).as("is_anomaly"))
      .orderBy(col("event_type"), col("hour"))
  }
}
