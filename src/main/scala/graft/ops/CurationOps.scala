package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextNorm

/** Corpus-curation operators for LLM training-data pipelines
  * (SURVEY.md §2c): benchmark decontamination, cross-document
  * duplicate-span detection, deterministic training-order assignment,
  * and incremental-batch dedup against an existing corpus index.
  *
  * These are the steps that sit AROUND the dedup/similarity family in
  * a production pipeline: after near-dup removal you still have to
  * (a) strip documents that leak evaluation data, (b) find verbatim
  * boilerplate spans shared across documents, (c) assign a reproducible
  * global training order without a global sort, and (d) admit each new
  * ingest batch against the standing corpus without re-deduplicating
  * 100 TB from scratch.
  *
  * Scale design: every operator is one or two hash-shuffles on a
  * bounded key (n-gram string, fingerprint, shard id) with map-side
  * partial aggregation; the only broadcast is the benchmark n-gram set
  * in decontamination — benchmark suites are MBs against a 100 TB
  * corpus, the canonical broadcast-dim shape. Nothing is O(n²) and
  * nothing collects to the driver.
  */
object CurationOps {

  /** Word k-gram rows: one row per (doc, full k-gram position), with
    * the 0-based word position of the gram's first word (`pos`) — the
    * span-merge operators need it; pure-set consumers ignore it. Same
    * window-lead build as DedupOps.shingleRows (the array-HOF form is
    * interpreted and was measured 25× slower there) generalized to k,
    * but emitting FULL k-grams only: documents shorter than k words
    * contribute nothing (a partial gram can never witness a k-token
    * overlap). The repartition spreads the ~(words-per-doc)× explode
    * across the cluster and pre-satisfies the window's distribution,
    * so no further exchange follows (cf. shingleRows). */
  private[ops] def kgramRows(spark: SparkSession, dir: String, k: Int): DataFrame =
    kgramRowsOf(Tables.documents(spark, dir), k)

  /** [[kgramRows]] over an arbitrary (doc_id, text) frame — the
    * span machinery is reusable over DERIVED corpora (e.g. the
    * round-trip gate runs it over [[trimSpans]]' own output). */
  private[ops] def kgramRowsOf(docs: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 2, s"k-gram size must be >= 2, got $k")
    val words = TextNorm.words(col("text"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val leads = (1 until k).map(i => lead(col("col"), i).over(w).as(s"w$i"))
    docs
      .repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(words))
      .select(col("doc_id") +: col("pos") +: col("col").as("w0") +: leads: _*)
      .filter(col(s"w${k - 1}").isNotNull) // full k-grams only
      .select(col("doc_id"), col("pos"),
        concat_ws(" ", (0 until k).map(i => col(s"w$i")): _*).as("gram"))
  }

  /** Benchmark decontamination: for every training document, how many
    * of its word k-grams appear verbatim in the held-out evaluation
    * set (here: the deterministic doc_id % evalMod == evalRem slice of
    * `documents`, standing in for MMLU/GSM8K/etc). The GPT-3 paper's
    * 13-gram rule and The Pile's variants are this exact shape; k=8
    * keeps the test corpora's ~50-word documents in range.
    *
    * Emits one row per training doc — including clean and too-short
    * ones — with gram counts, hit counts, contamination fraction and
    * the drop flag, so the output IS the admission decision.
    *
    * Scale: the eval n-gram set is distinct'd then BROADCAST — a
    * benchmark suite is a few MB of n-grams against a 100 TB corpus,
    * so the training side never shuffles for the probe (one narrow
    * hash-lookup map per gram row); the only exchanges are the gram
    * build's doc_id repartition (reused by the window and the per-doc
    * aggregation — zero extra exchanges) and the final left join back
    * to the doc roster, both on doc_id. */
  def decontamination(spark: SparkSession, dir: String, k: Int = 8,
                      evalMod: Int = 10, evalRem: Int = 7): DataFrame = {
    val grams = kgramRows(spark, dir, k)
    val isEval = pmod(col("doc_id"), lit(evalMod)) === evalRem
    val evalGrams = grams.filter(isEval)
      .select(col("gram")).distinct()
      .withColumn("contaminated_gram", lit(true))
    val perDoc = grams.filter(!isEval)
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(col("contaminated_gram")).as("n_hits"))
    Tables.documents(spark, dir)
      .filter(!isEval)
      .select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        TextOps.roundAt(coalesce(col("n_hits"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_grams"), lit(0L)), lit(1L)), 6).as("contamination"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** q236: decontamination n-gram-size ablation — the corpus-level
    * contamination summary at k ∈ {5, 8, 13}: flagged docs, gram
    * totals, hit totals, hit rate. The precision/recall trade behind
    * every published decontamination rule (GPT-3's 13-gram vs The
    * Pile's shorter variants): small k over-flags on common phrases,
    * large k misses paraphrased leaks — the curve says where THIS
    * corpus's flag rate cliffs, the number a team reads before
    * committing a k. Three [[decontamination]] passes (each one
    * gram build + broadcast-probe + rollup); the eval slice is the
    * same deterministic doc_id residue in all legs, so rows are
    * comparable across k.
    *
    * Exactness: all counts exact longs; rates one guarded division
    * under roundAt. */
  def decontamAblation(spark: SparkSession, dir: String,
                       ks: Seq[Int] = Seq(5, 8, 13)): DataFrame =
    ks.map { k =>
      decontamination(spark, dir, k)
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("contaminated"), 1L).otherwise(0L)).as("n_flagged"),
          sum(col("n_grams")).as("total_grams"),
          sum(col("n_hits")).as("total_hits"))
        .select(lit(k.toLong).as("gram_n"), col("n_docs"), col("n_flagged"),
          col("total_grams"), col("total_hits"),
          TextOps.roundAt(col("total_hits").cast("double") /
            greatest(col("total_grams"), lit(1L)).cast("double"), 6).as("hit_rate"))
    }.reduce(_ unionByName _).orderBy(col("gram_n"))

  /** q194: contamination rollup by source — the per-doc q88 verdicts
    * aggregated to (source): docs, contaminated docs, contamination
    * rate, and the gram-level hit fraction. The triage view a team
    * reads FIRST (which feed is leaking the eval suite decides
    * whether to fix a scraper or drop a source); the per-doc table is
    * the drill-down. Composition: [[decontamination]]'s output joined
    * to the column-pruned (doc_id, source) projection, one tiny
    * rollup; exact longs, rates rounded at 6. */
  def decontaminationBySource(spark: SparkSession, dir: String,
                              k: Int = 8): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    decontamination(spark, dir, k)
      .join(src, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("contaminated"), 1L).otherwise(0L)).as("n_contaminated"),
        sum(col("n_grams")).as("n_grams"),
        sum(col("n_hits")).as("n_hits"))
      .select(col("source"), col("n_docs"), col("n_contaminated"),
        TextOps.roundAt(col("n_contaminated").cast("double") / col("n_docs"), 6)
          .as("doc_rate"),
        TextOps.roundAt(col("n_hits").cast("double") /
          greatest(col("n_grams"), lit(1L)), 6).as("gram_rate"))
      .orderBy(col("source"))
  }

  /** [[decontamination]] against SEVERAL eval suites in ONE corpus
    * pass: the suite-tagged union of eval gram sets broadcasts as one
    * dimension, each corpus gram position left-joins it once, and the
    * per-doc aggregation pivots per-suite hit counts with conditional
    * sums — adding an eval suite adds dimension rows and a column,
    * never a second corpus scan (the naive per-suite loop at 100 TB
    * re-reads the corpus per benchmark). `n_grams` counts DISTINCT
    * positions because a gram shared by both suites joins twice —
    * counting rows would silently inflate the denominator. */
  def multiDecontamination(spark: SparkSession, dir: String,
                           k: Int = 8): DataFrame = {
    val grams = kgramRows(spark, dir, k)
    val m = pmod(col("doc_id"), lit(10))
    val evalGrams = grams.filter(m === 7).select(col("gram"), lit("a").as("suite"))
      .unionByName(grams.filter(m === 3).select(col("gram"), lit("b").as("suite")))
      .distinct()
    val perDoc = grams.filter(m =!= 7 && m =!= 3)
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("pos")).as("n_grams"),
        count(when(col("suite") === "a", 1)).as("hits_a"),
        count(when(col("suite") === "b", 1)).as("hits_b"))
    Tables.documents(spark, dir)
      .filter(m =!= 7 && m =!= 3)
      .select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("hits_a"), lit(0L)).as("hits_a"),
        coalesce(col("hits_b"), lit(0L)).as("hits_b"),
        (coalesce(col("hits_a"), lit(0L)) + coalesce(col("hits_b"), lit(0L)) > 0)
          .as("contaminated"))
  }

  /** Cross-document duplicate spans: word k-grams appearing verbatim
    * in ≥ minDocs distinct documents — the scalable relational stand-in
    * for suffix-array exact-substring dedup (Lee et al. 2022): a
    * length-L shared substring is witnessed by L−k+1 shared k-grams,
    * so span hits localize the verbatim overlap without any
    * suffix-array construction.
    *
    * Scale: exactly ONE shuffle on the gram string (PlanSpec asserts
    * two exchanges total: the gram build's doc_id repartition and one
    * hashpartitioning on gram).
    * A direct countDistinct would plan as the Expand-based two-phase
    * distinct with an extra (gram, doc_id) exchange; instead the
    * per-(doc, gram) pre-aggregation rides the gram build's existing
    * doc_id partitioning (subset clustering — zero exchange), so the
    * gram shuffle moves one pre-combined row per (doc, gram) and
    * count(*) over it IS the distinct doc count. A degenerate
    * boilerplate gram (every doc shares it) makes ONE hot key — cap or
    * salt it like any skewed aggregation; the output stays span-sized,
    * never pair-sized (contrast: emitting the doc PAIRS sharing a span
    * would be quadratic in span frequency). */
  def duplicateSpans(spark: SparkSession, dir: String, k: Int = 8,
                     minDocs: Long = 2): DataFrame =
    kgramRows(spark, dir, k)
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("occ"))
      .groupBy(col("gram").as("span"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("occ")).as("n_occ"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= minDocs)

  /** Maximal duplicate spans: the islands-and-gaps merge of
    * [[duplicateSpans]]' gram-level hits back into per-document
    * maximal verbatim regions — the output a curation pipeline
    * actually ACTS on (trim the span, drop the doc), where gram-level
    * hits only witness it. Lee et al. 2022's exact-substring semantics
    * without the suffix array: a length-L substring shared by ≥
    * minDocs docs is witnessed by L−k+1 CONSECUTIVE shared k-grams,
    * so chaining adjacent shared gram positions recovers the maximal
    * span: for each doc, `pos − row_number()` over the shared-gram
    * positions is constant exactly on a consecutive run (the classic
    * islands trick), and per-island min/max rebuild (start, length).
    *
    * Emits (doc_id, span_start, span_len, n_grams): span_start is the
    * 0-based word offset, span_len the span's WORD length
    * (max_pos − min_pos + k), n_grams the witnessing gram count —
    * always span_len − k + 1 by construction, kept as a redundant
    * invariant the oracle hash locks.
    *
    * Scale: the gram-level plan is [[duplicateSpans]]' (one doc_id
    * exchange in the gram build, one gram exchange for the shared-set
    * aggregation); the merge adds one semi-join of the gram rows
    * against the shared-gram set, whose strategy is left to
    * Catalyst/AQE: size estimates scale with the input, so at test
    * scale it plans as a broadcast semi-join and at 100 TB (where a
    * boilerplate-heavy corpus makes the shared-gram set corpus-scaled)
    * the estimate forces a shuffle join on gram — the right choice at
    * each scale without a hint pinning either. Under the broadcast
    * form the probe side KEEPS the gram build's (doc_id) partitioning
    * and (doc_id, pos) sort order, so the island window and the
    * per-(doc, island) groupBy both ride it with zero further
    * exchange and zero Sort (PlanSpec-asserted: exactly one
    * hashpartitioning(gram) exchange in the whole plan, and no Sort
    * or doc_id exchange outside the two kgram builds). Everything
    * between exchanges is codegen'd; output is span-sized, never
    * pair-sized. */
  def maximalSpans(spark: SparkSession, dir: String, k: Int = 8,
                   minDocs: Long = 2): DataFrame =
    maximalSpansOf(kgramRows(spark, dir, k), k, minDocs)

  /** [[maximalSpans]] over pre-built gram rows (see [[kgramRowsOf]]). */
  private[ops] def maximalSpansOf(grams: DataFrame, k: Int,
                                  minDocs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Gram identity rides xxhash64 through every exchange (r21): the
    // span output carries positions only — no gram text — so the
    // 8-word gram STRINGS (~60-80 bytes each) existed solely to be
    // compared for equality; hashing them at the source cuts the one
    // gram-keyed exchange and the shared-set semi join to 8-byte
    // longs (guide §2.3 narrow-the-shuffle-key; at corpus scale the
    // gram exchange is the operator's dominant bytes). A hash
    // collision could mark an unshared gram shared — the same
    // ~2^-64-per-pair class the whole verify family accepts (q25's
    // argument); q89 (duplicateSpans), whose OUTPUT is the gram
    // text, keeps full strings.
    val g = grams.select(col("doc_id"), col("pos"),
      xxhash64(col("gram")).as("gram_h"))
    val sharedGrams = g
      .groupBy(col("doc_id"), col("gram_h")).agg(count(lit(1)).as("occ"))
      .groupBy(col("gram_h")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("gram_h"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    g
      .join(sharedGrams, Seq("gram_h"), "left_semi")
      .withColumn("island", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).cast("bigint").as("span_start"),
        (max(col("pos")) - min(col("pos")) + k).cast("bigint").as("span_len"),
        count(lit(1)).as("n_grams"))
      .select(col("doc_id"), col("span_start"), col("span_len"), col("n_grams"))
  }

  /** The exact-substring dedup ACTION: rebuild every document with its
    * [[maximalSpans]] regions removed. Lee et al. 2022's released
    * exact-substring implementation removes EVERY occurrence of a
    * duplicated span (not keep-one — the span text survives only where
    * it is not part of a cross-document duplicate), and that is the
    * semantic here: covered word positions are anti-joined away and
    * the remaining words reassemble in position order.
    *
    * Emits one row per document — including untouched and fully-
    * covered ones — with (clean_text, n_kept, n_removed), so the
    * output IS the post-dedup corpus plus its audit trail.
    *
    * Scale: everything after the span build keys on doc_id — the word
    * rows, the exploded cover positions (span-sized, never pair-
    * sized), the anti join, and both per-doc aggregations — and none
    * of it may force its own doc_id exchange (PlanSpec-asserted: no
    * ENSURE_REQUIREMENTS exchange on doc_id exists): each step either
    * rides the explicit build repartitions or, at small scale where
    * AQE prefers it, broadcasts the span-sized side. The final
    * reassembly uses an array_sort
    * + transform over ONE per-doc array (interpreted, not codegen'd —
    * fine here because it runs once per output row on output-sized
    * data; the per-candidate hot paths stay codegen'd). */
  def trimSpans(spark: SparkSession, dir: String, k: Int = 8,
                minDocs: Long = 2): DataFrame = {
    val words = Tables.documents(spark, dir)
      .repartition(col("doc_id")) // spread the explode (cf. kgramRows)
      .select(col("doc_id"), posexplode(
        TextNorm.words(col("text"))))
      .select(col("doc_id"), col("pos").cast("bigint").as("pos"),
        col("col").as("word"))
    val covered = maximalSpans(spark, dir, k, minDocs)
      .select(col("doc_id"), explode(
        sequence(col("span_start"), col("span_start") + col("span_len") - 1)).as("pos"))
    val cleaned = words.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("word")))),
          x => x.getField("word")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
    words.groupBy(col("doc_id")).agg(count(lit(1)).as("n_words"))
      .join(cleaned, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_words") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** The end-to-end "dedup actually deduplicated" gate: run the
    * [[maximalSpans]] detector over [[trimSpans]]' OWN output and
    * report the residual cross-document span count next to the trim
    * totals — one summary row
    * (n_docs, n_kept_total, n_removed_total, residual_spans).
    *
    * residual_spans = 0 is a THEOREM for original-consecutive grams
    * (every position of every shared gram is covered, so a surviving
    * consecutive k-gram was unshared, and trimming never increases a
    * gram's distinct-doc count) but NOT for junction grams — the new
    * k-grams formed where a removed span's flanks meet could
    * coincidentally collide across documents. The oracle hash pins
    * the observed value (0 on this corpus at both tested scale
    * factors), so a regression in cover construction (off-by-one span
    * ranges, keep-one-occurrence semantics creeping in) surfaces as a
    * nonzero count and a hash mismatch — the property an oracle on
    * the trim output alone cannot express.
    *
    * Scale: two passes of the span machinery (detector + trim +
    * re-detector) — each individually bounded by the [[trimSpans]]
    * scale argument; the summary aggregations are single-row. */
  def trimRoundTrip(spark: SparkSession, dir: String, k: Int = 8,
                    minDocs: Long = 2): DataFrame = {
    // the trimmed corpus feeds BOTH the summary aggregation and the
    // re-detector; a localCheckpoint between trim and re-detect was
    // A/B'd (3.60 s vs 3.62 s at sf0.1) and rejected — Spark's
    // exchange reuse already deduplicates the shared trim chain, so
    // the materialization buys nothing here. At 100 TB you persist
    // the trimmed corpus first anyway (it IS the product) and run the
    // re-detector over the persisted copy.
    val trimmed = trimSpans(spark, dir, k, minDocs)
    val residual = maximalSpansOf(
      kgramRowsOf(trimmed.select(col("doc_id"), col("clean_text").as("text")), k),
      k, minDocs)
    trimmed.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_kept")).as("n_kept_total"),
        sum(col("n_removed")).as("n_removed_total"))
      .crossJoin(residual.agg(count(lit(1)).as("residual_spans")))
  }

  /** Deterministic training-order assignment: shard + in-shard
    * position from md5(doc_id), reproducible run-to-run and
    * engine-to-engine — the "global shuffle" a training job needs,
    * WITHOUT a global sort: hashing assigns the shard, and ordering is
    * only ever within a shard.
    *
    * Scale: one hash-shuffle on shard_id, then per-shard local sorts —
    * with nShards sized to the cluster (thousands at 100 TB), each
    * shard's window sorts an executor-sized slice; no stage ever sees
    * a total order. The md5 sort key decorrelates the training order
    * from ingest order (the whole point), and the doc_id tiebreak
    * makes it a total function.
    *
    * nShards <= 0 (the default) sizes the shard count to the session's
    * defaultParallelism — one window partition per core/executor slot,
    * so the per-shard sorts saturate the cluster instead of a fixed
    * 16. Callers that need a REPRODUCIBLE assignment across cluster
    * sizes (the oracle-gated q90, any persisted training order) must
    * pass nShards explicitly: the shard of a doc is a function of
    * nShards, so a parallelism-derived default is deliberately not
    * part of the persisted contract. */
  def trainingOrder(spark: SparkSession, dir: String, nShards: Int = -1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val n = if (nShards > 0) nShards else spark.sparkContext.defaultParallelism
    val h = md5(concat(lit("ord_"), col("doc_id").cast("string")))
    val shard = pmod(conv(substring(h, 1, 4), 16, 10).cast("long"), lit(n.toLong))
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), h.as("h"), shard.as("shard"))
      .withColumn("pos", row_number().over(w).cast("bigint"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Temperature-scaled source mixture sampling: draw a ~targetDocs
    * sample whose SOURCE distribution follows n_s^alpha (alpha < 1
    * up-weights small sources — the standard multilingual/multi-domain
    * rebalancing rule, cf. the alpha=0.3 sampling in multilingual LM
    * training), with hash-deterministic membership: doc d of source s
    * is kept iff md5_16(d) < floor(65536 · min(1, T·n_s^alpha / (Σ_t
    * n_t^alpha) / n_s)). Every keep decision is reproducible (and
    * oracle-checkable) — no RNG, no seed drift across retries.
    *
    * Cross-engine determinism of the doubles: sqrt/mul/div/floor are
    * single IEEE ops, and the one order-sensitive reduction — the
    * weight denominator — is folded in explicit source-sorted order on
    * both engines (array_sort + aggregate here, list(… ORDER BY) +
    * list_sum in the oracle), the same device q87 uses for centroids.
    *
    * Scale: per-source counts are one shuffle with map-side combine;
    * the counts table is sources-sized (tiny) so the threshold join
    * broadcasts; membership is then a narrow filter on the corpus —
    * no corpus shuffle at any point. alpha is fixed at 0.5 so the
    * power is a single exact sqrt on both engines. */
  def mixtureSample(spark: SparkSession, dir: String,
                    targetDocs: Double = 100.0): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
    val denom = counts.agg(
      aggregate(
        array_sort(collect_list(struct(col("source"),
          sqrt(col("n").cast("double")).as("w")))),
        lit(0.0), (acc, s) => acc + s.getField("w")).as("denom"))
    val thresholds = counts.crossJoin(broadcast(denom))
      .select(col("source"),
        floor(least(lit(1.0),
          lit(targetDocs) * sqrt(col("n").cast("double")) / col("denom") / col("n"))
          * 65536).cast("bigint").as("thresh"))
    val h16 = conv(substring(
      md5(concat(lit("mix_"), col("doc_id").cast("string"))), 1, 4), 16, 10)
      .cast("long")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), h16.as("h"))
      .join(broadcast(thresholds), Seq("source"))
      .filter(col("h") < col("thresh"))
      .select(col("doc_id"), col("source"), col("thresh"))
  }

  /** q201: epoch/repetition budget report — given a total training
    * token budget (`budgetMult` × the corpus's token count) allocated
    * across sources by the α=0.5 temperature mixture ([[mixtureSample]]'s
    * rule, on TOKENS instead of docs), how many EPOCHS over each
    * source does its allocation imply, and which sources cross the
    * ~4-epoch repetition cliff (Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models": value decays rapidly past ~4
    * repeats)? This is the planning table a data-constrained run
    * reads before training: an `over_cap` source needs more data or a
    * smaller mixture share, BEFORE the tokens are spent.
    *
    * Exactness: per-source token counts are exact longs; the mixture
    * denominator is the source-sorted fold (q94's device); share,
    * allocation (floored to a long) and epochs are fixed IEEE trees
    * with the flag on the RAW ratio.
    *
    * Scale: one corpus aggregation to source-level token counts; the
    * rest is arithmetic on the sources-sized dim (broadcast). */
  def epochBudget(spark: SparkSession, dir: String,
                  budgetMult: Double = 4.0, epochCap: Double = 4.0): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), "\\s+")).cast("long")).as("n_tokens"))
    val dims = toks.agg(
      aggregate(
        array_sort(collect_list(struct(col("source"),
          sqrt(col("n_tokens").cast("double")).as("w")))),
        lit(0.0), (acc, s) => acc + s.getField("w")).as("denom"),
      sum(col("n_tokens")).as("total"))
    val share = sqrt(col("n_tokens").cast("double")) / col("denom")
    val alloc = floor(lit(budgetMult) * col("total").cast("double") * share)
      .cast("bigint")
    val epochs = alloc.cast("double") / col("n_tokens").cast("double")
    toks.crossJoin(broadcast(dims))
      .select(col("source"), col("n_tokens"),
        TextOps.roundAt(share, 6).as("share"),
        alloc.as("alloc_tokens"),
        TextOps.roundAt(epochs, 4).as("epochs"),
        (epochs > lit(epochCap)).as("over_cap"))
      .orderBy(col("source"))
  }

  /** q211: matched-distribution eval sampler — draw a ~1/`frac`
    * evaluation subset whose LENGTH distribution matches the corpus
    * by construction: rank-bin the corpus into `bins` equi-depth
    * length bins (the q204 integer-division device over the two-phase
    * global ordinal) and keep each bin's `⌊bin_n/frac⌋` (≥ 1)
    * smallest md5-hashed members. A naive hash sample matches
    * marginals only in expectation; an eval set sampled per stratum
    * matches them exactly — the difference between an eval set that
    * represents the corpus and one that under-weights long documents
    * (the classic eval-set bias, since long docs are few but carry
    * the tokens). Hash membership = reproducible, no RNG (q57/q94
    * convention).
    *
    * Scale: the global ordinal is the two-phase distributed prefix
    * sum; bins are equi-depth BY CONSTRUCTION so the per-bin hash-
    * rank window is balanced — no skewed partition exists to worry
    * about. */
  def matchedEvalSample(spark: SparkSession, dir: String,
                        bins: Int = 8, frac: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("n_chars"))
    val withRn = RelationalExt.globalRunningSum(
      d, Seq(col("n_chars"), col("doc_id")), lit(1L), "rn")
    val nDf = d.agg(count(lit(1)).as("n"))
    val hv = conv(substring(
      md5(concat(lit("ev_"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long")
    val w = Window.partitionBy(col("bin")).orderBy(col("hv"), col("doc_id"))
    val grp = Window.partitionBy(col("bin"))
    withRn.crossJoin(broadcast(nDf))
      .withColumn("bin", expr(s"((rn - 1) * $bins) div n + 1"))
      .withColumn("hv", hv)
      .withColumn("hrk", row_number().over(w).cast("long"))
      .withColumn("bn", count(lit(1)).over(grp))
      .filter(col("hrk") <= greatest(lit(1L), expr(s"bn div $frac")))
      .select(col("bin"), col("doc_id"), col("n_chars"))
      .orderBy(col("bin"), col("doc_id"))
  }

  /** Train/test split-leakage audit: assign every document to a split
    * by md5 hash (deterministic, engine-independent — the q57
    * convention), then report every verified near-dup pair that
    * CROSSES the split boundary. Each row is a leak: a test document
    * whose near-duplicate sits in training data inflates eval scores
    * without the model generalizing — the split-hygiene gate run
    * before any benchmark number is trusted.
    *
    * Scale: the pair generation is the standard blocked candidate
    * machinery (never all-pairs); the split assignment is a narrow
    * hash map joined onto the pair list twice (doc-keyed broadcast-
    * able at audit scale, shuffle join at corpus scale — either way
    * pair-list-sized, not corpus-sized). */
  def splitLeakage(spark: SparkSession, dir: String,
                   threshold: Double = 0.5): DataFrame = {
    val split = Tables.documents(spark, dir).select(col("doc_id"),
      when(substring(md5(concat(lit("split_"), col("doc_id").cast("string"))), 1, 1)
        .isin("0", "1", "2"), lit("test")).otherwise(lit("train")).as("split"))
    DedupOps.nearDupNgram(spark, dir, threshold)
      .join(split.select(col("doc_id").as("doc_a"), col("split").as("split_a")), "doc_a")
      .join(split.select(col("doc_id").as("doc_b"), col("split").as("split_b")), "doc_b")
      .filter(col("split_a") =!= col("split_b"))
      .select(col("doc_a"), col("split_a"), col("doc_b"), col("split_b"), col("jaccard"))
  }

  /** Leakage-free train/test split ASSIGNMENT — the constructive
    * complement of [[splitLeakage]]'s audit: every document's split is
    * decided by the md5 hash of its dedup-cluster REPRESENTATIVE (the
    * cluster-minimum doc_id; docs in no near-dup pair represent
    * themselves), so all members of a near-dup cluster land on the
    * same side and a verified near-dup pair can never cross the
    * boundary BY CONSTRUCTION (CurationSpec re-runs the q137 audit on
    * this split and pins the leak count at zero). Hashing the
    * representative keeps the assignment deterministic, engine-
    * independent (same md5 first-hex-char rule as [[splitLeakage]]) and
    * stable under corpus growth: adding documents never flips an
    * existing cluster's side unless dedup merges its cluster.
    *
    * Scale: cluster labels come from the standard blocked CC machinery
    * (pair-list-sized, never all-pairs); the representative lookup is
    * one doc_id-keyed left join (labels are pair-participant-sized,
    * far smaller than the corpus); the hash rule is a codegen'd narrow
    * map. */
  def clusterAwareSplit(spark: SparkSession, dir: String,
                        threshold: Double = 0.5): DataFrame = {
    val labels = DedupOps.dedupClusters(spark, dir, threshold)
      .select(col("doc_id"), col("cluster"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster"), col("doc_id")).as("cluster_rep"))
      .withColumn("split",
        when(substring(md5(concat(lit("split_"), col("cluster_rep").cast("string"))), 1, 1)
          .isin("0", "1", "2"), lit("test")).otherwise(lit("train")))
  }

  /** Per-source winsorization of document length (clip at the p05/p95
    * band) with outlier flags — the robust-stats step before
    * length-sensitive training decisions: a handful of giant
    * concatenation artifacts otherwise dominate per-source token
    * budgets and length-normalized scores.
    *
    * Same two-pass shape as [[percentileGate]] (and the same reason:
    * a percent_rank window would sort every source's corpus slice):
    * pass 1 aggregates each source's exact interpolated p05/p95 of
    * n_chars, pass 2 broadcast-joins the band back and clips with
    * least/greatest — a codegen'd narrow map. Clipped values stay
    * BIGINT: the band edges are interpolated doubles, floor'd on both
    * engines so the clip is integer-exact cross-engine. */
  def winsorize(spark: SparkSession, dir: String,
                lo: Double = 0.05, hi: Double = 0.95): DataFrame = {
    val sized = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"), length(col("text")).cast("bigint").as("n_chars"))
    val bands = sized.groupBy(col("source")).agg(
      floor(expr(s"percentile(n_chars, ${lo}D)")).cast("bigint").as("p_lo"),
      floor(expr(s"percentile(n_chars, ${hi}D)")).cast("bigint").as("p_hi"))
    sized.join(broadcast(bands), Seq("source"))
      .select(col("doc_id"), col("source"), col("n_chars"),
        greatest(col("p_lo"), least(col("p_hi"), col("n_chars"))).as("n_chars_clipped"),
        (col("n_chars") < col("p_lo") || col("n_chars") > col("p_hi")).as("is_outlier"))
  }

  /** Quality-weighted sampling WITHOUT replacement via deterministic
    * sort keys (Efraimidis & Spirakis 2006, A-Res): each document
    * draws u ∈ (0,1) from an md5 hash of its id and competes with key
    * u^(1/w) — the top-k keys are a weighted sample where inclusion
    * probability scales with w (here the shared [[TextOps]] quality
    * score, floored at 0.001 so a zero-quality doc gets a finite
    * exponent instead of key 0^∞).
    *
    * Scale: one narrow pass computes the keys (u is hash-derived —
    * reproducible across engines and reruns, no RNG state), and the
    * top-k is `orderBy(...).limit(k)` — Spark plans
    * TakeOrderedAndProject (per-partition bounded heaps, merge of
    * k-sized results on the driver), never a global sort. The +0.5
    * offset keeps u strictly inside (0,1): u=0 would be ln-singular
    * in the exponent form and collapse every weight to key 0. */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 200): DataFrame = {
    val u = (conv(substring(
      md5(concat(lit("ws_"), col("doc_id").cast("string"))), 1, 4), 16, 10)
      .cast("double") + 0.5) / 65536.0
    val w = greatest(TextOps.qualityCol, lit(0.001))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), TextOps.qualityCol.as("quality"),
        pow(u, lit(1.0) / w).as("samp_key"))
      .orderBy(col("samp_key").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("source"), col("quality"),
        // floor-form rounding: samp_key is an arbitrary double, the
        // exact cross-engine .5-boundary case library round() flips on
        TextOps.roundAt(col("samp_key"), 6).as("samp_key"))
  }

  /** Incremental-batch dedup: admit a new ingest batch (the
    * deterministic doc_id % batchMod == batchRem slice, standing in
    * for "today's crawl") against the standing corpus's fingerprint
    * index — every batch doc comes back with its dup verdict and the
    * surviving corpus doc it duplicates, WITHOUT re-deduplicating the
    * corpus. This is the production shape of dedup at 100 TB: the
    * full-corpus pass (q24) runs once; every subsequent batch runs
    * this.
    *
    * Scale: the index is corpus-sized, so it is NOT broadcast — the
    * join hash-partitions both sides on the 128-bit fingerprint
    * (batch side is small, so AQE turns it into a broadcast of the
    * BATCH at runtime when that wins). Map-side partial aggregation
    * collapses within-index dups before the exchange. The production
    * deployment materializes the index ONCE as a bucketed table
    * ([[writeFingerprintIndex]]) and probes it per batch with
    * [[bucketedAdmission]] — the index side then reads pre-partitioned
    * and pre-sorted with NO exchange (plan-asserted in CurationSpec). */
  def incrementalDedup(spark: SparkSession, dir: String,
                       batchMod: Int = 5, batchRem: Int = 4): DataFrame = {
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === batchRem
    val index = Tables.documents(spark, dir)
      .filter(!isBatch)
      .groupBy(TextOps.fingerprintCol(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper"))
    admissionVerdicts(Tables.documents(spark, dir).filter(isBatch), index)
  }

  /** The admission probe shared by [[incrementalDedup]] and the
    * streaming ingest path: fingerprint (doc_id, text) rows and
    * left-join them against the corpus index (fp → keeper).
    *
    * `newDocs` may be a STREAMING DataFrame: a stream-static left
    * join is STATELESS in Structured Streaming — each micro-batch
    * probes the static side directly, no state store, no watermark
    * required — which is exactly the production ingest-admission
    * shape (the index refreshes on its own cadence; the stream never
    * buffers). The spec proves stream/batch verdict parity and the
    * zero-state property. */
  def admissionVerdicts(newDocs: DataFrame, index: DataFrame): DataFrame =
    newDocs
      .select(col("doc_id"), TextOps.fingerprintCol(col("text")).as("fp"))
      .join(index, Seq("fp"), "left")
      .select(col("doc_id"), col("fp"),
        col("keeper").isNotNull.as("is_dup"), col("keeper"))

  /** Materialize the standing corpus's fingerprint index as a bucketed
    * + sorted catalog table (fp → keeper): the one-off write that makes
    * every subsequent batch admission probe shuffle-free on the index
    * side. Bucket count is the index's standing join parallelism —
    * size it to the target cluster, not the build job. */
  def writeFingerprintIndex(spark: SparkSession, dir: String, table: String,
                            buckets: Int, batchMod: Int = 5, batchRem: Int = 4): Unit = {
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === batchRem
    val index = Tables.documents(spark, dir)
      .filter(!isBatch)
      .groupBy(TextOps.fingerprintCol(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper"))
    graft.sources.Formats.writeBucketed(index, table, "fp", buckets)
  }

  /** Batch admission against a [[writeFingerprintIndex]]-materialized
    * bucketed index: same verdicts as [[incrementalDedup]], but the
    * corpus-sized index side reads pre-partitioned and pre-sorted from
    * its buckets — NO exchange, NO sort on the index, ever. Only the
    * (small) batch side shuffles and sorts, to the index's bucket
    * layout.
    *
    * The merge hint is a deliberate production declaration, not a test
    * crutch: for a LEFT join the build side is the right (index) side,
    * so letting the planner pick broadcast would ship the 100 TB index
    * to every executor; hinting merge pins the join family whose cost
    * is one batch-side exchange.
    *
    * Sort elimination needs an explicit opt-in: since Spark 3.0 a
    * bucketed scan does NOT advertise its sortBy order (SPARK-28595 —
    * with several files per bucket the rows interleave and the old
    * blanket assumption was simply wrong), so the planner would
    * re-Sort the 100 TB index under the merge join on every probe.
    * This method sets `spark.sql.legacy.bucketedTableScan
    * .outputOrdering` on the session (sticky — the conf is read at
    * plan time, after this method returns, so it cannot be scoped),
    * which is sound here and only here because [[Formats
    * .writeBucketed]] guarantees ONE file per bucket by pre-shuffling
    * to the bucket hash — the exact condition under which the scan's
    * declared order is real. CurationSpec asserts the resulting plan
    * (exactly one exchange AND one sort, both on the batch side,
    * bucketed index scan) with a falsifiability control against an
    * unbucketed table, plus verdict parity with [[incrementalDedup]]. */
  def bucketedAdmission(spark: SparkSession, dir: String, indexTable: String,
                        batchMod: Int = 5, batchRem: Int = 4): DataFrame = {
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === batchRem
    admissionVerdicts(
      Tables.documents(spark, dir).filter(isBatch),
      spark.table(indexTable).hint("merge"))
  }

  /** Default redaction patterns for [[scrub]]: PII-shaped tokens
    * replaced in place (the C4/RefinedWeb scrub step). The corpus
    * vocabulary contains neither — their counts oracle-check at zero
    * here — but the machinery is live and CurationSpec proves it fires
    * on synthetic PII rows; the blocklist phrases below are drawn from
    * the corpus so the banned-phrase path is exercised non-vacuously. */
  val DefaultRedact: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b", "<IP>"))

  /** Banned-phrase blocklist for [[scrub]] (C4's bad-words document
    * filter, phrase-shaped): a doc containing any of these is flagged
    * `keep = false`; occurrences are counted, not redacted. */
  val BannedPhrases: String = "\\b(customer query|big table|slow scan)\\b"

  /** Pattern scrub: redact PII-shaped substrings in place and flag
    * documents containing blocklisted phrases — the C4-style cleanup
    * pass that runs before dedup in a production pipeline. Counts are
    * computed on the ORIGINAL text (a redaction must not hide a
    * second pattern's count), replacements applied left-to-right in
    * `redact` order; `keep` is the blocklist verdict (banned docs are
    * flagged, not destroyed — the drop is the caller's filter).
    *
    * Scale: a pure narrow map — every regexp_count/regexp_replace is
    * a codegen'd scalar on the scan projection, zero exchanges, and
    * Parquet prunes to (doc_id, text). At 100 TB this runs at scan
    * speed; there is nothing to shuffle. */
  def scrubPatterns(docs: DataFrame,
                    redact: Seq[(String, String, String)] = DefaultRedact,
                    banned: String = BannedPhrases): DataFrame = {
    val counts = redact.map { case (name, pat, _) =>
      regexp_count(col("text"), lit(pat)).cast("long").as(s"n_$name") }
    val cleaned = redact.foldLeft(col("text")) { case (c, (_, pat, repl)) =>
      regexp_replace(c, pat, repl) }
    docs.select(
      col("doc_id") +: counts ++: Seq(
        regexp_count(col("text"), lit(banned)).cast("long").as("n_banned"),
        cleaned.as("clean_text"),
        (regexp_count(col("text"), lit(banned)) === 0).as("keep")): _*)
  }

  /** q109: [[scrubPatterns]] with the default PII + blocklist config
    * over the documents table. */
  def scrub(spark: SparkSession, dir: String): DataFrame =
    scrubPatterns(Tables.documents(spark, dir))

  /** Semi-join reduction for the admission probe: gate the CORPUS
    * INDEX scan with a bloom filter built over the (small) batch's
    * fingerprint keys, so index rows that cannot match any batch key
    * are dropped at the scan — the explicit form of Spark's
    * InjectRuntimeFilter, applied where the optimizer won't (the
    * injected rule targets selective shuffle joins; an admission
    * probe's index side is the thing we must never shuffle at all).
    *
    * The bloom is built DISTRIBUTED as an aggregate over the batch
    * keys and reaches the filter as a scalar subquery — no driver
    * collect, the engine broadcasts the one-row binary result. Bloom
    * filters have no false negatives, so every index row whose key a
    * batch doc carries survives the gate and the downstream verdicts
    * are EXACTLY the ungated ones (spec-proven parity + superset
    * property); false positives only cost bytes, never answers.
    *
    * At 100 TB: the gate turns "join the whole index against the
    * batch" into "scan the index, keep ~|batch| rows, join those" —
    * the join's index-side input shrinks from corpus-sized to
    * batch-sized before any exchange. numBits=2²³ (1 MiB) holds fpp
    * ≪ 1% to ~10⁶ batch keys; size it to the ingest batch, not the
    * corpus. */
  def bloomGatedIndex(batchKeys: DataFrame, index: DataFrame,
                      numBits: Long = 1L << 23): DataFrame = {
    val spark = index.sparkSession
    graft.GraftExtensions.registerBloomFunctions(spark)
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val bv = s"bloom_batch_$sfx"
    val iv = s"bloom_index_$sfx"
    batchKeys.createOrReplaceTempView(bv)
    index.createOrReplaceTempView(iv)
    // analysis is eager in spark.sql; the resolved plan no longer
    // needs the views, so drop them before returning (catalog hygiene)
    try spark.sql(
      s"""SELECT * FROM $iv
         |WHERE might_contain(
         |  (SELECT bloom_filter_agg(xxhash64(fp), CAST(${1L << 20} AS BIGINT),
         |                           CAST($numBits AS BIGINT)) FROM $bv),
         |  xxhash64(fp))""".stripMargin)
    finally {
      spark.catalog.dropTempView(bv)
      spark.catalog.dropTempView(iv)
    }
  }

  /** q112: [[incrementalDedup]]'s verdicts through the bloom-gated
    * index — same oracle SQL as q92 by construction (the gate is
    * physically visible, semantically invisible). */
  def bloomGatedAdmission(spark: SparkSession, dir: String,
                          batchMod: Int = 5, batchRem: Int = 4): DataFrame = {
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === batchRem
    val docs = Tables.documents(spark, dir)
    val index = docs.filter(!isBatch)
      .groupBy(TextOps.fingerprintCol(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper"))
    val batch = docs.filter(isBatch)
      .select(col("doc_id"), TextOps.fingerprintCol(col("text")).as("fp"))
    admissionVerdicts(
      docs.filter(isBatch),
      bloomGatedIndex(batch.select(col("fp")), index))
  }

  /** Token-budget corpus selection: take documents in quality-
    * descending order until a token budget is exhausted — "fill a
    * 10B-token training budget with the best docs first", the
    * selection step after scoring and before packing. A doc is kept
    * iff the running token total through it (ordered by quality desc,
    * doc_id — a total order, so the answer is unique) stays within
    * the budget.
    *
    * Scale: the running total comes from
    * [[RelationalExt.globalRunningSum]] — a two-phase distributed
    * prefix sum (range partition → parallel per-partition windows →
    * cluster-width offset frame → broadcast add), NOT a global
    * single-partition window: the naive form funnels 100 TB of rows
    * through one task; this form's only serial step is O(partitions).
    * Quality and token counts are the shared [[TextOps]] definitions
    * (same columns q21/q20 certify). */
  def budgetSelect(spark: SparkSession, dir: String, budget: Long = 20000L,
                   nPartitions: Int = 0): DataFrame = {
    val scored = Tables.documents(spark, dir).select(
      col("doc_id"), TextOps.qualityCol.as("quality"),
      size(split(col("text"), "\\s+")).cast("bigint").as("n_tokens"))
    RelationalExt.globalRunningSum(scored,
        Seq(col("quality").desc, col("doc_id").asc),
        col("n_tokens"), "cum_tokens", nPartitions)
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("quality"), col("n_tokens"), col("cum_tokens"))
  }

  /** Per-group percentile quality gate ("keep the top quartile of
    * every source"): pass 1 aggregates each source's exact
    * interpolated quality percentile (a partial-aggregated groupBy —
    * the thresholds frame is one row per source), pass 2 broadcast-
    * joins the thresholds back and filters.
    *
    * The point of the two-pass shape is what it AVOIDS: the obvious
    * `percent_rank() OVER (PARTITION BY source ORDER BY quality)`
    * sorts every source's full slice of the corpus inside one window
    * task per source — at 100 TB with a handful of sources that is a
    * terabyte-scale sort per task. Here nothing is ever sorted: the
    * percentile aggregate buffers per-group values only in pass 1's
    * final merge (swap in approx_percentile — q100's sketch — for
    * bounded memory when groups are corpus-sized), and pass 2 is a
    * codegen'd scan + broadcast hash join. Quality is the shared
    * [[TextOps.qualityCol]] definition q21 certifies. */
  def percentileGate(spark: SparkSession, dir: String,
                     pct: Double = 0.75): DataFrame = {
    val scored = Tables.documents(spark, dir).select(
      col("doc_id"), col("source"), TextOps.qualityCol.as("quality"))
    val thresholds = scored.groupBy(col("source"))
      .agg(expr(s"percentile(quality, ${pct}D)").as("threshold"))
    scored.join(broadcast(thresholds), Seq("source"))
      .filter(col("quality") >= col("threshold"))
      .select(col("doc_id"), col("source"), col("quality"),
        round(col("threshold"), 6).as("threshold"))
  }

  /** The composed curation pipeline, end to end, as ONE lazy plan —
    * the capstone a user of this library actually runs: language/
    * quality/exact-dedup gating ([[TextOps.corpusFilter]], q78's
    * certified stages) → benchmark decontamination
    * ([[decontamination]], keep only uncontaminated docs — which also
    * drops the eval slice itself) → token-budget selection
    * ([[RelationalExt.globalRunningSum]], q113's distributed prefix
    * sum) — every stage the exact shared definition its own oracle
    * query certifies, so the composition is hash-gated as a whole
    * (q127) on top of each part being gated alone.
    *
    * Scale: the stages compose as plan nodes, not materializations —
    * Catalyst sees one DAG (the semi joins all key on doc_id). At
    * 100 TB you'd localCheckpoint/persist between stages to avoid
    * re-deriving shared scans per branch — a deployment knob, not a
    * semantic one (the lazy ≡ checkpointed equivalence is the same
    * contract HydroPipeline proves for the reference dataflow). */
  def curationPipeline(spark: SparkSession, dir: String,
                       budget: Long = 10000L,
                       nPartitions: Int = 0): DataFrame = {
    val kept = TextOps.corpusFilter(spark, dir)
    val cleanIds = decontamination(spark, dir)
      .filter(!col("contaminated")).select(col("doc_id"))
    val tokens = Tables.documents(spark, dir).select(col("doc_id"),
      size(split(col("text"), "\\s+")).cast("bigint").as("n_tokens"))
    val scored = kept.join(cleanIds, Seq("doc_id"), "left_semi")
      .join(tokens, "doc_id")
    RelationalExt.globalRunningSum(scored,
        Seq(col("quality").desc, col("doc_id").asc),
        col("n_tokens"), "cum_tokens", nPartitions)
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("quality"), col("lang_pred"),
        col("n_tokens"), col("cum_tokens"))
  }

  /** Snapshot diff (change data capture between two corpus versions):
    * full-outer join the two snapshots' (doc_id, content-fingerprint)
    * frames and classify every id as added / removed / changed /
    * unchanged — the audit step between any two publishes of a
    * curated corpus ("what did this re-crawl actually change?").
    *
    * Scale: fingerprints are codegen'd md5 on the scans (text never
    * crosses an exchange — only 32-char fingerprints shuffle), then
    * ONE doc_id join. When both snapshots are persisted bucketed on
    * doc_id — the natural layout for a corpus keyed by id, exactly
    * what [[graft.sources.Formats.writeBucketed]] produces — the join
    * plans with ZERO exchanges (spec-asserted in AsofFormatsSpec), so
    * diffing two 100 TB snapshots is a co-partitioned merge, not a
    * corpus-sized shuffle. */
  def snapshotDiff(v1: DataFrame, v2: DataFrame): DataFrame = {
    def fp(df: DataFrame, p: String) = df.select(
      col("doc_id").as(s"${p}_id"), md5(col("text")).as(s"${p}_fp"))
    fp(v1, "a").join(fp(v2, "b"), col("a_id") === col("b_id"), "full_outer")
      .select(coalesce(col("a_id"), col("b_id")).as("doc_id"),
        when(col("b_id").isNull, "removed")
          .when(col("a_id").isNull, "added")
          .when(col("a_fp") =!= col("b_fp"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** q111: [[snapshotDiff]] between the documents table (v1) and a
    * deterministically simulated next version (v2): ids ≡3 (mod 17)
    * deleted, ids ≡5 edited, ids ≡7 re-ingested under a new id —
    * every status class exercised (29 added / 30 changed / 30 removed
    * at sf0.01), all derivable by the oracle from the same table. */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val m = pmod(col("doc_id"), lit(17))
    val v2 = docs.filter(m =!= 3)
      .select(col("doc_id"),
        when(m === 5, concat(col("text"), lit(" v2 edit")))
          .otherwise(col("text")).as("text"))
      .unionByName(docs.filter(m === 7)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    snapshotDiff(docs, v2)
  }

  /** Per-document gate decision log — the explainability twin of the
    * q127 capstone: instead of the filtered corpus, emit WHY each
    * document was admitted or rejected. Five gates, each the exact
    * shared definition its own oracle certifies ([[TextOps.qualityCol]]
    * / [[TextOps.langPredCol]] / [[TextOps.exactKeepers]] /
    * [[TextOps.gopherFlagCols]] / [[decontamination]]), plus the
    * failure count, the first failing gate in audit priority order
    * (quality → lang → duplicate → gopher → contaminated), and the
    * final verdict. A curation run that drops 40% of a crawl owes its
    * operators this table.
    *
    * Covers the non-eval slice ([[decontamination]]'s domain — eval
    * docs are the benchmark, not candidates). Survivorship is judged
    * against the FULL corpus like [[TextOps.corpusFilter]], so a
    * non-eval dup of an eval doc still reads `duplicate`.
    *
    * Scale: quality, language, and all seven Gopher rules evaluate in
    * ONE narrow codegen pass over the text scan; the only exchanges
    * are the fingerprint-keeper aggregation and two doc_id joins
    * (keeper marker, decontamination verdict) — no wide shuffle ever
    * moves the text itself. */
  def gateLog(spark: SparkSession, dir: String, minQuality: Double = 0.5,
              evalMod: Int = 10, evalRem: Int = 7): DataFrame = {
    val isEval = pmod(col("doc_id"), lit(evalMod)) === evalRem
    val scored = Tables.documents(spark, dir)
      .filter(!isEval)
      .select(col("doc_id"),
        (TextOps.qualityCol >= minQuality).as("f_quality"),
        (TextOps.langPredCol === "en").as("f_lang"),
        TextOps.gopherKeepCol.as("f_gopher"))
    val keepers = TextOps.exactKeepers(spark, dir)
      .withColumn("__keeper", lit(true))
    val clean = decontamination(spark, dir, evalMod = evalMod, evalRem = evalRem)
      .select(col("doc_id"), (!col("contaminated")).as("f_clean"))
    val flags = Seq("f_quality", "f_lang", "f_unique", "f_gopher", "f_clean")
    scored
      .join(keepers, Seq("doc_id"), "left")
      .withColumn("f_unique", coalesce(col("__keeper"), lit(false)))
      .join(clean, Seq("doc_id"))
      .select(col("doc_id") +: flags.map(col): _*)
      .withColumn("n_fail",
        flags.map(f => when(col(f), 0L).otherwise(1L)).reduce(_ + _))
      .withColumn("first_fail",
        when(!col("f_quality"), "quality")
          .when(!col("f_lang"), "lang")
          .when(!col("f_unique"), "duplicate")
          .when(!col("f_gopher"), "gopher")
          .when(!col("f_clean"), "contaminated")
          .otherwise("none"))
      .withColumn("admitted", flags.map(col).reduce(_ && _))
  }

  /** q226: proportional quota sampling with LARGEST-REMAINDER
    * apportionment (Hamilton's method) — allocate a fixed sample
    * budget across sources exactly proportionally: base_i =
    * ⌊B·n_i/N⌋, then the B − Σbase leftover seats go to the largest
    * remainders (tie → source asc), so for B ≤ N Σquota = B EXACTLY
    * and every source is within one doc of its ideal share; for
    * B > N quotas clamp to each source's population and the sample
    * degrades (announced by the quota column itself) to the whole
    * corpus, Σquota = N. The floor-and-
    * redistribute step is what q82's per-stratum hash gate and q94's
    * expectation-only mixture can't give: those hit quotas only in
    * expectation, this hits the budget to the row — the contract an
    * eval-set builder needs ("exactly 100 docs, source-proportional").
    * Members are then the per-source `quota` smallest md5s — the
    * q211 reproducible-membership device, no RNG.
    *
    * Exactness: apportionment is pure integer arithmetic (div/mod);
    * the seat-assignment window and the membership window are both
    * deterministically ordered (rem desc, source) / (md5, doc_id).
    *
    * Scale: apportionment runs entirely on the S-row source dim
    * (model state — the unpartitioned window is S-sized by
    * construction); membership is one per-source rank over a
    * source-partitioned shuffle with the quota dim broadcast back. */
  def quotaSample(spark: SparkSession, dir: String, budget: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("nn"))
    val qd = counts.crossJoin(broadcast(tot))
      .select(col("source"), col("n"),
        expr(s"($budget * n) div nn").as("base"),
        expr(s"($budget * n) % nn").as("rem"))
    val lf = qd.agg((lit(budget.toLong) - sum(col("base"))).as("extra"))
    // S-row model dim: the unpartitioned window is bounded by the
    // source count, never the corpus
    val seats = Window.orderBy(col("rem").desc, col("source"))
    val quota = qd.crossJoin(broadcast(lf))
      .withColumn("rk", row_number().over(seats).cast("long"))
      .select(col("source"), col("n").as("n_docs"),
        // clamp to the source's population: for budget < N Hamilton
        // never exceeds n_i (base < n_i and the seat adds ≤ 1), so the
        // clamp is inert and Σquota = B exactly; for budget ≥ N every
        // quota clamps to n_i and the sample IS the corpus (Σ = N) —
        // without the clamp the rn ≤ quota filter would truncate
        // silently and the emitted quota column would overstate the
        // actual sample (ADVICE r17)
        least(col("base") + when(col("rk") <= col("extra"), 1L).otherwise(0L),
          col("n")).as("quota"))
    val members = Window.partitionBy(col("source"))
      .orderBy(col("hk"), col("doc_id"))
    docs
      .withColumn("hk", md5(concat(lit("qs_"), col("doc_id").cast("string"))))
      .withColumn("rn", row_number().over(members).cast("long"))
      .join(broadcast(quota), "source")
      .filter(col("rn") <= col("quota"))
      .select(col("source"), col("doc_id"), col("rn").as("pick_rank"), col("quota"))
      .orderBy(col("source"), col("pick_rank"))
  }
}
