package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2c): media payloads as
  * opaque `binary` columns with a typed metadata struct, plus the
  * decode / feature-extract / resize / frame-sample operators a
  * training-data pipeline runs over them.
  *
  * The decode kernel itself is STUBBED — this container has no image/
  * audio codecs — behind the [[MediaDecoder]] trait with a
  * deterministic fake ([[StubDecoder]], a byte histogram). Everything
  * Spark-side is real and tested: the schema, the partition-wise
  * batched execution shape (the Scala analog of `mapInPandas` — one
  * decoder instance per partition, payloads processed in fixed-size
  * batches), and the pure-column metadata operators.
  *
  * Scale notes (100 TB): payloads stay opaque bytes end-to-end — no
  * decode happens outside [[extractFeatures]], and metadata-only plans
  * (resize targets, frame sampling) never touch the payload column, so
  * Parquet column pruning keeps those scans cheap. Feature extraction
  * is a narrow partition-wise map: no shuffle, and batch size bounds
  * per-task memory regardless of payload skew.
  */
object MultimodalOps {

  /** Derive a deterministic media table from `documents`: the text
    * bytes stand in for an encoded payload; metadata is a function of
    * doc_id so the DuckDB oracle can reproduce it. */
  def asMedia(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(pmod(col("doc_id"), lit(3)) === 0, "png")
          .when(pmod(col("doc_id"), lit(3)) === 1, "jpeg")
          .otherwise("wav").as("format"),
        (lit(320) + pmod(col("doc_id"), lit(4)) * 160).cast("int").as("width"),
        (lit(240) + pmod(col("doc_id"), lit(4)) * 120).cast("int").as("height"),
        (pmod(col("doc_id"), lit(120)) + 1).cast("int").as("n_frames")).as("meta"))

  /** Metadata-only operators — pure column expressions, payload never
    * read. Resize: target box halving; frame-sample: up to 8 evenly
    * spaced frame indices. */
  def withPlan(media: DataFrame): DataFrame = {
    val n = col("meta.n_frames")
    val step = greatest(lit(1L), ceil(n / 8.0)).cast("long")
    media
      .withColumn("target_width", (col("meta.width") / 2).cast("int"))
      .withColumn("target_height", (col("meta.height") / 2).cast("int"))
      .withColumn("frame_indices", sequence(lit(0L), n.cast("long") - 1, step))
  }

  /** Pluggable decode kernel. A real deployment binds an image/audio
    * codec here; the engine only promises the execution shape. */
  trait MediaDecoder extends Serializable {
    def decode(payload: Array[Byte], format: String): Array[Float]
  }

  /** Deterministic fake decoder: 16-bin normalized byte histogram.
    * Marks exactly where a JNI/codec call would go. */
  object StubDecoder extends MediaDecoder {
    override def decode(payload: Array[Byte], format: String): Array[Float] = {
      val bins = new Array[Float](16)
      var i = 0
      while (i < payload.length) { bins((payload(i) & 0xFF) >> 4) += 1f; i += 1 }
      val n = math.max(payload.length, 1).toFloat
      bins.map(_ / n)
    }
  }

  /** Partition-wise batched feature extraction — the `mapInPandas`
    * analog: one decoder per partition, payloads decoded in batches of
    * `batchSize` (the batch boundary is where a vectorized/JNI decoder
    * would amortize setup). Narrow map, no shuffle. Emits the payload
    * byte length alongside the features — it is free at decode time
    * and saves downstream consumers a join back to the payload. */
  def extractFeatures(media: DataFrame, decoder: MediaDecoder = StubDecoder,
                      batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val typed: Dataset[(Long, Array[Byte], String)] = media
      .select(col("doc_id"), col("payload"), col("meta.format"))
      .as[(Long, Array[Byte], String)]
    typed.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { case (id, payload, format) =>
          (id, payload.length.toLong, decoder.decode(payload, format))
        }
      }
    }.toDF("doc_id", "n_bytes", "features")
  }

  /** Driver-gate query: metadata + payload size + sampled-frame count
    * (everything deterministic, so oracle-checkable; the stub decode
    * path is exercised by q32 and the scalatest spec). */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    withPlan(asMedia(spark, dir)).select(
      col("doc_id"),
      col("meta.format").as("format"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("target_width"), col("target_height"),
      length(col("payload")).cast("bigint").as("n_bytes"),
      size(col("frame_indices")).cast("bigint").as("frames_sampled"))

  /** Perceptual signature over the decoded feature histogram: each of
    * the 16 bins quantized to an integer level at 1/256 granularity
    * (`q_h = min(255, floor(count_h * 256 / n_bytes))`), emitted as 16
    * integer columns. The integer bin count is recovered from the
    * float32-normalized histogram by the same multiply-and-round
    * identity as [[mediaFeatures]]' bin6_count (exact while a payload
    * stays under 8M bytes — k·2⁻²⁴ < 0.5), and the level division is
    * exact integer floor in both engines (the double quotient of
    * longs < 2⁴⁷ cannot round across an integer), so every level — and
    * hence every downstream distance — is integer-reproducible by the
    * DuckDB oracle from the raw payload bytes.
    *
    * This is the aHash/pHash family move re-expressed for a histogram
    * kernel: quantize the decoded feature vector to a compact integer
    * signature whose elementwise L1 distance is the near-dup metric.
    * (A bit-packed signature was rejected: 16 bins × 8-bit levels
    * overflow a signed long's 63 usable bits, and thermometer packing
    * triples the width — 16 narrow integer columns stay codegen'd
    * end-to-end with zero packing arithmetic.) */
  def mediaSignatures(spark: SparkSession, dir: String,
                      decoder: MediaDecoder = StubDecoder): DataFrame =
    signaturesOf(asMedia(spark, dir), decoder)

  /** [[mediaSignatures]] over any media frame (doc_id, payload,
    * meta.format) — batch or streaming; the decode map and the level
    * arithmetic are both stateless. */
  def signaturesOf(media: DataFrame,
                   decoder: MediaDecoder = StubDecoder): DataFrame = {
    val feats = extractFeatures(media, decoder)
    val levels = (0 until 16).map { h =>
      when(col("n_bytes") === 0, lit(0L)).otherwise(
        least(lit(255L), floor(
          round(element_at(col("features"), h + 1).cast("double") * col("n_bytes"), 0)
            * 256 / col("n_bytes")).cast("long"))).as(s"q$h")
    }
    feats.select(col("doc_id") +: levels: _*)
  }

  /** The pigeonhole coupling shared by the media near-dup family:
    * recall is complete only when the band count EXCEEDS the L1
    * threshold (L1 ≤ maxL1 means at most maxL1 levels differ, so at
    * least one of maxL1 + 1 bands is level-identical), so the band
    * count is DERIVED from the threshold, never fixed — a hardcoded
    * band count would silently drop true pairs the moment a caller
    * raised maxL1 past it. */
  private def bandCount(maxL1: Int): Int = {
    require(maxL1 >= 0 && maxL1 < 16,
      s"maxL1 must be in [0, 15] (the signature has 16 bins), got $maxL1")
    maxL1 + 1
  }

  /** Interleaved exact-match band keys: band b holds every
    * nBands-th bin (`h mod nBands`), not a contiguous range —
    * adjacent histogram bins are correlated and real-world histograms
    * are sparse, so contiguous bands concentrate all entropy in a few
    * bands and leave the rest as degenerate full-corpus buckets. */
  private def bandKeyCols(nBands: Int): Seq[Column] =
    (0 until nBands).map { b =>
      concat_ws(",", (0 until 16).filter(_ % nBands == b).map(h => col(s"q$h")): _*)
    }

  /** The exact 16-term L1 sum over two level columns families — all
    * codegen'd column arithmetic, no UDF, no array lambda. */
  private def l1Dist(a: Int => Column, b: Int => Column): Column =
    (0 until 16).map(h => abs(a(h) - b(h))).reduce(_ + _)

  /** Multimodal near-dup: pairs of media payloads whose decoded
    * feature histograms agree within an L1 distance of `maxL1`
    * quantization granules — the dedup signal OVER the media column
    * that the text near-dup family (MinHash/SimHash) cannot see.
    *
    * Candidate generation is the banded-LSH shape shared with
    * [[DedupOps]] (same `bucketPairs` explode-then-filter, one bucket
    * shuffle, no self-join) with [[bandCount]]'s derived maxL1 + 1
    * exact-match bands — full recall by construction for ANY maxL1,
    * no probabilistic miss (spec-proven against brute force at both
    * the default and a raised threshold).
    *
    * Scale: one shuffle on (band, bucket-key), pair output bounded by
    * bucket sizes; a degenerate bucket (a histogram level-tuple shared
    * by a large doc fraction) is the standard LSH stop-key —
    * [[DedupOps.bucketPairs]]' maxBucket cap is the production knob.
    * At 100 TB the decode stays a narrow partition-wise map and only
    * (doc_id, 16 longs) rows ever shuffle — payloads never leave
    * their scan partition. */
  def nearDupMedia(spark: SparkSession, dir: String, maxL1: Int = 2,
                   decoder: MediaDecoder = StubDecoder): DataFrame = {
    val sigs = mediaSignatures(spark, dir, decoder)
    val banded = sigs.select(
      col("doc_id") +: (0 until 16).map(h => col(s"q$h")) :+
        posexplode(array(bandKeyCols(bandCount(maxL1)): _*)): _*)
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val buckets = banded.groupBy(col("band"), col("bucket"))
      .agg(collect_list(struct(
        col("doc_id") +: (0 until 16).map(h => col(s"q$h")): _*)).as("members"))
    DedupOps.bucketPairs(buckets)
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        l1Dist(h => col(s"x.q$h"), h => col(s"y.q$h")).cast("bigint").as("dist"))
      .filter(col("dist") <= maxL1)
      .distinct()
  }

  /** Incremental media admission — the multimodal analog of
    * CurationOps.incrementalDedup: each arriving payload (the
    * deterministic doc_id % batchMod == batchRem slice) is checked
    * against the STANDING corpus's signatures, and the verdict row
    * carries everything the ingest decision needs: is_dup, the number
    * of near-dup index hits, the lowest-id near-dup (`keeper`) and
    * the closest distance (`best_dist` — keeper and best_dist are
    * independently aggregated minima, documented as such).
    *
    * Candidate generation is [[nearDupMedia]]'s interleaved
    * exact-match bands turned into a PROBE: the batch's band keys are
    * BROADCAST (an ingest batch is bounded — the decontamination
    * broadcast direction), so the corpus side streams through a
    * narrow hash-lookup and only batch-doc-sized aggregates ever
    * shuffle — the index never repartitions, at any corpus size.
    * [[bandCount]]'s derived banding keeps recall exact for any
    * maxL1. In production the index side reads persisted signatures
    * (the [[mediaSignatures]] output is 17 scalar columns — a natural
    * bucketed table) instead of re-decoding; the decode here keeps
    * the query self-contained for the oracle.
    *
    * The batch/index split happens on the media frame BEFORE the
    * decode, not on the signature output: a filter above
    * extractFeatures' typed mapPartitions cannot push below it, so a
    * post-decode split would decode the whole corpus once per side —
    * 2× the most expensive narrow stage. Split first and the batch
    * side decodes only its 1/batchMod slice. */
  def mediaAdmission(spark: SparkSession, dir: String, batchMod: Int = 5,
                     batchRem: Int = 4, maxL1: Int = 2): DataFrame = {
    val media = asMedia(spark, dir)
    val isBatch = pmod(col("doc_id"), lit(batchMod)) === batchRem
    mediaAdmissionVerdicts(
      signaturesOf(media.filter(isBatch)),
      signaturesOf(media.filter(!isBatch)), maxL1)
  }

  /** The verdict core of [[mediaAdmission]], over ANY pair of
    * signature frames (doc_id + q0..q15 — [[mediaSignatures]] shape).
    * Verdicts are a pure function of (batch row, index) — no
    * cross-batch state — so a streaming ingest runs this per
    * micro-batch via foreachBatch against the persisted index and
    * gets batch-identical admission (spec-proven), the same
    * batch-boundary independence contract as the text admission's
    * stream-static form. */
  def mediaAdmissionVerdicts(batchSigs: DataFrame, indexSigs: DataFrame,
                             maxL1: Int = 2): DataFrame = {
    val keys = bandKeyCols(bandCount(maxL1))
    def banded(df: DataFrame, p: String) = df.select(
      col("doc_id").as(s"${p}_id") +:
        (0 until 16).map(h => col(s"q$h").as(s"${p}_q$h")) :+
        posexplode(array(keys: _*)): _*)
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val hits = banded(indexSigs, "i")
      .join(broadcast(banded(batchSigs, "b")), Seq("band", "bucket"))
      .withColumn("dist",
        l1Dist(h => col(s"b_q$h"), h => col(s"i_q$h")).cast("bigint"))
      .filter(col("dist") <= maxL1)
      .select(col("b_id").as("doc_id"), col("i_id"), col("dist"))
      .distinct() // a pair may collide in several bands
    val verdicts = hits.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), min(col("i_id")).as("keeper"),
        min(col("dist")).as("best_dist"))
    batchSigs.select(col("doc_id"))
      .join(verdicts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("n_hits").isNotNull.as("is_dup"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("keeper"), col("best_dist"))
  }

  /** Driver-gate query: stub decode over every payload, reduced to
    * integer-exact observables the DuckDB oracle can recompute from
    * the raw bytes:
    *  - hist_sum: the 16 normalized bins summed (≡ 1.0 for any
    *    non-empty payload — 16 float adds cannot drift past the
    *    4-decimal rounding);
    *  - bin6_count: bin 6 (fraction of bytes with high nibble 6 —
    *    0x60–0x6F, i.e. letters a–o, the bin that actually varies on
    *    text payloads; bin 0 is constantly zero on this corpus)
    *    un-normalized back to its byte COUNT. bin6 is k/n in float32;
    *    multiplying by n and rounding recovers k exactly while
    *    k·2⁻²⁴ < 0.5 (k < 8M, far above any payload here), so the
    *    value is integer-exact and immune to float32-vs-double
    *    rounding divergence. The oracle counts the same bytes
    *    directly via blob slicing. A float-valued column would risk
    *    ulp-level hash mismatches; the spec covers the full
    *    histogram's float properties instead. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(asMedia(spark, dir)).select(col("doc_id"),
      round(aggregate(col("features"), lit(0.0d), (a, v) => a + v), 4).as("hist_sum"),
      round(element_at(col("features"), 7).cast("double") * col("n_bytes"), 0)
        .cast("bigint").as("bin6_count"))
}
