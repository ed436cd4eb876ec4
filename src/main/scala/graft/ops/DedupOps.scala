package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CosineSimilarity.cosineSimilarity

/** Deduplication operators for LLM-data pipelines (SURVEY.md §2c):
  * exact (normalized-fingerprint groupBy), n-gram Jaccard, banded
  * MinHash LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - Exact dedup is one hash-shuffle on a 128-bit fingerprint —
  *    map-side partial aggregation collapses within-partition dups
  *    before the exchange.
  *  - Every near-dup variant is candidate-generation (a cheap,
  *    shuffle-friendly blocking key: min-shingle, LSH band bucket,
  *    SimHash band, cluster label) followed by exact verification on
  *    the candidate pairs only — never an O(n²) cross join. Bucket
  *    joins shuffle on the bucket key, so skew is bounded by bucket
  *    size, not corpus size; pathological buckets (stop-shingles) can
  *    be salted or capped without changing semantics.
  *  - All verification kernels (Jaccard over shingle arrays, Hamming
  *    via xor+bit_count, cosine via the codegen'd CosineSimilarity
  *    expression) are per-pair scalar expressions inside codegen.
  */
object DedupOps {

  // ---------------------------------------------------------------
  // exact dedup
  // ---------------------------------------------------------------

  /** Exact dedup groups: normalized-content fingerprint → surviving
    * doc (min id) + duplicate count. Keep `.filter(col("n_dups") > 1)`
    * to list only actual dup groups; survivors = this joined back
    * semi on (fp, keeper). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(TextOps.fingerprintCol(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))

  // ---------------------------------------------------------------
  // n-gram Jaccard near-dup
  // ---------------------------------------------------------------

  /** Word 3-gram shingle set of a normalized text column. */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = split(trim(regexp_replace(lower(text), "[^a-z0-9]+", " ")), " ")
    array_distinct(transform(
      sequence(lit(0), greatest(size(words) - n, lit(0))),
      i => concat_ws(" ", slice(words, i + 1, lit(n)))))
  }

  /** Near-dup pairs by word-3-gram Jaccard, blocked on the minimum
    * md5'd shingle (a 1-permutation MinHash): only docs sharing their
    * min-shingle are compared — the standard cheap prefilter that
    * keeps candidate generation linear-ish in corpus size. */
  def nearDupNgram(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .withColumn("minsh", array_min(transform(col("sh"), s => md5(s))))
    val a = docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"), col("minsh"))
    val b = docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"), col("minsh"))
    a.join(b, Seq("minsh"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ---------------------------------------------------------------
  // MinHash + LSH near-dup
  // ---------------------------------------------------------------

  /** Universal-hash MinHash signature over md5-hashed shingles:
    * h_i(s) = (a_i * h(s) + b_i) mod p, deterministic seeds. */
  private val MinHashP = 2147483647L // Mersenne prime 2^31-1
  private def minHashCoeffs(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(k)((1 + rnd.nextInt(Int.MaxValue - 1).toLong, rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Banded MinHash LSH candidate pairs + exact Jaccard verification.
    * numHashes = bands * rowsPerBand; docs colliding in ANY band are
    * candidates (the classic S-curve: bands=8 × rows=4 targets
    * J≈0.5+). One explode (docs × bands), one shuffle on the band
    * bucket, then exact verify per pair. */
  def nearDupMinHash(spark: SparkSession, dir: String,
                     threshold: Double = 0.5, bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val k = bands * rowsPerBand
    val coeffs = minHashCoeffs(k)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .filter(size(col("sh")) > 0)
      // shingle → stable 64-bit hash, kept non-negative for the mod
      .withColumn("hv", transform(col("sh"), s => pmod(xxhash64(s), lit(MinHashP))))
    val sig = docs.withColumn("sig", array(
      coeffs.map { case (a, b) =>
        array_min(transform(col("hv"), h => pmod(h * a + b, lit(MinHashP))))
      }: _*))
    val banded = sig.select(
      col("doc_id"), col("sh"),
      posexplode(array((0 until bands).map { bd =>
        struct(lit(bd).as("band"),
          xxhash64(concat_ws(",",
            (0 until rowsPerBand).map(r => element_at(col("sig"), bd * rowsPerBand + r + 1)): _*))
            .as("bucket"))
      }: _*)))
      .select(col("doc_id"), col("sh"), col("col.band"), col("col.bucket"))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("jaccard",
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  // ---------------------------------------------------------------
  // SimHash near-dup
  // ---------------------------------------------------------------

  /** 64-bit SimHash of the token multiset: per bit, sum +1/-1 across
    * token hashes, pack sign bits. Computed with one explode +
    * 64 conditional sums (all codegen'd; no UDF). */
  def simHashes(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i")
    }
    toks.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 64).map { i =>
          when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(0L)
        }.reduce((x, y) => x.bitwiseOR(y)).as("simhash"))
  }

  /** SimHash near-dup: candidates collide on any of 4 16-bit bands
    * (finds all pairs within Hamming distance 3 by pigeonhole), then
    * exact Hamming verify via xor + bit_count. */
  def nearDupSimHash(spark: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    val sh = simHashes(spark, dir)
    val banded = sh.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(bd =>
        shiftright(col("simhash"), bd * 16).bitwiseAND(0xFFFFL)): _*)))
      .select(col("doc_id"), col("simhash"), col("pos").as("band"), col("col").as("bucket"))
    val a = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"), col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b")).distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  // ---------------------------------------------------------------
  // embedding-cosine near-dup
  // ---------------------------------------------------------------

  /** Embedding near-dup pairs, blocked on the cluster label (the
    * natural blocking key here; LSH hyperplane buckets are the
    * general-purpose key — see SimilarityOps.annTopK), verified with
    * the codegen'd CosineSimilarity kernel. */
  def nearDupEmbedding(spark: SparkSession, dir: String, threshold: Double = 0.35): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val a = e.select(col("label"), col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
    val b = e.select(col("label"), col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", round(cosineSimilarity(col("emb_a"), col("emb_b")), 4))
      .filter(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), col("label").cast("int").as("label"), col("cos"))
  }
}
