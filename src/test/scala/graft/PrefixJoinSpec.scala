package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.DedupOps

/** q219 prefix-filtered set-similarity join — the exact-recall
  * guarantee is the whole point, so it is proven two ways:
  * (1) against the brute-force all-pairs τ-Jaccard on real data
  * (equality, not containment: prefix filtering must drop NOTHING),
  * (2) against q25's probabilistic min-md5 blocking (⊇ — the 1-perm
  * MinHash can only miss pairs the prefix filter keeps).
  * Plus the filter's selectivity: prefixes must actually be shorter
  * than full posting lists (rare-first ordering does real work). */
class PrefixJoinSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}
  import spark.implicits._

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)].collect().toSet

  private lazy val prefix = DedupOps.prefixJoinNearDup(spark, sf).cache()

  test("recall is exact: equals brute-force all-pairs tau-Jaccard") {
    // brute force: every doc pair, same shingle sets, same exact keep
    val sets = Tables.documents(spark, sf)
      .select(col("doc_id"), DedupOps.shingles(col("text")).as("sh"))
    val a = sets.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val b = sets.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    val inter = size(array_intersect(col("sha"), col("shb")))
    // exact integer keep (inter*5 >= union*3), mirroring the operator:
    // the rounded display value is NOT the keep decision (ADVICE r17)
    val brute = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .filter(inter * lit(5L) >=
        (size(col("sha")) + size(col("shb")) - inter) * lit(3L))
      .select(col("doc_a"), col("doc_b"))
    assert(pairSet(prefix) == pairSet(brute))
  }

  test("superset of the min-md5 blocked pairs at the same threshold") {
    val blocked = DedupOps.nearDupNgram(spark, sf, threshold = 0.6)
    assert(pairSet(blocked).subsetOf(pairSet(prefix)))
  }

  test("jaccard values agree with q25 on the shared pairs") {
    val blocked = DedupOps.nearDupNgram(spark, sf, threshold = 0.6)
      .withColumnRenamed("jaccard", "j_blocked")
    val both = prefix.join(blocked, Seq("doc_a", "doc_b"))
      .filter(col("jaccard") =!= col("j_blocked"))
    assert(both.count() == 0)
  }

  test("prefix filtering prunes postings (prefix rows < total rows)") {
    // the prefix posting volume the candidate join shuffles must be a
    // strict subset of the full posting volume — at tau=3/5 each doc
    // keeps n - ceil(0.6 n) + 1 ~= 0.4 n shingles
    val total = Tables.documents(spark, sf)
      .select(explode(DedupOps.shingles(col("text"))))
      .count()
    val perDoc = Tables.documents(spark, sf)
      .select(col("doc_id"), size(DedupOps.shingles(col("text"))).as("n"))
      .select(sum(col("n") - expr("(3 * n + 4) div 5") + 1).as("p"))
      .as[Long].head()
    assert(perDoc < total, "prefixes must be shorter than posting lists")
    assert(perDoc.toDouble / total < 0.55,
      s"rare-first prefixes should keep ~0.4 of postings, got $perDoc/$total")
  }

  test("property: prefix join equals brute force on random word-soup corpora") {
    // scalacheck-generated corpora exercise shapes real data can't:
    // tiny docs (partial shingles), heavy duplication, near-empty
    // vocabularies — the prefix filter's recall guarantee must hold on
    // ALL of them, not just the fixture distribution
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val vocab = Vector("ab", "cd", "ef", "gh", "ij", "kl")
    val genDoc: Gen[String] = for {
      n <- Gen.chooseNum(1, 14)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    (1 to 4).foreach { trial =>
      val docs = Gen.listOfN(24, genDoc)
        .pureApply(Gen.Parameters.default, Seed(trial.toLong)).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }
      val dir = java.nio.file.Files.createTempDirectory(s"pfxp$trial").toString
      docs.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("t"))
        .withColumn("n_chars", length(col("text")))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val sets = Tables.documents(spark, dir)
        .select(col("doc_id"), DedupOps.shingles(col("text")).as("sh"))
      val inter = size(array_intersect(col("sha"), col("shb")))
      val brute = sets.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
        .crossJoin(sets.select(col("doc_id").as("doc_b"), col("sh").as("shb")))
        .filter(col("doc_a") < col("doc_b"))
        .filter(inter * lit(5L) >=
          (size(col("sha")) + size(col("shb")) - inter) * lit(3L))
        .select(col("doc_a"), col("doc_b"))
      assert(pairSet(DedupOps.prefixJoinNearDup(spark, dir)) == pairSet(brute),
        s"trial $trial: prefix join diverged from brute force")
    }
  }

  test("synthetic: a qualifying pair with DIFFERENT min-shingles is found") {
    // two 12-word docs sharing 9 of ~10 shingles but with distinct
    // minimum-md5 shingles would be invisible to 1-perm MinHash
    // blocking whenever the mins differ; prefix filtering must emit it
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val variant = base.replace(" mu", " nu")
    val docs = Seq((1L, base), (2L, variant))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val dir = java.nio.file.Files.createTempDirectory("pfx").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = DedupOps.prefixJoinNearDup(spark, dir)
    assert(pairSet(out) == Set((1L, 2L)))
  }
}
