package graft

import java.nio.file.Files

class DedupSpec extends SparkSpecBase {

  /** Planted corpus: 0/1 exact dups, 2/3 near dups (one word changed),
    * 4 unrelated, 5 a shuffled-token copy of 0 (same token set).
    */
  lazy val plantedDir: String = {
    val dir = Files.createTempDirectory("graft-docs").toString
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val near = base.replace("sigma", "SIGMA2")
    val docs = Seq(
      (0L, base, "en", base.length.toLong),
      (1L, base, "en", base.length.toLong),
      (2L, near, "en", near.length.toLong),
      (3L, base, "de", base.length.toLong),
      (4L, "totally different words nothing shared here at all by design " +
        "zero overlap with anything else whatsoever in this tiny corpus",
        "en", 120L),
      (5L, base.split(" ").reverse.mkString(" "), "en", base.length.toLong))
      .toDF("doc_id", "text", "lang", "n_chars")
    docs.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d01 exact dedup groups identical texts") {
    val rows = run("d01_dedup_exact", plantedDir).collect()
    // 0 and 1 identical, 3 identical to them too (same text, different lang)
    val dupGroup = rows.filter(_.getAs[Long]("dup_cnt") == 3)
    assert(dupGroup.length == 1)
    assert(dupGroup.head.getAs[Long]("keep_id") == 0L)
  }

  test("d02 fingerprint dedup is word-order-insensitive") {
    val rows = run("d02_dedup_fingerprint", plantedDir).collect()
    // 0,1,3,5 share the token set → one group of 4
    assert(rows.exists(r => r.getAs[Long]("dup_cnt") == 4 &&
      r.getAs[Long]("keep_id") == 0L))
  }

  test("d03 minhash-lsh surfaces the exact-dup pair as a candidate") {
    val pairs = run("d03_dedup_minhash_lsh", plantedDir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs.contains((0L, 1L))) // identical docs always collide
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L)) // unrelated doc stays out
  }

  test("d04 simhash: identical docs have hamming 0") {
    val rows = run("d04_dedup_simhash", plantedDir).collect()
    val h01 = rows.find(r => r.getAs[Long]("a_id") == 0L && r.getAs[Long]("b_id") == 1L)
    assert(h01.isDefined && h01.get.getAs[Long]("hamming") == 0L)
  }

  test("d05 jaccard finds planted near-dup with high score, same-lang only") {
    val rows = run("d05_ngram_jaccard", plantedDir).collect()
    val j = rows.map(r => ((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")),
      r.getAs[Double]("jaccard"))).toMap
    assert(j((0L, 1L)) == 1.0)
    assert(j.contains((0L, 2L)) && j((0L, 2L)) >= 0.5 && j((0L, 2L)) < 1.0)
    assert(!j.contains((0L, 3L))) // same text but different lang block
  }

  test("d08 groups are transitive: exact dups + a chained near-dup share one rep") {
    // planted: 0,1,3 identical text; 2 near-dup of 0 → component {0,1,2,3}
    // via transitivity; 4 unrelated and 5 (token-reversed: different
    // 3-gram shingles) never enter the pair graph
    val reps = run("d08_dedup_groups", plantedDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("group_rep")).toMap
    assert(reps.keySet == Set(0L, 1L, 2L, 3L))
    assert(reps.values.toSet == Set(0L))
  }

  test("d06b bucketed pairs = subset of exact d06 with identical cosines; recall documented") {
    def pairMap(name: String) = run(name).collect()
      .map(r => ((r.getAs[Long]("a_id"), r.getAs[Long]("b_id")),
        r.getAs[Double]("cos"))).toMap
    val exact = pairMap("d06_dedup_embedding")
    val lsh = pairMap("d06b_dedup_embedding_lsh")
    // precision is exact: every surviving pair passed the same cosine
    // verify, so values match d06 bit-for-bit
    assert(lsh.forall { case (k, v) => exact.get(k).contains(v) })
    val recall = lsh.size.toDouble / exact.size
    info(f"d06b recall at cos>=0.3: $recall%.3f (${lsh.size}/${exact.size})")
    // measured 0.79 on the synthetic corpus, whose 0.3 threshold sits
    // barely above the intra-label background — the worst case for
    // sign-LSH (see d06b scaladoc); at real near-dup thresholds (>=0.9)
    // bucket recall approaches 1. Floor leaves margin for float wobble.
    assert(recall >= 0.60)
  }

  test("d06 embedding near-dups on real sf data stay within label blocks") {
    val e = Tables(spark, sf, "embeddings")
    val labels = e.select("vec_id", "label").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val rows = run("d06_dedup_embedding").collect()
    assert(rows.forall(r =>
      labels(r.getAs[Long]("a_id")) == labels(r.getAs[Long]("b_id"))))
  }
}
