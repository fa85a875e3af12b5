package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.operators.Dedup

/** Dedup operator semantics on crafted corpora: exact groups, shingling,
  * MinHash/LSH candidate pruning + recall, SimHash locality. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("normalize collapses whitespace and case") {
    val got = Seq("  Hello   WORLD \t x ").toDF("t")
      .select(Dedup.normalize(col("t"))).as[String].head()
    got shouldBe "hello world x"
  }

  test("exactGroups: keeper is min id, copies counted") {
    val docs = Seq(
      (10L, "The quick fox"), (20L, "the  QUICK fox"), (30L, "other text"))
      .toDF("doc_id", "text")
    val g = Dedup.exactGroups(docs, "doc_id", "text").collect()
    g.length shouldBe 2
    val dup = g.find(_.getAs[Long]("n_copies") == 2L).get
    dup.getAs[Long]("keeper_id") shouldBe 10L
  }

  test("shingles: distinct word n-grams; short docs fall back to whole text") {
    val df = Seq("a b c d", "a b").toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("sh"))
    val rows = df.as[Seq[String]].collect()
    rows(0) should contain theSameElementsAs Seq("a b c", "b c d")
    rows(1) shouldBe Seq("a b")
  }

  test("jaccard on shingle sets") {
    val j = Seq(("a b c", "b c d")).toDF("x", "y")
      .select(Dedup.jaccard(
        Dedup.shingles(col("x"), 1), Dedup.shingles(col("y"), 1)))
      .as[Double].head()
    j shouldBe 0.5 // {b,c} / {a,b,c,d}
  }

  test("nearDuplicates finds planted near-dup pairs and prunes the rest") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base + " lambda"),            // jaccard 10/11 ≈ 0.91
      (3L, "one two three four five"),
      (4L, "totally different words here entirely six")).toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
      n = 1, k = 12, bands = 4, threshold = 0.8).collect()
    pairs.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet shouldBe Set((1L, 2L))
    pairs.head.getAs[Double]("jaccard") shouldBe (10.0 / 11.0)
  }

  test("prefixJaccardPairs is exhaustive: identical pairs to brute force") {
    // seeded corpus with planted near-dups at several overlap levels —
    // the prefix filter must lose NOTHING relative to all-pairs
    val rnd = new scala.util.Random(7)
    val vocab = Vector.tabulate(40)(i => s"w$i")
    val bases = Seq.tabulate(12)(_ =>
      Seq.fill(14)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val docs = (bases.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      bases.take(5).zipWithIndex.map { case (t, i) =>
        ((100 + i).toLong, t + " extraword") // high-overlap variants
      }).toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.hashedShingles(col("text"), 1).as("sh"))

    def pairSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        math.round(r.getAs[Double]("jaccard") * 1e9))).toSet

    val brute = docs.as("x").join(docs.as("y"),
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        Dedup.jaccardSorted(col("x.sh"), col("y.sh")).as("jaccard"))
      .filter(col("jaccard") >= 0.6)
    val prefix = Dedup.prefixJaccardPairs(docs, "doc_id", "sh", 0.6)

    pairSet(prefix) shouldBe pairSet(brute)
    pairSet(prefix) should not be empty
  }

  test("LSH candidate generation never pairs identical-signature docs apart") {
    // identical docs must share every band → always candidates
    val docs = Seq((1L, "same words here"), (2L, "same words here"))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id").as("__id"),
      Dedup.hashedShingles(col("text"), 1).as("__sh"))
    val signed = Dedup.withMinhashSignature(sh, "__sh", 12)
    Dedup.candidatePairs(signed, "__id", 4, 3).count() shouldBe 1
  }

  test("bucketCap bounds candidates on a pathological (all-identical) corpus") {
    // 40 identical docs: every doc lands in the same bucket for every
    // band — uncapped, that is 40·39/2 = 780 pairs; with cap 8 each
    // band keeps ids 1..8, so exactly 8·7/2 = 28 distinct pairs emerge
    // no matter how large the corpus grows.
    val docs = (1L to 40L).map(i => (i, "same words every time"))
      .toDF("doc_id", "text")
    val sh = docs.select(col("doc_id").as("__id"),
      Dedup.hashedShingles(col("text"), 1).as("__sh"))
    val signed = Dedup.withMinhashSignature(sh, "__sh", 12)
    Dedup.candidatePairs(signed, "__id", 4, 3).count() shouldBe 780L
    val capped = Dedup.candidatePairs(signed, "__id", 4, 3, bucketCap = 8)
    capped.count() shouldBe 28L
    // the kept members are the cap lowest ids
    capped.agg(max(col("b"))).as[Long].head() shouldBe 8L
  }

  test("blockedJaccardPairs: same-block pairs found, cap bounds the block") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, "s1", base), (2L, "s1", base + " lambda"),
      (3L, "s2", base), // same text, different block → never paired
      (4L, "s1", "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "source", "text")
      .select(col("doc_id"), col("source"),
        Dedup.hashedShingles(col("text"), 1).as("sh1"))
    val pairs = Dedup.blockedJaccardPairs(docs, "doc_id", "source", "sh1",
      band = 8, cap = 64, threshold = 0.5)
    pairs.collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet shouldBe
      Set((1L, 2L))
    // cap = 1 keeps a single doc per block → no pairs at all
    Dedup.blockedJaccardPairs(docs, "doc_id", "source", "sh1",
      band = 8, cap = 1, threshold = 0.0).count() shouldBe 0L
  }

  test("connected components: transitive chains collapse, components stay apart") {
    // chain 1-2-3-4 (no direct 1-4 edge), pair 10-11, pair 20-21
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 20L))
      .toDF("a", "b")
    val got = graft.operators.ConnectedComponents.run(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L)
    // deterministic under different partitioning
    val got2 = graft.operators.ConnectedComponents.run(edges.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    got2 shouldBe got
  }

  test("simhash16: identical texts agree; disjoint vocabularies differ") {
    val vals = Seq("alpha beta gamma", "alpha beta gamma", "xx yy zz qq")
      .toDF("t").select(Dedup.simhash16(col("t")).as("s")).as[Long].collect()
    vals(0) shouldBe vals(1)
    vals(0) should not be vals(2)
    vals.foreach(v => assert(v >= 0L && v < 65536L))
  }

  test("portable hash: hash60 equals driver-side MD5 computation") {
    val got = Seq("hello").toDF("s")
      .select(PortableHash.hash60(col("s"))).as[Long].head()
    got shouldBe PortableHash.seedLong("hello")
    // affine constants are in-range
    (0 until 12).foreach { i =>
      PortableHash.constantA(i) should (be >= 1L and be < PortableHash.P)
      PortableHash.constantB(i) should (be >= 0L and be < PortableHash.P)
    }
  }

  test("DSIR importance: target-language documents outscore the rest") {
    // The operator's purpose: documents resembling the target (en)
    // distribution carry higher per-feature importance than the rest.
    // The fixture is near-vocabulary-shared word salad, so the margin
    // is small — but the DIRECTION is determined by the fixture's en
    // n-gram skew and holds at both sf0.001 and sf0.01 (measured
    // 1002.5 vs 999.7 per-feature at sf0.001). Sanity floor: every
    // score positive (smoothing guarantees r_b >= floor(1000/Nt) >= 0
    // and every doc has >= 1 feature).
    val d = "/root/testdata/sf0.001"
    val scored = graft.SparkEntry.queries("curate_dsir_weights")(spark, d)
    val byLang = scored.join(
        graft.ingest.Tables.documents(spark, d).select("doc_id", "lang"),
        "doc_id")
      .groupBy(col("lang") === "en")
      .agg(avg(col("imp_score").cast("double") / col("n_feats")))
      .as[(Boolean, Double)].collect().toMap
    withClue(s"per-feature importance by (is_en): $byLang: ") {
      byLang(true) should be > byLang(false)
    }
    scored.filter(col("imp_score") <= 0 || col("n_feats") <= 0)
      .count() shouldBe 0L
  }

  test("pipeline capstone: six stages compose into a populated, strict manifest") {
    val d = "/root/testdata/sf0.001"
    val man = graft.SparkEntry.queries("curate_pipeline")(spark, d)
      .as[(String, String, Long, Long)].collect()
    man should not be empty
    // split tags come only from the shared "|split" hash arithmetic
    man.map(_._2).toSet.subsetOf(Set("train", "val", "test")) shouldBe true
    man.foreach { case (src, split, nd, nt) =>
      withClue(s"($src, $split): ") { nd should be > 0L; nt should be > 0L }
    }
    // the pipeline must strictly filter: the quality quartile alone
    // caps survivors near 25 % of the corpus, and the LM gate +
    // semantic drop + resampler cut further — a manifest at or above
    // a quarter of the corpus means a gate silently stopped gating
    val total = man.map(_._3).sum
    val corpus = graft.ingest.Tables.documents(spark, d).count()
    total should be > 0L
    total should be < corpus / 4
  }

  test("classifier-gated capstone restricts admission and changes the selection") {
    // sf0.01: the scale where the NB stage rejects documents the ratio
    // gate passed (at sf0.001 the two gates' rejections coincide)
    val d = "/root/testdata/sf0.01"
    def manifest(q: String) = graft.SparkEntry.queries(q)(spark, d)
      .as[(String, String, Long, Long)].collect()
    val base = manifest("curate_pipeline")
    val cls = manifest("curate_pipeline_cls")
    cls should not be empty
    // the theorem: the cls survivor pool is a SUBSET of the base pool,
    // and the systematic resampler's pick count is floor(W/step) —
    // monotone in total surviving weight — so the composed gate can
    // never ADMIT more documents than the base capstone
    cls.map(_._3).sum should be <= base.map(_._3).sum
    // ...and on this fixture it measurably changes the selection
    // (different survivors -> different token totals), proving the
    // composed stage is live, not a no-op restatement of stage 3
    cls.map(_._4).sum should not be base.map(_._4).sum
  }

  test("band sweep traces the LSH precision/recall frontier monotonically") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("dedup_band_sweep")(spark, d)
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect()
      .sortBy(_._1)
    rows.map(_._1) shouldBe Array(2L, 3L, 4L, 6L)
    // one shared exhaustive truth set; hits bounded by both sides
    rows.map(_._3).toSet.size shouldBe 1
    rows.head._3 should be > 0L
    rows.foreach { case (b, r, nTruth, nCand, nHit, prec, recall) =>
      withClue(s"bands=$b: ") {
        b * r shouldBe 12L
        nHit should be <= nCand
        nHit should be <= nTruth
        prec shouldBe nHit.toDouble / nCand
        recall shouldBe nHit.toDouble / nTruth
      }
    }
    // the s-curve direction: more bands -> recall rises, precision falls
    rows.map(_._7).sliding(2).foreach { case Array(a, b) => b should be >= a }
    rows.map(_._6).sliding(2).foreach { case Array(a, b) => b should be <= a }
  }
}
