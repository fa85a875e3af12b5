package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Text-analysis operator semantics on crafted documents. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token, punctuation and stopword counting") {
    val r = Seq("The quick fox, and the lazy dog!").toDF("t").select(
      TextAnalysis.tokenCount(col("t")).as("tok"),
      TextAnalysis.punctCount(col("t")).as("punct"),
      TextAnalysis.stopwordCount(col("t")).as("stop")).head()
    r.getAs[Int]("tok") shouldBe 7
    r.getAs[Int]("punct") shouldBe 2 // comma + bang
    r.getAs[Int]("stop") shouldBe 3  // the, and, the
  }

  test("subword count: long words split into ~4-char pieces") {
    val r = Seq(("cat", 1L), ("catamaran", 3L), ("a b", 2L))
      .toDF("t", "want")
      .select(TextAnalysis.subwordCount(col("t")).as("n"), col("want"))
      .collect()
    // "cat"(3) → 1; "catamaran"(9) → 1 + floor(8/4) = 3; "a b" → 2
    r.foreach(row => row.getAs[Long]("n") shouldBe row.getAs[Long]("want"))
  }

  test("mean word length over normalized tokens") {
    Seq("ab abcd").toDF("t")
      .select(TextAnalysis.meanWordLen(col("t"))).as[Double].head() shouldBe 3.0
  }

  test("quality score is bounded in [0,1] and orders junk below prose") {
    val df = Seq(
      "The cat sat on the mat and it was happy with that for a while.",
      "!!! ??? ;;; ::: ,,, ...",
      "x").toDF("t")
      .select(TextAnalysis.qualityScore(col("t")).as("q"))
    val qs = df.as[Double].collect()
    qs.foreach(q => assert(q >= 0.0 && q <= 1.0, s"q=$q out of range"))
    qs(0) should be > qs(1)
    qs(0) should be > qs(2)
  }

  test("language ID picks the language with most marker hits") {
    val r = Seq(
      "the cat and the dog of it",
      "der hund und die katze ist nicht hier",
      "le chat et la maison est une belle",
      "el gato es una casa con los perros",
      "zzz qqq www").toDF("t")
      .select(TextAnalysis.langId(col("t")).as("l")).as[String].collect()
    r shouldBe Array("en", "de", "fr", "es", "und")
  }

  test("fingerprint: stable under duplication, sensitive to content") {
    val r = Seq(
      "one two three four five six seven eight",
      "one two three four five six seven eight",
      "nine ten eleven twelve thirteen fourteen fifteen sixteen").toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("fp")).as[Long].collect()
    r(0) shouldBe r(1)
    r(0) should not be r(2)
  }

  test("PII masking replaces emails, URLs and long digit runs") {
    // the fixture corpus contains no PII patterns (the oracle proves
    // the no-op path), so the positive path is pinned here
    val masked = Seq(
      "contact Jane.Doe+spam@example.co.uk for details",
      "see https://example.com/a?b=1 and http is fine",
      "card 4111111122223333 expires 12/27",
      "short 123 stays, 99999 goes").toDF("t")
      .select(TextAnalysis.maskPii(col("t")).as("m")).as[String].collect()
    masked(0) shouldBe "contact <EMAIL> for details"
    masked(1) shouldBe "see <URL> and http is fine"
    masked(2) shouldBe "card <NUM> expires 12/27"
    masked(3) shouldBe "short 123 stays, <NUM> goes"
  }

  test("repetition score: repeated phrase near 1, unique prose near 0") {
    val r = Seq(
      "spam spam spam spam spam spam spam spam spam spam",
      "each word here is completely unique in this sentence")
      .toDF("t")
      .select(TextAnalysis.repetitionScore(col("t"), 3).as("rep"))
      .as[Double].collect()
    r(0) should be > 0.8
    r(1) shouldBe 0.0
  }

  test("bm25 weight: tf saturates, length normalizes, rarity dominates") {
    // The three properties that make BM25 BM25, pinned on the exact
    // integer weight (n = 1000 docs, avgdl = 50 tokens):
    def w(tf: Long, df: Long, dl: Long): Long =
      Seq((tf, df, dl)).toDF("tf", "df", "dl")
        .select(TextAnalysis.bm25Weight(col("tf"), col("df"), col("dl"),
          n = 1000, avgdl = 50).as("w"))
        .as[Long].head()
    // (1) tf saturation: increasing, but with strictly decreasing
    // marginal gain — and bounded by the k1+1 asymptote
    val tfw = Seq(1L, 2L, 4L, 8L, 16L).map(w(_, 10, 50))
    tfw shouldBe sorted
    val gains = tfw.sliding(2).map { case Seq(a, b) => b - a }.toSeq
    gains.sliding(2).foreach { case Seq(g1, g2) => g2 should be < g1 }
    // asymptote: w(tf→∞) = idf · (k1+1) · 1000; at tf=1000 we're under it
    val idfTimes2200 = (2L * 1000 - 2 * 10 + 1) * 2200 * 1000 / ((2 * 10 + 1) * 1000)
    w(1000, 10, 50) should be <= idfTimes2200
    // (2) length normalization: same tf in a longer document is worth less
    w(5, 10, 200) should be < w(5, 10, 50)
    // (3) rarity: rarer terms weigh more at equal tf and length
    w(5, 5, 50) should be > w(5, 100, 50)
  }

  test("LM gate admits the target language at the top rate (the CCNet property)") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("curate_lm_gate")(spark, d)
      .as[(String, Long, Long)].collect()
    rows.map(_._1).toSet should contain("en")
    val rates = rows.map { case (l, n, k) => l -> (k.toDouble / n) }.toMap
    // the model trained on the en slice must admit en above every other
    // language — the in-distribution selection the recipe exists for
    rates.filter(_._1 != "en").foreach { case (l, r) =>
      withClue(s"en admission must beat $l: ") { rates("en") should be > r }
    }
    // the gate actually gates: both admitted and rejected are populated
    rows.map(_._3).sum should be > 0L
    rows.map { case (_, n, k) => n - k }.sum should be > 0L
  }

  test("ratio gate separates languages AND reorders within the target language") {
    val d = "/root/testdata/sf0.001"
    // (1) the per-language separation survives the background division
    val rows = SparkEntry.queries("curate_lm_ratio_gate")(spark, d)
      .as[(String, Long, Long)].collect()
    rows.map(_._1).toSet should contain("en")
    val rates = rows.map { case (l, n, k) => l -> (k.toDouble / n) }.toMap
    rates.filter(_._1 != "en").foreach { case (l, r) =>
      withClue(s"en admission must beat $l: ") { rates("en") should be > r }
    }
    rows.map(_._3).sum should be > 0L
    rows.map { case (_, n, k) => n - k }.sum should be > 0L
    // (2) WITHIN en the ratio ranks documents differently than the
    // target-only score — the background term is doing real work
    // (cancelling frequent-everywhere mass), not rescaling: at least
    // one pair of en documents must swap order between the two
    // rankings (both per-bigram normalized, cross-multiplied exactly)
    val sc = SparkEntry.queries("text_lm_ratio_score")(spark, d)
      .as[(Long, String, Long, Long, Long)].collect()
      .filter(_._2 == "en").map { case (id, _, n, t, bg) => (id, n, t, t - bg) }
    val swapped = sc.combinations(2).exists { case Array(a, b) =>
      // a ranks above b by target iff t_a/n_a > t_b/n_b
      val byTarget = a._3 * b._2 - b._3 * a._2
      val byRatio = a._4 * b._2 - b._4 * a._2
      byTarget.sign * byRatio.sign < 0
    }
    withClue("ratio vs target-only must disagree on some en pair: ") {
      swapped shouldBe true
    }
  }

  test("NB gate admits en at the top rate and disagrees with the ratio gate on a slice") {
    val d = "/root/testdata/sf0.001"
    // (1) the classifier-as-gate property: the argmax admission keeps
    // en above every other language (the fastText-gate role)
    val rows = SparkEntry.queries("curate_nb_gate")(spark, d)
      .as[(String, Long, Long)].collect()
    rows.map(_._1).toSet should contain("en")
    val rates = rows.map { case (l, n, k) => l -> (k.toDouble / n) }.toMap
    rates.filter(_._1 != "en").foreach { case (l, r) =>
      withClue(s"en admission must beat $l: ") { rates("en") should be > r }
    }
    rows.map(_._3).sum should be > 0L
    rows.map { case (_, n, k) => n - k }.sum should be > 0L
    // (2) the NB argmax gate and the LM ratio gate are DIFFERENT
    // filters, not restatements: they must disagree on at least one
    // document (winner-take-all vs mean-threshold semantics)
    val (num, den) = graft.queries.TextQueries.lmRatioThreshold
    val ratioKept = SparkEntry.queries("text_lm_ratio_score")(spark, d)
      .as[(Long, String, Long, Long, Long)].collect()
      .filter { case (_, _, n, t, bg) => den * (t - bg) >= num * n }
      .map(_._1).toSet
    val nbKept = SparkEntry.queries("text_nb_score")(spark, d)
      .as[(Long, String, Long, String, Long)].collect()
      .filter(_._4 == "en").map(_._1).toSet
    withClue("NB argmax and LM ratio gates must disagree somewhere: ") {
      (ratioKept != nbKept) shouldBe true
    }
    // (3) the classifier is a real classifier: overall argmax accuracy
    // beats the 'always predict the majority class' baseline
    val sc = SparkEntry.queries("text_nb_score")(spark, d)
      .as[(Long, String, Long, String, Long)].collect()
    val acc = sc.count(r => r._4 == r._2).toDouble / sc.length
    val majority = sc.groupBy(_._2).values.map(_.length).max.toDouble / sc.length
    withClue(s"NB accuracy $acc must beat majority baseline $majority: ") {
      acc should be > majority
    }
  }

  test("LM weights are the quarter-bit staircase of the smoothed ratio") {
    // wbits = length(bin(x^4)) with x = (c12+1)*4096 div (c1+256):
    // monotone in c12 at fixed c1, anti-monotone in c1 at fixed c12,
    // floored at 1 (x = 0), and bounded by 49 bits (x <= 4096 by c12 <= c1)
    def wb(c12: Long, c1: Long): Long = {
      val x = expr("((c12 + 1) * 4096) DIV (c1 + 256)")
      val x4: org.apache.spark.sql.Column = x * x * x * x
      Seq((c12, c1)).toDF("c12", "c1")
        // qualified: ScalaTest's Matchers.length shadows functions.length
        .select(org.apache.spark.sql.functions.length(
            org.apache.spark.sql.functions.bin(x4))
          .cast("long").as("w"))
        .as[Long].head()
    }
    wb(0, 1000000) shouldBe 1L // unseen bigram in a huge context
    Seq(0L, 10L, 100L, 1000L).map(wb(_, 1000)) shouldBe sorted
    wb(50, 100) should be > wb(50, 10000)
    wb(1000000, 1000000) should be <= 49L
  }

  private val d = "/root/testdata/sf0.001"

  test("count-min sketch: each row's cells sum to the occurrence total") {
    // every token occurrence lands in exactly one bucket per row, so a
    // row's counters must partition N — the conservation law that makes
    // per-partition sketches mergeable by cell-wise addition
    val n = graft.ingest.Tables.documents(spark, d)
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))))
      .count()
    val rowSums = graft.SparkEntry.queries("corpus_cms_build")(spark, d)
      .groupBy(col("r")).agg(sum(col("c")).as("s"))
      .select(col("s")).as[Long].collect()
    rowSums.length shouldBe 4
    rowSums.foreach(_ shouldBe n)
  }

  test("count-min estimates never underestimate and collisions only add") {
    val rows = graft.SparkEntry.queries("corpus_cms_topk")(spark, d).collect()
    rows.length shouldBe 20
    rows.foreach { r =>
      r.getAs[Boolean]("no_underestimate") shouldBe true
      r.getAs[Long]("overcount") should be >= 0L
      r.getAs[Long]("est_cnt") shouldBe
        r.getAs[Long]("true_cnt") + r.getAs[Long]("overcount")
    }
  }

  test("quantile sketch serves the exact order statistic's bucket at every q") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("corpus_qhist_quantiles")(spark, d)
      .orderBy("q_bp").collect()
      .map(r => (r.getAs[Long]("q_bp"), r.getAs[Long]("est_bucket"),
        r.getAs[Long]("exact_bucket"), r.getAs[Long]("in_bucket")))
    rows.map(_._1) shouldBe Array(2500L, 5000L, 7500L, 9000L, 9900L)
    withClue(s"quantile rows ${rows.mkString(", ")}: ") {
      all(rows.map(_._4)) shouldBe 1L // the lossless-at-bucket guarantee
      rows.foreach { case (_, est, exact, _) => est shouldBe exact }
      // buckets are nondecreasing in q — a broken cumulative walk bends this
      rows.map(_._2).sliding(2).foreach { case Array(a, b) => b should be >= a }
    }
    // and the sketch's cells cover the corpus exactly once
    val cells = graft.SparkEntry.queries("corpus_qhist")(spark, d).collect()
    cells.map(_.getAs[Long]("cnt")).sum shouldBe
      graft.ingest.Tables.documents(spark, d).count()
  }

  test("PMI collocations: counts nest and lift is the exact count ratio") {
    val d = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("corpus_pmi")(spark, d).collect()
    rows should not be empty
    // total token mass N is recoverable from any row's exact operands:
    // lift9 = round(cxy·N/(cx·cy), 9) — recompute and compare
    val toks = graft.ingest.Tables.documents(spark, d)
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("t"))
    val n = toks.count()
    rows.foreach { r =>
      val (cxy, cx, cy) = (r.getAs[Long]("cxy"), r.getAs[Long]("cx"),
        r.getAs[Long]("cy"))
      cxy should be >= 5L // the support floor
      cxy should be <= math.min(cx, cy) // a pair can't outnumber its parts
      val lift = BigDecimal(cxy.toDouble * n.toDouble / (cx.toDouble * cy.toDouble))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      r.getAs[Double]("lift9") shouldBe lift +- 1e-9
    }
  }

  test("gate agreement: cells partition the corpus, marginals match the gates, kappa is exact") {
    val d = "/root/testdata/sf0.01"
    val r = SparkEntry.queries("curate_gate_agreement")(spark, d).collect()(0)
    val (n, lmK, nbK) = (r.getAs[Long]("n_docs"),
      r.getAs[Long]("lm_kept"), r.getAs[Long]("nb_kept"))
    val (a, b, c, dd) = (r.getAs[Long]("both_keep"), r.getAs[Long]("lm_only"),
      r.getAs[Long]("nb_only"), r.getAs[Long]("neither"))
    // the four cells partition the corpus and the marginals are sums
    a + b + c + dd shouldBe n
    lmK shouldBe a + b
    nbK shouldBe a + c
    // marginals equal the standalone gate manifests' totals — the
    // fused pass admits exactly what the separate gates admit
    def keptTotal(q: String) =
      SparkEntry.queries(q)(spark, d).agg(sum(col("n_kept"))).collect()(0).getLong(0)
    keptTotal("curate_lm_ratio_gate") shouldBe lmK
    keptTotal("curate_nb_gate") shouldBe nbK
    // kappa recomputed from the cells — the row's double is the single
    // IEEE division of the two exact int64 polynomials
    val x = (a + b) * (a + c) + (c + dd) * (b + dd)
    r.getAs[Double]("kappa") shouldBe
      (n * (a + dd) - x).toDouble / (n * n - x).toDouble
    r.getAs[Long]("agree_bp") shouldBe 10000L * (a + dd) / n
    // on this fixture the gates genuinely agree beyond chance but are
    // NOT redundant — the audit's reason to exist
    r.getAs[Double]("kappa") should (be > 0.0 and be < 1.0)
  }

  test("calibrated ratio gate: theta replays as the exact order statistic, gate stays interior") {
    val d = "/root/testdata/sf0.001"
    // (1) calibration replay: theta is the k-th smallest fixed-point
    // ratio key over the en slice — brute-forced here with the
    // constants spelled out (2^20 scale, 64·2^20 offset), so a drifted
    // CalibQ/CalibOff/rank formula fails loud
    val th = SparkEntry.queries("text_lm_calib_theta")(spark, d).collect()(0)
    val (theta, k, nTrain) = (th.getAs[Long]("theta"),
      th.getAs[Long]("k"), th.getAs[Long]("n_train"))
    val qks = SparkEntry.queries("text_lm_ratio_score")(spark, d)
      .filter(col("lang") === "en" && col("n_bigrams") > 0)
      .selectExpr(
        "(1048576 * (lp_t - lp_bg) + 67108864 * n_bigrams) div n_bigrams")
      .as[Long].collect().sorted
    nTrain shouldBe qks.length.toLong
    k shouldBe math.max(1L, qks.length / 10)
    theta shouldBe qks((k - 1).toInt)
    // (2) the gate is strictly interior (the r13 saturation finding:
    // a fixed rational admitted 100 % at sf0.1; an order statistic
    // rejects at least the k−1 training docs below theta at any scale)
    val gate = SparkEntry.queries("curate_lm_calib_gate")(spark, d).collect()
    val total = gate.map(_.getAs[Long]("n_total")).sum
    val kept = gate.map(_.getAs[Long]("n_kept")).sum
    kept should be > 0L
    kept should be < total
    // (3) the target language is admitted at the top rate, ≈ 90 % by
    // construction (1 − 1/RankDen of the slice, ties admit upward)
    val en = gate.find(_.getAs[String]("lang") == "en").get
    val enRate = en.getAs[Long]("n_kept").toDouble / en.getAs[Long]("n_total")
    enRate should be >= 0.85
    gate.filter(_.getAs[String]("lang") != "en").foreach { r =>
      enRate should be >=
        (r.getAs[Long]("n_kept").toDouble / r.getAs[Long]("n_total"))
    }
    // (4) the calibrated agreement row's lm marginal is this gate's
    // admission, and kappa is meaningful (nondegenerate) here
    val ag = SparkEntry.queries("curate_gate_agreement_cal")(spark, d)
      .collect()(0)
    ag.getAs[Long]("lm_kept") shouldBe kept
    ag.getAs[Double]("kappa") should (be > 0.0 and be < 1.0)
  }

  test("NB score bands partition the admitted set and carry exact precision") {
    val d = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("curate_nb_bands")(spark, d).collect()
    rows should not be empty
    var total = 0L
    rows.foreach { r =>
      val (band, n, t) = (r.getAs[Long]("band"),
        r.getAs[Long]("n_admitted"), r.getAs[Long]("n_true_en"))
      band should (be >= 0L and be <= 20L)
      t should be <= n
      r.getAs[Double]("precision") shouldBe t.toDouble / n.toDouble
      total += n
    }
    // the bands cover the admitted set exactly — nothing dropped by the
    // map-only banding
    val admitted = SparkEntry.queries("text_nb_score")(spark, d)
      .filter(col("pred_lang") === "en" && col("n_bigrams") > 0).count()
    total shouldBe admitted
    // the precision CURVE carries signal on this fixture: some band
    // beats the pooled admission precision, so score thresholding is a
    // real knob (the row's reason to exist)
    val pooled = rows.map(_.getAs[Long]("n_true_en")).sum.toDouble /
      rows.map(_.getAs[Long]("n_admitted")).sum.toDouble
    rows.filter(_.getAs[Long]("n_admitted") >= 20)
      .map(_.getAs[Double]("precision")).max should be > pooled
  }
}
