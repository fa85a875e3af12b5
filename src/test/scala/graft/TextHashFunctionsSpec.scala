package graft

import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextHashFunctions}
import graft.operators.Dedup

/** The native text-hash expressions must be BIT-IDENTICAL to the
  * composable Spark forms they replace — every DuckDB oracle downstream
  * depends on it. Pinned here on the real fixture corpus plus edge
  * shapes (short docs, single token, repeated tokens). */
class TextHashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.ingest.Tables
    .documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), col("text"))
    .unionByName(Seq(
      (100001L, "one"), (100002L, "a b"), (100003L, "x x x x x x"),
      (100004L, "Short  DOC with   Mixed  spacing"))
      .toDF("doc_id", "text"))

  private def tokens = split(Dedup.normalize(col("text")), " ")

  test("shingleStrings == array_distinct(transform(sequence, join(slice)))") {
    for (n <- Seq(1, 2, 3, 5)) {
      val w = tokens
      val classic = array_distinct(
        when(org.apache.spark.sql.functions.size(w) >= n,
          transform(sequence(lit(1), org.apache.spark.sql.functions.size(w) - lit(n - 1)),
            i => array_join(slice(w, i, lit(n)), " ")))
          .otherwise(array(array_join(w, " "))))
      val diff = docs.select(
        TextHashFunctions.shingleStrings(w, n).as("native"),
        classic.as("classic"))
        .filter(col("native") =!= col("classic"))
      withClue(s"n=$n: ") { diff.count() shouldBe 0L }
    }
  }

  test("hashedShingles60 == array_sort(transform(shingles, hash60))") {
    for (n <- Seq(1, 2, 5)) {
      val composable = array_sort(
        transform(Dedup.shingles(col("text"), n), s => PortableHash.hash60(s)))
      val diff = docs.select(
        TextHashFunctions.hashedShingles60(tokens, n).as("native"),
        composable.as("classic"))
        .filter(col("native") =!= col("classic"))
      withClue(s"n=$n: ") { diff.count() shouldBe 0L }
    }
  }

  test("minhashSig == k x array_min(transform(affine))") {
    val k = 12
    val hashed = TextHashFunctions.hashedShingles60(tokens, 1)
    val classicCols = (0 until k).map(i =>
      array_min(transform(hashed, h => PortableHash.affine(h, i))))
    val diff = docs.select(
      TextHashFunctions.minhashSig(hashed, k).as("native"),
      array(classicCols: _*).as("classic"))
      .filter(col("native") =!= col("classic"))
    diff.count() shouldBe 0L
  }

  test("native simhash16 == per-bit aggregate votes") {
    val hs = transform(tokens, w => PortableHash.hash60(w))
    val bits = (0 until 16).map { b =>
      val vote = aggregate(hs, lit(0L),
        (acc, h) => acc + (pmod(shiftright(h, b), lit(2L)) * 2L - 1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    val diff = docs.select(
      TextHashFunctions.simhash16(tokens).as("native"),
      bits.reduce(_ + _).as("classic"))
      .filter(col("native") =!= col("classic"))
    diff.count() shouldBe 0L
  }

  test("hash60 helper == conv(substring(md5,1,15),16,10)") {
    val strs = Seq("", "a", "hello world", "the quick brown fox")
    val fromSql = strs.toDF("s")
      .select(PortableHash.hash60(col("s"))).as[Long].collect()
    strs.zip(fromSql).foreach { case (s, expected) =>
      TextHashFunctions.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) shouldBe expected
    }
  }

  test("native weightedBucketSum == aggregate/element_at fold") {
    // non-uniform 64-entry weights: bucket b weighs (b*37) % 101
    val weights = (0 until 64).map(b => ((b * 37) % 101).toLong)
    val rl = typedlit(weights)
    val gs = TextHashFunctions.hashedShingles60(tokens, 2)
    val classic = aggregate(gs, lit(0L), (acc, g) =>
      acc + element_at(rl, (pmod(g, lit(64L)) + 1).cast("int")))
    val diff = docs.select(
      TextHashFunctions.weightedBucketSum(gs, rl).as("native"),
      classic.as("classic"))
      .filter(col("native") =!= col("classic"))
    diff.count() shouldBe 0L
  }

  test("native lmScoreBits == bucket/zip_with/aggregate fold (incl. edge docs)") {
    // a small deterministic grid: entry g holds g % 7 + 1, so any
    // off-by-one in the b1*256+b2 indexing shows up as a value diff
    val grid = (0 until 65536).map(g => (g % 7 + 1).toLong)
    val wl = typedlit(grid)
    // edge docs: empty, single-token (no bigrams), repeated tokens
    val texts = Seq("", "one", "a a a a", "the quick brown fox jumps",
      "x y x y x", "punctuated, text! with? tokens.")
    // qualified: ScalaTest's Matchers.size shadows functions.size
    val fsize = (c: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.functions.size(c)
    val toks = split(Dedup.normalize(col("t")), " ")
    val bs = transform(toks,
      w => pmod(PortableHash.hash60(w), lit(256L)))
    val gs = zip_with(slice(bs, lit(1), fsize(bs) - 1),
      slice(bs, lit(2), fsize(bs) - 1), (a, b) => a * 256 + b)
    val classic = aggregate(gs, lit(0L), (acc, g) =>
      acc + element_at(wl, (g + 1).cast("int")))
    val diff = (texts.toDF("t") union
        graft.ingest.Tables.documents(spark, "/root/testdata/sf0.001")
          .select(col("text").as("t")))
      .select(TextHashFunctions.lmScoreBits(toks, wl).as("native"),
        classic.as("classic"),
        (fsize(toks) - 1).cast("long").as("n_native"),
        fsize(gs).cast("long").as("n_classic"))
      .filter(col("native") =!= col("classic") ||
        col("n_native") =!= col("n_classic"))
    diff.count() shouldBe 0L
    // the gates' clamped n_bigrams (r13 advice): greatest(|toks|−1, 0)
    // must equal the oracle's len(gs) on every edge doc — never −1,
    // which would flip the negative-numerator ratio gate's verdict
    val clampDiff = texts.toDF("t")
      .select(greatest(fsize(toks) - 1, lit(0)).cast("long").as("nb"),
        fsize(gs).cast("long").as("ng"))
      .filter(col("nb") =!= col("ng") || col("nb") < 0)
    clampDiff.count() shouldBe 0L
  }

  test("native nbArgmaxBits == per-class lmScoreBits folds + greatest(struct)") {
    // the one-pass multi-class scorer (hash each token ONCE, fold all
    // grids over the shared bucket sequence, argmax inline) must
    // reproduce the composable form — |classes| separate lmScoreBits
    // folds centered by e4, argmax via greatest(struct(s, cls)) — on
    // real corpus docs, edge docs, and ENGINEERED ties (duplicate
    // grid+e4 classes), where greatest(struct) falls to the
    // binary-greatest class string
    val gridA = (0 until 65536).map(g => (g % 7 + 1).toLong)
    val gridB = (0 until 65536).map(g => (g % 5 + 2).toLong)
    val zero = (0 until 65536).map(_ => 0L)
    // m1/m2 share grid AND e4 — every document ties between them;
    // zz's zero grid makes short docs tie against real classes too
    val metas: Seq[(String, Long, Seq[Long])] = Seq(
      ("aa", 3L, gridA), ("bb", 10L, gridB), ("m1", 7L, gridA),
      ("m2", 7L, gridA), ("zz", 0L, zero))
    val scale = 4096L
    val fsize = (c: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.functions.size(c)
    val texts = Seq("", "one", "a a a a", "the quick brown fox jumps",
      "x y x y x", "punctuated, text! with? tokens.")
    val toks = split(Dedup.normalize(col("t")), " ")
    val n = (fsize(toks) - 1).cast("long")
    val scored = metas.map { case (c, e4, wl) =>
      struct((lit(scale) * TextHashFunctions.lmScoreBits(
        toks, typedlit(wl.toIndexedSeq)) - n * lit(e4)).as("s"),
        lit(c).as("cls"))
    }
    val metaLit = typedlit(metas)
    val diff = (texts.toDF("t") union
        graft.ingest.Tables.documents(spark, "/root/testdata/sf0.001")
          .select(col("text").as("t")))
      .select(TextHashFunctions.nbArgmaxBits(toks, metaLit, scale).as("native"),
        greatest(scored: _*).as("classic"))
      .filter(col("native.s") =!= col("classic.s") ||
        col("native.cls") =!= col("classic.cls"))
    diff.count() shouldBe 0L
    // the m1/m2 tie really resolves to the greater class string
    val tieMeta: Seq[(String, Long, Seq[Long])] =
      Seq(("m1", 7L, gridA), ("m2", 7L, gridA))
    Seq("t u v").toDF("t")
      .select(TextHashFunctions.nbArgmaxBits(toks, typedlit(tieMeta), scale)
        .as("best"))
      .select(col("best.cls")).as[String].head() shouldBe "m2"
    // fail loud, not garbage: one-class meta, wrong-size grid
    val oneClass: Seq[(String, Long, Seq[Long])] = Seq(("aa", 3L, gridA))
    intercept[Exception] {
      Seq("a b").toDF("t")
        .select(TextHashFunctions.nbArgmaxBits(toks, typedlit(oneClass), scale))
        .collect()
    }.getMessage should include("two classes")
    val shortMeta: Seq[(String, Long, Seq[Long])] =
      Seq(("aa", 3L, (0 until 100).map(_.toLong)), ("bb", 0L, zero))
    intercept[Exception] {
      Seq("a b").toDF("t")
        .select(TextHashFunctions.nbArgmaxBits(toks, typedlit(shortMeta), scale))
        .collect()
    }.getMessage should include("65,536")
  }

  test("fused lmNbFusedBits == two lmScoreBits folds + nbArgmaxBits, byte and long grid paths") {
    // the co-resident-scorer fusion (one tokenize+hash pass feeding the
    // target fold, the background fold, and the multi-class argmax) must
    // reproduce the three separate expressions bit-for-bit — on real
    // corpus docs, edge docs, engineered ties, AND on grids outside the
    // byte-packable range (weights > 127 force the widened long table,
    // so both layouts of the interleaved cache are exercised)
    val gridA = (0 until 65536).map(g => (g % 7 + 1).toLong)
    val gridB = (0 until 65536).map(g => (g % 5 + 2).toLong)
    val zero = (0 until 65536).map(_ => 0L)
    val big = (0 until 65536).map(g => (g % 1000 + 500).toLong) // > 127
    val scale = 4096L
    val fsize = (c: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.functions.size(c)
    val texts = Seq("", "one", "a a a a", "the quick brown fox jumps",
      "x y x y x", "punctuated, text! with? tokens.")
    val toks = split(Dedup.normalize(col("t")), " ")
    val n = (fsize(toks) - 1).cast("long")
    val docs = texts.toDF("t") union
      graft.ingest.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("text").as("t"))
    for (metas <- Seq(
        // byte path: every weight <= 127 (m1/m2 tie, zz zero grid)
        Seq(("aa", 3L, gridA), ("bb", 10L, gridB), ("m1", 7L, gridA),
          ("m2", 7L, gridA), ("zz", 0L, zero)),
        // long path: one class grid outside the byte range
        Seq(("aa", 3L, gridA), ("big", 99L, big)))) {
      val lmT = gridB
      val lmBg = if (metas.size == 2) big else gridA // cover both layouts
      val gridsLit = typedlit(IndexedSeq(lmT.toIndexedSeq, lmBg.toIndexedSeq))
      val metaLit = typedlit(metas.map { case (c, e, w) =>
        (c, e, w.toIndexedSeq) }.toIndexedSeq)
      val classic = metas.map { case (c, e4, wl) =>
        struct((lit(scale) * TextHashFunctions.lmScoreBits(
          toks, typedlit(wl.toIndexedSeq)) - n * lit(e4)).as("s"),
          lit(c).as("cls"))
      }
      val diff = docs
        .select(TextHashFunctions.lmNbFusedBits(toks, gridsLit, metaLit,
            scale).as("f"),
          TextHashFunctions.lmScoreBits(toks, typedlit(lmT.toIndexedSeq))
            .as("lt"),
          TextHashFunctions.lmScoreBits(toks, typedlit(lmBg.toIndexedSeq))
            .as("lb"),
          greatest(classic: _*).as("best"))
        .filter(col("f.lp_t") =!= col("lt") || col("f.lp_bg") =!= col("lb") ||
          col("f.s") =!= col("best.s") || col("f.cls") =!= col("best.cls"))
      diff.count() shouldBe 0L
    }
    // fail loud: wrong LM grid count / short grid / one-class meta
    val twoCls: Seq[(String, Long, Seq[Long])] =
      Seq(("aa", 3L, gridA), ("bb", 0L, gridB))
    intercept[Exception] {
      Seq("a b").toDF("t").select(TextHashFunctions.lmNbFusedBits(toks,
        typedlit(IndexedSeq(gridA.toIndexedSeq)), typedlit(twoCls), scale))
        .collect()
    }.getMessage should include("two LM grids")
    intercept[Exception] {
      Seq("a b").toDF("t").select(TextHashFunctions.lmNbFusedBits(toks,
        typedlit(IndexedSeq(gridA.toIndexedSeq,
          (0 until 9).map(_.toLong).toIndexedSeq)),
        typedlit(twoCls), scale)).collect()
    }.getMessage should include("65,536")
    intercept[Exception] {
      Seq("a b").toDF("t").select(TextHashFunctions.lmNbFusedBits(toks,
        typedlit(IndexedSeq(gridA.toIndexedSeq, gridB.toIndexedSeq)),
        typedlit(Seq(("aa", 3L, gridA.toIndexedSeq))), scale)).collect()
    }.getMessage should include("two NB classes")
    // non-foldable metadata is an ANALYSIS error, not a wrong answer:
    // the identity-keyed decode cache requires literal trained models
    intercept[org.apache.spark.sql.AnalysisException] {
      docs.limit(1)
        .select(array(array(lit(1L))).as("g"),
          typedlit(twoCls.map { case (c, e, w) =>
            (c, e, w.toIndexedSeq) }).as("m"), toks.as("tk"))
        .select(TextHashFunctions.lmNbFusedBits(col("tk"), col("g"),
          col("m"), scale))
        .collect()
    }
  }

  test("lmMultiScoreBits == per-grid lmScoreBits folds, byte and long paths") {
    // the N-grid one-pass fold must reproduce N separate lmScoreBits
    // expressions bit-for-bit on corpus + edge docs — including a grid
    // set outside the byte-packable range (widened long table)
    val gridA = (0 until 65536).map(g => (g % 7 + 1).toLong)
    val gridB = (0 until 65536).map(g => (g % 5 + 2).toLong)
    val big = (0 until 65536).map(g => (g % 1000 + 500).toLong)
    val texts = Seq("", "one", "a a a a", "the quick brown fox jumps")
    val toks = split(Dedup.normalize(col("t")), " ")
    val docs = texts.toDF("t") union
      graft.ingest.Tables.documents(spark, "/root/testdata/sf0.001")
        .select(col("text").as("t"))
    for (grids <- Seq(Seq(gridA, gridB, gridA), Seq(gridB, big))) {
      val glit = typedlit(grids.map(_.toIndexedSeq).toIndexedSeq)
      val singles = grids.zipWithIndex.map { case (g, i) =>
        TextHashFunctions.lmScoreBits(toks, typedlit(g.toIndexedSeq))
          .as(s"s$i")
      }
      val diff = docs
        .select((TextHashFunctions.lmMultiScoreBits(toks, glit).as("m") +:
          singles): _*)
        .filter(grids.indices.map(i =>
          element_at(col("m"), i + 1) =!= col(s"s$i")).reduce(_ || _))
      diff.count() shouldBe 0L
    }
    // fail loud: short grid; non-foldable grids are an analysis error
    intercept[Exception] {
      Seq("a b").toDF("t").select(TextHashFunctions.lmMultiScoreBits(toks,
        typedlit(IndexedSeq((0 until 9).map(_.toLong).toIndexedSeq))))
        .collect()
    }.getMessage should include("65,536")
    intercept[org.apache.spark.sql.AnalysisException] {
      docs.limit(1)
        .select(array(array(org.apache.spark.sql.functions.size(toks)
          .cast("long"))).as("g"), toks.as("tk"))
        .select(TextHashFunctions.lmMultiScoreBits(col("tk"), col("g")))
        .collect()
    }
  }

  test("native cmsCells sketch == composable per-token explode sketch") {
    // the one-pass compiled partial (hash60 once per occurrence, dense
    // local cell table, sparse emit) must reproduce the composable
    // explode(array(4 structs)) + affine pipeline cell for cell — the
    // bit-equivalence pin behind rewiring Sketch.cmsSketch onto it
    val docs = graft.ingest.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val aggForm = graft.operators.Sketch.cmsSketch(docs)
      .as[(Long, Long, Long)].collect().toSet
    val perDoc = graft.operators.Sketch.cmsSketchPerDoc(docs)
      .as[(Long, Long, Long)].collect().toSet
    val composable = graft.operators.Sketch.cmsSketchComposable(docs)
      .as[(Long, Long, Long)].collect().toSet
    aggForm should not be empty
    aggForm shouldBe composable
    perDoc shouldBe composable
  }

  test("native hllRegisters == composable explode/groupBy register table") {
    // the typed imperative aggregate (hash once per occurrence, dense
    // register buffer, max-merge) must reproduce the composable
    // explode + hash60 + groupBy-max register table cell for cell —
    // the bit-equivalence pin behind corpus_hll_build riding it
    val docs = graft.ingest.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val aggForm = graft.operators.Sketch.hllRegisters(docs)
      .as[(Long, Long)].collect().toSet
    val composable = graft.operators.Sketch.hllRegistersComposable(docs)
      .as[(Long, Long)].collect().toSet
    aggForm should not be empty
    aggForm shouldBe composable
    // registers stay inside the 60-bit hash's rank range
    aggForm.foreach { case (b, r) =>
      b should (be >= 0L and be < graft.operators.Sketch.HllM.toLong)
      r should (be >= 1L and be <= graft.operators.Sketch.HllMaxRho.toLong)
    }
  }

  test("native kmvMins == composable distinct/sort/take-k minima") {
    // the typed imperative aggregate (value-set buffer, union merge)
    // must reproduce the composable explode + hash60 + distinct +
    // ascending take-k value-for-value — the bit-equivalence pin
    // behind corpus_kmv_build riding it
    val docs = graft.ingest.Tables
      .documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val aggForm = graft.operators.Sketch.kmvMins(docs)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    val composable = graft.operators.Sketch.kmvMinsComposable(docs)
      .as[(Long, Long)].collect().toSeq.sortBy(_._1)
    aggForm should not be empty
    aggForm shouldBe composable
    // ranks are 1..k and values strictly ascend with rank
    aggForm.map(_._1) shouldBe (1L to aggForm.length.toLong)
    aggForm.map(_._2).sliding(2).foreach {
      case Seq(a, b) => a should be < b
      case _ => ()
    }
  }

  test("malformed inputs fail loud: short LM grid, negative bucket hash") {
    // SQL-registered surface: a user-supplied grid of the wrong size or
    // a negative "hash" must throw, not index out of bounds and return
    // garbage scores (UnsafeArrayData reads are unchecked)
    val shortGrid = typedlit((0 until 100).map(_.toLong))
    val exGrid = intercept[Exception] {
      Seq("two tokens").toDF("t")
        .select(TextHashFunctions.lmScoreBits(
          split(col("t"), " "), shortGrid))
        .collect()
    }
    exGrid.getMessage should include("65,536")
    val weights = typedlit((0 until 64).map(_.toLong))
    val exNeg = intercept[Exception] {
      Seq(Seq(-5L)).toDF("gs")
        .select(TextHashFunctions.weightedBucketSum(col("gs"), weights))
        .collect()
    }
    exNeg.getMessage should include("non-negative")
  }
}
