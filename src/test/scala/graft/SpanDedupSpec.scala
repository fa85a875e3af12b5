package graft

import org.apache.spark.sql.functions._

import graft.operators.SpanDedup

/** Substring-span dedup semantics on engineered corpora: a planted
  * repeated paragraph is found exactly once (maximal, token-exact
  * offsets), stripped from the later occurrence only, overlapping
  * removal intervals merge without double-counting, the per-gram cap
  * is deterministic, and short/empty documents pass through. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def uniq(tag: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$tag$i")
  private val span12 = uniq("p", 12) // the planted 12-token paragraph

  private def doc(id: Long, toks: Seq[String]): (Long, String) =
    (id, toks.mkString(" "))

  test("planted repeated paragraph: found exactly once, maximal, token-exact") {
    val docs = Seq(
      doc(1L, uniq("a", 5) ++ span12 ++ uniq("b", 5)),
      doc(2L, uniq("c", 3) ++ span12 ++ uniq("d", 7)))
      .toDF("doc_id", "text")
    val got = SpanDedup.repeatedSpans(docs, "doc_id", "text",
        k = 4, minLen = 10, occCap = 32)
      .as[(Long, Long, Long, Long, Long)].collect()
    // exactly ONE manifest row — maximal, never the 9 constituent
    // 4-gram islands or any sub-span
    got.toSeq shouldBe Seq((1L, 6L, 2L, 4L, 12L))
  }

  test("strip removes the later occurrence only, in token order") {
    val docs = Seq(
      doc(1L, uniq("a", 5) ++ span12 ++ uniq("b", 5)),
      doc(2L, uniq("c", 3) ++ span12 ++ uniq("d", 7)))
      .toDF("doc_id", "text")
    val spans = SpanDedup.repeatedSpans(docs, "doc_id", "text",
      k = 4, minLen = 10, occCap = 32)
    val got = SpanDedup.stripSpans(docs, "doc_id", "text", spans)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    got(0) shouldBe ((1L, 22L, 0L,
      (uniq("a", 5) ++ span12 ++ uniq("b", 5)).mkString(" ")))
    got(1) shouldBe ((2L, 22L, 12L,
      (uniq("c", 3) ++ uniq("d", 7)).mkString(" ")))
  }

  test("within-document repeat: first occurrence kept, second stripped") {
    val rep = uniq("r", 10)
    val docs = Seq(
      doc(7L, uniq("x", 4) ++ rep ++ uniq("y", 4) ++ rep ++ uniq("z", 2)))
      .toDF("doc_id", "text")
    val spans = SpanDedup.repeatedSpans(docs, "doc_id", "text",
      k = 4, minLen = 10, occCap = 32)
    spans.as[(Long, Long, Long, Long, Long)].collect().toSeq shouldBe
      Seq((7L, 5L, 7L, 19L, 10L))
    val got = SpanDedup.stripSpans(docs, "doc_id", "text", spans)
      .as[(Long, Long, Long, String)].collect()
    got.length shouldBe 1
    got.head shouldBe ((7L, 30L, 10L,
      (uniq("x", 4) ++ rep ++ uniq("y", 4) ++ uniq("z", 2)).mkString(" ")))
  }

  test("overlapping removal intervals merge: covered union, not the sum") {
    // doc 10 carries X at [5,16] and Y at [13,24], overlapping by 4
    // tokens; X is doc 1 verbatim, Y is doc 2 verbatim
    val x = uniq("x", 12)
    val y = x.drop(8) ++ uniq("w", 8)
    val d10 = uniq("u", 4) ++ x ++ y.drop(4) ++ uniq("v", 4)
    val docs = Seq(doc(1L, x), doc(2L, y), doc(10L, d10))
      .toDF("doc_id", "text")
    val spans = SpanDedup.repeatedSpans(docs, "doc_id", "text",
      k = 4, minLen = 10, occCap = 32)
    spans.as[(Long, Long, Long, Long, Long)].collect().toSet shouldBe
      Set((1L, 1L, 10L, 5L, 12L), (2L, 1L, 10L, 13L, 12L))
    val merged = SpanDedup.removalIntervals(spans, "doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    merged shouldBe Seq((10L, 5L, 24L))
    val got = SpanDedup.stripSpans(docs, "doc_id", "text", spans)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // 20 covered positions (the union), never 24 (the sum)
    got.map(r => (r._1, r._3)).toSeq shouldBe
      Seq((1L, 0L), (2L, 0L), (10L, 20L))
    got(2)._4 shouldBe (uniq("u", 4) ++ uniq("v", 4)).mkString(" ")
  }

  test("per-gram occurrence cap is deterministic: first cap occurrences pair") {
    // the same paragraph in three docs; cap 2 keeps only the two
    // lexicographically-first occurrences of each gram, so doc 3's
    // copy pairs with nothing and survives the strip
    val docs = Seq(
      doc(1L, uniq("a", 3) ++ span12),
      doc(2L, uniq("b", 3) ++ span12),
      doc(3L, uniq("c", 3) ++ span12))
      .toDF("doc_id", "text")
    val spans = SpanDedup.repeatedSpans(docs, "doc_id", "text",
      k = 4, minLen = 10, occCap = 2)
    spans.as[(Long, Long, Long, Long, Long)].collect().toSeq shouldBe
      Seq((1L, 4L, 2L, 4L, 12L))
    val got = SpanDedup.stripSpans(docs, "doc_id", "text", spans)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    got.map(r => (r._1, r._3)).toSeq shouldBe
      Seq((1L, 0L), (2L, 12L), (3L, 0L))
    // uncapped, all three pair and docs 2 and 3 both lose the span
    val full = SpanDedup.repeatedSpans(docs, "doc_id", "text",
      k = 4, minLen = 10, occCap = 32)
    full.count() shouldBe 3L // (1,2), (1,3), (2,3)
    SpanDedup.stripSpans(docs, "doc_id", "text", full)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
      .map(r => (r._1, r._3)).toSeq shouldBe
      Seq((1L, 0L), (2L, 12L), (3L, 12L))
  }

  test("short and empty documents pass through untouched") {
    val docs = Seq(doc(1L, Seq("one", "two")), (2L, ""),
      doc(3L, uniq("a", 3) ++ span12), doc(4L, uniq("b", 3) ++ span12))
      .toDF("doc_id", "text")
    val spans = SpanDedup.repeatedSpans(docs, "doc_id", "text",
      k = 4, minLen = 10, occCap = 32)
    spans.count() shouldBe 1L
    val got = SpanDedup.stripSpans(docs, "doc_id", "text", spans)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    got(0) shouldBe ((1L, 2L, 0L, "one two"))
    // normalize("") splits to [""]: one empty token, nothing removable
    got(1) shouldBe ((2L, 1L, 0L, ""))
    got(2)._3 shouldBe 0L
    got(3)._3 shouldBe 12L
  }

  test("span decontamination: train side of a train×test leak stripped, test untouched") {
    import graft.functions.PortableHash
    // splits are hash-determined — pick real ids from each split
    def bucket(id: Long) = PortableHash.seedLong(s"$id|split") % 100
    val ids = (0L to 500L)
    val trainA = ids.find(bucket(_) < 80).get
    val trainB = ids.find(i => bucket(i) < 80 && i != trainA).get
    val testC = ids.find(bucket(_) >= 90).get
    // trainA shares a span with testC (the LEAK) and another with
    // trainB (in-split repetition — decontamination must NOT touch it)
    val leakSpan = uniq("l", 10)
    val dupSpan = uniq("m", 10)
    val docs = Seq(
      doc(trainA, uniq("a", 3) ++ leakSpan ++ uniq("b", 2) ++ dupSpan),
      doc(trainB, uniq("c", 4) ++ dupSpan ++ uniq("e", 3)),
      doc(testC, uniq("f", 5) ++ leakSpan ++ uniq("g", 4)))
      .toDF("doc_id", "text")
    val spans = SpanDedup.repeatedSpans(docs, "doc_id", "text",
      k = 4, minLen = 10, occCap = 32)
    def split(c: org.apache.spark.sql.Column) = {
      val b = PortableHash.hash60(
        concat(c.cast("string"), lit("|split"))) % 100
      when(b < 80, "train").when(b < 90, "val").otherwise("test")
    }
    // the registered query's leak orientation: strip whichever side of
    // a train×test pair is the train doc
    val tagged = spans
      .withColumn("split_a", split(col("doc_a")))
      .withColumn("split_b", split(col("doc_b")))
    val leak = tagged
      .filter(col("split_a") === "train" && col("split_b") === "test")
      .select(col("doc_a").as("doc_b"), col("a_start").as("b_start"),
        col("span_toks"))
      .unionByName(tagged
        .filter(col("split_a") === "test" && col("split_b") === "train")
        .select(col("doc_b"), col("b_start"), col("span_toks")))
    val train = docs.filter(split(col("doc_id")) === "train")
    val byId = SpanDedup.stripSpans(train, "doc_id", "text", leak)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // trainA loses EXACTLY the leaked span; the in-split dup survives
    byId(trainA)._3 shouldBe 10L
    byId(trainA)._4 shouldBe
      (uniq("a", 3) ++ uniq("b", 2) ++ dupSpan).mkString(" ")
    // trainB untouched (its only repeat is in-split)
    byId(trainB)._3 shouldBe 0L
    byId.size shouldBe 2 // test doc never enters the decontaminated corpus
  }

  test("fixture replay: every manifest span really repeats, verbatim and maximal") {
    val d = "/root/testdata/sf0.001"
    val docs = graft.ingest.Tables.documents(spark, d)
    val spans = SpanDedup.repeatedSpans(docs, "doc_id", "text",
      k = 8, minLen = 10, occCap = 32)
    val toks = docs.select(col("doc_id"),
      graft.operators.TextAnalysis.tokens(col("text")).as("toks"))
    val checked = spans
      .join(toks.select(col("doc_id").as("doc_a"), col("toks").as("ta")),
        Seq("doc_a"))
      .join(toks.select(col("doc_id").as("doc_b"), col("toks").as("tb")),
        Seq("doc_b"))
      .select(col("doc_a"), col("a_start"), col("doc_b"), col("b_start"),
        col("span_toks"),
        // verbatim: the two slices are token-identical
        (slice(col("ta"), col("a_start").cast("int"),
          col("span_toks").cast("int")) ===
          slice(col("tb"), col("b_start").cast("int"),
            col("span_toks").cast("int"))).as("same"),
        // maximal: extending one token left or right breaks the match
        (col("a_start") === 1 || col("b_start") === 1 ||
          element_at(col("ta"), (col("a_start") - 1).cast("int")) =!=
            element_at(col("tb"), (col("b_start") - 1).cast("int")))
          .as("left_max"),
        // qualified: ScalaTest's Matchers.size shadows functions.size
        ((col("a_start") + col("span_toks"))
          .gt(org.apache.spark.sql.functions.size(col("ta"))) ||
          (col("b_start") + col("span_toks"))
            .gt(org.apache.spark.sql.functions.size(col("tb"))) ||
          element_at(col("ta"),
            (col("a_start") + col("span_toks")).cast("int")) =!=
            element_at(col("tb"),
              (col("b_start") + col("span_toks")).cast("int")))
          .as("right_max"))
    checked.count() should be > 0L
    checked.filter(!col("same") || !col("left_max") || !col("right_max"))
      .count() shouldBe 0L
  }

  test("Bloom gram pre-filter: spansAgainst row-identical with and without the sketch") {
    import graft.functions.PortableHash
    val d = "/root/testdata/sf0.001"
    def split(c: org.apache.spark.sql.Column) = {
      val b = PortableHash.hash60(
        concat(c.cast("string"), lit("|split"))) % 100
      when(b < 80, "train").when(b < 90, "val").otherwise("test")
    }
    val docs0 = graft.ingest.Tables.documents(spark, d)
    val refGrams = SpanDedup.cappedGrams(
      docs0.filter(split(col("doc_id")) === "test"),
      "doc_id", "text", k = 8, occCap = 32).localCheckpoint()
    val train = docs0.filter(split(col("doc_id")) === "train")
    val bare = SpanDedup.spansAgainst(
        refGrams, train, "doc_id", "text", k = 8, minLen = 10)
      .as[(Long, Long, Long)].collect().toSet
    bare should not be empty
    val sketch = SpanDedup.refGramSketch(refGrams)
    sketch should not be empty
    val filtered = SpanDedup.spansAgainst(
        refGrams, train, "doc_id", "text", k = 8, minLen = 10,
        sketch)
      .as[(Long, Long, Long)].collect().toSet
    filtered shouldBe bare
    // an EMPTY build frame yields no sketch, loudly — not a null
    // sketch that filters via might_contain null-propagation
    SpanDedup.refGramSketch(refGrams.limit(0)) shouldBe None
    // and the composed strip (what the streaming twin serves) matches
    val a = SpanDedup.stripSpans(train, "doc_id", "text",
        SpanDedup.spansAgainst(refGrams, train, "doc_id", "text", 8, 10))
      .as[(Long, Long, Long, String)].collect().toSet
    val b = SpanDedup.stripSpans(train, "doc_id", "text",
        SpanDedup.spansAgainst(refGrams, train, "doc_id", "text", 8, 10,
          sketch))
      .as[(Long, Long, Long, String)].collect().toSet
    b shouldBe a
  }
}
