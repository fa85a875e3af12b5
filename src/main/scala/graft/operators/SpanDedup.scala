package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Substring-level exact deduplication — repeated-SPAN removal, the
  * curation pass that at corpus scale removes more tokens than
  * document-level dedup does (boilerplate paragraphs, templates,
  * license blocks repeated within and across documents; the
  * suffix-array dedup of Lee et al., "Deduplicating Training Data
  * Makes Language Models Better", re-expressed relationally).
  *
  * Relational shape, shuffle-conscious end to end:
  *   1. positional k-gram index: map-only — each document emits
  *      (doc_id, off, gram_hash) for every token offset, the gram
  *      hashed to a 60-bit int scan-side so the one shuffle carries
  *      ~20-byte rows, never text;
  *   2. candidate occurrence pairs: ONE hash aggregation on gram_hash
  *      collects each gram's occurrence list (deterministically
  *      sorted, CAPPED at `occCap` — the banded+capped candidate
  *      doctrine of [[Dedup.candidatePairs]]), then pairs are
  *      generated in compiled higher-order functions inside the
  *      group, ≤ occCap² per gram, with no self-join and no second
  *      shuffle of the index;
  *   3. island detection: consecutive shared grams between a document
  *      pair lie on one DIAGONAL (off_a − off_b constant), so the
  *      classic offset-minus-rank gaps-and-islands trick over
  *      (doc_a, doc_b, diagonal) merges them into MAXIMAL spans — a
  *      repeated span of T tokens is exactly one island of T−k+1
  *      grams, reported once;
  *   4. strip: the LATER occurrence (lexicographically greater
  *      (doc_id, offset)) of every span ≥ `minLen` tokens is removed,
  *      the first occurrence kept — per-document intervals are merged
  *      (running-max window) into disjoint covers, aggregated to ONE
  *      small array per affected document, and the corpus-side strip
  *      is a map-only higher-order filter after a single equi-join.
  *
  * All hashing is [[PortableHash]] (MD5-based), so every step —
  * including the cap's tie-break and the island arithmetic — replays
  * bit-identically in the DuckDB oracle.
  *
  * At 100 TB: step 1 is scan-local; step 2's shuffle is the token
  * count × 20 bytes (the index), bounded per-gram by the cap (a gram
  * more frequent than `occCap` is boilerplate whose occurrences
  * beyond the cap pair with nothing — the honest truncation a
  * suffix-array pass also applies via frequency cutoffs); step 3
  * partitions by (doc pair, diagonal) — pair-hit-scale, far below
  * index scale; step 4 touches the corpus once, map-only, against a
  * broadcast-or-shuffle join on the (small) affected-doc manifest.
  */
object SpanDedup {

  /** The pairing/indexing kernels cast `idCol` to int64 so the one big
    * shuffle carries fixed-width keys. A cast from a non-numeric id
    * would return NULL silently — collapsing every document onto one
    * null key and producing garbage spans with no error — so the id
    * type is validated up front: integral types only (hash string ids
    * to int64, e.g. [[graft.functions.PortableHash.hash60]], before
    * calling). */
  private def requireIntegralId(docs: DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = docs.schema(idCol).dataType
    require(Set[DataType](ByteType, ShortType, IntegerType, LongType)
      .contains(dt),
      s"SpanDedup: id column '$idCol' must be an integral type castable " +
        s"to int64, got $dt — hash string ids to int64 first")
  }

  /** Positional k-gram index: (idCol, off, gram) — off is the 1-based
    * token offset of the gram's first token, gram the 60-bit hash of
    * the space-joined k tokens. Map-only; one output row per token
    * position (minus k−1 per doc). */
  def posGrams(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"gram size must be >= 2, got $k")
    val toks = TextAnalysis.tokens(col(textCol))
    // guard: sequence(1, n) DESCENDS for n < 1 (it never yields empty),
    // so a doc shorter than k tokens must map to an explicit empty array
    val offs = when(size(col("__toks")) >= k,
      sequence(lit(1), size(col("__toks")) - (k - 1)))
      .otherwise(typedlit(Seq.empty[Int]))
    docs
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol), posexplode(
        transform(offs,
          i => PortableHash.hash60(
            concat_ws(" ", slice(col("__toks"), i, lit(k)))))))
      .select(col(idCol), (col("pos") + 1).cast("long").as("off"),
        col("col").as("gram"))
  }

  /** Maximal repeated spans ≥ `minLen` tokens, within and across
    * documents: (doc_a, a_start, doc_b, b_start, span_toks) with
    * (doc_a, a_start) < (doc_b, b_start) lexicographically — doc_a is
    * the earlier (kept) occurrence. One row per maximal island; a
    * T-token repeat reports once with span_toks = T, never as its
    * T−k+1 constituent grams. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minLen: Int, occCap: Int): DataFrame = {
    require(minLen >= k, s"minLen ($minLen) must be >= gram size ($k)")
    val hits = pairHits(docs, idCol, textCol, k, occCap)
    val iw = Window.partitionBy(col("da"), col("db"), col("diag"))
      .orderBy(col("oa"))
    hits
      .withColumn("diag", col("oa") - col("ob"))
      // offset-minus-rank: consecutive oa on one diagonal share a grp
      .withColumn("grp", col("oa") - row_number().over(iw))
      .groupBy(col("da"), col("db"), col("diag"), col("grp"))
      .agg(min(col("oa")).as("a_start"),
        (max(col("oa")) + (k - 1) - min(col("oa")) + 1).as("span_toks"))
      .filter(col("span_toks") >= minLen)
      .select(col("da").as("doc_a"), col("a_start"),
        col("db").as("doc_b"), (col("a_start") - col("diag")).as("b_start"),
        col("span_toks"))
  }

  /** Shared-gram occurrence pairs (da, oa, db, ob), ordered
    * (da, oa) < (db, ob): ONE aggregation on gram collects each
    * gram's occurrence list sorted by (doc, off) and capped at
    * `occCap`; pair generation is a compiled nested transform inside
    * the group — the gram index is shuffled once and never joined
    * against itself. */
  private def pairHits(docs: DataFrame, idCol: String, textCol: String,
      k: Int, occCap: Int): DataFrame = {
    require(occCap >= 2, s"occCap must be >= 2, got $occCap")
    requireIntegralId(docs, idCol)
    val occs = slice(
      sort_array(collect_list(struct(col("d"), col("off")))),
      1, occCap)
    posGrams(docs, idCol, textCol, k)
      .select(col(idCol).cast("long").as("d"), col("off"), col("gram"))
      .groupBy(col("gram"))
      .agg(occs.as("os"))
      // pairs within the capped occurrence list: element i with every
      // later element — (da,oa) < (db,ob) by the sort above
      .select(explode(flatten(transform(col("os"), (a, i) =>
        transform(slice(col("os"), i + 2, lit(occCap)),
          b => struct(a.getField("d").as("da"), a.getField("off").as("oa"),
            b.getField("d").as("db"), b.getField("off").as("ob"))))))
        .as("p"))
      .select(col("p.da"), col("p.oa"), col("p.db"), col("p.ob"))
  }

  /** The reference-side gram index for CROSS-CORPUS span matching
    * ([[spansAgainst]]): (rid, roff, gram), with each gram's
    * occurrence list deterministically capped at `occCap` (rank by
    * (rid, roff) — the same tie-break as the in-corpus pass). Built
    * ONCE over the reference corpus and checkpointed by the caller;
    * the cap is paid at build time so serving never re-windows the
    * static side. */
  def cappedGrams(docs: DataFrame, idCol: String, textCol: String,
      k: Int, occCap: Int): DataFrame = {
    requireIntegralId(docs, idCol)
    val rw = Window.partitionBy(col("gram"))
      .orderBy(col("rid"), col("roff"))
    posGrams(docs, idCol, textCol, k)
      .select(col(idCol).cast("long").as("rid"), col("off").as("roff"),
        col("gram"))
      .withColumn("__r", row_number().over(rw))
      .filter(col("__r") <= occCap)
      .drop("__r")
  }

  /** Bloom sketch of a [[cappedGrams]] index's gram hashes — the
    * trained-artifact pre-filter for [[spansAgainst]]: built ONCE
    * offline next to the index itself (a bounded-size driver sketch,
    * KBs), shipped to the scan as a codegen'd literal, and used to
    * drop non-matching arriving grams BEFORE the join's exchange.
    * Sizes itself from the index's DISTINCT gram count (one cheap
    * aggregate over the already-checkpointed build frame — callers
    * previously passed the total occurrence-row count, inflating the
    * 16×-items bit budget by up to occCap); bits = 16× items ≈ 0.04 %
    * FP — and every FP is removed by the exact join anyway. Returns
    * None on an empty build frame (an empty index has nothing to
    * pre-filter against; the previous shape returned a null sketch
    * that only worked via might_contain(null,·) null-propagation). */
  def refGramSketch(refGrams: DataFrame): Option[Array[Byte]] = {
    val distinct = refGrams
      .agg(count_distinct(col("gram"))).head().getLong(0)
    if (distinct == 0L) None
    else Some(BloomJoin.keySketch(refGrams, col("gram"),
      distinct, distinct * 16))
  }

  /** Maximal spans the `docs` side shares with a REFERENCE gram index
    * ([[cappedGrams]]) — the cross-corpus form of [[repeatedSpans]],
    * shaped for [[stripSpans]]: (doc_b, b_start, span_toks) with
    * doc_b/b_start always the `docs` (to-be-stripped) side. One
    * equi-join of the arriving grams against the static index, then
    * the same (ref doc, arriving doc, diagonal) island merge. Per
    * arriving gram the join fans out to ≤ occCap reference
    * occurrences; nothing on the reference side moves or re-ranks at
    * serving time — the shape a streaming decontamination twin needs.
    * Equals the in-corpus pass's cross-pair spans exactly whenever no
    * gram's COMBINED occurrence count exceeds the cap (the production
    * case; a hotter gram is truncated differently because the
    * in-corpus cap ranks the combined list — the documented trade). */
  def spansAgainst(refGrams: DataFrame, docs: DataFrame,
      idCol: String, textCol: String, k: Int, minLen: Int,
      refSketch: Option[Array[Byte]] = None): DataFrame = {
    require(minLen >= k, s"minLen ($minLen) must be >= gram size ($k)")
    requireIntegralId(docs, idCol)
    // optional scan-side membership pre-filter on the reference gram
    // hashes ([[refGramSketch]]): in production nearly every arriving
    // gram MISSES the reference index, yet without the sketch each one
    // pays the shuffle into the equi-join. Bloom false positives are
    // eliminated by the exact join that follows, so the result is
    // row-identical with and without the sketch (spec-pinned); a null
    // sketch (empty reference) drops every gram — exactly the empty
    // inner join's semantics.
    val arriving = posGrams(docs, idCol, textCol, k)
      .select(col(idCol).cast("long").as("d"), col("off"), col("gram"))
    val prefiltered = refSketch match {
      case Some(sk) => arriving.filter(BloomJoin.mightContain(sk, col("gram")))
      case None => arriving
    }
    val hits = prefiltered
      .join(refGrams, Seq("gram"))
      .select(col("d"), col("off"), col("rid"), col("roff"))
    val iw = Window.partitionBy(col("d"), col("rid"), col("diag"))
      .orderBy(col("off"))
    hits
      .withColumn("diag", col("off") - col("roff"))
      .withColumn("grp", col("off") - row_number().over(iw))
      .groupBy(col("d"), col("rid"), col("diag"), col("grp"))
      .agg(min(col("off")).as("b_start"),
        (max(col("off")) + (k - 1) - min(col("off")) + 1).as("span_toks"))
      .filter(col("span_toks") >= minLen)
      .select(col("d").as("doc_b"), col("b_start"), col("span_toks"))
  }

  /** Disjoint per-document removal intervals (idCol, ms, me) — the
    * LATER (b-side) occurrence of every repeated span, merged where
    * overlapping/adjacent-overlapping via the running-max window. */
  def removalIntervals(spans: DataFrame, idCol: String): DataFrame = {
    val ivd = spans
      .select(col("doc_b").as(idCol), col("b_start").as("s"),
        (col("b_start") + col("span_toks") - 1).as("e"))
      .distinct()
    val ow = Window.partitionBy(col(idCol)).orderBy(col("s"), col("e"))
    val pm = Window.partitionBy(col(idCol)).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ivd
      .withColumn("pmax", max(col("e")).over(pm))
      .withColumn("grp", sum(
        when(col("pmax").isNull || col("s") > col("pmax"), 1L)
          .otherwise(0L)).over(ow))
      .groupBy(col(idCol), col("grp"))
      .agg(min(col("s")).as("ms"), max(col("e")).as("me"))
      .select(col(idCol), col("ms"), col("me"))
  }

  /** The cleaned corpus: every document with its later-occurrence
    * repeated spans stripped — (idCol, n_toks, n_removed, clean_text).
    * The strip itself is MAP-ONLY: intervals aggregate to one array
    * per affected doc (manifest-scale, far below corpus-scale), join
    * once on the id, and a compiled higher-order filter keeps the
    * uncovered tokens in order. Untouched documents pass through with
    * n_removed = 0 and clean_text = the normalized text. */
  def stripSpans(docs: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    val ivs = removalIntervals(spans, idCol)
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("ms"), col("me")))).as("ivs"))
    val toks = TextAnalysis.tokens(col(textCol))
    val noIvs = typedlit(Seq.empty[(Long, Long)])
      .cast("array<struct<ms:bigint,me:bigint>>")
    docs
      .select(col(idCol), toks.as("__toks"))
      .join(ivs, Seq(idCol), "left")
      .withColumn("__ivs", coalesce(col("ivs"), noIvs))
      .withColumn("__kept", filter(col("__toks"), (_, i) =>
        !exists(col("__ivs"), v =>
          i + 1 >= v.getField("ms") && i + 1 <= v.getField("me"))))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_toks"),
        (size(col("__toks")) - size(col("__kept"))).cast("long")
          .as("n_removed"),
        concat_ws(" ", col("__kept")).as("clean_text"))
  }
}
