package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.PortableHash._

/** Text-analysis operators a large-scale training-data pipeline runs over
  * a 100 TB document corpus: token counting, quality scoring, n-gram
  * language identification, and rolling-hash fingerprinting.
  *
  * Every operator is a pure column expression (whole-stage-codegen'd,
  * map-only — no shuffle, no UDF), so the cost at cluster scale is one
  * pass over the parquet scan with column pruning down to `text`.
  * Tokenization is single-space split of [[Dedup.normalize]]d text so the
  * DuckDB oracle reproduces it exactly.
  */
object TextAnalysis {

  /** Normalized word tokens. */
  def tokens(text: Column): Column = split(Dedup.normalize(text), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: words are split again on letter/digit/other
    * boundaries and every run of >4 letters counts one extra subword per
    * 4 letters (a crude but deterministic BPE proxy). */
  def subwordCount(text: Column): Column = {
    val pieces = split(
      regexp_replace(Dedup.normalize(text),
        "([0-9]+|[^a-z0-9 ]+)", " $1 "),
      " +")
    val nonEmpty = filter(pieces, p => length(p) > 0)
    aggregate(nonEmpty, lit(0L),
      (acc, p) => acc + lit(1L) + floor((length(p) - lit(1)) / lit(4.0)).cast("long"))
  }

  private val punctChars = ".,!?;:"
  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as")

  /** Punctuation character count (fixed class `[.,!?;:]`). */
  def punctCount(text: Column): Column =
    length(text) - length(translate(text, punctChars, ""))

  /** Stopword token count over the normalized tokens. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isInCollection(stopwords)))

  /** Mean word length over normalized tokens. */
  def meanWordLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)) /
      tokenCount(text).cast("double")

  /** Composite quality score in [0, 1]: penalizes very short docs, high
    * punctuation density and stopword-free (non-linguistic) text.
    * All-double arithmetic, identical expression in the oracle. */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val lenScore = least(nTok / lit(20.0), lit(1.0))
    val punctRatio = punctCount(text).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio * 10.0, lit(0.0))
    val stopRatio = stopwordCount(text).cast("double") / greatest(nTok, lit(1.0))
    val stopScore = least(stopRatio * 4.0, lit(1.0))
    round((lenScore + punctScore + stopScore) / 3.0, 6)
  }

  /** Marker stopwords per language for the n-gram language-ID heuristic.
    * Order matters: ties resolve to the FIRST language in this list. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "you", "that", "it"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "ich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "que", "vous"),
    "es" -> Seq("el", "los", "las", "es", "una", "que", "por", "con"))

  /** Marker-hit count for one language. */
  def langScore(text: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    size(filter(tokens(text), t => t.isInCollection(markers)))
  }

  /** Predicted language: argmax of [[langScore]], first-listed wins ties;
    * `und` (undetermined) when no marker hits at all. */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(text, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(lit("und")) { case ((l, s), other) =>
      when(s === best, lit(l)).otherwise(other)
    }
    when(best > 0, pick).otherwise(lit("und"))
  }

  /** Intra-document repetition score in [0, 1): fraction of n-gram
    * positions occupied by a repeat of an earlier n-gram — the standard
    * boilerplate/spam signal in corpus curation (near-1 means the doc is
    * one phrase repeated). 1 − distinct/total, exact integer division. */
  def repetitionScore(text: Column, n: Int = 3): Column = {
    val total = greatest(tokenCount(text) - lit(n - 1), lit(1))
    val distinct = size(Dedup.hashedShingles(text, n))
    round(lit(1.0) - distinct.cast("double") / total.cast("double"), 6)
  }

  /** PII masking for training text: emails, long digit runs and URLs
    * replaced by typed placeholder tokens. Patterns stay in the subset
    * where Java regex and RE2 agree (classes, quantifiers, alternation —
    * no lookarounds). Map-only; at 100 TB this is one codegen'd
    * regexp_replace chain over the scan. */
  def maskPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}", "<EMAIL>")
    val url = regexp_replace(email, "https?://[^ ]+", "<URL>")
    regexp_replace(url, "[0-9]{4,}", "<NUM>")
  }

  /** Rolling-hash fingerprint over word 5-gram shingles: the minimum
    * 60-bit shingle hash — one stable 60-bit id per document body that is
    * invariant to small appends (winnowing's k-gram-minimum idea).
    * [[Dedup.hashedShingles]] returns the hashes SORTED, so the minimum
    * is element 0 — no extra pass. */
  def fingerprint(text: Column, n: Int = 5): Column =
    Dedup.hashedShingles(text, n).getItem(0)

  /** Exact-int64 BM25 term weight (k1 = 1.2, b = 0.75, ×1000), in the
    * engine's log-free doctrine: idf is the rational Robertson–
    * Spärck-Jones core (2N−2df+1)/(2df+1) — the log's argument, per-term
    * monotone — and with k1 = 6/5, b = 3/4, integer avgdl `a`, the
    * saturated length-normalized weight reduces to
    *
    *   floor( (2N−2df+1)·44·tf·a·1000
    *          / ((2df+1)·(20·tf·a + 6·a + 18·dl)) )
    *
    * Both factors are exact int64 (numerator < 2^52 up to ~1e5 docs ×
    * 1e3 avgdl — beyond that, run the same formula in decimal(38)), the
    * IEEE quotient of exact operands is correctly rounded identically
    * in Spark and DuckDB, and its distance to any integer it doesn't
    * exactly equal exceeds the quotient's ulp whenever num < 2^52 — so
    * `floor` agrees bit-for-bit across engines. */
  def bm25Weight(tf: Column, df: Column, dl: Column, n: Long,
      avgdl: Long): Column = {
    val num = (lit(2L * n) - df * 2 + 1) * lit(44L * avgdl * 1000L) * tf
    val den = (df * 2 + 1) * (tf * lit(20L * avgdl) + lit(6L * avgdl) + dl * 18)
    floor(num / den).cast("long")
  }
}
