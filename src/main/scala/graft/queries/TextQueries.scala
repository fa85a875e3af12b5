package graft.queries

import org.apache.spark.sql.functions._

import graft.ingest.Tables
import graft.operators.TextAnalysis

/** Text-analysis query surface over the `documents` fixture: token
  * counting, quality scoring, language identification, fingerprinting.
  * All map-only column expressions — at 100 TB these cost one pass over
  * a text-pruned parquet scan, no shuffle.
  */
object TextQueries {
  import OracleSql._

  private def stopList(ws: Seq[String]): String =
    ws.map(w => s"'$w'").mkString("[", ", ", "]")

  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as")

  val defs: Map[String, QueryDef] = Map(

    // Token / punctuation / stopword counting (BPE-ish subword proxy
    // included): the unit economics of a corpus.
    "text_stats" -> QueryDef(
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).as("n_subwords"),
        TextAnalysis.punctCount(col("text")).cast("long").as("n_punct"),
        TextAnalysis.stopwordCount(col("text")).cast("long").as("n_stop")),
      s"""SELECT doc_id,
         |  len(w) AS n_tokens,
         |  CAST(list_sum(list_transform(
         |    list_filter(string_split_regex(regexp_replace(${normalize("text")},
         |      '([0-9]+|[^a-z0-9 ]+)', ' \\1 ', 'g'), ' +'), p -> length(p) > 0),
         |    p -> 1 + CAST(floor((length(p) - 1) / 4.0) AS BIGINT))) AS BIGINT) AS n_subwords,
         |  length(text) - length(translate(text, '.,!?;:', '')) AS n_punct,
         |  len(list_filter(w, t -> list_contains(${stopList(stopwords)}, t))) AS n_stop
         |FROM (SELECT doc_id, text, ${tokens("text")} AS w FROM documents)""".stripMargin),

    // Composite quality score in [0,1] (length / punctuation density /
    // stopword ratio) — the filter column of a data-curation pipeline.
    "text_quality" -> QueryDef(
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality")),
      s"""SELECT doc_id,
         |  round((
         |    least(len(w) / 20.0, 1.0)
         |    + greatest(1.0 - ((length(text) - length(translate(text, '.,!?;:', '')))
         |        / greatest(length(text)::DOUBLE, 1.0)) * 10.0, 0.0)
         |    + least((len(list_filter(w, t -> list_contains(${stopList(stopwords)}, t)))
         |        / greatest(len(w)::DOUBLE, 1.0)) * 4.0, 1.0)
         |  ) / 3.0, 6) AS quality
         |FROM (SELECT doc_id, text, ${tokens("text")} AS w FROM documents)""".stripMargin),

    // n-gram-heuristic language ID: marker-stopword hit counts per
    // language, argmax with first-listed tie-break.
    "text_langid" -> QueryDef(
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred")), {
        val scores = TextAnalysis.langMarkers.map { case (l, ms) =>
          s"len(list_filter(w, t -> list_contains(${stopList(ms)}, t))) AS s_$l"
        }.mkString(",\n    ")
        val langs = TextAnalysis.langMarkers.map(_._1)
        val best = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
        val pick = langs.map(l => s"WHEN s_$l = $best THEN '$l'").mkString(" ")
        s"""SELECT doc_id, lang,
           |  CASE WHEN $best > 0 THEN (CASE $pick ELSE 'und' END)
           |       ELSE 'und' END AS lang_pred
           |FROM (SELECT doc_id, lang, $scores
           |      FROM (SELECT doc_id, lang, ${tokens("text")} AS w FROM documents))""".stripMargin
      }),

    // Rolling-hash fingerprint: minimum 60-bit hash over word 5-gram
    // shingles (winnowing's k-gram-minimum idea) — stable doc identity.
    "text_fingerprint" -> QueryDef(
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp")),
      s"""SELECT doc_id,
         |  list_min(list_transform(${shingles(tokens("text"), 5)},
         |    s -> ${graft.functions.PortableHash.hash60Sql("s")})) AS fp
         |FROM documents""".stripMargin),

    // Intra-document repetition score: fraction of 3-gram positions that
    // repeat an earlier 3-gram — the boilerplate/spam gate of a curation
    // pipeline. 1 − distinct/total, exact integer division.
    "text_repetition" -> QueryDef(
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.repetitionScore(col("text"), n = 3).as("repetition")),
      s"""SELECT doc_id,
         |  round(1.0 - len(list_distinct(${shingles(tokens("text"), 3)}))
         |    / greatest(len(${tokens("text")}) - 2, 1)::DOUBLE, 6) AS repetition
         |FROM documents""".stripMargin),

    // PII masking: emails / URLs / long digit runs replaced by typed
    // placeholders before text enters a training corpus. Map-only
    // regexp_replace chain (patterns in the Java-regex ∩ RE2 subset).
    "text_pii_mask" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(4)) === 0)
        .select(col("doc_id"),
          TextAnalysis.maskPii(col("text")).as("masked")),
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(text,
        |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
        |    'https?://[^ ]+', '<URL>', 'g'),
        |    '[0-9]{4,}', '<NUM>', 'g') AS masked
        |FROM documents WHERE doc_id % 4 = 0""".stripMargin),

    // Corpus n-gram statistics: top-20 word 2-grams by document
    // frequency (shingles are distinct per doc, so count(*) IS the doc
    // frequency). Plans as hash-agg + TakeOrderedAndProject — the
    // shuffle carries (gram, partial count), never documents.
    "corpus_top_ngrams" -> QueryDef(
      (s, d) => Tables.documents(s, d)
        .select(explode(graft.operators.Dedup.shingles(col("text"), 2)).as("gram"))
        .groupBy(col("gram"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("gram").asc)
        .limit(20),
      s"""SELECT gram, df FROM (
         |  SELECT s AS gram, count(*) AS df FROM (
         |    SELECT doc_id, unnest(${shingles(tokens("text"), 2)}) AS s
         |    FROM documents) GROUP BY s)
         |ORDER BY df DESC, gram ASC LIMIT 20""".stripMargin))
}
