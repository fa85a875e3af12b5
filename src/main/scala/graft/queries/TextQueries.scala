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
         |FROM documents""".stripMargin))
}
