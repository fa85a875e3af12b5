package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming DSIR importance scoring — the serving half of
  * `curate_dsir_weights`: arriving documents are scored against the
  * TRAINED 64-bucket weight table, folded into the plan as literals
  * (index metadata, broadcast-small by construction — the
  * [[StreamingIndex]] doctrine). Stateless and map-only: shingle →
  * hash → bucket → one compiled `weighted_bucket_sum` pass per
  * document, no watermark, no
  * shuffle — admission-time targeted-selection scoring scales with
  * executor count. StreamingSpec pins streamed scores equal to the
  * batch query row-for-row on the same documents.
  *
  * At 100 TB this is the shape a curation service runs at ingest: the
  * weight table retrains offline (two 64-row count aggregates over the
  * batch corpus) and ships to scorers as 64 longs; every arriving
  * document is scored in the map phase and can be routed/resampled
  * downstream without ever touching a shuffle.
  */
object StreamingScore {

  /** `docs`: streaming frame with (doc_id long, text string).
    * `weights`: the trained bucket→weight table ordered by bucket
    * ([[graft.queries.DedupQueries.dsirWeightArray]]). Emits
    * (doc_id, n_feats, imp_score) — the batch query's schema. */
  def scoreStream(docs: DataFrame, weights: Seq[Long]): DataFrame = {
    // fail-loud doctrine: a truncated weight table would silently
    // mis-bucket every document (element_at out of range → null sums)
    require(weights.length == 64,
      s"DSIR weight table must have 64 buckets, got ${weights.length}")
    val rl = array(weights.map(lit(_)): _*)
    docs
      .select(col("doc_id"), Dedup.hashedShingles(col("text"), 2).as("gs"))
      .select(col("doc_id"), size(col("gs")).cast("long").as("n_feats"),
        graft.functions.TextHashFunctions
          .weightedBucketSum(col("gs"), rl).as("imp_score"))
  }

  /** Streaming LM perplexity scoring — the serving half of
    * `text_lm_score`/`curate_lm_gate` (the CCNet admission filter):
    * arriving documents are scored against the TRAINED 65,536-entry
    * hashed-bigram weight grid, folded into the plan as one literal
    * array (512 KB — still index metadata by the broadcast-to-writers
    * doctrine; at 65,536 entries the literal is built ONCE per plan,
    * not per row). Stateless map-only like [[scoreStream]]; the
    * quarter-bit integer log weights make streamed scores exactly
    * equal to the batch query's (StreamingSpec pins it row-for-row).
    *
    * `wbits`: the grid ordered by bigram code
    * ([[graft.queries.TextQueries.lmWeightArray]]). Emits
    * (doc_id, lang, n_bigrams, lp_bits) — the batch query's schema. */
  def lmScoreStream(docs: DataFrame, wbits: Seq[Long]): DataFrame = {
    require(wbits.length == 65536,
      s"LM weight grid must have 65,536 entries, got ${wbits.length}")
    // ONE ArrayType literal, not 65,536 expression nodes — a 64K-node
    // tree would blow codegen method limits; typedlit keeps the whole
    // grid as a single constant the native scorer indexes into
    val wl = typedlit(wbits.toIndexedSeq)
    val toks = split(Dedup.normalize(col("text")), " ")
    docs
      .select(col("doc_id"), col("lang"), toks.as("toks"))
      .select(col("doc_id"), col("lang"),
        (size(col("toks")) - 1).cast("long").as("n_bigrams"),
        graft.functions.TextHashFunctions.lmScoreBits(col("toks"), wl)
          .as("lp_bits"))
  }

  /** Streaming NB classification — the serving half of
    * `text_nb_score`/`curate_nb_gate` (the trained-classifier quality
    * gate): every arriving document gets ONE native `nb_argmax_bits`
    * pass — each token occurrence hashed once, all class grids folded
    * over the shared bucket sequence, centered argmax inline —
    * stateless map-only like the LM scorers; the gate downstream is
    * one string equality.
    *
    * `classMeta`: (lang, e4, 65,536-entry wbits grid) per class,
    * sorted by lang ([[graft.queries.TextQueries.nbClassMeta]]),
    * folded into the plan as ONE literal (the whole trained
    * classifier as index metadata). Emits (doc_id, lang, n_bigrams,
    * pred_lang, nb_cbits) — the batch query's schema; StreamingSpec
    * pins it row-for-row. */
  def nbScoreStream(docs: DataFrame,
      classMeta: Seq[(String, Long, Seq[Long])]): DataFrame = {
    require(classMeta.size >= 2,
      s"NB needs at least two classes, got ${classMeta.size}")
    classMeta.foreach { case (c, _, wl) =>
      require(wl.length == 65536,
        s"NB grid for class $c must have 65,536 entries, got ${wl.length}")
    }
    val metaLit = typedlit(classMeta.map { case (c, e4, wl) =>
      (c, e4, wl.toIndexedSeq) }.toIndexedSeq)
    val toks = split(Dedup.normalize(col("text")), " ")
    docs
      .select(col("doc_id"), col("lang"), toks.as("toks"))
      .select(col("doc_id"), col("lang"),
        (size(col("toks")) - 1).cast("long").as("n_bigrams"),
        graft.functions.TextHashFunctions.nbArgmaxBits(col("toks"), metaLit,
          graft.queries.TextQueries.lmProbScale).as("best"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        col("best.cls").as("pred_lang"), col("best.s").as("nb_cbits"))
  }

  /** Streaming RATIO scoring — the serving half of
    * `text_lm_ratio_score`/`curate_lm_ratio_gate` (the complete CCNet
    * discriminator): BOTH trained grids fold in as literal arrays and
    * each document gets its target and background scores from two
    * native one-pass folds over the same token array. Still stateless
    * map-only; a downstream gate is one int64 cross-multiplication.
    *
    * Emits (doc_id, lang, n_bigrams, lp_t, lp_bg) — the batch ratio
    * query's schema; StreamingSpec pins it row-for-row. */
  def lmRatioScoreStream(docs: DataFrame, target: Seq[Long],
      background: Seq[Long]): DataFrame = {
    require(target.length == 65536,
      s"target LM grid must have 65,536 entries, got ${target.length}")
    require(background.length == 65536,
      s"background LM grid must have 65,536 entries, got ${background.length}")
    // both grids fold in ONE token-hash pass (lm_multi_score_bits) —
    // the two-expression form paid two full MD5 passes over the same
    // token array; values are bit-identical (spec-pinned), so the
    // batch-equality pin is unchanged
    val glit = typedlit(IndexedSeq(
      target.toIndexedSeq, background.toIndexedSeq))
    val toks = split(Dedup.normalize(col("text")), " ")
    docs
      .select(col("doc_id"), col("lang"), toks.as("toks"))
      .select(col("doc_id"), col("lang"),
        (size(col("toks")) - 1).cast("long").as("n_bigrams"),
        graft.functions.TextHashFunctions.lmMultiScoreBits(col("toks"), glit)
          .as("lps"))
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
        element_at(col("lps"), 1).as("lp_t"),
        element_at(col("lps"), 2).as("lp_bg"))
  }
}
