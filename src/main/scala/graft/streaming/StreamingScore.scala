package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming DSIR importance scoring — the serving half of
  * `curate_dsir_weights`: arriving documents are scored against the
  * TRAINED 64-bucket weight table, folded into the plan as literals
  * (index metadata, broadcast-small by construction — the
  * [[StreamingIndex]] doctrine). Stateless and map-only: shingle →
  * hash → bucket → `aggregate()` fold per document, no watermark, no
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
        aggregate(col("gs"), lit(0L), (acc, g) =>
          acc + element_at(rl, (pmod(g, lit(64L)) + 1).cast("int")))
          .as("imp_score"))
  }
}
