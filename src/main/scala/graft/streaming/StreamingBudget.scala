package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch `curate_token_budget` operator: per-source
  * token quotas held as keyed state, documents admitted until the
  * source's budget fills.
  *
  * State per key is ONE long (tokens admitted so far) — independent of
  * stream volume; key cardinality is the number of sources, so no TTL is
  * needed (the state table is dimension-sized by construction). Admission
  * is append semantics: a document is emitted exactly once, when
  * admitted, with the cumulative count it closed at.
  *
  * Ordering: the batch operator admits in deterministic portable-hash
  * order; a stream has no second look, so admission is arrival order —
  * within a micro-batch, re-sorted by (doc_id) so replays of the same
  * batch admit the same prefix (the same determinism trade
  * [[StreamingFunnel]] makes for intra-batch order).
  */
object StreamingBudget {

  case class BudgetDoc(source: String, doc_id: Long, n_tokens: Long)

  case class BudgetState(admittedTokens: Long)

  case class Admission(source: String, doc_id: Long, n_tokens: Long,
      cum_tokens: Long)

  /** `docs` must have columns (source: string, doc_id: long,
    * n_tokens: long). A document is admitted while the source's
    * pre-admission total is under `budget` — the crossing document is
    * taken, matching the batch operator's fill-until-full rule. */
  def admitStream(docs: DataFrame, budget: Long): Dataset[Admission] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("source"), col("doc_id").cast("long"),
        col("n_tokens").cast("long"))
      .as[BudgetDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (source: String, batch: Iterator[BudgetDoc],
            state: GroupState[BudgetState]) =>
          var cum = state.getOption.map(_.admittedTokens).getOrElse(0L)
          val admitted = batch.toSeq.sortBy(_.doc_id).flatMap { doc =>
            if (cum < budget) {
              cum += doc.n_tokens
              Some(Admission(source, doc.doc_id, doc.n_tokens, cum))
            } else None
          }
          state.update(BudgetState(cum))
          admitted.iterator
      }
  }
}
