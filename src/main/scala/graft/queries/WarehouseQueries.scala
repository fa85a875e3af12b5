package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ingest.Tables
import graft.operators.Dedup

/** Warehouse-maintenance operators a CDC consumer runs downstream of the
  * reference pipeline (SURVEY.md §2.6-§2.7 extensions): SCD Type-2
  * history materialization, MERGE upsert application, gap-based
  * sessionization, histogramming, relational division — plus the
  * containment twin of the Jaccard near-dup family.
  *
  * Portability doctrine as everywhere: shared SQL text where the dialect
  * overlaps, exact integer arithmetic or single IEEE ops elsewhere, and
  * DECIMAL cast to DOUBLE at the query edge on both engines.
  */
object WarehouseQueries {

  /** Query whose SQL runs identically on Spark and DuckDB. */
  private def sqlBoth(q: String): QueryDef =
    QueryDef((s, d) => { Tables.registerAll(s, d); s.sql(q) }, q)

  // MERGE INTO's source batch: updates for every 10th order key, inserts
  // (keys beyond the existing range) derived from every 17th. The offset
  // keeps inserted keys disjoint from the snapshot at any SF.
  private val mergeSourceSql =
    """src AS (
      |  SELECT o_orderkey AS k, 'UPDATED' AS new_status FROM orders
      |  WHERE o_orderkey % 10 = 0
      |  UNION ALL
      |  SELECT o_orderkey + 1000000000 AS k, 'NEW' AS new_status FROM orders
      |  WHERE o_orderkey % 17 = 0)""".stripMargin

  // Gap-based sessionization over the event stream: a session breaks
  // after 30 idle minutes. Boundary flags via LAG, session numbering via
  // a running sum — two window passes over ONE shuffle on user_id (both
  // windows share the partition key), then a hash aggregation.
  private val sessionizeSql =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |              OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS is_start
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |numbered AS (
      |  SELECT user_id, ts, event_id,
      |    SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
      |  FROM flagged)
      |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
      |  COUNT(*) AS n_events,
      |  MIN(ts) AS session_start, MAX(ts) AS session_end
      |FROM numbered
      |GROUP BY user_id, session_no""".stripMargin

  val defs: Map[String, QueryDef] = Map(

    // SCD Type-2 history from the CDC changelog: each change row of a key
    // becomes a version with [valid_from, valid_to) bounds; the open
    // version is current. One shuffle on the key, one in-partition sort —
    // the standard warehouse materialization of exactly the change stream
    // the reference pipeline delivers (insert-only appends in the
    // reference; see cdc_apply_changelog for the c/u/d variant).
    "cdc_scd2" -> QueryDef(
      (s, d) => {
        val w = Window.partitionBy(col("content_id"))
          .orderBy(col("event_ts"), col("id"))
        CdcMapping.fact(s, d)
          .select(col("content_id"), col("id").as("version_id"),
            col("event_type"), col("device"),
            col("event_ts").as("valid_from"),
            lead(col("event_ts"), 1).over(w).as("valid_to"))
          .withColumn("is_current", col("valid_to").isNull)
      },
      s"""WITH ${CdcMapping.factSql}
         |SELECT content_id, id AS version_id, event_type, device,
         |  event_ts AS valid_from,
         |  LEAD(event_ts) OVER w AS valid_to,
         |  (LEAD(event_ts) OVER w IS NULL) AS is_current
         |FROM fact
         |WINDOW w AS (PARTITION BY content_id ORDER BY event_ts, id)""".stripMargin),

    // MERGE upsert application (WHEN MATCHED UPDATE / WHEN NOT MATCHED
    // INSERT / else keep), expressed as one full-outer join on the key —
    // the shape that scales: both sides shuffle-partition on the merge
    // key, AQE broadcasts the delta when it is small. Decimal price cast
    // to DOUBLE at the edge.
    "op_merge_upsert" -> sqlBoth(
      s"""WITH $mergeSourceSql
         |SELECT COALESCE(t.o_orderkey, s.k) AS k,
         |  CASE WHEN t.o_orderkey IS NULL THEN 'insert'
         |       WHEN s.k IS NULL THEN 'keep'
         |       ELSE 'update' END AS action,
         |  COALESCE(s.new_status, t.o_orderstatus) AS status,
         |  CAST(t.o_totalprice AS DOUBLE) AS totalprice
         |FROM orders t FULL OUTER JOIN src s ON t.o_orderkey = s.k""".stripMargin),

    // Gap-based sessions (the window-composition counterpart of
    // adv_session_windows' session_window aggregation).
    "op_sessionize" -> sqlBoth(sessionizeSql),

    // Fixed-width histogram: 20 buckets of 25 over the value measure,
    // top bucket clamped. Bucket id = single IEEE division + floor of
    // the same double on both engines — portable bit-for-bit. Map-side
    // partial aggregation makes this one tiny shuffle at any scale.
    "op_histogram" -> sqlBoth(
      """SELECT event_type,
        |  CAST(LEAST(FLOOR(value / 25), 19) AS BIGINT) AS bucket,
        |  COUNT(*) AS n
        |FROM events
        |GROUP BY 1, 2""".stripMargin),

    // Relational division: customers whose orders cover ALL priority
    // classes — the classic "for all" query, as a distinct-count
    // comparison against an uncorrelated scalar subquery (no
    // per-candidate anti-join blowup; two aggregations total).
    "rel_division" -> sqlBoth(
      """SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS n_prios
        |FROM orders
        |GROUP BY o_custkey
        |HAVING COUNT(DISTINCT o_orderpriority) =
        |  (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)""".stripMargin),

    // Containment near-dup pairs: |A∩B| / min(|A|,|B|) over hashed
    // 2-gram shingles — catches subset-style duplication (a short doc
    // embedded in a longer one) that Jaccard's union denominator hides.
    // Same scale-safe blocked self-join shape as dedup_ngram_jaccard:
    // block on source, deterministic 64-doc cap, plain shuffled
    // equi-join, merge-scan intersect on candidates only.
    "dedup_containment" -> QueryDef(
      (s, d) => Dedup.blockedContainmentPairs(
        Tables.documents(s, d)
          .filter(pmod(col("doc_id"), lit(3)) === 0)
          .select(col("doc_id"), col("source"),
            Dedup.hashedShingles(col("text"), 2).as("sh2")),
        "doc_id", "source", "sh2", cap = 64, threshold = 0.2), {
        import OracleSql._
        s"""WITH sh AS (
           |  SELECT doc_id, source,
           |    list_transform(${shingles(tokens("text"), 2)},
           |      s -> ${graft.functions.PortableHash.hash60Sql("s")}) AS sh2
           |  FROM documents WHERE doc_id % 3 = 0),
           |capped AS (
           |  SELECT * FROM (
           |    SELECT *, row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
           |    FROM sh)
           |  WHERE rn <= 64)
           |SELECT x.doc_id AS a, y.doc_id AS b,
           |  (len(list_intersect(x.sh2, y.sh2)) / least(len(x.sh2), len(y.sh2))) AS containment
           |FROM capped x JOIN capped y ON x.source = y.source AND x.doc_id < y.doc_id
           |WHERE (len(list_intersect(x.sh2, y.sh2)) / least(len(x.sh2), len(y.sh2))) >= 0.2""".stripMargin
      }))
}
