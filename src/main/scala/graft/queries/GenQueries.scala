package graft.queries

import graft.functions.PortableHash
import graft.ingest.Tables
import graft.operators.DataGen

/** SURVEY.md §2.8 — the reference generator's distributions as an
  * oracle-checked, deterministic, map-only generation query. */
object GenQueries {

  private def u(label: String, lo: Long, hi: Long): String =
    s"($lo + (${PortableHash.hash60Sql(s"('$label-' || event_id)")} % ${hi - lo + 1}))"

  val defs: Map[String, QueryDef] = Map(
    "gen_events" -> QueryDef(
      (s, d) => DataGen.events(
        Tables.events(s, d).select("event_id"), "event_id"), {
        val et = s"""CASE WHEN ${u("et", 0, 99)} < 45 THEN 'play'
                    |     WHEN ${u("et", 0, 99)} < 70 THEN 'pause'
                    |     WHEN ${u("et", 0, 99)} < 90 THEN 'click'
                    |     ELSE 'finish' END""".stripMargin
        s"""SELECT event_id AS gen_id, event_type, length_seconds,
           |  CASE WHEN event_type = 'click' THEN NULL
           |       WHEN event_type = 'play' THEN length_seconds * ${u("dur-50-950", 50, 950)}
           |       WHEN event_type = 'pause' THEN length_seconds * ${u("dur-100-800", 100, 800)}
           |       ELSE length_seconds * ${u("dur-850-1000", 850, 1000)} END AS duration_ms,
           |  CASE WHEN ${u("dev", 0, 6)} = 6 THEN NULL
           |       ELSE (['ios','android','web','tv','tablet','desktop'])[${u("dev", 0, 6)} + 1]
           |       END AS device,
           |  '{"source":"app","session_id":"' || ${u("sess", 100000, 999999)} || '"' ||
           |  (CASE WHEN event_type = 'play'
           |        THEN ',"quality":"' || (${u("q", 1, 4)} * 240) || 'p","autoplay":' ||
           |             (CASE WHEN ${u("ap", 0, 1)} = 1 THEN 'true' ELSE 'false' END)
           |        WHEN event_type = 'finish'
           |        THEN ',"completion_rate":0.' || ${u("cr", 85, 99)}
           |        WHEN event_type = 'click'
           |        THEN ',"coordinates":{"x":' || ${u("cx", 0, 1920)} ||
           |             ',"y":' || ${u("cy", 0, 1080)} || '}'
           |        ELSE '' END) || '}' AS raw_payload
           |FROM (
           |  SELECT event_id, $et AS event_type,
           |         ${u("len", 60, 3600)} AS length_seconds
           |  FROM events)""".stripMargin
      }))
}
