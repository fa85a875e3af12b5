package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PortableHash._

/** Deterministic reproduction of the reference's load-generator
  * distributions (SURVEY.md §2.8, `generator.py`) as pure column
  * expressions — the fixture/e2e-test generator of this engine.
  *
  * Where the reference draws from `random.random()`, every draw here is
  * a [[graft.functions.PortableHash]] value of a labeled counter, so the
  * output is identical across engines (DuckDB oracle), runs, and
  * partitionings — and generation is map-only (embarrassingly parallel
  * over `spark.range` at any scale).
  *
  * Distributions reproduced:
  *  - G1 weighted event types: play .45 / pause .25 / click .20 /
  *    finish .10 (`generator.py:49-55`);
  *  - G2 conditional duration: click → NULL; play → U(5%,95%)·len;
  *    pause → U(10%,80%); finish → U(85%,100%) (`generator.py:93-110`);
  *  - G3 uniform picks: content, user pool, device
  *    (`generator.py:117-135`) — including the reference's off-by-one
  *    null-device quirk (`sql/init.sql:104`, 1-in-7 here);
  *  - G4 nested JSON payload with per-type extras (`generator.py:137-161`).
  */
object DataGen {

  /** Uniform integer in [lo, hi] from a labeled hash of `id`. */
  private def u(id: Column, label: String, lo: Long, hi: Long): Column =
    lit(lo) + pmod(hash60(concat(lit(label + "-"), id)), lit(hi - lo + 1))

  /** G1 — weighted categorical pick. */
  def eventType(id: Column): Column = {
    val r = u(id, "et", 0, 99)
    when(r < 45, "play").when(r < 70, "pause")
      .when(r < 90, "click").otherwise("finish")
  }

  /** G3 — content length in seconds (stand-in for the dimension's
    * `length_seconds`), uniform 60..3600. */
  def lengthSeconds(id: Column): Column = u(id, "len", 60, 3600)

  /** G2 — duration_ms conditional on event type: percentage-of-length
    * windows in integer permille for exactness. */
  def durationMs(id: Column, etype: Column, lenSec: Column): Column = {
    val permille = (lo: Long, hi: Long) => u(id, s"dur-$lo-$hi", lo, hi)
    val ms = (p: Column) => (lenSec * p).cast("long") // len·permille = ms·(1000/1000)
    when(etype === "click", lit(null).cast("long"))
      .when(etype === "play", ms(permille(50, 950)))
      .when(etype === "pause", ms(permille(100, 800)))
      .otherwise(ms(permille(850, 1000)))
  }

  /** G3 + G5 — device pick with the reference's null quirk (index
    * overflow one time in 7). */
  def device(id: Column): Column = {
    val devices = Seq("ios", "android", "web", "tv", "tablet", "desktop")
    val r = u(id, "dev", 0, 6)
    when(r === 6, lit(null).cast("string"))
      .otherwise(element_at(array(devices.map(lit): _*), (r + 1).cast("int")))
  }

  /** G4 — nested JSON payload: base fields + per-type extras, built by
    * deterministic concat (identical text cross-engine). */
  def rawPayload(id: Column, etype: Column): Column = {
    val session = u(id, "sess", 100000, 999999)
    val base = concat(lit("{\"source\":\"app\",\"session_id\":\""), session, lit("\""))
    val extras =
      when(etype === "play",
        concat(lit(",\"quality\":\""), u(id, "q", 1, 4) * 240, lit("p\",\"autoplay\":"),
          when(u(id, "ap", 0, 1) === 1, "true").otherwise("false")))
      .when(etype === "finish",
        concat(lit(",\"completion_rate\":0."), u(id, "cr", 85, 99)))
      .when(etype === "click",
        concat(lit(",\"coordinates\":{\"x\":"), u(id, "cx", 0, 1920),
          lit(",\"y\":"), u(id, "cy", 0, 1080), lit("}")))
      .otherwise(lit(""))
    concat(base, extras, lit("}"))
  }

  /** Synthetic POWER-LAW edge fixture — the graph on which
    * `graph_skew_audit`'s flag genuinely fires (the fixture co-purchase
    * graph is benign: its top hub holds ~18 bp of the shuffled join
    * input, an order of magnitude under the 1562.5 bp line, so the
    * flag path — and the [[Graph.skewSplitJoin]] mitigation behind
    * it — would otherwise only ever run against empty hub sets).
    * src = bit-length of the event id: key k carries the 2^(k−1) ids
    * of that bit width, so the top key holds up to HALF the edges
    * (4096 bp at the sf0.01 id span) — a deterministic geometric hub
    * ladder with no RNG, replayable in the oracle as
    * `length(bin(event_id))` (both engines render minimal-width
    * binary). Map-only over the events scan; the id span (and with it
    * the hub ladder's depth) scales with SF. */
  def powerLawEdges(events: DataFrame): DataFrame =
    events.select(length(bin(col("event_id"))).cast("long").as("src"),
      pmod(col("event_id"), lit(997)).cast("long").as("dst"))

  /** The full generated event stream over ids drawn from a driving
    * DataFrame column (map-only; at 100 TB this is `spark.range(n)`
    * across executors with zero shuffle). */
  def events(ids: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    ids.select(id.as("gen_id"))
      .withColumn("event_type", eventType(col("gen_id")))
      .withColumn("length_seconds", lengthSeconds(col("gen_id")))
      .withColumn("duration_ms",
        durationMs(col("gen_id"), col("event_type"), col("length_seconds")))
      .withColumn("device", device(col("gen_id")))
      .withColumn("raw_payload", rawPayload(col("gen_id"), col("event_type")))
  }
}
