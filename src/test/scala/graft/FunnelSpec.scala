package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.plans.Funnel

/** The custom FunnelMatch operator: logical node → strategy → sorted
  * sweep. Pins semantics against hand-computed cases, equivalence with
  * the composed three-join funnel, and the one-shuffle plan shape. */
class FunnelSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def steps = Seq(
    col("event_type") === "view",
    col("event_type") === "click",
    col("event_type") === "purchase")

  test("sweep semantics: earliest chain, strictly increasing timestamps") {
    import spark.implicits._
    val events = Seq(
      // u1 completes all three in order
      ("u1", "view", ts("2025-01-01 10:00:00")),
      ("u1", "click", ts("2025-01-01 10:01:00")),
      ("u1", "purchase", ts("2025-01-01 10:02:00")),
      // u2: click BEFORE first view never counts; none after
      ("u2", "click", ts("2025-01-01 09:00:00")),
      ("u2", "view", ts("2025-01-01 10:00:00")),
      // u3: same-timestamp click does not satisfy "strictly after"
      ("u3", "view", ts("2025-01-01 10:00:00")),
      ("u3", "click", ts("2025-01-01 10:00:00")),
      // u4 never enters the funnel
      ("u4", "purchase", ts("2025-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts").repartition(4)

    val out = Funnel.funnel(events, "user_id", "ts", steps)
      .collect().map(r => r.getString(0) ->
        (r.get(1) != null, r.get(2) != null, r.get(3) != null)).toMap

    out.keySet shouldBe Set("u1", "u2", "u3") // u4 never viewed
    out("u1") shouldBe ((true, true, true))
    out("u2") shouldBe ((true, false, false))
    out("u3") shouldBe ((true, false, false))
  }

  test("agrees with the composed three-join funnel on the fixture") {
    val d = "/root/testdata/sf0.001"
    val native = SparkEntry.queries("op_funnel_native")(spark, d).head()
    val composed = SparkEntry.queries("op_funnel")(spark, d).head()
    native shouldBe composed
  }

  test("plans one exchange + one sort, whatever the step count") {
    val events = graft.ingest.Tables.events(spark, "/root/testdata/sf0.001")
    val p = Funnel.funnel(events, "user_id", "ts", steps)
      .queryExecution.executedPlan.toString
    p should include("Funnel") // FunnelExec prints with Exec stripped
    p.linesIterator.count(_.contains("Exchange")) shouldBe 1
    p.linesIterator.count(_.trim.startsWith("+- Sort")) shouldBe 1
  }
}
