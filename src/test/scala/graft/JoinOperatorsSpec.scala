package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, RangeJoin}

/** As-of and interval join semantics on crafted rows, including the
  * string-key path and half-open interval boundaries. */
class JoinOperatorsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join: latest right row at or before each left ts") {
    val trades = Seq(
      ("AAPL", ts("2025-01-01 10:00:05"), 100),
      ("AAPL", ts("2025-01-01 10:00:00"), 101), // equal-ts quote matches (<=)
      ("MSFT", ts("2025-01-01 09:00:00"), 102)) // before any quote → nulls
      .toDF("sym", "trade_ts", "qty")
    val quotes = Seq(
      ("AAPL", ts("2025-01-01 10:00:00"), 1.0),
      ("AAPL", ts("2025-01-01 10:00:03"), 2.0),
      ("MSFT", ts("2025-01-01 10:00:00"), 3.0))
      .toDF("q_sym", "quote_ts", "px")

    val out = AsOfJoin.backward(trades, "sym", "trade_ts", quotes, "q_sym", "quote_ts")
      .orderBy("qty").collect()
    out.map(r => Option(r.getAs[java.lang.Double]("px"))) shouldBe
      Array(Some(2.0), Some(1.0), None) // string keys work; <= at equal ts
  }

  test("backwardWithin: matches older than the tolerance are discarded") {
    val l = Seq(("k", ts("2025-01-01 10:10:00"), 1)).toDF("sym", "l_ts", "n")
    val r = Seq(("k", ts("2025-01-01 10:00:00"), 9.0)).toDF("r_sym", "r_ts", "px")
    AsOfJoin.backwardWithin(l, "sym", "l_ts", r, "r_sym", "r_ts", 3600L)
      .head().getAs[java.lang.Double]("px") shouldBe 9.0
    AsOfJoin.backwardWithin(l, "sym", "l_ts", r, "r_sym", "r_ts", 60L)
      .head().getAs[java.lang.Double]("px") shouldBe null
  }

  test("property sweep: as-of equals naive theta-join + max_by on seeded random data") {
    val rnd = new scala.util.Random(20260812L)
    def t(off: Int) = new Timestamp(1700000000000L + off * 1000L)
    val left = (1 to 400)
      .map(i => (s"k${rnd.nextInt(8)}", t(rnd.nextInt(5000)), i.toLong))
      .toDF("k", "ts", "lid")
    val right = (1 to 300)
      .map(i => (s"k${rnd.nextInt(10)}", t(rnd.nextInt(5000)), 1000L + i))
      .toDF("rk", "rts", "rid")
      .groupBy("rk", "rts").agg(max("rid").as("rid")) // unique per (key, ts)
    val got = AsOfJoin.backward(left, "k", "ts", right, "rk", "rts")
      .select("lid", "rid")
    // the quadratic-product reference implementation (correct, unscalable)
    val naive = left
      .join(right, col("k") === col("rk") && col("rts") <= col("ts"), "left")
      .groupBy("lid")
      .agg(max_by(col("rid"), struct(col("rts"), col("rid"))).as("rid"))
    got.exceptAll(naive).count() shouldBe 0L
    naive.exceptAll(got).count() shouldBe 0L
  }

  test("property sweep: binned range join equals theta join on seeded random data") {
    val rnd = new scala.util.Random(42424242L)
    def t(off: Int) = new Timestamp(1700000000000L + off * 1000L)
    val points = (1 to 500)
      .map(i => (i.toLong, t(rnd.nextInt(20000)))).toDF("p_id", "p_ts")
    val wins = (1 to 60).map { i =>
      val s = rnd.nextInt(18000)
      (i.toLong, t(s), t(s + 1 + rnd.nextInt(4000)))
    }.toDF("w_id", "w_start", "w_end")
    val got = RangeJoin.binned(points, "p_ts", wins, "w_start", "w_end", 600L)
      .select("p_id", "w_id")
    val naive = points.join(wins,
      col("p_ts") >= col("w_start") && col("p_ts") < col("w_end"))
      .select("p_id", "w_id")
    got.exceptAll(naive).count() shouldBe 0L
    naive.exceptAll(got).count() shouldBe 0L
  }

  test("binned range join: half-open bounds, bins never duplicate pairs") {
    val points = Seq((1L, ts("2025-01-01 10:00:00")), (2L, ts("2025-01-01 11:00:00")),
      (3L, ts("2025-01-01 12:00:00"))).toDF("p_id", "p_ts")
    val wins = Seq((10L, ts("2025-01-01 10:00:00"), ts("2025-01-01 12:00:00")))
      .toDF("w_id", "w_start", "w_end")
    val out = RangeJoin.binned(points, "p_ts", wins, "w_start", "w_end", 600L)
    // start inclusive (p1), interior (p2), end exclusive (p3 out)
    out.select("p_id").as[Long].collect().sorted shouldBe Array(1L, 2L)
    out.count() shouldBe 2 // exactly one pair per (point, window)
  }
}
