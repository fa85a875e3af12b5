package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.queries.WarehouseQueries

/** Semantics of the warehouse-maintenance operators on the sf0.001
  * fixtures (invariants, not oracle hashes — the DuckDB gate covers
  * value exactness at sf0.01). */
class WarehouseQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = WarehouseQueries.defs(name).build(spark, sf)

  test("cdc_scd2: versions chain per key — one current, contiguous bounds") {
    val h = q("cdc_scd2").cache()
    // exactly one open (current) version per key
    val perKey = h.groupBy("content_id")
      .agg(count(lit(1)).as("n"), sum(when(col("is_current"), 1).otherwise(0)).as("n_cur"))
    perKey.filter(col("n_cur") =!= 1).count() shouldBe 0L
    // every closed version's valid_to equals some later version's
    // valid_from of the same key (the chain has no gaps), and bounds
    // never invert
    h.filter(col("valid_to").isNotNull && col("valid_to") < col("valid_from"))
      .count() shouldBe 0L
    val chained = h.as("a").join(h.as("b"),
      col("a.content_id") === col("b.content_id") &&
        col("a.valid_to") === col("b.valid_from"), "left_semi")
    chained.count() shouldBe h.filter(col("valid_to").isNotNull).count()
    h.unpersist()
  }

  test("op_merge_upsert: action partition matches the source construction") {
    val m = q("op_merge_upsert").cache()
    val orders = graft.ingest.Tables.orders(spark, sf).cache()
    val n = orders.count()
    val nUpd = orders.filter(col("o_orderkey") % 10 === 0).count()
    val nIns = orders.filter(col("o_orderkey") % 17 === 0).count()
    m.filter(col("action") === "update").count() shouldBe nUpd
    m.filter(col("action") === "insert").count() shouldBe nIns
    m.filter(col("action") === "keep").count() shouldBe n - nUpd
    // inserted rows carry the source status and no target price
    m.filter(col("action") === "insert")
      .filter(col("status") =!= "NEW" || col("totalprice").isNotNull)
      .count() shouldBe 0L
    m.unpersist(); orders.unpersist()
  }

  test("op_sessionize: sessions partition events; intra-session gaps ≤ 30 min") {
    val s = q("op_sessionize").cache()
    val events = graft.ingest.Tables.events(spark, sf)
    // session event counts sum to the event count
    s.agg(sum("n_events")).head().getLong(0) shouldBe events.count()
    // session bounds are ordered and sessions of a user never overlap
    s.filter(col("session_end") < col("session_start")).count() shouldBe 0L
    val overlapping = s.as("a").join(s.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("a.session_no") < col("b.session_no") &&
        col("b.session_start") <= col("a.session_end"))
    overlapping.count() shouldBe 0L
    // consecutive sessions are separated by MORE than the 30-min gap
    val gaps = s.as("a").join(s.as("b"),
      col("a.user_id") === col("b.user_id") &&
        col("b.session_no") === col("a.session_no") + 1)
      .select((col("b.session_start").cast("long") -
        col("a.session_end").cast("long")).as("gap_s"))
    gaps.filter(col("gap_s") <= 30 * 60).count() shouldBe 0L
    s.unpersist()
  }

  test("op_sessionize on a crafted stream: exact session boundaries") {
    import spark.implicits._
    val ts = (m: Int) => Timestamp.valueOf(f"2025-01-01 10:$m%02d:00")
    val df = Seq(
      (1L, ts(0), 10L), (1L, ts(20), 11L), (1L, ts(55), 12L), // gap 35' → new
      (2L, ts(5), 20L))
      .toDF("user_id", "ts", "event_id")
    df.createOrReplaceTempView("events")
    val out = spark.sql(WarehouseQueries.defs("op_sessionize").oracle.get)
      .orderBy("user_id", "session_no").collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L))
  }

  test("op_histogram: buckets clamp to [0,19] and counts sum to the table") {
    val h = q("op_histogram").cache()
    h.filter(col("bucket") < 0 || col("bucket") > 19).count() shouldBe 0L
    h.agg(sum("n")).head().getLong(0) shouldBe
      graft.ingest.Tables.events(spark, sf).count()
    h.unpersist()
  }

  test("rel_division: every returned customer covers all priorities") {
    val orders = graft.ingest.Tables.orders(spark, sf)
    val all = orders.select(countDistinct("o_orderpriority")).head().getLong(0)
    val div = q("rel_division")
    div.filter(col("n_prios") =!= all).count() shouldBe 0L
    // complement check: a customer NOT returned misses at least one class
    val returned = div.select(col("o_custkey")).cache()
    val missing = orders.join(returned, Seq("o_custkey"), "left_anti")
      .groupBy("o_custkey").agg(countDistinct("o_orderpriority").as("np"))
    missing.filter(col("np") === all).count() shouldBe 0L
    returned.unpersist()
  }

  test("containmentSorted: subset scores 1.0 regardless of size ratio") {
    import spark.implicits._
    val df = Seq(("a b c", "z a b c d e f g h i j k")).toDF("x", "y")
    val c = df.select(Dedup.containmentSorted(
      Dedup.hashedShingles(col("x"), 1),
      Dedup.hashedShingles(col("y"), 1)).as("c"))
      .as[Double].head()
    c shouldBe 1.0
    // while Jaccard on the same pair is far below any dedup threshold
    val j = df.select(Dedup.jaccardSorted(
      Dedup.hashedShingles(col("x"), 1),
      Dedup.hashedShingles(col("y"), 1)).as("j"))
      .as[Double].head()
    j should be < 0.3
  }

  test("dedup_containment returns pairs within (0,1] above threshold") {
    val p = q("dedup_containment").cache()
    p.filter(col("containment") < 0.2 || col("containment") > 1.0)
      .count() shouldBe 0L
    p.filter(col("a") >= col("b")).count() shouldBe 0L
    p.unpersist()
  }
}
