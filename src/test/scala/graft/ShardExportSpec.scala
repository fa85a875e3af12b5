package graft

import org.apache.spark.sql.functions._

import graft.operators.ShardExport

/** Pins for the deterministic shard export (the terminal pipeline
  * stage): determinism and partitioning-invariance of the assignment,
  * the closed-form balance bound (per-shard tokens within ± one
  * maximal unit of total/N), completeness, and the contiguous-slice
  * geometry of the manifest. */
class ShardExportSpec extends SparkSpec {

  import spark.implicits._

  private val N = 8

  private def units(n: Int) = (1 to n).map { i =>
    // deterministic, lumpy token counts (1..400) exercising the bound
    ("s" + (i % 5), i.toLong, ((i * 37) % 400 + 1).toLong)
  }.toDF("source", "doc_id", "n_tokens")

  test("every unit is assigned exactly one shard in [0, N)") {
    val plan = ShardExport.shardPlan(units(300), "doc_id", "n_tokens", N)
      .select("doc_id", "shard").as[(Long, Long)].collect()
    plan.length shouldBe 300
    plan.map(_._1).distinct.length shouldBe 300
    all(plan.map(_._2)) should (be >= 0L and be < N.toLong)
  }

  test("assignment is deterministic and partitioning-invariant") {
    val base = units(300)
    val a = ShardExport.shardPlan(base, "doc_id", "n_tokens", N)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // a shuffled, re-partitioned, reversed input must produce the
    // byte-identical assignment — the seed-free interleave contract
    val permuted = base.orderBy(col("n_tokens").desc).repartition(7)
    val b = ShardExport.shardPlan(permuted, "doc_id", "n_tokens", N)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    b shouldBe a
    // and a second run of the same frame is identical too
    val c = ShardExport.shardPlan(base, "doc_id", "n_tokens", N)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    c shouldBe a
  }

  test("per-shard token sums meet the ± max-unit balance bound") {
    val df = units(300)
    val plan = ShardExport.shardPlan(df, "doc_id", "n_tokens", N)
    val perShard = plan.groupBy("shard").agg(sum("n_tokens").as("t"))
      .as[(Long, Long)].collect().toMap
    perShard.keySet shouldBe (0 until N).map(_.toLong).toSet
    val total = df.agg(sum("n_tokens")).as[Long].head()
    val maxUnit = df.agg(max("n_tokens")).as[Long].head()
    val ideal = total.toDouble / N
    for ((s, t) <- perShard)
      withClue(s"shard $s tokens $t vs ideal $ideal ± $maxUnit: ") {
        math.abs(t - ideal) should be < maxUnit.toDouble
      }
  }

  test("manifest slices are contiguous, ordered, and cover the stream") {
    val df = units(300)
    val man = ShardExport.shardManifest(
        ShardExport.shardPlan(df, "doc_id", "n_tokens", N), "n_tokens")
      .orderBy("shard")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    man.map(_._1).toSeq shouldBe (0L until N.toLong)
    val total = df.agg(sum("n_tokens")).as[Long].head()
    man.map(_._3).sum shouldBe total // token-complete
    man.map(_._2).sum shouldBe 300L  // unit-complete
    man.head._5 shouldBe 0L          // first slice starts at offset 0
    man.last._6 shouldBe total       // last slice ends at the total
    // start positions strictly increase with the shard id (each shard
    // owns a later slice of the interleaved stream); a unit may END
    // past the next bin boundary by < max-unit, but never START early
    man.sliding(2).foreach { case Array(p, n) =>
      n._5 should be >= p._5
      n._5 should be >= p._6 - df.agg(max("n_tokens")).as[Long].head()
    }
  }

  test("nShards = 1 degenerates to a single full shard") {
    val man = ShardExport.shardManifest(
        ShardExport.shardPlan(units(50), "doc_id", "n_tokens", 1),
        "n_tokens")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    man.length shouldBe 1
    man.head._1 shouldBe 0L
    man.head._2 shouldBe 50L
  }

  test("shard files round-trip: partitioned write, per-shard reload, order intact") {
    // the plan IS the ordered assignment — prove the terminal write:
    // one partitioned parquet write, N physical shard directories,
    // each reloadable independently with content and order intact
    val dir = java.nio.file.Files
      .createTempDirectory("graft-shards").toString
    val plan = ShardExport.shardPlan(units(200), "doc_id", "n_tokens", 4)
    plan.write.partitionBy("shard").mode("overwrite").parquet(dir)
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    dirs.toSeq shouldBe (0 until 4).map(i => s"shard=$i")
    val back = spark.read.parquet(dir)
      .select("source", "doc_id", "n_tokens", "cum_tokens", "shard")
      .as[(String, Long, Long, Long, Long)].collect().toSet
    back shouldBe plan
      .as[(String, Long, Long, Long, Long)].collect().toSet
    // a single shard reloads standalone and is internally ordered by
    // the global offset (what a per-shard trainer reader consumes)
    val s0 = spark.read.parquet(s"$dir/shard=0")
      .orderBy("cum_tokens")
      .as[(String, Long, Long, Long)].collect()
    s0.length should be > 0
    s0.map(_._4).toSeq shouldBe s0.map(_._4).sorted.toSeq
  }

  test("epoch order: same shards every epoch, different order each epoch, deterministic") {
    val plan = ShardExport.shardPlan(units(300), "doc_id", "n_tokens", N)
    val eo = ShardExport.epochOrder(plan, "doc_id", nEpochs = 3)
    val rows = eo.select("epoch", "shard", "doc_id", "epoch_ord")
      .as[(Long, Long, Long, Long)].collect()
    rows.length shouldBe 900 // one row per (unit, epoch)
    // shard membership is PINNED across epochs — re-ordering within
    // the fixed shards, never re-sharding
    val byEpoch = rows.groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    byEpoch.keySet shouldBe Set(0L, 1L, 2L)
    byEpoch(1L) shouldBe byEpoch(0L)
    byEpoch(2L) shouldBe byEpoch(0L)
    // each epoch's within-shard order differs from every other's (the
    // whole point), and from the assignment's cum_tokens write order
    def orderOf(e: Long): Map[Long, Seq[Long]] = rows.filter(_._1 == e)
      .groupBy(_._2).view
      .mapValues(_.sortBy(r => (r._4, r._3)).map(_._3).toSeq).toMap
    val o0 = orderOf(0L); val o1 = orderOf(1L); val o2 = orderOf(2L)
    o0 should not be o1
    o0 should not be o2
    o1 should not be o2
    val cumOrder = plan.select("shard", "doc_id", "cum_tokens")
      .as[(Long, Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    o0 should not be cumOrder
    // per-epoch determinism: a second invocation is byte-identical
    val again = ShardExport.epochOrder(plan, "doc_id", nEpochs = 3)
      .select("epoch", "shard", "doc_id", "epoch_ord")
      .as[(Long, Long, Long, Long)].collect()
    again.toSet shouldBe rows.toSet
  }

  test("zero-token units ride the plan without disturbing the bins") {
    val df = Seq(("a", 1L, 0L), ("a", 2L, 10L), ("b", 3L, 0L),
      ("b", 4L, 10L)).toDF("source", "doc_id", "n_tokens")
    val plan = ShardExport.shardPlan(df, "doc_id", "n_tokens", 2)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    plan.keySet shouldBe Set(1L, 2L, 3L, 4L)
    // the two 10-token units land in different halves of the stream
    val tokenShards = ShardExport.shardPlan(df, "doc_id", "n_tokens", 2)
      .filter(col("n_tokens") > 0).select("shard")
      .as[Long].collect().sorted.toSeq
    tokenShards shouldBe Seq(0L, 1L)
  }
}
