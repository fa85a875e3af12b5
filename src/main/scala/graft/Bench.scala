package graft
import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

object Bench {
  /** Force FULL evaluation of every output column via the no-op sink.
    * `.count()` would let Catalyst prune unused projections, so map-only
    * queries would time the scan instead of their expression work. */
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Headline queries reported per-query on the metric line. The driver
    * captures only the LAST 2000 bytes of output, so the line must stay
    * compact — every other registered query still runs (and counts into
    * `value`), with its timing written to bench_detail.json instead.
    * The set spans each family: the CDC pipeline stages the reference's
    * SLOs are defined over, the TPC-H-shaped heavy hitters, the dedup /
    * similarity / text LLM-pipeline operators, and the custom-plan ops. */
  private val Headline: Seq[String] = Seq(
    "cdc_parse_roundtrip", "cdc_enrich", "cdc_leaderboard",
    "cdc_content_stats", "cdc_minute_windows", "cdc_warehouse_hour",
    "rel_pricing_summary", "rel_order_revenue", "rel_nation_revenue",
    "rel_window_funcs", "adv_grouping_sets",
    "dedup_exact", "dedup_minhash_pairs", "dedup_embedding_cosine",
    "dedup_components", "curate_corpus",
    "sim_knn_brute", "sim_knn_lsh", "sim_knn_ivf", "sim_ann_recall",
    "curate_token_budget", "dedup_keeper_election",
    "text_quality", "text_langid", "op_asof_join", "op_funnel")

  /** How many of the slowest queries get their formatted plan dumped to
    * bench_plans.txt, so a reviewer can audit the expensive plans from the
    * bench artifact without re-running anything. */
  private val PlanDumpTop = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // A stale detail file from a prior run must not masquerade as this
    // run's results if the run (or the final write) fails mid-way.
    try {
      Files.deleteIfExists(Paths.get("bench_detail.json"))
      Files.deleteIfExists(Paths.get("bench_plans.txt"))
    } catch { case _: Throwable => () }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    val known = queries.map(_._1).toSet
    // A renamed query must not silently fall off the metric line.
    val missingHeadline = Headline.filterNot(known)
    if (missingHeadline.nonEmpty)
      System.err.println(
        s"WARN bench: headline names missing from registry: ${missingHeadline.mkString(",")}")
    // Untimed warm-up: JVM/codegen/session init and parquet footer reads
    // are one-time costs, not any query's cost.
    try { force(SparkEntry.queries("cdc_enrich")(spark, sfDir)) }
    catch { case _: Throwable => () }
    // Two INTERLEAVED passes over the full query list (pass 1 runs every
    // query, then pass 2 runs every query), per-query min. Back-to-back
    // repeats of one query share any transient machine-load spike, so min
    // didn't defend against contention (round-4 artifact recorded 13.77s
    // for a 1.6s query). With passes minutes apart, a spike inflates one
    // pass's sample, not both — and both samples land in bench_detail.json
    // so a reviewer can see the variance.
    // A query that throws must not masquerade as a fast query: its
    // timing is recorded, but so is the failure — on stderr and in the
    // metric line's errors count.
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    def pass(): Map[String, Double] = queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { force(fn(spark, sfDir)) } catch {
        case e: Throwable =>
          if (failed.add(name))
            System.err.println(s"WARN bench: $name failed: ${e.getClass.getName}: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }.toMap
    val run1 = pass()
    val run2 = pass()
    val results = queries.map { case (name, _) =>
      name -> math.min(run1(name), run2(name))
    }
    def sec3(v: Double): String = f"$v%.3f"
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // End-to-end pipeline throughput (BASELINE.md's rec/s SLO): CDC JSON
    // → parse → enrich → all four views, one shared enriched pass.
    val (rows, rps) = try {
      // materialize the serialized CDC messages BEFORE the clock starts:
      // producing them is the generator/Kafka side's cost — the pipeline
      // under measurement begins at the raw message bytes.
      val raw = graft.queries.CdcQueries.jsonMessages(
        graft.queries.CdcMapping.fact(spark, sfDir)).persist()
      raw.count()
      val t0 = System.nanoTime()
      val parsed = graft.ingest.DebeziumParser
        .parse(raw, graft.queries.CdcQueries.fixtureRowSchema).rows
        .withColumn("event_ts", graft.ingest.DebeziumParser
          .parseTimestampMicros(org.apache.spark.sql.functions.col("event_ts")))
      val enriched = graft.enrich.Enrichment
        .enrich(parsed, graft.queries.CdcMapping.dim(spark, sfDir)).rows.persist()
      val n = enriched.count()
      force(graft.views.EngagementViews.leaderboard(enriched, 100))
      force(graft.views.EngagementViews.contentStats(enriched))
      force(graft.views.EngagementViews.userContentLatest(enriched))
      force(graft.views.EngagementViews.minuteWindows(enriched))
      enriched.unpersist()
      raw.unpersist()
      val dt = (System.nanoTime() - t0) / 1e9
      (n, n / dt)
    } catch { case _: Throwable => (0L, 0.0) }
    // Full per-query detail (min + both raw passes) goes to a file — the
    // stdout metric line is tail-captured by the caller with a 2000-byte
    // window, and 100+ query entries overflowed it (rounds 1-3 parsed as
    // null).
    def jsonMap(m: Map[String, Double]): String = queries
      .map { case (k, _) => s"\"" + k + "\":" + sec3(m(k)) }
      .mkString("{", ",", "}")
    try Files.write(Paths.get("bench_detail.json"),
      (s"""{"total":${sec3(total)},"queries":${jsonMap(results.toMap)},""" +
        s""""run1":${jsonMap(run1)},"run2":${jsonMap(run2)},"sf":"$sfDir"}""")
        .getBytes(StandardCharsets.UTF_8))
    catch {
      case e: Throwable =>
        System.err.println(s"WARN bench: bench_detail.json write failed: $e")
    }
    // Formatted plans of the slowest queries, for offline plan review.
    try {
      val slowest = results.sortBy(-_._2).take(PlanDumpTop)
      val buf = new ByteArrayOutputStream()
      val ps = new PrintStream(buf, true, "UTF-8")
      slowest.foreach { case (name, t) =>
        ps.println(s"== $name (min ${sec3(t)}s; runs ${sec3(run1(name))}s / ${sec3(run2(name))}s) ==")
        try Console.withOut(ps) {
          SparkEntry.queries(name)(spark, sfDir).explain("formatted")
        } catch { case e: Throwable => ps.println(s"(explain failed: $e)") }
        ps.println()
      }
      Files.write(Paths.get("bench_plans.txt"), buf.toByteArray)
    } catch {
      case e: Throwable =>
        System.err.println(s"WARN bench: bench_plans.txt write failed: $e")
    }
    val byName = results.toMap
    val qs = Headline.flatMap(n => byName.get(n).map(v => s"\"$n\":" + sec3(v)))
      .mkString("{", ",", "}")
    // BASELINE.md gates, surfaced directly: leaderboard micro-batch
    // latency (≤10 s target) and pipeline rec/s (≥1,667 target).
    val lbSec = byName.getOrElse("cdc_leaderboard", -1.0)
    val metricLine =
      s"""{"metric":"total","value":${sec3(total)},"unit":"sec","queries":$qs,""" +
        s""""queries_run":${results.size},"errors":${failed.size},""" +
        s""""pipeline_rows":$rows,"pipeline_rps":${rps.round},""" +
        s""""leaderboard_batch_sec":${sec3(lbSec)},"sf":"$sfDir"}"""
    // The metric line must be the LAST line of stdout (the driver tail-
    // captures and parses the final {...} line): silence Spark first, stop
    // the session (its shutdown logging, if any, lands before the line),
    // then print and flush.
    spark.sparkContext.setLogLevel("ERROR")
    spark.stop()
    System.out.println(metricLine)
    System.out.flush()
  }
}
