package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.CdcMapping

/** Source/sink format breadth: the enriched output round-trips through
  * ORC, CSV and JSON (the reference has no file formats at all; parquet
  * is the primary path everywhere else in this engine). */
class FormatsSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("enriched rows round-trip through orc, csv and json") {
    val enriched = CdcMapping.enriched(spark, d)
      .select("event_id", "content_id", "event_type", "event_ts",
        "duration_ms", "engagement_seconds", "engagement_pct")
    val n = enriched.count()

    val orc = Files.createTempDirectory("fmt-orc").toString
    enriched.write.mode("overwrite").orc(orc)
    spark.read.orc(orc).count() shouldBe n
    spark.read.orc(orc).schema shouldBe enriched.schema

    val csv = Files.createTempDirectory("fmt-csv").toString
    enriched.write.mode("overwrite").option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(csv)
    val backCsv = spark.read.option("header", "true").schema(enriched.schema)
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS").csv(csv)
    backCsv.count() shouldBe n
    backCsv.agg(sum("duration_ms")).head().getLong(0) shouldBe
      enriched.agg(sum("duration_ms")).head().getLong(0)

    val json = Files.createTempDirectory("fmt-json").toString
    enriched.write.mode("overwrite").json(json)
    spark.read.schema(enriched.schema).json(json).count() shouldBe n
  }
}
