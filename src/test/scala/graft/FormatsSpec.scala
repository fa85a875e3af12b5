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

  test("malformed CSV rows: PERMISSIVE captures, DROPMALFORMED discards") {
    val dir = Files.createTempDirectory("fmt-badcsv")
    Files.write(dir.resolve("part.csv"),
      "id,n\n1,10\nnot_a_number,oops,extra\n3,30\n".getBytes("UTF-8"))
    val schema = "id LONG, n LONG, _corrupt STRING"
    val permissive = spark.read
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(schema).csv(dir.toString)
    // corrupt row survives with the raw line in the corrupt column
    val rows = permissive.collect()
    rows.length shouldBe 3
    rows.count(_.getAs[String]("_corrupt") != null) shouldBe 1
    val dropped = spark.read
      .option("header", "true").option("mode", "DROPMALFORMED")
      .schema("id LONG, n LONG").csv(dir.toString)
    // collect, not count: under count() Catalyst prunes every column, so
    // the CSV parser never materializes the bad tokens and the malformed
    // row silently survives — a real operational gotcha worth pinning
    dropped.collect().length shouldBe 2
  }

  test("parquet schema evolution: mergeSchema unions batch schemas") {
    val dir = Files.createTempDirectory("fmt-evolve").toString
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v1").write.mode("append").parquet(dir)
    Seq((2L, 3.5)).toDF("id", "v2").write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    merged.columns.sorted.toSeq shouldBe Seq("id", "v1", "v2")
    merged.count() shouldBe 2
    // old-batch rows read null for the new column, and vice versa
    merged.filter(col("v1").isNotNull).count() shouldBe 1
    merged.filter(col("v2").isNotNull).count() shouldBe 1
  }

  test("binaryFile source ingests opaque media files with metadata columns") {
    // the multimodal ingest seam: raw media arrives as files, Spark
    // reads them as (path, modificationTime, length, content) — the
    // binary column then flows into Multimodal.extractFeatures
    val dir = Files.createTempDirectory("fmt-bin")
    val payloads = Map("a.png" -> Array[Byte](1, 2, 3, 4),
      "b.wav" -> "RIFFdata".getBytes("UTF-8"))
    payloads.foreach { case (name, bytes) =>
      Files.write(dir.resolve(name), bytes)
    }
    val df = spark.read.format("binaryFile").load(dir.toString)
    df.count() shouldBe 2
    df.columns.toSet shouldBe Set("path", "modificationTime", "length", "content")
    val byName = df.collect().map { r =>
      val p = r.getAs[String]("path")
      p.substring(p.lastIndexOf('/') + 1) ->
        (r.getAs[Long]("length"), r.getAs[Array[Byte]]("content"))
    }.toMap
    byName("a.png")._1 shouldBe 4L
    byName("a.png")._2 shouldBe payloads("a.png")
    byName("b.wav")._2 shouldBe payloads("b.wav")
    // pathGlobFilter prunes non-matching media at the source
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.png").load(dir.toString)
      .count() shouldBe 1
    // and the typed library seam on top of it: extension-derived kind,
    // path-hash id, payload flows into the decode stage unchanged
    val media = graft.operators.Multimodal
      .fromBinaryFiles(spark, dir.toString).collect()
      .map(m => m.kind -> m).toMap
    media("image").content shouldBe payloads("a.png")
    media("audio").meta.format shouldBe "wav"
    val feats = graft.operators.Multimodal.extractFeatures(
      graft.operators.Multimodal.fromBinaryFiles(spark, dir.toString),
      new graft.operators.Multimodal.FakeDecoder(8)).collect()
    feats.map(_.features.length).toSet shouldBe Set(8)
  }
}
