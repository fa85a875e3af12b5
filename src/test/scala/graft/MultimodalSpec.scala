package graft

import graft.operators.Multimodal
import graft.operators.Multimodal._

/** Multimodal plumbing: deterministic fake media, partition-local
  * feature extraction, frame-sampling fan-out, metadata transforms. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "aaaa bbbb cccc dddd"),
    (1L, "short"),
    (2L, "the quick brown fox jumps over the lazy dog"))
    .toDF("doc_id", "text")

  private lazy val media = Multimodal.fakeMediaFromDocuments(docs)

  test("fake media: deterministic binary + typed metadata") {
    val rows = media.collect().sortBy(_.media_id)
    rows.map(_.kind) shouldBe Array("image", "audio", "video")
    rows(0).content shouldBe "aaaa bbbb cccc dddd".getBytes("UTF-8")
    rows(0).meta.format shouldBe "png"
    // determinism across evaluations
    media.collect().sortBy(_.media_id).map(_.meta) shouldBe rows.map(_.meta)
  }

  test("extractFeatures: fixed-width vectors, byte counts, per-partition decode") {
    val feats = Multimodal.extractFeatures(media.repartition(2), new FakeDecoder(8))
      .collect().sortBy(_.media_id)
    feats.map(_.features.length).toSet shouldBe Set(8)
    feats(0).n_bytes shouldBe 19L
    // same input bytes → same features regardless of partitioning
    val feats1 = Multimodal.extractFeatures(media.repartition(1), new FakeDecoder(8))
      .collect().sortBy(_.media_id)
    feats.map(_.features.toSeq) shouldBe feats1.map(_.features.toSeq)
  }

  test("sampleFrames: stride sampling covers all bytes at stride 1") {
    val frames = Multimodal.sampleFrames(media, stride = 1).collect()
      .groupBy(_.media_id)
    // doc 2 has n_frames = 3 → 3 frames, concat == original bytes
    val f2 = frames(2L).sortBy(_.frame_idx)
    f2.length shouldBe 3
    f2.flatMap(_.frame_bytes) shouldBe
      "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    // stride 2 halves the fan-out (ceil)
    Multimodal.sampleFrames(media, stride = 2).collect()
      .count(_.media_id == 2L) shouldBe 2
  }

  test("mm_knn composition: k neighbors per query, scores in [-1,1]") {
    val out = graft.SparkEntry.queries("mm_knn")(spark, "/root/testdata/sf0.001")
      .collect()
    out should not be empty
    out.groupBy(_.getAs[Long]("query_id")).values
      .foreach(_.length should be <= 5)
    out.foreach { r =>
      val c = r.getAs[Double]("cos9")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cos9=$c")
    }
    // rank contract: within each query, rank is 1..k and scores are
    // non-increasing along it (brute force IS the exact baseline — what
    // we pin is that the reported ranking honors the scores)
    out.groupBy(_.getAs[Long]("query_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      sorted.map(_.getAs[Long]("rank")).toSeq shouldBe
        (1L to sorted.length.toLong)
      val scores = sorted.map(_.getAs[Double]("cos9")).toSeq
      scores.zip(scores.tail).foreach { case (a, b) => a should be >= b }
    }
  }

  test("resizeMeta rewrites the metadata contract only") {
    val r = Multimodal.resizeMeta(media, 32, 32).collect().sortBy(_.media_id)
    r.foreach { m => m.meta.width shouldBe 32; m.meta.height shouldBe 32 }
    val orig = media.collect().sortBy(_.media_id)
    r(0).content shouldBe orig(0).content
  }

  test("streaming media ingest equals the batch features+signature join") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val d = "/root/testdata/sf0.001"
    val recs = Multimodal.fakeMediaFromDocuments(
        graft.ingest.Tables.documents(spark, d).limit(100))
      .collect().toIndexedSeq
    val dec = new Multimodal.FakeDecoder(8)
    val expected = {
      val feats = Multimodal.extractFeatures(
        spark.createDataset(recs), dec).collect()
      val sigs = Multimodal.blockHashes(spark.createDataset(recs))
        .collect().map(s => s.media_id -> s.sig).toMap
      feats.map(f => (f.media_id, f.kind, f.n_bytes,
        f.features.toSeq, sigs(f.media_id))).toSet
    }
    expected should not be empty

    val in = MemoryStream[Multimodal.MediaRecord]
    val q = graft.streaming.StreamingMedia.ingestStream(in.toDS(), dec)
      .writeStream.format("memory").queryName("smedia")
      .outputMode("append").start()
    recs.grouped(30).foreach { c => in.addData(c); q.processAllAvailable() }
    q.stop()

    import graft.streaming.StreamingMedia.MediaIngest
    val got = spark.table("smedia").as[MediaIngest].collect()
      .map(r => (r.media_id, r.kind, r.n_bytes, r.features.toSeq, r.sig))
      .toSet
    got shouldBe expected
  }
}
