package graft.queries

import org.apache.spark.sql.functions._

import graft.ingest.Tables
import graft.operators.Multimodal

/** Multimodal plumbing queries over the deterministic fake media derived
  * from `documents` (the container ships no codecs — the decode step is
  * stubbed, the Spark plumbing is real; see [[Multimodal]]).
  * `mm_binary_meta` is DuckDB-oracled; the mapPartitions stages are
  * rows-only checks (not SQL-expressible) covered by MultimodalSpec.
  */
object MultimodalQueries {

  val defs: Map[String, QueryDef] = Map(

    // Opaque-binary metadata surface: byte length + content digest.
    "mm_binary_meta" -> QueryDef(
      (s, d) => Tables.documents(s, d).select(
        col("doc_id").as("media_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        md5(col("text")).as("content_md5")),
      """SELECT doc_id AS media_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio'
        |       ELSE 'video' END AS kind,
        |  strlen(text) AS n_bytes,
        |  md5(text) AS content_md5
        |FROM documents""".stripMargin),

    // Partition-local decode/feature-extract (stubbed codec, real
    // batching) — rows-only check.
    "mm_features" -> QueryDef(
      (s, d) => Multimodal.extractFeatures(
        Multimodal.fakeMediaFromDocuments(Tables.documents(s, d)),
        new Multimodal.FakeDecoder(8)).toDF(),
      None),

    // Frame sampling fan-out — rows-only check on (media, frame) shape.
    "mm_frames" -> QueryDef(
      (s, d) => Multimodal.sampleFrames(
        Multimodal.fakeMediaFromDocuments(Tables.documents(s, d)), stride = 2)
        .toDF()
        .select(col("media_id"), col("frame_idx"),
          octet_length(col("frame_bytes")).cast("long").as("n_bytes")),
      None),

    // Composition: decoded media features → similarity search (the
    // image-dedup/retrieval pipeline shape: decode partition-locally,
    // then the candidate-pruned ANN machinery takes over). Rows-only
    // (the decoder is not SQL-expressible); shape pinned in spec.
    "mm_knn" -> QueryDef(
      (s, d) => {
        val feats = Multimodal.extractFeatures(
          Multimodal.fakeMediaFromDocuments(Tables.documents(s, d)),
          new Multimodal.FakeDecoder(8)).toDF()
          .select(col("media_id"),
            transform(col("features"), x => round(x.cast("double") * 1000)).as("qv"))
        graft.operators.Similarity.knnBruteForce(
          feats.filter(pmod(col("media_id"), lit(25)) === 0), feats,
          "media_id", "qv", 5)
          .withColumn("rank", col("rank").cast("long"))
      },
      None))
}
