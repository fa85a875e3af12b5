package graft.streaming

import org.apache.spark.sql.Dataset

import graft.operators.Multimodal

/** Streaming media-ingest twin — the multimodal arrival path: each
  * arriving [[Multimodal.MediaRecord]] pays metadata typing,
  * decode/feature-extract, and the perceptual block-hash signature in
  * ONE stateless partition-local pass (the micro-batch form of the
  * batch `mm_binary_meta` / `mm_features` / phash-signature stages,
  * per-record kernels verbatim — `Decoder.decode` and
  * [[Multimodal.blockHash32]]). The decoder is closure-serialized and
  * touched once per partition, so a real codec opens its native
  * context per task, not per record.
  *
  * No shuffle, no state: at 100 TB ingest rates this is exactly the
  * GPU/codec UDF stage shape — partition-local, column-pruned input,
  * fixed-width output — and throughput scales with input partitions
  * alone. MultimodalSpec pins the streamed rows identical to the batch
  * features+signature join on the same records.
  */
object StreamingMedia {

  /** One ingested media row: typed metadata + decoded feature vector +
    * perceptual signature — everything downstream dedup/kNN stages
    * key on, emitted in a single pass over the opaque payload. */
  case class MediaIngest(media_id: Long, kind: String, format: String,
      n_bytes: Long, features: Array[Float], sig: Long)

  def ingestStream(media: Dataset[Multimodal.MediaRecord],
      decoder: Multimodal.Decoder): Dataset[MediaIngest] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init point (the expensive-codec pattern)
      it.map { r =>
        MediaIngest(r.media_id, r.kind, r.meta.format,
          r.content.length.toLong,
          decoder.decode(r.content, r.meta),
          Multimodal.blockHash32(r.content))
      }
    }
  }
}
