package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` columns with typed metadata, decode / feature-extract
  * / frame-sample as partition-local transforms.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * pluggable [[Decoder]] with a deterministic fake implementation — the
  * Spark-side plumbing (schema, batch iteration via `mapPartitions`,
  * partition sizing, feature-vector shape) is real and tested. At
  * cluster scale this is the exact shape of a GPU/codec UDF stage:
  * partition-local, no shuffle, column-pruned input, fixed-width output.
  */
object Multimodal {

  /** Typed media metadata — the part that is NOT opaque. */
  case class MediaMeta(format: String, width: Int, height: Int,
      n_frames: Int, sample_rate: Int)

  case class MediaRecord(media_id: Long, kind: String, content: Array[Byte],
      meta: MediaMeta)

  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** The decode seam. A real deployment plugs in a codec here (invoked
    * per partition — amortize model/codec init across the partition's
    * rows); tests and this container use [[FakeDecoder]]. */
  trait Decoder extends Serializable {
    /** Fixed output dimensionality (column shape is part of the schema). */
    def dims: Int
    def decode(content: Array[Byte], meta: MediaMeta): Array[Float]
  }

  /** Deterministic stand-in for a codec+encoder: per-stride byte moments.
    * Real plumbing, fake math — but EXACT math: integer byte sums per
    * residue class followed by a single float division, so the result is
    * bit-reproducible and cross-engine expressible (the DuckDB oracle for
    * `mm_features` recomputes it from the payload bytes). */
  final class FakeDecoder(val dims: Int = 8) extends Decoder {
    def decode(content: Array[Byte], meta: MediaMeta): Array[Float] = {
      val sums = new Array[Long](dims)
      var i = 0
      while (i < content.length) {
        sums(i % dims) += (content(i) & 0xff)
        i += 1
      }
      // exact: sums and 255*divisor stay < 2^24 so both are exact as
      // Float; one IEEE float division is then correctly rounded — the
      // same bits on any engine that divides float32 by float32
      val div = (255L * math.max(1, content.length / dims)).toFloat
      Array.tabulate(dims)(d => sums(d).toFloat / div)
    }
  }

  /** Real-file ingest seam: read opaque media files through Spark's
    * `binaryFile` source into the typed [[MediaRecord]] shape — kind and
    * format derived from the file extension, dimensions/frame metadata
    * left to the decode stage (a real codec fills them; the fixture
    * decoder ignores them). `glob` prunes non-media files at the source
    * (`pathGlobFilter` — no bytes are read for filtered files). */
  def fromBinaryFiles(spark: SparkSession, path: String,
      glob: String = "*"): Dataset[MediaRecord] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob).load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        val ext = p.substring(p.lastIndexOf('.') + 1).toLowerCase
        val kind = ext match {
          case "png" | "jpg" | "jpeg" | "gif" => "image"
          case "wav" | "mp3" | "flac" => "audio"
          case "mp4" | "mkv" | "webm" => "video"
          case _ => "binary"
        }
        // stable non-negative id from the path (no RNG, replay-safe)
        val id = graft.functions.PortableHash.seedLong(p)
        MediaRecord(id, kind, bytes, MediaMeta(ext, 0, 0, 1, 0))
      }
  }

  /** Deterministic fake media over the `documents` fixture: UTF-8 bytes
    * of the text play the opaque payload; metadata is derived from
    * doc_id. Gives every multimodal test a reproducible binary column. */
  def fakeMediaFromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map {
      case (id, text) =>
        val bytes = text.getBytes(StandardCharsets.UTF_8)
        val kind = if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video"
        MediaRecord(id, kind, bytes,
          MediaMeta(kind match {
            case "image" => "png"; case "audio" => "wav"; case _ => "mp4"
          }, 64 + (id % 8).toInt * 16, 64, 1 + (id % 10).toInt, 16000))
    }
  }

  case class MediaSig(media_id: Long, kind: String, sig: Long)

  /** Perceptual blockhash over the opaque payload — the pHash-family
    * stand-in, computed at the codec seam (a real pHash needs decoded
    * pixels; this deterministic form needs the raw bytes — either way
    * the signature is a partition-local map). 32 contiguous byte
    * blocks; bit b is set iff block b's byte sum is above the per-item
    * average. The comparison is an integer cross-multiply
    * (bsum * 32 > total), so there is no division and no float — the
    * signature is exact and the DuckDB oracle recomputes identical
    * bits from the payload. */
  def blockHash32(content: Array[Byte]): Long = {
    val n = content.length
    if (n == 0) return 0L
    val sums = new Array[Long](32)
    var i = 0
    while (i < n) {
      sums(((i.toLong * 32) / n).toInt) += (content(i) & 0xff)
      i += 1
    }
    var tot = 0L
    var b = 0
    while (b < 32) { tot += sums(b); b += 1 }
    var sig = 0L
    b = 0
    while (b < 32) {
      if (sums(b) * 32 > tot) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Signature stage: one 8-byte signature per media item, computed
    * partition-local at the codec seam (no shuffle). */
  def blockHashes(media: Dataset[MediaRecord]): Dataset[MediaSig] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map(r => MediaSig(r.media_id, r.kind, blockHash32(r.content)))
    }
  }

  /** Decode/feature-extract stage: partition-local batch iteration — the
    * decoder is instantiated once per partition (the expensive-init
    * pattern for codecs/models), rows stream through it. */
  def extractFeatures(media: Dataset[MediaRecord], decoder: Decoder)
      : Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition init happens here (decoder is closure-serialized;
      // a real codec would open its native context at this point)
      it.map { r =>
        MediaFeatures(r.media_id, r.kind, r.content.length.toLong,
          decoder.decode(r.content, r.meta))
      }
    }
  }

  /** Frame sampling: every `stride`-th frame of the payload, where frame
    * i is the i-th of `n_frames` equal slices (a real impl samples
    * keyframes; slicing is the deterministic stand-in). flatMap keeps it
    * partition-local — no shuffle, output fans out ≤ n_frames per row. */
  def sampleFrames(media: Dataset[MediaRecord], stride: Int): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val n = math.max(1, r.meta.n_frames)
      val sz = math.max(1, r.content.length / n)
      (0 until n by stride).map { i =>
        // both bounds clamped: when n_frames exceeds the byte count
        // (sz clamps to 1), trailing frames are empty rather than an
        // out-of-range copy
        val from = math.min(i * sz, r.content.length)
        val until = if (i == n - 1) r.content.length
          else math.max(from, math.min((i + 1) * sz, r.content.length))
        Frame(r.media_id, i, java.util.Arrays.copyOfRange(r.content, from, until))
      }
    }
  }

  /** Metadata-only resize (stub): a real impl re-encodes `content`; the
    * metadata contract — what downstream stages read — is exercised. */
  def resizeMeta(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map(r => r.copy(meta = r.meta.copy(width = w, height = h)))
  }
}
