package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed in BATCHED per-partition passes.
  *
  * The Spark-side plumbing is real and tested — schema (binary +
  * struct metadata), partitioning (by media kind), pooled per-partition
  * "codec" instances, batch shape (Iterator→Iterator, no per-row
  * setup) — exactly the shape a real decoder drops into. The decode
  * step itself is a DETERMINISTIC STUB (this container has no image/
  * audio libraries): it derives pixel/sample statistics from the
  * payload bytes via a seeded digest. Replace `StubCodec` with a real
  * library binding to productionize; nothing else changes.
  */
object Multimodal {

  final case class MediaMeta(
      format: String, // "png" | "wav" | "mp4" (as labeled, not parsed)
      width: Int,
      height: Int,
      durationMs: Long,
      sampleRate: Int
  )

  final case class MediaFile(
      mediaId: Long,
      kind: String, // image | audio | video
      meta: MediaMeta,
      payload: Array[Byte]
  )

  final case class MediaFeature(mediaId: Long, kind: String,
                                feature: Array[Float])

  final case class Frame(mediaId: Long, frameIdx: Int, tsMs: Long,
                         thumb: Array[Byte])

  /** A REAL canonical 44-byte RIFF/WAVE header declaring `dataLen`
    * bytes of PCM audio. The synthetic corpus appends only a short
    * tail after it (header-only synthesis: declared size, truncated
    * body) — exactly the bytes a header parser reads, without carrying
    * minutes of fake samples through the tests.
    */
  private[ops] def wavHeader(sampleRate: Int, channels: Int,
                             bitsPerSample: Int, dataLen: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val byteRate = sampleRate * channels * bitsPerSample / 8
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(byteRate)
      .putShort((channels * bitsPerSample / 8).toShort) // block align
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    bb.array()
  }

  /** Deterministic synthetic media corpus: payload bytes are a pure
    * function of (seed, id); sizes/kinds vary by id. Audio payloads
    * are genuine WAV containers (valid header, truncated body) whose
    * declared sample rate / duration equal the labeled metadata, so
    * the codec's header parse is testable against ground truth.
    */
  def syntheticMedia(spark: SparkSession, n: Long,
                     seed: Long = 42L): Dataset[MediaFile] = {
    import spark.implicits._
    val p = spark.sparkContext.defaultParallelism
    spark.range(0L, n, 1L, p).map { i =>
      val rnd = new scala.util.Random(seed * 7919L + i)
      val kind = Seq("image", "audio", "video")(rnd.nextInt(3))
      val (fmt, w, h, dur, sr) = kind match {
        case "image" => ("png", 64 + rnd.nextInt(512), 64 + rnd.nextInt(512), 0L, 0)
        case "audio" => ("wav", 0, 0, 1000L + rnd.nextInt(60000), 16000)
        case _       => ("mp4", 320, 240, 1000L + rnd.nextInt(30000), 0)
      }
      val tail = new Array[Byte](256 + rnd.nextInt(1024))
      rnd.nextBytes(tail)
      val payload =
        if (kind == "audio")
          // 16-bit mono at sr: byteRate = 2*sr; dur ms → dataLen bytes
          wavHeader(sr, 1, 16, (dur * 2 * sr / 1000).toInt) ++ tail
        else tail
      MediaFile(i, kind, MediaMeta(fmt, w, h, dur, sr), payload)
    }
  }

  /** Media table derived from a documents table: payload = the text's
    * UTF-8 bytes, metadata a pure integer-arithmetic function of
    * doc_id — deterministic AND SQL-expressible, so metadata-level
    * operators over it (mediaProfile) can be verified by a relational
    * oracle recomputing the same derivation from `documents`.
    */
  def mediaFromDocuments(docs: org.apache.spark.sql.DataFrame,
                         id: String = "doc_id",
                         text: String = "text"): Dataset[MediaFile] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(id).cast("long"), col(text)).as[(Long, String)].map {
      case (i, t) =>
        val payload = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        (i % 3) match {
          case 0 => MediaFile(i, "image",
            MediaMeta("png", (64 + (i % 8) * 64).toInt, (64 + (i % 6) * 64).toInt,
              0L, 0), payload)
          case 1 => MediaFile(i, "audio",
            MediaMeta("wav", 0, 0, 1000L + (i % 60) * 500L, 16000), payload)
          case _ => MediaFile(i, "video",
            MediaMeta("mp4", 320, 240, 1000L + (i % 30) * 1000L, 0), payload)
        }
    }
  }

  /** The per-partition "codec" — pooled once per task like the
    * reference's LLM client (/root/reference/python.py:89-111). A real
    * implementation holds native decoder handles here.
    */
  private final class StubCodec extends Serializable {
    private val md = java.security.MessageDigest.getInstance("SHA-256")

    /** STUB decode: a real codec would parse the container and return
      * pixel/sample data; this derives a deterministic 16-dim feature
      * from the payload digest so downstream plumbing is testable.
      */
    def decodeToFeature(payload: Array[Byte]): Array[Float] = {
      md.reset()
      val d = md.digest(payload)
      Array.tabulate(16) { k =>
        // map two digest bytes to [-1, 1)
        (((d(2 * k) & 0xff) << 8 | (d(2 * k + 1) & 0xff)) / 32768.0f) - 1.0f
      }
    }

    /** STUB thumbnail: real codec would decode + resample; this tags
      * the payload digest with the frame index.
      */
    def frameThumb(payload: Array[Byte], frameIdx: Int): Array[Byte] = {
      md.reset()
      md.update(payload)
      md.update(frameIdx.toByte)
      md.digest()
    }

    /** REAL container parse (not a stub): walks RIFF/WAVE chunks and
      * returns metadata from the fmt and data declarations — sample
      * rate from fmt, duration from declared data size / byte rate.
      * Reads only declared sizes, so a truncated body (or a payload
      * streamed head-first at 100 TB scale) parses fine. Returns None
      * for unrecognized containers; callers fall back to labeled
      * metadata — the production seam for the remaining formats.
      */
    def parseMeta(payload: Array[Byte]): Option[MediaMeta] = {
      if (payload.length < 44) return None
      val bb = java.nio.ByteBuffer.wrap(payload)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourCC(off: Int) = new String(payload, off, 4, "US-ASCII")
      if (fourCC(0) != "RIFF" || fourCC(8) != "WAVE") return None
      var off = 12L
      var sampleRate = 0
      var byteRate = 0
      var dataLen = -1L
      // chunk walk over the DECLARED layout (payload may be truncated);
      // Long offsets + unsigned sizes keep adversarial declarations
      // from wrapping the cursor backwards
      while (off + 8 <= payload.length && (sampleRate == 0 || dataLen < 0)) {
        val o = off.toInt
        val id = fourCC(o)
        val size = bb.getInt(o + 4).toLong & 0xffffffffL
        if (id == "fmt " && off + 24 <= payload.length) {
          sampleRate = bb.getInt(o + 12)
          byteRate = bb.getInt(o + 16)
        } else if (id == "data") {
          dataLen = size
        }
        off += 8L + size + (size & 1L) // chunks are word-aligned
      }
      if (sampleRate <= 0 || byteRate <= 0 || dataLen < 0) None
      else Some(MediaMeta("wav", 0, 0, dataLen * 1000L / byteRate, sampleRate))
    }
  }

  /** Container-header metadata extraction: one pooled codec per
    * partition; rows whose payload is a recognized container (WAV/RIFF
    * today) get their metadata REPLACED by the parsed values, others
    * keep the labeled metadata. At scale this is the "trust the bytes,
    * not the catalog" pass — pure map, no shuffle.
    */
  def withParsedMeta(media: Dataset[MediaFile]): Dataset[MediaFile] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val codec = new StubCodec
      it.map(m => codec.parseMeta(m.payload)
        .map(pm => m.copy(meta = pm)).getOrElse(m))
    }
  }

  /** Feature extraction: one pooled codec per partition, batch-shaped
    * Iterator→Iterator (the Scala analog of mapInPandas batches).
    */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val codec = new StubCodec
      it.map(m => MediaFeature(m.mediaId, m.kind,
        codec.decodeToFeature(m.payload)))
    }
  }

  /** Frame sampling: videos explode into one row per sampled frame —
    * output cardinality is data-dependent (duration / everyMs), the
    * flatMap shape a real frame grabber needs.
    */
  def sampleFrames(media: Dataset[MediaFile], everyMs: Long): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").mapPartitions { it =>
      val codec = new StubCodec
      it.flatMap { m =>
        val nFrames = math.max(1, (m.meta.durationMs / everyMs).toInt)
        (0 until nFrames).iterator.map(f =>
          Frame(m.mediaId, f, f * everyMs, codec.frameThumb(m.payload, f)))
      }
    }
  }

  /** Metadata-only profile — never deserializes `payload` (column
    * pruning keeps the binary out of the scan entirely; verified in
    * tests via the physical plan's ReadSchema).
    */
  def mediaProfile(mediaDf: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    mediaDf.groupBy("kind")
      .agg(count(lit(1)).as("n"),
        round(avg(col("meta.durationMs")), 2).as("avg_duration_ms"),
        max(col("meta.width")).as("max_width"))
}
