package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Multimodal decode / feature-extraction plumbing.
  *
  * The decode kernel itself is a STUB — this container has no image/
  * audio/video codecs — but it is a *deterministic* stub (every "decoded"
  * property is derived from the MD5 digest of the payload bytes), so the
  * surrounding Spark machinery is fully testable: schema contracts,
  * per-partition kernel reuse, batch shape, null/short-payload handling.
  * Deriving from MD5 (rather than a private hash) also makes the stub
  * reproducible by an external SQL engine, so the feature queries are
  * oracle-checkable end to end. A real decoder (JNI/FFI to a codec lib)
  * replaces ONLY `decodeWith`.
  *
  * Scale: both operators run as `mapPartitions` — the kernel (here the
  * MessageDigest instance, standing in for a codec context / model
  * handle) is created ONCE per partition and reused across its rows,
  * which is where a real codec amortizes library/model load. Rows
  * stream through; no collect. Output schema is fixed-width →
  * columnar-friendly.
  */
object MediaDecode {

  /** Fake "decoded media" metadata + an 8-dim feature vector. */
  case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int,
      features: Array[Double])

  val outputSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("features", ArrayType(DoubleType, containsNull = false))))

  private val hexDigits = "0123456789abcdef".toCharArray

  private[graft] def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >>> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Everything the stub kernel decodes from one payload, including
    * `contentId` — the content fingerprint (here the md5 digest hex)
    * that downstream stages (frame hashing, thumbnail hashing) key on.
    * A real codec returns its own dimensions/frames/features and any
    * stable content hash; each payload is digested exactly ONCE. */
  private[graft] case class Decoded(width: Int, height: Int, frames: Int,
                                    features: Array[Double], contentId: String)

  /** STUB decode kernel: deterministic pseudo-decode of a payload,
    * driven by the payload's MD5 digest bytes. Replace with a real
    * codec binding; the signature (kernel handle in, payload in,
    * [[Decoded]] out) stays, and every downstream operator
    * (extractFeatures / sampleFrames / thumbnail) consumes ONLY this
    * function, so a codec swap can never desync them.
    *
    * Digest byte map: b0..b1 → width, b2..b3 → height, b4 → frame
    * count, b8..b15 → the 8 feature components (each b/255.0). */
  private[graft] def decodeWith(md: MessageDigest, payload: Array[Byte]): Decoded = {
    md.reset()
    val d = md.digest(payload)
    def b(i: Int): Int = d(i) & 0xff
    Decoded(
      width = 16 + ((b(0) * 256 + b(1)) % 240),
      height = 16 + ((b(2) * 256 + b(3)) % 240),
      frames = 1 + (b(4) % 8),
      features = Array.tabulate(8)(j => b(8 + j).toDouble / 255.0),
      contentId = hex(d))
  }

  /** One-shot convenience form (tests); hot paths go through the
    * per-partition kernel in extractFeatures/sampleFrames. */
  private[graft] def decodeStub(payload: Array[Byte]): Decoded =
    decodeWith(MessageDigest.getInstance("MD5"), payload)

  case class Frame(doc_id: Long, frame_idx: Int, frame_hash: String)

  /** Frame sampling over "video" payloads: every k-th frame of the
    * stub-decoded stream, one output row per sampled frame. The frame
    * hash is md5(payloadDigestHex ++ ":" ++ frameIdx) — deterministic
    * AND SQL-reproducible, so the explode-shaped plumbing is
    * oracle-checked without codecs. */
  def sampleFrames(df: DataFrame, everyK: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(everyK >= 1, "everyK must be >= 1")
    val out = df.select("doc_id", "payload").mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // kernel: one per partition
      rows.flatMap { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        // frame count AND content id come from the one kernel call — a
        // real codec swapped into decodeWith keeps all operators in sync
        val dec = decodeWith(md, payload)
        val docId = r.getAs[Long]("doc_id")
        (0 until dec.frames by everyK).iterator.map { idx =>
          md.reset()
          Frame(docId, idx,
            hex(md.digest((dec.contentId + ":" + idx).getBytes("UTF-8"))))
        }
      }
    }
    out.toDF()
  }

  case class Thumb(doc_id: Long, width: Int, height: Int,
                   thumb_w: Int, thumb_h: Int, thumb_hash: String)

  /** Resize stage: aspect-preserving thumbnail dimensions inside a
    * `box`×`box` bound plus a deterministic thumbnail content hash —
    * the stub twin of an image-resize kernel (a real one replaces the
    * hash with resampled pixels; the mapPartitions shape, integer
    * box math, and output schema stay). Dimension math is
    * `floor(box·dim/maxdim)` in doubles — per-row IEEE arithmetic, so
    * an external SQL engine reproduces it bit-for-bit. */
  def thumbnail(df: DataFrame, box: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(box >= 1, "box must be >= 1")
    val out = df.select("doc_id", "payload").mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // kernel: one per partition
      rows.map { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        val dec = decodeWith(md, payload) // one digest per row
        val maxDim = math.max(dec.width, dec.height)
        val tw = math.floor(box.toDouble * dec.width / maxDim).toInt
        val th = math.floor(box.toDouble * dec.height / maxDim).toInt
        md.reset()
        Thumb(r.getAs[Long]("doc_id"), dec.width, dec.height, tw, th,
          hex(md.digest((dec.contentId + ":" + tw + "x" + th).getBytes("UTF-8"))))
      }
    }
    out.toDF()
  }

  /** (doc_id, payload binary, mime) → decoded metadata + features.
    * mapPartitions: kernel instantiated once per partition, rows
    * streamed through it. */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select("doc_id", "payload", "mime").mapPartitions { rows =>
      val md = MessageDigest.getInstance("MD5") // kernel: one per partition
      rows.map { r =>
        val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
        val dec = decodeWith(md, payload)
        MediaFeatures(r.getAs[Long]("doc_id"), r.getAs[String]("mime"),
          payload.length, dec.width, dec.height, dec.frames, dec.features)
      }
    }
    out.toDF()
  }
}
