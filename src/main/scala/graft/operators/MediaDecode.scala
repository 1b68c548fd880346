package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Multimodal decode / feature-extraction plumbing.
  *
  * The decode kernel itself is a STUB — this container has no image/
  * audio/video codecs — but it is a *deterministic* stub (features are
  * derived from the payload bytes), so the surrounding Spark machinery is
  * fully testable: schema contracts, per-partition kernel reuse, batch
  * shape, null/short-payload handling. A real decoder (JNI/FFI to a codec
  * lib) replaces ONLY `decodeStub`.
  *
  * Scale: runs as mapPartitions — one kernel init per partition (this is
  * where a real codec would amortize model/library load), streaming rows,
  * no collect. Output schema is fixed-width → columnar-friendly.
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

  /** STUB decode kernel: deterministic pseudo-decode of a payload.
    * ??? ← replace with a real codec binding; signature stays. */
  private[graft] def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Double]) = {
    // FNV-1a over the payload drives all "decoded" properties, so the
    // stub is reproducible across partitions/executors/runs.
    var h = -3750763034362895579L
    var i = 0
    while (i < payload.length) { h = (h ^ (payload(i) & 0xffL)) * 1099511628211L; i += 1 }
    val width = 16 + (Math.floorMod(h, 240L)).toInt
    val height = 16 + (Math.floorMod(h >>> 8, 240L)).toInt
    val frames = 1 + (Math.floorMod(h >>> 16, 8L)).toInt
    val feats = Array.tabulate(8) { j =>
      Math.floorMod(h >>> (j * 7), 1000L).toDouble / 1000.0
    }
    (width, height, frames, feats)
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame_hash: Long)

  /** Frame sampling over "video" payloads: every k-th frame of the
    * stub-decoded stream, one output row per sampled frame. The frame
    * hash chains the payload fingerprint with the frame index —
    * deterministic, so the plumbing (explode shape, partitioning,
    * per-partition kernel reuse) is testable without codecs. */
  def sampleFrames(df: DataFrame, everyK: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(everyK >= 1, "everyK must be >= 1")
    val out = df.select("doc_id", "payload").flatMap { r =>
      val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
      val (_, _, frames, _) = decodeStub(payload)
      var h = -3750763034362895579L
      var i = 0
      while (i < payload.length) { h = (h ^ (payload(i) & 0xffL)) * 1099511628211L; i += 1 }
      (0 until frames by everyK).map { idx =>
        Frame(r.getAs[Long]("doc_id"), idx, h ^ (idx.toLong * 0x9e3779b97f4a7c15L))
      }
    }
    out.toDF()
  }

  /** (doc_id, payload binary, mime) → decoded metadata + features. */
  def extractFeatures(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val out = df.select("doc_id", "payload", "mime").map { r =>
      val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
      val (w, h, f, feats) = decodeStub(payload)
      MediaFeatures(r.getAs[Long]("doc_id"), r.getAs[String]("mime"),
        payload.length, w, h, f, feats)
    }
    out.toDF()
  }
}
