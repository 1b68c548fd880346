package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns plus a
  * typed metadata struct, with decode / feature-extraction stages.
  *
  * No image/audio codecs exist in this container, so the decode kernel is
  * a clearly-marked deterministic STUB (see [[graft.operators.MediaDecode]]);
  * everything around it — binary schema, metadata struct, partition-wise
  * batched processing, feature output shape — is real Spark plumbing that
  * a codec drop-in would inherit unchanged.
  */
object Multimodal {

  /** Binary ingestion + metadata: text → UTF-8 bytes standing in for a
    * media payload; byte length, sha256, header bytes. Fully
    * oracle-checkable (DuckDB blob functions). */
  val q60BinaryMeta: Q = Q(
    "q60_binary_meta",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .select(
          col("doc_id"),
          length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("sha256_hex"),
          hex(substring(col("text"), 1, 8).cast("binary")).as("header_hex"))
        .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             sha256(text) AS sha256_hex,
             hex(encode(substring(text, 1, 8))) AS header_hex
      FROM documents
      ORDER BY doc_id"""),
    doc = "binary payload + typed metadata columns")

  /** DuckDB reconstruction of the stub kernel's digest bytes: byte i of
    * md5(text) as an integer, parsed from the hex string one nibble at a
    * time (`strpos` over the hex alphabet — no hex→int builtin needed). */
  private def sqlDigestByte(i: Int): String = {
    def nib(k: Int) = s"(strpos('0123456789abcdef', substring(h, $k, 1)) - 1)"
    s"${nib(2 * i + 1)} * 16 + ${nib(2 * i + 2)}"
  }

  /** The stub kernel's digest-byte → dimensions contract
    * (`MediaDecode.decodeWith`: b0..b1 → width, b2..b3 → height) as ONE
    * SQL fragment shared by every oracle that replays it (q61, q63) —
    * a kernel byte-map change cannot update one and miss the other. */
  private val sqlDims: String =
    """16 + ((b0 * 256 + b1) % 240) AS width,
             16 + ((b2 * 256 + b3) % 240) AS height"""

  /** Partition-batched decode + feature extraction over binary payloads
    * through the stubbed kernel: schema and batching are the real
    * 100 TB-shaped plumbing (mapPartitions, one kernel instance per
    * partition, columnar-width feature output). The kernel derives
    * everything from md5(payload), so the whole query — including the 8
    * feature components, emitted as scalar f0..f7 columns — is
    * reproduced by the DuckDB oracle. */
  val q61MediaFeatures: Q = Q(
    "q61_media_features",
    (s, d) => graft.operators.MediaDecode.extractFeatures(
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
                lit("image/fake").as("mime")))
      .select(
        Seq(col("doc_id"), col("mime"), col("n_bytes"), col("width"),
            col("height"), col("n_frames")) ++
          (0 until 8).map(j => col("features")(j).as(s"f$j")): _*)
      .orderBy(col("doc_id")),
    Some(s"""
      WITH d AS (
        -- coalesce mirrors the Spark side, which maps a NULL payload to
        -- an empty byte array and still emits real md5-derived columns
        SELECT doc_id, md5(coalesce(text, '')) AS h,
               octet_length(encode(coalesce(text, ''))) AS n_bytes
        FROM documents),
      b AS (
        SELECT doc_id, n_bytes,
               ${(Seq(0, 1, 2, 3, 4) ++ (8 to 15)).map(i => s"${sqlDigestByte(i)} AS b$i").mkString(",\n               ")}
        FROM d)
      SELECT doc_id, 'image/fake' AS mime, n_bytes,
             $sqlDims,
             1 + (b4 % 8) AS n_frames,
             ${(0 until 8).map(j => s"CAST(b${8 + j} AS DOUBLE) / 255.0 AS f$j").mkString(",\n             ")}
      FROM b
      ORDER BY doc_id"""),
    doc = "stub decode → width/height/frames + scalar feature columns")

  /** Frame sampling (every 2nd frame of the stub-decoded stream) —
    * the explode-shaped multimodal stage a video pipeline runs before
    * per-frame featurization. Frame hash = md5(digestHex:idx), so the
    * DuckDB oracle replays the whole explode. */
  val q62FrameSample: Q = Q(
    "q62_frame_sample",
    (s, d) => graft.operators.MediaDecode.sampleFrames(
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload")),
      everyK = 2)
      .orderBy(col("doc_id"), col("frame_idx")),
    Some(s"""
      WITH d AS (
        -- coalesce mirrors Spark's null-payload → empty-bytes path
        SELECT doc_id, md5(coalesce(text, '')) AS h FROM documents),
      m AS (
        SELECT doc_id, h, 1 + ((${sqlDigestByte(4)}) % 8) AS n_frames
        FROM d),
      f AS (
        SELECT doc_id, h, unnest(range(0, n_frames, 2)) AS frame_idx
        FROM m)
      SELECT doc_id, frame_idx,
             md5(h || ':' || CAST(frame_idx AS VARCHAR)) AS frame_hash
      FROM f
      ORDER BY doc_id, frame_idx"""),
    doc = "every-k-th frame sampling over stub-decoded video")

  /** Resize/thumbnail stage (every media pipeline's third step after
    * decode and sampling): aspect-preserving 64-box dimensions + a
    * deterministic thumb hash, all derived from the stub kernel's
    * digest, so DuckDB replays the whole stage including the
    * floor(box·dim/maxdim) IEEE dimension math. */
  val q63Thumbnail: Q = Q(
    "q63_thumbnail",
    (s, d) => graft.operators.MediaDecode.thumbnail(
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload")),
      box = 64)
      .orderBy(col("doc_id")),
    Some(s"""
      WITH d AS (
        SELECT doc_id, md5(coalesce(text, '')) AS h FROM documents),
      b AS (
        SELECT doc_id, h,
               ${Seq(0, 1, 2, 3).map(i => s"${sqlDigestByte(i)} AS b$i").mkString(",\n               ")}
        FROM d),
      m AS (
        SELECT doc_id, h,
               $sqlDims
        FROM b),
      t AS (
        SELECT doc_id, h, width, height,
               CAST(floor(64.0 * width / greatest(width, height)) AS INT) AS thumb_w,
               CAST(floor(64.0 * height / greatest(width, height)) AS INT) AS thumb_h
        FROM m)
      SELECT doc_id, width, height, thumb_w, thumb_h,
             md5(h || ':' || CAST(thumb_w AS VARCHAR) || 'x' ||
                 CAST(thumb_h AS VARCHAR)) AS thumb_hash
      FROM t
      ORDER BY doc_id"""),
    doc = "aspect-preserving thumbnail stage over the stub decode kernel")

  def defs: Seq[Q] = Seq(q60BinaryMeta, q61MediaFeatures, q62FrameSample, q63Thumbnail)
}
