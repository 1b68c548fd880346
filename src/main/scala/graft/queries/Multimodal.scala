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

  /** Partition-batched decode + feature extraction over binary payloads
    * through the stubbed kernel: schema and batching are the real
    * 100 TB-shaped plumbing (mapPartitions, one kernel instance per
    * partition, columnar-width feature output). Rows-only check; the
    * kernel's determinism is asserted in ScalaTest. */
  val q61MediaFeatures: Q = Q(
    "q61_media_features",
    (s, d) => graft.operators.MediaDecode.extractFeatures(
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
                lit("image/fake").as("mime")))
      .orderBy(col("doc_id")),
    None,
    doc = "stub decode → width/height/frames + feature vector")

  /** Frame sampling (every 2nd frame of the stub-decoded stream) —
    * the explode-shaped multimodal stage a video pipeline runs before
    * per-frame featurization. Rows-only; determinism in ScalaTest. */
  val q62FrameSample: Q = Q(
    "q62_frame_sample",
    (s, d) => graft.operators.MediaDecode.sampleFrames(
      Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload")),
      everyK = 2)
      .orderBy(col("doc_id"), col("frame_idx")),
    None,
    doc = "every-k-th frame sampling over stub-decoded video")

  def defs: Seq[Q] = Seq(q60BinaryMeta, q61MediaFeatures, q62FrameSample)
}
