package graft.queries

import graft.{SparkSpec, Tables}
import graft.functions.{CosineSimilarity, Text}
import org.apache.spark.sql.functions._

/** Correctness of the non-oracle (rows-only) operators, asserted against
  * brute-force / independent formulations on the sf0.001 fixture. */
class OperatorSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("codegen'd cosine_sim ≡ higher-order-function cosine, bit for bit") {
    CosineSimilarity.register(spark)
    val e = Tables.embeddings(spark, d).limit(100)
    val pairs = e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        expr("cosine_sim(a.embedding, b.embedding)").as("fast"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("ref"))
    val diffs = pairs.filter(col("fast") =!= col("ref")).count()
    assert(diffs == 0, "expression and HOF cosine must agree exactly")
  }

  test("MinHash+LSH finds every true near-dup pair the exact Jaccard join finds") {
    val docs = Tables.documents(spark, d)
    val truePairs = Dedup.q42NgramJaccard.fn(spark, d)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshPairs = Dedup.minhashPairs(docs)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // verification step re-checks exact Jaccard → lsh ⊆ true; recall is
    // probabilistic but with 8 bands × 4 rows at J≥0.5 it should catch
    // effectively all fixture pairs
    assert(lshPairs.subsetOf(truePairs), "LSH must never emit a false positive (verified)")
    if (truePairs.nonEmpty) {
      val recall = lshPairs.size.toDouble / truePairs.size
      assert(recall >= 0.8, s"LSH recall $recall too low (${lshPairs.size}/${truePairs.size})")
    }
  }

  test("SimHash signatures are deterministic and identical docs collide") {
    val docs = Tables.documents(spark, d)
    val s1 = Dedup.simhashSignatures(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = Dedup.simhashSignatures(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 == s2, "simhash must be run-deterministic")
    // identical text ⇒ identical signature
    val dup = docs.select(col("doc_id"), col("text"))
      .join(docs.select(col("doc_id").as("id2"), col("text").as("t2")),
        col("text") === col("t2") && col("doc_id") < col("id2"))
      .select("doc_id", "id2").collect()
    dup.foreach(r => assert(s1(r.getLong(0)) == s1(r.getLong(1))))
  }

  test("LSH ANN rescoring returns a subset of brute-force candidates with decent recall@5") {
    val brute = Similarity.q50CosineTopK.fn(spark, d)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.q52LshAnn.fn(spark, d)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (brute.isEmpty) 1.0 else ann.intersect(brute).size.toDouble / brute.size
    // approximate by construction; just require it to be meaningfully
    // better than random (500 vectors, 5 of ~62 same-bucket candidates)
    assert(recall >= 0.2, s"ANN recall@5 $recall suspiciously low")
  }

  test("IVF ANN recall@5 is reasonable vs brute force") {
    val brute = Similarity.q50CosineTopK.fn(spark, d)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.q53IvfAnn.fn(spark, d)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (brute.isEmpty) 1.0 else ivf.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.2, s"IVF recall@5 $recall suspiciously low")
  }

  test("int8-quantized top-k keeps high recall vs exact float cosine") {
    val brute = Similarity.q50CosineTopK.fn(spark, d)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.q54QuantizedTopK.fn(spark, d)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = if (brute.isEmpty) 1.0 else quant.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"int8 quantization recall@5 $recall too low")
  }

  test("language ID predicts a declared language and is deterministic") {
    val out = TextOps.q34LangId.fn(spark, d).collect()
    assert(out.length == Tables.documents(spark, d).count())
    val langs = Set("en", "de", "es", "fr", "pt", "zh", "und")
    out.foreach(r => assert(langs(r.getAs[String]("pred_lang"))))
  }

  test("fingerprint64 is order-sensitive and deterministic") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),
      (3L, "gamma beta alpha"),
      (4L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), Text.fingerprint64(col("text")).as("fp"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L), "same text, same fingerprint")
    assert(m(1L) != m(3L), "token order must change the fingerprint")
    assert(m.contains(4L), "empty text still fingerprints")
  }

  test("media decode stub is deterministic and schema-stable") {
    val a = Multimodal.q61MediaFeatures.fn(spark, d)
    val b = Multimodal.q61MediaFeatures.fn(spark, d)
    assert(a.schema.fieldNames.toSeq ==
      Seq("doc_id", "mime", "n_bytes", "width", "height", "n_frames") ++
        (0 until 8).map(j => s"f$j"))
    assert(a.exceptAll(b).count() == 0)
    val r = a.filter(col("doc_id") === 0).collect().head
    assert(r.getAs[Int]("width") >= 16 && r.getAs[Int]("width") < 256)
    (0 until 8).foreach { j =>
      val f = r.getAs[Double](s"f$j")
      assert(f >= 0.0 && f <= 1.0, s"f$j out of range: $f")
    }
  }

  test("approx_count_distinct within 5% of exact") {
    val approx = Extras.q76ApproxDistinct.fn(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, d).groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, ex) =>
      val ap = approx(k).toDouble
      assert(math.abs(ap - ex) / ex <= 0.05, s"$k: approx=$ap exact=$ex")
    }
  }

  test("frame sampling is deterministic and honors the stride") {
    val a = Multimodal.q62FrameSample.fn(spark, d).collect()
    val b = Multimodal.q62FrameSample.fn(spark, d).collect()
    assert(a.toSeq == b.toSeq, "frame sampling must be deterministic")
    // stride 2 → only even frame indices
    assert(a.forall(_.getAs[Int]("frame_idx") % 2 == 0))
    // frame count per doc == ceil(n_frames / 2) of the decode stub
    val frames = Multimodal.q61MediaFeatures.fn(spark, d)
      .select("doc_id", "n_frames").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val perDoc = a.groupBy(_.getAs[Long]("doc_id")).map { case (k, v) => k -> v.length }
    perDoc.foreach { case (id, n) => assert(n == (frames(id) + 1) / 2, s"doc $id") }
  }

  test("shingles produce n-2 word 3-grams and [] for short docs") {
    import spark.implicits._
    val df = Seq("a b c d e", "a b", "").toDF("text")
      .select(Text.shingles(col("text"), 3).as("sh"))
    val got = df.collect().map(_.getAs[scala.collection.Seq[String]]("sh").toSeq)
    assert(got(0) == Seq("a b c", "b c d", "c d e"))
    assert(got(1) == Seq.empty)
    assert(got(2) == Seq.empty)
  }
}
