package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-QUALITY measurement for the ANN family (r20).
  *
  * The oracle gate pins every ANN query for DETERMINISM (hash vs a SQL
  * replay of the same algorithm); this harness answers the question a
  * 100 TB user asks first — how much recall does each approximation
  * buy? — by scoring the committed operators against the exact
  * brute-force anchors:
  *
  *  - the exemplar query set (vec_id < 20, top-5 — exactly q50's
  *    shape) for every committed ANN query: q52 LSH at 1/2/4 hash
  *    tables, q53 IVF at nProbe 1/2/4/8/16, q115 (persisted IVF),
  *    q54 (int8), q120 (flat PQ ADC), q122 (IVF-PQ);
  *  - a WIDE sweep using EVERY corpus vector as a query (500 at
  *    sf0.01, 2 000 at sf0.1) through the batched `ivfProbeAll` —
  *    the statistically meaningful recall curve per nProbe.
  *
  * recall@5 = mean over queries of |method top-5 ∩ exact top-5| / 5;
  * top1_hit = fraction of queries whose TRUE nearest neighbor appears
  * anywhere in the method's top-5. The brute-force anchors here are
  * the harness's own (they run at testdata scale, well under the
  * q50/q51 100k-row fence); production corpora measure recall the same
  * way on a SAMPLE of queries.
  *
  * Usage: `runMain graft.Recall [sfDir ...]` — one JSON line per dir;
  * the committed RECALL.md tables are generated from these lines. */
object Recall {

  private def pairs(df: DataFrame): Map[Long, Set[Long]] =
    df.select("q_id", "n_id").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def rank1(df: DataFrame): Map[Long, Long] =
    df.filter(col("rk") === 1).select("q_id", "n_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def recallAt(exact: Map[Long, Set[Long]],
                       got: Map[Long, Set[Long]], k: Int): Double = {
    val qs = exact.keys.toSeq
    qs.map(q => (exact(q) & got.getOrElse(q, Set.empty)).size.toDouble / k)
      .sum / qs.size
  }

  private def top1Hit(exact1: Map[Long, Long],
                      got: Map[Long, Set[Long]]): Double = {
    val qs = exact1.keys.toSeq
    qs.count(q => got.getOrElse(q, Set.empty).contains(exact1(q)))
      .toDouble / qs.size
  }

  def main(args: Array[String]): Unit = {
    // JSON is built with %f interpolation — pin the locale so a
    // comma-decimal default can't emit invalid JSON
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach(run(spark, _))
    spark.stop()
  }

  private def run(s: SparkSession, d: String): Unit = {
    import graft.queries.{IvfStore, Similarity}
    val k = 5
    val exactDf = Similarity.q50CosineTopK.fn(s, d)
    val exact = pairs(exactDf)
    val exact1 = rank1(exactDf)
    val methods = scala.collection.mutable.LinkedHashMap[String, Map[Long, Set[Long]]]()
    for (t <- Seq(1, 2, 4))
      methods(s"q52_lsh_tables_$t") = pairs(Similarity.lshAnn(s, d, t))
    val idx = Similarity.ivfIndex(s, d)
    val q20 = Tables.embeddings(s, d).filter(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    for (p <- Seq(1, 2, 4, 8, 16))
      methods(s"q53_ivf_nprobe_$p") = pairs(Similarity.ivfProbe(s, idx, q20, p))
    methods("q115_ivf_persisted_nprobe_4") = pairs(IvfStore.q115IvfPersisted.fn(s, d))
    methods("q54_int8") = pairs(Similarity.q54QuantizedTopK.fn(s, d))
    methods("q120_pq_adc") = pairs(Similarity.q120PqTopK.fn(s, d))
    methods("q122_ivf_pq_nprobe_4") = pairs(Similarity.q122IvfPq.fn(s, d))
    val methodJson = methods.map { case (name, got) =>
      f""""$name":{"recall_at_5":${recallAt(exact, got, k)}%.4f,"top1_in_top5":${top1Hit(exact1, got)}%.4f}"""
    }.mkString("{", ",", "}")

    // wide sweep: every corpus vector as a query, batched probe
    graft.functions.CosineSimilarity.register(s)
    val emb = Tables.embeddings(s, d)
    val all = emb.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val nQ = all.count()
    val scoredW = emb.join(broadcast(all), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        expr("cosine_sim(q_emb, embedding)").as("cos"))
    val wW = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("n_id"))
    val wideExactDf = scoredW.withColumn("rk", row_number().over(wW))
      .filter(col("rk") <= k)
    val wideExact = pairs(wideExactDf)
    val wideExact1 = rank1(wideExactDf)
    val wideJson = Seq(1, 2, 4, 8, 16).map { p =>
      val got = pairs(Similarity.ivfProbeAll(s, idx, all, p, nQueriesHint = Some(nQ)))
      f""""$p":{"recall_at_5":${recallAt(wideExact, got, k)}%.4f,"top1_in_top5":${top1Hit(wideExact1, got)}%.4f}"""
    }.mkString("{", ",", "}")

    println(s"""{"metric":"recall","sf":"$d","k":$k,"exemplar_queries":${exact.size},"methods":$methodJson,"wide_ivf":{"queries":$nQ,"by_nprobe":$wideJson}}""")
  }
}
