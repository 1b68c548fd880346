package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.{col, explode}
import org.scalacheck.{Gen, Prop, Test => PropTest}

/** Property fuzz of the persisted inverted index (q127's machinery)
  * against the direct BM25 pipeline over RANDOM query-term sets. The
  * directed Bm25StoreSpec pins the canonical four-term query; this
  * closes the term space: high-df terms, singleton-df tail tokens,
  * terms absent from the corpus (their prefix seek plans zero ranges
  * and they must simply not score), duplicate terms in the request,
  * and mixed bags of all of these. For every sample the persisted
  * probe must be BIT-identical to the direct pipeline — same docs,
  * same ranks, same rounded scores. */
class Bm25StorePropSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("rk", "doc_id", "bm25_r").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq

  test("persisted probe ≡ direct pipeline over random term sets") {
    // vocabulary pool: frequent head + singleton tail, sampled once
    val vocab = Tables.documents(spark, d)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("t"))
      .groupBy("t").count()
      .orderBy(col("count").desc, col("t"))
      .limit(400).collect().map(_.getString(0))
    val head = vocab.take(20).toSeq
    val tail = vocab.takeRight(20).toSeq
    val ghosts = Seq("zzz-not-a-token", "qqqq", "model-weights")
    val termGen: Gen[Seq[String]] = for {
      n <- Gen.chooseNum(1, 5)
      ts <- Gen.listOfN(n, Gen.frequency(
        3 -> Gen.oneOf(head), 2 -> Gen.oneOf(tail), 1 -> Gen.oneOf(ghosts)))
    } yield ts
    val (pDir, lDir) = Bm25Store.buildIfAbsent(spark, d, "full",
      Tables.documents(spark, d))
    val prop = Prop.forAll(termGen) { terms =>
      val got = rows(Bm25Store.probe(spark, pDir, lDir, terms))
      val want = rows(
        TextOps.bm25RankedWith(spark, d, terms).filter(col("rk") <= 10)
          .select(col("rk"), col("doc_id"),
            org.apache.spark.sql.functions.round(col("score"), 6).as("bm25_r"))
          .orderBy(col("rk")))
      val ok = got == want
      if (!ok) System.err.println(
        s"MISMATCH terms=$terms\n  probe : $got\n  direct: $want")
      ok
    }
    val res = PropTest.check(
      PropTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }
}
