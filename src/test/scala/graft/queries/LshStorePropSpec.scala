package graft.queries

import java.nio.file.Files

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => PropTest}

/** Property fuzz of LSH frontier maintenance over MULTI-STEP append
  * schedules. The directed LshStoreSpec pins one build→append cycle;
  * this closes the schedule space: the corpus is split at random cut
  * points into 2–5 ingest batches, the index is built from the first
  * and maintained once per arrival, and after EVERY maintenance step
  * the pair relation computed from the persisted tables must be
  * bit-identical to a from-scratch sketch of the prefix indexed so
  * far (per-document signatures ⇒ appends compose exactly — the
  * property that makes the incremental path sound). Each step must
  * also index exactly the batch that arrived, and a repeated ensure
  * must be a no-op. */
class LshStorePropSpec extends SparkSpec {
  private val d = "/root/testdata/sf0.001"

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.select("id_a", "id_b", "inter", "un").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sorted

  test("multi-step frontier maintenance ≡ from-scratch sketch at every step") {
    val docs = Tables.documents(spark, d)
    val n = docs.count()
    val cutsGen: Gen[List[Long]] = for {
      k <- Gen.chooseNum(1, 4)
      cuts <- Gen.listOfN(k, Gen.chooseNum(1L, n - 1))
    } yield cuts.distinct.sorted
    val prop = Prop.forAll(cutsGen) { cuts =>
      val bounds = (cuts :+ n).distinct.sorted
      val bDir = Files.createTempDirectory("lsh-prop-bands").toString
      val sDir = Files.createTempDirectory("lsh-prop-shingles").toString
      LshStore.writeIndex(spark, docs.filter(col("doc_id") < bounds.head),
        bDir, sDir, "overwrite")
      bounds.zip(bounds.tail).forall { case (lo, hi) =>
        // "arrival" of the next batch = maintaining against a corpus
        // truncated at hi: stage the prefix as a parquet dir the
        // ensure call reads as its live corpus
        val prefixDir = Files.createTempDirectory("lsh-prop-corpus").toString
        docs.filter(col("doc_id") < hi)
          .write.mode("overwrite").parquet(s"$prefixDir/documents.parquet")
        val indexed = LshStore.ensureIndexed(spark, prefixDir, bDir, sDir)
        val again = LshStore.ensureIndexed(spark, prefixDir, bDir, sDir)
        val fromScratch = {
          val b2 = Files.createTempDirectory("lsh-prop-b2").toString
          val s2 = Files.createTempDirectory("lsh-prop-s2").toString
          LshStore.writeIndex(spark, docs.filter(col("doc_id") < hi),
            b2, s2, "overwrite")
          pairsOf(LshStore.pairs(spark, b2, s2))
        }
        val ok = indexed == hi - lo && again == 0L &&
          pairsOf(LshStore.pairs(spark, bDir, sDir)) == fromScratch
        if (!ok) System.err.println(
          s"MISMATCH cuts=$cuts step=[$lo,$hi) indexed=$indexed again=$again")
        ok
      }
    }
    val res = PropTest.check(
      PropTest.Parameters.default.withMinSuccessfulTests(6), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }
}
