package graft.kv

import java.nio.file.Files

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => PropTest}

/** Equivalence fuzz for the r14 add-lineage delta planner: for RANDOM
  * append/compact histories (within archive retention, so BOTH sources
  * exist), `KvStore.deltaShards` — which plans lineage-covered windows
  * from the live manifest's `shards ++ retiredAdds` — must enumerate
  * exactly the shard files the old commit-by-commit archived-chain
  * replay enumerates, for EVERY window (since, asOf] over the table's
  * history. Compaction is the adversarial case: it retires genuine
  * adds out of the live set and creates merged shards whose inherited
  * `firstVersion` collides with real add versions — a planner that
  * confused the two would double-serve merged rows or lose originals.
  * Re-compaction of merged outputs exercises inherited-upon-inherited
  * lineage. */
class KvLineagePropSpec extends SparkSpec {

  private val cat =
    """{"table":{"name":"lineage"},"rowkey":"k",
      | "columns":{"k":{"cf":"rowkey","col":"k","type":"long"},
      |            "v":{"cf":"f","col":"v","type":"string"}}}""".stripMargin

  /** The pre-lineage planner, kept verbatim as the reference model. */
  private def chainReplay(dir: String, since: Long, asOf: Option[Long]): Set[String] = {
    val end = KvStore.readMetaAsOf(dir, asOf)
    val out = scala.collection.mutable.LinkedHashMap[String, KvShardMeta]()
    var w = since + 1
    while (w <= end.version) {
      val m = if (w == end.version) end else KvStore.readMetaAsOf(dir, Some(w))
      m.shards.iterator.filter(_.firstVersion == w).foreach(s => out.put(s.file, s))
      w += 1
    }
    out.keySet.toSet
  }

  // an op is Left(rowCount) = append, Right(targetBytes) = compact
  private val opGen: Gen[Either[Int, Long]] = Gen.frequency(
    3 -> Gen.chooseNum(1, 25).map(Left(_)),
    1 -> Gen.oneOf(512L, 4096L, 1L << 30).map(Right(_)))

  private val historyGen: Gen[List[Either[Int, Long]]] =
    Gen.chooseNum(3, 10).flatMap(n => Gen.listOfN(n, opGen))
      // a history must start with data — compacting a not-yet-created
      // table is a caller error, not a planner case
      .map(h => h.dropWhile(_.isRight) match {
        case Nil => List(Left(5))
        case trimmed => trimmed
      })

  test("lineage planning equals archived-chain replay on random append/compact histories") {
    import spark.implicits._
    val prop = Prop.forAll(historyGen) { history =>
      val dir = Files.createTempDirectory("graft-lineage-fuzz").toString
      var nextKey = 0L
      history.foreach {
        case Left(rows) =>
          val ks = (0 until rows).map(_ => { val k = nextKey; nextKey += 1; k })
          ks.map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
            .write.format("graft-kv").option("catalog", cat).option("path", dir)
            .mode("append").save()
        case Right(target) =>
          // retainInputs keeps replaced files on the grace clock so the
          // historical windows stay servable on both planners; a compact
          // that merges nothing still bumps no version (compact returns 0)
          KvCompactor.compact(dir, target, retainInputs = true): Unit
      }
      val version = KvStore.readMeta(dir).version
      // every window over the whole history, both bounded and open-ended
      (0L until version).forall { since =>
        ((since + 1) to version).map(Some(_): Option[Long]).toList.appended(None)
          .forall { asOf =>
            val fast = KvStore.deltaShards(dir, since, asOf).map(_.file).toSet
            val chain = chainReplay(dir, since, asOf)
            if (fast != chain)
              fail(s"window ($since, ${asOf.getOrElse("live")}] diverged after " +
                s"${history.mkString(",")}: lineage=$fast chain=$chain")
            true
          }
      }
    }
    val res = PropTest.check(
      PropTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
