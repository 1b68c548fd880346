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

  /** Lineage × VACUUM interplay (round 15): vacuum deletes retired add
    * FILES (and expired archived manifests) under the grace clock, but
    * the lineage entries that reference them stay in the live manifest.
    * The planner contract is therefore exact-or-loud: for EVERY window
    * over a random append/compact/vacuum schedule, `deltaShards` +
    * `requireShardFiles` (the exact composition the batch scan and the
    * streaming `planInputPartitions` run) must either enumerate
    * PRECISELY the add-files the model recorded at commit time — all
    * still on disk — or raise the clean "unavailable" planning error.
    * A partial silent result (some of a window's adds vacuumed, the
    * rest served as if complete) is the bug this fuzz exists to catch. */
  test("vacuumed windows fail loudly at planning, never serve partial adds") {
    import spark.implicits._
    sealed trait Op
    case class Append(rows: Int) extends Op
    case class Compact(target: Long) extends Op
    case object Vacuum extends Op
    val opGen: Gen[Op] = Gen.frequency(
      3 -> Gen.chooseNum(1, 25).map(Append(_)),
      1 -> Gen.oneOf(512L, 4096L, 1L << 30).map(Compact(_)),
      1 -> Gen.const(Vacuum))
    val historyGen2: Gen[List[Op]] =
      Gen.chooseNum(4, 9).flatMap(n => Gen.listOfN(n, opGen))
        .map(h => h.dropWhile(op => !op.isInstanceOf[Append]) match {
          case Nil => List(Append(5))
          case trimmed => trimmed
        })
    val prop = Prop.forAll(historyGen2) { history =>
      val dir = Files.createTempDirectory("graft-lineage-vac-fuzz").toString
      var nextKey = 0L
      // the model: add-files per commit version, captured at append
      // time from the just-committed manifest — independent of archived
      // manifests, so it survives their vacuum
      val addFiles = scala.collection.mutable.Map[Long, Set[String]]()
      history.foreach {
        case Append(rows) =>
          val ks = (0 until rows).map(_ => { val k = nextKey; nextKey += 1; k })
          ks.map(k => (k, s"v$k")).toDF("k", "v").coalesce(1)
            .write.format("graft-kv").option("catalog", cat).option("path", dir)
            .mode("append").save()
          val m = KvStore.readMeta(dir)
          addFiles(m.version) = m.shards.filter(_.firstVersion == m.version)
            .map(_.file).toSet
        case Compact(target) =>
          KvCompactor.compact(dir, target, retainInputs = true): Unit
        case Vacuum =>
          // grace 0: everything unreferenced is reclaimable NOW — the
          // adversarial extreme of the grace clock
          KvCompactor.vacuum(dir, 0L): Unit
      }
      val version = KvStore.readMeta(dir).version
      var vacuumedCovered: Option[(Long, Option[Long])] = None
      (0L until version).foreach { since =>
        ((since + 1) to version).map(Some(_): Option[Long]).toList.appended(None)
          .foreach { asOf =>
            val endV = asOf.getOrElse(version)
            val expected =
              ((since + 1) to endV).flatMap(v => addFiles.getOrElse(v, Set.empty)).toSet
            val attempt = scala.util.Try {
              val sh = KvStore.deltaShards(dir, since, asOf)
              KvStore.requireShardFiles(dir, sh, s"window ($since, $endV]")
              sh
            }
            attempt match {
              case scala.util.Success(sh) =>
                val got = sh.map(_.file).toSet
                if (got != expected)
                  fail(s"window ($since, $endV] served $got, adds were $expected " +
                    s"after ${history.mkString(",")}")
              case scala.util.Failure(e) =>
                if (e.getMessage == null || !e.getMessage.contains("unavailable"))
                  fail(s"window ($since, $endV] failed uncleanly after " +
                    s"${history.mkString(",")}: $e")
                if (vacuumedCovered.isEmpty) vacuumedCovered = Some((since, asOf))
            }
          }
      }
      // pin the USER surface once per history: the batch incremental
      // read of an unservable window must surface the same clean
      // planning error (wrapped or not), never a FileNotFoundException
      // from a task or a partial row set
      vacuumedCovered.foreach { case (since, asOf) =>
        val e = intercept[Exception] {
          val r = spark.read.format("graft-kv").option("catalog", cat)
            .option("path", dir).option("sinceVersion", since)
          asOf.fold(r)(v => r.option("asOfVersion", v)).load().collect()
        }
        val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
        if (!msgs.contains("unavailable"))
          fail(s"batch read of vacuumed window ($since, $asOf] raised $e " +
            s"instead of the clean planning error")
      }
      true
    }
    val res = PropTest.check(
      PropTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
