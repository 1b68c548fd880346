package graft.sources

import graft.kv._
import org.apache.spark.sql.types._

/** Throwaway single-threaded cost apportionment for the KV scan inner
  * loop — NOT a test; run with `Test/runMain graft.sources.ScanProfile
  * <tableDir>` against a table written by graft.Stress. Times three
  * nested loops over the same shards: parse-only (records materialized,
  * nothing decoded), parse+decode (scratch filled), and
  * parse+decode+predicate. The deltas show where a further reader
  * optimization would actually pay. */
object ScanProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(sys.error("usage: ScanProfile <tableDir>"))
    val meta = KvStore.readMeta(dir)
    val catalog = KvCatalog.parse(
      """{"table":{"name":"lineitem_ab"},"rowkey":"lk",
        | "columns":{"lk":{"cf":"rowkey","col":"lk","type":"long"},
        |            "l_partkey":{"cf":"m","col":"pk","type":"long"},
        |            "l_quantity":{"cf":"m","col":"qt","type":"double"},
        |            "l_extendedprice":{"cf":"m","col":"ep","type":"double"},
        |            "l_discount":{"cf":"m","col":"di","type":"double"},
        |            "l_returnflag":{"cf":"m","col":"rf","type":"string"},
        |            "l_linestatus":{"cf":"m","col":"ls","type":"string"}}}""".stripMargin)
    val declared = catalog.schema
    val filters: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.GreaterThan("l_quantity", 10.0))
    // one decoder + compiled predicate PER SHARD, as the partition
    // readers do — a shared decoder would accumulate per-shard interned
    // name identities in its memo and stop being representative
    def freshDecoder(): (KvRecordDecoder, () => Boolean) = {
      val d = new KvRecordDecoder(declared, declared.fieldNames.toSet)
      (d, FilterEval.compile(filters, d.idxByName, d.dtByName, d.scratch))
    }

    def timeIt(label: String)(loop: KvShardMeta => Long): Unit = {
      // warm once, then min of 3
      def once(): (Double, Long) = {
        val t0 = System.nanoTime()
        var n = 0L
        meta.shards.foreach(s => n += loop(s))
        ((System.nanoTime() - t0) / 1e9, n)
      }
      once()
      val runs = Seq(once(), once(), once())
      val best = runs.map(_._1).min
      println(f"$label%-22s ${best}%6.2f s   rows=${runs.head._2}")
    }

    timeIt("parse-only") { s =>
      val r = new KvStore.ShardReader(dir, s); var n = 0L
      while (r.hasNext) { r.next(); n += 1 }; r.close(); n
    }
    timeIt("parse+decode") { s =>
      val (decoder, _) = freshDecoder()
      val r = new KvStore.ShardReader(dir, s, null, null, decoder.wantedCell); var n = 0L
      while (r.hasNext) { decoder.decodeInto(r.next()); n += 1 }; r.close(); n
    }
    timeIt("parse+decode+pred") { s =>
      val (decoder, pred) = freshDecoder()
      val r = new KvStore.ShardReader(dir, s, null, null, decoder.wantedCell); var n = 0L
      while (r.hasNext) { decoder.decodeInto(r.next()); if (pred()) n += 1 }; r.close(); n
    }
  }
}
