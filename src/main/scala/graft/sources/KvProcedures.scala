package graft.sources

import java.io.File

import graft.kv.{KvCompactor, KvStore}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL stored procedures for table maintenance (`ProcedureCatalog` on
  * [[KvSqlCatalog]]) — the management surface the reference delegates to
  * the HBase shell. Everything a production operator runs on a schedule
  * becomes one SQL statement:
  *
  * {{{
  *   CALL graft.system.compact(tbl => 'default.events', target_mb => 256)
  *   CALL graft.system.vacuum(tbl => 'default.events', grace_minutes => 60)
  *   CALL graft.system.fsck(tbl => 'default.events')
  *   CALL graft.system.history(tbl => 'default.events')
  * }}}
  *
  * Each returns a small result set (a driver-side [[LocalScan]]): the
  * work itself is the same locked/optimistic maintenance machinery the
  * engine already trusts ([[KvCompactor]], [[KvStore.verifyTable]]) —
  * procedures add no second code path, only a SQL entry point.
  * `history` is the navigation companion to time travel: one row per
  * RETAINED manifest version (live + archived) with its commit stamp,
  * exactly the values `VERSION AS OF` / `TIMESTAMP AS OF` accept.
  */
object KvProcedures {

  /** Resolve 'ns.tbl' / 'tbl' against the warehouse root. */
  private def dirOf(warehouse: String, tbl: String): String = {
    val parts = tbl.split("\\.")
    require(parts.length == 1 || parts.length == 2,
      s"table must be 'name' or 'namespace.name', got '$tbl'")
    val (ns, name) = if (parts.length == 2) (parts(0), parts(1)) else ("default", parts(0))
    val dir = new File(new File(warehouse, ns), name)
    require(new File(dir, "_kvcatalog.json").exists(), s"no such table: $tbl")
    dir.getPath
  }

  private def tblParam =
    ProcedureParameter.in("tbl", StringType)
      .comment("table as 'namespace.name' (namespace defaults to 'default')").build()

  private def result1(name: String, v: Int): (StructType, Array[InternalRow]) =
    (StructType(Seq(StructField(name, IntegerType, nullable = false))),
      Array[InternalRow](new GenericInternalRow(Array[Any](v))))

  /** One-scan driver-side result. */
  private final class ResultScan(schema: StructType, data: Array[InternalRow])
      extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] = data
    override def description(): String = "graft-kv procedure result"
  }

  private def one(schema: StructType, data: Array[InternalRow]): java.util.Iterator[Scan] =
    java.util.List.of[Scan](new ResultScan(schema, data)).iterator()

  /** Adapter: a named procedure whose bound form runs `body` over the
    * coerced argument row. All graft procedures are non-deterministic
    * (they read/mutate on-disk state). */
  private abstract class Proc(procName: String, procDesc: String,
                              params: Array[ProcedureParameter])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = procDesc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params
    override def isDeterministic: Boolean = false
  }

  def all(warehouse: String): Map[String, UnboundProcedure] = Map(
    "compact" -> new Proc("compact",
      "merge small shards into ~target_mb outputs (bucket-local for bucketed tables); " +
        "retain_inputs keeps superseded files for snapshot/incremental readers",
      Array(tblParam,
        ProcedureParameter.in("target_mb", IntegerType).defaultValue("256").build(),
        ProcedureParameter.in("retain_inputs", BooleanType).defaultValue("true").build())) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getString(0))
        val n = KvCompactor.compact(dir, input.getInt(1).toLong << 20,
          retainInputs = input.getBoolean(2))
        val (s, r) = result1("outputs_written", n)
        one(s, r)
      }
    },

    "vacuum" -> new Proc("vacuum",
      "delete superseded shard files and archived manifests older than the grace window " +
        "(bounds time travel and incremental reads)",
      Array(tblParam,
        ProcedureParameter.in("grace_minutes", IntegerType).defaultValue("60").build())) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getString(0))
        val n = KvCompactor.vacuum(dir, input.getInt(1).toLong * 60_000L)
        val (s, r) = result1("files_removed", n)
        one(s, r)
      }
    },

    "fsck" -> new Proc("fsck",
      "verify every live shard's CRC32C against the manifest; fails on the first corrupt shard",
      Array(tblParam)) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getString(0))
        val (s, r) = result1("shards_verified", KvStore.verifyTable(dir))
        one(s, r)
      }
    },

    "history" -> new Proc("history",
      "one row per retained manifest version (live + archived): the inputs VERSION AS OF / " +
        "TIMESTAMP AS OF accept",
      Array(tblParam)) {
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val dir = dirOf(warehouse, input.getString(0))
        val current = KvStore.readMeta(dir)
        val archived = Option(new File(dir).listFiles()).toSeq.flatten
          .filter(f => f.getName.startsWith("_kvmeta.v") && f.getName.endsWith(".json"))
          .flatMap { f =>
            try Some(KvStore.readMetaFileForHistory(f)) catch { case _: Exception => None }
          }
        val schema = StructType(Seq(
          StructField("version", LongType, nullable = false),
          StructField("committed_at", TimestampType, nullable = true),
          StructField("shards", IntegerType, nullable = false),
          StructField("rows", LongType, nullable = false),
          StructField("is_current", BooleanType, nullable = false)))
        val rows = (archived :+ current).sortBy(_.version).map { m =>
          new GenericInternalRow(Array[Any](
            m.version,
            if (m.committedAtMs > 0) m.committedAtMs * 1000L else null,
            m.shards.length, m.shards.map(_.rows).sum,
            m.version == current.version)): InternalRow
        }.toArray
        one(schema, rows)
      }
    })
}
