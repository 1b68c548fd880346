package graft.sources

import java.util

import graft.kv.{KvCatalog, KvStore}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** DSv2 entry point for the graft KV store — the rebuild of the
  * reference's `DefaultSource`
  * (`/root/reference/src/main/scala/com/dm/hbase/spark3/datasource/DefaultSource.scala:18-65`):
  * schema comes from the out-of-band `catalog` JSON option, never from
  * data. Improvements over the reference, per SURVEY.md §2.1: a
  * registered short name (`graft-kv`; the reference forces the FQCN) and
  * a write path (the reference is read-only).
  *
  * Options: `catalog` = catalog JSON (both reference shapes), `path` =
  * table directory.
  */
class KvDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-kv"

  private def catalogOf(options: util.Map[String, String]): KvCatalog = {
    val json = options.get("catalog")
    require(json != null, "option 'catalog' (JSON) is required")
    KvCatalog.parse(json)
  }

  private def pathOf(options: util.Map[String, String]): String = {
    val p = options.get("path")
    require(p != null, "option 'path' (table directory) is required")
    // the session catalog rewrites the path option to a file: URI when
    // the table is created via SQL DDL; resolve it back to a local path
    // (a raw "file:/x" string would otherwise be treated as a RELATIVE
    // directory literally named "file:" under the working directory)
    if (p.startsWith("file:")) java.net.URI.create(p).getPath else p
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    catalogOf(options).schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // inferSchema sees a CaseInsensitiveStringMap; normalize here too so
    // option("Catalog", …) doesn't pass inference then fail table creation
    val opts = new CaseInsensitiveStringMap(properties)
    new KvTable(catalogOf(opts), pathOf(opts))
  }

  override def supportsExternalMetadata(): Boolean = false
}

/** Table handle: batch read + batch write (+ truncate for overwrite). */
class KvTable(val catalog: KvCatalog, val dir: String)
    extends Table with SupportsRead with SupportsWrite {

  override def name(): String = catalog.qualifiedName
  override def schema(): StructType = catalog.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
        TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ,
        TableCapability.STREAMING_WRITE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // `columnar` (default true): vectorized batch decode for flat
    // forward scans; `columnar=false` pins the row-at-a-time reader.
    // `asOfVersion` (optional): snapshot read of a past manifest commit
    // — valid while retain-mode compaction + vacuum grace keep the
    // superseded shard files (truncate deletes them immediately).
    val asOf = Option(options.get("asOfVersion")).map(_.toLong)
    new KvScanBuilder(catalog, dir, options.getBoolean("columnar", true), asOf)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KvWriteBuilder(catalog, dir, info)
}
