package graft.kv

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Catalog JSON for a KV table — same two accepted shapes as the
  * reference (`/root/reference/src/main/scala/com/dm/hbase/spark3/datasource/HbaseTableCatalog.scala:49-78`):
  *
  *  1. map form:  `"columns": {"name": {"cf": "columns", "col": "name",
  *     "type": "string"}, …}`
  *  2. compact list form: `"columns": ["name string columns col", …]`
  *     (space-separated `name type cf [qualifier]`, qualifier defaults
  *     to the field name)
  *
  * plus `"table": {"namespace": …, "name": …}` (namespace defaults to
  * `"default"`) and `"rowkey": <logical column name>`. The rowkey is a
  * pseudo column family with the literal name `"rowkey"`
  * (`HbaseTableCatalog.scala:45`).
  *
  * The (cf, qualifier) binding travels in Spark column METADATA
  * (`columnFamily` / `column` keys), exactly as the reference does at
  * `DefaultSource.scala:25-28`, keeping the pruned schema
  * self-describing across the driver→executor serialization boundary.
  */
final case class KvColumn(name: String, cf: String, qualifier: String, dataType: DataType) {
  def isRowkey: Boolean = cf == KvCatalog.RowkeyCf
}

/** `buckets` (optional, 0 = unbucketed): hash-bucket count over the
  * encoded rowkey. Bucketed tables tag every shard with its bucket id
  * at write time, and the scan reports a `KeyGroupedPartitioning` over
  * `bucket(buckets, rowkey)` — two tables bucketed the same way join
  * on their rowkeys WITHOUT a shuffle (Spark's storage-partitioned
  * join), which at 100 TB removes the dominant exchange of every
  * fact-fact join. The hash is [[KvBuckets.ofKey]] over the
  * order-preserving key encoding, so it is identical for the writer,
  * the scan and the SQL `bucket()` function the catalog exports. */
final case class KvCatalog(namespace: String, table: String, rowkey: String,
                           columns: Seq[KvColumn], buckets: Int = 0) {
  def qualifiedName: String = s"$namespace:$table"
  def rowkeyColumn: KvColumn = columns.find(_.name == rowkey).getOrElse(
    throw new IllegalArgumentException(s"rowkey column '$rowkey' not declared"))

  /** Catalog → Spark schema. Rowkey is non-nullable; cells nullable
    * (missing cell ≡ SQL NULL, reference `DefaultSource.scala:24`). */
  def schema: StructType = StructType(columns.map { c =>
    val md = new MetadataBuilder()
      .putString("columnFamily", c.cf)
      .putString("column", c.qualifier)
      .build()
    StructField(c.name, c.dataType, nullable = !c.isRowkey, metadata = md)
  })
}

object KvCatalog {
  val RowkeyCf = "rowkey"

  private val mapper = new ObjectMapper()

  private val DecimalRe = """decimal\((\d+),\s*(\d+)\)""".r

  /** Reference type-string table (`DefaultSource.scala:45-64`) plus the
    * extensions the reference stubs out (SURVEY.md §1.4: decimal —
    * commented out at `DefaultSource.scala:56` — plus array<float> for
    * embeddings and map<string,string> for event props). */
  def parseType(s: String): DataType = s.toLowerCase match {
    case "boolean"                    => BooleanType
    case "char" | "varchar" | "string" => StringType
    case "int" | "integer"            => IntegerType
    case "binary"                     => BinaryType
    case "byte"                       => ByteType
    case "date"                       => DateType
    case "double"                     => DoubleType
    case "float"                      => FloatType
    case "long" | "bigint"            => LongType
    case "short"                      => ShortType
    case "timestamp"                  => TimestampType
    // the reference DECLARES calendar (`DefaultSource.scala:54`) but its
    // reader decode is a commented-out TODO (`HbasePartitionReader.scala:67`)
    // — reading a declared calendar column would crash; here it round-trips
    case "calendar"                   => CalendarIntervalType
    case DecimalRe(p, sc)             => DecimalType(p.toInt, sc.toInt)
    case "array<float>"               => ArrayType(FloatType, containsNull = false)
    case "map<string,string>"         => MapType(StringType, StringType, valueContainsNull = false)
    case other => throw new IllegalArgumentException(s"Unsupported type $other")
  }

  /** DataType → the catalog type-string table above (exact inverse of
    * [[parseType]] — catalogString alone would emit `bigint`/`tinyint`
    * spellings the reference table never accepted). */
  def typeString(dt: DataType): String = dt match {
    case BooleanType          => "boolean"
    case StringType           => "string"
    case IntegerType          => "int"
    case BinaryType           => "binary"
    case ByteType             => "byte"
    case DateType             => "date"
    case DoubleType           => "double"
    case FloatType            => "float"
    case LongType             => "long"
    case ShortType            => "short"
    case TimestampType        => "timestamp"
    case CalendarIntervalType => "calendar"
    case d: DecimalType       => s"decimal(${d.precision},${d.scale})"
    // nullability-insensitive: SQL `ARRAY<FLOAT>` parses to
    // containsNull=true, but the cell encoding is the same either way
    // (no per-element null bitmap is stored) — see [[normalizeType]]
    case ArrayType(FloatType, _)                   => "array<float>"
    case MapType(StringType, StringType, _)        => "map<string,string>"
    case other => throw new IllegalArgumentException(
      s"type ${other.catalogString} has no graft-kv cell encoding")
  }

  /** Collapse SQL-parsed nullable container variants to the cell
    * encoding's canonical non-null form: `CREATE TABLE ... ARRAY<FLOAT>`
    * arrives as ArrayType(FloatType, containsNull=true), which would
    * otherwise be rejected as "no cell encoding" even though the
    * encoding exists (it just never stores element nulls; a write with
    * a null element still fails at encode time). */
  def normalizeType(dt: DataType): DataType = dt match {
    case ArrayType(FloatType, _) => ArrayType(FloatType, containsNull = false)
    case MapType(StringType, StringType, _) =>
      MapType(StringType, StringType, valueContainsNull = false)
    case other => other
  }

  /** Catalog → map-form JSON ([[parse]]'s shape 1; ObjectNode preserves
    * insertion order, so the declared column order round-trips). */
  def render(cat: KvCatalog): String = {
    val root = mapper.createObjectNode()
    val t = root.putObject("table")
    t.put("namespace", cat.namespace)
    t.put("name", cat.table)
    root.put("rowkey", cat.rowkey)
    if (cat.buckets > 0) root.put("buckets", cat.buckets)
    val cols = root.putObject("columns")
    cat.columns.foreach { c =>
      val n = cols.putObject(c.name)
      n.put("cf", c.cf)
      n.put("col", c.qualifier)
      n.put("type", typeString(c.dataType))
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  def parse(json: String): KvCatalog = {
    val root = mapper.readTree(json)
    val tableNode = root.path("table")
    val namespace = Option(tableNode.path("namespace").asText(null)).filter(_.nonEmpty)
      .getOrElse("default")
    val name = tableNode.path("name").asText()
    require(name.nonEmpty, "catalog.table.name is required")
    val rowkey = root.path("rowkey").asText()
    require(rowkey.nonEmpty, "catalog.rowkey is required")

    val colsNode = root.path("columns")
    val columns: Seq[KvColumn] =
      if (colsNode.isArray) {
        // compact list form: "name type cf [qualifier]"
        colsNode.elements().asScala.map { e =>
          val parts = e.asText().trim.split("\\s+")
          require(parts.length >= 3, s"bad compact column spec: '${e.asText()}'")
          val qual = if (parts.length >= 4) parts(3) else parts(0)
          KvColumn(parts(0), parts(2), qual, parseType(parts(1)))
        }.toSeq
      } else if (colsNode.isObject) {
        // iterate the ObjectNode's LinkedHashMap IN INSERTION ORDER (a
        // Set wrapper would re-hash it): declared column order is the
        // table's positional schema — SQL `INSERT INTO t VALUES …` binds
        // by position, so a scrambled order mis-assigns every value
        colsNode.properties().iterator().asScala.map { entry =>
          val n = entry.getKey
          val v = entry.getValue
          val cf = v.path("cf").asText()
          val qual = Option(v.path("col").asText(null)).filter(_.nonEmpty).getOrElse(n)
          KvColumn(n, cf, qual, parseType(v.path("type").asText()))
        }.toSeq
      } else throw new IllegalArgumentException("catalog.columns must be an object or array")

    require(columns.exists(_.name == rowkey), s"rowkey '$rowkey' not among declared columns")
    val rk = columns.find(_.name == rowkey).get
    require(rk.cf == RowkeyCf,
      s"rowkey column '$rowkey' must use the '$RowkeyCf' pseudo column family " +
        s"(got '${rk.cf}') — a cell-cf rowkey would silently read as NULL")
    val buckets = root.path("buckets").asInt(0)
    require(buckets >= 0, s"catalog.buckets must be non-negative, got $buckets")
    KvCatalog(namespace, name, rowkey, columns, buckets)
  }
}
