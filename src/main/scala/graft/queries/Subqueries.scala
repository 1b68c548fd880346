package graft.queries

import graft.{Q, Tables}
import graft.util.Exact._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Subquery forms (IN / EXISTS / correlated) run through `spark.sql` over
  * temp views — the reference's canonical usage pattern
  * (`/root/reference/src/test/scala/ScalaDatasourceTest.scala:84-91`
  * registers a view and queries it with session.sql). Catalyst rewrites
  * these to semi/anti/aggregate joins; the oracle runs the identical text.
  */
object Subqueries {

  /** IN (uncorrelated subquery) → LeftSemi after Catalyst rewrite. */
  val q17InSubquery: Q = Q(
    "q17_in_subquery",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql(s"""
        SELECT o_orderstatus, count(*) AS n,
               ${sqlDsum("o_totalprice")} AS total
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")
    },
    Some(s"""
      SELECT o_orderstatus, count(*) AS n,
             ${sqlDsum("o_totalprice")} AS total
      FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
    doc = "IN-subquery → semi join rewrite")

  /** Correlated EXISTS with an extra predicate on the inner side. */
  val q18CorrelatedExists: Q = Q(
    "q18_correlated_exists",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql("""
        SELECT c_mktsegment, count(*) AS n_waiting
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment""")
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n_waiting
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
    doc = "correlated EXISTS → semi join")

  /** TPC-H Q17 shape (small-quantity revenue vs per-part average).
    * The correlated `l_quantity < 0.2 * avg(...)` comparison is rewritten
    * to the exactly-equivalent integer-side form
    * `5 * l_quantity * cnt < sum_qty` in exact DECIMAL arithmetic, so both
    * engines evaluate the same order-independent predicate (a raw double
    * avg would be reduction-order-dependent at the boundary).
    *
    * The per-part aggregate is a WINDOW over l_partkey rather than a
    * self-join against `GROUP BY l_partkey`: at 100 TB that halves the
    * fact-table I/O (lineitem is scanned ONCE; the window's single
    * hash-partition shuffle on l_partkey replaces the aggregate's
    * shuffle + the join back). DECIMAL window sums stay exact and
    * order-independent, so the predicate is unchanged. */
  val q19AvgQtyRevenue: Q = Q(
    "q19_avg_qty_revenue",
    (s, d) => {
      Tables.registerAll(s, d)
      s.sql(s"""
        SELECT p_brand,
               ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly,
               count(*) AS n
        FROM (SELECT l_partkey, l_extendedprice, l_quantity,
                     count(*) OVER (PARTITION BY l_partkey) AS cnt,
                     sum(${sqlDec("l_quantity")}) OVER (PARTITION BY l_partkey) AS sumq
              FROM lineitem) l
        JOIN part ON p_partkey = l_partkey
        WHERE ${sqlDec("l_quantity")} * 5 * cnt < sumq
        GROUP BY p_brand
        ORDER BY p_brand""")
    },
    Some(s"""
      SELECT p_brand,
             ${sqlDsum("l_extendedprice")} / 7.0 AS avg_yearly,
             count(*) AS n
      FROM (SELECT l_partkey, l_extendedprice, l_quantity,
                   count(*) OVER (PARTITION BY l_partkey) AS cnt,
                   sum(${sqlDec("l_quantity")}) OVER (PARTITION BY l_partkey) AS sumq
            FROM lineitem) l
      JOIN part ON p_partkey = l_partkey
      WHERE ${sqlDec("l_quantity")} * 5 * cnt < sumq
      GROUP BY p_brand
      ORDER BY p_brand"""),
    doc = "correlated-avg predicate in exact arithmetic, single fact scan")

  /** The reference's one UDF, `from_iso_string`
    * (`/root/reference/src/test/scala/ScalaDatasourceTest.scala:72`):
    * ISO-8601 string → timestamp. Registered the same way
    * (`spark.udf.register`) and applied to ISO strings rendered from
    * o_orderdate, round-tripping back to the original instant. */
  val q20IsoTimestamp: Q = Q(
    "q20_iso_timestamp",
    (s, d) => {
      s.udf.register("from_iso_string", (v: String) =>
        java.sql.Timestamp.from(java.time.ZonedDateTime.parse(v).toInstant))
      val o = Tables.orders(s, d)
      // sort FIRST, on the narrow (key, date) relation, then format +
      // parse above the Sort (r21): orderBy is a range shuffle whose
      // sampling pass re-executes its child, so with the UDF below the
      // sort every row paid format + parse TWICE per run (JobProfile:
      // two ~0.7 s jobs, the sampler and the sort). A projection above
      // Sort preserves the sorted order; rows and output order are
      // identical (o_orderkey is unique).
      o.select(col("o_orderkey"), col("o_orderdate"))
        .orderBy(col("o_orderkey"))
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("iso"))
        .withColumn("parsed_ts", call_udf("from_iso_string", col("iso")))
        .withColumn("parsed_date", to_date(col("parsed_ts")))
    },
    Some("""
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ') AS iso,
             strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ'),
                      '%Y-%m-%dT%H:%M:%SZ') AS parsed_ts,
             CAST(strptime(strftime(o_orderdate, '%Y-%m-%dT%H:%M:%SZ'),
                           '%Y-%m-%dT%H:%M:%SZ') AS DATE) AS parsed_date
      FROM orders
      ORDER BY o_orderkey"""),
    doc = "reference from_iso_string UDF round-trip")

  def defs: Seq[Q] = Seq(q17InSubquery, q18CorrelatedExists, q19AvgQtyRevenue, q20IsoTimestamp)
}
