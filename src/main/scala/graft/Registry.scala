package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark implementation plus (when the semantics are
  * ANSI-SQL-expressible) the equivalent DuckDB oracle SQL used by the
  * driver's correctness gate. `oracle = None` → driver records a weaker
  * rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  /** All query modules, merged. Order is stable for bench output. */
  def all: Seq[Q] =
    queries.Relational.defs ++
      queries.Extras.defs ++
      queries.Subqueries.defs ++
      queries.EventsTime.defs ++
      queries.TextOps.defs ++
      queries.Dedup.defs ++
      queries.Similarity.defs ++
      queries.Bm25Store.defs ++
      queries.LshStore.defs ++
      queries.IvfStore.defs ++
      queries.IvfKvStore.defs ++
      queries.Multimodal.defs ++
      queries.Curation.defs ++
      queries.KvQueries.defs
}
