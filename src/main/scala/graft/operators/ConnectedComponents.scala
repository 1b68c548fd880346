package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair relation — the clustering step a
  * dedup pipeline runs AFTER near-dup pair generation (q42/q43/q44
  * emit pairs; retention policy needs whole duplicate GROUPS so one
  * survivor per cluster can be kept).
  *
  * Min-label propagation to fixpoint: every vertex starts labeled with
  * its own id; each round a vertex takes the minimum label among itself
  * and its neighbors. Converges in O(component diameter) rounds — for
  * near-dup clusters (small, dense) effectively 2-3 rounds. The driver
  * loop's only scalar is the per-round changed-row COUNT (a Pregel-style
  * convergence check, not a data collect); per-round relations are
  * persisted and the previous round unpersisted, so lineage stays
  * constant-depth. At extreme diameters (long chains) switch to a
  * path-doubling / large-star-small-star variant — same contract.
  */
object ConnectedComponents {

  /** Label every vertex of `vertices` (column `idCol`) with the minimum
    * vertex id reachable through `pairs` (columns `id_a`, `id_b`).
    * Output: (idCol, cluster_id), one row per vertex; singletons label
    * themselves. */
  def label(vertices: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
            maxRounds: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    var labels = vertices.select(col(idCol), col(idCol).as("cluster_id")).persist()
    labels.count()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      val neighborLabels = edges.join(labels, edges("dst") === labels(idCol))
        .select(edges("src").as(idCol), col("cluster_id"))
      val next = labels.select(col(idCol), col("cluster_id")).union(neighborLabels)
        .groupBy(col(idCol)).agg(min(col("cluster_id")).as("cluster_id"))
        .persist()
      changed = next.join(labels.withColumnRenamed("cluster_id", "prev"), idCol)
        .filter(col("cluster_id") =!= col("prev")).count()
      labels.unpersist()
      labels = next
      round += 1
    }
    edges.unpersist()
    require(changed == 0, s"connected components did not converge in $maxRounds rounds")
    labels
  }
}
