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

  /** Per-round frontier sizes of the most recent [[label]] run (round 1
    * first). Diagnostic only — the stress harness logs these to show
    * the frontier COLLAPSING at scale (the whole point of
    * frontier-based propagation: round 1 touches every labeled vertex,
    * later rounds only the still-changing neighborhoods). Last
    * completed run wins under concurrent callers; never read it for
    * correctness decisions. */
  @volatile var lastFrontierSizes: Seq[Long] = Nil

  /** The materialized RDD behind a localCheckpoint'd frame, for freeing
    * its blocks once the next round supersedes it (Dataset.unpersist
    * only reaches cacheManager entries, not checkpoint storage). */
  private def checkpointRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => Some(l.rdd)
      case _ => None
    }

  /** Label every vertex of `vertices` (column `idCol`) with the minimum
    * vertex id reachable through `pairs` (columns `id_a`, `id_b`).
    * Output: (idCol, cluster_id), one row per vertex; singletons label
    * themselves.
    *
    * The iterative relation holds only TOUCHED vertices (those appearing
    * in a pair): an isolated vertex can never change its label, so the
    * loop works on O(|pairs|) rows regardless of corpus size — at 100 TB
    * near-dup rates of a few percent, that is orders of magnitude
    * smaller than the vertex set. Singletons join back in one final
    * projection.
    *
    * Propagation is FRONTIER-based: only vertices whose label changed
    * last round re-broadcast it (round 1: everyone). A neighbor whose
    * label did not change was already heard in the round it last did,
    * so restricting the edge join to the frontier loses nothing — and
    * near-dup graphs are mostly tiny dense clusters that converge in a
    * round or two, so the frontier (and with it the per-round edge
    * join) collapses after round 1 instead of re-scanning every edge
    * against every label to fixpoint. Empty frontier IS the fixpoint
    * witness — no separate convergence aggregate.
    *
    * `reliable = false` (default): `localCheckpoint` — blocks live on
    * executors; fastest, but an executor loss mid-computation kills the
    * job (acceptable for the re-runnable batch step this is). On a
    * long-running 1000-executor cluster pass `reliable = true`: rounds
    * checkpoint through `Dataset.checkpoint` to the REQUIRED
    * `SparkContext.setCheckpointDir` location (HDFS/object store), so
    * the loop survives executor loss; checkpoint files are reclaimed by
    * the dir's lifecycle (or `spark.cleaner.referenceTracking
    * .cleanCheckpoints`), block unpersists degrade to no-ops. */
  def label(vertices: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
            maxRounds: Int = 50, reliable: Boolean = false): DataFrame = {
    val out = propagate(vertices, pairs, idCol, maxRounds, reliable)
    require(out.isDefined,
      s"connected components did not converge in $maxRounds rounds " +
        "(long-diameter graph? labelAuto escalates to star contraction)")
    out.get
  }

  /** Whether the most recent [[labelAuto]] call escalated to star
    * contraction. Diagnostic only, same caveats as [[lastFrontierSizes]]. */
  @volatile var lastEscalated: Boolean = false

  /** Production entry point: frontier min-label propagation (optimal for
    * the tiny dense clusters near-dup graphs are made of — 2-4 rounds,
    * per-round work bounded by the shrinking frontier), escalating to
    * [[labelAlternating]] (O(log² n) rounds regardless of diameter) when
    * the graph proves long-diameter instead of failing. A frontier still
    * alive after `escalateAfter` rounds means chain-like structure, where
    * per-round propagation advances labels only one hop — the O(diameter)
    * trap. The wasted work on escalation is bounded: `escalateAfter`
    * frontier rounds over touched vertices only. Both algorithms emit the
    * identical labeling (component-minimum id), so escalation can never
    * change results, only running time. */
  def labelAuto(vertices: DataFrame, pairs: DataFrame, idCol: String = "doc_id",
                escalateAfter: Int = 8, reliable: Boolean = false): DataFrame =
    propagate(vertices, pairs, idCol, escalateAfter, reliable) match {
      case Some(done) => lastEscalated = false; done
      case None =>
        lastEscalated = true
        labelAlternating(vertices, pairs, idCol, reliable = reliable)
    }

  /** [[label]]'s loop; None = not converged within `maxRounds` (all
    * per-round blocks released either way). */
  private def propagate(vertices: DataFrame, pairs: DataFrame, idCol: String,
                        maxRounds: Int, reliable: Boolean): Option[DataFrame] = {
    if (reliable) require(
      vertices.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "reliable = true needs SparkContext.setCheckpointDir (an HDFS/object-store " +
        "path every executor can reach)")
    // checkpoint (either flavor) TRUNCATES lineage, so each round's
    // plan is a constant-size tree over materialized blocks instead of
    // nesting the pair-generation DAG once per round — without it the
    // logical plan (and Catalyst analysis time) grows exponentially
    // with round count. (Both flavors are EAGER here: blocks/files
    // exist when the call returns.)
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val edges = ckpt(pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst"))))
    var labels = ckpt(edges.select(col("src").as(idCol)).distinct()
      .withColumn("cluster_id", col(idCol)))
    var frontier = labels // round 1: every touched vertex broadcasts
    var changed = -1L
    var round = 0
    val frontierLog = scala.collection.mutable.ArrayBuffer[Long]()
    while (changed != 0L && round < maxRounds) {
      // labels the frontier pushes to its neighbors, folded to one
      // candidate per vertex (bounded by the frontier's neighborhood,
      // NOT the full edge set once the frontier shrinks)
      val updates = ckpt(edges.join(frontier, edges("dst") === frontier(idCol))
        .select(edges("src").as(idCol), col("cluster_id"))
        .groupBy(col(idCol)).agg(min(col("cluster_id")).as("cand")))
      val next = ckpt(labels.join(updates, Seq(idCol), "left")
        .select(col(idCol),
          when(col("cand") < col("cluster_id"), col("cand"))
            .otherwise(col("cluster_id")).as("cluster_id")))
      val newFrontier = ckpt(labels.join(updates, Seq(idCol))
        .filter(col("cand") < col("cluster_id"))
        .select(col(idCol), col("cand").as("cluster_id")))
      changed = newFrontier.count() // cheap: counts materialized blocks
      frontierLog += changed
      checkpointRdd(updates).foreach(_.unpersist(false))
      if (!(frontier eq labels)) // round 1 aliases them; free once
        checkpointRdd(frontier).foreach(_.unpersist(false))
      checkpointRdd(labels).foreach(_.unpersist(false))
      labels = next
      frontier = newFrontier
      round += 1
    }
    checkpointRdd(edges).foreach(_.unpersist(false))
    if (!(frontier eq labels))
      checkpointRdd(frontier).foreach(_.unpersist(false))
    lastFrontierSizes = frontierLog.toSeq
    if (changed != 0L) { // labels won't be returned — release its blocks too
      checkpointRdd(labels).foreach(_.unpersist(false))
      return None
    }
    // singletons (never in a pair) label themselves
    Some(vertices.select(col(idCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id")))
  }

  /** Star-contraction connected components (alternating large-star /
    * small-star, Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC '14) — the long-diameter fallback [[label]]'s
    * Scaladoc points to, with the identical output contract: one row
    * per `vertices` vertex, `cluster_id` = component-minimum id.
    *
    * [[label]] converges in O(diameter) rounds — right for near-dup
    * graphs (tiny dense clusters, diameter 2-3) but dead on a chain: a
    * 1M-link path is 1M shuffle rounds. Star contraction instead
    * rewires every vertex toward the minimum of its closed
    * neighborhood each round, provably converging to per-component
    * stars in O(log² n) rounds REGARDLESS of diameter, with the edge
    * relation (never materialized per-vertex-pair) as the only state.
    *
    * Each round is two grouped aggregations over the current edge set:
    *  - large-star: every vertex `v > u` adjacent to `u` re-attaches to
    *    `m(u) = min(N(u) ∪ {u})` — tall trees flatten;
    *  - small-star: every smaller neighbor of `u` (and `u` itself)
    *    attaches to `u`'s minimum smaller neighbor — stars tighten.
    * Both emit canonical `(hi > lo)` edges, so the relation shrinks
    * toward exactly one row per non-root vertex. Convergence is
    * detected by a (count, hash-sum) signature match and then CONFIRMED
    * exactly with a symmetric except on the (star-sized, small) edge
    * set — a colliding signature only delays exit by a round, never
    * mislabels.
    *
    * Same `reliable` contract as [[label]]: per-round checkpoints
    * truncate lineage; pass `reliable = true` on a real cluster to back
    * them with the SparkContext checkpoint dir. */
  def labelAlternating(vertices: DataFrame, pairs: DataFrame,
                       idCol: String = "doc_id", maxRounds: Int = 30,
                       reliable: Boolean = false): DataFrame = {
    if (reliable) require(
      vertices.sparkSession.sparkContext.getCheckpointDir.isDefined,
      "reliable = true needs SparkContext.setCheckpointDir (an HDFS/object-store " +
        "path every executor can reach)")
    def ckpt(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()

    def largeStar(e: DataFrame): DataFrame = {
      // full (closed) neighborhood of u: both edge orientations
      val nbr = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val m = nbr.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      nbr.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .filter(col("hi") =!= col("lo")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      // canonical edges already orient hi > lo, so grouping by hi sees
      // exactly the SMALLER neighborhood the algorithm asks for
      val m = e.groupBy(col("hi")).agg(min(col("lo")).as("mn"))
      val att = e.join(m, "hi").select(col("lo").as("x"), col("mn"))
        .union(m.select(col("hi").as("x"), col("mn")))
      att.filter(col("x") =!= col("mn"))
        .select(col("x").as("hi"), col("mn").as("lo")).distinct()
    }
    def signature(e: DataFrame): (Long, Long) = {
      // bit_xor, not sum: xor of hashes is order-independent AND can
      // never overflow ANSI long arithmetic at any row count
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(hi, lo))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }

    var edges = ckpt(pairs
      .select(greatest(col("id_a"), col("id_b")).as("hi"),
        least(col("id_a"), col("id_b")).as("lo"))
      .filter(col("hi") =!= col("lo")).distinct())
    var sig = signature(edges)
    var converged = sig._1 == 0L // empty graph is already all-singletons
    var round = 0
    while (!converged && round < maxRounds) {
      val next = ckpt(smallStar(largeStar(edges)))
      val nsig = signature(next)
      if (nsig == sig)
        converged = next.except(edges).isEmpty && edges.except(next).isEmpty
      checkpointRdd(edges).foreach(_.unpersist(false))
      edges = next
      sig = nsig
      round += 1
      if (sys.env.contains("GRAFT_CC_DEBUG"))
        System.err.println(s"[cc] alternating round=$round edges=${nsig._1} converged=$converged")
    }
    require(converged,
      s"star contraction did not converge in $maxRounds rounds")
    // fixpoint = stars: one (vertex, component-min) edge per non-root
    val labels = edges.select(col("hi").as(idCol), col("lo").as("cluster_id"))
    vertices.select(col(idCol))
      .join(labels, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cluster_id"), col(idCol)).as("cluster_id"))
  }
}
