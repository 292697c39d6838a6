package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables => T}

/** Duplicate-cluster assembly: connected components over pairwise
  * duplicate evidence (exact-hash groups + strong MinHash candidates),
  * so transitive near-dups (A≈B, B≈C ⇒ {A,B,C}) land in one cluster
  * with the minimum member id as the canonical representative — the
  * "semantic dedup" shape of a training-data pipeline.
  *
  * Algorithm: iterative min-label propagation (the join-based
  * large-scale connected-components formulation). Each round is one
  * keyed join + one groupBy-min — both linear shuffles. The minimum
  * label spreads one hop per round, so convergence needs O(graph
  * diameter) rounds — real dup graphs have tiny diameters (stars and
  * short chains), but the loop verifies the fixpoint (a scalar count,
  * no data collected) and THROWS if the round budget runs out rather
  * than silently returning a partially-merged labeling.
  */
object DupClusters {

  /** Connected components over an (a, b) edge list; returns
    * (id, cluster) where cluster = min id reachable. `maxRounds` bounds
    * the iteration (propagation needs O(diameter) rounds); if the graph
    * fails to converge within the budget this THROWS — an unconverged
    * labeling splits one component into several with no other signal.
    *
    * `reliable = true` switches per-round materialization from
    * `localCheckpoint` (executor block storage — fast, but an executor
    * loss mid-run recomputes from nothing) to reliable `checkpoint`
    * into the session's checkpoint dir (set
    * `sparkContext.setCheckpointDir` to a lake path first) — the
    * production setting for a multi-hour 100 TB run.
    */
  def connectedComponents(edges: DataFrame, maxRounds: Int = 30,
      reliable: Boolean = false): DataFrame = {
    // Iterative plans grow lineage every round, and the per-round
    // convergence count would re-execute the whole chain — so each
    // round's labels are checkpointed (materialized, lineage
    // truncated): the GraphX-style pattern every large-scale iterative
    // Spark algorithm uses.
    def mat(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val sym = mat(edges.select(col("a"), col("b"))
      .union(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()) // reused every round
    val vertices = sym.select(col("a").as("id")).distinct()
    var labels = mat(vertices.withColumn("cluster", col("id")))
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      // neighbor-min: each vertex adopts the smallest cluster label
      // among itself and its neighbors.
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "b2"), col("b") === col("b2"))
        .groupBy(col("a").as("id"))
        .agg(min(col("cluster")).as("nmin"))
      // Carry the previous label through the checkpointed projection so
      // the fixpoint check is a plain scan of materialized data — no
      // extra join (+shuffle) per round just to compare generations.
      val next = mat(labels.join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster")))
            .as("cluster"),
          col("cluster").as("prev")))
      val changed = next.filter(col("cluster") =!= col("prev"))
        .limit(1).count()
      labels = next.drop("prev")
      converged = changed == 0
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents: not converged after $maxRounds rounds — " +
          s"graph diameter exceeds the round budget; raise maxRounds")
    labels
  }

  /** Connected components by alternating large-star / small-star
    * rounds (the published two-phase MapReduce formulation): each round
    * rewires every node's larger neighbors (large-star), then its
    * smaller ones (small-star), onto the minimum of its closed
    * neighborhood. The edge set contracts toward min-rooted stars in
    * O(log n) rounds REGARDLESS of graph diameter — the scale-safe
    * choice when components can be long chains, where min-label
    * propagation ([[connectedComponents]]) would need O(diameter)
    * rounds. Same contract: (id, cluster = min reachable id), THROWS
    * if the round budget runs out.
    */
  def connectedComponentsStar(edges: DataFrame, maxRounds: Int = 20,
      reliable: Boolean = false): DataFrame = {
    def mat(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint() else df.localCheckpoint()
    val vertices = edges.select(col("a").as("id"))
      .union(edges.select(col("b").as("id"))).distinct()
    // Canonical undirected edge set, self-loops dropped (a vertex whose
    // only evidence is a self-loop is its own singleton cluster).
    var e = mat(edges.select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v")).distinct())
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      // Large-star: per node u, every STRICTLY LARGER neighbor v
      // re-attaches to m = min(N(u) ∪ {u}).
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
      // Small-star: canonicalize (max, min); per node u every
      // smaller-or-equal neighbor AND u itself attach to the min.
      val canon = large.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      val smins = canon.groupBy(col("u")).agg(min(col("v")).as("m"))
      val next = mat(canon.join(smins, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(smins.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct())
      // Fixpoint: the canonical edge set is unchanged. Both sides are
      // distinct, so equal counts + empty one-sided difference prove
      // set equality (one scan + one anti-join over materialized data).
      converged = next.count() == e.count() &&
        next.except(e).limit(1).count() == 0
      e = next
      round += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar: not converged after $maxRounds rounds; " +
          "raise maxRounds")
    // At the fixpoint e is min-rooted stars: u -> component min. Roots
    // and isolated vertices label themselves.
    vertices.join(e.withColumnRenamed("u", "id"), Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("v"), col("id")).as("cluster"))
  }

  /** Duplicate edges for the documents table: exact content-hash star
    * edges (keep_id — doc_id within each md5 group: linear, never
    * pairwise) plus MinHash-LSH candidates agreeing on >= minBands
    * bands (estimated Jaccard >= minBands/16 bands' threshold).
    */
  def dupEdges(docs: DataFrame, minBands: Int = 4): DataFrame = {
    val exact = docs
      .select(col("doc_id"), md5(col("text")).as("h"))
      .withColumn("keep", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("h"))))
      .filter(col("doc_id") =!= col("keep"))
      .select(col("keep").as("a"), col("doc_id").as("b"))
    val near = Dedup.minhashCandidatePairs(docs)
      .filter(col("n_bands") >= minBands)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    exact.union(near)
  }

  val all: Seq[GQuery] = Seq(
    // ---------------------------------------------------------------- d07
    // Engine-specific minhash edges → rows-only check; the spec proves
    // transitivity on a planted chain. Uses the large/small-star
    // variant: O(log n) rounds regardless of component diameter — dup
    // graphs are usually shallow stars, but one pathological long
    // chain in 100 TB of docs shouldn't dictate the round count.
    GQuery("d07_dup_clusters", (s, d) => {
      connectedComponentsStar(dupEdges(T.documents(s, d)))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("cluster_size"),
          sort_array(collect_list(col("id"))).as("members"))
        .select(col("cluster"), col("cluster_size"),
          concat_ws(",", col("members").cast("array<string>")).as("members"))
        .orderBy(col("cluster"))
    }, None)
  )
}
