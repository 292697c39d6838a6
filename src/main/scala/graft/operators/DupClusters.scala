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
    // transitivity on a planted chain.
    GQuery("d07_dup_clusters", (s, d) => {
      connectedComponents(dupEdges(T.documents(s, d)))
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("cluster_size"),
          sort_array(collect_list(col("id"))).as("members"))
        .select(col("cluster"), col("cluster_size"),
          concat_ws(",", col("members").cast("array<string>")).as("members"))
        .orderBy(col("cluster"))
    }, None)
  )
}
