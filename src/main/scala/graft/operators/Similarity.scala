package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{GQuery, Tables => T}
import graft.functions.{FastVector, VectorOps}

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`array<float>` 64-dim).
  *
  * Three tiers:
  *  - a01 brute force — the exactness baseline. Query side is tiny and
  *    broadcast; cost is one scan of the corpus per ranking. Correct at
  *    any scale but O(corpus) per query: the thing a02/a03 beat.
  *  - a02 LSH — random-hyperplane bucketing; probes only colliding
  *    buckets, so per-query cost ∝ bucket size, not corpus size.
  *  - a03 IVF — k-means-lite (one Lloyd step from deterministic seeds);
  *    queries probe the nprobe nearest centroids and scan only those
  *    inverted lists. The centroid table is tiny → broadcast joins; the
  *    corpus shuffles once on cluster id.
  */
object Similarity {

  private val K = 10
  private val NQueries = 8 // vec_id < 8 are the query vectors

  private def normalized(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d).select(col("vec_id"),
      FastVector.normalize(col("embedding")).as("nv"))

  private def queriesDf(base: DataFrame): DataFrame =
    base.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("nv").as("q_nv"))

  /** Rank candidate (q_id, vec_id, cos) rows to top-K per query. */
  private def topK(cand: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= K)
      .select(col("q_id"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 6).as("cos"), col("rnk"))
      .orderBy(col("q_id"), col("rnk"))
  }

  val all: Seq[GQuery] = Seq(

    // ---------------------------------------------------------------- a01
    GQuery("a01_cosine_topk_bruteforce", (s, d) => {
      val base = normalized(s, d)
      val cand = base.join(broadcast(queriesDf(base)),
          col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          FastVector.dot(col("q_nv"), col("nv")).as("cos"))
      topK(cand)
    }, None),

    // ---------------------------------------------------------------- a02
    // 16 LSH tables × 6 hyperplane bits. Corpus side shuffles once on
    // (table, bucket); query side is broadcast. Recall is probabilistic
    // (that's the point) but fully deterministic given the fixed seed.
    // Parameter choice is the recall/cost dial: for the synthetic
    // near-orthogonal embeddings (top-1 cos ≈ 0.5 → collision p ≈ .667
    // per bit) 6×16 gives ~0.7 recall@10 probing ~10% of the corpus;
    // real clustered embeddings reach the same recall with far fewer
    // probes. Measured numbers in docs/BENCH_NOTES.md.
    GQuery("a02_ann_lsh", (s, d) => {
      val tables = 16
      val planes = (0 until tables).map(t =>
        VectorOps.makePlanes(seed = 200 + t, nBits = 6, dim = 64))
      val base = normalized(s, d)
      def bucketed(df: DataFrame, idc: String, nvc: String): DataFrame =
        df.select(col(idc), col(nvc),
          posexplode(FastVector.hyperplaneBuckets(col(nvc), planes))
            .as(Seq("tbl", "bucket")))
      val corpus = bucketed(base, "vec_id", "nv")
      val qs = bucketed(queriesDf(base), "q_id", "q_nv")
        .withColumnRenamed("tbl", "qtbl").withColumnRenamed("bucket", "qbucket")
      val cand = corpus.join(broadcast(qs),
          col("tbl") === col("qtbl") && col("bucket") === col("qbucket") &&
            col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"), col("q_nv"), col("nv"))
        .distinct()
        .select(col("q_id"), col("vec_id"),
          FastVector.dot(col("q_nv"), col("nv")).as("cos"))
      topK(cand)
    }, None),

    // ---------------------------------------------------------------- a03
    // IVF: seeds = every 37th vector; one Lloyd refinement (per-dim mean
    // via posexplode → groupBy(cluster, dim) → re-assemble); assignment
    // and probing are broadcast nested-loop over the tiny centroid set.
    GQuery("a03_ivf_ann", (s, d) => {
      val base = normalized(s, d)
      val seeds = base.filter(col("vec_id") % 37 === 0)
        .select(col("vec_id").as("cid0"), col("nv").as("cv0"))

      def nearest(vecs: DataFrame, cents: DataFrame, idc: String,
          vc: String, cidc: String, cvc: String, keep: Int): DataFrame = {
        val scored = vecs.join(broadcast(cents))
          .select(col(idc), col(vc), col(cidc),
            FastVector.dot(col(vc), col(cvc)).as("csim"))
        val w = Window.partitionBy(col(idc))
          .orderBy(col("csim").desc, col(cidc))
        scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= keep)
          .drop("rn", "csim")
      }

      // Lloyd step: mean of member vectors per cluster, re-normalized.
      val assign0 = nearest(base, seeds, "vec_id", "nv", "cid0", "cv0", 1)
      val cents = assign0
        .select(col("cid0").as("cid"), posexplode(col("nv")).as(Seq("dim", "x")))
        .groupBy(col("cid"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cid"), FastVector.normalize(
          transform(col("dm"), e => e.getField("m"))).as("cv"))

      val assigned = nearest(base, cents, "vec_id", "nv", "cid", "cv", 1)
        .select(col("vec_id"), col("nv"), col("cid"))
      // nprobe=6 of ~54 lists ≈ 11% of the corpus scanned per query —
      // the recall/cost dial; see docs/BENCH_NOTES.md for measurements.
      val probes = nearest(queriesDf(base), cents, "q_id", "q_nv", "cid", "cv",
          6)
        .select(col("q_id"), col("q_nv"), col("cid"))
      val cand = assigned.join(broadcast(probes), Seq("cid"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id"),
          FastVector.dot(col("q_nv"), col("nv")).as("cos"))
      topK(cand)
    }, None)
  )
}
