package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity}

/** Closes the verification holes VERDICT r2 flagged: d05 is exercised at
  * its production threshold (θ=0.95) on planted high-cosine pairs, and
  * ANN recall is measured on CLUSTERED embeddings — the structure the
  * bucket-pruning design is supposed to exploit — not just the
  * near-orthogonal worst case in docs/BENCH_NOTES.md.
  */
class RecallSpec extends SparkSpec {

  private val Dim = 64

  private def unit(rnd: Random): Array[Double] = {
    val v = Array.fill(Dim)(rnd.nextGaussian())
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  private def jitter(v: Array[Double], sigma: Double, rnd: Random): Array[Double] =
    v.map(_ + sigma * rnd.nextGaussian())

  private def embDf(rows: Seq[(Long, Array[Double])]): DataFrame = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v.map(_.toFloat)) }
      .toDF("vec_id", "embedding")
  }

  test("d05 embeddingNearDup finds planted pairs at the production " +
      "threshold θ=0.95 and nothing else") {
    val rnd = new Random(7)
    val bases = (0L until 20L).map(id => id -> unit(rnd))
    // Planted near-dups: ids 100+i are tiny-noise copies of ids 0..4
    // (cos ≈ 0.999 — the real-world duplicate shape θ=0.95 targets).
    val dups = (0L until 5L).map(i => (100L + i) -> jitter(bases(i.toInt)._2, 0.005, rnd))
    // A related-but-not-duplicate pair at cos ≈ 0.7: must NOT appear.
    val a = bases(10)._2
    val b = bases(11)._2
    val mid = a.zip(b).map { case (x, y) => 0.7 * x + math.sqrt(1 - 0.49) * y }
    val corpus = embDf(bases ++ dups :+ (200L -> mid))

    val got = Dedup.embeddingNearDup(corpus, theta = 0.95, dim = Dim)
      .select(col("vec_a"), col("vec_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 5L).map(i => (i, 100L + i)).toSet
    assert(got == planted,
      s"expected exactly the planted pairs; got $got")
  }

  test("ANN recall on clustered embeddings: LSH and IVF both exploit " +
      "the cluster structure") {
    val rnd = new Random(11)
    val centers = Seq.fill(8)(unit(rnd))
    val corpus = embDf(
      for {
        c <- centers.indices
        m <- 0 until 50
      } yield (c * 50L + m) -> jitter(centers(c), 0.1, rnd))
    val prep = Similarity.prepared(corpus, "vec_id", "embedding").cache()
    val queries = Similarity.asQueries(
      prep.filter(col("vec_id") % 50 === 0)) // one per cluster

    def resultSet(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("q_id"), col("neighbor_id")).collect()
        .groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }

    val truth = resultSet(
      Similarity.bruteForceTopK(prep, queries, excludeSelf = true))

    def recall(got: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      per.sum / per.size
    }

    val lshRecall = recall(resultSet(
      Similarity.lshTopK(prep, queries, excludeSelf = true)))
    val ivfRecall = recall(resultSet(
      Similarity.ivfTopK(prep, queries, excludeSelf = true)))
    val pqRecall = recall(resultSet(
      Similarity.ivfPqTopK(prep, queries, excludeSelf = true)))
    val sqRecall = recall(resultSet(
      Similarity.sqTopK(prep, queries, excludeSelf = true)))
    info(f"clustered recall: lsh=$lshRecall%.3f ivf=$ivfRecall%.3f " +
      f"ivfpq=$pqRecall%.3f sq=$sqRecall%.3f")
    // On clustered data bucket pruning should keep most true neighbors:
    // far above the ~0.6-0.7 measured on near-orthogonal vectors.
    assert(lshRecall >= 0.85, f"LSH clustered recall $lshRecall%.3f")
    assert(ivfRecall >= 0.85, f"IVF clustered recall $ivfRecall%.3f")
    // PQ quantizes (lossy) but the exact-dot rerank of the 4k ADC
    // shortlist repairs most of it.
    assert(pqRecall >= 0.80, f"IVF-PQ clustered recall $pqRecall%.3f")
    // SQ8 scans everything (no routing) and 8-bit error is tiny next
    // to the 8× rerank margin — near-exact by construction.
    assert(sqRecall >= 0.95, f"SQ8 clustered recall $sqRecall%.3f")

    // Range search (a05/a06): within a cluster (jitter 0.1 around a
    // unit center) cosines sit high, across clusters near 0 — θ=0.5
    // separates them. The exact path must return precisely the
    // brute-force membership; the LSH path may only MISS (no false
    // positives — every candidate is re-verified exactly), and on
    // clustered data misses are rare.
    def rangeSet(df: DataFrame): Map[Long, Set[Long]] = resultSet(df)
    val exactRange = rangeSet(
      Similarity.rangeSearch(prep, queries, theta = 0.5,
        excludeSelf = true))
    val truthRange = rangeSet(
      prep.crossJoin(queries.withColumnRenamed("q_nv", "qv"))
        .filter(col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("neighbor_id"),
          graft.functions.FastVector.dot(col("qv"), col("nv")).as("cos"))
        .filter(col("cos") >= 0.5))
    assert(exactRange == truthRange, "exact range search must be exact")
    val lshRange = rangeSet(
      Similarity.rangeSearchLsh(prep, queries, theta = 0.5,
        excludeSelf = true))
    val falsePos = lshRange.exists { case (q, ns) =>
      (ns -- truthRange.getOrElse(q, Set.empty)).nonEmpty
    }
    assert(!falsePos, "LSH range search must never return a pair " +
      "below the threshold")
    val rr = {
      val per = truthRange.map { case (q, t) =>
        lshRange.getOrElse(q, Set.empty).intersect(t).size.toDouble /
          math.max(1, t.size)
      }
      per.sum / per.size
    }
    info(f"clustered range recall: lsh=$rr%.3f")
    assert(rr >= 0.85, f"LSH range recall $rr%.3f")
  }

  test("d09 semanticDedup finds planted near-dups at θ=0.95 within " +
      "clusters and nothing else") {
    val rnd = new Random(31)
    val bases = (0L until 120L).map(id => id -> unit(rnd))
    // Tiny-noise copies of ids 0..4: same nearest centroid, cos≈0.999.
    val dups = (0L until 5L).map(i =>
      (500L + i) -> jitter(bases(i.toInt)._2, 0.005, rnd))
    val corpus = embDf(bases ++ dups)
    val got = Dedup.semanticDedup(corpus, theta = 0.95, seedStride = 11)
      .select(col("vec_a"), col("vec_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L until 5L).map(i => (i, 500L + i)).toSet,
      s"expected exactly the planted pairs; got $got")
  }

  test("dim is derived from the data: 128-dim vectors with no explicit " +
      "dim match explicit dim=128 exactly") {
    val rnd = new Random(23)
    val dim = 128
    def unit128(): Array[Double] = {
      val v = Array.fill(dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val bases = (0L until 30L).map(id => id -> unit128())
    val dups = (0L until 5L).map(i =>
      (100L + i) -> jitter(bases(i.toInt)._2, 0.005, rnd))
    val corpus = embDf(bases ++ dups)
    // d05 path: derived dim finds the planted pairs, identically to an
    // explicit (correct) dim — a stale explicit 64 would bucket on half
    // of each vector.
    def pairs(d: Int) = Dedup.embeddingNearDup(corpus, theta = 0.95, dim = d)
      .select(col("vec_a"), col("vec_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(-1) == pairs(128))
    assert(pairs(-1) == (0L until 5L).map(i => (i, 100L + i)).toSet)
    // a02 path: lshTopK with derived dim equals explicit dim=128.
    val prep = Similarity.prepared(corpus, "vec_id", "embedding")
    val queries = Similarity.asQueries(prep.filter(col("vec_id") < 3))
    def rows(d: Int) =
      Similarity.lshTopK(prep, queries, dim = d, excludeSelf = true)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(rows(-1) == rows(128) && rows(-1).nonEmpty)
  }

  test("q29/q30 approximate aggregates stay inside their documented " +
      "error bounds vs the exact answers") {
    val li = Tables.lineitem(spark, sfDir)
    // percentile_approx(accuracy=10000): rank error ≤ n/accuracy, so the
    // approx median must lie between the exact 45th and 55th percentiles
    // (a vastly looser rank window than the guarantee — a grossly wrong
    // sketch still fails).
    val r = li.agg(
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("a50"),
      percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000)).as("a95"),
      expr("percentile(l_extendedprice, 0.45)").as("e45"),
      expr("percentile(l_extendedprice, 0.55)").as("e55"),
      expr("percentile(l_extendedprice, 0.90)").as("e90"),
      expr("percentile(l_extendedprice, 0.99)").as("e99"),
      approx_count_distinct(col("l_partkey")).as("adParts"),
      countDistinct(col("l_partkey")).as("edParts"),
      approx_count_distinct(col("l_orderkey")).as("adOrders"),
      countDistinct(col("l_orderkey")).as("edOrders")).head()
    assert(r.getDouble(0) >= r.getDouble(2) && r.getDouble(0) <= r.getDouble(3),
      s"approx p50 ${r.getDouble(0)} outside [${r.getDouble(2)}, ${r.getDouble(3)}]")
    assert(r.getDouble(1) >= r.getDouble(4) && r.getDouble(1) <= r.getDouble(5),
      s"approx p95 ${r.getDouble(1)} outside [${r.getDouble(4)}, ${r.getDouble(5)}]")
    // approx_count_distinct documents rsd = 0.05 default; 4σ margin.
    for ((a, e) <- Seq((r.getLong(6), r.getLong(7)), (r.getLong(8), r.getLong(9))))
      assert(math.abs(a - e).toDouble / e <= 0.20,
        s"approx distinct $a vs exact $e: relative error > 20%")
  }

  test("a11 recall evaluation emits one row per demo query with " +
      "recall in [0,1] and a usable mean on the gate data") {
    val rows = Registry.byName("a11_recall_eval").fn(spark, sfDir)
      .collect()
    assert(rows.length == 8, s"expected 8 query rows, got ${rows.length}")
    val recalls = rows.map(_.getAs[Double]("recall_at_10"))
    assert(recalls.forall(r => r >= 0.0 && r <= 1.0))
    rows.foreach { r =>
      assert(r.getAs[Double]("recall_at_10") ==
        r.getAs[Long]("n_hits") / 10.0)
    }
    val mean = recalls.sum / recalls.length
    info(f"a11 mean IVF recall@10 on $sfDir: $mean%.3f")
    // Floor, not a pin: recall is a dial (nprobe/cells), and the demo
    // corpus is near-orthogonal random vectors — the hardest case.
    // sf0.001 measures ~1.0 (few cells, probes cover most of them);
    // sf0.01 ~0.54 with nprobe=6 of ~25 cells.
    assert(mean >= 0.5, f"mean recall@10 $mean%.3f below floor")
  }
}
