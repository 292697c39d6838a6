package graft

import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def run(name: String) =
    Registry.byName(name).fn(spark, sfDir)

  test("a01 brute-force top-k matches an independent driver-side ranking") {
    // Independent oracle: pull vectors locally, compute cosine in plain
    // Scala, rank with the same tie-break (cos desc, vec_id asc).
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val n = norm(a) * norm(b)
      if (n > 0) d / n else 0.0
    }
    val got = run("a01_cosine_topk_bruteforce").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    val qIds = got.map(_._1).distinct
    qIds.foreach { q =>
      val expected = vecs.keys.filter(_ != q).toSeq
        .map(v => (v, cos(vecs(q), vecs(v))))
        .sortBy { case (v, c) => (-c, v) }.take(10).map(_._1)
      val actual = got.filter(_._1 == q).sortBy(_._3).map(_._2).toSeq
      assert(actual == expected, s"query $q")
    }
  }

  test("a02/a03 ANN results are valid ids ranked by true cosine") {
    for (name <- Seq("a02_ann_lsh", "a03_ivf_ann")) {
      val rows = run(name)
        .select(col("q_id"), col("neighbor_id"), col("cos"), col("rnk"))
        .collect()
      assert(rows.nonEmpty, name)
      rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
        val byRank = g.sortBy(_.getLong(3))
        // ranks are 1..k dense and cos non-increasing
        assert(byRank.map(_.getLong(3)).toSeq ==
          (1L to byRank.length).toSeq, name)
        val cs = byRank.map(_.getDouble(2))
        assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, name)
      }
    }
  }

  test("ANN is deterministic across runs") {
    val r1 = run("a02_ann_lsh").collect().toSeq
    val r2 = run("a02_ann_lsh").collect().toSeq
    assert(r1 == r2)
  }
}
