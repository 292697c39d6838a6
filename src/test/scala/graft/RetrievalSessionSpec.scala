package graft

import org.apache.spark.sql.functions._

/** Semantics-level invariants for the round-6 retrieval/session/vacuum
  * additions (a07 RRF fusion, q54 batch sessionization, s42 vacuum).
  * Value-exactness is the oracle gate's job; these assert the
  * properties a refactor could silently break.
  */
class RetrievalSessionSpec extends SparkSpec {

  private def run(name: String) =
    Registry.byName(name).fn(spark, sfDir)

  test("a07 RRF fuses both systems: scores are the exact rank-reciprocal " +
      "sums, and a doc ranked by both systems beats the same ranks alone") {
    val rows = run("a07_hybrid_rrf").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val t = Option(r.getAs[java.lang.Long]("bm25_rank")).map(_.toLong)
      val v = Option(r.getAs[java.lang.Long]("vec_rank")).map(_.toLong)
      assert(t.nonEmpty || v.nonEmpty, "a fused doc must come from a system")
      val expect = (t.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        v.map(r => 1000000L / (60 + r)).getOrElse(0L)).toDouble / 1e6
      assert(math.abs(r.getAs[Double]("rrf") - expect) < 1e-9)
    }
    // Descending by construction.
    val scores = rows.map(_.getAs[Double]("rrf"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("q54 sessions partition each user's events and respect the gap " +
      "rule: no intra-session gap exceeds 6h, consecutive sessions are " +
      "more than 6h apart") {
    val sess = run("q54_sessionize").collect()
    val total = Tables.events(spark, sfDir).count()
    assert(sess.map(_.getAs[Long]("n_events")).sum == total)
    val GapUs = 21600L * 1000000L
    sess.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("sess_no"))
      // session numbering is 1..n dense per user
      assert(ordered.map(_.getAs[Long]("sess_no")).toSeq ==
        (1L to ordered.length).toSeq)
      // consecutive sessions separated by more than the gap
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val aEnd = a.getAs[java.sql.Timestamp]("session_end").getTime * 1000L
          val bStart =
            b.getAs[java.sql.Timestamp]("session_start").getTime * 1000L
          assert(bStart - aEnd > GapUs - 1000000L) // ms-truncation slack
        case _ =>
      }
      // a session's span can exceed the gap only via chained events —
      // but its duration is bounded by (n_events - 1) * gap
      ordered.foreach { r =>
        assert(r.getAs[Long]("duration_us") <=
          (r.getAs[Long]("n_events") - 1) * GapUs)
      }
    }
  }

  test("a08 MMR rerank: top-1 first, deterministic, and no less " +
      "diverse than the plain top-k") {
    import org.apache.spark.sql.functions._
    val a = run("a08_mmr_rerank").collect()
    val b = run("a08_mmr_rerank").collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == 10)
    assert(a.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
    // Pairwise-similarity comparison vs the plain cosine top-10.
    val corpus = operators.Similarity.prepared(
      Tables.embeddings(spark, sfDir), "vec_id", "embedding")
    val nvOf = corpus.collect()
      .map(r => r.getLong(0) -> r.getAs[Seq[Double]](1).toArray).toMap
    val q0 = nvOf(0L)
    def dot(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => p * q }.sum
    val top10 = nvOf.toSeq.filter(_._1 != 0L)
      .sortBy { case (id, nv) => (-dot(q0, nv), id) }.take(10)
    // first MMR pick IS the top-1 by relevance
    assert(a.head.getAs[Long]("doc_id") == top10.head._1)
    def avgPairSim(ids: Seq[Long]): Double = {
      val pairs = for {
        i <- ids.indices; j <- (i + 1) until ids.length
      } yield dot(nvOf(ids(i)), nvOf(ids(j)))
      pairs.sum / pairs.length
    }
    val mmrIds = a.map(_.getAs[Long]("doc_id")).toSeq
    assert(avgPairSim(mmrIds) <= avgPairSim(top10.map(_._1)) + 1e-9,
      "MMR must not be less diverse than the plain top-k")
  }

  test("s42 vacuum reclaims unreferenced files, keeps the live snapshot " +
      "readable, and kills pre-horizon time travel") {
    val rows = run("s42_delta_vacuum").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("reclaimed")))
    assert(rows.forall(_.getAs[Boolean]("old_version_gone")))
    assert(rows.forall(_.getAs[String]("c_mktsegment") != "AUTOMOBILE"))
  }
}
