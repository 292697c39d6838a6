package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantics-level invariants for the profiling / pipeline operators
  * added in round 6 (q52 histogram, q53 gap fill, d13 hash split,
  * t14 BM25, m08 BMP decode, s41 summarize). Value-exactness is the
  * oracle gate's job; these assert the properties a refactor could
  * silently break.
  */
class ProfileOpsSpec extends SparkSpec {

  private def run(name: String) =
    Registry.byName(name).fn(spark, sfDir)

  test("q52 histogram partitions every row exactly once and shares " +
      "sum to 1") {
    val rows = run("q52_histogram").collect()
    val total = Tables.orders(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-2)
    val buckets = rows.map(_.getAs[Long]("bucket"))
    assert(buckets.distinct.length == buckets.length)
    assert(buckets.forall(b => b >= 0 && b <= 11))
  }

  test("d13 split is total, deterministic across runs, and stable " +
      "under corpus growth (an existing doc never moves)") {
    val a = run("d13_hash_split").collect()
    val b = run("d13_hash_split").collect()
    assert(a.toSeq == b.toSeq)
    val total = Tables.documents(spark, sfDir).count()
    assert(a.map(_.getAs[Long]("n_docs")).sum == total)
    // Stability: the split of a doc depends only on its own id — the
    // half-corpus assignment agrees with the full-corpus one.
    val h = substring(md5(col("doc_id").cast("string")), 1, 2)
    val splitCol =
      when(h < "cd", "train").when(h < "e6", "val").otherwise("test")
    val full = Tables.documents(spark, sfDir)
      .select(col("doc_id"), splitCol.as("s_full"))
    val half = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), splitCol.as("s_half"))
    assert(full.join(half, "doc_id")
      .filter(col("s_full") =!= col("s_half")).count() == 0)
  }

  test("t14 BM25 ranks by score with doc_id tiebreak; every hit " +
      "matched at most the three query terms") {
    val rows = run("t14_bm25").collect()
    assert(rows.nonEmpty && rows.length <= 15)
    assert(rows.forall(r => r.getAs[Long]("n_terms") >= 1 &&
      r.getAs[Long]("n_terms") <= 3))
    val keys = rows.map(r =>
      (-r.getAs[Double]("score"), r.getAs[Long]("doc_id")))
    assert(keys.sameElements(keys.sorted.take(keys.length)))
    assert(rows.forall(_.getAs[Double]("score") > 0.0))
  }

  test("q53 gap fill emits the full user x day spine; gap days carry " +
      "the previous filled value; leading gaps stay null") {
    val rows = run("q53_gap_fill").collect()
    val users = rows.map(_.getAs[Long]("user_id")).distinct
    assert(rows.length == users.length * 30)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
      sorted.foldLeft(Option.empty[Double]) { (prev, r) =>
        val filled = Option(r.getAs[java.lang.Double]("filled_sum"))
          .map(_.doubleValue())
        if (r.getAs[Long]("n") == 0L)
          assert(filled == prev, s"gap day must carry prior value: $r")
        else assert(filled.isDefined)
        filled
      }
    }
  }

  test("m08 BMP stride obeys the 4-byte row padding rule and widths/" +
      "heights recover the construction") {
    val rows = run("m08_bmp_decode").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("asset_id")
      assert(r.getAs[String]("format") == "bmp")
      assert(r.getAs[Long]("width") == 4 + id % 13)
      assert(r.getAs[Long]("height") == 3 + id % 5)
      assert(r.getAs[Long]("bpp") == 24L)
      val stride = r.getAs[Long]("row_stride")
      assert(stride % 4 == 0 && stride >= 3 * r.getAs[Long]("width"))
      assert(r.getAs[Boolean]("size_ok"))
    }
  }

  test("s41 summarize: per-column cardinalities are consistent " +
      "(distinct <= nonnull <= rows) and min <= max") {
    val rows = run("s41_summarize").collect()
    assert(rows.length == 6)
    rows.foreach { case r: Row =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_nonnull"))
      assert(r.getAs[Long]("n_nonnull") <= r.getAs[Long]("n_rows"))
      assert(r.getAs[String]("min_v") != null &&
        r.getAs[String]("max_v") != null)
    }
  }
}
