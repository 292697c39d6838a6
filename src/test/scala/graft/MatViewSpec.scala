package graft

import org.apache.spark.sql.functions._
import graft.sources.{DeltaLite, MatView}
import graft.util.Scratch

class MatViewSpec extends SparkSpec {

  private def fresh(): (String, String) = {
    val root = Scratch.dir("mvspec")
    (s"$root/base", s"$root/mv")
  }

  private def recompute(base: String) =
    DeltaLite.snapshot(spark, base)
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("c_acctbal").cast("decimal(12,2)")).cast("decimal(30,2)")
          .as("sum_val"),
        count(lit(1)).as("n"))

  private def assertMatches(mv: String, base: String): Unit = {
    val got = MatView.read(spark, mv)
      .orderBy(col("c_mktsegment")).collect().toSeq
    val want = recompute(base)
      .orderBy(col("c_mktsegment")).collect().toSeq
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("incremental refresh across append and delete equals a full " +
      "recompute; groups deleted to zero rows vanish") {
    val (base, mv) = fresh()
    val c = Tables.customer(spark, sfDir)
    DeltaLite.create(spark, base, c.filter(col("c_custkey") <= 60))
    MatView.create(spark, base, mv, Seq("c_mktsegment"), "c_acctbal")
    assertMatches(mv, base)
    // Append-only window: the CDF fast path feeds the refresh.
    DeltaLite.append(spark, base, c.filter(col("c_custkey") > 60))
    MatView.refresh(spark, mv)
    assertMatches(mv, base)
    // Delete window: signed (−1) contributions subtract exactly.
    DeltaLite.deleteWhere(spark, base, col("c_custkey") % 3 === 0)
    MatView.refresh(spark, mv)
    assertMatches(mv, base)
    // Delete an entire group: its view row must disappear, not linger
    // as a zero.
    DeltaLite.deleteWhere(spark, base, col("c_mktsegment") === "BUILDING")
    MatView.refresh(spark, mv)
    assertMatches(mv, base)
    assert(!MatView.read(spark, mv).collect()
      .exists(_.getString(0) == "BUILDING"))
  }

  test("a current view's refresh is a version-check no-op (no new " +
      "snapshot dir is written)") {
    val (base, mv) = fresh()
    val c = Tables.customer(spark, sfDir).limit(50)
    DeltaLite.create(spark, base, c)
    MatView.create(spark, base, mv, Seq("c_mktsegment"), "c_acctbal")
    def dirs(): Set[String] =
      new java.io.File(mv).listFiles().map(_.getName).toSet
    val before = dirs()
    val v = MatView.refresh(spark, mv)
    assert(v == DeltaLite.latestVersion(spark, base))
    assert(dirs() == before, "no-op refresh must not write a snapshot")
  }
}
