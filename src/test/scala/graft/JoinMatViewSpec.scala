package graft

import org.apache.spark.sql.functions._
import graft.sources.{DeltaLite, JoinMatView}
import graft.util.Scratch

/** Delta-join incremental view maintenance: every refresh must equal a
  * full recompute of γ(fact ⋈ dim) at the tables' current snapshots.
  */
class JoinMatViewSpec extends SparkSpec {

  private def recompute(fact: String, dim: String) =
    DeltaLite.snapshot(spark, fact)
      .join(DeltaLite.snapshot(spark, dim),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)"))
          .cast("decimal(32,2)").as("sum_val"),
        count(lit(1)).as("n"))

  private def viewRows(mv: String) =
    JoinMatView.read(spark, mv).orderBy(col("c_mktsegment"))
      .collect().toSeq

  private def wantRows(fact: String, dim: String) =
    recompute(fact, dim).orderBy(col("c_mktsegment")).collect().toSeq

  test("refresh equals recompute across fact appends/deletes, dim " +
      "updates, and a two-sided refresh; no-op refresh is free") {
    val root = Scratch.dir("jmvspec")
    val fact = s"$root/fact"
    val dim = s"$root/dim"
    val mv = s"$root/mv"
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    DeltaLite.create(spark, fact, o.filter(col("o_orderkey") <= 5000))
    DeltaLite.create(spark, dim, c)
    JoinMatView.create(spark, fact, dim, mv,
      "o_custkey", "c_custkey", Seq("c_mktsegment"), "o_totalprice")
    assert(viewRows(mv) == wantRows(fact, dim))

    // Fact append alone.
    DeltaLite.append(spark, fact,
      o.filter(col("o_orderkey") > 5000 && col("o_orderkey") <= 7000))
    JoinMatView.refresh(spark, mv)
    assert(viewRows(mv) == wantRows(fact, dim))

    // Fact delete alone.
    DeltaLite.deleteWhere(spark, fact, col("o_orderkey") % 13 === 0)
    JoinMatView.refresh(spark, mv)
    assert(viewRows(mv) == wantRows(fact, dim))

    // Dim update alone (re-segmentation moves contributions between
    // groups — the case a fact-only maintainer can't handle).
    DeltaLite.updateWhere(spark, dim, col("c_custkey") % 7 === 0,
      Map("c_mktsegment" -> lit("MOVED")))
    JoinMatView.refresh(spark, mv)
    assert(viewRows(mv) == wantRows(fact, dim))

    // BOTH sides change before one refresh: the cross-delta term must
    // count exactly once (ΔA pairs with B_new, ΔB with A_old).
    DeltaLite.append(spark, fact,
      o.filter(col("o_orderkey") > 7000 && col("o_orderkey") <= 8000))
    DeltaLite.updateWhere(spark, dim, col("c_custkey") % 7 === 1,
      Map("c_mktsegment" -> lit("MOVED2")))
    JoinMatView.refresh(spark, mv)
    assert(viewRows(mv) == wantRows(fact, dim))

    // No-op refresh: versions unchanged, same snapshot dir kept.
    val tok = JoinMatView.stateToken(spark, mv)
    JoinMatView.refresh(spark, mv)
    assert(JoinMatView.stateToken(spark, mv) == tok,
      "a current view must not rewrite anything")
  }
}
