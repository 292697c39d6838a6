package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.{ExpandExec, SparkPlan}

/** Mechanical plan-shape gate: the §5 "scan aggs no shuffle / joins
  * one shuffle max" claims, previously prose + spot specs, asserted
  * as EXCHANGE COUNTS per gated key. Counts are taken with AQE off
  * (deterministic initial plan) and reused exchanges NOT recounted —
  * a ReusedExchangeExec wrapper is the reuse working, not a new
  * shuffle. Each bound is the measured honest shape; a regression
  * that adds an exchange (a lost broadcast, a dropped partial agg, a
  * resurrected Expand) fails here before it costs anything at scale.
  */
class PlanShapeSpec extends SparkSpec {

  // The executedPlan MUST be forced while adaptive.enabled is still
  // false: it is a lazy val, and if first touched after the finally
  // restores AQE the root is an AdaptiveSparkPlanExec leaf whose
  // children are invisible to collectWithSubqueries — every bound
  // would pass vacuously (r15 advisor finding; ShuffleCount.scala
  // already did this correctly).
  private def planOf(name: String): SparkPlan = {
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try Registry.byName(name).fn(spark, sfDir).queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  private def shuffles(plan: SparkPlan): Int =
    plan.collectWithSubqueries {
      case e: ShuffleExchangeLike => e
    }.size

  private def expands(plan: SparkPlan): Int =
    plan.collectWithSubqueries {
      case e: ExpandExec => e
    }.size

  // key -> max exchanges. The ≤1 class is one output-ordering or
  // global-agg exchange on top of pure scan-side work; ≤2 adds one
  // keyed aggregate below it (q01 agg+sort, q10 pre-agg+topk, d01
  // keyed dedup+order).
  private val bounds = Seq(
    "q02_filter_project" -> 1,
    "q06_scan_agg" -> 1,
    "q03_join_agg" -> 1, // dims broadcast: the agg is the only shuffle
    "x25_sql_tpch_q6" -> 1,
    "t01_token_count" -> 1,
    "t02_quality_score" -> 1,
    "t04_fingerprint" -> 1,
    "t16_hash_classifier" -> 1, // scoring itself is zero-shuffle
    // d03 carries the r16 over-full-bucket guard: +1 exchange for the
    // hot-bucket count aggregate (partial-combined — it shuffles one
    // row per mapper-distinct bucket, not the band table) and +1
    // duplicated scan-widen repartition on the count branch (the
    // guard's broadcast IS reused across both join sides). Still zero
    // shuffles of the band table beyond the widen.
    "d03_simhash" -> 3,
    "m01_binary_meta" -> 1,
    "x111_sql_list_comprehension" -> 1,
    "x112_sql_operators" -> 1,
    "q01_pricing_summary" -> 2,
    "q10_topk" -> 2,
    "d01_exact_dedup" -> 2)

  test("exchange-count ceilings hold for the keys §5 calls scan-bound " +
      "or one-shuffle") {
    Sql.open(spark, sfDir)
    val over = bounds.flatMap { case (name, max) =>
      val n = shuffles(planOf(name))
      if (n > max) Some(s"$name: $n exchanges (bound $max)") else None
    }
    assert(over.isEmpty, over.mkString("; "))
  }

  test("q09/q30 plan without Expand (the r14 aggregate-shape finding: " +
      "co-located COUNT(DISTINCT)s expanded the scan x3/x4) and within " +
      "their split-aggregate exchange budget") {
    Sql.open(spark, sfDir)
    for ((name, maxSh) <- Seq("q09_distinct" -> 6,
        "q30_approx_distinct" -> 4)) {
      val df = planOf(name)
      assert(expands(df) == 0, s"$name: Expand resurfaced")
      val n = shuffles(df)
      assert(n <= maxSh, s"$name: $n exchanges (bound $maxSh)")
    }
  }
}
