package graft

import org.apache.spark.sql.functions._
import graft.util.Par

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("Par: decimal money sum is partitioning-invariant (exact arithmetic)") {
    val values = (1 to 1000).map(i => (i % 97) + i * 0.01)
    val df1 = values.toDF("x").repartition(1)
    val df8 = values.toDF("x").repartition(8)
    def total(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(Par.moneySum(Par.dec2(col("x"))).as("t")).collect()(0).getDouble(0)
    assert(total(df1) == total(df8)) // bit-identical, not approx
  }

  test("Par: oneMinus/onePlus stay exact DECIMAL(12,2)") {
    val row = Seq(0.07).toDF("d")
      .select(Par.oneMinus(col("d")).as("om"), Par.onePlus(col("d")).as("op"))
      .collect()(0)
    assert(row.getDecimal(0).toString == "0.93")
    assert(row.getDecimal(1).toString == "1.07")
  }

  test("d01 exact dedup keeps the minimum doc_id per content hash") {
    val docs = Seq((5L, "same text"), (2L, "same text"), (9L, "other"))
      .toDF("doc_id", "text")
    val got = docs.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
      .orderBy(col("keep_id")).collect()
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((2L, 2L), (9L, 1L)))
  }

  test("q31 sample predicate is deterministic across partitionings") {
    val ids = Registry.byName("q31_sample").fn(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber")).collect().toSeq
    val again = Registry.byName("q31_sample").fn(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber")).collect().toSeq
    assert(ids == again && ids.nonEmpty)
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key exists in queries, and names are inventory keys") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    assert(qs.forall(_.matches("[a-z]+[0-9]+[a-z0-9_]*")))
  }
}
