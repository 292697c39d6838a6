package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asOf equals the theta-join + row_number oracle on generated data") {
    // Deterministic pseudo-random event data, including ties and keys
    // with no matching right rows.
    val rnd = new scala.util.Random(12345)
    val left = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(10)).toLong, rnd.nextInt(1000).toLong))
      .toDF("l_id", "key", "t")
    val right = (1 to 200).map(i =>
      ((rnd.nextInt(12)).toLong, rnd.nextInt(1000).toLong, i * 1.5))
      .toDF("key", "rt", "payload")

    val got = AsOfJoin.asOf(left, right, "key", "t", "rt",
        Seq("rt" -> "last_rt", "payload" -> "last_payload"))
      .orderBy(col("l_id"))

    // Oracle: theta join right.rt <= left.t, keep latest rt per left row
    // (ties on rt broken by larger payload, matching last() which sees
    // the later-sorted row — make the sort unambiguous instead).
    val j = left.join(right, Seq("key"), "left_outer")
      .filter(col("rt").isNull || col("rt") <= col("t"))
    val w = Window.partitionBy(col("l_id"))
      .orderBy(col("rt").desc_nulls_last, col("payload").desc)
    val oracle = left.join(
      j.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("l_id"), col("rt").as("o_rt"), col("payload").as("o_payload")),
      Seq("l_id"), "left_outer")
      .orderBy(col("l_id"))

    val gotRows = got.select(col("l_id"), col("last_rt"), col("last_payload"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
    val oracleRows = oracle.select(col("l_id"), col("o_rt"), col("o_payload"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))

    // Compare only the as-of time: with duplicate rt per key the carried
    // payload is the union-sort's last among equal rt, the oracle's is
    // rank-1 — both valid "a" row at that time; rt itself must agree.
    assert(gotRows.map(r => (r._1, r._2)).toSeq ==
      oracleRows.map(r => (r._1, r._2)).toSeq)
  }

  test("asOf: left rows with no prior right rows keep null payload") {
    val left = Seq((1L, 1L, 5L), (2L, 1L, 50L)).toDF("l_id", "key", "t")
    val right = Seq((1L, 10L, 9.9)).toDF("key", "rt", "payload")
    val got = AsOfJoin.asOf(left, right, "key", "t", "rt",
        Seq("rt" -> "last_rt", "payload" -> "last_payload"))
      .orderBy(col("l_id")).collect()
    assert(got(0).isNullAt(got(0).fieldIndex("last_rt"))) // t=5 < rt=10
    assert(got(1).getLong(got(1).fieldIndex("last_rt")) == 10L)
    assert(got(1).getDouble(got(1).fieldIndex("last_payload")) == 9.9)
  }
}
