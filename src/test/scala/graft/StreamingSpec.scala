package graft

import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {

  test("st01 streaming windowed agg equals the batch computation over " +
      "closed windows") {
    val streamed = Registry.byName("st01_windowed_agg").fn(spark, sfDir)
      .collect().toSeq
    // Append mode emits exactly the windows closed at end-of-stream:
    // window end ≤ final watermark = max(ts) − 1h delay.
    val ev = Tables.events(spark, sfDir)
    val cutoff = ev.agg(max(col("ts"))).head().getTimestamp(0)
    val batch = ev
      .groupBy(date_trunc("hour", col("ts")).as("w_start"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(20,6)")).cast("double").as("total"))
      .filter(col("w_start") + expr("INTERVAL 2 HOURS") <= lit(cutoff))
      .orderBy(col("w_start"), col("event_type"))
      .collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("st03 streaming dedup equals batch DISTINCT") {
    val streamed = Registry.byName("st03_stateful_dedup").fn(spark, sfDir)
      .collect().toSeq
    val batch = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts")).distinct()
      .orderBy(col("user_id"), col("event_type"), col("ts"))
      .collect().toSeq
    assert(streamed == batch)
  }
}
