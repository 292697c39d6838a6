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

  test("DSv2 lake source replays one log version per trigger and " +
      "rejects non-append changes") {
    import graft.sources.DeltaLite
    import graft.streaming.DeltaLiteStreamProvider
    val root = graft.util.Scratch.dir("st12spec")
    val t = s"$root/t"
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    DeltaLite.create(spark, t, c.filter(col("c_custkey") <= 30))
    DeltaLite.append(spark, t,
      c.filter(col("c_custkey") > 30 && col("c_custkey") <= 60))
    val ckpt = s"$root/ckpt"
    val q = spark.readStream
      .format(classOf[DeltaLiteStreamProvider].getName)
      .option("path", t).option("maxVersionsPerTrigger", "1").load()
      .writeStream.format("memory").queryName("st12spec")
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    q.stop()
    assert(spark.table("st12spec").count() ==
      c.filter(col("c_custkey") <= 60).count())
    // One offset file per replayed version (v0, v1) — the batches were
    // genuinely incremental, not one catch-all read.
    val offsets = new java.io.File(s"$ckpt/offsets").list()
      .count(!_.startsWith("."))
    assert(offsets >= 2, s"expected >=2 micro-batches, saw $offsets")
    // A copy-on-write DELETE breaks the appends-only contract loudly.
    DeltaLite.deleteWhere(spark, t, col("c_custkey") <= 10)
    val q2 = spark.readStream
      .format(classOf[DeltaLiteStreamProvider].getName)
      .option("path", t).load()
      .writeStream.format("memory").queryName("st12spec2")
      .option("checkpointLocation", s"$root/ckpt2").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination(30000)
    }
    q2.stop()
    assert(e.getCause.toString.contains("appends only"),
      s"unexpected cause: ${e.getCause}")
  }

  test("DSv2 lake source streams PARTITIONED tables: partition values " +
      "injected from the log, declared column order preserved") {
    import graft.sources.DeltaLite
    import graft.streaming.DeltaLiteStreamProvider
    val root = graft.util.Scratch.dir("st12part")
    val t = s"$root/t"
    // Partition column mid-schema → exercises the reorder projection.
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"))
    DeltaLite.create(spark, t, c.filter(col("c_custkey") <= 40),
      Seq("c_mktsegment"))
    DeltaLite.append(spark, t,
      c.filter(col("c_custkey") > 40 && col("c_custkey") <= 80))
    val q = spark.readStream
      .format(classOf[DeltaLiteStreamProvider].getName)
      .option("path", t).load()
      .writeStream.format("memory").queryName("st12part")
      .option("checkpointLocation", s"$root/ckpt").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("st12part")
    assert(got.columns.toSeq ==
      Seq("c_custkey", "c_name", "c_mktsegment", "c_acctbal"))
    assert(got.orderBy(col("c_custkey")).collect().toSeq ==
      c.filter(col("c_custkey") <= 80).orderBy(col("c_custkey"))
        .collect().toSeq)
  }

  test("DSv2 hudi source streams insert-only commits and fails loudly " +
      "on a COW rewrite in the window") {
    import graft.sources.HudiLite
    import graft.streaming.HudiLiteStreamProvider
    val t = s"${graft.util.Scratch.dir("st20spec")}/cust_hudi_stream"
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    HudiLite.create(spark, t, c.filter(col("c_custkey") <= 50),
      recordKey = "c_custkey")
    HudiLite.upsert(spark, t,
      c.filter(col("c_custkey") > 50 && col("c_custkey") <= 80))
    def readAll(): Long = {
      val name = s"sthudi${java.util.UUID.randomUUID().toString.take(8)}"
        .replace("-", "")
      val q = spark.readStream
        .format(classOf[HudiLiteStreamProvider].getName)
        .option("path", t).load()
        .writeStream.format("memory").queryName(name).outputMode("append")
        .option("checkpointLocation", graft.util.Scratch.dir("sthudickpt"))
        .start()
      try { q.processAllAvailable(); spark.table(name).count() }
      finally q.stop()
    }
    assert(readAll() == c.filter(col("c_custkey") <= 80).count())
    // A rewriting commit (matched keys) breaks the appends-only window.
    HudiLite.upsert(spark, t,
      c.filter(col("c_custkey") <= 10).withColumn("c_acctbal", lit(0.0)))
    val e = intercept[Exception] { readAll() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(x =>
      x.isInstanceOf[UnsupportedOperationException] ||
        Option(x.getMessage).exists(_.contains("appends only"))),
      e.toString.take(300))
  }

  test("restart recovery: a stopped stream resumes from its checkpoint " +
      "and delivers later commits exactly once") {
    import graft.sources.DeltaLite
    import graft.streaming.DeltaLiteStreamProvider
    val root = graft.util.Scratch.dir("strestart")
    val t = s"$root/src"
    val sink = s"$root/sink"
    val ckpt = s"$root/ckpt"
    val c = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    DeltaLite.create(spark, t, c.filter(col("c_custkey") <= 20))
    DeltaLite.append(spark, t,
      c.filter(col("c_custkey") > 20 && col("c_custkey") <= 40))
    def runOnce(): Unit = {
      val q = spark.readStream
        .format(classOf[DeltaLiteStreamProvider].getName)
        .option("path", t).option("maxVersionsPerTrigger", "1").load()
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable()
      q.stop()
    }
    runOnce() // v0, v1 delivered; query STOPS (simulated shutdown)
    val afterFirst = spark.read.parquet(sink).count()
    assert(afterFirst == c.filter(col("c_custkey") <= 40).count())
    // Two more commits land while the stream is down.
    DeltaLite.append(spark, t,
      c.filter(col("c_custkey") > 40 && col("c_custkey") <= 60))
    DeltaLite.append(spark, t,
      c.filter(col("c_custkey") > 60 && col("c_custkey") <= 80))
    runOnce() // restart from the SAME checkpoint
    val rows = spark.read.parquet(sink)
      .select(col("c_custkey")).collect().map(_.getLong(0)).sorted
    val want = c.filter(col("c_custkey") <= 80)
      .select(col("c_custkey")).collect().map(_.getLong(0)).sorted
    // Exactly once: no key replayed, no key missing, across the restart.
    assert(rows.toSeq == want.toSeq,
      s"got ${rows.length} rows, want ${want.length}")
    // The resumed run appended offsets on top of the old ones — the
    // checkpoint carried the progress across the restart.
    val offsets = new java.io.File(s"$ckpt/offsets").list()
      .count(!_.startsWith("."))
    assert(offsets >= 4, s"expected >=4 micro-batch offsets, saw $offsets")
  }
}
