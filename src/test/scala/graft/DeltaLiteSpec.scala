package graft

import org.apache.spark.sql.functions._
import graft.sources.DeltaLite
import graft.util.Scratch

class DeltaLiteSpec extends SparkSpec {

  private def freshTable(): String = s"${Scratch.dir("deltaspec")}/t"

  test("create/append/snapshot round-trips exactly") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    DeltaLite.create(spark, t, c.filter(col("c_custkey") <= 40))
    DeltaLite.append(spark, t, c.filter(col("c_custkey") > 40))
    assert(DeltaLite.latestVersion(spark, t) == 1L)
    val got = DeltaLite.snapshot(spark, t)
      .orderBy(col("c_custkey")).collect().toSeq
    val want = c.orderBy(col("c_custkey")).collect().toSeq
    assert(got == want)
  }

  test("deleteWhere rewrites ONLY files containing matches") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    // Two disjoint files: custkey ranges never share a mktsegment row
    // pattern, so deleting from one range must leave the other file
    // untouched in the log.
    DeltaLite.create(spark, t,
      c.filter(col("c_custkey") <= 40).coalesce(1))
    DeltaLite.append(spark, t,
      c.filter(col("c_custkey") > 40).coalesce(1))
    DeltaLite.deleteWhere(spark, t, col("c_custkey") === 1)
    // Snapshot semantics: exactly one row gone.
    val got = DeltaLite.snapshot(spark, t)
      .orderBy(col("c_custkey")).collect().toSeq
    val want = c.filter(col("c_custkey") =!= 1)
      .orderBy(col("c_custkey")).collect().toSeq
    assert(got == want)
    // Copy-on-write selectivity: the v2 commit removed exactly ONE file
    // (the one holding custkey 1) — the other survives unrewritten.
    val log = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "_delta_log",
        "00000000000000000002.json")), "UTF-8")
    assert(log.linesIterator.count(_.contains("\"remove\"")) == 1)
  }

  test("time travel reads a past version; later commits invisible") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    DeltaLite.create(spark, t, c.filter(col("c_custkey") <= 40))
    DeltaLite.deleteWhere(spark, t, col("c_custkey") <= 10)
    val v0 = DeltaLite.snapshot(spark, t, version = 0L).count()
    val v1 = DeltaLite.snapshot(spark, t).count()
    assert(v0 == c.filter(col("c_custkey") <= 40).count())
    assert(v1 == c.filter(col("c_custkey") > 10 && col("c_custkey") <= 40)
      .count())
  }

  test("merge updates matched rows, inserts unmatched, leaves " +
      "untouched files alone") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    DeltaLite.create(spark, t, c.filter(col("c_custkey") <= 20).coalesce(1))
    DeltaLite.append(spark, t,
      c.filter(col("c_custkey") > 20 && col("c_custkey") <= 40).coalesce(1))
    // Source: update key 1 (double balance), insert key 1000000.
    val source = c.filter(col("c_custkey") === 1)
      .withColumn("c_acctbal", col("c_acctbal") * 2)
      .unionByName(c.filter(col("c_custkey") === 1)
        .withColumn("c_custkey", lit(1000000L)))
    DeltaLite.merge(spark, t, source, Seq("c_custkey"))
    val got = DeltaLite.snapshot(spark, t)
    assert(got.count() == c.filter(col("c_custkey") <= 40).count() + 1)
    val origBal = c.filter(col("c_custkey") === 1)
      .head().getAs[Double]("c_acctbal")
    assert(got.filter(col("c_custkey") === 1)
      .head().getAs[Double]("c_acctbal") == origBal * 2)
    assert(got.filter(col("c_custkey") === 1000000L).count() == 1)
    // Only the file containing key 1 was rewritten: one remove action.
    val log = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(t, "_delta_log",
        "00000000000000000002.json")), "UTF-8")
    assert(log.linesIterator.count(_.contains("\"remove\"")) == 1)
  }

  test("compact bin-packs files without changing content") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    DeltaLite.create(spark, t, c.repartition(6))
    val before = DeltaLite.snapshot(spark, t)
      .orderBy(col("c_custkey")).collect().toSeq
    DeltaLite.compact(spark, t, targetFiles = 1)
    val after = DeltaLite.snapshot(spark, t)
      .orderBy(col("c_custkey")).collect().toSeq
    assert(after == before)
    assert(DeltaLite.pruneInfo(spark, t, lit(true))._2 == 1) // 6 → 1 file
  }

  test("stats-based data skipping prunes non-overlapping files and " +
      "stays exact") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    DeltaLite.create(spark, t, c.repartitionByRange(4, col("c_custkey")))
    val pred = col("c_custkey") >= 10 && col("c_custkey") <= 20
    val (kept, total) = DeltaLite.pruneInfo(spark, t, pred)
    assert(total == 4 && kept < total,
      s"expected pruning: kept=$kept total=$total")
    val got = DeltaLite.scan(spark, t, pred)
      .orderBy(col("c_custkey")).collect().toSeq
    val want = c.filter(pred).orderBy(col("c_custkey")).collect().toSeq
    assert(got == want)
    // String-column stats prune too (segment names don't overlap
    // an impossible literal), and an un-prunable predicate keeps all.
    assert(DeltaLite.pruneInfo(spark, t,
      col("c_mktsegment") === "ZZZ_NO_SUCH")._1 == 0)
    assert(DeltaLite.pruneInfo(spark, t,
      col("c_name").contains("x"))._1 == total)
  }

  test("two writers racing appendWithRetry both land; content is the " +
      "union") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    DeltaLite.create(spark, t, c.filter(col("c_custkey") <= 10))
    val lo = c.filter(col("c_custkey") > 10 && col("c_custkey") <= 20)
    val hi = c.filter(col("c_custkey") > 20 && col("c_custkey") <= 30)
    val latch = new java.util.concurrent.CountDownLatch(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fs = Seq(lo, hi).map { df =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = {
            latch.countDown()
            latch.await() // maximize commit-race likelihood
            DeltaLite.appendWithRetry(spark, t, df)
          }
        })
      }
      val versions = fs.map(_.get()).sorted
      assert(versions == Seq(1L, 2L)) // both landed, distinct versions
    } finally pool.shutdown()
    val got = DeltaLite.snapshot(spark, t)
      .orderBy(col("c_custkey")).collect().toSeq
    val want = c.filter(col("c_custkey") <= 30)
      .orderBy(col("c_custkey")).collect().toSeq
    assert(got == want)
  }

  test("appendEvolved widens the schema; drops and retypes are rejected") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    DeltaLite.create(spark, t,
      c.filter(col("c_custkey") <= 20).select(col("c_custkey"), col("c_name")))
    DeltaLite.appendEvolved(spark, t,
      c.filter(col("c_custkey") > 20 && col("c_custkey") <= 40)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal")))
    val snap = DeltaLite.snapshot(spark, t)
    assert(snap.schema.fieldNames.toSeq ==
      Seq("c_custkey", "c_name", "c_acctbal"))
    // Pre-evolution rows surface NULL for the added column.
    assert(snap.filter(col("c_custkey") <= 20 && col("c_acctbal").isNull)
      .count() == c.filter(col("c_custkey") <= 20).count())
    intercept[IllegalArgumentException] { // drop
      DeltaLite.appendEvolved(spark, t,
        c.limit(1).select(col("c_custkey"), col("c_name")))
    }
    intercept[IllegalArgumentException] { // retype
      DeltaLite.appendEvolved(spark, t,
        c.limit(1).select(col("c_custkey"), col("c_name"),
          col("c_acctbal").cast("string").as("c_acctbal")))
    }
  }

  test("log checkpoint: replay works from the checkpoint alone after " +
      "pre-checkpoint commits age out; later commits replay on top") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    DeltaLite.create(spark, t, c.filter(col("c_custkey") <= 10))
    (1 to 4).foreach { i =>
      DeltaLite.append(spark, t,
        c.filter(col("c_custkey") > i * 10 && col("c_custkey") <= (i + 1) * 10))
    }
    DeltaLite.deleteWhere(spark, t, col("c_custkey") === 7)
    val ckptV = DeltaLite.writeLogCheckpoint(spark, t)
    assert(ckptV == 5L)
    // Age out every JSON commit at or before the checkpoint — the
    // protocol's log-retention move. Replay must not need them.
    (0L to ckptV).foreach { v =>
      java.nio.file.Files.delete(java.nio.file.Paths.get(
        t, "_delta_log", f"$v%020d.json"))
    }
    DeltaLite.append(spark, t,
      c.filter(col("c_custkey") > 50 && col("c_custkey") <= 60))
    val got = DeltaLite.snapshot(spark, t)
      .orderBy(col("c_custkey")).collect().toSeq
    val want = c.filter(col("c_custkey") <= 60 && col("c_custkey") =!= 7)
      .orderBy(col("c_custkey")).collect().toSeq
    assert(got == want)
    // Stats survived the checkpoint round trip: pruning still works.
    assert(DeltaLite.pruneInfo(spark, t,
      col("c_custkey") === -1)._1 == 0)
  }

  test("commit creation is exclusive — a version conflict fails clean") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir).limit(5)
    DeltaLite.create(spark, t, c)
    intercept[Exception] {
      DeltaLite.create(spark, t, c) // version 0 already exists
    }
  }
}
