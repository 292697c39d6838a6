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

  test("commit creation is exclusive — a version conflict fails clean") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir).limit(5)
    DeltaLite.create(spark, t, c)
    intercept[Exception] {
      DeltaLite.create(spark, t, c) // version 0 already exists
    }
  }
}
