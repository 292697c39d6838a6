package graft

import org.apache.spark.sql.functions._
import graft.sources.IcebergLite
import graft.util.Scratch

class IcebergLiteSpec extends SparkSpec {

  private def freshTable(): String = s"${Scratch.dir("icespec")}/t"

  test("create/append/snapshot round-trips; time travel reads any " +
      "retained snapshot") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    val s1 = IcebergLite.create(spark, t, c.filter(col("c_custkey") <= 40))
    val s2 = IcebergLite.append(spark, t, c.filter(col("c_custkey") > 40))
    assert(IcebergLite.snapshots(spark, t) == Seq(s1, s2))
    assert(IcebergLite.snapshot(spark, t)
      .orderBy(col("c_custkey")).collect().toSeq ==
      c.orderBy(col("c_custkey")).collect().toSeq)
    // Snapshot 1 is still reachable from the current metadata file.
    assert(IcebergLite.snapshot(spark, t, s1).count() ==
      c.filter(col("c_custkey") <= 40).count())
  }

  test("an append's manifest list reuses the previous snapshot's " +
      "manifest files — commit metadata is O(new data)") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    IcebergLite.create(spark, t, c.filter(col("c_custkey") <= 40))
    def manifestsOf(snap: String): Set[String] = {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(t, "metadata", snap)), "UTF-8")
      "metadata/manifest-[0-9a-f-]+\\.json".r.findAllIn(txt).toSet
    }
    IcebergLite.append(spark, t, c.filter(col("c_custkey") > 40))
    val m1 = manifestsOf("snap-1.json")
    val m2 = manifestsOf("snap-2.json")
    assert(m1.size == 1 && m2.size == 2 && m1.subsetOf(m2),
      s"append must reuse the prior manifest: $m1 vs $m2")
  }

  test("manifest stats prune non-overlapping data files; scan stays " +
      "exact; reads never list the data directory") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    IcebergLite.create(spark, t, c.repartitionByRange(4, col("c_custkey")))
    val pred = col("c_custkey") >= 10 && col("c_custkey") <= 20
    val (kept, total) = IcebergLite.pruneInfo(spark, t, pred)
    assert(total == 4 && kept < total, s"kept=$kept total=$total")
    assert(IcebergLite.scan(spark, t, pred)
      .orderBy(col("c_custkey")).collect().toSeq ==
      c.filter(pred).orderBy(col("c_custkey")).collect().toSeq)
    // An orphan parquet in data/ (e.g. a failed writer's leftover) is
    // invisible: the manifest tree, not a listing, names the files.
    val orphanSrc = java.nio.file.Files.walk(
        java.nio.file.Paths.get(t, "data"))
      .filter(_.toString.endsWith(".parquet")).findFirst().get()
    java.nio.file.Files.copy(orphanSrc,
      java.nio.file.Paths.get(t, "data", "orphan-not-committed.parquet"))
    assert(IcebergLite.snapshot(spark, t).count() == c.count())
  }

  test("partitioned table: hierarchical pruning skips whole manifests " +
      "from their partition summaries, then entries, and stays exact") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    val segs = c.select(col("c_mktsegment")).distinct().collect()
      .map(_.getString(0)).sorted
    assert(segs.length >= 3)
    // One manifest per segment: create the first, append the rest.
    IcebergLite.create(spark, t,
      c.filter(col("c_mktsegment") === segs.head),
      partitionColumns = Seq("c_mktsegment"))
    segs.tail.foreach(seg =>
      IcebergLite.append(spark, t, c.filter(col("c_mktsegment") === seg)))
    // Level-1 pruning: a one-segment predicate keeps exactly ONE
    // manifest out of |segs| — the others are skipped from their
    // summaries without touching their entries.
    val (keptM, totalM) = IcebergLite.manifestPruneInfo(spark, t,
      col("c_mktsegment") === segs.head)
    assert(totalM == segs.length && keptM == 1, s"$keptM of $totalM")
    // Level-2: entry stats still prune within the surviving manifest.
    val (keptF, totalF) = IcebergLite.pruneInfo(spark, t,
      col("c_mktsegment") === segs.head && col("c_custkey") < -1)
    assert(keptF == 0 && totalF > 0)
    // Exactness + partition-column round trip via the dir layout.
    val want = c.filter(col("c_mktsegment") === segs.head)
      .orderBy(col("c_custkey")).collect().toSeq
    assert(IcebergLite.scan(spark, t, col("c_mktsegment") === segs.head)
      .orderBy(col("c_custkey")).collect().toSeq == want)
    assert(IcebergLite.snapshot(spark, t).count() == c.count())
  }

  test("version conflict on the metadata file fails clean") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir).limit(5)
    IcebergLite.create(spark, t, c)
    intercept[Exception] {
      IcebergLite.create(spark, t, c)
    }
  }

  test("position-delete files: merge-on-read delete rewrites NO data " +
      "file, stacked deletes compose, pre-delete snapshots still full") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    val s1 = IcebergLite.create(spark, t,
      c.repartitionByRange(4, col("c_custkey")))
    val filesBefore = IcebergLite.dataFiles(spark, t)
    val p1 = col("c_mktsegment") === "BUILDING"
    IcebergLite.deleteWhere(spark, t, p1)
    // Merge-on-read: the data-file set is byte-identical; only delete
    // files + one deletes manifest were added.
    assert(IcebergLite.dataFiles(spark, t) == filesBefore)
    assert(IcebergLite.deleteFiles(spark, t).nonEmpty)
    val want1 = c.filter(!p1)
    assert(IcebergLite.snapshot(spark, t).orderBy(col("c_custkey"))
      .collect().toSeq ==
      want1.orderBy(col("c_custkey")).collect().toSeq)
    // Second delete stacks (and must not re-record already-dead rows).
    val p2 = col("c_custkey") % 7 === 0
    IcebergLite.deleteWhere(spark, t, p2)
    assert(IcebergLite.dataFiles(spark, t) == filesBefore)
    assert(IcebergLite.snapshot(spark, t).count() ==
      c.filter(!p1 && !(p2)).count())
    // Scan path merges deletes too, and still prunes by stats.
    val pred = col("c_custkey") >= 10 && col("c_custkey") <= 60
    assert(IcebergLite.scan(spark, t, pred)
      .orderBy(col("c_custkey")).collect().toSeq ==
      c.filter(pred && !p1 && !p2)
        .orderBy(col("c_custkey")).collect().toSeq)
    // Time travel to the pre-delete snapshot sees every row.
    assert(IcebergLite.snapshot(spark, t, s1).count() == c.count())
    // A delete matching nothing is a no-op commit-wise.
    val before = IcebergLite.snapshots(spark, t).size
    IcebergLite.deleteWhere(spark, t, col("c_custkey") < -1)
    assert(IcebergLite.snapshots(spark, t).size == before)
  }
}
