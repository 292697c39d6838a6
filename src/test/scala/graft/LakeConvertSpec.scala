package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{DeltaLite, IcebergLite, LakeConvert}

/** Format-conversion invariants: zero data copy, stats survival, and
  * the loud rejections that protect conversion's lossless contract.
  */
class LakeConvertSpec extends SparkSpec {

  private def freshDir = Files.createTempDirectory("graft_convert").toString

  test("delta→iceberg is zero-copy and carries stats for pruning") {
    val base = freshDir
    val src = s"$base/d"
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"))
    DeltaLite.create(spark, src,
      o.repartitionByRange(4, col("o_orderkey")))
    val ice = s"$base/i"
    LakeConvert.deltaToIceberg(spark, src, ice)

    // Zero-copy: the Iceberg table's data files ARE the Delta live set.
    val srcFiles = DeltaLite.dataFiles(spark, src)
    assert(IcebergLite.dataFiles(spark, ice).sorted == srcFiles)
    assert(srcFiles.size >= 4)

    // Content identical.
    assert(IcebergLite.snapshot(spark, ice)
      .exceptAll(DeltaLite.snapshot(spark, src)).isEmpty)

    // Stats carried: a selective key predicate skips files on the
    // CONVERTED table without having rewritten anything.
    val (kept, total) = IcebergLite.pruneInfo(spark, ice,
      col("o_orderkey") <= 10)
    assert(total == srcFiles.size && kept < total,
      s"expected pruning on converted table, got $kept/$total")
  }

  test("iceberg→delta round trip references the same files") {
    val base = freshDir
    val src = s"$base/d"
    DeltaLite.create(spark, src,
      Tables.nation(spark, sfDir).select(col("n_nationkey"), col("n_name")))
    val ice = s"$base/i"
    LakeConvert.deltaToIceberg(spark, src, ice)
    val back = s"$base/b"
    LakeConvert.icebergToDelta(spark, ice, back)
    assert(DeltaLite.dataFiles(spark, back) ==
      DeltaLite.dataFiles(spark, src))
    assert(DeltaLite.snapshot(spark, back)
      .exceptAll(DeltaLite.snapshot(spark, src)).isEmpty)
  }

  test("converted tables diverge independently of the source") {
    val base = freshDir
    val src = s"$base/d"
    DeltaLite.create(spark, src,
      Tables.nation(spark, sfDir).select(col("n_nationkey"), col("n_name")))
    val ice = s"$base/i"
    LakeConvert.deltaToIceberg(spark, src, ice)
    // DML on the converted table must not disturb the source.
    IcebergLite.deleteWhere(spark, ice, col("n_nationkey") === 0)
    assert(IcebergLite.snapshot(spark, ice).count() ==
      DeltaLite.snapshot(spark, src).count() - 1)
    assert(DeltaLite.snapshot(spark, src)
      .filter(col("n_nationkey") === 0).count() == 1)
  }

  test("deletion-vector tables are rejected until compacted") {
    val base = freshDir
    val src = s"$base/d"
    DeltaLite.create(spark, src,
      Tables.nation(spark, sfDir).select(col("n_nationkey"), col("n_name")))
    DeltaLite.deleteWhereDV(spark, src, col("n_nationkey") === 1)
    val e = intercept[IllegalArgumentException] {
      LakeConvert.deltaToIceberg(spark, src, s"$base/i")
    }
    assert(e.getMessage.contains("deletion vectors"))
    // compact folds the DV in; conversion then succeeds.
    DeltaLite.compact(spark, src, targetFiles = 1)
    LakeConvert.deltaToIceberg(spark, src, s"$base/i2")
    assert(IcebergLite.snapshot(spark, s"$base/i2")
      .filter(col("n_nationkey") === 1).count() == 0)
  }

  test("partitioned sources are rejected") {
    val base = freshDir
    val src = s"$base/d"
    DeltaLite.create(spark, src,
      Tables.nation(spark, sfDir)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey")),
      partitionColumns = Seq("n_regionkey"))
    val e = intercept[IllegalArgumentException] {
      LakeConvert.deltaToIceberg(spark, src, s"$base/i")
    }
    assert(e.getMessage.contains("unpartitioned"))
  }

  test("iceberg tables with position deletes are rejected") {
    val base = freshDir
    val src = s"$base/i"
    IcebergLite.create(spark, src,
      Tables.nation(spark, sfDir).select(col("n_nationkey"), col("n_name")))
    IcebergLite.deleteWhere(spark, src, col("n_nationkey") === 2)
    val e = intercept[IllegalArgumentException] {
      LakeConvert.icebergToDelta(spark, src, s"$base/d")
    }
    assert(e.getMessage.contains("position deletes"))
  }
}
