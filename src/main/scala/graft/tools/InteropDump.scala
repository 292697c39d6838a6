package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables => T}
import graft.sources.{DeltaLite, IcebergLite}

/** Build representative DeltaLite / IcebergLite tables and dump graft's
  * own snapshot read of each as plain parquet — the fixture side of the
  * real-reader interop check (`tools/interop_check.py` replays the table
  * METADATA with an independent Python implementation and diffs against
  * the dump). Exercises every protocol feature a foreign reader must
  * understand: partitioned adds, copy-on-write rewrites, deletion-vector
  * sidecars, a parquet log checkpoint + `_last_checkpoint`, post-
  * checkpoint commits; Iceberg field-id schema evolution (rename + add),
  * position-delete files, manifest rewrites.
  *
  * Usage: runMain graft.tools.InteropDump <sfDir> <outDir>
  */
object InteropDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    val spark: SparkSession =
      GraftSession.builder("local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- Delta: partitioned create → append → DV delete → COW update
    //      → checkpoint → post-checkpoint append
    val dt = s"$outDir/delta_table"
    val c = T.customer(spark, sfDir)
    DeltaLite.create(spark, dt,
      c.filter(col("c_custkey") <= 900), Seq("c_mktsegment"))
    DeltaLite.append(spark, dt,
      c.filter(col("c_custkey") > 900 && col("c_custkey") <= 1200))
    DeltaLite.deleteWhereDV(spark, dt, col("c_custkey") % 7 === 3)
    DeltaLite.updateWhere(spark, dt, col("c_nationkey") === 5,
      Map("c_acctbal" -> (col("c_acctbal") + 100)))
    DeltaLite.writeLogCheckpoint(spark, dt)
    DeltaLite.append(spark, dt, c.filter(col("c_custkey") > 1200))
    DeltaLite.snapshot(spark, dt)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/delta_expected")

    // ---- Delta shallow clone: absolute-path references into an
    //      unpartitioned source + divergent DML on the clone
    val src = s"$outDir/delta_clone_src"
    val dst = s"$outDir/delta_clone"
    DeltaLite.create(spark, src, c.filter(col("c_custkey") <= 800))
    DeltaLite.deleteWhereDV(spark, src, col("c_custkey") % 11 === 4)
    DeltaLite.cloneShallow(spark, src, dst)
    DeltaLite.deleteWhere(spark, dst, col("c_mktsegment") === "AUTOMOBILE")
    DeltaLite.snapshot(spark, dst)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/delta_clone_expected")

    // ---- Delta column mapping: rename (upgrade + relabel) → add
    //      column → evolved append → DV delete on top. A foreign
    //      reader must translate physical parquet names to logical
    //      ones from the schemaString's field metadata.
    val cm = s"$outDir/delta_cm"
    DeltaLite.create(spark, cm,
      c.filter(col("c_custkey") <= 900)
        .repartitionByRange(3, col("c_custkey")))
    DeltaLite.renameColumn(spark, cm, "c_name", "cust_name")
    DeltaLite.addColumn(spark, cm, "flag",
      org.apache.spark.sql.types.StringType)
    DeltaLite.append(spark, cm,
      c.filter(col("c_custkey") > 900 && col("c_custkey") <= 1100)
        .withColumnRenamed("c_name", "cust_name")
        .withColumn("flag", lit("late")))
    DeltaLite.deleteWhereDV(spark, cm, col("c_custkey") % 7 === 3)
    DeltaLite.snapshot(spark, cm)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/delta_cm_expected")

    // ---- Iceberg: create → rename + add column → evolved append →
    //      position-delete
    val it = s"$outDir/iceberg_table"
    val o = T.orders(spark, sfDir)
    IcebergLite.create(spark, it,
      o.filter(col("o_orderkey") <= 6000)
        .repartitionByRange(3, col("o_orderkey")))
    IcebergLite.renameColumn(spark, it, "o_orderpriority", "priority")
    IcebergLite.addColumn(spark, it, "note",
      org.apache.spark.sql.types.StringType)
    IcebergLite.append(spark, it,
      o.filter(col("o_orderkey") > 6000)
        .withColumnRenamed("o_orderpriority", "priority")
        .withColumn("note", lit("late")))
    IcebergLite.deleteWhere(spark, it, col("o_custkey") % 5 === 2)
    IcebergLite.snapshot(spark, it)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/iceberg_expected")

    // ---- Iceberg equality deletes: two key sets (a column-keyed CDC
    //      delete, then a segment-keyed one) + a position delete on
    //      top; sequence numbers scope each equality delete to the
    //      data files written before it — a foreign reader must apply
    //      all three kinds together.
    val eq = s"$outDir/iceberg_eqdel"
    IcebergLite.create(spark, eq,
      c.filter(col("c_custkey") <= 800)
        .repartitionByRange(3, col("c_custkey")))
    IcebergLite.equalityDelete(spark, eq, Seq("c_custkey"),
      c.filter(col("c_custkey") <= 800 && col("c_acctbal") < 0)
        .select(col("c_custkey")))
    IcebergLite.append(spark, eq,
      c.filter(col("c_custkey") > 800 && col("c_custkey") <= 1000))
    IcebergLite.equalityDelete(spark, eq, Seq("c_mktsegment"), {
      import spark.implicits._
      Seq("MACHINERY").toDF("c_mktsegment")
    })
    IcebergLite.deleteWhere(spark, eq, col("c_custkey") % 13 === 6)
    IcebergLite.snapshot(spark, eq)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/iceberg_eqdel_expected")

    // ---- Iceberg partition-spec evolution + sort order: files live
    //      under TWO layouts (loose pre-evolution files; sorted
    //      data/o_orderstatus=X/ files after), and a foreign reader
    //      must inject partition values from the manifest entries for
    //      the evolved-spec files.
    val ev = s"$outDir/iceberg_evolved"
    val oe = o.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"))
    IcebergLite.create(spark, ev,
      oe.filter(col("o_orderkey") <= 5000)
        .repartitionByRange(2, col("o_orderkey")))
    IcebergLite.evolvePartitionSpec(spark, ev, Seq("o_orderstatus"))
    IcebergLite.setSortOrder(spark, ev, Seq("o_orderkey"))
    IcebergLite.append(spark, ev,
      oe.filter(col("o_orderkey") > 5000 && col("o_orderkey") <= 9000))
    IcebergLite.snapshot(spark, ev)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/iceberg_evolved_expected")

    // ---- Format conversion, both directions (LakeConvert): the
    //      converted table's metadata references FOREIGN files by
    //      absolute path — an Iceberg manifest over id-less
    //      Delta-written parquet (name resolution), and a Delta log
    //      over field-id-stamped Iceberg-written parquet.
    val cds = s"$outDir/conv_delta_src"
    DeltaLite.create(spark, cds,
      o.filter(col("o_orderkey") <= 4000)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartitionByRange(3, col("o_orderkey")))
    DeltaLite.deleteWhere(spark, cds, col("o_custkey") % 9 === 1)
    graft.sources.LakeConvert.deltaToIceberg(spark, cds,
      s"$outDir/conv_iceberg")
    IcebergLite.snapshot(spark, s"$outDir/conv_iceberg")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/conv_iceberg_expected")

    val cis = s"$outDir/conv_ice_src"
    IcebergLite.create(spark, cis,
      c.filter(col("c_custkey") <= 600)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .repartitionByRange(3, col("c_custkey")))
    IcebergLite.append(spark, cis,
      c.filter(col("c_custkey") > 600 && col("c_custkey") <= 900)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal")))
    graft.sources.LakeConvert.icebergToDelta(spark, cis,
      s"$outDir/conv_delta")
    DeltaLite.snapshot(spark, s"$outDir/conv_delta")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/conv_delta_expected")

    // ---- Iceberg refs: a tag pinning snapshot 1 and a branch two
    //      appends ahead of main — a foreign reader must resolve the
    //      metadata `refs` map to read either, while the plain read
    //      stays on current-snapshot-id.
    val rf = s"$outDir/iceberg_refs"
    val or2 = o.select(col("o_orderkey"), col("o_custkey"),
      col("o_totalprice"))
    IcebergLite.create(spark, rf, or2.filter(col("o_orderkey") <= 3000))
    IcebergLite.createTag(spark, rf, "v1")
    IcebergLite.createBranch(spark, rf, "dev")
    IcebergLite.appendToBranch(spark, rf, "dev",
      or2.filter(col("o_orderkey") > 3000 && col("o_orderkey") <= 6000))
    IcebergLite.appendToBranch(spark, rf, "dev",
      or2.filter(col("o_orderkey") > 6000 && col("o_orderkey") <= 9000))
    IcebergLite.snapshot(spark, rf)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/iceberg_refs_main_expected")
    IcebergLite.snapshotByRef(spark, rf, "dev")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/iceberg_refs_dev_expected")

    // ---- Delta generated columns: o_month = month(o_orderdate) as a
    //      partition column, second append written WITHOUT the column
    //      (writer-computed). A foreign reader reconstructs o_month
    //      purely from add-action partitionValues under the
    //      schemaString type — and can SEE the generation rule in the
    //      field's metadata.
    val dg = s"$outDir/delta_gen"
    DeltaLite.createWithGenerated(spark, dg,
      o.filter(col("o_orderkey") <= 5000)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice")),
      generated = Seq("o_month" -> "month(o_orderdate)"),
      partitionColumns = Seq("o_month"))
    DeltaLite.append(spark, dg,
      o.filter(col("o_orderkey") > 5000 && col("o_orderkey") <= 9000)
        .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice")))
    DeltaLite.snapshot(spark, dg)
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/delta_gen_expected")

    spark.stop()
  }
}
