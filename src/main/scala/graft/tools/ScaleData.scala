package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale the driver's sf0.1 testdata 10× to an sf1 dataset for
  * scaling-evidence runs (the round-9 verdict's ask: measure, don't
  * structure-audit). Replication preserves every join relationship by
  * offsetting each copy's keys consistently — copy i shifts
  * c_custkey/o_custkey by i·|customer|, o_orderkey/l_orderkey by
  * i·|orders|, and so on — so selectivities, group cardinalities per
  * key, fan-outs and value distributions match the driver's generator
  * at 10× the rows. Dimension tables (region/nation) stay fixed, like
  * TPC-H itself. Output is plain parquet, same file-per-table layout.
  *
  * Usage: runMain graft.tools.ScaleData <srcDir> <dstDir> [copies]
  */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val dst = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = graft.GraftSession
      .builder("local[16]", shufflePartitions = 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame =
      graft.Tables(spark, src, t)

    val nCust = read("customer").count()
    val nSupp = read("supplier").count()
    val nPart = read("part").count()
    val nOrd = read("orders").count()
    val nEvt = read("events").count()
    val nDoc = read("documents").count()
    val nVec = read("embeddings").count()
    val nUser = read("events").agg(max("user_id")).head.getLong(0) + 1

    /** Union `copies` shifted copies: each (column → stride) key gets
      * + i·stride in copy i.
      */
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame =
      (0 until copies).map { i =>
        shifts.foldLeft(df) { case (d, (c, stride)) =>
          d.withColumn(c, col(c) + lit(i * stride))
        }
      }.reduce(_ unionByName _)

    def write(df: DataFrame, t: String): Unit = {
      // keep files ~50-100 MB at any copy count (sf10 = 100 copies
      // would otherwise funnel through 4 writer tasks)
      df.coalesce(math.max(4, copies / 5))
        .write.mode("overwrite").parquet(s"$dst/__tmp_$t")
      // single-file layout like the driver's (name.parquet = one file
      // is NOT required by Tables — a directory reads fine — but keep
      // the per-table path contract)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sessionState.newHadoopConf())
      val tmp = new org.apache.hadoop.fs.Path(s"$dst/__tmp_$t")
      val tgt = new org.apache.hadoop.fs.Path(s"$dst/$t.parquet")
      if (fs.exists(tgt)) fs.delete(tgt, true)
      fs.rename(tmp, tgt)
      println(s"$t: ${spark.read.parquet(tgt.toString).count()} rows")
    }

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(replicate(read("customer"), Map("c_custkey" -> nCust)),
      "customer")
    write(replicate(read("supplier"), Map("s_suppkey" -> nSupp)),
      "supplier")
    write(replicate(read("part"), Map("p_partkey" -> nPart)), "part")
    write(replicate(read("orders"),
      Map("o_orderkey" -> nOrd, "o_custkey" -> nCust)), "orders")
    write(replicate(read("lineitem"),
      Map("l_orderkey" -> nOrd, "l_partkey" -> nPart,
        "l_suppkey" -> nSupp)), "lineitem")
    write(replicate(read("events"),
      Map("event_id" -> nEvt, "user_id" -> nUser)), "events")
    write(replicate(read("documents"), Map("doc_id" -> nDoc)),
      "documents")
    write(replicate(read("embeddings"), Map("vec_id" -> nVec)),
      "embeddings")
    spark.stop()
  }
}
