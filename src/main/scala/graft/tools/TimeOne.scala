package graft.tools
import org.apache.spark.sql.SparkSession

/** One-off re-measurement of named queries at sf0.1 — the adjudication
  * tool for bench outliers. Brackets the run with the SAME calibration
  * sentinel Bench uses (reference ≈0.40 s on this container per
  * BASELINE.md), so a TimeOne record is self-adjudicating: inflated
  * sentinels mean the host was contended and the numbers are upper
  * bounds, clean sentinels mean the numbers are real.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sentinel(): Double = (1 to 3).map(_ => graft.Bench.sentinelOnce(spark, 32)).min
    def sentinelIo(): Double =
      (1 to 3).map(_ => graft.Bench.sentinelIoOnce(spark, sfDir)).min
    graft.Bench.sentinelOnce(spark, 32) // warmup
    graft.Bench.sentinelIoOnce(spark, sfDir)
    println(f"sentinel_start ${sentinel()}%.2f s (reference ~0.40)")
    println(f"sentinel_io_start ${sentinelIo()}%.2f s")
    args.foreach { name =>
      val fn = graft.Registry.byName(name).fn
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    println(f"sentinel_end ${sentinel()}%.2f s (reference ~0.40)")
    println(f"sentinel_io_end ${sentinelIo()}%.2f s")
    spark.stop()
  }
}
