package graft.tools

/** Subset bench for scaling probes (r17 judge item 1: the sf10 decade).
  *
  * Bench sweeps the whole registry; a scaling probe wants the ~25
  * heaviest scan/dedup/ANN/text keys at a big SF with the same
  * methodology (warmup pass, min-of-3 noop-write timing, CPU+IO
  * sentinel bracket) and a committed JSON artifact. Keys come from
  * argv; SF dir from SPARK_GRAFT_SF_DIR; output path from
  * SPARK_GRAFT_BENCH_FULL (same contract as Bench).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_BENCH_FULL=docs/BENCH_SF10.json \
  *          runMain graft.tools.BenchKeys q01_pricing_summary d02_minhash_lsh …
  */
object BenchKeys {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query keys as args")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try graft.Registry.byName(name).fn(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[benchkeys] $name failed: ${e.getMessage}")
        return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }
    def sentinel(): Double =
      (1 to 3).map(_ => graft.Bench.sentinelOnce(spark, cpus)).min
    def sentinelIo(): Double =
      (1 to 3).map(_ => graft.Bench.sentinelIoOnce(spark, sfDir)).min

    graft.Bench.sentinelOnce(spark, cpus) // warmup
    graft.Bench.sentinelIoOnce(spark, sfDir)
    val s0 = sentinel(); val io0 = sentinelIo()
    args.foreach(runOnce) // warmup pass: JIT/codegen/footers land here
    val results = args.map { n => n -> (1 to 3).map(_ => runOnce(n)).min }
    val s1 = sentinel(); val io1 = sentinelIo()

    val total = results.map(_._2).filter(_ >= 0).sum
    def f3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val line =
      s"""{"metric":"subset_total","value":${f3(total)},"unit":"sec","sentinel":${f3(s0)},"sentinel_end":${f3(s1)},"sentinel_io":${f3(io0)},"sentinel_io_end":${f3(io1)},"queries":$qs,"sf":"$sfDir"}"""
    println(s"BENCH_KEYS $line")
    sys.env.get("SPARK_GRAFT_BENCH_FULL").foreach { p =>
      java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    }
    spark.stop()
  }
}
