package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Per-key execution profile: wall seconds split into plan-construction
  * vs execution, plus Spark job/stage/task counts and summed task time.
  * Separates "driver overhead / too many tiny jobs" keys from genuinely
  * compute-bound ones (guide §1: decide WHERE the time goes before
  * changing anything).
  *
  * Usage: runMain graft.tools.JobProfile <sfDir> <cpus> key1 key2 ...
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.GraftSession
      .builder(s"local[$cpus]", shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    val verbose = sys.env.get("GRAFT_PROFILE_JOBS").contains("1")
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          val cs = Option(j.properties)
            .map(_.getProperty("callSite.short", "?")).getOrElse("?")
          println(s"JOB ${j.jobId} stages=${j.stageInfos.size} " +
            s"tasks=${j.stageInfos.map(_.numTasks).sum} site=$cs")
        }
        ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { n =>
      val fn = graft.Registry.byName(n).fn
      fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warmup
      (1 to 2).foreach { i =>
        jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0L)
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tPlan = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t1 = System.nanoTime()
        Thread.sleep(150) // let listener events drain before reading counters
        println(f"PROFILE $n run$i wall=${(t1 - t0) / 1e9}%.3f " +
          f"build=${(tPlan - t0) / 1e9}%.3f " +
          f"exec=${(t1 - tPlan) / 1e9}%.3f jobs=${jobs.get} " +
          f"stages=${stages.get} tasks=${tasks.get} " +
          f"taskTime=${taskNanos.get / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
