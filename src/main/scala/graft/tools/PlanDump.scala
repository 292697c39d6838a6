package graft.tools

import graft.{GraftSession, Registry}

/** Dump the physical plan of the named queries — the source of the
  * explain snippets in docs/PLANS.md (`runMain graft.tools.PlanDump
  * <sfDir> <q1,q2,...>`).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = GraftSession.builder("local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"=== $n")
      println(Registry.byName(n).fn(spark, sfDir)
        .queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
