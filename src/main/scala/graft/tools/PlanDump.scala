package graft.tools

import graft.{GraftSession, Registry, Sql}

/** Dump a registered key's executed plan (AQE off) for shape audits. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = GraftSession.builder("local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    Sql.open(spark, sfDir)
    args(1).split(",").foreach { n =>
      println(s"==== $n ====")
      println(Registry.byName(n).fn(spark, sfDir)
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
