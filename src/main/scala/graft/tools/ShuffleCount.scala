package graft.tools

import graft.{GraftSession, Registry}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

object ShuffleCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = GraftSession.builder("local[8]", shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    names.foreach { n =>
      val df = Registry.byName(n).fn(spark, sfDir)
      val c = df.queryExecution.executedPlan.collectWithSubqueries {
        case e: ShuffleExchangeLike => e
      }.size
      println(s"SHUFFLES $n $c")
    }
    spark.stop()
  }
}
