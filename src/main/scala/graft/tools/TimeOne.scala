package graft.tools
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[32]", shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = graft.Registry.byName(name).fn
      (1 to 4).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
