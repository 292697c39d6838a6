package graft.tools
object RunOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.001")
    args.foreach { name =>
      val df = graft.Registry.byName(name).fn(spark, dir)
      df.show(20, false)
      println(s"$name rows=${df.count()}")
    }
    spark.stop()
  }
}
