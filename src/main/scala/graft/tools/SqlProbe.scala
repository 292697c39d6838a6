package graft.tools

/** Ad-hoc dialect probe: runs each argument through LakeSql.sql over
  * the SF_DIR views and prints the result — the Spark half of the
  * dual-engine pinning loop (the DuckDB half is python3 driver-side).
  */
object SqlProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession
      .builder("local[8]", shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SF_DIR", "/root/testdata/sf0.001")
    graft.Sql.open(spark, dir)
    // @/path args read one statement per non-empty line from the file
    // (sbt's runMain arg lexer rejects backslashes)
    val texts = args.toSeq.flatMap { a =>
      if (a.startsWith("@"))
        scala.io.Source.fromFile(a.drop(1), "UTF-8").getLines()
          .map(_.trim).filter(_.nonEmpty).toSeq
      else Seq(a)
    }
    texts.foreach { text =>
      println(s"-- $text")
      try graft.LakeSql.sql(spark, text).show(50, false)
      catch { case e: Exception =>
        println(s"REFUSED/${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
