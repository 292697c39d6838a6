package graft.tools
object ParseProbe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[1]").config("spark.ui.enabled", "false").getOrCreate()
    Seq(
      "CREATE VIEW v1 AS SELECT 1 AS x",
      "CREATE OR REPLACE VIEW v1 AS SELECT 2 AS y",
      "DROP VIEW v1",
      "DROP VIEW IF EXISTS v1"
    ).foreach { q =>
      val p = s.sessionState.sqlParser.parsePlan(q)
      println("PROBE " + q + " -> " + p.getClass.getName)
      println("PROBE   " + p.toString.linesIterator.take(4).mkString(" | "))
    }
    s.stop()
  }
}
