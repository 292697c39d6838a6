package graft.tools

import org.apache.spark.sql.functions._

/** Repeat-stability harness: runs each named query TWICE in one
  * session and diffs the collected results — catches state-dependent
  * operators (memoized setups, tables mutated per call) whose second
  * invocation would hash differently than the first. Exits non-zero on
  * any instability.
  */
object RepeatCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[16]",
      shufflePartitions = 16).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty && !args.head.contains("_")) args.head
      else "/root/testdata/sf0.01"
    val names = args.filter(_.contains("_"))
    var bad = 0
    names.foreach { n =>
      val fn = graft.Registry.byName(n).fn
      def snap(): Seq[String] = {
        val df = fn(spark, sf)
        df.select(df.columns.sorted.map(col).toSeq: _*)
          .collect().map(_.toString).sorted.toSeq
      }
      val (a, b) = (snap(), snap())
      if (a == b) println(s"STABLE $n (${a.size} rows)")
      else {
        bad += 1
        val diff = a.diff(b) ++ b.diff(a)
        println(s"UNSTABLE $n: ${a.size} vs ${b.size} rows; " +
          s"first diff: ${diff.headOption.getOrElse("")}")
      }
    }
    spark.stop()
    if (bad > 0) sys.exit(1)
  }
}
