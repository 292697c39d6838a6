package graft.tools

import org.apache.spark.sql.functions._

/** What does a tiny query cost in this session config? Separates the
  * harness's fixed per-query overhead (planning, codegen, AQE stage
  * scheduling) from anything operator-specific. Guide §1.
  */
object FixedCostProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = graft.Tables.customer(spark, d)
    def t(tag: String)(f: => Any): Unit = {
      (1 to 4).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.zipWithIndex.foreach { case (sec, i) =>
        println(f"FIXED $tag%-28s run${i + 1} $sec%.3f")
      }
    }
    t("range.count")(spark.range(1000).count())
    t("range.groupBy.head") {
      spark.range(1000).groupBy(pmod(col("id"), lit(10))).count().head()
    }
    t("cust.scan.count")(c.count())
    t("cust.agg.head")(c.agg(min("c_custkey"), max("c_custkey")).head())
    t("cust.groupBy.agg.head") {
      c.groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head()
    }
    t("cust.noop")(c.write.format("noop").mode("overwrite").save())
    t("cust.write.parquet") {
      c.write.mode("overwrite")
        .parquet(graft.util.Scratch.dir("fcp") + "/out")
    }
    // planning vs execution split for the merge-internal agg shape
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      val df = c.groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
        .agg(max(col("n")))
      df.queryExecution.executedPlan
      val t1 = System.nanoTime()
      df.head()
      val t2 = System.nanoTime()
      println(f"FIXED split.groupBy.agg          run$i plan=${(t1 - t0) / 1e9}%.3f exec=${(t2 - t1) / 1e9}%.3f")
    }
    // task-dispatch cost: same work, 1 vs 32 partitions
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      spark.range(0, 1000, 1, 1).count()
      val t1 = System.nanoTime()
      spark.range(0, 1000, 1, 32).count()
      val t2 = System.nanoTime()
      println(f"FIXED range.1p.vs.32p            run$i p1=${(t1 - t0) / 1e9}%.3f p32=${(t2 - t1) / 1e9}%.3f")
    }
    val aqeOff = spark.newSession()
    aqeOff.conf.set("spark.sql.adaptive.enabled", "false")
    val c2 = graft.Tables.customer(aqeOff, d)
    t("noaqe.groupBy.agg.head") {
      c2.groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
        .agg(max(col("n"))).head()
    }
    spark.stop()
  }
}
