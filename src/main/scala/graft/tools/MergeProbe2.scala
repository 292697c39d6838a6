package graft.tools

import org.apache.spark.sql.functions._

/** Phase-level timing of the DeltaLite keyed-merge shape (replicated
  * inline): replay, hit-detection agg, rewrite write. Guide §1.
  */
object MergeProbe2 {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = graft.Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $tag%-14s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    (1 to 3).foreach { pass =>
      println(s"== pass $pass ==")
      val root = graft.util.Scratch.dir("probe2")
      val tbl = s"$root/t"
      t("create") {
        graft.sources.DeltaLite.create(spark, tbl,
          c.filter(col("c_custkey") <= 1000))
      }
      val src = c.filter(col("c_custkey") >= 500 && col("c_custkey") <= 1200)
        .withColumn("c_acctbal", col("c_acctbal") + 50)
      t("merge-total") {
        graft.sources.DeltaLite.merge(spark, tbl, src, Seq("c_custkey"))
      }
      // phase replication
      val src2 = src.withColumn("c_acctbal", col("c_acctbal") + 1)
      val snap = t("snapshot-df") {
        graft.sources.DeltaLite.snapshot(spark, tbl)
      }
      val hit = t("hit-agg") {
        val skc = src2.groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
        snap.join(skc, Seq("c_custkey"))
          .agg(count(lit(1)), max(col("n"))).head()
      }
      println(s"  hit=$hit")
      t("write-noop") {
        snap.join(src2.select(col("c_custkey")).distinct(),
            Seq("c_custkey"), "left_anti")
          .unionByName(src2)
          .write.format("noop").mode("overwrite").save()
      }
      t("write-parquet") {
        snap.join(src2.select(col("c_custkey")).distinct(),
            Seq("c_custkey"), "left_anti")
          .unionByName(src2)
          .write.mode("overwrite").parquet(s"$root/out$pass")
      }
    }
    spark.stop()
  }
}
