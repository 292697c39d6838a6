package graft.tools

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** One-off probe: job count + wall time per statement of the x39 merge
  * flow (guide §1 — find WHERE the driver time goes before changing
  * the merge path).
  */
object MergeProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.Sql.open(spark, d)
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        { jobs.incrementAndGet(); () }
    })
    val root = graft.util.Scratch.dir("probe")
    def run(tag: String, sql: String): Unit = {
      jobs.set(0)
      val t0 = System.nanoTime()
      graft.LakeSql.sql(spark, sql)
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100)
      println(f"STMT $tag%-12s wall=$w%.3f jobs=${jobs.get}")
    }
    (1 to 2).foreach { pass =>
      println(s"== pass $pass ==")
      Seq("deltalite", "iceberglite").foreach { prov =>
        val name = s"mp_${prov.take(4)}_$pass"
        run(s"create/$prov", s"""CREATE TABLE $name USING $prov
          LOCATION '$root/$name'
          AS SELECT c_custkey, c_name, c_acctbal FROM customer
          WHERE c_custkey <= 1000""")
        run(s"upsert/$prov", s"""MERGE INTO $name USING (
            SELECT c_custkey, c_name, c_acctbal + 50 AS c_acctbal
            FROM customer
            WHERE c_custkey >= 500 AND c_custkey <= 1200) AS src
          ON $name.c_custkey = src.c_custkey
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *""")
        run(s"fullsync/$prov", s"""MERGE INTO $name USING (
            SELECT c_custkey, c_name, c_acctbal FROM customer
            WHERE c_custkey >= 300 AND c_custkey <= 900) AS src
          ON $name.c_custkey = src.c_custkey
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *
          WHEN NOT MATCHED BY SOURCE AND c_custkey < 100 THEN DELETE""")
        run(s"read/$prov", s"SELECT COUNT(*) FROM $name")
        run(s"drop/$prov", s"DROP TABLE $name")
      }
    }
    spark.stop()
  }
}
