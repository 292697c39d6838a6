package graft

import org.apache.spark.sql.functions._
import graft.sources.DeltaLite
import graft.util.Scratch

class LakeSqlSpec extends SparkSpec {

  private def freshTable(): String = s"${Scratch.dir("lakesql")}/t"

  test("parsed DELETE / UPDATE / INSERT execute against the lake table") {
    val t = freshTable()
    val c = Tables.customer(spark, sfDir)
    DeltaLite.create(spark, t, c.filter(col("c_custkey") <= 60))
    Sql.open(spark, sfDir)
    val lake = Map("t" -> t)

    LakeSql.execute(spark, lake,
      "INSERT INTO t SELECT * FROM customer WHERE c_custkey > 60")
    assert(DeltaLite.snapshot(spark, t).count() == c.count())

    LakeSql.execute(spark, lake,
      "UPDATE t SET c_acctbal = 0.0 WHERE c_custkey <= 10")
    assert(DeltaLite.snapshot(spark, t)
      .filter(col("c_custkey") <= 10 && col("c_acctbal") =!= 0.0)
      .count() == 0)

    LakeSql.execute(spark, lake, "DELETE FROM t WHERE c_custkey > 50")
    assert(DeltaLite.snapshot(spark, t).count() ==
      c.filter(col("c_custkey") <= 50).count())
  }

  test("an UPDATE with no WHERE touches every row") {
    val t = freshTable()
    DeltaLite.create(spark, t,
      Tables.customer(spark, sfDir).filter(col("c_custkey") <= 20))
    LakeSql.execute(spark, Map("t" -> t), "UPDATE t SET c_acctbal = 1.5")
    val vals = DeltaLite.snapshot(spark, t)
      .select(col("c_acctbal")).distinct().collect().map(_.getDouble(0))
    assert(vals.toSeq == Seq(1.5))
  }

  test("unknown tables and unsupported statements fail loudly") {
    val t = freshTable()
    DeltaLite.create(spark, t,
      Tables.customer(spark, sfDir).limit(5))
    intercept[IllegalArgumentException] {
      LakeSql.execute(spark, Map("t" -> t), "DELETE FROM nope WHERE 1 = 1")
    }
    intercept[IllegalArgumentException] {
      LakeSql.execute(spark, Map("t" -> t), "DROP TABLE t")
    }
  }
}
