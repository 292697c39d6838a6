package graft

import org.apache.spark.sql.functions._
import graft.functions.{Kmv, TextHash}

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def hashed(n: Int) =
    (1 to n).map(i => s"v$i").toDF("v")
      .select(pmod(lit(506952114L) * TextHash.charPoly31(col("v"))
        + lit(40503L), lit(TextHash.P)).as("h"))

  test("KMV sketch is partitioning-invariant (merge ≡ single pass) " +
      "and holds the k smallest distinct hashes ascending") {
    val df = hashed(5000)
    val one = df.coalesce(1).agg(Kmv.sketch(col("h"), 64)).head.getSeq[Long](0)
    val many = df.repartition(13).agg(Kmv.sketch(col("h"), 64))
      .head.getSeq[Long](0)
    assert(one == many, "merge must equal the single-partition pass")
    assert(one.length == 64 && one == one.sorted && one.distinct == one)
    val exactMin = df.distinct().orderBy(col("h")).limit(64)
      .collect().map(_.getLong(0)).toSeq
    assert(one == exactMin)
  }

  test("estimate: exact when unsaturated, within 3·k^-1/2 relative " +
      "error when saturated; duplicates don't inflate it") {
    // Unsaturated: fewer distinct values than k → the count itself.
    val small = hashed(40).agg(Kmv.sketch(col("h"), 64).as("sk"))
      .select(Kmv.estimate(col("sk"), 64)).head.getLong(0)
    assert(small == 40L)
    // Saturated: n = 5000 distinct, k = 256 → σ ≈ n/√k ≈ 6.25%.
    val est = hashed(5000).agg(Kmv.sketch(col("h"), 256).as("sk"))
      .select(Kmv.estimate(col("sk"), 256)).head.getLong(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 3.0 / math.sqrt(256.0),
      s"estimate $est too far from 5000")
    // Each value duplicated 7× → identical sketch, identical estimate.
    val dup = hashed(5000)
    val dupEst = (1 to 7).map(_ => dup).reduce(_ union _)
      .agg(Kmv.sketch(col("h"), 256).as("sk"))
      .select(Kmv.estimate(col("sk"), 256)).head.getLong(0)
    assert(dupEst == est)
  }

  test("KmvPairs is a deterministic partitioning-invariant row " +
      "sample; sampled median tracks the true median") {
    val n = 20000
    val rows = (1 to n).map(i => (s"k$i", i.toLong)).toDF("key", "v")
      .select(pmod(lit(506952114L) * TextHash.charPoly31(col("key"))
        + lit(40503L), lit(TextHash.P)).as("h"), col("v"))
    val one = rows.coalesce(1)
      .agg(Kmv.pairSample(col("h"), col("v"), 512)).head.getSeq[Long](0)
    val many = rows.repartition(17)
      .agg(Kmv.pairSample(col("h"), col("v"), 512)).head.getSeq[Long](0)
    assert(one == many, "pair sample must be partitioning-invariant")
    assert(one.length == 512)
    // Values 1..n uniform → the sample median should sit near n/2
    // within ~3·n/√k.
    val med = one.sorted.apply(255)
    assert(math.abs(med - n / 2.0) < 3.0 * n / math.sqrt(512.0),
      s"sample median $med too far from ${n / 2}")
  }

  test("intersectEstimate tracks the true overlap; SQL entry exposes " +
      "graft_kmv") {
    val a = hashed(3000) // v1..v3000
    val b = (2001 to 6000).map(i => s"v$i").toDF("v")
      .select(pmod(lit(506952114L) * TextHash.charPoly31(col("v"))
        + lit(40503L), lit(TextHash.P)).as("h"))
    val skA = a.agg(Kmv.sketch(col("h"), 256).as("a"))
    val skB = b.agg(Kmv.sketch(col("h"), 256).as("b"))
    val est = skA.crossJoin(skB)
      .select(Kmv.intersectEstimate(col("a"), col("b"), 256))
      .head.getLong(0)
    // True overlap v2001..v3000 = 1000 of |A∪B| = 6000; KMV set-op
    // error is driven by the union sketch — allow a generous band.
    assert(est > 500 && est < 1500, s"overlap estimate $est vs true 1000")

    GraftExtensions.installInto(spark)
    hashed(500).createOrReplaceTempView("kmv_spec_h")
    val viaSql = spark.sql(
      "SELECT size(graft_kmv(h, 64)) AS m FROM kmv_spec_h")
      .head.getInt(0)
    assert(viaSql == 64)
    spark.catalog.dropTempView("kmv_spec_h")
  }
}
