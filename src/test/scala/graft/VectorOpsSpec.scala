package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorOps

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private val eps = 1e-9

  test("dot, norm, cosine match hand-computed values") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, -5.0f, 6.0f))).toDF("a", "b")
    val row = df.select(
      VectorOps.dot(col("a"), col("b")).as("dot"),
      VectorOps.norm(col("a")).as("na"),
      VectorOps.cosine(col("a"), col("b")).as("cos")).collect()(0)
    assert(math.abs(row.getDouble(0) - 12.0) < eps) // 4 -10 +18
    assert(math.abs(row.getDouble(1) - math.sqrt(14.0)) < eps)
    val expectedCos = 12.0 / (math.sqrt(14.0) * math.sqrt(77.0))
    assert(math.abs(row.getDouble(2) - expectedCos) < eps)
  }

  test("normalize: unit norm for nonzero vectors, zeros for zero vector") {
    val df = Seq(Seq(3.0f, 4.0f), Seq(0.0f, 0.0f)).toDF("v")
      .select(VectorOps.normalize(col("v")).as("nv"))
    val rows = df.collect().map(_.getSeq[Double](0))
    assert(math.abs(math.sqrt(rows(0).map(x => x * x).sum) - 1.0) < eps)
    assert(rows(1) == Seq(0.0, 0.0))
  }

  test("cosine of identical vectors is 1; orthogonal is 0; zero-vec safe") {
    val df = Seq(
      (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b")).as("c"))
    val cs = df.collect().map(_.getDouble(0))
    assert(math.abs(cs(0) - 1.0) < eps)
    assert(math.abs(cs(1)) < eps)
    assert(cs(2) == 0.0) // no NaN on zero vectors
  }

  test("VectorSum aggregate equals the driver-side elementwise sum " +
      "and ignores nulls") {
    import graft.functions.FastVector
    val vecs = Seq(
      (1L, Seq(1.0, 2.0, 3.0)), (1L, Seq(0.5, -1.0, 4.0)),
      (2L, Seq(10.0, 0.0, -2.0)))
    val withNull = vecs.map { case (g, v) => (g, Some(v)) } :+
      ((1L, None: Option[Seq[Double]]))
    val got = withNull.toDF("g", "v")
      .repartition(3) // exercise partial buffers + merge
      .groupBy(col("g"))
      .agg(FastVector.vectorSum(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got(1L) == Seq(1.5, 1.0, 7.0))
    assert(got(2L) == Seq(10.0, 0.0, -2.0))
  }

  test("BytePool: exact means per cell, empty cells zero, one cell = " +
      "whole-payload mean") {
    import graft.functions.FastVector
    val df = Seq(
      Array[Byte](0, 10, 20, 30),   // 4 bytes over 2 cells → (5, 25)
      Array[Byte](100),             // 1 byte over 2 cells → (100, 0)
      Array[Byte]()                 // empty → (0, 0)
    ).toDF("b")
    val rows = df.select(FastVector.bytePool(col("b"), 2).as("p"))
      .collect().map(_.getSeq[Double](0))
    assert(rows(0) == Seq(5.0, 25.0))
    assert(rows(1) == Seq(100.0, 0.0))
    assert(rows(2) == Seq(0.0, 0.0))
    val whole = df.limit(1)
      .select(FastVector.bytePool(col("b"), 1).as("p"))
      .head().getSeq[Double](0)
    assert(whole == Seq(15.0))
  }

  test("hyperplane bucket: deterministic and within [0, 2^nBits)") {
    val planes = typedLit(VectorOps.makePlanes(seed = 7L, nBits = 8, dim = 4))
    val df = Seq(Seq(1.0f, -2.0f, 0.5f, 3.0f), Seq(-1.0f, 2.0f, -0.5f, -3.0f))
      .toDF("v")
      .select(VectorOps.hyperplaneBucket(col("v"), planes).as("b"))
    val b1 = df.collect().map(_.getLong(0))
    val b2 = df.collect().map(_.getLong(0))
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 256))
    // Antipodal vectors flip every sign bit → complementary buckets.
    assert(b1(0) + b1(1) == 255)
  }
}
