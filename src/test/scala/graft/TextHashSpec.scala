package graft

import org.apache.spark.sql.functions._
import graft.functions.TextHash

class TextHashSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: fewer tokens than n yields empty array, never null") {
    val df = Seq("one two", "a b c d", "").toDF("text")
      .select(TextHash.shingles(col("text"), 3).as("sh"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0) == Seq.empty)
    assert(rows(1) == Seq("a b c", "b c d"))
    assert(rows(2) == Seq.empty)
  }

  test("minhash similarity approximates exact Jaccard within tolerance") {
    // Construct doc pairs with known token-shingle overlap and check
    // |signature agreement − exact Jaccard| is small for 64 perms.
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val mostly = ((1 to 50).map(i => s"w$i") ++ (100 to 109).map(i => s"w$i"))
      .mkString(" ")
    val disjoint = (200 to 259).map(i => s"w$i").mkString(" ")
    val (pa, pb) = TextHash.makePerms(seed = 42L, 64)

    def sig(text: String): Seq[Long] =
      Seq(text).toDF("text")
        .select(TextHash.minhashSignature(
          TextHash.shingleHashes31(col("text"), 3), pa, pb).as("s"))
        .collect()(0).getSeq[Long](0)

    def shingleSet(text: String): Set[String] =
      text.split(" ").sliding(3).map(_.mkString(" ")).toSet

    def exactJ(x: String, y: String): Double = {
      val (a, b) = (shingleSet(x), shingleSet(y))
      a.intersect(b).size.toDouble / a.union(b).size
    }

    def sigAgree(x: String, y: String): Double = {
      val (sa, sb) = (sig(x), sig(y))
      sa.zip(sb).count { case (u, v) => u == v }.toDouble / sa.size
    }

    assert(sigAgree(base, base) == 1.0)
    assert(math.abs(sigAgree(base, mostly) - exactJ(base, mostly)) < 0.15)
    assert(sigAgree(base, disjoint) < 0.1)
  }

  test("simhash: identical docs collide; near-identical docs are close") {
    val doc = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = ((1 to 38).map(i => s"tok$i") ++ Seq("x", "y")).mkString(" ")
    val far = (100 to 140).map(i => s"z$i").mkString(" ")
    val sims = Seq(doc, doc, near, far).toDF("text")
      .select(TextHash.simhash64(col("text")).as("s"))
      .collect().map(_.getLong(0))
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sims(0), sims(1)) == 0)
    assert(hamming(sims(0), sims(2)) < hamming(sims(0), sims(3)))
    assert(hamming(sims(0), sims(2)) <= 16)
  }

  test("simhash banding: hamming<=3 pairs share at least one 16-bit chunk") {
    // Banding guarantee is structural (pigeonhole over 4 chunks); verify
    // the band extraction itself: flipping 3 bits leaves >=1 chunk equal.
    val sim = 0x123456789abcdef0L
    val flipped = sim ^ (1L << 2) ^ (1L << 21) ^ (1L << 63) // 3 distinct chunks
    val bands = Seq(sim, flipped).toDF("s")
      .select(TextHash.simhashBands(col("s")).as("b"))
      .collect().map(_.getSeq[Long](0))
    assert(bands(0).zip(bands(1)).count { case (x, y) => x == y } >= 1)
  }

  test("rolling fingerprint: deterministic, order-sensitive, in [0, P)") {
    val fps = Seq("alpha beta gamma", "alpha beta gamma", "gamma beta alpha")
      .toDF("text")
      .select(TextHash.rollingFingerprint(col("text")).as("fp"))
      .collect().map(_.getLong(0))
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2)) // polynomial hash is position-sensitive
    assert(fps.forall(f => f >= 0 && f < TextHash.P))
  }

  test("lsh bands: 16 bands, equal signatures give equal band keys") {
    val (pa, pb) = TextHash.makePerms(seed = 42L, 64)
    val df = Seq("the quick brown fox jumps over the lazy dog again and again")
      .toDF("text")
      .select(TextHash.lshBands(TextHash.minhashSignature(
        TextHash.shingleHashes31(col("text"), 3), pa, pb), 16, 4).as("b"))
    val bands = df.collect()(0).getSeq[Long](0)
    assert(bands.size == 16)
  }
}
