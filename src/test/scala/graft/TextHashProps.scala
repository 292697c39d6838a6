package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._
import graft.functions.{FastText, FastTextRuntime, TextHash}
import org.apache.spark.unsafe.types.UTF8String

/** ScalaCheck properties over the hash/fingerprint algebra — run on the
  * runtime directly (no Spark jobs per case), which the expression
  * layer provably delegates to (FastTextSpec asserts expression ==
  * runtime == HOF on Spark plans).
  */
object TextHashProps extends Properties("TextHash") {

  private val word: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaLowerChar))
  private val doc: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
  private val (pa, pb) = TextHash.makePerms(seed = 42L, 64)

  private def sig(text: String): Seq[Long] = {
    val a = FastTextRuntime.minhashSig(UTF8String.fromString(text), 3,
      pa.toArray, pb.toArray)
    (0 until a.numElements()).map(a.getLong)
  }

  private def jaccard(x: String, y: String): Double = {
    def sh(t: String): Set[String] =
      t.split(" ", -1).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val (a, b) = (sh(x), sh(y))
    if (a.isEmpty && b.isEmpty) 1.0
    else if (a.isEmpty || b.isEmpty) 0.0
    else a.intersect(b).size.toDouble / a.union(b).size
  }

  property("minhash signature is deterministic") = Prop.forAll(doc) { d =>
    sig(d) == sig(d)
  }

  property("identical docs agree on every signature slot") =
    Prop.forAll(doc) { d =>
      val s = sig(d)
      s.zip(sig(d)).forall { case (a, b) => a == b }
    }

  property("signature slots stay in [0, P]") = Prop.forAll(doc) { d =>
    sig(d).forall(v => v >= 0 && v <= TextHash.P)
  }

  property("minhash agreement tracks exact Jaccard within 0.3") =
    Prop.forAll(doc, doc) { (x, y) =>
      val (sx, sy) = (sig(x), sig(y))
      val agree = sx.zip(sy).count { case (a, b) => a == b }.toDouble / sx.size
      // 64 perms: binomial std dev <= 0.0625; 0.3 is a generous bound
      // that still catches systematic algebra bugs.
      math.abs(agree - jaccard(x, y)) <= 0.3
    }

  property("simhash of identical docs is identical; hamming <= 64") =
    Prop.forAll(doc, doc) { (x, y) =>
      val (hx, hy) = (FastTextRuntime.simhash64(UTF8String.fromString(x)),
        FastTextRuntime.simhash64(UTF8String.fromString(y)))
      val h = java.lang.Long.bitCount(hx ^ hy)
      (x != x || hx == FastTextRuntime.simhash64(UTF8String.fromString(x))) &&
        h >= 0 && h <= 64 && (x != y || h == 0)
    }

  property("rolling fingerprint is order-sensitive mod-P") =
    Prop.forAll(doc) { d =>
      val fp = FastTextRuntime.rollingFp(UTF8String.fromString(d))
      fp >= 0 && fp < TextHash.P
    }
}
