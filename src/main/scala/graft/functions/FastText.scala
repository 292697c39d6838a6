package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Glue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-hash hot paths.
  *
  * The [[TextHash]] formulations compose higher-order functions
  * (`transform`/`aggregate`), which Catalyst evaluates interpreted with
  * per-element boxing — O(shingles × 64 perms) boxed lambda calls per
  * row made minhash the dominant cost of the whole suite. These
  * expressions compute identical values (same tokenization, same
  * xxhash64 seed 42, same mod-P algebra — asserted by FastTextSpec) in
  * one tight primitive JVM loop per row: typically 100-1000× faster.
  *
  * Scale note: each is a per-row scalar/array expression — no state, no
  * shuffle — so they ride any plan shape and parallelize per-partition
  * like any builtin.
  */
object FastText {

  private val P = TextHash.P
  private val Seed = 42L // xxhash64's default seed, matches xxhash64()

  private def hash64(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, Seed)

  /** Spark's split(text, " ") semantics: Java regex split, limit -1. */
  private def tokens(text: UTF8String): Array[String] =
    text.toString.split(" ", -1)

  private def hash31OfShingles(text: UTF8String, n: Int): Array[Long] = {
    val toks = tokens(text)
    if (toks.length < n) return Array.emptyLongArray
    val out = new Array[Long](toks.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      out(i) = java.lang.Math.floorMod(hash64(sb.toString), P)
      i += 1
    }
    out
  }

  /** MinHash signature over word-n-gram shingles: equals
    * TextHash.minhashSignature(TextHash.shingleHashes31(text, n), as, bs)
    * slot for slot. Docs with < n tokens get P in every slot.
    */
  case class MinHashSig(child: Expression, shingleN: Int,
      as: Seq[Long], bs: Seq[Long])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_sig"
    override protected def nullSafeEval(input: Any): Any = {
      val hashes = hash31OfShingles(input.asInstanceOf[UTF8String], shingleN)
      val nPerm = as.length
      val sig = new Array[Long](nPerm)
      var i = 0
      while (i < nPerm) {
        var best = P
        val a = as(i); val b = bs(i)
        var k = 0
        while (k < hashes.length) {
          val v = java.lang.Math.floorMod(a * hashes(k) + b, P)
          if (v < best) best = v
          k += 1
        }
        sig(i) = best; i += 1
      }
      new GenericArrayData(sig)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig =
      copy(child = c)
  }

  /** 64-bit SimHash of the token multiset — equals TextHash.simhash64. */
  case class SimHash64(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"
    override protected def nullSafeEval(input: Any): Any = {
      val toks = tokens(input.asInstanceOf[UTF8String])
      val votes = new Array[Int](64)
      var t = 0
      while (t < toks.length) {
        val h = hash64(toks(t))
        var b = 0
        while (b < 64) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        t += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
      out
    }
    override protected def withNewChildInternal(c: Expression): SimHash64 =
      copy(child = c)
  }

  /** Karp–Rabin rolling fingerprint — equals TextHash.rollingFingerprint. */
  case class RollingFp(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_rolling_fp"
    override protected def nullSafeEval(input: Any): Any = {
      val toks = tokens(input.asInstanceOf[UTF8String])
      var acc = 0L
      var t = 0
      while (t < toks.length) {
        val h31 = java.lang.Math.floorMod(hash64(toks(t)), P)
        acc = java.lang.Math.floorMod(acc * 31L + h31, P)
        t += 1
      }
      acc
    }
    override protected def withNewChildInternal(c: Expression): RollingFp =
      copy(child = c)
  }

  /** Min 31-bit shingle hash (winnowing fingerprint): equals
    * coalesce(array_min(shingleHashes31(text, n)), P).
    */
  case class ShingleMin31(child: Expression, shingleN: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_shingle_min31"
    override protected def nullSafeEval(input: Any): Any = {
      val hashes = hash31OfShingles(input.asInstanceOf[UTF8String], shingleN)
      var best = P
      var i = 0
      while (i < hashes.length) { if (hashes(i) < best) best = hashes(i); i += 1 }
      best
    }
    override protected def withNewChildInternal(c: Expression): ShingleMin31 =
      copy(child = c)
  }

  /** Distinct word-n-gram shingles — equals
    * array_distinct(TextHash.shingles(text, n)) (first-occurrence order,
    * like array_distinct). One pass, one StringBuilder, no boxed lambdas.
    */
  case class DistinctShingles(child: Expression, shingleN: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_distinct_shingles"
    override protected def nullSafeEval(input: Any): Any = {
      val toks = tokens(input.asInstanceOf[UTF8String])
      if (toks.length < shingleN) return new GenericArrayData(Array.empty[Any])
      val seen = new java.util.LinkedHashSet[String]()
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - shingleN) {
        sb.setLength(0)
        var j = 0
        while (j < shingleN) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): DistinctShingles =
      copy(child = c)
  }

  /** All word-n-gram shingles WITH duplicates (corpus frequency use
    * case, e.g. t05) — equals TextHash-style shingling without the
    * distinct. Empty array when the doc has fewer than n tokens.
    */
  case class WordNgrams(child: Expression, n: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType =
      ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_word_ngrams"
    override protected def nullSafeEval(input: Any): Any = {
      val toks = tokens(input.asInstanceOf[UTF8String])
      if (toks.length < n) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < out.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): WordNgrams =
      copy(child = c)
  }

  /** Language-ID scorer: fraction of each profile's character bigrams
    * present among the doc's distinct bigrams; returns the argmax as a
    * (score, lang) struct. Equals the HOF form in TextOps.t03 — same
    * substr-by-codepoint bigrams (including the length<2 edge where the
    * whole text is the only "bigram"), same array_max tie-break
    * (lexicographically larger lang wins equal scores).
    */
  case class LangScore(child: Expression, profiles: Seq[(String, Seq[String])])
      extends UnaryExpression with CodegenFallback {
    private val profArr: Array[(UTF8String, Array[String])] =
      profiles.map { case (l, ps) =>
        (UTF8String.fromString(l), ps.toArray)
      }.toArray
    override def dataType: DataType = StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("lang", StringType, nullable = false)))
    override def prettyName: String = "graft_lang_score"
    override protected def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val bigrams = new java.util.HashSet[String]()
      val upper = math.max(s.length - 1, 1)
      var i = 0
      while (i < upper) {
        bigrams.add(s.substring(i, math.min(i + 2, s.length)))
        i += 1
      }
      var bestScore = -1.0
      var bestLang: UTF8String = null
      profArr.foreach { case (lang, prof) =>
        var hits = 0
        var k = 0
        while (k < prof.length) {
          if (bigrams.contains(prof(k))) hits += 1
          k += 1
        }
        val score = hits.toDouble / prof.length
        if (score > bestScore ||
            (score == bestScore && lang.compareTo(bestLang) > 0)) {
          bestScore = score; bestLang = lang
        }
      }
      org.apache.spark.sql.catalyst.InternalRow(bestScore, bestLang)
    }
    override protected def withNewChildInternal(c: Expression): LangScore =
      copy(child = c)
  }

  // Column-facing wrappers.
  def minhashSig(text: Column, n: Int, as: Seq[Long], bs: Seq[Long]): Column =
    Glue.column(MinHashSig(Glue.expression(text), n, as, bs))
  def simhash64(text: Column): Column =
    Glue.column(SimHash64(Glue.expression(text)))
  def rollingFp(text: Column): Column =
    Glue.column(RollingFp(Glue.expression(text)))
  def shingleMin31(text: Column, n: Int): Column =
    Glue.column(ShingleMin31(Glue.expression(text), n))
  def langScore(text: Column, profiles: Seq[(String, Seq[String])]): Column =
    Glue.column(LangScore(Glue.expression(text), profiles))
  def distinctShingles(text: Column, n: Int): Column =
    Glue.column(DistinctShingles(Glue.expression(text), n))
  def wordNgrams(text: Column, n: Int): Column =
    Glue.column(WordNgrams(Glue.expression(text), n))
}
