package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{FastText, FastVector, TextHash}

/** The engine's extension/registration point — Spark's counterpart of
  * the reference's extension install machinery (reference:duckdb:39-55,
  * `INSTALL/LOAD` → extension entry point). Sessions built with
  * `.withExtensions(new GraftExtensions)` (see [[GraftSession]]) can
  * call the native expressions from text SQL:
  *
  * {{{
  *   SELECT graft_simhash64(text) FROM documents
  *   SELECT graft_minhash_sig(text, 3) FROM documents   -- 64-perm sig
  *   SELECT graft_rolling_fp(text) FROM documents
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, ""), builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, usage, builder) for every injected native function. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("graft_simhash64", "graft_simhash64(text) - 64-bit SimHash",
      (args: Seq[Expression]) => FastText.SimHash64(args.head)),
    ("graft_rolling_fp",
      "graft_rolling_fp(text) - Karp-Rabin rolling fingerprint",
      (args: Seq[Expression]) => FastText.RollingFp(args.head)),
    ("graft_minhash_sig",
      "graft_minhash_sig(text, n) - 64-perm MinHash signature over " +
        "word-n-gram shingles",
      (args: Seq[Expression]) => {
        val (a, b) = TextHash.makePerms(seed = 42L, 64)
        FastText.MinHashSig(args.head, intArg(args(1), "shingle n"), a, b)
      }),
    ("graft_dot", "graft_dot(a, b) - dot product of double arrays",
      (args: Seq[Expression]) => FastVector.Dot(args.head, args(1))),
    ("graft_normalize",
      "graft_normalize(vec) - L2-normalize a float/double array",
      (args: Seq[Expression]) => FastVector.NormalizeVec(args.head)),
    ("graft_vector_sum",
      "graft_vector_sum(vec) - aggregate: elementwise sum of double " +
        "arrays (centroid/mean building block)",
      (args: Seq[Expression]) => FastVector.VectorSum(args.head)),
    ("graft_kmv",
      "graft_kmv(hash, k) - aggregate: k-minimum-values distinct " +
        "sketch (k smallest distinct hashes, ascending)",
      (args: Seq[Expression]) =>
        graft.functions.Kmv.KmvSketch(args.head, intArg(args(1), "k"))),
    // DuckDB-vocabulary Unicode normalizers (r17): engine-neutral
    // NFD-strip-marks and NFC, so migrating scripts that call them
    // keep working at the text entry.
    ("strip_accents",
      "strip_accents(text) - remove accents/diacritics (NFD + drop " +
        "nonspacing marks; the utf8proc strip_accents map)",
      (args: Seq[Expression]) => graft.functions.Unicode.Unaccent(args.head)),
    ("nfc_normalize",
      "nfc_normalize(text) - Unicode canonical composition (NFC)",
      (args: Seq[Expression]) => graft.functions.Unicode.Nfc(args.head)))

  /** Register every native function into an existing session (the
    * post-hoc equivalent of building withExtensions — same builders).
    */
  def installInto(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graft.Glue.registerFunction(spark, name, builder)
    }
}

/** Builder for a fully-configured engine session: extensions installed,
  * AQE on, UTC, sane shuffle parallelism for the local gate.
  */
object GraftSession {
  def builder(master: String = "local[*]",
      shufflePartitions: Int = 32): org.apache.spark.sql.SparkSession.Builder =
    org.apache.spark.sql.SparkSession.builder()
      .master(master)
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
}
