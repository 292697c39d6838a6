package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built entirely from
  * codegen'd higher-order functions (`zip_with`/`aggregate`/`transform`)
  * — no UDF, so whole-stage codegen stays intact and the expressions
  * push through any plan shape (join conditions, window frames, aggs).
  *
  * All arithmetic is promoted to double before accumulation; folds run
  * left-to-right over the array, so results are bit-deterministic for a
  * given row regardless of partitioning.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** ‖a‖₂ */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** a / ‖a‖₂ as array<double>; zero vectors map to zeros (no NaN). */
  def normalize(a: Column): Column = {
    val n = norm(a)
    transform(a, x => when(n > 0, x.cast("double") / n).otherwise(0.0))
  }

  /** Cosine similarity; 0 when either side is the zero vector. */
  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom > 0, dot(a, b) / denom).otherwise(lit(0.0))
  }

  /** Dot product of two pre-normalized vectors (cheaper cosine). */
  def cosinePrenorm(a: Column, b: Column): Column = dot(a, b)

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dd = x.cast("double") - y.cast("double"); dd * dd
      }),
      lit(0.0), (acc, x) => acc + x)

  /** Random-hyperplane LSH bucket id: one sign bit per hyperplane,
    * packed little-endian into a long. `planes` is a literal
    * array<array<double>> (nBits × dim), so the whole signature is one
    * codegen'd expression — no shuffle, no UDF.
    */
  def hyperplaneBucket(vec: Column, planes: Column): Column =
    aggregate(
      zip_with(planes, sequence(lit(0), size(planes) - 1), (p, i) =>
        when(dot(vec, p) >= 0, call_function("shiftleft", lit(1L), i))
          .otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)

  /** Deterministic pseudo-random hyperplanes (public xorshift-free LCG on
    * a fixed seed — reproducible across runs and JVMs).
    */
  def makePlanes(seed: Long, nBits: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Embedding dimensionality for plane sampling: the caller's explicit
    * value when positive, otherwise measured from the data (length of
    * the first vector — one limit-1 row-group read). A wrong explicit
    * dim silently degrades LSH recall (vectors bucket on only their
    * first `dim` components), so deriving is the safe default for the
    * public APIs. Empty input falls back to 64 (the result is empty
    * anyway — any plane dimensionality produces it).
    */
  def dimOf(df: org.apache.spark.sql.DataFrame, vecCol: String,
      explicit: Int = -1): Int =
    if (explicit > 0) explicit
    else df.select(size(col(vecCol)).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(64)
}
