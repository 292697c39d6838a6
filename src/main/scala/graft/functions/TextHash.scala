package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text hashing primitives for dedup / fingerprinting, built from
  * codegen'd native functions only (split/transform/aggregate).
  *
  * Every hash here is ENGINE-NEUTRAL: charPoly31 (a polynomial fold
  * over the string's characters) plus universal-hash permutation grids
  * ((a·h + b) mod P). Any engine with a list fold replays the exact
  * values — which is what lets the whole minhash/simhash dedup family
  * carry full cross-engine DuckDB oracles instead of rows-only checks.
  *
  * ANSI-safe arithmetic: Spark 4 runs with ANSI mode on, where long
  * overflow throws. Every hash chain here therefore reduces operands
  * below 2³¹ before multiplying (products stay < 2⁶²) and folds modulo a
  * Mersenne prime.
  */
object TextHash {

  /** 2³¹−1, Mersenne prime used as the universal-hash modulus. */
  val P: Long = 2147483647L

  /** Whitespace tokens of a document. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles (array<string>); empty array when the doc has
    * fewer than n tokens (guards Spark's descending `sequence`).
    */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    when(size(w) >= n,
      transform(sequence(lit(1), size(w) - (n - 1)), i =>
        concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Shingle → 31-bit hash (array<long>, each in [0, P)): the
    * engine-neutral [[charPoly31]], so a DuckDB oracle replays every
    * value with a list fold. Staying below 2³¹ keeps the minhash
    * permutation products overflow-free.
    */
  def shingleHashes31(text: Column, n: Int): Column =
    transform(shingles(text, n), s => charPoly31(s))

  /** Deterministic universal-hash coefficients for `nPerm` minhash
    * permutations h_i(x) = (a_i·x + b_i) mod P.
    */
  def makePerms(seed: Long, nPerm: Int): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(seed)
    val as = Seq.fill(nPerm)(1L + rnd.nextInt((P - 1).toInt).toLong)
    val bs = Seq.fill(nPerm)(rnd.nextInt(P.toInt).toLong)
    (as, bs)
  }

  /** MinHash signature (array<long> of length nPerm) from 31-bit shingle
    * hashes. One expression, linear in |shingles|·nPerm, no shuffle.
    * Docs with zero shingles get P (an impossible min) in every slot.
    */
  def minhashSignature(hashes31: Column, as: Seq[Long], bs: Seq[Long]): Column = {
    val a = typedLit(as)
    val b = typedLit(bs)
    transform(sequence(lit(1), lit(as.size)), i =>
      coalesce(
        array_min(transform(hashes31, h =>
          pmod(element_at(a, i) * h + element_at(b, i), lit(P)))),
        lit(P)))
  }

  /** LSH band keys: signature split into `nBands` contiguous bands of
    * `rows` slots each, each band folded to one long key with the
    * engine-neutral polynomial (acc·8191 + slot) mod P — slot values
    * are < P < 2³¹ so the products stay < 2⁴⁴, ANSI-safe.
    */
  def lshBands(sig: Column, nBands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(nBands - 1)), bnd =>
      aggregate(slice(sig, bnd * rows + 1, lit(rows)), lit(0L),
        (acc, x) => pmod(acc * 8191L + x, lit(P))))

  /** SimHash per-token bit grid: bit b of a token with charPoly31 hash
    * h is the LSB of (a_b·h + b_b) mod P — 64 universal-hash rows,
    * fixed seed, shared by the HOF form, the native runtime, and the
    * DuckDB oracle replay.
    */
  val simPerms: (Seq[Long], Seq[Long]) = makePerms(seed = 7L, 64)

  /** 64-bit SimHash of the token multiset: for each bit position, sum
    * ±1 votes from the [[simPerms]] grid over charPoly31(token), then
    * keep the sign. A single aggregate/zip_with expression — per-row,
    * no shuffle — and engine-neutral end to end.
    */
  def simhash64(text: Column): Column = {
    val a = typedLit(simPerms._1)
    val b = typedLit(simPerms._2)
    val votes = aggregate(
      tokens(text),
      typedLit(Seq.fill(64)(0L)),
      (acc, t) => zip_with(acc, sequence(lit(0), lit(63)), (v, bpos) =>
        v + when(pmod(element_at(a, bpos.cast("int") + 1) * charPoly31(t)
              + element_at(b, bpos.cast("int") + 1), lit(P))
            .bitwiseAND(1) === 1, 1L)
          .otherwise(-1L)))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, bpos) =>
        when(v > 0, call_function("shiftleft", lit(1L), bpos)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** SimHash band keys: the 64-bit hash as four 16-bit chunks; docs
    * within hamming distance 3 share at least one exact chunk.
    */
  def simhashBands(sim: Column): Column =
    transform(sequence(lit(0), lit(3)), bnd =>
      call_function("shiftright", sim, bnd * 16).bitwiseAND(0xFFFFL))

  /** Engine-neutral 31-bit polynomial string hash, h = (h·131 + c)
    * mod P over the string's characters — the fingerprint hash
    * (cross-engine-computable, unlike xxhash64; see
    * FastTextRuntime.charPoly31).
    */
  def charPoly31(sc: Column): Column =
    aggregate(sequence(lit(1), length(sc)), lit(0L), (a, i) =>
      pmod(a * 131L + ascii(sc.substr(i, lit(1))), lit(P)))

  /** Alias of [[shingleHashes31]] (kept for the fingerprint call
    * sites that predate the minhash family moving onto the same
    * engine-neutral hash).
    */
  def shingleHashesPoly(text: Column, n: Int): Column =
    shingleHashes31(text, n)

  /** Rolling polynomial fingerprint over tokens, mod P (Karp–Rabin
    * style): fp = Σ charPoly31(tok)·31^k mod P, fold kept < 2³⁶ so
    * ANSI-safe.
    */
  def rollingFingerprint(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) =>
      pmod(acc * 31L + charPoly31(t), lit(P)))
}
