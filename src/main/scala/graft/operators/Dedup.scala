package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables => T}
import graft.functions.{FastText, FastVector, TextHash, VectorOps}

/** Deduplication for training-data pipelines.
  *
  * Scale design: every variant is (per-row signature) → (shuffle once on
  * the signature/bucket key) → (pairs only within buckets). Nothing here
  * is O(n²) in the corpus — candidate generation is bucket-local, so at
  * 100 TB the cost is one linear pass + one shuffle whose key cardinality
  * the banding parameters control.
  */
object Dedup {

  private val NPerm = 64
  private val NBands = 16
  private val BandRows = 4 // 16 bands × 4 rows = 64 perms
  private val ShingleN = 3
  private val (permA, permB) = TextHash.makePerms(seed = 42L, NPerm)

  /** doc_id + exploded (band, bandKey) rows for MinHash-LSH. The
    * signature is the native expression (FastText.MinHashSig — same
    * values as the TextHash HOF form, ~100× faster; see FastTextSpec).
    */
  private def minhashBandTable(s: SparkSession, d: String): DataFrame = {
    val sig = FastText.minhashSig(col("text"), ShingleN, permA, permB)
    // Redistribute BEFORE the CPU-heavy signature: the test corpus is a
    // single-row-group file (one scan task); hashing must not serialize
    // behind it. At lake scale the scan is already many tasks and AQE
    // coalesces this exchange to a no-op-sized shuffle of raw text —
    // one linear pass, always dominated by the O(tokens×perms) hashing
    // it unlocks.
    // Two projections: band extraction references `sig` 16 times (once
    // per band slice); materializing the signature first keeps it ONE
    // evaluation per row instead of 16 (CollapseProject keeps multiply-
    // referenced non-cheap projections separate).
    T.documents(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"), sig.as("sig"))
      .select(col("doc_id"),
        posexplode(TextHash.lshBands(col("sig"), NBands, BandRows))
          .as(Seq("band", "bkey")))
  }

  /** Distinct candidate pairs (a<b) that share ≥1 LSH band, with the
    * number of shared bands. Self-equi-join on (band, bkey): Catalyst
    * plans a shuffled hash join keyed by the bucket, so work is
    * per-bucket, never all-pairs.
    */
  private def minhashCandidates(s: SparkSession, d: String): DataFrame = {
    val bt = minhashBandTable(s, d)
    val a = bt.select(col("band"), col("bkey"), col("doc_id").as("doc_a"))
    val b = bt.select(col("band").as("band2"), col("bkey").as("bkey2"),
      col("doc_id").as("doc_b"))
    a.join(b, col("band") === col("band2") && col("bkey") === col("bkey2") &&
        col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Pairs of embeddings with cosine > θ (the near-dup contract), found
    * via hyperplane-LSH candidate buckets — never all-pairs. `limit <= 0`
    * returns every qualifying pair.
    */
  def embeddingNearDup(s: SparkSession, d: String, theta: Double,
      limit: Int = 0): DataFrame = {
    val tables = 4
    val planes = (0 until tables).map(t =>
      VectorOps.makePlanes(seed = 100 + t, nBits = 8, dim = 64))
    val base = T.embeddings(s, d).select(col("vec_id"),
      FastVector.normalize(col("embedding")).as("nv"))
    val bucketed = base.select(col("vec_id"), col("nv"),
      posexplode(FastVector.hyperplaneBuckets(col("nv"), planes))
        .as(Seq("tbl", "bucket")))
    val a = bucketed.select(col("tbl"), col("bucket"),
      col("vec_id").as("vec_a"), col("nv").as("nv_a"))
    val b = bucketed.select(col("tbl").as("tbl2"),
      col("bucket").as("bucket2"),
      col("vec_id").as("vec_b"), col("nv").as("nv_b"))
    val pairs = a.join(b,
        col("tbl") === col("tbl2") && col("bucket") === col("bucket2")
          && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(FastVector.dot(col("nv_a"), col("nv_b")), 6)
          .as("cos"))
      .groupBy(col("vec_a"), col("vec_b"))
      .agg(max(col("cos")).as("cos"))
      .filter(col("cos") > theta)
      .orderBy(col("cos").desc, col("vec_a"), col("vec_b"))
    if (limit > 0) pairs.limit(limit) else pairs
  }

  val all: Seq[GQuery] = Seq(

    // ---------------------------------------------------------------- d01
    // Exact dedup: group by content hash, keep the smallest doc_id.
    // One shuffle keyed by md5(text); linear at any corpus size.
    GQuery("d01_exact_dedup", (s, d) => {
      T.documents(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .orderBy(col("keep_id"))
    }, Some("""
      SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n
      FROM documents GROUP BY md5(text) ORDER BY keep_id""")),

    // ---------------------------------------------------------------- d02
    // MinHash + LSH banding: 64 perms, 16 bands × 4 rows. Signature is
    // one codegen'd expression per doc; candidates come from the bucket
    // join above. Engine-specific hash → rows-only check (spec covers
    // the minhash algebra).
    GQuery("d02_minhash_lsh", (s, d) => {
      minhashCandidates(s, d)
        .orderBy(col("n_bands").desc, col("doc_a"), col("doc_b"))
        .limit(500)
    }, None),

    // ---------------------------------------------------------------- d03
    // SimHash: 64-bit signature from token votes; candidates share a
    // 16-bit chunk (catches hamming ≤ 3 deterministically, more by
    // luck); verified by exact popcount of the XOR.
    GQuery("d03_simhash", (s, d) => {
      val docs = T.documents(s, d)
        .repartition(col("doc_id")) // parallelize hashing past the 1-task scan
        .select(col("doc_id"), FastText.simhash64(col("text")).as("sim"))
      val bands = docs.select(col("doc_id"), col("sim"),
        posexplode(TextHash.simhashBands(col("sim"))).as(Seq("band", "bkey")))
      val a = bands.select(col("band"), col("bkey"),
        col("doc_id").as("doc_a"), col("sim").as("sim_a"))
      val b = bands.select(col("band").as("band2"), col("bkey").as("bkey2"),
        col("doc_id").as("doc_b"), col("sim").as("sim_b"))
      a.join(b, col("band") === col("band2") && col("bkey") === col("bkey2") &&
          col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long")
            .as("hamming"))
        .distinct()
        .filter(col("hamming") <= 24)
        .orderBy(col("hamming"), col("doc_a"), col("doc_b"))
        .limit(500)
    }, None),

    // ---------------------------------------------------------------- d04
    // n-gram Jaccard verification of the LSH candidates: exact
    // |A∩B|/|A∪B| over distinct word-3-gram shingle sets. Join is keyed
    // by doc_id (shuffle), then per-pair set algebra — still bucket-
    // bounded, never all-pairs.
    GQuery("d04_ngram_jaccard", (s, d) => {
      val sets = T.documents(s, d)
        .repartition(col("doc_id")) // parallelize shingling past the 1-task scan
        .select(col("doc_id"),
          FastText.distinctShingles(col("text"), ShingleN).as("sh"))
      val cand = minhashCandidates(s, d)
      cand
        .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
          "doc_a")
        .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
          "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
            / size(array_union(col("sh_a"), col("sh_b"))), 6).as("jaccard"))
        .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
        .limit(100)
    }, None),

    // ---------------------------------------------------------------- d05
    // Embedding-cosine near-dup (θ-threshold contract, SURVEY §2): 4
    // independent random-hyperplane LSH tables (8 bits each) generate
    // candidates; exact cosine keeps pairs with cos > θ. Production
    // default is θ=0.95; the registered query runs θ=0.4 because the
    // synthetic embeddings are near-orthogonal (max cos ≈ 0.51) and a
    // 0.95 cut would make the gate vacuous (0 rows). The top-100 view
    // stays available via [[embeddingNearDup]]'s limit parameter.
    GQuery("d05_embedding_neardup",
      (s, d) => embeddingNearDup(s, d, theta = 0.4), None),

    // ---------------------------------------------------------------- d06
    // Normalized-key dedup keep-first: URL-style key normalization
    // (lower/trim) over (source, lang); min doc_id survives. One
    // shuffle on the normalized key.
    GQuery("d06_url_dedup", (s, d) => {
      T.documents(s, d)
        .groupBy(lower(trim(col("source"))).as("src_norm"), col("lang"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n"))
        .orderBy(col("src_norm"), col("lang"))
    }, Some("""
      SELECT lower(trim(source)) AS src_norm, lang,
             MIN(doc_id) AS keep_id, COUNT(*) AS n
      FROM documents GROUP BY 1, 2 ORDER BY src_norm, lang"""))
  )
}
