package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables => T}
import graft.util.Scale

/** Typed rows for the batched-decode path (m03). */
case class RawAsset(asset_id: Long, payload: Array[Byte])
case class DecodedMeta(asset_id: Long, n_bytes: Long, byte_sum: Long,
    width: Int, height: Int, codec: String)

/** STUB decoder standing in for a real codec binding (libjpeg/ffmpeg…).
  * The point of the shape: construction is EXPENSIVE for a real codec,
  * so it happens once per partition (see m03), and rows stream through
  * `decode` without materializing the whole partition.
  */
class StubDecoder extends Serializable {
  def decode(payload: Array[Byte]): DecodedMeta = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    DecodedMeta(-1L, payload.length.toLong, sum,
      (sum % 1280).toInt + 64, (sum % 720).toInt + 64, "stub")
  }
}

/** Multimodal columns: image/audio/video handled as opaque `binary`
  * columns with typed metadata. The container has no codec libraries, so
  * the DECODE step is a clearly-marked deterministic fake
  * ([[fakeDecodeMeta]]); everything Spark-side — binary schema, batch
  * shape, per-frame sampling plan, partitioning — is real and tested.
  * Swapping the fake for a real codec keeps every plan unchanged: it is
  * one expression over the same `binary` column.
  *
  * Scale notes: binary payloads ride the normal columnar path (parquet
  * BYTE_ARRAY); metadata extraction is per-row and codegen'd (zero
  * shuffle); frame sampling explodes only the sampled offsets (k rows
  * per asset, not |payload| rows), so a 100 TB video corpus produces a
  * frame table ∝ assets × k.
  */
object Multimodal {

  /** Documents re-materialized as a fake asset table: text bytes stand
    * in for an encoded media payload. At production this column is the
    * real image/audio/video bytes read from parquet/lakehouse.
    */
  private def assets(s: SparkSession, d: String): DataFrame =
    T.documents(s, d).select(
      col("doc_id").as("asset_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"))

  /** STUB — deterministic fake decode. A real implementation would parse
    * the container header (e.g. PNG IHDR / WAV fmt chunk); here width,
    * height and channels are derived from stable byte statistics so the
    * pipeline shape and schema are exercised end-to-end without codecs.
    */
  private def fakeDecodeMeta(payload: Column): Column = struct(
    length(payload).cast("long").as("n_bytes"),
    crc32(payload).as("checksum"),
    (pmod(crc32(payload), lit(1280)) + 64).cast("int").as("width"),
    (pmod(crc32(reverse(payload)), lit(720)) + 64).cast("int").as("height"),
    lit(3).as("channels"))

  val all: Seq[GQuery] = Seq(

    // ---------------------------------------------------------------- m01
    // Binary column + typed metadata extraction. One scan, per-row
    // expressions only.
    GQuery("m01_binary_meta", (s, d) => {
      assets(s, d)
        .withColumn("meta", fakeDecodeMeta(col("payload")))
        .select(col("asset_id"), col("source"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.checksum").as("checksum"),
          col("meta.width").as("width"),
          col("meta.height").as("height"),
          col("meta.channels").as("channels"))
        .orderBy(col("asset_id"))
    }, None),

    // ---------------------------------------------------------------- m02
    // Frame sampling: treat the payload as fixed-size frames (FrameBytes
    // each) and take every Stride-th frame. The plan explodes sampled
    // frame indices, then slices the payload — output is k rows per
    // asset with (frame_no, frame_bytes, frame_hash). STUB: "frames" are
    // raw byte slices; a real decoder would emit pixel buffers with the
    // same schema.
    GQuery("m02_frame_sample", (s, d) => {
      val FrameBytes = 64
      val Stride = 4
      val withFrames = assets(s, d)
        .withColumn("n_frames",
          ceil(length(col("payload")).cast("double") / FrameBytes).cast("int"))
        .filter(col("n_frames") > 0)
        .select(col("asset_id"), col("payload"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(Stride)))
            .as("frame_no"))
      withFrames
        .select(col("asset_id"), col("frame_no").cast("long").as("frame_no"),
          expr(s"substring(payload, frame_no * $FrameBytes + 1, $FrameBytes)")
            .as("frame_bytes"))
        .select(col("asset_id"), col("frame_no"),
          length(col("frame_bytes")).cast("long").as("frame_len"))
        .orderBy(col("asset_id"), col("frame_no"))
    }, Some("""
      SELECT doc_id AS asset_id, fno AS frame_no,
             LEAST(64, len - fno * 64) AS frame_len
      FROM (SELECT doc_id, octet_length(encode(text)) AS len FROM documents
            WHERE length(text) > 0),
           LATERAL unnest(range(0, CAST(ceil(len / 64.0) AS BIGINT), 4))
             AS t(fno)
      ORDER BY asset_id, frame_no""")),

    // ---------------------------------------------------------------- m03
    // Batched decode via typed mapPartitions — the integration shape
    // for a real codec: the decoder is constructed ONCE per partition
    // (codec/JNI init amortized over the batch), rows stream through it
    // with no full-partition materialization, and the output is a typed
    // Dataset whose schema downstream relational ops consume directly.
    // This is the Scala analog of a batched pandas-UDF decode.
    GQuery("m03_batch_decode", (s, d) => {
      import s.implicits._
      val raw = Scale.widen(assets(s, d), col("asset_id"))
        .select(col("asset_id"), col("payload"))
        .as[RawAsset]
      raw.mapPartitions { it =>
        val decoder = new StubDecoder // once per partition, not per row
        it.map(a => decoder.decode(a.payload).copy(asset_id = a.asset_id))
      }.toDF()
        .orderBy(col("asset_id"))
    }, None),

    // ---------------------------------------------------------------- m04
    // Feature-extract / resize: average-pool the payload onto a fixed
    // 16-cell grid (the 1-D analog of thumbnailing an image) via the
    // codegen'd BytePool expression — one pass per row, zero shuffle.
    // The payload here is ASCII text bytes, so DuckDB can reproduce the
    // exact per-cell means from character codes: a full hash oracle for
    // the resize arithmetic, not just the plumbing.
    GQuery("m04_feature_resize", (s, d) => {
      val Cells = 16
      assets(s, d)
        .filter(length(col("payload")) >= Cells) // every cell non-empty
        .select(col("asset_id"),
          posexplode(graft.functions.FastVector.bytePool(col("payload"), Cells))
            .as(Seq("cell", "avg_byte")))
        .select(col("asset_id"), col("cell").cast("long").as("cell"),
          round(col("avg_byte"), 6).as("avg_byte"))
        .orderBy(col("asset_id"), col("cell"))
    }, Some("""
      SELECT doc_id AS asset_id, CAST(p * 16 // n AS BIGINT) AS cell,
             ROUND(SUM(ord(substring(text, CAST(p + 1 AS INT), 1)))
                     / COUNT(*), 6) AS avg_byte
      FROM (SELECT doc_id, text, length(text) AS n FROM documents
            WHERE length(text) >= 16),
           LATERAL unnest(range(0, n)) t(p)
      GROUP BY 1, 2 ORDER BY asset_id, cell""")),

    // ---------------------------------------------------------------- m05
    // Modality corpus accounting — the "what is in my multimodal lake"
    // pass a 100 TB pipeline runs first: per (source, modality) asset
    // counts, byte totals, and projected frame volume. One scan, one
    // keyed aggregation with map-side partials; output is
    // |sources|×|modalities| rows regardless of corpus size. STUB: the
    // modality sniff is a deterministic byte statistic standing in for
    // a magic-bytes/container-header check (same shape: a per-row
    // expression over the binary column).
    GQuery("m05_modality_stats", (s, d) => {
      val FrameBytes = 64
      assets(s, d)
        .withColumn("n_bytes", length(col("payload")).cast("long"))
        .withColumn("modality",
          expr("CASE pmod(n_bytes, 3) WHEN 0 THEN 'image' " +
            "WHEN 1 THEN 'audio' ELSE 'video' END"))
        .groupBy(col("source"), col("modality"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("n_bytes")).as("total_bytes"),
          round(avg(col("n_bytes")), 4).as("avg_bytes"),
          sum(ceil(col("n_bytes").cast("double") / FrameBytes).cast("long"))
            .as("total_frames"))
        .orderBy(col("source"), col("modality"))
    }, Some("""
      SELECT source,
             CASE octet_length(encode(text)) % 3 WHEN 0 THEN 'image'
                  WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
             COUNT(*) AS n_assets,
             CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
             ROUND(AVG(octet_length(encode(text))), 4) AS avg_bytes,
             CAST(SUM(CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT))
               AS BIGINT) AS total_frames
      FROM documents GROUP BY source, modality ORDER BY source, modality""")),

    // ---------------------------------------------------------------- m06
    // Perceptual-hash near-duplicates: each payload's 16-cell pooled
    // grid (the m04 BytePool expression) thresholds against its own
    // mean to a 16-bit pHash — the aHash algorithm over the byte-grid
    // stand-in — and assets bucket by exact pHash (the group size is
    // the near-dup signal). The mean comparison runs in exact DECIMAL
    // (v·16 vs Σv — no division, no float summation order), so the
    // bit pattern is engine-identical and the oracle checks the FULL
    // hash arithmetic. Scale: one scan + one 16-rows-per-asset window;
    // near-dup candidates come from a hash equi-bucket, never pairwise.
    GQuery("m06_phash_neardup", (s, d) => {
      val Cells = 16
      val w = org.apache.spark.sql.expressions.Window.partitionBy("asset_id")
      val cells = assets(s, d)
        .filter(length(col("payload")) >= Cells)
        .select(col("asset_id"),
          posexplode(graft.functions.FastVector.bytePool(col("payload"), Cells))
            .as(Seq("cell", "v0")))
        .select(col("asset_id"), col("cell"),
          round(col("v0"), 6).cast("decimal(18,6)").as("v"))
      val ph = cells
        .withColumn("s", sum(col("v")).over(w))
        .withColumn("bit",
          when(col("v") * Cells > col("s"),
            expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(cell AS INT)) AS BIGINT)"))
            .otherwise(lit(0L)))
        .groupBy(col("asset_id"))
        .agg(sum(col("bit")).cast("long").as("phash"))
      ph.withColumn("n_dups",
          count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("phash"))
            .cast("long"))
        .orderBy(col("asset_id"))
    }, Some("""
      WITH cells AS (
        SELECT doc_id AS asset_id, CAST(p * 16 // n AS BIGINT) AS cell,
               CAST(ROUND(SUM(ord(substring(text, CAST(p + 1 AS INT), 1)))
                      / COUNT(*), 6) AS DECIMAL(18,6)) AS v
        FROM (SELECT doc_id, text, length(text) AS n FROM documents
              WHERE length(text) >= 16),
             LATERAL unnest(range(0, n)) t(p)
        GROUP BY 1, 2),
      wm AS (SELECT asset_id, cell, v,
               SUM(v) OVER (PARTITION BY asset_id) AS s FROM cells),
      ph AS (
        SELECT asset_id,
               CAST(SUM(CASE WHEN v * 16 > s
                 THEN CAST(POW(2, cell) AS BIGINT) ELSE 0 END) AS BIGINT)
                 AS phash
        FROM wm GROUP BY asset_id)
      SELECT asset_id, phash,
             COUNT(*) OVER (PARTITION BY phash) AS n_dups
      FROM ph ORDER BY asset_id"""))
  )
}
