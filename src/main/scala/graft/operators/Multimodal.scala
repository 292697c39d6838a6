package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables => T}
import graft.util.Scale

/** Typed rows for the batched-decode path (m03). */
case class RawAsset(asset_id: Long, payload: Array[Byte])
case class WavMeta(asset_id: Long, n_bytes: Long, channels: Long,
    sample_rate: Long, bits_per_sample: Long, data_bytes: Long,
    duration_ms: Long)

/** REAL RIFF/WAVE header parser (the canonical 44-byte PCM layout) —
  * this is the JVM-side decoder for the batched path. The shape it
  * demonstrates: construction may be expensive for a heavier codec
  * (JNI bindings, model weights), so it happens once per partition
  * (see m03), and rows stream through `decode` without materializing
  * the whole partition.
  */
class WavDecoder extends Serializable {
  def decode(payload: Array[Byte]): WavMeta = {
    require(payload.length >= 44, s"truncated payload: ${payload.length}B")
    val bb = java.nio.ByteBuffer.wrap(payload)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(off: Int, n: Int) = new String(payload, off, n, "US-ASCII")
    require(ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE" &&
      ascii(12, 4) == "fmt ", "not a RIFF/WAVE payload")
    def u16(off: Int): Long = (bb.getShort(off) & 0xffff).toLong
    def u32(off: Int): Long = bb.getInt(off) & 0xffffffffL
    val channels = u16(22)
    val rate = u32(24)
    val blockAlign = u16(32)
    val bits = u16(34)
    val dataBytes = u32(40)
    WavMeta(-1L, payload.length.toLong, channels, rate, bits, dataBytes,
      dataBytes / blockAlign * 1000L / rate)
  }
}

/** Multimodal columns: image/audio/video handled as opaque `binary`
  * columns with typed metadata. The decode step is a REAL container
  * parse — the RIFF/WAVE (PCM wav) header, a public format needing no
  * codec library — implemented twice on purpose: as codegen'd built-in
  * expressions over the binary column ([[wavMeta]], m01) and as a
  * per-partition JVM decoder ([[WavDecoder]], m03), the integration
  * shape a libjpeg/ffmpeg binding would use (payload DECOMPRESSION
  * stays out of scope — headers parse; sample data rides opaque).
  * The asset table wraps each document's bytes in a valid WAV container
  * ([[wavAssets]]) so both parsers run against real headers end-to-end.
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

  /** Little-endian encoders/decoders over binary columns — built-ins
    * only (hex/unhex/conv/substring), all inside whole-stage codegen.
    */
  private def le(x: Column, nBytes: Int): Column = {
    val h = lpad(hex(x), nBytes * 2, "0")
    unhex(concat((nBytes to 1 by -1).map(i =>
      substring(h, (i - 1) * 2 + 1, 2)): _*))
  }

  /** Unsigned little-endian integer at 1-based `offset` in a binary
    * column.
    */
  private def leUint(payload: Column, offset: Int, nBytes: Int): Column = {
    val h = hex(substring(payload, offset, nBytes))
    conv(concat((nBytes to 1 by -1).map(i =>
      substring(h, (i - 1) * 2 + 1, 2)): _*), 16, 10).cast("long")
  }

  private def asciiLit(sl: String): Column = lit(sl.getBytes("US-ASCII"))

  /** Fully-valid 24-bit BMPs built from the documents table (one per
    * doc; width/height derived from the id, pixel bytes the doc text
    * tiled to size). Shared by m08 (parse + verify) and m09 (scanline
    * extraction). All little-endian fields and the 4-byte row-padding
    * stride rule are real — a wrong stride breaks the content hashes.
    */
  private def bmpAssets(s: SparkSession, d: String): DataFrame = {
    val built = T.documents(s, d)
      .withColumn("_w", (pmod(col("doc_id"), lit(13)) + 4).cast("long"))
      .withColumn("_h", (pmod(col("doc_id"), lit(5)) + 3).cast("long"))
      // 24 bpp: rows pad to 4 bytes — floor((24w+31)/32)*4.
      .withColumn("_stride",
        (floor((col("_w") * 24 + 31) / 32) * 4).cast("long"))
      .withColumn("_img", col("_stride") * col("_h"))
      // Pixel bytes: the doc text tiled to the image size (ASCII, so
      // chars == bytes — m07 relies on the same property).
      .withColumn("_px", expr(
        "encode(substring(repeat(text, CAST(_img / length(text) + 1 " +
          "AS INT)), 1, CAST(_img AS INT)), 'UTF-8')"))
    built.select(col("doc_id").as("asset_id"),
      concat(
        asciiLit("BM"), le(col("_img") + 54, 4), le(lit(0L), 4),
        le(lit(54L), 4), // pixel-data offset
        le(lit(40L), 4), le(col("_w"), 4), le(col("_h"), 4),
        le(lit(1L), 2), le(lit(24L), 2), // planes, bpp
        le(lit(0L), 4), le(col("_img"), 4), // BI_RGB, image size
        le(lit(2835L), 4), le(lit(2835L), 4), // 72 dpi
        le(lit(0L), 4), le(lit(0L), 4),
        col("_px")).as("payload"))
  }

  /** Assets wrapped in a VALID canonical 44-byte-header PCM WAV
    * container: 8-bit samples (= the text bytes), channel count and
    * sample rate derived deterministically from the asset id. Every
    * field a RIFF parser reads (chunk sizes, byte rate, block align)
    * is genuinely consistent — any external WAV reader accepts these
    * payloads.
    */
  private def wavAssets(s: SparkSession, d: String): DataFrame = {
    val base = assets(s, d)
      .withColumn("_ch", (pmod(col("asset_id"), lit(2)) + 1).cast("long"))
      .withColumn("_rate", ((pmod(col("asset_id"), lit(3)) + 1) * 8000)
        .cast("long"))
      .withColumn("_ds", length(col("payload")).cast("long"))
    base.select(col("asset_id"), col("source"),
      concat(
        asciiLit("RIFF"), le(col("_ds") + 36, 4), asciiLit("WAVE"),
        asciiLit("fmt "), le(lit(16L), 4), le(lit(1L), 2),
        le(col("_ch"), 2), le(col("_rate"), 4),
        le(col("_rate") * col("_ch"), 4), // byte rate (8-bit samples)
        le(col("_ch"), 2), // block align
        le(lit(8L), 2), // bits per sample
        asciiLit("data"), le(col("_ds"), 4),
        col("payload")).as("payload"))
  }

  /** REAL decode: parse the RIFF/WAVE header fields out of the binary
    * column with codegen'd built-ins. Works on any canonical-layout
    * PCM WAV, not just [[wavAssets]]' output.
    */
  def wavMeta(payload: Column): Column = {
    val isWav = substring(payload, 1, 4) === asciiLit("RIFF") &&
      substring(payload, 9, 4) === asciiLit("WAVE") &&
      substring(payload, 13, 4) === asciiLit("fmt ")
    val blockAlign = leUint(payload, 33, 2)
    val rate = leUint(payload, 25, 4)
    val dataBytes = leUint(payload, 41, 4)
    struct(
      length(payload).cast("long").as("n_bytes"),
      when(isWav, lit("wav")).otherwise(lit("unknown")).as("format"),
      leUint(payload, 23, 2).as("channels"),
      rate.as("sample_rate"),
      leUint(payload, 35, 2).as("bits_per_sample"),
      dataBytes.as("data_bytes"),
      floor(floor(dataBytes / blockAlign) * 1000L / rate)
        .cast("long").as("duration_ms"))
  }

  val all: Seq[GQuery] = Seq(

    // ---------------------------------------------------------------- m01
    // Binary column + typed metadata extraction: a REAL RIFF/WAVE
    // header parse over the binary column, one scan, per-row codegen'd
    // expressions only. The oracle reproduces every parsed field from
    // the deterministic container construction — so a parser bug
    // (wrong offset, wrong endianness) hash-fails the gate.
    GQuery("m01_binary_meta", (s, d) => {
      wavAssets(s, d)
        .withColumn("meta", wavMeta(col("payload")))
        .select(col("asset_id"), col("source"),
          col("meta.n_bytes").as("n_bytes"),
          col("meta.format").as("format"),
          col("meta.channels").as("channels"),
          col("meta.sample_rate").as("sample_rate"),
          col("meta.bits_per_sample").as("bits_per_sample"),
          col("meta.data_bytes").as("data_bytes"),
          col("meta.duration_ms").as("duration_ms"))
        .orderBy(col("asset_id"))
    }, Some("""
      SELECT doc_id AS asset_id, source,
             CAST(44 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
             'wav' AS format,
             CAST(1 + doc_id % 2 AS BIGINT) AS channels,
             CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
             CAST(8 AS BIGINT) AS bits_per_sample,
             CAST(octet_length(encode(text)) AS BIGINT) AS data_bytes,
             CAST((octet_length(encode(text)) // (1 + doc_id % 2)) * 1000
                  // (8000 * (1 + doc_id % 3)) AS BIGINT) AS duration_ms
      FROM documents ORDER BY asset_id""")),

    // ---------------------------------------------------------------- m02
    // Frame sampling: treat the payload as fixed-size frames (FrameBytes
    // each) and take every Stride-th frame. The plan explodes sampled
    // frame indices, then slices the payload — output is k rows per
    // asset with (frame_no, frame_bytes, frame_hash). Here "frames"
    // are raw byte slices — a payload-agnostic windowing primitive;
    // the REAL video path (MJPEG-AVI container walk + full JPEG decode
    // of sampled frames) is m17.
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
    // for a heavier codec: the decoder is constructed ONCE per
    // partition (codec/JNI init amortized over the batch), rows stream
    // through it with no full-partition materialization, and the
    // output is a typed Dataset downstream relational ops consume
    // directly. The decoder is the REAL ByteBuffer RIFF parser — an
    // implementation independent of m01's expression parser; the two
    // cross-check in MultimodalSpec — and the oracle checks the parsed
    // values. This is the Scala analog of a batched pandas-UDF decode.
    GQuery("m03_batch_decode", (s, d) => {
      import s.implicits._
      val raw = Scale.widen(wavAssets(s, d), col("asset_id"))
        .select(col("asset_id"), col("payload"))
        .as[RawAsset]
      raw.mapPartitions { it =>
        val decoder = new WavDecoder // once per partition, not per row
        it.map(a => decoder.decode(a.payload).copy(asset_id = a.asset_id))
      }.toDF()
        .orderBy(col("asset_id"))
    }, Some("""
      SELECT doc_id AS asset_id,
             CAST(44 + octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST(1 + doc_id % 2 AS BIGINT) AS channels,
             CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS sample_rate,
             CAST(8 AS BIGINT) AS bits_per_sample,
             CAST(octet_length(encode(text)) AS BIGINT) AS data_bytes,
             CAST((octet_length(encode(text)) // (1 + doc_id % 2)) * 1000
                  // (8000 * (1 + doc_id % 3)) AS BIGINT) AS duration_ms
      FROM documents ORDER BY asset_id""")),

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
    ,

    // ---------------------------------------------------------------- m07
    // Audio windowing: slice each WAV's data section into overlapping
    // fixed-duration windows (20 ms windows, 10 ms stride — the
    // speech-frame shape every audio feature extractor consumes),
    // computed ENTIRELY from the parsed header: the REAL wavMeta
    // decode supplies channels / sample rate / data size, and window
    // byte ranges follow from block-align arithmetic. The plan is one
    // scan → sequence+explode → byte slices; embarrassingly parallel,
    // no shuffle but the presentation sort. Chunk content is
    // hash-checked (md5 of the exact byte slice), so an off-by-one in
    // the offset math fails the gate, not just the counts.
    GQuery("m07_audio_windows", (s, d) => {
      val parsed = wavAssets(s, d)
        .withColumn("m", wavMeta(col("payload")))
        .withColumn("ch", col("m.channels"))
        .withColumn("rate", col("m.sample_rate"))
        .withColumn("db", col("m.data_bytes"))
        .filter(col("db") > 0)
        // 10 ms stride / 20 ms window, in bytes (8-bit samples):
        // rate*ch/100 is integral for all supported rates.
        .withColumn("stride", (col("rate") * col("ch") / 100).cast("long"))
        .withColumn("win", (col("rate") * col("ch") / 50).cast("long"))
      parsed
        .withColumn("k", explode(sequence(lit(0L),
          floor((col("db") - 1) / col("stride")).cast("long"))))
        .withColumn("off", col("k") * col("stride"))
        .withColumn("len", least(col("win"), col("db") - col("off")))
        .select(col("asset_id"), col("source"),
          col("k").as("chunk_no"),
          col("off").as("off_bytes"),
          col("len").as("chunk_bytes"),
          floor(floor(col("len") / col("ch")) * 1000 / col("rate"))
            .cast("long").as("chunk_ms"),
          md5(expr("substring(payload, CAST(45 + off AS INT), " +
            "CAST(len AS INT))")).as("chunk_md5"))
        .orderBy(col("asset_id"), col("chunk_no"))
    }, Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, source, text,
               CAST(1 + doc_id % 2 AS BIGINT) AS ch,
               CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS rate,
               CAST(octet_length(encode(text)) AS BIGINT) AS db
        FROM documents WHERE octet_length(encode(text)) > 0),
      c AS (
        SELECT asset_id, source, text, ch, rate, db,
               CAST(rate * ch / 100 AS BIGINT) AS stride,
               CAST(rate * ch / 50 AS BIGINT) AS win,
               unnest(range(0, CAST(FLOOR((db - 1)
                 / CAST(rate * ch / 100 AS BIGINT)) AS BIGINT) + 1)) AS k
        FROM a)
      SELECT asset_id, source, CAST(k AS BIGINT) AS chunk_no,
             CAST(k * stride AS BIGINT) AS off_bytes,
             CAST(LEAST(win, db - k * stride) AS BIGINT) AS chunk_bytes,
             CAST(FLOOR(FLOOR(LEAST(win, db - k * stride) / ch) * 1000
               / rate) AS BIGINT) AS chunk_ms,
             md5(substring(text, CAST(k * stride + 1 AS INT),
               CAST(LEAST(win, db - k * stride) AS INT))) AS chunk_md5
      FROM c ORDER BY asset_id, chunk_no""")),

    // ---------------------------------------------------------------- m08
    // Second REAL container format: BMP (BITMAPFILEHEADER +
    // BITMAPINFOHEADER, 24-bit uncompressed). Assets are built as
    // fully-valid BMPs — magic, little-endian sizes, the 4-byte row
    // padding rule — then parsed back field by field with the same
    // codegen'd byte readers the WAV path uses. The pixel block is
    // md5-checked against the oracle's reconstruction, so a wrong
    // stride (the classic BMP bug) fails the hash, not just a count.
    // One scan, zero shuffle beyond the presentation sort.
    GQuery("m08_bmp_decode", (s, d) => {
      val bmp = bmpAssets(s, d)
      val isBmp = substring(col("payload"), 1, 2) === asciiLit("BM") &&
        leUint(col("payload"), 15, 4) === 40L
      val w = leUint(col("payload"), 19, 4)
      val h = leUint(col("payload"), 23, 4)
      val bpp = leUint(col("payload"), 29, 2)
      val stride = (floor((bpp * w + 31) / 32) * 4).cast("long")
      val off = leUint(col("payload"), 11, 4)
      bmp
        .withColumn("off_", off + 1) // 1-based slice start of pixel data
        .withColumn("img_", stride * h)
        .select(col("asset_id"),
          when(isBmp, lit("bmp")).otherwise(lit("unknown")).as("format"),
          w.as("width"), h.as("height"), bpp.as("bpp"),
          stride.as("row_stride"),
          col("img_").as("img_bytes"),
          (leUint(col("payload"), 3, 4) ===
            length(col("payload")).cast("long")).as("size_ok"),
          md5(expr("substring(payload, CAST(off_ AS INT), " +
            "CAST(img_ AS INT))")).as("pixel_md5"))
        .orderBy(col("asset_id"))
    }, Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, text,
               CAST(4 + doc_id % 13 AS BIGINT) AS w,
               CAST(3 + doc_id % 5 AS BIGINT) AS h
        FROM documents),
      b AS (
        SELECT *, CAST(FLOOR((24 * w + 31) / 32) * 4 AS BIGINT) AS stride
        FROM a)
      SELECT asset_id, 'bmp' AS format, w AS width, h AS height,
             CAST(24 AS BIGINT) AS bpp, stride AS row_stride,
             CAST(stride * h AS BIGINT) AS img_bytes,
             TRUE AS size_ok,
             md5(substring(repeat(text,
                   CAST(stride * h / length(text) + 1 AS INT)),
                 1, CAST(stride * h AS INT))) AS pixel_md5
      FROM b ORDER BY asset_id""")),

    // ---------------------------------------------------------------- m09
    // Scanline extraction — 2-D pixel addressing from the REAL parsed
    // header: BMP stores rows BOTTOM-UP, so screen row y lives at
    // offset + (h−1−y)·stride, and each row's PIXEL bytes (3w — the
    // stride padding excluded) are hash-checked against the oracle's
    // reconstruction. Wrong stride, wrong origin, or off-by-one
    // padding all fail the md5, not just a count. One scan, explode by
    // image height, zero shuffle beyond the presentation sort.
    GQuery("m09_bmp_scanlines", (s, d) => {
      bmpAssets(s, d)
        .withColumn("w", leUint(col("payload"), 19, 4))
        .withColumn("h", leUint(col("payload"), 23, 4))
        .withColumn("bpp", leUint(col("payload"), 29, 2))
        .withColumn("stride",
          (floor((col("bpp") * col("w") + 31) / 32) * 4).cast("long"))
        .withColumn("off", leUint(col("payload"), 11, 4))
        .withColumn("row_y", explode(sequence(lit(0L), col("h") - 1)))
        .withColumn("row_off",
          col("off") + (col("h") - 1 - col("row_y")) * col("stride"))
        .select(col("asset_id"), col("row_y"), col("row_off"),
          md5(expr("substring(payload, CAST(row_off + 1 AS INT), " +
            "CAST(3 * w AS INT))")).as("row_md5"))
        .orderBy(col("asset_id"), col("row_y"))
    }, Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, text,
               CAST(4 + doc_id % 13 AS BIGINT) AS w,
               CAST(3 + doc_id % 5 AS BIGINT) AS h
        FROM documents),
      b AS (
        SELECT *, CAST(FLOOR((24 * w + 31) / 32) * 4 AS BIGINT) AS stride
        FROM a),
      r AS (
        SELECT asset_id, w, h, stride, text,
               unnest(range(0, h)) AS row_y
        FROM b)
      SELECT asset_id, row_y,
             CAST(54 + (h - 1 - row_y) * stride AS BIGINT) AS row_off,
             md5(substring(repeat(text,
                   CAST(stride * h / length(text) + 1 AS INT)),
                 CAST((h - 1 - row_y) * stride + 1 AS INT),
                 CAST(3 * w AS INT))) AS row_md5
      FROM r ORDER BY asset_id, row_y""")),

    // ---------------------------------------------------------------- m10
    // Per-window audio FEATURES over m07's speech frames: sample sum,
    // DC-removed energy and zero-crossing count per 20 ms window —
    // the canonical VAD/speech-feature triple. All math is INTEGER
    // (energy is computed on n·s_i − Σs, i.e. mean-removed scaled by
    // n, so no float ever appears) — which is what makes a full
    // hash oracle possible. The plan is one scan → explode → ONE fused
    // native expression (FastVector.AudioFeatures, doGenCode) that
    // computes all three features in O(n) directly over the byte
    // slice — the earlier higher-order-function form paid O(n²) in
    // per-character `substring` walks (13.4 s at sf0.1; now sub-second).
    // Embarrassingly parallel, no shuffle but the presentation sort —
    // the 100 TB shape for per-asset feature extraction. Multi-channel
    // interleave is treated as one stream (declared simplification).
    // 8-bit PCM samples ARE the ASCII payload bytes (the wavAssets
    // construction), so the byte domain equals the oracle's char domain.
    GQuery("m10_audio_features", (s, d) => {
      wavAssets(s, d)
        .withColumn("m", wavMeta(col("payload")))
        .withColumn("ch", col("m.channels"))
        .withColumn("rate", col("m.sample_rate"))
        .withColumn("db", col("m.data_bytes"))
        .filter(col("db") > 0)
        .withColumn("stride", (col("rate") * col("ch") / 100).cast("long"))
        .withColumn("win", (col("rate") * col("ch") / 50).cast("long"))
        .withColumn("k", explode(sequence(lit(0L),
          floor((col("db") - 1) / col("stride")).cast("long"))))
        .withColumn("off", col("k") * col("stride"))
        .withColumn("len", least(col("win"), col("db") - col("off")))
        // Sample data starts after the 44-byte RIFF/fmt/data header.
        .withColumn("f", graft.functions.FastVector.audioFeatures(
          col("payload"), lit(44L) + col("off"), col("len").cast("int")))
        .select(col("asset_id"), col("k").as("chunk_no"),
          col("len").as("n_samples"),
          col("f.sum_bytes").as("sum_bytes"),
          col("f.energy_scaled").as("energy_scaled"),
          col("f.zero_crossings").as("zero_crossings"))
        .orderBy(col("asset_id"), col("chunk_no"))
    }, Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, text,
               CAST(1 + doc_id % 2 AS BIGINT) AS ch,
               CAST(8000 * (1 + doc_id % 3) AS BIGINT) AS rate,
               CAST(octet_length(encode(text)) AS BIGINT) AS db
        FROM documents WHERE octet_length(encode(text)) > 0),
      c AS (
        SELECT asset_id, text, db,
               CAST(rate * ch / 100 AS BIGINT) AS stride,
               CAST(rate * ch / 50 AS BIGINT) AS win,
               unnest(range(0, CAST(FLOOR((db - 1)
                 / CAST(rate * ch / 100 AS BIGINT)) AS BIGINT) + 1)) AS k
        FROM a),
      w AS (
        SELECT asset_id, CAST(k AS BIGINT) AS chunk_no,
               CAST(LEAST(win, db - k * stride) AS BIGINT) AS n,
               substring(text, CAST(k * stride + 1 AS INT),
                 CAST(LEAST(win, db - k * stride) AS INT)) AS wtxt
        FROM c),
      s AS (
        SELECT asset_id, chunk_no, n,
               list_transform(range(1, CAST(n AS INT) + 1),
                 i -> CAST(ascii(substring(wtxt, CAST(i AS INT), 1))
                   AS BIGINT)) AS samples
        FROM w),
      t AS (
        SELECT asset_id, chunk_no, n, samples,
               CAST(list_aggregate(samples, 'sum') AS BIGINT) AS sum_bytes
        FROM s),
      u AS (
        SELECT asset_id, chunk_no, n, sum_bytes,
               list_transform(samples, x -> x * n - sum_bytes) AS cent
        FROM t)
      SELECT asset_id, chunk_no, n AS n_samples, sum_bytes,
             CAST(list_aggregate(list_transform(cent, x -> x * x), 'sum')
               AS BIGINT) AS energy_scaled,
             CAST(len(list_filter(range(1, CAST(n AS INT)),
               i -> cent[i] * cent[i + 1] < 0)) AS BIGINT)
               AS zero_crossings
      FROM u ORDER BY asset_id, chunk_no""")),

    // ---------------------------------------------------------------- m11
    // Region CROP from the parsed BMP: the center w/2 × h/2 window,
    // addressed through the real header fields (bottom-up origin,
    // stride padding, 3-byte pixels, x-offset inside the scanline) —
    // the preprocessing step every vision pipeline runs before
    // resize. Per-row crop bytes are md5-checked against the oracle's
    // reconstruction, so any error in the 2-D arithmetic (origin,
    // stride, x0 scaling by pixel width) fails the hash. One scan,
    // explode by crop height, no shuffle but the presentation sort.
    GQuery("m11_bmp_crop", (s, d) => {
      bmpAssets(s, d)
        .withColumn("w", leUint(col("payload"), 19, 4))
        .withColumn("h", leUint(col("payload"), 23, 4))
        .withColumn("bpp", leUint(col("payload"), 29, 2))
        .withColumn("stride",
          (floor((col("bpp") * col("w") + 31) / 32) * 4).cast("long"))
        .withColumn("off", leUint(col("payload"), 11, 4))
        .withColumn("cw", greatest(lit(1L),
          floor(col("w") / 2).cast("long")))
        .withColumn("chh", greatest(lit(1L),
          floor(col("h") / 2).cast("long")))
        .withColumn("x0", floor((col("w") - col("cw")) / 2).cast("long"))
        .withColumn("y0", floor((col("h") - col("chh")) / 2).cast("long"))
        .withColumn("cy", explode(sequence(lit(0L), col("chh") - 1)))
        .withColumn("row_y", col("y0") + col("cy"))
        .withColumn("row_off", col("off") +
          (col("h") - 1 - col("row_y")) * col("stride") +
          col("x0") * 3)
        .select(col("asset_id"), col("cy"), col("x0"), col("row_y"),
          md5(expr("substring(payload, CAST(row_off + 1 AS INT), " +
            "CAST(3 * cw AS INT))")).as("crop_md5"))
        .orderBy(col("asset_id"), col("cy"))
    }, Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, text,
               CAST(4 + doc_id % 13 AS BIGINT) AS w,
               CAST(3 + doc_id % 5 AS BIGINT) AS h
        FROM documents),
      b AS (
        SELECT *, CAST(FLOOR((24 * w + 31) / 32) * 4 AS BIGINT) AS stride,
               GREATEST(1, CAST(FLOOR(w / 2) AS BIGINT)) AS cw,
               GREATEST(1, CAST(FLOOR(h / 2) AS BIGINT)) AS chh
        FROM a),
      c AS (
        SELECT *, CAST(FLOOR((w - cw) / 2) AS BIGINT) AS x0,
               CAST(FLOOR((h - chh) / 2) AS BIGINT) AS y0
        FROM b),
      r AS (
        SELECT asset_id, text, w, h, stride, cw, x0, y0,
               unnest(range(0, chh)) AS cy
        FROM c)
      SELECT asset_id, CAST(cy AS BIGINT) AS cy, x0,
             CAST(y0 + cy AS BIGINT) AS row_y,
             md5(substring(repeat(text,
                   CAST(stride * h / length(text) + 1 AS INT)),
                 CAST((h - 1 - (y0 + cy)) * stride + 3 * x0 + 1 AS INT),
                 CAST(3 * cw AS INT))) AS crop_md5
      FROM r ORDER BY asset_id, cy""")),

    // ---------------------------------------------------------------- m12
    // PNG container parse — the BIG-endian complement of m08's BMP
    // (LE) and m07's RIFF (LE): signature check, IHDR field reads
    // (width/height/bit-depth/color-type as network-order uint32s),
    // chunk-length walk to the IDAT payload, REAL CRC-32 verification
    // of the IHDR chunk (Spark's codegen'd crc32 over type+data versus
    // the stored checksum — flip any header byte and crc_ok goes
    // false), and a whole-file size identity from the chunk lengths.
    // IDAT carries the doc bytes raw here because the container
    // algebra alone is what's under test; the REAL zlib+filter codec
    // path is m13 (functions/Png.scala — no stub remains).
    // One scan, one codegen'd projection, no shuffle.
    GQuery("m12_png_header", (s, d) => {
      def beU(off: Int, n: Int) =
        conv(hex(substring(col("payload"), off, n)), 16, 10).cast("long")
      val sigOk = substring(col("payload"), 1, 8) ===
        unhex(lit("89504E470D0A1A0A"))
      val typeOk = substring(col("payload"), 13, 4) === asciiLit("IHDR")
      val ihdrCrcOk = beU(30, 4) ===
        crc32(substring(col("payload"), 13, 17))
      pngAssets(s, d)
        .withColumn("idat_len", beU(34, 4))
        .select(col("asset_id"),
          when(sigOk && typeOk, lit("png")).otherwise(lit("unknown"))
            .as("format"),
          beU(17, 4).as("width"), beU(21, 4).as("height"),
          beU(25, 1).as("bit_depth"), beU(26, 1).as("color_type"),
          col("idat_len"),
          md5(expr("substring(payload, 42, CAST(idat_len AS INT))"))
            .as("idat_md5"),
          ihdrCrcOk.as("ihdr_crc_ok"),
          (length(col("payload")).cast("long") ===
            col("idat_len") + 57).as("size_ok"))
        .orderBy(col("asset_id"))
    }, Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, text,
               CAST(2 + doc_id % 17 AS BIGINT) AS w,
               CAST(2 + doc_id % 7 AS BIGINT) AS h
        FROM documents)
      SELECT asset_id, 'png' AS format, w AS width, h AS height,
             CAST(8 AS BIGINT) AS bit_depth, CAST(2 AS BIGINT) AS color_type,
             CAST(w * h AS BIGINT) AS idat_len,
             md5(substring(repeat(text, CAST(w * h / length(text) + 1 AS INT)),
                 1, CAST(w * h AS INT))) AS idat_md5,
             TRUE AS ihdr_crc_ok, TRUE AS size_ok
      FROM a ORDER BY asset_id""")),

    // ---------------------------------------------------------------- m13
    // REAL PNG pixel decode — the un-stubbing of the one media-codec
    // step m12's contract declared out of scope. Assets are COMPLETE
    // real truecolor PNGs (functions/Png.scala): scanlines filtered
    // with all five spec filter types (y % 5 → None/Sub/Up/Average/
    // Paeth), zlib-deflated via the JVM's java.util.zip, split across
    // multiple IDAT chunks as real encoders do. The query runs the
    // full decode — CRC-verified chunk walk, IDAT concatenation,
    // Inflater pass, per-row unfilter — and md5s the reconstructed
    // pixel stream against the oracle's independent tiling of the doc
    // text, so a wrong Paeth tie-break, a filter-byte off-by-one, or
    // a bad stride fails the hash. PngSpec additionally decodes
    // javax.imageio-encoded PNGs (an independent encoder) to pin the
    // codec beyond self-roundtrip. One scan, two codegen'd scalar
    // calls per row, zero shuffle beyond the presentation sort — the
    // 100 TB shape for corpus-wide image decode.
    GQuery("m13_png_pixels", (s, d) => {
      pngRealAssets(s, d)
        .withColumn("dec", graft.functions.Png.decode(col("payload")))
        .select(col("asset_id"),
          col("dec.width").as("width"), col("dec.height").as("height"),
          col("dec.bit_depth").as("bit_depth"),
          col("dec.color_type").as("color_type"),
          length(col("dec.pixels")).cast("long").as("n_pixel_bytes"),
          md5(col("dec.pixels")).as("pixel_md5"))
        .orderBy(col("asset_id"))
    }, Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, text,
               CAST(8 + doc_id % 24 AS BIGINT) AS w,
               CAST(6 + doc_id % 10 AS BIGINT) AS h
        FROM documents)
      SELECT asset_id, w AS width, h AS height,
             CAST(8 AS BIGINT) AS bit_depth,
             CAST(2 AS BIGINT) AS color_type,
             CAST(w * h * 3 AS BIGINT) AS n_pixel_bytes,
             md5(substring(repeat(text,
                   CAST(w * h * 3 / length(text) + 1 AS INT)),
                 1, CAST(w * h * 3 AS INT))) AS pixel_md5
      FROM a ORDER BY asset_id""")),

    // ---------------------------------------------------------------- m14
    // Real-pixel feature extraction THROUGH the decode path: m13's
    // full PNG decode (inflate + unfilter) feeds a 2-D average pool —
    // 2×2 spatial × RGB grid, the thumbnail/feature op a multimodal
    // pipeline runs after decode (m04 pools the RAW payload; this
    // pools actual decoded pixels with true 2-D addressing). Cell
    // sums are integer-exact (one codegen'd expression, Png.pool);
    // per-cell pixel counts come from the ceil-half formula on the
    // Spark side and COUNT(*) on the oracle side — an intentional
    // cross-derivation: a wrong half-split formula hash-fails. One
    // scan, two codegen'd calls + a 12-row posexplode per asset, no
    // shuffle beyond the presentation sort.
    GQuery("m14_png_pooled_features", (s, d) => {
      val halfY = ((col("h") + 1) / 2).cast("long")
      val halfX = ((col("w") + 1) / 2).cast("long")
      val gy = (col("cell") / 6).cast("long")
      val gx = (pmod(col("cell"), lit(6)) / 3).cast("long")
      pngRealAssets(s, d)
        .withColumn("dec", graft.functions.Png.decode(col("payload")))
        .select(col("asset_id"), col("dec.width").as("w"),
          col("dec.height").as("h"),
          posexplode(graft.functions.Png.pool(col("dec.pixels"),
            col("dec.width"), col("dec.height")))
            .as(Seq("cell", "px_sum")))
        .withColumn("n_px",
          when(gy === 0, halfY).otherwise(col("h") - halfY) *
            when(gx === 0, halfX).otherwise(col("w") - halfX))
        .select(col("asset_id"), col("w").as("width"),
          col("h").as("height"), col("cell").cast("long").as("cell"),
          col("px_sum"), col("n_px"),
          round(col("px_sum") / col("n_px"), 4).as("avg_byte"))
        .orderBy(col("asset_id"), col("cell"))
    }, Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, text,
               CAST(8 + doc_id % 24 AS BIGINT) AS w,
               CAST(6 + doc_id % 10 AS BIGINT) AS h
        FROM documents),
      px AS (
        SELECT asset_id, w, h, p,
               ord(substr(repeat(text,
                     CAST(w * h * 3 / length(text) + 1 AS INT)),
                   CAST(p + 1 AS INT), 1)) AS b
        FROM a, LATERAL unnest(range(0, w * h * 3)) t(p)),
      c AS (
        SELECT asset_id, w, h, b,
               ((p // (3 * w)) * 2 // h * 2
                 + ((p % (3 * w)) // 3) * 2 // w) * 3 + p % 3 AS cell
        FROM px)
      SELECT asset_id, w AS width, h AS height,
             CAST(cell AS BIGINT) AS cell,
             CAST(SUM(b) AS BIGINT) AS px_sum,
             COUNT(*) AS n_px,
             ROUND(SUM(b) / COUNT(*), 4) AS avg_byte
      FROM c GROUP BY asset_id, w, h, cell
      ORDER BY asset_id, cell""")),

    // ---------------------------------------------------------------- m15
    // REAL JPEG decode — the dominant crawl image format, closing the
    // media-codec surface (PNG/BMP/WAV are already real): assets are
    // complete baseline JFIF files (functions/Jpeg.scala — FDCT,
    // Annex-K quantization at quality 92, Huffman entropy coding) and
    // the query runs the full decode (marker walk, canonical Huffman
    // reconstruction, dequant, IDCT, YCbCr→RGB). JPEG is LOSSY, so
    // unlike m13's md5-exact PNG contract the oracle pins the sketch-
    // contract shape (the q29/q30 law): structural fields the oracle
    // derives independently (dims from the size formula, MCU count
    // from the 8×8 grid) hash exactly, and two bound booleans assert
    // (a) per-channel mean drift vs the pre-encode source ≤ 2 counts
    // (DC coefficients quantize lightly at q92, so means survive) and
    // (b) max per-channel disagreement with the JDK's independent
    // libjpeg-derived decoder ≤ 4 counts (IDCT/rounding internals
    // only) — a decoder bug hash-fails the gate through the booleans.
    // One scan, codegen'd per-row expressions, no shuffle beyond the
    // presentation sort — the corpus-wide decode shape. (The ImageIO
    // cross-decode column is contract machinery; the production path
    // is the graft decode alone.)
    GQuery("m15_jpeg_decode", (s, d) => {
      val wh = col("w") * col("h")
      def chanSum(pool: Column, ch: Int): Column =
        element_at(pool, ch + 1) + element_at(pool, ch + 4) +
          element_at(pool, ch + 7) + element_at(pool, ch + 10)
      val meanErrOk = (0 to 2).map { ch =>
        abs(chanSum(col("src_pool"), ch) - chanSum(col("dec_pool"), ch)) <=
          wh * 2.0
      }.reduce(_ && _)
      jpegAssets(s, d)
        .withColumn("dec", graft.functions.Jpeg.decode(col("payload")))
        .withColumn("src_pool",
          graft.functions.Png.pool(col("_px"), col("w"), col("h")))
        .withColumn("dec_pool",
          graft.functions.Png.pool(col("dec.pixels"), col("w"), col("h")))
        .select(col("asset_id"),
          col("dec.width").as("width"), col("dec.height").as("height"),
          col("dec.n_comp").as("n_comp"), col("dec.n_mcus").as("n_mcus"),
          meanErrOk.as("mean_err_ok"),
          (graft.functions.Jpeg.imageioDiff(col("payload")) <= 4)
            .as("imageio_ok"))
        .orderBy(col("asset_id"))
    }, Some("""
      WITH a AS (
        SELECT doc_id AS asset_id,
               CAST(16 + doc_id % 17 AS BIGINT) AS w,
               CAST(12 + doc_id % 11 AS BIGINT) AS h
        FROM documents)
      SELECT asset_id, w AS width, h AS height,
             CAST(3 AS BIGINT) AS n_comp,
             CAST(((w + 7) // 8) * ((h + 7) // 8) AS BIGINT) AS n_mcus,
             TRUE AS mean_err_ok, TRUE AS imageio_ok
      FROM a ORDER BY asset_id""")),

    // ---------------------------------------------------------------- m16
    // Pooled features THROUGH the JPEG decode path — m14's 2×2×RGB
    // average pool over pixels that crossed a LOSSY codec. Encoded at
    // quality 100 (quantization steps ≈1: the roundtrip error is the
    // DCT arithmetic itself, measured ≤3 per sample), so the per-cell
    // decoded average must sit within 2 counts of the SOURCE average
    // — which both engines compute EXACTLY (integer byte sums of the
    // deterministic text tiling: Spark pools the pre-encode buffer,
    // DuckDB replays the tiling with m14's 2-D cell addressing). The
    // exact fields (cell, n_px, src_sum) hash bit-for-bit; the
    // boolean pins the decode. One scan, codegen'd expressions, a
    // 12-row posexplode per asset, no shuffle beyond the sort.
    GQuery("m16_jpeg_pooled_features", (s, d) => {
      val halfY = ((col("h") + 1) / 2).cast("long")
      val halfX = ((col("w") + 1) / 2).cast("long")
      val gy = (col("cell") / 6).cast("long")
      val gx = (pmod(col("cell"), lit(6)) / 3).cast("long")
      jpegAssets(s, d, quality = 100)
        .withColumn("dec", graft.functions.Jpeg.decode(col("payload")))
        .select(col("asset_id"), col("w"), col("h"),
          posexplode(arrays_zip(
            graft.functions.Png.pool(col("_px"), col("w"), col("h")),
            graft.functions.Png.pool(col("dec.pixels"), col("w"), col("h"))))
            .as(Seq("cell", "sums")))
        .withColumn("n_px",
          when(gy === 0, halfY).otherwise(col("h") - halfY) *
            when(gx === 0, halfX).otherwise(col("w") - halfX))
        .select(col("asset_id"), col("w").as("width"),
          col("h").as("height"), col("cell").cast("long").as("cell"),
          col("sums.0").as("src_sum"), col("n_px"),
          (abs(col("sums.0") - col("sums.1")) <= col("n_px") * 2.0)
            .as("dec_avg_ok"))
        .orderBy(col("asset_id"), col("cell"))
    }, Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, text,
               CAST(16 + doc_id % 17 AS BIGINT) AS w,
               CAST(12 + doc_id % 11 AS BIGINT) AS h
        FROM documents),
      px AS (
        SELECT asset_id, w, h, p,
               ord(substr(repeat(text,
                     CAST(w * h * 3 / length(text) + 1 AS INT)),
                   CAST(p + 1 AS INT), 1)) AS b
        FROM a, LATERAL unnest(range(0, w * h * 3)) t(p)),
      c AS (
        SELECT asset_id, w, h, b,
               ((p // (3 * w)) * 2 // h * 2
                 + ((p % (3 * w)) // 3) * 2 // w) * 3 + p % 3 AS cell
        FROM px)
      SELECT asset_id, w AS width, h AS height,
             CAST(cell AS BIGINT) AS cell,
             CAST(SUM(b) AS BIGINT) AS src_sum,
             COUNT(*) AS n_px,
             TRUE AS dec_avg_ok
      FROM c GROUP BY asset_id, w, h, cell
      ORDER BY asset_id, cell""")),

    // ---------------------------------------------------------------- m17
    // REAL video frame sampling — MJPEG-in-AVI through the real codec
    // stack, retiring m02's byte-window stand-in as the last synthetic
    // media surface (m02 stays registered: payload-agnostic window
    // sampling is its own useful primitive). Assets are complete AVI
    // files (functions/Avi.scala): RIFF container, avih/strh/strf
    // headers, a movi LIST of 00dc chunks each holding a full JFIF
    // frame from the in-repo JPEG encoder, and a standard idx1 index.
    // The query is the video shape of a training pipeline: parse the
    // container (one header read), sample every 2nd frame, decode ONLY
    // the sampled frames (the point of frame sampling — cost scales
    // with frames KEPT, not frames stored), and emit per-frame decode
    // contracts. Exact fields the oracle derives independently
    // (n_frames and duration from the size formula vs the avih header
    // + idx1 count — a writer/parser disagreement hash-fails), plus
    // the m15 lossy-decode boolean per frame (per-channel mean ≤ 2
    // counts vs that frame's SOURCE pixels, which differ per frame by
    // construction). One scan, codegen'd expressions end-to-end, no
    // shuffle beyond the presentation sort.
    GQuery("m17_mjpeg_frames", (s, d) => {
      val flen = col("w") * col("h") * lit(3L)
      def chanSum(pool: Column, ch: Int): Column =
        element_at(pool, ch + 1) + element_at(pool, ch + 4) +
          element_at(pool, ch + 7) + element_at(pool, ch + 10)
      val meanErrOk = (0 to 2).map { ch =>
        abs(chanSum(col("src_pool"), ch) - chanSum(col("dec_pool"), ch)) <=
          col("w") * col("h") * 2.0
      }.reduce(_ && _)
      aviAssets(s, d)
        .withColumn("vmeta", graft.functions.Avi.meta(col("payload")))
        .withColumn("frame_no",
          explode(sequence(lit(0L), col("vmeta.n_frames") - 1, lit(2L))))
        .withColumn("jpeg",
          graft.functions.Avi.frame(col("payload"), col("frame_no")))
        .withColumn("dec", graft.functions.Jpeg.decode(col("jpeg")))
        .withColumn("src_pool", graft.functions.Png.pool(
          expr("substring(_px, CAST(frame_no * (w*h*3) + 1 AS INT), " +
            "CAST(w*h*3 AS INT))"), col("w"), col("h")))
        .withColumn("dec_pool", graft.functions.Png.pool(
          col("dec.pixels"), col("w"), col("h")))
        .select(col("asset_id"), col("frame_no"),
          col("vmeta.n_frames").as("n_frames"),
          col("vmeta.duration_ms").as("duration_ms"),
          (col("vmeta.n_idx") === col("vmeta.n_frames")).as("idx_ok"),
          col("vmeta.handler").as("handler"),
          col("dec.width").as("width"), col("dec.height").as("height"),
          meanErrOk.as("mean_err_ok"))
        .orderBy(col("asset_id"), col("frame_no"))
    }, Some("""
      WITH a AS (
        SELECT doc_id AS asset_id,
               CAST(16 + doc_id % 9 AS BIGINT) AS w,
               CAST(12 + doc_id % 7 AS BIGINT) AS h,
               CAST(2 + doc_id % 4 AS BIGINT) AS nf
        FROM documents)
      SELECT asset_id, fno AS frame_no, nf AS n_frames,
             nf * 125 AS duration_ms, TRUE AS idx_ok,
             'MJPG' AS handler, w AS width, h AS height,
             TRUE AS mean_err_ok
      FROM a, LATERAL unnest(range(0, nf, 2)) t(fno)
      ORDER BY asset_id, frame_no""")),

    // ---------------------------------------------------------------- m18
    // REAL GIF decode — the third lossless web image format after PNG
    // (m13) and BMP (m08), completing the legacy-crawl codec set:
    // assets are complete GIF89a files (functions/Gif.scala — real
    // variable-width LZW with CLEAR/EOI and dictionary resets, 255-
    // byte sub-block framing, a 256-entry grayscale global palette so
    // the byte-per-pixel buffer round-trips losslessly), and the query
    // runs the full decode (container walk, sub-block de-framing, LZW
    // decompression). GIF is LOSSLESS, so the contract is m13's exact
    // law: the decoded index stream md5-matches the oracle's
    // independent re-derivation of the source bytes (text tiled to
    // w·h) — any LZW, framing, or palette bug hash-fails. GifSpec
    // additionally cross-validates against ImageIO both directions.
    // One scan, codegen'd per-row expressions, no shuffle beyond the
    // presentation sort — the corpus-wide decode shape.
    GQuery("m18_gif_pixels", (s, d) => {
      gifAssets(s, d)
        .withColumn("dec", graft.functions.Gif.decode(col("payload")))
        .select(col("asset_id"),
          col("dec.width").as("width"), col("dec.height").as("height"),
          col("dec.palette_size").as("palette_size"),
          col("dec.min_code_size").as("min_code_size"),
          length(col("dec.pixels")).cast("long").as("n_pixels"),
          md5(col("dec.pixels")).as("pixel_md5"))
        .orderBy(col("asset_id"))
    }, Some("""
      WITH a AS (
        SELECT doc_id AS asset_id, text,
               CAST(16 + doc_id % 25 AS BIGINT) AS w,
               CAST(10 + doc_id % 13 AS BIGINT) AS h
        FROM documents)
      SELECT asset_id, w AS width, h AS height,
             CAST(256 AS BIGINT) AS palette_size,
             CAST(8 AS BIGINT) AS min_code_size,
             CAST(w * h AS BIGINT) AS n_pixels,
             md5(substring(repeat(text,
                   CAST(w * h / length(text) + 1 AS INT)),
                 1, CAST(w * h AS INT))) AS pixel_md5
      FROM a ORDER BY asset_id"""))
  )

  /** COMPLETE real PNGs built from the documents table: the pixel
    * buffer is the doc text tiled to w·h·3 RGB bytes (ASCII corpus,
    * so chars == bytes — the same property m07/m08 rely on), encoded
    * by [[graft.functions.PngRuntime.encode]] with real filtering,
    * real zlib, multiple IDAT chunks and real CRC-32s. Unlike
    * [[pngAssets]] (raw-IDAT container-algebra fixtures for m12),
    * these are valid PNGs any external decoder accepts.
    */
  private[graft] def pngRealAssets(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .withColumn("_w", (pmod(col("doc_id"), lit(24)) + 8).cast("long"))
      .withColumn("_h", (pmod(col("doc_id"), lit(10)) + 6).cast("long"))
      .withColumn("_plen", col("_w") * col("_h") * 3)
      .withColumn("_px", expr(
        "encode(substring(repeat(text, CAST(_plen / length(text) + 1 " +
          "AS INT)), 1, CAST(_plen AS INT)), 'UTF-8')"))
      .select(col("doc_id").as("asset_id"),
        graft.functions.Png.encode(col("_px"), col("_w"), col("_h"))
          .as("payload"))

  /** COMPLETE real GIF89a files built from the documents table: the
    * pixel buffer is the doc text tiled to w·h byte-per-pixel indices
    * (the m13 law — the oracle re-derives the SOURCE bytes exactly),
    * encoded by [[graft.functions.GifRuntime.encode]] with real LZW
    * and a grayscale identity palette, so the round-trip is lossless.
    */
  private[graft] def gifAssets(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      // one-row-group gate parquet would serialize the per-row LZW
      // work onto one thread (the jpegAssets note); spread it first
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("_w", (pmod(col("doc_id"), lit(25)) + 16).cast("long"))
      .withColumn("_h", (pmod(col("doc_id"), lit(13)) + 10).cast("long"))
      .withColumn("_plen", col("_w") * col("_h"))
      .withColumn("_px", expr(
        "encode(substring(repeat(text, CAST(_plen / length(text) + 1 " +
          "AS INT)), 1, CAST(_plen AS INT)), 'UTF-8')"))
      .select(col("doc_id").as("asset_id"),
        graft.functions.Gif.encode(col("_px"), col("_w"), col("_h"))
          .as("payload"))

  /** COMPLETE baseline JPEGs built from the documents table: pixel
    * buffer = doc text tiled to w·h·3 RGB bytes (the m13 law, so the
    * oracle re-derives the SOURCE pixels exactly), encoded by
    * [[graft.functions.JpegRuntime.encode]] — real FDCT, Annex-K
    * quantization at the given quality, real Huffman entropy coding.
    * Keeps the raw pre-encode buffer (`_px`) alongside: the lossy
    * contract compares decoded statistics against it.
    */
  private[graft] def jpegAssets(s: SparkSession, d: String,
      quality: Int = 92): DataFrame =
    T.documents(s, d)
      // The gate's documents table is ONE parquet row group → 1 scan
      // partition, which would serialize every encode/decode onto one
      // thread (measured: 6 s for a 0.5 s workload). The codec work is
      // CPU-bound per row, so spread the (small) raw rows across the
      // cluster first; at 100 TB the many-file scan parallelizes
      // naturally and this repartition is a no-op-sized shuffle.
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("w", (pmod(col("doc_id"), lit(17)) + 16).cast("long"))
      .withColumn("h", (pmod(col("doc_id"), lit(11)) + 12).cast("long"))
      .withColumn("_plen", col("w") * col("h") * 3)
      .withColumn("_px", expr(
        "encode(substring(repeat(text, CAST(_plen / length(text) + 1 " +
          "AS INT)), 1, CAST(_plen AS INT)), 'UTF-8')"))
      .select(col("doc_id").as("asset_id"), col("w"), col("h"),
        col("_px"),
        graft.functions.Jpeg.encode(col("_px"), col("w"), col("h"),
          lit(quality.toLong)).as("payload"))

  /** COMPLETE MJPEG AVIs from the documents table: 2–5 frames per
    * asset, frame f's pixels = the doc text tiled across the WHOLE
    * nf·w·h·3 buffer (so consecutive frames hold DIFFERENT slices of
    * the tiling — a frame-extraction off-by-one decodes the wrong
    * frame's content and the per-frame mean contract fails). Same
    * repartition rationale as [[jpegAssets]].
    */
  private[graft] def aviAssets(s: SparkSession, d: String): DataFrame =
    T.documents(s, d)
      .repartition(s.sparkContext.defaultParallelism)
      .withColumn("w", (pmod(col("doc_id"), lit(9)) + 16).cast("long"))
      .withColumn("h", (pmod(col("doc_id"), lit(7)) + 12).cast("long"))
      .withColumn("nf", (pmod(col("doc_id"), lit(4)) + 2).cast("long"))
      .withColumn("_plen", col("w") * col("h") * 3 * col("nf"))
      .withColumn("_px", expr(
        "encode(substring(repeat(text, CAST(_plen / length(text) + 1 " +
          "AS INT)), 1, CAST(_plen AS INT)), 'UTF-8')"))
      .select(col("doc_id").as("asset_id"), col("w"), col("h"),
        col("nf"), col("_px"),
        graft.functions.Avi.build(col("_px"), col("w"), col("h"),
          col("nf")).as("payload"))

  /** PNGs built from the documents table: real signature, real chunk
    * framing (length/type/data/CRC for IHDR, IDAT, IEND), REAL CRC-32s
    * (Spark's crc32 at build time — the parser re-derives them), and
    * network-order (big-endian) integer fields throughout. The IDAT
    * payload is the doc text tiled to w·h bytes, raw (no zlib — the
    * stubbed media-codec step).
    */
  private[graft] def pngAssets(s: SparkSession, d: String): DataFrame = {
    def be(x: Column, n: Int): Column = unhex(lpad(hex(x), n * 2, "0"))
    val built = T.documents(s, d)
      .withColumn("_w", (pmod(col("doc_id"), lit(17)) + 2).cast("long"))
      .withColumn("_h", (pmod(col("doc_id"), lit(7)) + 2).cast("long"))
      .withColumn("_dlen", col("_w") * col("_h"))
      .withColumn("_data", expr(
        "encode(substring(repeat(text, CAST(_dlen / length(text) + 1 " +
          "AS INT)), 1, CAST(_dlen AS INT)), 'UTF-8')"))
      .withColumn("_ihdr", concat(asciiLit("IHDR"),
        be(col("_w"), 4), be(col("_h"), 4), unhex(lit("0802000000"))))
      .withColumn("_idat", concat(asciiLit("IDAT"), col("_data")))
    built.select(col("doc_id").as("asset_id"),
      concat(
        unhex(lit("89504E470D0A1A0A")),
        be(lit(13L), 4), col("_ihdr"), be(crc32(col("_ihdr")), 4),
        be(col("_dlen"), 4), col("_idat"), be(crc32(col("_idat")), 4),
        be(lit(0L), 4), asciiLit("IEND"),
        be(crc32(asciiLit("IEND")), 4)).as("payload"))
  }
}
