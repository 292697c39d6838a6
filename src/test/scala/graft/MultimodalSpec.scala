package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, WavDecoder}

class MultimodalSpec extends SparkSpec {

  /** Canonical 44-byte-header PCM WAV built INDEPENDENTLY of both
    * parsers (direct ByteBuffer writes): 2ch, 44100 Hz, 8-bit, 10
    * sample bytes.
    */
  private def goldenWav(): Array[Byte] = {
    val data = Array.tabulate[Byte](10)(i => (i * 7).toByte)
    val bb = java.nio.ByteBuffer.allocate(44 + data.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(44100 * 2)
      .putShort(2).putShort(8)
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    bb.array()
  }

  test("both WAV parsers are real RIFF parsers: a hand-built canonical " +
      "header parses to the right fields through each") {
    val wav = goldenWav()
    // JVM decoder (m03 path).
    val m = new WavDecoder().decode(wav)
    assert(m.n_bytes == 54 && m.channels == 2 && m.sample_rate == 44100 &&
      m.bits_per_sample == 8 && m.data_bytes == 10 && m.duration_ms == 0, m)
    // Expression parser (m01 path) on a one-row frame.
    import spark.implicits._
    val row = Seq(wav).toDF("payload")
      .select(Multimodal.wavMeta(col("payload")).as("meta"))
      .select(col("meta.format"), col("meta.channels"),
        col("meta.sample_rate"), col("meta.bits_per_sample"),
        col("meta.data_bytes"), col("meta.n_bytes"))
      .head()
    assert(row.getString(0) == "wav" && row.getLong(1) == 2 &&
      row.getLong(2) == 44100 && row.getLong(3) == 8 &&
      row.getLong(4) == 10 && row.getLong(5) == 54, row)
    // A non-WAV payload reports format=unknown rather than garbage.
    val junk = Seq(Array.fill[Byte](64)(42)).toDF("payload")
      .select(Multimodal.wavMeta(col("payload")).as("meta"))
      .select(col("meta.format")).head()
    assert(junk.getString(0) == "unknown")
    // And the JVM decoder refuses it loudly.
    intercept[IllegalArgumentException] {
      new WavDecoder().decode(Array.fill[Byte](64)(42))
    }
  }

  test("m01 (expression parse) and m03 (batched JVM parse) agree on " +
      "every asset — two independent decoders cross-check") {
    val m01 = Registry.byName("m01_binary_meta").fn(spark, sfDir)
      .select(col("asset_id"), col("channels"), col("sample_rate"),
        col("data_bytes"), col("duration_ms"))
    val m03 = Registry.byName("m03_batch_decode").fn(spark, sfDir)
      .select(col("asset_id"), col("channels"), col("sample_rate"),
        col("data_bytes"), col("duration_ms"))
    assert(m01.count() > 0)
    assert(m01.exceptAll(m03).isEmpty && m03.exceptAll(m01).isEmpty)
  }

  test("m02 frame sampling emits ceil(n_frames/stride) rows per asset") {
    val rows = Registry.byName("m02_frame_sample").fn(spark, sfDir)
      .groupBy(col("asset_id")).agg(count(lit(1)).as("n_sampled"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sizes = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(encode(col("text"), "UTF-8")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    sizes.foreach { case (id, len) =>
      val nFrames = math.ceil(len / 64.0).toInt
      if (nFrames > 0) {
        val expected = (nFrames + 3) / 4 // stride 4
        assert(rows(id) == expected, s"asset $id len $len")
      }
    }
  }

  test("m12 PNG payloads verify against an INDEPENDENT java.util.zip " +
      "CRC32 and a byte-level reconstruction of the container") {
    import org.apache.spark.sql.functions._
    val out = Registry.byName("m12_png_header").fn(spark, sfDir)
      .filter(col("asset_id") === 7L).collect().head
    assert(out.getString(1) == "png")
    assert(out.getBoolean(8) && out.getBoolean(9)) // ihdr_crc_ok, size_ok
    val payload = graft.operators.Multimodal.pngAssets(spark, sfDir)
      .filter(col("asset_id") === 7L)
      .select(col("payload")).collect().head.getAs[Array[Byte]](0)
    // Reconstruct the container independently from the build rule.
    val text = Tables.documents(spark, sfDir)
      .filter(col("doc_id") === 7L).select(col("text"))
      .collect().head.getString(0)
    val w = 2 + 7 % 17; val h = 2 + 7 % 7
    val dlen = w * h
    val data = (text * (dlen / text.length + 1)).substring(0, dlen)
      .getBytes("UTF-8")
    def be(x: Long, n: Int): Array[Byte] =
      (1 to n).map(i => ((x >> (8 * (n - i))) & 0xff).toByte).toArray
    def crc(b: Array[Byte]): Long = {
      val c = new java.util.zip.CRC32(); c.update(b); c.getValue
    }
    val ihdr = "IHDR".getBytes("US-ASCII") ++ be(w.toLong, 4) ++
      be(h.toLong, 4) ++ Array[Byte](8, 2, 0, 0, 0)
    val idat = "IDAT".getBytes("US-ASCII") ++ data
    val iend = "IEND".getBytes("US-ASCII")
    val expected =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
        be(13, 4) ++ ihdr ++ be(crc(ihdr), 4) ++
        be(dlen.toLong, 4) ++ idat ++ be(crc(idat), 4) ++
        be(0, 4) ++ iend ++ be(crc(iend), 4)
    // Byte-identical: Spark's crc32/hex/concat algebra produced the
    // container a plain-JVM PNG writer would (zlib step excepted).
    assert(payload.toSeq == expected.toSeq)
    assert(out.getLong(2) == w && out.getLong(3) == h)
    assert(out.getLong(6) == dlen)
  }
}
