package graft

import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.functions.{Gif, GifRuntime}

/** Pins the real GIF codec (functions/Gif.scala): lossless roundtrip
  * through our own LZW encoder (including dictionary-reset streams),
  * cross-decode of `javax.imageio`-encoded GIFs (an INDEPENDENT
  * encoder — its own LZW, palette and extension blocks), cross-ENCODE
  * (ImageIO reads our files back), malformed-input rejection, and the
  * Catalyst expressions end to end over the m18 asset path.
  */
class GifSpec extends SparkSpec with Matchers {

  private def rndPixels(n: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)(r.nextInt(256).toByte)
  }

  test("roundtrip: encode → decode reproduces the byte stream exactly, " +
      "including dictionary-reset (>4096 entry) streams") {
    for ((w, h, seed) <- Seq((1, 1, 1L), (3, 7, 2L), (40, 25, 3L),
        (255, 90, 4L))) {
      val px = rndPixels(w * h, seed)
      val gif = GifRuntime.encode(px, w.toLong, h.toLong)
      val d = GifRuntime.decode(gif)
      assert(d.width == w && d.height == h)
      assert(d.paletteSize == 256 && d.minCodeSize == 8)
      assert(d.pixels.toSeq == px.toSeq, s"pixel mismatch at ${w}x$h")
    }
    // random bytes barely compress: a 255x90 stream adds one dict
    // entry per ~1.01 input bytes, so it MUST have crossed 4096 and
    // reset (22950 px >> 3838 first-window adds) — the roundtrip above
    // therefore exercised mid-stream CLEAR on both sides
    // highly repetitive input: long matches, exercises deep prefix
    // chains and the KwKwK path
    val rep = Array.tabulate(6000)(i => (i % 7).toByte)
    val g2 = GifRuntime.decode(GifRuntime.encode(rep, 100L, 60L))
    assert(g2.pixels.toSeq == rep.toSeq)
    // constant input is the classic KwKwK generator (aaa... emits a
    // code exactly one past the table on every step)
    val const = Array.fill(997)(7.toByte)
    assert(GifRuntime.decode(GifRuntime.encode(const, 997L, 1L))
      .pixels.toSeq == const.toSeq)
  }

  test("cross-decode: GIFs written by javax.imageio (independent " +
      "encoder — own LZW, palette order, GCE extension block) decode " +
      "to ImageIO's own raster values") {
    for ((w, h, seed) <- Seq((5, 3, 11L), (17, 9, 12L), (48, 31, 13L))) {
      // a paletted source image keeps ImageIO from quantizing: build
      // an indexed image over a 216-color web-safe-ish palette
      val r = new scala.util.Random(seed)
      val size = 216
      val cm = {
        val reds = new Array[Byte](size)
        val greens = new Array[Byte](size)
        val blues = new Array[Byte](size)
        for (i <- 0 until size) {
          reds(i) = ((i % 6) * 51).toByte
          greens(i) = ((i / 6 % 6) * 51).toByte
          blues(i) = ((i / 36) * 51).toByte
        }
        new java.awt.image.IndexColorModel(8, size, reds, greens, blues)
      }
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
      for (y <- 0 until h; x <- 0 until w) {
        val i = r.nextInt(size)
        img.setRGB(x, y, ((i % 6) * 51 << 16) | ((i / 6 % 6) * 51 << 8) |
          ((i / 36) * 51))
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", bos))
      val d = GifRuntime.decode(bos.toByteArray)
      assert(d.width == w && d.height == h)
      val rgb = GifRuntime.toRgb(d.pixels, d.palette)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val off = (y * w + x) * 3
        assert((rgb(off) & 0xff) == ((argb >> 16) & 0xff), s"R $x,$y")
        assert((rgb(off + 1) & 0xff) == ((argb >> 8) & 0xff), s"G $x,$y")
        assert((rgb(off + 2) & 0xff) == (argb & 0xff), s"B $x,$y")
      }
    }
  }

  test("cross-encode: ImageIO reads OUR GIFs back bit-for-bit") {
    for ((w, h, seed) <- Seq((9, 6, 21L), (33, 17, 22L))) {
      val px = rndPixels(w * h, seed)
      val gif = GifRuntime.encode(px, w.toLong, h.toLong)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(gif))
      assert(img != null, "ImageIO rejected our GIF")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = px(y * w + x) & 0xff
        val argb = img.getRGB(x, y)
        // identity grayscale palette: all three channels equal the index
        assert(((argb >> 16) & 0xff) == v && ((argb >> 8) & 0xff) == v &&
          (argb & 0xff) == v, s"pixel $x,$y")
      }
    }
  }

  test("malformed inputs fail loudly") {
    val good = GifRuntime.encode(rndPixels(12, 31L), 4L, 3L)
    intercept[IllegalArgumentException] {
      GifRuntime.decode("NOTAGIF".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] {
      GifRuntime.decode(java.util.Arrays.copyOf(good, 10)) // truncated
    }
    // truncated mid-image-data: lop off the trailer AND the last
    // sub-block so the LZW stream runs dry
    intercept[Exception] {
      GifRuntime.decode(java.util.Arrays.copyOf(good, good.length - 8))
    }
    intercept[IllegalArgumentException] {
      GifRuntime.encode(rndPixels(5, 32L), 2L, 3L) // 5 != 2*3
    }
  }

  test("Catalyst expressions: the m18 asset path decodes under " +
      "whole-stage codegen and matches a driver-side re-derivation") {
    val df = graft.operators.Multimodal.gifAssets(spark, sfDir)
      .withColumn("dec", Gif.decode(col("payload")))
      .select(col("asset_id"), col("dec.width"), col("dec.height"),
        col("dec.pixels"))
      .orderBy("asset_id")
      .limit(5)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").orderBy("doc_id").limit(5).collect()
    for ((row, doc) <- rows.zip(docs)) {
      val id = doc.getLong(0); val text = doc.getString(1)
      assert(row.getLong(0) == id)
      val w = (id % 25 + 16).toInt; val h = (id % 13 + 10).toInt
      assert(row.getLong(1) == w && row.getLong(2) == h)
      val want = (text * (w * h / text.length + 1)).take(w * h)
        .getBytes("UTF-8")
      assert(row.getAs[Array[Byte]](3).toSeq == want.toSeq,
        s"asset $id pixels")
    }
  }
}
