package graft

import org.scalatest.matchers.should.Matchers
import org.apache.spark.sql.functions._
import graft.functions.{Png, PngRuntime}

/** Pins the real PNG codec (functions/Png.scala): roundtrip through
  * our own encoder, cross-decode of `javax.imageio`-encoded PNGs (an
  * INDEPENDENT encoder — its own filter heuristics and zlib stream),
  * per-filter-type unfilter correctness, malformed-input rejection,
  * and the Catalyst expressions end to end over the m13 asset path.
  */
class PngSpec extends SparkSpec with Matchers {

  private def rndPixels(w: Int, h: Int, seed: Long): Array[Byte] = {
    val r = new scala.util.Random(seed)
    Array.fill(w * h * 3)(r.nextInt(256).toByte)
  }

  test("roundtrip: encode → decode reproduces pixels exactly, " +
      "exercising all five filter types and multi-IDAT splitting") {
    for ((w, h, seed) <- Seq((1, 1, 1L), (3, 7, 2L), (16, 16, 3L),
        (40, 40, 4L), (7, 5, 5L))) {
      val px = rndPixels(w, h, seed)
      val png = PngRuntime.encode(px, w.toLong, h.toLong)
      val d = PngRuntime.decode(png)
      assert(d.width == w && d.height == h)
      assert(d.bitDepth == 8 && d.colorType == 2)
      assert(d.pixels.toSeq == px.toSeq, s"pixel mismatch at ${w}x$h")
      // h >= 5 rows ⇒ every filter type 0..4 appeared at least once
      if (h >= 5) assert(d.pixels.length == w * h * 3)
    }
    // 40x40x3 random bytes barely compress ⇒ deflate stream > 4096B ⇒
    // the encoder MUST have split into multiple IDAT chunks
    val big = PngRuntime.encode(rndPixels(40, 40, 9L), 40L, 40L)
    assert(PngRuntime.decode(big).nIdat > 1, "expected multi-IDAT")
  }

  test("cross-decode: PNGs written by javax.imageio (independent " +
      "encoder) decode to ImageIO's own raster values") {
    for ((w, h, seed) <- Seq((5, 3, 11L), (17, 9, 12L), (32, 24, 13L))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val r = new scala.util.Random(seed)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, r.nextInt() & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      val d = PngRuntime.decode(bos.toByteArray)
      assert(d.width == w && d.height == h && d.bitDepth == 8)
      // ImageIO writes TYPE_3BYTE_BGR as color type 2 (RGB order in
      // the PNG stream); compare every sample against getRGB
      assert(d.colorType == 2)
      for (y <- 0 until h; x <- 0 until w) {
        val argb = img.getRGB(x, y)
        val off = (y * w + x) * 3
        assert((d.pixels(off) & 0xff) == ((argb >> 16) & 0xff), s"R $x,$y")
        assert((d.pixels(off + 1) & 0xff) == ((argb >> 8) & 0xff), s"G $x,$y")
        assert((d.pixels(off + 2) & 0xff) == (argb & 0xff), s"B $x,$y")
      }
    }
  }

  test("grayscale (color type 0) and RGBA (color type 6) ImageIO PNGs " +
      "decode correctly — the non-RGB branches of the unfilterer") {
    // grayscale: 1 byte/pixel — bpp=1 exercises the Sub/Paeth left
    // neighbor at distance 1
    val (w, h) = (9, 7)
    val gimg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = new scala.util.Random(41L)
    for (y <- 0 until h; x <- 0 until w) {
      val g = r.nextInt(256)
      gimg.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val gb = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(gimg, "png", gb))
    val gd = PngRuntime.decode(gb.toByteArray)
    assert(gd.colorType == 0 && gd.width == w && gd.height == h)
    assert(gd.pixels.length == w * h)
    for (y <- 0 until h; x <- 0 until w)
      assert((gd.pixels(y * w + x) & 0xff) ==
        (gimg.getRaster.getSample(x, y, 0)), s"gray $x,$y")
    // RGBA: 4 bytes/pixel with a non-trivial alpha channel
    val aimg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_4BYTE_ABGR)
    for (y <- 0 until h; x <- 0 until w)
      aimg.setRGB(x, y, r.nextInt()) // random ARGB incl. alpha
    val ab = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(aimg, "png", ab))
    val ad = PngRuntime.decode(ab.toByteArray)
    assert(ad.colorType == 6 && ad.pixels.length == w * h * 4)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = aimg.getRGB(x, y)
      val off = (y * w + x) * 4
      assert((ad.pixels(off) & 0xff) == ((argb >> 16) & 0xff), s"R $x,$y")
      assert((ad.pixels(off + 1) & 0xff) == ((argb >> 8) & 0xff), s"G $x,$y")
      assert((ad.pixels(off + 2) & 0xff) == (argb & 0xff), s"B $x,$y")
      assert((ad.pixels(off + 3) & 0xff) == ((argb >>> 24) & 0xff),
        s"A $x,$y")
    }
  }

  test("our encoder's output is accepted by ImageIO (the reverse " +
      "cross-check): pixels survive an external decode") {
    val w = 11; val h = 8
    val px = rndPixels(w, h, 21L)
    val png = PngRuntime.encode(px, w.toLong, h.toLong)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(png))
    assert(img != null, "ImageIO rejected our PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val argb = img.getRGB(x, y)
      val off = (y * w + x) * 3
      assert(((argb >> 16) & 0xff) == (px(off) & 0xff), s"R $x,$y")
      assert(((argb >> 8) & 0xff) == (px(off + 1) & 0xff), s"G $x,$y")
      assert((argb & 0xff) == (px(off + 2) & 0xff), s"B $x,$y")
    }
  }

  test("2x2xRGB pool: hand-computed sums on a 2x2 image; halves split " +
      "ceil-left/top on odd dimensions") {
    // 2x2 image, one pixel per cell — sums are the pixels themselves
    val px = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val sums = PngRuntime.pool2x2(px, 2L, 2L).toLongArray()
    assert(sums.toSeq == Seq[Long](10, 20, 30, 40, 50, 60,
      70, 80, 90, 100, 110, 120))
    // 3x1: left cell gets ceil(3/2)=2 columns, right gets 1; single
    // row is all gy=0
    val px31 = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)
    val s31 = PngRuntime.pool2x2(px31, 3L, 1L).toLongArray()
    assert(s31.toSeq == Seq[Long](1 + 4, 2 + 5, 3 + 6, 7, 8, 9,
      0, 0, 0, 0, 0, 0))
  }

  test("malformed input fails loudly: bad signature, corrupt CRC, " +
      "truncated IDAT") {
    val good = PngRuntime.encode(rndPixels(4, 4, 31L), 4L, 4L)
    intercept[IllegalArgumentException] {
      PngRuntime.decode("not a png at all".getBytes)
    }
    val badCrc = good.clone()
    badCrc(20) = (badCrc(20) ^ 0x55).toByte // flip an IHDR data byte
    intercept[IllegalArgumentException] { PngRuntime.decode(badCrc) }
    intercept[IllegalArgumentException] {
      PngRuntime.decode(java.util.Arrays.copyOf(good, good.length - 20))
    }
  }

  test("m13/m14 plan shape: codegen'd projection over one scan, no " +
      "shuffle except the presentation sort — the 100 TB decode shape") {
    for (key <- Seq("m13_png_pixels", "m14_png_pooled_features")) {
      val df = graft.Registry.byName(key).fn(spark, sfDir)
      df.collect() // finalize the adaptive plan before inspecting
      // final-plan section only (the AQE string repeats the tree
      // under "== Initial Plan ==")
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      // "*(n)" prefixes are the WholeStageCodegen stage markers
      assert(plan.contains("*(1)"), s"$key not codegen'd:\n$plan")
      // exactly the sort's exchange — a decode path that shuffled
      // pixel data would be wrong at any corpus size
      val exchanges = "Exchange".r.findAllIn(plan).size
      assert(exchanges <= 1, s"$key has $exchanges exchanges:\n$plan")
    }
  }

  test("m13 expressions end to end: decode(encode(px)) under codegen " +
      "matches the raw pixel tiling for every corpus document") {
    val rows = graft.operators.Multimodal.pngRealAssets(spark, sfDir)
      .withColumn("dec", Png.decode(col("payload")))
      .select(col("asset_id"), col("dec.width"), col("dec.height"),
        md5(col("dec.pixels")).as("got"))
      .collect()
    assert(rows.nonEmpty)
    val want = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { r =>
      val id = r.getLong(0); val w = r.getLong(1); val h = r.getLong(2)
      assert(w == 8 + id % 24 && h == 6 + id % 10)
      val n = (w * h * 3).toInt
      val text = want(id)
      val tiled = (text * (n / text.length + 1)).take(n).getBytes("UTF-8")
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tiled).map(b => f"$b%02x").mkString
      assert(r.getString(3) == hex, s"pixel md5 mismatch for doc $id")
    }
  }
}
