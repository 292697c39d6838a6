package graft

import graft.functions.JpegRuntime
import org.scalatest.funsuite.AnyFunSuite

/** [[JpegRuntime]] — the baseline JFIF codec behind m15/m16. The codec
  * is pinned in BOTH directions against the JDK's independent
  * (IJG-derived) implementation: javax.imageio must decode OUR
  * bitstreams to the same pixels (± IDCT rounding), and WE must decode
  * javax.imageio-ENCODED files (4:2:0 chroma, gray) to ImageIO's own
  * result — so the Huffman tables, zigzag, quantization, IDCT, fancy
  * upsampling and color conversion are each validated externally, not
  * just by self-roundtrip.
  */
class JpegSpec extends AnyFunSuite {

  private def randRgb(w: Int, h: Int, seed: Long): Array[Byte] = {
    val r = new java.util.Random(seed)
    val px = new Array[Byte](w * h * 3)
    r.nextBytes(px)
    px
  }

  private def imageioEncode(img: java.awt.image.BufferedImage,
      quality: Float): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    wr.setOutput(ios)
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionQuality(quality)
    wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); wr.dispose()
    bos.toByteArray
  }

  test("q100 RGB roundtrip: dims/MCU count exact, every sample within " +
      "±4 of the source (quant steps ≈1 — the error is DCT arithmetic)") {
    for ((w, h) <- Seq((16, 16), (17, 13), (40, 23), (8, 8), (3, 5))) {
      val px = randRgb(w, h, seed = w * 100 + h)
      val dec = JpegRuntime.decode(JpegRuntime.encode(px, w, h, 100))
      assert(dec.width == w && dec.height == h && dec.nComp == 3)
      assert(dec.nMcus == ((w + 7) / 8) * ((h + 7) / 8))
      assert(dec.pixels.length == w * h * 3)
      val worst = px.indices.map(i =>
        math.abs((px(i) & 0xff) - (dec.pixels(i) & 0xff))).max
      assert(worst <= 4, s"${w}x$h worst=$worst")
    }
  }

  test("javax.imageio decodes OUR bitstream to the same pixels (±4) at " +
      "every quality tier — the encoder emits valid JFIF") {
    for (q <- Seq(100, 92, 75, 40); (w, h) <- Seq((24, 17), (8, 8))) {
      val px = randRgb(w, h, seed = q * 7 + w)
      val d = JpegRuntime.imageioMaxDiff(JpegRuntime.encode(px, w, h, q))
      assert(d <= 4, s"q=$q ${w}x$h imageio diff $d")
    }
  }

  test("grayscale: single-component scan, replicated-channel output, " +
      "ImageIO agreement within ±1") {
    val w = 21; val h = 14
    val r = new java.util.Random(5)
    val g = new Array[Byte](w * h)
    r.nextBytes(g)
    val jpg = JpegRuntime.encode(g, w, h, 95)
    val dec = JpegRuntime.decode(jpg)
    assert(dec.nComp == 1 && dec.width == w && dec.height == h)
    // channels replicated
    assert((0 until w * h).forall(i => dec.pixels(3 * i) == dec.pixels(3 * i + 1)
      && dec.pixels(3 * i) == dec.pixels(3 * i + 2)))
    assert(JpegRuntime.imageioMaxDiff(jpg) <= 1)
  }

  test("externally-encoded 4:2:0 color and gray files decode to " +
      "ImageIO's own result (fancy chroma upsampling, ±4)") {
    val w = 37; val h = 29
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val r = new java.util.Random(3)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, r.nextInt(1 << 24))
    val color = imageioEncode(img, 0.9f)
    val dec = JpegRuntime.decode(color)
    assert(dec.width == w && dec.height == h && dec.nComp == 3)
    assert(JpegRuntime.imageioMaxDiff(color) <= 4)
    val gimg = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = r.nextInt(256); gimg.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    assert(JpegRuntime.imageioMaxDiff(imageioEncode(gimg, 0.85f)) <= 1)
  }

  test("lower quality → smaller file; q100 → larger; sizes are " +
      "deterministic across encodes") {
    val px = randRgb(32, 24, seed = 11)
    val sizes = Seq(100, 85, 50, 20).map(q =>
      JpegRuntime.encode(px, 32, 24, q).length)
    assert(sizes == sizes.sorted.reverse, s"sizes $sizes not decreasing")
    val a = JpegRuntime.encode(px, 32, 24, 85)
    val b = JpegRuntime.encode(px, 32, 24, 85)
    assert(java.util.Arrays.equals(a, b))
    val d1 = JpegRuntime.decode(a); val d2 = JpegRuntime.decode(b)
    assert(java.util.Arrays.equals(d1.pixels, d2.pixels))
  }

  test("malformed streams fail loudly: bad SOI, truncation mid-scan, " +
      "quality out of range") {
    intercept[IllegalArgumentException] {
      JpegRuntime.decode(Array[Byte](0, 1, 2, 3, 4, 5))
    }
    val ok = JpegRuntime.encode(randRgb(16, 16, 1), 16, 16, 90)
    intercept[Exception] {
      JpegRuntime.decode(java.util.Arrays.copyOf(ok, ok.length / 3))
    }
    intercept[IllegalArgumentException] {
      JpegRuntime.encode(randRgb(8, 8, 2), 8, 8, 0)
    }
    intercept[IllegalArgumentException] { // buffer/dims mismatch
      JpegRuntime.encode(new Array[Byte](10), 8, 8, 90)
    }
  }
}
