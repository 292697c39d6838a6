package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Glue
import org.apache.spark.sql.types._

/** REAL GIF codec — the third lossless image format after PNG
  * (functions/Png.scala) and BMP, closing the dominant legacy-web
  * formats for a crawl-scale multimodal pipeline. Everything here is
  * the public GIF89a specification: the 6-byte signature, logical
  * screen descriptor, color tables, image descriptor, the GIF variant
  * of LZW (variable-width codes 3..12 bits packed LSB-first, CLEAR and
  * END-OF-INFORMATION codes, dictionary reset at 4096), and 255-byte
  * data sub-block framing.
  *
  * Encode writes a grayscale-palette GIF (palette[i] = (i,i,i), so an
  * arbitrary byte-per-pixel buffer round-trips losslessly — GIF is
  * index-based, and the identity palette makes the index stream BE the
  * payload). The LZW stream starts with a CLEAR, resets the dictionary
  * whenever it fills (real encoder behavior), and splits output across
  * sub-blocks.
  *
  * Decode ([[GifRuntime.decode]]) is a full container+codec pass that
  * handles what real encoders emit (ImageIO cross-validation in
  * GifSpec): any global/local color table size, extension blocks
  * (graphic control, comment, application — skipped by sub-block
  * framing), interlaced row order (the four-pass appendix-E scheme —
  * ImageIO writes interlaced by default), the deferred-clear encoder
  * pattern, and the KwKwK (code == next-entry) LZW case. Multi-frame
  * animations decode their FIRST frame — the still-image corpus
  * shape; m17 handles the motion path via MJPEG.
  *
  * Scale: per-row scalar expressions (one static call each, inside
  * whole-stage codegen) — no state, no shuffle; a 100 TB corpus
  * decodes embarrassingly parallel on the scan, like PNG/BMP/WAV.
  */
object GifRuntime {

  private def leShort(a: Array[Byte], off: Int): Int =
    (a(off) & 0xff) | ((a(off + 1) & 0xff) << 8)

  /** Encode a byte-per-pixel buffer (row-major, top-down) as a
    * complete real GIF89a with a 256-entry grayscale global palette.
    */
  def encode(pixels: Array[Byte], w: Long, h: Long): Array[Byte] = {
    val wi = w.toInt; val hi = h.toInt
    require(pixels.length == wi * hi,
      s"pixel buffer ${pixels.length}B != ${wi}x$hi")
    require(wi > 0 && wi <= 0xffff && hi > 0 && hi <= 0xffff,
      s"dimensions out of GIF range: ${wi}x$hi")
    val out = new java.io.ByteArrayOutputStream(pixels.length / 2 + 512)
    out.write("GIF89a".getBytes("US-ASCII"))
    // logical screen descriptor: size, GCT present / 8-bit / 256 entries
    out.write(wi & 0xff); out.write(wi >>> 8)
    out.write(hi & 0xff); out.write(hi >>> 8)
    out.write(0xf7) // GCT flag=1, color res=7, sort=0, GCT size=7 (2^8)
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    // image descriptor: full-screen, no local table, not interlaced
    out.write(0x2c)
    out.write(0); out.write(0); out.write(0); out.write(0)
    out.write(wi & 0xff); out.write(wi >>> 8)
    out.write(hi & 0xff); out.write(hi >>> 8)
    out.write(0x00)
    out.write(8) // LZW minimum code size
    val lzw = lzwCompress(pixels, 8)
    // 255-byte sub-block framing
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      out.write(n)
      out.write(lzw, off, n)
      off += n
    }
    out.write(0x00) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** GIF-variant LZW: codes packed LSB-first, width grows 9→12 bits,
    * CLEAR resets the dictionary when it reaches 4096 entries.
    */
  private def lzwCompress(data: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    var bitBuf = 0L; var bitCnt = 0
    var codeSize = minCodeSize + 1
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += codeSize
      while (bitCnt >= 8) {
        out.write((bitBuf & 0xff).toInt)
        bitBuf >>>= 8; bitCnt -= 8
      }
    }
    // dictionary: (prefix code, appended byte) -> code
    var dict = new java.util.HashMap[Long, Integer](8192)
    var next = eoi + 1
    put(clear)
    if (data.nonEmpty) {
      var cur = data(0) & 0xff
      var i = 1
      while (i < data.length) {
        val k = data(i) & 0xff
        val key = (cur.toLong << 8) | k
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          put(cur)
          dict.put(key, Integer.valueOf(next))
          next += 1
          // width bumps AFTER the entry that fills the current range
          if (next == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          if (next == 4096) {
            put(clear)
            dict = new java.util.HashMap[Long, Integer](8192)
            next = eoi + 1
            codeSize = minCodeSize + 1
          }
          cur = k
        }
        i += 1
      }
      put(cur)
    }
    put(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** Decoded image: header fields from the container walk plus the
    * reconstructed byte-per-pixel INDEX stream and its palette.
    */
  final case class Decoded(width: Int, height: Int, paletteSize: Int,
      minCodeSize: Int, pixels: Array[Byte], palette: Array[Byte])

  /** Full decode: signature, screen descriptor, global color table,
    * extension-block skipping, image descriptor (+ optional local
    * table), sub-block de-framing, LZW decompression. Throws on
    * malformed input — a corrupt corpus fails loudly, not silently.
    */
  def decode(gif: Array[Byte]): Decoded = {
    require(gif.length >= 13, "truncated GIF header")
    val sig = new String(gif, 0, 6, "US-ASCII")
    require(sig == "GIF89a" || sig == "GIF87a", s"not a GIF signature: $sig")
    val screenW = leShort(gif, 6); val screenH = leShort(gif, 8)
    val packed = gif(10) & 0xff
    var pos = 13
    var gct: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      require(pos + 3 * n <= gif.length, "truncated global color table")
      gct = java.util.Arrays.copyOfRange(gif, pos, pos + 3 * n)
      pos += 3 * n
    }
    // walk blocks to the first image descriptor
    while (pos < gif.length && (gif(pos) & 0xff) == 0x21) {
      pos += 2 // extension introducer + label
      while ((gif(pos) & 0xff) != 0) pos += 1 + (gif(pos) & 0xff)
      pos += 1 // sub-block terminator
    }
    require(pos < gif.length && (gif(pos) & 0xff) == 0x2c,
      s"expected image descriptor, got 0x${(gif(pos) & 0xff).toHexString}")
    val w = leShort(gif, pos + 5); val h = leShort(gif, pos + 7)
    require(w > 0 && w <= screenW && h > 0 && h <= screenH,
      s"image ${w}x$h exceeds screen ${screenW}x$screenH")
    val ipacked = gif(pos + 9) & 0xff
    val interlaced = (ipacked & 0x40) != 0
    pos += 10
    var pal = gct
    if ((ipacked & 0x80) != 0) {
      val n = 2 << (ipacked & 7)
      require(pos + 3 * n <= gif.length, "truncated local color table")
      pal = java.util.Arrays.copyOfRange(gif, pos, pos + 3 * n)
      pos += 3 * n
    }
    require(pal != null, "no color table (global or local)")
    val minCodeSize = gif(pos) & 0xff
    require(minCodeSize >= 2 && minCodeSize <= 8,
      s"bad LZW minimum code size $minCodeSize")
    pos += 1
    // de-frame sub-blocks
    val lzw = new java.io.ByteArrayOutputStream(w * h / 2 + 64)
    var bl = gif(pos) & 0xff
    while (bl != 0) {
      require(pos + 1 + bl <= gif.length, "truncated image data sub-block")
      lzw.write(gif, pos + 1, bl)
      pos += 1 + bl
      require(pos < gif.length, "missing sub-block terminator")
      bl = gif(pos) & 0xff
    }
    val raw = lzwDecompress(lzw.toByteArray, minCodeSize, w * h)
    // GIF interlacing (spec appendix E): rows arrive in four passes
    // (every 8th from 0, every 8th from 4, every 4th from 2, every
    // 2nd from 1) — map sequential decoded rows back to their place
    val px = if (!interlaced) raw else {
      val out = new Array[Byte](raw.length)
      var src = 0
      for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
        var y = start
        while (y < h) {
          System.arraycopy(raw, src * w, out, y * w, w)
          src += 1; y += step
        }
      }
      out
    }
    Decoded(w, h, pal.length / 3, minCodeSize, px, pal)
  }

  /** GIF-variant LZW decode: growing code width, CLEAR/EOI handling,
    * and the KwKwK case (a code one past the table refers to the
    * previous string plus its own first byte).
    */
  private def lzwDecompress(data: Array[Byte], minCodeSize: Int,
      nPixels: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new Array[Byte](nPixels)
    var outPos = 0
    // dictionary as prefix links: prefix(code), suffix byte, length
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val length = new Array[Int](4096)
    var next = 0
    def reset(): Unit = {
      var i = 0
      while (i < clear) {
        prefix(i) = -1; suffix(i) = i.toByte; length(i) = 1; i += 1
      }
      next = eoi + 1
    }
    reset()
    var codeSize = minCodeSize + 1
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    var prev = -1
    def writeString(code: Int, extra: Int): Unit = {
      // emit the string for `code` (walking prefix links backwards),
      // optionally followed by one extra byte (the KwKwK first-char)
      val len = length(code)
      require(outPos + len + (if (extra >= 0) 1 else 0) <= nPixels,
        s"LZW output overruns ${nPixels}px")
      var i = outPos + len - 1
      var c = code
      while (c >= 0) { out(i) = suffix(c); i -= 1; c = prefix(c) }
      outPos += len
      if (extra >= 0) { out(outPos) = extra.toByte; outPos += 1 }
    }
    var done = false
    while (!done) {
      while (bitCnt < codeSize && pos < data.length) {
        bitBuf |= (data(pos) & 0xffL) << bitCnt
        bitCnt += 8; pos += 1
      }
      require(bitCnt >= codeSize,
        s"truncated LZW stream at ${outPos}/${nPixels}px")
      val code = (bitBuf & ((1 << codeSize) - 1)).toInt
      bitBuf >>>= codeSize; bitCnt -= codeSize
      if (code == clear) {
        reset(); codeSize = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        require(code < clear, s"first code $code is not a literal")
        writeString(code, -1)
        prev = code
      } else {
        require(code <= next, s"LZW code $code beyond table ($next)")
        if (code < next) {
          writeString(code, -1)
        } else {
          // KwKwK: previous string + its own first byte
          var c = prev
          while (prefix(c) >= 0) c = prefix(c)
          writeString(prev, suffix(c) & 0xff)
        }
        if (next < 4096) {
          var c = code
          if (code == next) c = prev
          var f = c
          while (prefix(f) >= 0) f = prefix(f)
          prefix(next) = prev
          suffix(next) = suffix(f)
          // for code < next the appended byte is the FIRST byte of
          // this code's string, not of prev's
          if (code < next) {
            var g = code
            while (prefix(g) >= 0) g = prefix(g)
            suffix(next) = suffix(g)
          }
          length(next) = length(prev) + 1
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
      if (outPos == nPixels && !done) {
        // tolerate encoders that pad before EOI (deferred clear)
        done = true
      }
    }
    require(outPos == nPixels, s"decoded ${outPos}px, expected $nPixels")
    out
  }

  /** Expand an index stream through its palette to packed RGB. */
  def toRgb(pixels: Array[Byte], palette: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](pixels.length * 3)
    var i = 0
    while (i < pixels.length) {
      val p = (pixels(i) & 0xff) * 3
      require(p + 2 < palette.length,
        s"palette index ${pixels(i) & 0xff} outside ${palette.length / 3}")
      out(i * 3) = palette(p)
      out(i * 3 + 1) = palette(p + 1)
      out(i * 3 + 2) = palette(p + 2)
      i += 1
    }
    out
  }

  val DecodedType: StructType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("palette_size", LongType, nullable = false),
    StructField("min_code_size", LongType, nullable = false),
    StructField("pixels", BinaryType, nullable = false),
    StructField("palette", BinaryType, nullable = false)))

  def decodeRow(gif: Array[Byte]): InternalRow = {
    val d = decode(gif)
    new GenericInternalRow(Array[Any](d.width.toLong, d.height.toLong,
      d.paletteSize.toLong, d.minCodeSize.toLong, d.pixels, d.palette))
  }
}

/** Catalyst expressions over [[GifRuntime]] — one static call each, so
  * they ride whole-stage codegen like the Png/Jpeg families.
  */
object Gif {

  private val RT = "graft.functions.GifRuntime"

  /** Build a complete real GIF89a from a byte-per-pixel buffer. */
  case class GifEncode(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_gif_encode"
    override protected def nullSafeEval(px: Any, w: Any, h: Any): Any =
      GifRuntime.encode(px.asInstanceOf[Array[Byte]],
        w.asInstanceOf[Long], h.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (px, w, h) =>
        s"${ev.value} = $RT.encode($px, $w, $h);")
    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression): GifEncode = copy(f, s, t)
  }

  /** Full container walk + LZW decode to a typed struct. */
  case class GifDecode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = GifRuntime.DecodedType
    override def prettyName: String = "graft_gif_decode"
    override protected def nullSafeEval(input: Any): Any =
      GifRuntime.decodeRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $RT.decodeRow($c);")
    override protected def withNewChildInternal(c: Expression): GifDecode =
      copy(child = c)
  }

  def encode(px: Column, w: Column, h: Column): Column =
    Glue.column(GifEncode(Glue.expression(px), Glue.expression(w),
      Glue.expression(h)))
  def decode(c: Column): Column = Glue.column(GifDecode(Glue.expression(c)))
}
