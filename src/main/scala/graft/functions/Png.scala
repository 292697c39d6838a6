package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graft.Glue
import org.apache.spark.sql.types._

/** REAL PNG pixel codec — the un-stubbing of the one step SURVEY's
  * multimodal contract previously declared out of scope. Everything
  * here is the public PNG specification (RFC 2083 / ISO 15948):
  * 8-byte signature, length/type/data/CRC chunk framing, zlib
  * (RFC 1950) compression of the filtered scanline stream via the
  * JVM's built-in `java.util.zip` Deflater/Inflater, and the five
  * scanline filters (None/Sub/Up/Average/Paeth) with the spec's exact
  * unsigned-mod-256 arithmetic and the Paeth predictor tie-break
  * order (left, then above, then upper-left).
  *
  * Decode ([[PngRuntime.decode]]) is a full container+codec pass:
  * signature check, chunk walk that CRC-verifies and concatenates
  * ALL IDAT chunks (real encoders split them — ours does too),
  * single Inflater pass, then per-row unfilter into the raw
  * byte-per-sample pixel stream. Greyscale (0), truecolor (2),
  * grey+alpha (4) and RGBA (6) at bit depth 8, non-interlaced — the
  * shapes `javax.imageio` emits for 8-bit images (PngSpec
  * cross-checks against ImageIO as an independent encoder).
  *
  * Scale: per-row scalar expressions (one static call each, inside
  * whole-stage codegen) — no state, no shuffle; a 100 TB image
  * corpus decodes embarrassingly parallel on the scan, exactly like
  * the BMP/WAV paths (m08/m10).
  */
object PngRuntime {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def crc(typeAndData: Array[Byte], off: Int, len: Int): Int = {
    val c = new java.util.zip.CRC32
    c.update(typeAndData, off, len)
    c.getValue.toInt
  }

  private def beInt(a: Array[Byte], off: Int): Int =
    ((a(off) & 0xff) << 24) | ((a(off + 1) & 0xff) << 16) |
      ((a(off + 2) & 0xff) << 8) | (a(off + 3) & 0xff)

  private def putBeInt(a: Array[Byte], off: Int, v: Int): Unit = {
    a(off) = (v >>> 24).toByte; a(off + 1) = (v >>> 16).toByte
    a(off + 2) = (v >>> 8).toByte; a(off + 3) = v.toByte
  }

  /** Bytes per pixel for bit-depth-8 color types (0/2/4/6). */
  private def bppOf(colorType: Int): Int = colorType match {
    case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
    case ct => throw new IllegalArgumentException(
      s"unsupported PNG color type $ct (palette/interlaced out of scope)")
  }

  /** The Paeth predictor — spec §6.6: nearest of a (left), b (above),
    * c (upper-left) to a+b−c, ties broken a, then b, then c.
    */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode raw pixels (byte-per-sample, row-major, top-down) as a
    * complete REAL truecolor PNG. Each scanline is filtered with
    * filter type y % 5 — so every decode exercises all five filters —
    * then the whole filtered stream is zlib-deflated and split across
    * multiple IDAT chunks (as real encoders do).
    */
  def encode(pixels: Array[Byte], w: Long, h: Long): Array[Byte] = {
    val wi = w.toInt; val hi = h.toInt
    val bpp = 3
    require(pixels.length == wi * hi * bpp,
      s"pixel buffer ${pixels.length}B != ${wi}x${hi}x$bpp")
    // filter scanlines: 1 filter byte + w*bpp filtered bytes per row
    val rowLen = wi * bpp
    val filtered = new Array[Byte](hi * (rowLen + 1))
    var y = 0
    while (y < hi) {
      val ft = y % 5
      filtered(y * (rowLen + 1)) = ft.toByte
      var x = 0
      while (x < rowLen) {
        val raw = pixels(y * rowLen + x) & 0xff
        val left = if (x >= bpp) pixels(y * rowLen + x - bpp) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * rowLen + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp)
          pixels((y - 1) * rowLen + x - bpp) & 0xff else 0
        val f = ft match {
          case 0 => raw
          case 1 => raw - left
          case 2 => raw - up
          case 3 => raw - ((left + up) >> 1)
          case 4 => raw - paeth(left, up, ul)
        }
        filtered(y * (rowLen + 1) + 1 + x) = (f & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // zlib-deflate the filtered stream (RFC 1950 wrapper = Deflater
    // default mode; fixed level for determinism)
    val defl = new java.util.zip.Deflater(6)
    defl.setInput(filtered); defl.finish()
    val buf = new Array[Byte](filtered.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!defl.finished()) {
      val n = defl.deflate(buf)
      out.write(buf, 0, n)
    }
    defl.end()
    val z = out.toByteArray
    // assemble: signature, IHDR, >=1 IDAT (split at 4096B), IEND
    val bb = new java.io.ByteArrayOutputStream()
    bb.write(Signature, 0, Signature.length)
    def chunk(typ: String, data: Array[Byte], off: Int, len: Int): Unit = {
      val head = new Array[Byte](4)
      putBeInt(head, 0, len)
      bb.write(head, 0, 4)
      val td = new Array[Byte](4 + len)
      typ.getBytes("US-ASCII").copyToArray(td)
      System.arraycopy(data, off, td, 4, len)
      bb.write(td, 0, td.length)
      val tail = new Array[Byte](4)
      putBeInt(tail, 0, crc(td, 0, td.length))
      bb.write(tail, 0, 4)
    }
    val ihdr = new Array[Byte](13)
    putBeInt(ihdr, 0, wi); putBeInt(ihdr, 4, hi)
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk("IHDR", ihdr, 0, 13)
    var off = 0
    while (off < z.length) {
      val n = math.min(4096, z.length - off)
      chunk("IDAT", z, off, n)
      off += n
    }
    if (z.isEmpty) chunk("IDAT", Array.emptyByteArray, 0, 0)
    chunk("IEND", Array.emptyByteArray, 0, 0)
    bb.toByteArray
  }

  /** Decoded image: header fields from the chunk walk plus the fully
    * reconstructed raw pixel stream.
    */
  final case class Decoded(width: Int, height: Int, bitDepth: Int,
      colorType: Int, nIdat: Int, pixels: Array[Byte])

  /** Full decode: chunk walk (CRC-verified), IDAT concatenation,
    * zlib inflate, per-scanline unfilter. Throws on malformed input —
    * a corrupt 100 TB corpus should fail loudly, not silently.
    */
  def decode(png: Array[Byte]): Decoded = {
    require(png.length >= 8 && java.util.Arrays.equals(
      java.util.Arrays.copyOf(png, 8), Signature), "not a PNG signature")
    var pos = 8
    var w = 0; var h = 0; var depth = 0; var ct = 0; var nIdat = 0
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      require(pos + 8 <= png.length, "truncated chunk header")
      val len = beInt(png, pos)
      val typ = new String(png, pos + 4, 4, "US-ASCII")
      require(pos + 12 + len <= png.length, s"truncated $typ chunk")
      val stored = beInt(png, pos + 8 + len)
      require(stored == crc(png, pos + 4, 4 + len), s"bad CRC on $typ")
      typ match {
        case "IHDR" =>
          w = beInt(png, pos + 8); h = beInt(png, pos + 12)
          depth = png(pos + 16) & 0xff; ct = png(pos + 17) & 0xff
          require(depth == 8, s"unsupported bit depth $depth")
          require((png(pos + 20) & 0xff) == 0, "interlaced out of scope")
        case "IDAT" => idat.write(png, pos + 8, len); nIdat += 1
        case "IEND" => done = true
        case _ => // ancillary chunk — skip
      }
      pos += 12 + len
    }
    val bpp = bppOf(ct)
    val rowLen = w * bpp
    // inflate the concatenated IDAT stream
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    val filtered = new Array[Byte](h * (rowLen + 1))
    var got = 0
    while (got < filtered.length && !infl.finished()) {
      val n = infl.inflate(filtered, got, filtered.length - got)
      // Zero progress while unfinished is ALWAYS fatal here (the whole
      // stream is already set as input): it means truncation, or a
      // zlib FDICT preset-dictionary stream (needsDictionary), which
      // PNG forbids — either way fail loudly instead of spinning.
      require(n > 0, if (infl.needsDictionary())
        "IDAT stream demands a preset dictionary (FDICT) — invalid PNG"
      else "truncated IDAT stream")
      got += n
    }
    infl.end()
    require(got == filtered.length,
      s"inflated $got B, expected ${filtered.length}")
    // unfilter scanline by scanline (spec §6: recon uses RECON bytes
    // of the current and prior row, not filtered bytes)
    val px = new Array[Byte](h * rowLen)
    var y = 0
    while (y < h) {
      val ft = filtered(y * (rowLen + 1)) & 0xff
      require(ft <= 4, s"bad filter type $ft on row $y")
      var x = 0
      while (x < rowLen) {
        val f = filtered(y * (rowLen + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) px(y * rowLen + x - bpp) & 0xff else 0
        val up = if (y > 0) px((y - 1) * rowLen + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp)
          px((y - 1) * rowLen + x - bpp) & 0xff else 0
        val r = ft match {
          case 0 => f
          case 1 => f + left
          case 2 => f + up
          case 3 => f + ((left + up) >> 1)
          case 4 => f + paeth(left, up, ul)
        }
        px(y * rowLen + x) = (r & 0xff).toByte
        x += 1
      }
      y += 1
    }
    Decoded(w, h, depth, ct, nIdat, px)
  }

  /** 2×2 spatial × 3-channel average-pool grid over a decoded RGB
    * pixel buffer: cell (gy, gx, ch) with gy = y·2/h, gx = x·2/w
    * (integer division — the left/top halves get the ceil share) —
    * returns the 12 per-cell byte SUMS in (gy, gx, ch) order.
    * Integer-exact by construction, so the oracle reproduces it
    * bit-for-bit; averages divide downstream where both engines
    * round identically.
    */
  def pool2x2(pixels: Array[Byte], w: Long, h: Long):
      org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val wi = w.toInt; val hi = h.toInt
    require(pixels.length == wi * hi * 3,
      s"pixel buffer ${pixels.length}B != ${wi}x${hi}x3")
    val sums = new Array[Long](12)
    var y = 0
    while (y < hi) {
      val gy = y * 2 / hi
      var x = 0
      while (x < wi) {
        val gx = x * 2 / wi
        val base = (gy * 2 + gx) * 3
        val off = (y * wi + x) * 3
        sums(base) += pixels(off) & 0xff
        sums(base + 1) += pixels(off + 1) & 0xff
        sums(base + 2) += pixels(off + 2) & 0xff
        x += 1
      }
      y += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sums)
  }

  val DecodedType: StructType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("bit_depth", LongType, nullable = false),
    StructField("color_type", LongType, nullable = false),
    StructField("n_idat", LongType, nullable = false),
    StructField("pixels", BinaryType, nullable = false)))

  def decodeRow(png: Array[Byte]): InternalRow = {
    val d = decode(png)
    new GenericInternalRow(Array[Any](d.width.toLong, d.height.toLong,
      d.bitDepth.toLong, d.colorType.toLong, d.nIdat.toLong, d.pixels))
  }
}

/** Catalyst expressions over [[PngRuntime]] — one static call each, so
  * they ride whole-stage codegen like the Bpe/FastText families.
  */
object Png {

  private val RT = "graft.functions.PngRuntime"

  /** Build a complete real truecolor PNG from raw RGB bytes. */
  case class PngEncode(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_png_encode"
    override protected def nullSafeEval(px: Any, w: Any, h: Any): Any =
      PngRuntime.encode(px.asInstanceOf[Array[Byte]],
        w.asInstanceOf[Long], h.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (px, w, h) =>
        s"${ev.value} = $RT.encode($px, $w, $h);")
    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression): PngEncode = copy(f, s, t)
  }

  /** Full chunk-walk + inflate + unfilter decode to a typed struct. */
  case class PngDecode(child: Expression) extends UnaryExpression {
    override def dataType: DataType = PngRuntime.DecodedType
    override def prettyName: String = "graft_png_decode"
    override protected def nullSafeEval(input: Any): Any =
      PngRuntime.decodeRow(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $RT.decodeRow($c);")
    override protected def withNewChildInternal(c: Expression): PngDecode =
      copy(child = c)
  }

  /** 2×2×RGB average-pool sums over decoded pixels. */
  case class PngPool(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType =
      ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_png_pool"
    override protected def nullSafeEval(px: Any, w: Any, h: Any): Any =
      PngRuntime.pool2x2(px.asInstanceOf[Array[Byte]],
        w.asInstanceOf[Long], h.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (px, w, h) =>
        s"${ev.value} = $RT.pool2x2($px, $w, $h);")
    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression): PngPool = copy(f, s, t)
  }

  def encode(px: Column, w: Column, h: Column): Column =
    Glue.column(PngEncode(Glue.expression(px), Glue.expression(w),
      Glue.expression(h)))
  def decode(c: Column): Column = Glue.column(PngDecode(Glue.expression(c)))
  def pool(px: Column, w: Column, h: Column): Column =
    Glue.column(PngPool(Glue.expression(px), Glue.expression(w),
      Glue.expression(h)))
}
