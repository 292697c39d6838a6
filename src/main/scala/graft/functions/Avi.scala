package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Glue
import org.apache.spark.sql.types._

/** MJPEG-in-AVI — a REAL video container over the real JPEG codec
  * (functions/Jpeg.scala), replacing m02's byte-window stand-in as the
  * video leg of the multimodal surface. The container follows the
  * public AVI/RIFF layout: `RIFF('AVI ')` with a `hdrl` LIST (`avih`
  * main header + one `strl` stream LIST of `strh` 'vids'/'MJPG' +
  * `strf` BITMAPINFOHEADER), a `movi` LIST of `00dc` compressed-frame
  * chunks (each a complete baseline JFIF stream, even-padded per
  * RIFF), and a standard `idx1` keyframe index with offsets relative
  * to the movi list data — the shape every MJPEG tool emits and every
  * AVI reader accepts.
  *
  * Writer and readers are independent code paths: [[meta]] parses the
  * headers, [[frame]] walks the movi chunks, and AviSpec additionally
  * re-derives every frame position from the idx1 index (offset
  * arithmetic a wrong writer would break) and decodes extracted
  * frames with javax.imageio as an external check.
  *
  * All integers little-endian (RIFF), all parsing bounds-checked with
  * loud failures — the m01/m08 container-codec law.
  */
object AviRuntime {

  private val Fps = 8
  private val UsecPerFrame = 1000000 / Fps

  private final class W(val out: java.io.ByteArrayOutputStream) {
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def fcc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def bytes(b: Array[Byte]): Unit = out.write(b, 0, b.length)
  }

  /** Build a complete MJPEG AVI: `pixels` holds nFrames consecutive
    * w×h×3 RGB frame buffers; each frame encodes to baseline JFIF at
    * quality 92 through [[JpegRuntime.encode]].
    */
  def build(pixels: Array[Byte], w: Long, h: Long, nFrames: Long): Array[Byte] = {
    val wi = w.toInt; val hi = h.toInt; val nf = nFrames.toInt
    val flen = wi * hi * 3
    require(nf >= 1 && pixels.length == nf * flen,
      s"pixel buffer ${pixels.length}B != $nf frames of ${wi}x${hi}x3")
    val frames = (0 until nf).map { f =>
      JpegRuntime.encode(
        java.util.Arrays.copyOfRange(pixels, f * flen, (f + 1) * flen),
        w, h, 92)
    }

    def chunk(id: String, body: W => Unit): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val wr = new W(bos)
      body(wr)
      val data = bos.toByteArray
      val out = new java.io.ByteArrayOutputStream()
      val o = new W(out)
      o.fcc(id); o.u32(data.length.toLong); o.bytes(data)
      if (data.length % 2 == 1) out.write(0) // RIFF even padding
      out.toByteArray
    }
    def list(typ: String, parts: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val o = new W(out)
      val size = 4L + parts.map(_.length.toLong).sum
      o.fcc("LIST"); o.u32(size); o.fcc(typ)
      parts.foreach(o.bytes)
      out.toByteArray
    }

    val avih = chunk("avih", o => {
      o.u32(UsecPerFrame.toLong); o.u32(0); o.u32(0)
      o.u32(0x10) // AVIF_HASINDEX
      o.u32(nf.toLong); o.u32(0); o.u32(1); o.u32(0)
      o.u32(w); o.u32(h)
      (0 until 4).foreach(_ => o.u32(0))
    })
    val strh = chunk("strh", o => {
      o.fcc("vids"); o.fcc("MJPG")
      o.u32(0); o.u16(0); o.u16(0); o.u32(0)
      o.u32(1); o.u32(Fps.toLong) // scale / rate → fps
      o.u32(0); o.u32(nf.toLong); o.u32(0)
      o.u32(0xffffffffL) // quality: default
      o.u32(0)
      o.u16(0); o.u16(0); o.u16(wi); o.u16(hi) // rcFrame
    })
    val strf = chunk("strf", o => {
      o.u32(40); o.u32(w); o.u32(h); o.u16(1); o.u16(24)
      o.fcc("MJPG"); o.u32(flen.toLong)
      o.u32(0); o.u32(0); o.u32(0); o.u32(0)
    })
    val hdrl = list("hdrl", Seq(avih, list("strl", Seq(strh, strf))))
    val frameChunks = frames.map(j => chunk("00dc", _.bytes(j)))
    val movi = list("movi", frameChunks)
    // idx1 offsets are relative to the START OF THE MOVI LIST DATA
    // (the 'movi' fourcc position): first chunk header sits at +4.
    val offsets = frameChunks.scanLeft(4L)((acc, c) => acc + c.length)
    val idx1 = chunk("idx1", o => {
      frames.indices.foreach { f =>
        o.fcc("00dc"); o.u32(0x10) // AVIIF_KEYFRAME
        o.u32(offsets(f)); o.u32(frames(f).length.toLong)
      }
    })

    val out = new java.io.ByteArrayOutputStream()
    val o = new W(out)
    val payload = Seq(hdrl, movi, idx1)
    o.fcc("RIFF"); o.u32(4L + payload.map(_.length.toLong).sum)
    o.fcc("AVI ")
    payload.foreach(o.bytes)
    out.toByteArray
  }

  private def u32(a: Array[Byte], p: Int): Long = {
    require(p + 4 <= a.length, s"truncated AVI at $p")
    ((a(p) & 0xffL)) | ((a(p + 1) & 0xffL) << 8) |
      ((a(p + 2) & 0xffL) << 16) | ((a(p + 3) & 0xffL) << 24)
  }
  private def fcc(a: Array[Byte], p: Int): String = {
    require(p + 4 <= a.length, s"truncated AVI at $p")
    new String(a, p, 4, "US-ASCII")
  }

  /** Locate a LIST of the given type at the RIFF top level; returns
    * (dataStart, dataEnd) of the list BODY after its type fourcc.
    */
  private def findList(avi: Array[Byte], typ: String): (Int, Int) = {
    var p = 12
    while (p + 8 <= avi.length) {
      val id = fcc(avi, p)
      val len = u32(avi, p + 4).toInt
      if (id == "LIST" && fcc(avi, p + 8) == typ)
        return (p + 12, p + 8 + len)
      p += 8 + len + (len & 1)
    }
    throw new IllegalArgumentException(s"no $typ LIST in AVI")
  }

  /** Top-level non-LIST chunk (e.g. idx1): (dataStart, dataEnd). */
  private def findChunk(avi: Array[Byte], id4: String): (Int, Int) = {
    var p = 12
    while (p + 8 <= avi.length) {
      val id = fcc(avi, p)
      val len = u32(avi, p + 4).toInt
      if (id == id4) return (p + 8, p + 8 + len)
      p += 8 + len + (len & 1)
    }
    throw new IllegalArgumentException(s"no $id4 chunk in AVI")
  }

  val MetaType: StructType = StructType(Seq(
    StructField("n_frames", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("handler", StringType, nullable = false),
    StructField("n_idx", LongType, nullable = false)))

  /** Parse the container headers: avih (frame count, dims, timing),
    * strh (handler fourcc), idx1 (index entry count) — three
    * independent places a malformed writer would disagree with itself.
    */
  def meta(avi: Array[Byte]): InternalRow = {
    require(avi.length >= 12 && fcc(avi, 0) == "RIFF" &&
      fcc(avi, 8) == "AVI ", "not a RIFF/AVI stream")
    val (h0, hEnd) = findList(avi, "hdrl")
    require(fcc(avi, h0) == "avih", "hdrl must open with avih")
    val usec = u32(avi, h0 + 8)
    val nf = u32(avi, h0 + 8 + 16)
    val w = u32(avi, h0 + 8 + 32)
    val h = u32(avi, h0 + 8 + 36)
    // stream list: first LIST strl inside hdrl
    var p = h0 + 8 + u32(avi, h0 + 4).toInt
    var handler = ""
    while (handler.isEmpty && p + 12 <= hEnd) {
      if (fcc(avi, p) == "LIST" && fcc(avi, p + 8) == "strl") {
        require(fcc(avi, p + 12) == "strh", "strl must open with strh")
        require(fcc(avi, p + 20) == "vids", "first stream is not video")
        handler = fcc(avi, p + 24)
      } else p += 8 + u32(avi, p + 4).toInt
    }
    require(handler.nonEmpty, "no strl LIST in hdrl")
    val (i0, iEnd) = findChunk(avi, "idx1")
    new GenericInternalRow(Array[Any](nf, w, h,
      nf * usec / 1000L, org.apache.spark.unsafe.types.UTF8String
        .fromString(handler), ((iEnd - i0) / 16).toLong))
  }

  /** Extract the `frameNo`-th compressed frame (the complete JFIF
    * stream) by walking the movi chunk chain.
    */
  def frame(avi: Array[Byte], frameNo: Long): Array[Byte] = {
    val (m0, mEnd) = findList(avi, "movi")
    var p = m0
    var seen = 0L
    while (p + 8 <= mEnd) {
      val id = fcc(avi, p)
      val len = u32(avi, p + 4).toInt
      if (id == "00dc") {
        if (seen == frameNo)
          return java.util.Arrays.copyOfRange(avi, p + 8, p + 8 + len)
        seen += 1
      }
      p += 8 + len + (len & 1)
    }
    throw new IllegalArgumentException(
      s"frame $frameNo out of range ($seen frames in movi)")
  }

  /** idx1 replay for the spec: every (offset, size) entry, with the
    * offset resolved to an absolute file position of the chunk DATA.
    */
  def indexEntries(avi: Array[Byte]): Seq[(Long, Long)] = {
    val (m0, _) = findList(avi, "movi")
    val moviFccPos = m0 - 4 // offsets are relative to the 'movi' fourcc
    val (i0, iEnd) = findChunk(avi, "idx1")
    (i0 until iEnd by 16).map { p =>
      require(fcc(avi, p) == "00dc", "unexpected idx1 entry id")
      (moviFccPos + u32(avi, p + 8) + 8, u32(avi, p + 12))
    }
  }
}

/** Catalyst expressions over [[AviRuntime]]. */
object Avi {

  private val RT = "graft.functions.AviRuntime"

  case class AviBuild(first: Expression, second: Expression,
      third: Expression, fourth: Expression) extends QuaternaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_avi_build"
    override protected def nullSafeEval(px: Any, w: Any, h: Any, nf: Any): Any =
      AviRuntime.build(px.asInstanceOf[Array[Byte]], w.asInstanceOf[Long],
        h.asInstanceOf[Long], nf.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (px, w, h, nf) =>
        s"${ev.value} = $RT.build($px, $w, $h, $nf);")
    override protected def withNewChildrenInternal(f: Expression,
        s: Expression, t: Expression, q: Expression): AviBuild =
      copy(f, s, t, q)
  }

  case class AviMeta(child: Expression) extends UnaryExpression {
    override def dataType: DataType = AviRuntime.MetaType
    override def prettyName: String = "graft_avi_meta"
    override protected def nullSafeEval(input: Any): Any =
      AviRuntime.meta(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $RT.meta($c);")
    override protected def withNewChildInternal(c: Expression): AviMeta =
      copy(child = c)
  }

  case class AviFrame(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_avi_frame"
    override protected def nullSafeEval(avi: Any, no: Any): Any =
      AviRuntime.frame(avi.asInstanceOf[Array[Byte]], no.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, n) => s"${ev.value} = $RT.frame($a, $n);")
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): AviFrame = copy(l, r)
  }

  def build(px: Column, w: Column, h: Column, nFrames: Column): Column =
    Glue.column(AviBuild(Glue.expression(px), Glue.expression(w),
      Glue.expression(h), Glue.expression(nFrames)))
  def meta(c: Column): Column = Glue.column(AviMeta(Glue.expression(c)))
  def frame(avi: Column, no: Column): Column =
    Glue.column(AviFrame(Glue.expression(avi), Glue.expression(no)))
}
