package graft

import graft.functions.{AviRuntime, JpegRuntime}
import org.scalatest.funsuite.AnyFunSuite

/** [[AviRuntime]] — the MJPEG-in-AVI container behind m17. The writer
  * is pinned three independent ways: the header parser re-derives
  * counts/dims/timing, the idx1 index entries must land byte-exactly
  * on each movi chunk's data (offset arithmetic relative to the movi
  * fourcc — the classic AVI quirk a wrong writer breaks), and every
  * extracted frame must be a valid JFIF stream that BOTH our decoder
  * and javax.imageio accept with agreeing pixels.
  */
class AviSpec extends AnyFunSuite {

  private def makeAvi(w: Int, h: Int, nf: Int, seed: Long) = {
    val rnd = new java.util.Random(seed)
    val px = new Array[Byte](nf * w * h * 3)
    rnd.nextBytes(px)
    (px, AviRuntime.build(px, w, h, nf))
  }

  test("headers parse back: frame count, dims, 8 fps timing, MJPG " +
      "handler, idx1 entry count") {
    val (_, avi) = makeAvi(24, 18, 5, seed = 1)
    val m = AviRuntime.meta(avi)
    assert(m.getLong(0) == 5 && m.getLong(1) == 24 && m.getLong(2) == 18)
    assert(m.getLong(3) == 5 * 125) // 8 fps → 125 ms per frame
    assert(m.getUTF8String(4).toString == "MJPG")
    assert(m.getLong(5) == 5)
  }

  test("idx1 offsets resolve byte-exactly to each movi frame's data") {
    val (_, avi) = makeAvi(17, 13, 4, seed = 2)
    val entries = AviRuntime.indexEntries(avi)
    assert(entries.size == 4)
    entries.zipWithIndex.foreach { case ((pos, size), f) =>
      val viaWalk = AviRuntime.frame(avi, f)
      assert(size == viaWalk.length, s"frame $f size")
      val viaIndex = java.util.Arrays.copyOfRange(avi, pos.toInt,
        (pos + size).toInt)
      assert(java.util.Arrays.equals(viaIndex, viaWalk),
        s"frame $f: idx1 slice != movi walk")
    }
  }

  test("every frame is a valid JFIF both decoders accept, and " +
      "consecutive frames hold DIFFERENT content") {
    val (px, avi) = makeAvi(16, 12, 3, seed = 3)
    val flen = 16 * 12 * 3
    val decs = (0 until 3).map { f =>
      val jpeg = AviRuntime.frame(avi, f)
      assert((jpeg(0) & 0xff) == 0xff && (jpeg(1) & 0xff) == 0xd8)
      val dec = JpegRuntime.decode(jpeg)
      assert(dec.width == 16 && dec.height == 12)
      assert(JpegRuntime.imageioMaxDiff(jpeg) <= 4)
      // decoded frame tracks ITS slice of the source buffer (mean
      // within JPEG q92 drift), not some other frame's
      val src = java.util.Arrays.copyOfRange(px, f * flen, (f + 1) * flen)
      def mean(a: Array[Byte]) = a.map(_ & 0xff).sum.toDouble / a.length
      assert(math.abs(mean(dec.pixels) - mean(src)) <= 2.0, s"frame $f")
      dec.pixels.toSeq
    }
    assert(decs.distinct.size == 3, "frames should differ")
  }

  test("malformed streams fail loudly: not RIFF, frame out of range, " +
      "pixel/frame-count mismatch") {
    intercept[IllegalArgumentException] {
      AviRuntime.meta("JUNKJUNKJUNKJUNK".getBytes)
    }
    val (_, avi) = makeAvi(16, 12, 2, seed = 4)
    intercept[IllegalArgumentException] { AviRuntime.frame(avi, 2) }
    intercept[IllegalArgumentException] {
      AviRuntime.build(new Array[Byte](100), 16, 12, 2)
    }
  }
}
