package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** Static runtime for the FastVector expressions — shared by
  * interpreted eval and generated code (see [[FastTextRuntime]]).
  */
object FastVectorRuntime {

  def dot(l: ArrayData, r: ArrayData): Double = {
    val a = l.toDoubleArray()
    val b = r.toDoubleArray()
    if (a.length != b.length)
      throw new IllegalArgumentException(
        s"graft_dot: vector length mismatch (${a.length} vs ${b.length})")
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  def hyperplaneBuckets(input: ArrayData,
      planes: Array[Array[Array[Double]]]): ArrayData = {
    val v = input.toDoubleArray()
    val out = new Array[Long](planes.length)
    var t = 0
    while (t < planes.length) {
      val tbl = planes(t)
      var bucket = 0L
      var bit = 0
      while (bit < tbl.length) {
        val plane = tbl(bit)
        var acc = 0.0
        var i = 0
        val n = math.min(v.length, plane.length)
        while (i < n) { acc += v(i) * plane(i); i += 1 }
        if (acc >= 0) bucket += (1L << bit)
        bit += 1
      }
      out(t) = bucket; t += 1
    }
    new GenericArrayData(out)
  }

  /** Average-pool a byte payload onto a fixed grid of `cells`: byte p
    * lands in cell p*cells/n; each cell's value is the mean of its
    * bytes (0-255), empty cells (n < cells) are 0.0. The 1-D analog of
    * resizing an image to a fixed thumbnail — deterministic integer
    * binning, exact integer sums, one divide per cell.
    */
  def bytePool(payload: Array[Byte], cells: Int): ArrayData = {
    val n = payload.length
    val sums = new Array[Long](cells)
    val counts = new Array[Long](cells)
    var p = 0
    while (p < n) {
      val c = (p.toLong * cells / n).toInt
      sums(c) += payload(p) & 0xff
      counts(c) += 1
      p += 1
    }
    val out = new Array[Double](cells)
    var j = 0
    while (j < cells) {
      out(j) = if (counts(j) == 0) 0.0 else sums(j).toDouble / counts(j)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Fused per-window audio features over a byte slice: sample sum,
    * DC-removed scaled energy (Σ(n·sᵢ − Σs)²) and zero-crossing count
    * of the mean-removed signal — one O(n) pass over the bytes (plus
    * the O(n) sum pre-pass the energy definition requires), replacing
    * the O(n²) per-character `substring` loop it supersedes
    * (m10_audio_features was 13.4 s at sf0.1; see
    * [[graft.operators.Multimodal]]). Slice bounds are clamped to the
    * payload so a short final window can never read past the buffer.
    * All math is integer; worst case |cent| ≤ 255·n and Σcent² ≤
    * 255²·n³ ≈ 2⁵⁶/1e3 at n=960 — well inside Long.
    */
  def audioFeatures(payload: Array[Byte], off: Long, len: Int):
      org.apache.spark.sql.catalyst.InternalRow = {
    val start = math.max(0L, math.min(off, payload.length.toLong)).toInt
    val n = math.max(0, math.min(len, payload.length - start))
    var sum = 0L
    var i = 0
    while (i < n) { sum += (payload(start + i) & 0xff).toLong; i += 1 }
    var energy = 0L
    var zc = 0L
    var prev = 0L
    i = 0
    while (i < n) {
      val cent = (payload(start + i) & 0xff).toLong * n - sum
      energy += cent * cent
      if (i > 0 && prev * cent < 0) zc += 1
      prev = cent
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](sum, energy, zc))
  }

  def normalize(input: ArrayData, fromFloat: Boolean): ArrayData = {
    val v = if (fromFloat) {
      val f = input.toFloatArray()
      val d = new Array[Double](f.length)
      var i = 0
      while (i < f.length) { d(i) = f(i).toDouble; i += 1 }
      d
    } else input.toDoubleArray()
    var ss = 0.0
    var i = 0
    while (i < v.length) { ss += v(i) * v(i); i += 1 }
    val norm = math.sqrt(ss)
    val out = new Array[Double](v.length)
    if (norm > 0) { i = 0; while (i < v.length) { out(i) = v(i) / norm; i += 1 } }
    new GenericArrayData(out)
  }
}
