package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Glue
import org.apache.spark.sql.types._

/** K-MINIMUM-VALUES distinct sketch as a native typed aggregate — the
  * engine-neutral counterpart of q30's HLL++ `approx_count_distinct`:
  * the sketch is the k smallest DISTINCT hash values of the column,
  * the estimator is pure integer arithmetic over them, and both are
  * replayable verbatim in any engine (DuckDB: row_number ≤ k over the
  * sorted distinct hashes) — so unlike the HLL path, a KMV key carries
  * a FULL cross-engine oracle.
  *
  * Scale shape (why this is an aggregate, not a window): the buffer is
  * O(k) per group regardless of input size, `update` is O(log k), and
  * `merge` unions two sketches keeping the k minima — so map-side
  * partial aggregation works and shuffle traffic is |groups| × k,
  * independent of corpus size. Sketches are also the mergeable
  * per-partition objects an incremental index persists (the c04/st21
  * story: union-then-truncate is associative and commutative).
  *
  * Input is the PRE-HASHED value (charPoly31, in [0, P)): hashing
  * stays a codegen'd scalar projection and the aggregate is reusable
  * over any hashable type.
  */
object Kmv {

  val P: Long = TextHash.P

  case class KmvSketch(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {
    require(k > 1, s"graft_kmv: k must be > 1, got $k")
    override def children: Seq[Expression] = Seq(child)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "graft_kmv"

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    override def update(buf: java.util.TreeSet[java.lang.Long],
        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      if (v == null) return buf
      val h = v.asInstanceOf[Long]
      if (buf.size < k) buf.add(h)
      else if (h < buf.last()) { if (buf.add(h)) buf.pollLast() }
      buf
    }

    override def merge(b1: java.util.TreeSet[java.lang.Long],
        b2: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = b2.iterator()
      while (it.hasNext) {
        val h = it.next()
        if (b1.size < k) b1.add(h)
        else if (h < b1.last()) { if (b1.add(h)) b1.pollLast() }
        else return b1 // b2 iterates ascending; the rest can't qualify
      }
      b1
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val out = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out) // ascending — TreeSet iterates sorted
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * buf.size)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val out = new java.util.TreeSet[java.lang.Long]()
      var i = 0
      while (i < n) { out.add(bb.getLong()); i += 1 }
      out
    }

    override def withNewMutableAggBufferOffset(o: Int): KmvSketch =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvSketch =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): KmvSketch = copy(child = c.head)
  }

  /** Aggregate a pre-hashed long column into its KMV sketch. */
  def sketch(hash: Column, k: Int): Column =
    Glue.column(KmvSketch(Glue.expression(hash), k).toAggregateExpression())

  /** PAIRED KMV: keep the measure value of each of the k smallest-hash
    * rows — a deterministic uniform row sample WITHOUT replacement
    * (hash the row key, keep the k minima), the building block for
    * sampled order statistics (q56). Same O(k) buffer / map-side
    * combine / mergeable shape as [[KmvSketch]]; hash collisions keep
    * the smaller value so the sample is engine-replayable (DuckDB:
    * MIN(v) GROUP BY h, then row_number ≤ k by h). Returns the sampled
    * values ordered by their hash (callers sort by value).
    */
  case class KmvPairs(hashChild: Expression, valueChild: Expression,
      k: Int, mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeMap[java.lang.Long, java.lang.Long]] {
    require(k > 1, s"graft_kmv_pairs: k must be > 1, got $k")
    override def children: Seq[Expression] = Seq(hashChild, valueChild)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "graft_kmv_pairs"

    override def createAggregationBuffer(): java.util.TreeMap[java.lang.Long, java.lang.Long] =
      new java.util.TreeMap[java.lang.Long, java.lang.Long]()

    private def put(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
        h: Long, v: Long): Unit = {
      val cur = buf.get(h)
      if (cur != null) { if (v < cur) buf.put(h, v) }
      else if (buf.size < k) buf.put(h, v)
      else if (h < buf.lastKey()) { buf.put(h, v); buf.pollLastEntry() }
    }

    override def update(buf: java.util.TreeMap[java.lang.Long, java.lang.Long],
        input: InternalRow): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
      val h = hashChild.eval(input)
      val v = valueChild.eval(input)
      if (h != null && v != null)
        put(buf, h.asInstanceOf[Long], v.asInstanceOf[Long])
      buf
    }

    override def merge(b1: java.util.TreeMap[java.lang.Long, java.lang.Long],
        b2: java.util.TreeMap[java.lang.Long, java.lang.Long]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
      val it = b2.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        put(b1, e.getKey, e.getValue)
      }
      b1
    }

    override def eval(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Any = {
      val out = new Array[Long](buf.size)
      val it = buf.values().iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      new GenericArrayData(out)
    }

    override def serialize(buf: java.util.TreeMap[java.lang.Long, java.lang.Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 16 * buf.size)
      bb.putInt(buf.size)
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        bb.putLong(e.getKey); bb.putLong(e.getValue)
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeMap[java.lang.Long, java.lang.Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt()
      val out = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
      var i = 0
      while (i < n) { out.put(bb.getLong(), bb.getLong()); i += 1 }
      out
    }

    override def withNewMutableAggBufferOffset(o: Int): KmvPairs =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): KmvPairs =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): KmvPairs =
      copy(hashChild = c.head, valueChild = c(1))
  }

  /** Sample the k rows with the smallest key hashes, keeping `value`. */
  def pairSample(hash: Column, value: Column, k: Int): Column =
    Glue.column(KmvPairs(Glue.expression(hash), Glue.expression(value), k)
      .toAggregateExpression())

  import org.apache.spark.sql.functions._

  /** Distinct-count estimate from a sketch column: m when the sketch
    * is unsaturated (fewer than k distinct hashes seen — they ARE the
    * distinct set), else (k−1)·P / h_k by exact integer arithmetic
    * ((N − N mod h) / h is an exact IEEE quotient: every operand is
    * below 2⁵³). DuckDB replays it as `(k-1)*P // hk`.
    */
  def estimate(sk: Column, k: Int): Column = {
    val n = lit((k - 1).toLong * P)
    val m = size(sk)
    val hk = element_at(sk, k)
    when(m < k, m.cast("long"))
      .otherwise(((n - pmod(n, hk)) / hk).cast("long"))
  }

  /** Intersection-cardinality estimate from two sketches (the KMV set
    * operation): U = the min(k, |a ∪ b|) smallest union hashes; shared
    * = members of U present in BOTH sketches; unsaturated U is the
    * exact overlap, saturated scales shared/k by the union estimate —
    * all integer, replayed verbatim by the DuckDB oracle.
    */
  def intersectEstimate(a: Column, b: Column, k: Int): Column = {
    val un = slice(array_sort(array_union(a, b)), 1, k)
    val m = size(un)
    val um = element_at(un, m)
    val shared = size(array_intersect(un, array_intersect(a, b)))
      .cast("long")
    val n = lit((k - 1).toLong * P)
    val estU = ((n - pmod(n, um)) / um).cast("long")
    val prod = shared * estU
    when(m < k, shared)
      .otherwise(((prod - pmod(prod, lit(k.toLong))) / k).cast("long"))
  }
}
