package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Glue
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-level BPE tokenization — the pipeline's token currency.
  *
  * The tokenizer is the standard byte-pair-encoding construction
  * (Sennrich et al. 2016; the byte-level variant GPT-2 popularized),
  * run SentencePiece-style over raw bytes with space as an ordinary
  * symbol (no pre-tokenizer), so encoding is pure deterministic
  * integer work both engines replay exactly. Base vocabulary = the
  * 256 single bytes (ids 0-255); merge i creates token id 256+i from
  * the ranked 2000-pair table in [[BpeMerges]], trained once on the
  * committed sf0.01 corpus by [[graft.tools.BpeTrain]] (re-running it
  * reproduces that literal byte for byte — see its Scaladoc for the
  * deterministic recipe).
  *
  * The REFERENCE semantics apply merges IN RANK ORDER, each pass
  * replacing every non-overlapping occurrence left to right — the
  * original Sennrich encoder ([[encodeBytes]]). [[encodeMinRank]] is
  * the GPT-2-style alternative (repeatedly merge the lowest-ranked
  * pair present); the two are provably identical — a later merge can
  * never create an adjacency of two earlier-vocabulary tokens,
  * because every token it creates has a higher id than any pair
  * operand of an earlier rank. The HOT PATH is [[encodeHeap]], the
  * min-rank construction on a linked list + lazy heap — O(n log n)
  * per document independent of the merge count, where the reference
  * passes are O(K·n). BpeSpec property-checks all three agree on the
  * corpus and adversarial random strings. The DuckDB oracle replays
  * the rank-order pass as a recursive CTE built from the same table
  * (see [[graft.operators.BpeOracles]]).
  *
  * Scale: encoding is a per-row scalar expression — no state, no
  * shuffle, O(n log n) integer ops per document inside whole-stage
  * codegen. The merge table is ~150 KB of static JVM state (pairs +
  * probe table), shipped once per executor like any expression
  * constant.
  */
object BpeRuntime {

  /** Ranked merge pairs; merge i yields token id 256 + i. The 2000-
    * rank table lives in [[BpeMerges]] (generated literal — see its
    * Scaladoc for the deterministic training recipe).
    */
  val MergeTable: Array[(Int, Int)] = BpeMerges.Table

  val NumMerges: Int = MergeTable.length
  val VocabSize: Int = 256 + NumMerges

  // (l, r) → rank+1 lookup (0 = no merge): open-addressed long-keyed
  // probe table (power-of-two size ≥ 4·K, linear probing) — with a
  // 2256-id vocabulary a dense grid would be V² = 20 MB of static
  // state; this is 128 KB with the same O(1) no-boxing probes.
  private val rankTableBits = {
    var b = 10
    while ((1 << b) < MergeTable.length * 4) b += 1
    b
  }
  private val rankKeys = new Array[Long](1 << rankTableBits)
  private val rankVals = new Array[Int](1 << rankTableBits)
  locally {
    java.util.Arrays.fill(rankKeys, -1L)
    var i = 0
    while (i < MergeTable.length) {
      val (l, r) = MergeTable(i)
      val key = (l.toLong << 32) | r.toLong
      var slot = (key * 0x9e3779b97f4a7c15L >>> (64 - rankTableBits)).toInt
      while (rankKeys(slot) != -1L) slot = (slot + 1) & (rankKeys.length - 1)
      rankKeys(slot) = key
      rankVals(slot) = i + 1
      i += 1
    }
  }

  /** rank+1 of the merge (l, r), or 0 when no such merge exists. */
  private def rankOfPair(l: Int, r: Int): Int = {
    val key = (l.toLong << 32) | r.toLong
    var slot = (key * 0x9e3779b97f4a7c15L >>> (64 - rankTableBits)).toInt
    while (true) {
      val k = rankKeys(slot)
      if (k == key) return rankVals(slot)
      if (k == -1L) return 0
      slot = (slot + 1) & (rankKeys.length - 1)
    }
    0 // unreachable
  }

  /** Rank-order encode (the canonical Sennrich pass structure): for
    * each rank 0..K-1, replace every non-overlapping (l, r) occurrence
    * left to right with token 256+rank. In-place on one working array.
    */
  def encodeBytes(bytes: Array[Byte]): Array[Int] = {
    var n = bytes.length
    val ids = new Array[Int](n)
    var i = 0
    while (i < n) { ids(i) = bytes(i) & 0xff; i += 1 }
    var rank = 0
    while (rank < NumMerges && n > 1) {
      val l = MergeTable(rank)._1
      val r = MergeTable(rank)._2
      val nid = 256 + rank
      var w = 0
      i = 0
      while (i < n) {
        if (i + 1 < n && ids(i) == l && ids(i + 1) == r) {
          ids(w) = nid; i += 2
        } else {
          ids(w) = ids(i); i += 1
        }
        w += 1
      }
      n = w
      rank += 1
    }
    java.util.Arrays.copyOf(ids, n)
  }

  /** GPT-2-style encode: repeatedly find the lowest-ranked pair
    * present and merge all its non-overlapping occurrences left to
    * right. Equivalent to [[encodeBytes]] (see object Scaladoc);
    * kept for the BpeSpec equivalence property, not the hot path.
    */
  def encodeMinRank(bytes: Array[Byte]): Array[Int] = {
    var ids = bytes.map(_ & 0xff)
    var done = false
    while (!done && ids.length > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i + 1 < ids.length) {
        val k = rankOfPair(ids(i), ids(i + 1))
        if (k > 0 && k < best) best = k
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val l = MergeTable(best - 1)._1
        val r = MergeTable(best - 1)._2
        val nid = 255 + best
        val out = new Array[Int](ids.length)
        var w = 0
        i = 0
        while (i < ids.length) {
          if (i + 1 < ids.length && ids(i) == l && ids(i + 1) == r) {
            out(w) = nid; i += 2
          } else {
            out(w) = ids(i); i += 1
          }
          w += 1
        }
        ids = java.util.Arrays.copyOf(out, w)
      }
    }
    ids
  }

  /** HOT-PATH encode: the min-rank construction on a doubly-linked
    * list driven by a (rank, pos) long-keyed binary heap with lazy
    * invalidation — O(n log n) per document INDEPENDENT of the merge
    * count, where the rank-order pass is O(K·n) (at K = 2000 that
    * 10× cost difference is the difference between riding the scan
    * and dominating it). Provably identical to [[encodeBytes]] /
    * [[encodeMinRank]]: popping in (rank, pos) order IS min-rank
    * left-to-right, and a merge can only create candidate pairs of
    * STRICTLY higher rank (any pair containing the new id was trained
    * after the id existed), so no earlier-ordered candidate ever
    * appears after its turn. BpeSpec property-checks the equivalence
    * on the corpus and adversarial random strings.
    */
  def encodeHeap(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length
    if (n == 0) return Array.emptyIntArray
    val ids = new Array[Int](n)
    val nxt = new Array[Int](n)
    val prv = new Array[Int](n)
    var i = 0
    while (i < n) {
      ids(i) = bytes(i) & 0xff
      nxt(i) = i + 1 // n = end sentinel
      prv(i) = i - 1
      i += 1
    }
    // binary min-heap of (rank << 32 | pos) candidate keys
    var heap = new Array[Long](math.max(16, n))
    var hn = 0
    def push(rank: Int, pos: Int): Unit = {
      if (hn == heap.length) heap = java.util.Arrays.copyOf(heap, hn * 2)
      var c = hn
      heap(c) = (rank.toLong << 32) | pos.toLong
      hn += 1
      while (c > 0 && heap((c - 1) >> 1) > heap(c)) {
        val p = (c - 1) >> 1
        val t = heap(p); heap(p) = heap(c); heap(c) = t
        c = p
      }
    }
    def pop(): Long = {
      val top = heap(0)
      hn -= 1
      heap(0) = heap(hn)
      var c = 0
      while (true) {
        val l = 2 * c + 1; val r = l + 1
        var m = c
        if (l < hn && heap(l) < heap(m)) m = l
        if (r < hn && heap(r) < heap(m)) m = r
        if (m == c) return top
        val t = heap(m); heap(m) = heap(c); heap(c) = t
        c = m
      }
      top
    }
    i = 0
    while (i + 1 < n) {
      val k = rankOfPair(ids(i), ids(i + 1))
      if (k > 0) push(k - 1, i)
      i += 1
    }
    var len = n
    while (hn > 0) {
      val key = pop()
      val rank = (key >>> 32).toInt
      val pos = (key & 0xffffffffL).toInt
      val j = nxt(pos)
      // lazy invalidation: the pair must still exist and still match
      if (ids(pos) >= 0 && j < n &&
          ids(pos) == MergeTable(rank)._1 && ids(j) == MergeTable(rank)._2) {
        ids(pos) = 256 + rank
        // unlink j
        val jn = nxt(j)
        ids(j) = -1
        nxt(pos) = jn
        if (jn < n) prv(jn) = pos
        len -= 1
        val p = prv(pos)
        if (p >= 0) {
          val k2 = rankOfPair(ids(p), ids(pos))
          if (k2 > 0) push(k2 - 1, p)
        }
        if (jn < n) {
          val k2 = rankOfPair(ids(pos), ids(jn))
          if (k2 > 0) push(k2 - 1, pos)
        }
      }
    }
    val out = new Array[Int](len)
    var w = 0
    i = 0
    while (i < n) {
      if (ids(i) >= 0) { out(w) = ids(i); w += 1 }
      i += 1
    }
    out
  }

  def encodeIds(text: UTF8String): Array[Int] = encodeHeap(text.getBytes)

  def countTokens(text: UTF8String): Long = encodeIds(text).length.toLong

  /** Position-weighted token-id checksum: Σ id(i)·(i+1) over the
    * encoded sequence. Pins the full token SEQUENCE (ids and order)
    * through the driver's hash compare, not just the count. Bounded:
    * id < 456, len ≤ doc bytes — no overflow for any document under
    * ~10^14 bytes.
    */
  def checksum(text: UTF8String): Long = {
    val ids = encodeIds(text)
    var s = 0L
    var i = 0
    while (i < ids.length) { s += ids(i).toLong * (i + 1); i += 1 }
    s
  }

  def idsArrayData(text: UTF8String): GenericArrayData =
    new GenericArrayData(encodeIds(text))
}

/** Catalyst expressions over [[BpeRuntime]] — one static call each, so
  * they participate in whole-stage codegen like the FastText family.
  */
object Bpe {

  private val RT = "graft.functions.BpeRuntime"

  /** Number of BPE tokens in the text. */
  case class BpeCount(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_bpe_count"
    override protected def nullSafeEval(input: Any): Any =
      BpeRuntime.countTokens(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $RT.countTokens($c);")
    override protected def withNewChildInternal(c: Expression): BpeCount =
      copy(child = c)
  }

  /** Position-weighted checksum of the full token sequence. */
  case class BpeChecksum(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_bpe_checksum"
    override protected def nullSafeEval(input: Any): Any =
      BpeRuntime.checksum(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $RT.checksum($c);")
    override protected def withNewChildInternal(c: Expression): BpeChecksum =
      copy(child = c)
  }

  /** The encoded token-id sequence itself. */
  case class BpeIds(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "graft_bpe_ids"
    override protected def nullSafeEval(input: Any): Any =
      BpeRuntime.idsArrayData(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $RT.idsArrayData($c);")
    override protected def withNewChildInternal(c: Expression): BpeIds =
      copy(child = c)
  }

  def count(c: Column): Column = Glue.column(BpeCount(Glue.expression(c)))
  def checksum(c: Column): Column = Glue.column(BpeChecksum(Glue.expression(c)))
  def ids(c: Column): Column = Glue.column(BpeIds(Glue.expression(c)))
}
