package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Glue
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot paths. The
  * [[VectorOps]] zip_with/aggregate forms are interpreted per element;
  * for ANN queries that evaluate millions of 64-dim dot products the
  * boxing dominated the runtime. Values are identical (same
  * left-to-right double accumulation — asserted by FastTextSpec).
  *
  * All implement `doGenCode` as one static call into
  * [[FastVectorRuntime]] so whole-stage codegen spans stay unbroken.
  */
object FastVector {

  private val RT = "graft.functions.FastVectorRuntime"

  /** Σ aᵢ·bᵢ over two array<double> columns, primitive loop. Mismatched
    * lengths raise at runtime (silent min-length truncation would make a
    * wrong similarity look plausible); non-array / non-double inputs are
    * an analysis error — graft_dot is SQL-exposed via GraftExtensions,
    * so type errors must surface at analysis, not as ClassCastException.
    */
  case class Dot(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[Glue.AbstractType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"
    override protected def nullSafeEval(l: Any, r: Any): Any =
      FastVectorRuntime.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $RT.dot($a, $b);")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): Dot = copy(left = l, right = r)
  }

  /** All hyperplane-LSH bucket ids at once: planes(t)(bit)(dim) are
    * compile-time constants baked into the expression, the vector is
    * read once, and every (table, bit) sign lands in a primitive loop.
    * Bucket t equals VectorOps.hyperplaneBucket(vec, planes(t)).
    */
  case class HyperplaneBuckets(child: Expression,
      planes: Seq[Seq[Seq[Double]]])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[Glue.AbstractType] =
      Seq(ArrayType(DoubleType))
    private lazy val flat: Array[Array[Array[Double]]] =
      planes.map(_.map(_.toArray).toArray).toArray
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_hyperplane_buckets"
    override protected def nullSafeEval(input: Any): Any =
      FastVectorRuntime.hyperplaneBuckets(input.asInstanceOf[ArrayData], flat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val pRef = ctx.addReferenceObj("planes", flat, "double[][][]")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $RT.hyperplaneBuckets($c, $pRef);")
    }
    override protected def withNewChildInternal(c: Expression): HyperplaneBuckets =
      copy(child = c)
  }

  /** L2-normalize an array<float|double> into array<double>; zero
    * vectors map to zeros. Equals VectorOps.normalize.
    */
  case class NormalizeVec(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[Glue.AbstractType] =
      Seq(Glue.typeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
    // lazy: the child's dataType resolves only after analysis
    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_normalize"
    override protected def nullSafeEval(input: Any): Any =
      FastVectorRuntime.normalize(input.asInstanceOf[ArrayData], isFloat)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = $RT.normalize($c, $isFloat);")
    override protected def withNewChildInternal(c: Expression): NormalizeVec =
      copy(child = c)
  }

  /** Average-pool a binary payload to a fixed `cells`-wide grid of mean
    * byte values — the resize/feature-extract primitive for multimodal
    * columns (see [[graft.operators.Multimodal]]); codegen'd like the
    * rest of the hot path.
    */
  case class BytePool(child: Expression, cells: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(cells > 0, s"graft_byte_pool: cells must be positive, got $cells")
    override def inputTypes: Seq[Glue.AbstractType] = Seq(BinaryType)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_byte_pool"
    override protected def nullSafeEval(input: Any): Any =
      FastVectorRuntime.bytePool(input.asInstanceOf[Array[Byte]], cells)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $RT.bytePool($c, $cells);")
    override protected def withNewChildInternal(c: Expression): BytePool =
      copy(child = c)
  }

  /** Fused audio window features over a byte slice of a binary column:
    * struct(sum_bytes, energy_scaled, zero_crossings) in one O(n) pass
    * (see [[FastVectorRuntime.audioFeatures]]). Replaces the m10 plan's
    * per-character `transform(sequence(1,n), i -> ascii(substring(w,i,1)))`
    * which was O(n²) per window — `substring` walks the UTF8String from
    * the start on every call.
    */
  case class AudioFeatures(first: Expression, second: Expression,
      third: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[Glue.AbstractType] =
      Seq(BinaryType, LongType, IntegerType)
    override def dataType: DataType = StructType(Seq(
      StructField("sum_bytes", LongType, nullable = false),
      StructField("energy_scaled", LongType, nullable = false),
      StructField("zero_crossings", LongType, nullable = false)))
    override def prettyName: String = "graft_audio_features"
    override protected def nullSafeEval(p: Any, o: Any, l: Any): Any =
      FastVectorRuntime.audioFeatures(p.asInstanceOf[Array[Byte]],
        o.asInstanceOf[Long], l.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev,
        (p, o, l) => s"${ev.value} = $RT.audioFeatures($p, $o, $l);")
    override protected def withNewChildrenInternal(
        f: Expression, s: Expression, t: Expression): AudioFeatures =
      copy(first = f, second = s, third = t)
  }

  /** Elementwise sum of array<double> vectors as ONE typed aggregate —
    * the centroid/mean building block. The alternative plan shape
    * (posexplode to (id, dim, x) → groupBy(id, dim) → collect_list →
    * array_sort) multiplies the shuffle by the vector dimension (64×
    * the rows at dim 64); this aggregate keeps one partial-aggregated
    * buffer of `dim` doubles per group — map-side combine works, and
    * shuffle traffic is |groups| × dim, independent of corpus size.
    */
  case class VectorSum(child: Expression,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Array[Double]]
      with ExpectsInputTypes {
    override def inputTypes: Seq[Glue.AbstractType] =
      Seq(ArrayType(DoubleType))
    override def children: Seq[Expression] = Seq(child)
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "graft_vector_sum"

    // Empty array = "no input yet"; sized lazily from the first vector.
    override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

    override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
      val v = child.eval(input)
      if (v == null) return buf
      val arr = v.asInstanceOf[ArrayData].toDoubleArray()
      if (buf.isEmpty) arr.clone()
      else {
        require(buf.length == arr.length,
          s"graft_vector_sum: dim mismatch (${buf.length} vs ${arr.length})")
        var i = 0
        while (i < buf.length) { buf(i) += arr(i); i += 1 }
        buf
      }
    }

    override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
      if (b1.isEmpty) b2
      else if (b2.isEmpty) b1
      else {
        require(b1.length == b2.length,
          s"graft_vector_sum: dim mismatch (${b1.length} vs ${b2.length})")
        var i = 0
        while (i < b1.length) { b1(i) += b2(i); i += 1 }
        b1
      }

    override def eval(buf: Array[Double]): Any =
      if (buf.isEmpty) null else new GenericArrayData(buf)

    override def serialize(buf: Array[Double]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * buf.length)
      bb.putInt(buf.length)
      buf.foreach(bb.putDouble)
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): Array[Double] = {
      val bb = ByteBuffer.wrap(bytes)
      val out = new Array[Double](bb.getInt())
      var i = 0
      while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
      out
    }

    override def withNewMutableAggBufferOffset(o: Int): VectorSum =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): VectorSum =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): VectorSum = copy(child = c.head)
  }

  // Column-facing wrappers.
  def dot(a: Column, b: Column): Column =
    Glue.column(Dot(Glue.expression(a), Glue.expression(b)))
  def hyperplaneBuckets(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    Glue.column(HyperplaneBuckets(Glue.expression(vec), planes))
  def normalize(vec: Column): Column =
    Glue.column(NormalizeVec(Glue.expression(vec)))
  def vectorSum(vec: Column): Column =
    Glue.column(VectorSum(Glue.expression(vec)).toAggregateExpression())
  def bytePool(payload: Column, cells: Int): Column =
    Glue.column(BytePool(Glue.expression(payload), cells))
  def audioFeatures(payload: Column, off: Column, len: Column): Column =
    Glue.column(AudioFeatures(Glue.expression(payload),
      Glue.expression(off), Glue.expression(len)))
}
