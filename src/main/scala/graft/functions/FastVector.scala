package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
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

  // Column-facing wrappers.
  def dot(a: Column, b: Column): Column =
    Glue.column(Dot(Glue.expression(a), Glue.expression(b)))
  def hyperplaneBuckets(vec: Column, planes: Seq[Seq[Seq[Double]]]): Column =
    Glue.column(HyperplaneBuckets(Glue.expression(vec), planes))
  def normalize(vec: Column): Column =
    Glue.column(NormalizeVec(Glue.expression(vec)))
}
