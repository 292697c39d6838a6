package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Glue
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot paths. The
  * [[VectorOps]] zip_with/aggregate forms are interpreted per element;
  * for ANN queries that evaluate millions of 64-dim dot products the
  * boxing dominated the runtime. Values are identical (same
  * left-to-right double accumulation — asserted by FastTextSpec).
  */
object FastVector {

  private def toDoubles(a: ArrayData): Array[Double] = a.toDoubleArray()

  /** Σ aᵢ·bᵢ over two array<double> columns, primitive loop. */
  case class Dot(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"
    override protected def nullSafeEval(l: Any, r: Any): Any = {
      val a = toDoubles(l.asInstanceOf[ArrayData])
      val b = toDoubles(r.asInstanceOf[ArrayData])
      var acc = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { acc += a(i) * b(i); i += 1 }
      acc
    }
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
      extends UnaryExpression with CodegenFallback {
    private val flat: Array[Array[Array[Double]]] =
      planes.map(_.map(_.toArray).toArray).toArray
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_hyperplane_buckets"
    override protected def nullSafeEval(input: Any): Any = {
      val v = toDoubles(input.asInstanceOf[ArrayData])
      val out = new Array[Long](flat.length)
      var t = 0
      while (t < flat.length) {
        val tbl = flat(t)
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
    override protected def withNewChildInternal(c: Expression): HyperplaneBuckets =
      copy(child = c)
  }

  /** L2-normalize an array<float|double> into array<double>; zero
    * vectors map to zeros. Equals VectorOps.normalize.
    */
  case class NormalizeVec(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_normalize"
    // lazy: the child's dataType resolves only after analysis
    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override protected def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val v = if (isFloat) arr.toFloatArray().map(_.toDouble)
              else arr.toDoubleArray()
      var ss = 0.0
      var i = 0
      while (i < v.length) { ss += v(i) * v(i); i += 1 }
      val norm = math.sqrt(ss)
      val out = new Array[Double](v.length)
      if (norm > 0) { i = 0; while (i < v.length) { out(i) = v(i) / norm; i += 1 } }
      new GenericArrayData(out)
    }
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
