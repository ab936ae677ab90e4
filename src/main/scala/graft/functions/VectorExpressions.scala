package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native sequential-order dot product over two numeric arrays.
  *
  * Replaces the `aggregate(zip_with(...))` formulation: Spark's
  * higher-order functions are CodegenFallback — every pair-scoring row
  * in the ANN/near-dup joins paid interpreted lambda dispatch per
  * element. This expression generates a tight Java loop inside
  * whole-stage codegen.
  *
  * Float policy: accumulation is one double sum in ascending index
  * order — the SAME operation sequence as the HOF form and the DuckDB
  * oracle's `list_dot_product`, so results stay bit-identical and the
  * driver gate's hash compare is unaffected.
  */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // the result is null for length-mismatched inputs / null elements even
  // when the input columns themselves are non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
        if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float|double> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  // Null semantics match the replaced `aggregate(zip_with(...))` form
  // exactly: zip_with pads a length mismatch with nulls and any null
  // element nulls the whole sum — so mismatched lengths or null slots
  // yield NULL here too (a truncated embedding must stay excluded from
  // ranking, not get a bogus partial score).
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getL = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val getR = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.$getL($i) * (double) $b.$getR($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }
}

/** Fused L2 norm: `sqrt(Σ v_i²)` in ONE array traversal.
  *
  * `sqrt(DotProduct(v, v))` evaluates the child array twice (codegen
  * materializes both operand slots) and walks it twice; every ANN/near-
  * dup query computes a norm per corpus row before its pair join, so
  * the traversal is on the per-row hot path. Accumulation is the SAME
  * double sequence (ascending index, one running sum, then sqrt), so
  * results are bit-identical to the composed form and the DuckDB
  * oracle — the driver gate's hash compare is unaffected.
  *
  * Null semantics mirror the composed form: null array or any null
  * element → NULL (a truncated embedding stays excluded from ranking).
  */
final case class NormL2(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "graft_norm_l2"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float|double> argument, " +
          s"got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val f = isFloat
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val v = if (f) x.getFloat(i).toDouble else x.getDouble(i)
      s += v * v
      i += 1
    }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $v = (double) $a.$get($i);
         |  $s += $v * $v;
         |}
         |if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($s);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NormL2 =
    copy(child = newChild)
}

object NormL2 {
  def norm(v: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(NormL2(ColumnBridge.expression(v)))
  }
}

/** All hyperplane sign-bits of an LSH bucket in ONE traversal set.
  *
  * The composed form builds `planes` separate [[DotProduct]]s against
  * literal plane arrays — per row that is `planes` ArrayData walks of
  * the vector plus `planes` CASE branches. This expression holds the
  * plane matrix as primitive `double[][]` (codegen reference object)
  * and emits the whole bucket in one nested loop.
  *
  * Bit parity with the composed form is exact, INCLUDING its null
  * quirk: `when(dot >= 0, bit).otherwise(0)` maps a null dot (null
  * vector, null element, or dimension mismatch vs the plane) to an
  * unset bit, so such rows land in bucket 0 rather than NULL. Per-plane
  * accumulation is the same ascending-index double sum, so bucket ids
  * match the composed form and the DuckDB oracle bit-for-bit.
  */
final case class HyperplaneBuckets(
    child: Expression,
    planes: Seq[Seq[Double]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.forall(_.length == planes.head.length)
    && planes.head.nonEmpty,
    s"$prettyName requires a non-empty rectangular plane matrix, " +
      s"got ${planes.size} rows of lengths ${planes.map(_.length).distinct.mkString(",")}")

  @transient private lazy val matrix: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def dataType: DataType = LongType
  // null/mismatched inputs produce bucket 0, never NULL (see scaladoc)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hyperplane_buckets"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case _ =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float|double> argument, " +
          s"got ${child.dataType.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val a = child.eval(input)
    if (a == null) return 0L
    bucketOf(a.asInstanceOf[ArrayData], isFloat, matrix)
  }

  private def bucketOf(x: ArrayData, f: Boolean, m: Array[Array[Double]]): Long = {
    val dim = if (m.length == 0) 0 else m(0).length
    val n = x.numElements()
    if (n != dim) return 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return 0L
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < m.length) {
      val plane = m(p)
      var s = 0.0
      var j = 0
      while (j < n) {
        val v = if (f) x.getFloat(j).toDouble else x.getDouble(j)
        s += v * plane(j)
        j += 1
      }
      // !(s < 0), not s >= 0: Spark's `dot >= 0` routes doubles through
      // SQLOrderingUtil.compareDoubles, where NaN >= 0 is TRUE (NaN
      // orders above everything, as in DuckDB) — a NaN dot must SET the
      // bit to match the composed form and the oracle. (-0.0 sets the
      // bit under both formulations.)
      if (!(s < 0)) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("hyperplaneBuckets", this, classOf[HyperplaneBuckets].getName)
    val c = child.genCode(ctx)
    val resultCode =
      code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L : $self.bucketOfJava(${c.value});
      """
    ev.copy(code = resultCode, isNull = FalseLiteral)
  }

  /** Codegen entry point (public so generated code can call it). */
  def bucketOfJava(x: ArrayData): Long = bucketOf(x, isFloat, matrix)

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

object HyperplaneBuckets {
  def bucket(v: Column, planes: Seq[Seq[Double]]): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(HyperplaneBuckets(ColumnBridge.expression(v), planes))
  }
}
