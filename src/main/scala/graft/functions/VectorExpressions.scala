package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd dot product over two numeric arrays.
  *
  * Spark's higher-order `zip_with`/`aggregate` combination evaluates its
  * lambda interpreted, one element at a time (HigherOrderFunction is
  * CodegenFallback) — ~1000x the cost of a fused loop on a 64-dim
  * vector. This expression emits a tight primitive loop in whole-stage
  * codegen instead, preserving the exact IEEE semantics of the
  * sequential left fold `((0 + a0*b0) + a1*b1) + ...` with elements
  * widened to double — bit-identical to the DuckDB oracle's
  * `list_reduce(list_transform(...), (x,y) -> x+y)` over `::DOUBLE[]`.
  *
  * Null arrays produce null; elements are assumed non-null (embedding
  * vectors). Length mismatch uses the shorter length.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dot_product expects array<float|double>, got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val rGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused multi-word hyperplane-LSH signature: all nPlanes sign bits of
  * one vector in a single kernel, packed 64 per long (bit p of word
  * p/64 set iff the sequential-fold dot of the vector against plane p
  * is >= 0 — bit-identical to summing [[DotProduct]] sign bits times
  * powers of two, which is what the DuckDB oracle replays).
  *
  * Why not compose from [[DotProduct]]: a 128-plane signature written
  * as 128 dot expressions makes ~16k megamorphic ArrayData accessor
  * calls per row against boxed literal planes — measured ~390 us/row
  * at 128 planes, which DOMINATED the LSH pair path (the planes are
  * the corpus-size knob, so this cost grows exactly when the corpus
  * does). This kernel hoists the vector into a primitive double[]
  * once, keeps the planes as a compiled double[][] reference, and
  * runs the whole plane loop as JIT-able primitive arithmetic —
  * ~100x per row.
  *
  * Null array produces null; elements assumed non-null (embedding
  * vectors). A vector shorter than a plane contributes zeros for the
  * missing elements (the min-length semantics of [[DotProduct]]).
  */
case class LshSignatureWordsExpr(child: Expression,
                                 planes: Array[Array[Double]])
    extends UnaryExpression {

  private val dim = if (planes.isEmpty) 0 else planes(0).length
  private val nWords = (planes.length + 63) / 64

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_sig_words expects array<float|double>, got ${other.simpleString}")
    }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dim)
    val x = new Array[Double](dim)
    var i = 0
    while (i < n) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val words = new Array[Long](nWords)
    var p = 0
    while (p < planes.length) {
      val pl = planes(p)
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += x(j) * pl(j); j += 1 }
      if (acc >= 0.0) words(p >>> 6) |= 1L << (p & 63)
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(words)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val words = ctx.freshName("words")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val pl = ctx.freshName("pl")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |double[] $x = new double[$dim];
         |for (int $i = 0; $i < $n; $i++) { $x[$i] = (double) $v.$get($i); }
         |long[] $words = new long[$nWords];
         |for (int $p = 0; $p < ${planes.length}; $p++) {
         |  double[] $pl = $planesRef[$p];
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) { $acc += $x[$j] * $pl[$j]; }
         |  if ($acc >= 0.0) { $words[$p >>> 6] |= (1L << ($p & 63)); }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($words);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Column API for [[LshSignatureWordsExpr]]. */
  def lshSigWords(v: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(LshSignatureWordsExpr(
      ColumnBridge.expression(v), planes))
}
