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

/** Fused nProbe-nearest-centroid assignment: the cids of the nProbe
  * centroids minimizing squared L2 distance (via the constant-free
  * form `|c|² - 2<v,c>`), ties to the lower cid — bit-identical to
  * sorting `struct(lit(c2) - 2.0*dot, cid)` structs with array_sort
  * and slicing, which is what it replaces: composing k per-centroid
  * [[DotProduct]]s + an array_sort over k structs per row collapses
  * whole-stage codegen past the method limit at quantizer sizes the
  * IVF sizing law requires (k ~ n/cellSize — measured 46 s vs ~8 s at
  * 60k vectors, k=939). One primitive kernel: vector hoisted to
  * double[] once, centroids + their precomputed |c|² as compiled
  * array references, top-nProbe by insertion (nProbe is small).
  *
  * Centroids are sorted by cid at construction so the positional
  * tie-break IS the cid tie-break. Null vector yields null; a short
  * vector zero-pads (the [[DotProduct]] min-length convention). */
case class NearestCellsExpr(child: Expression,
                            centroids: Array[(Int, Array[Double])],
                            nProbe: Int)
    extends UnaryExpression {

  require(nProbe >= 1 && nProbe <= centroids.length,
    "nProbe must be in [1, nCells]")

  private val sorted = centroids.sortBy(_._1)
  private val cids: Array[Int] = sorted.map(_._1)
  private val cents: Array[Array[Double]] = sorted.map(_._2)
  private val c2: Array[Double] =
    cents.map(c => c.map(x => x * x).sum)
  private val dim = if (cents.isEmpty) 0 else cents(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cells expects array<float|double>, got ${other.simpleString}")
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
    val bestD = Array.fill(nProbe)(Double.PositiveInfinity)
    val bestP = new Array[Int](nProbe)
    var p = 0
    while (p < cents.length) {
      val c = cents(p)
      var acc = 0.0
      var j = 0
      while (j < dim) { acc += x(j) * c(j); j += 1 }
      val d = c2(p) - 2.0 * acc
      // position = #entries with d_j <= d (iterating p ascending makes
      // <= the (d, cid)-ascending tie-break)
      var pos = 0
      while (pos < nProbe && bestD(pos) <= d) pos += 1
      if (pos < nProbe) {
        var m = nProbe - 1
        while (m > pos) { bestD(m) = bestD(m - 1); bestP(m) = bestP(m - 1); m -= 1 }
        bestD(pos) = d; bestP(pos) = p
      }
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      bestP.map(cids(_)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val c2Ref = ctx.addReferenceObj("c2", c2, "double[]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "int[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val bd = ctx.freshName("bestD")
      val bp = ctx.freshName("bestP")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val pos = ctx.freshName("pos")
      val m = ctx.freshName("m")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |double[] $x = new double[$dim];
         |for (int $i = 0; $i < $n; $i++) { $x[$i] = (double) $v.$get($i); }
         |double[] $bd = new double[$nProbe];
         |int[] $bp = new int[$nProbe];
         |java.util.Arrays.fill($bd, Double.POSITIVE_INFINITY);
         |for (int $p = 0; $p < ${cents.length}; $p++) {
         |  double[] $c = $centsRef[$p];
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $dim; $j++) { $acc += $x[$j] * $c[$j]; }
         |  double $d = $c2Ref[$p] - 2.0 * $acc;
         |  int $pos = 0;
         |  while ($pos < $nProbe && $bd[$pos] <= $d) $pos++;
         |  if ($pos < $nProbe) {
         |    for (int $m = $nProbe - 1; $m > $pos; $m--) {
         |      $bd[$m] = $bd[$m - 1]; $bp[$m] = $bp[$m - 1];
         |    }
         |    $bd[$pos] = $d; $bp[$pos] = $p;
         |  }
         |}
         |int[] $out = new int[$nProbe];
         |for (int $i = 0; $i < $nProbe; $i++) { $out[$i] = $cidsRef[$bp[$i]]; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused top-nProbe nearest-centroid scan over a centroid CHUNK held in
  * a COLUMN — the broadcast-join form of [[NearestCellsExpr]], for
  * quantizers past driver scale. [[NearestCellsExpr]] embeds the
  * centroid matrix in the plan as a reference object, which caps k at
  * what the driver can collect and ship inside the task binary
  * (~1e6 centroids); here the centroids arrive as ordinary rows
  * (grouped into bounded chunks of `struct(cid, c2, v)`), so they flow
  * through a broadcast exchange like any other build side — spillable,
  * chunked, never a plan constant — and k is bounded by executor
  * storage, not driver heap.
  *
  * Per row: the vector is hoisted to a primitive double[] once, the
  * chunk is scanned with the same constant-free squared-L2 form
  * `c2 - 2<v,c>` and the same ascending-(d, cid) insertion tie-break
  * as [[NearestCellsExpr]] (chunks must be sorted by cid so the
  * positional tie-break IS the cid tie-break). Returns the chunk-local
  * top min(nProbe, chunkLen) as `array<struct<d, cid>>`; the global
  * top-nProbe is an `array_sort` merge of the per-chunk results — any
  * globally-top element is within its own chunk's top, so the merge is
  * lossless, and the d values are bit-identical to the literal kernel
  * (same fold order, same widening), so the merged assignment equals
  * [[NearestCellsExpr]]'s on the same centroid set.
  *
  * Null vector or null chunk yields null; short vectors zero-pad (the
  * [[DotProduct]] min-length convention — a skipped `x[j]*c[j]` term
  * adds 0.0, which cannot change the accumulated d). */
case class NearestCellsChunkExpr(left: Expression, right: Expression,
                                 nProbe: Int)
    extends BinaryExpression {

  require(nProbe >= 1, "nProbe must be positive")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("d", DoubleType, nullable = false),
      StructField("cid", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def vecOk(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val chunkOk = right.dataType match {
      case ArrayType(StructType(Array(
        StructField(_, LongType, _, _),
        StructField(_, DoubleType, _, _),
        StructField(_, ct, _, _))), _) => vecOk(ct)
      case _ => false
    }
    if (vecOk(left.dataType) && chunkOk)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"nearest_cells_chunk expects (array<float|double>, " +
          s"array<struct<long, double, array<float|double>>>), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  // lazy: the interpreted path reads these per evaluated ROW — a def
  // would re-walk the DataType cast chain for every row of every chunk.
  // @transient so a serialized copy re-derives them from the child
  // types instead of shipping cached booleans.
  @transient private lazy val vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val centIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fields(2).dataType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val ch = b.asInstanceOf[ArrayData]
    val vlen = v.numElements()
    val x = new Array[Double](vlen)
    var i = 0
    while (i < vlen) {
      x(i) = if (vecIsFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val m = ch.numElements()
    val take = math.min(nProbe, m)
    val bestD = Array.fill(nProbe)(Double.PositiveInfinity)
    val bestC = new Array[Long](nProbe)
    var p = 0
    while (p < m) {
      val row = ch.getStruct(p, 3)
      val c = row.getArray(2)
      val n = math.min(vlen, c.numElements())
      var acc = 0.0
      var j = 0
      while (j < n) {
        acc += x(j) * (if (centIsFloat) c.getFloat(j).toDouble else c.getDouble(j))
        j += 1
      }
      val d = row.getDouble(1) - 2.0 * acc
      var pos = 0
      while (pos < nProbe && bestD(pos) <= d) pos += 1
      if (pos < nProbe) {
        var q = nProbe - 1
        while (q > pos) { bestD(q) = bestD(q - 1); bestC(q) = bestC(q - 1); q -= 1 }
        bestD(pos) = d; bestC(pos) = row.getLong(0)
      }
      p += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.tabulate[Any](take) { i =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](bestD(i), bestC(i)))
      })
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vGet = if (vecIsFloat) "getFloat" else "getDouble"
    val cGet = if (centIsFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (v, ch) => {
      val vlen = ctx.freshName("vlen")
      val x = ctx.freshName("x")
      val m = ctx.freshName("m")
      val take = ctx.freshName("take")
      val bd = ctx.freshName("bestD")
      val bc = ctx.freshName("bestC")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val pos = ctx.freshName("pos")
      val q = ctx.freshName("q")
      val row = ctx.freshName("row")
      val c = ctx.freshName("c")
      val out = ctx.freshName("out")
      s"""
         |int $vlen = $v.numElements();
         |double[] $x = new double[$vlen];
         |for (int $i = 0; $i < $vlen; $i++) { $x[$i] = (double) $v.$vGet($i); }
         |int $m = $ch.numElements();
         |int $take = java.lang.Math.min($nProbe, $m);
         |double[] $bd = new double[$nProbe];
         |long[] $bc = new long[$nProbe];
         |java.util.Arrays.fill($bd, Double.POSITIVE_INFINITY);
         |for (int $p = 0; $p < $m; $p++) {
         |  org.apache.spark.sql.catalyst.InternalRow $row = $ch.getStruct($p, 3);
         |  org.apache.spark.sql.catalyst.util.ArrayData $c = $row.getArray(2);
         |  int $n = java.lang.Math.min($vlen, $c.numElements());
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $acc += $x[$j] * ((double) $c.$cGet($j));
         |  }
         |  double $d = $row.getDouble(1) - 2.0 * $acc;
         |  int $pos = 0;
         |  while ($pos < $nProbe && $bd[$pos] <= $d) $pos++;
         |  if ($pos < $nProbe) {
         |    for (int $q = $nProbe - 1; $q > $pos; $q--) {
         |      $bd[$q] = $bd[$q - 1]; $bc[$q] = $bc[$q - 1];
         |    }
         |    $bd[$pos] = $d; $bc[$pos] = $row.getLong(0);
         |  }
         |}
         |Object[] $out = new Object[$take];
         |for (int $i = 0; $i < $take; $i++) {
         |  $out[$i] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{$bd[$i], $bc[$i]});
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dense matrix–vector product y = R·x with the matrix as a plan
  * constant — the kernel that applies a learned linear preprocessing
  * (PCA projection, whitening, an OPQ rotation) to an embedding
  * column in one codegen pass. R is d_out×d_in doubles (64×64 = 32 KB
  * — constant-size plan state at any corpus scale, the PQ-codebook
  * argument). Row dots are the family's 0.0-init ascending folds.
  * Null vector yields null; short vectors zero-pad. */
case class MatVecExpr(child: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  require(matrix.nonEmpty && matrix.forall(_.length == matrix(0).length),
    "matrix must be rectangular and non-empty")
  private val dOut = matrix.length
  private val dIn = matrix(0).length

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"mat_vec expects array<float|double>, got ${other.simpleString}")
    }

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = math.min(v.numElements(), dIn)
    val x = new Array[Double](dIn)
    var i = 0
    while (i < n) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val y = new Array[Double](dOut)
    var r = 0
    while (r < dOut) {
      val row = matrix(r)
      var acc = 0.0
      var j = 0
      while (j < dIn) { acc += row(j) * x(j); j += 1 }
      y(r) = acc
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("matVec", matrix, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val i = ctx.freshName("i")
      val r = ctx.freshName("r")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val row = ctx.freshName("row")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dIn);
         |double[] $x = new double[$dIn];
         |for (int $i = 0; $i < $n; $i++) { $x[$i] = (double) $v.$get($i); }
         |double[] $y = new double[$dOut];
         |for (int $r = 0; $r < $dOut; $r++) {
         |  double[] $row = $matRef[$r];
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $dIn; $j++) { $acc += $row[$j] * $x[$j]; }
         |  $y[$r] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($y);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused product-quantization encoder: one vector → one packed code
  * word, all m subspaces in a single kernel.
  *
  * Product quantization (the FAISS `IndexPQ`/`IndexIVFPQ` layout,
  * Jégou/Douze/Schmid 2011) splits a d-dim vector into m contiguous
  * subspaces of dsub = d/m and quantizes each independently against a
  * ksub-entry sub-codebook; the vector is then stored as m small codes
  * (here bitsPerCode bits each, packed little-endian into ONE
  * non-negative long: code_j occupies bits [j·bits, (j+1)·bits)). At
  * 64-dim float32 with m=8/ksub=16 that is 256 B → 4 B — the memory /
  * scan-bandwidth lever that makes billion-vector similarity feasible.
  *
  * The codebooks are a plan constant — deliberately, and unlike the
  * IVF centroid case this is NOT a scale ceiling: codebook size is
  * m·ksub·dsub = d·ksub doubles, INDEPENDENT of corpus size (64-dim,
  * ksub=16 ⇒ 8 KB). Shipping it inside the task binary is exactly what
  * FAISS does with trained PQ codebooks.
  *
  * Arithmetic (oracle-replayable): per subspace j the winning code is
  * argmin_c ( c2[j][c] − 2·Σ_{i<dsub} x[j·dsub+i]·cb[j][c][i] ) with a
  * strict-< first-wins scan in ascending c (= the ORDER BY d, code
  * tie-break), the dot a 0.0-init ascending fold and c2 the same fold
  * over the squared sub-centroid — every term bit-identical to the
  * DuckDB replay over `::DOUBLE[]` slices. Short vectors zero-pad (the
  * [[DotProduct]] min-length convention); null vector yields null. */
case class PqEncodeExpr(child: Expression,
                        codebooks: Array[Array[Array[Double]]],
                        bitsPerCode: Int)
    extends UnaryExpression {

  private val m = codebooks.length
  require(m >= 1, "need at least one subspace")
  private val ksub = codebooks(0).length
  private val dsub = codebooks(0)(0).length
  require(codebooks.forall(cb => cb.length == ksub && cb.forall(_.length == dsub)),
    "ragged codebooks: every subspace needs ksub entries of dsub dims")
  require(ksub <= (1 << bitsPerCode),
    s"ksub=$ksub does not fit bitsPerCode=$bitsPerCode")
  require(m.toLong * bitsPerCode <= 63,
    s"m=$m x $bitsPerCode bits overflows a non-negative long")
  private val dim = m * dsub

  // flattened [m*ksub][dsub] (row j*ksub+c) + its |c|^2 per entry;
  // c2 is the same 0.0-init ascending fold the oracle's list_reduce
  // over the squared slice performs
  private val flat: Array[Array[Double]] = codebooks.flatten
  private val c2: Array[Double] = flat.map { cv =>
    var a = 0.0; var i = 0
    while (i < dsub) { a += cv(i) * cv(i); i += 1 }
    a
  }

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<float|double>, got ${other.simpleString}")
    }

  @transient private lazy val isFloat: Boolean =
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
    var packed = 0L
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val cv = flat(j * ksub + c)
        var acc = 0.0
        var i2 = 0
        while (i2 < dsub) { acc += x(j * dsub + i2) * cv(i2); i2 += 1 }
        val d = c2(j * ksub + c) - 2.0 * acc
        if (d < best) { best = d; bestC = c }
        c += 1
      }
      packed |= bestC.toLong << (bitsPerCode * j)
      j += 1
    }
    packed
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[][]")
    val c2Ref = ctx.addReferenceObj("pqC2", c2, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i2 = ctx.freshName("i2")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val packed = ctx.freshName("packed")
      val cv = ctx.freshName("cv")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |double[] $x = new double[$dim];
         |for (int $i = 0; $i < $n; $i++) { $x[$i] = (double) $v.$get($i); }
         |long $packed = 0L;
         |for (int $j = 0; $j < $m; $j++) {
         |  double $best = Double.POSITIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double[] $cv = $flatRef[$j * $ksub + $c];
         |    double $acc = 0.0;
         |    for (int $i2 = 0; $i2 < $dsub; $i2++) {
         |      $acc += $x[$j * $dsub + $i2] * $cv[$i2];
         |    }
         |    double $d = $c2Ref[$j * $ksub + $c] - 2.0 * $acc;
         |    if ($d < $best) { $best = $d; $bestC = $c; }
         |  }
         |  $packed |= ((long) $bestC) << ($bitsPerCode * $j);
         |}
         |${ev.value} = $packed;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table: all m·ksub sub-distances of one query
  * vector against the PQ codebooks, in one kernel — entry
  * [j·ksub + c] = c2[j][c] − 2·⟨q_sub(j), cb[j][c]⟩, the identical
  * arithmetic (same fold order, same widening) as [[PqEncodeExpr]]'s
  * assignment scan, so the table entries are bit-identical to the
  * distances the oracle recomputes per (query, code, subspace).
  *
  * Computed ONCE per query row (O(d·ksub) work) and broadcast with the
  * query; the corpus-side scan then costs m array reads + m adds per
  * vector ([[PqAdcScoreExpr]]) instead of a d-dim float rerank — the
  * asymmetric-distance trick that makes PQ scans memory-bound rather
  * than arithmetic-bound. Null vector yields null; short vectors
  * zero-pad. */
case class PqLutExpr(child: Expression,
                     codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private val m = codebooks.length
  require(m >= 1, "need at least one subspace")
  private val ksub = codebooks(0).length
  private val dsub = codebooks(0)(0).length
  require(codebooks.forall(cb => cb.length == ksub && cb.forall(_.length == dsub)),
    "ragged codebooks: every subspace needs ksub entries of dsub dims")
  private val dim = m * dsub

  private val flat: Array[Array[Double]] = codebooks.flatten
  private val c2: Array[Double] = flat.map { cv =>
    var a = 0.0; var i = 0
    while (i < dsub) { a += cv(i) * cv(i); i += 1 }
    a
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_lut expects array<float|double>, got ${other.simpleString}")
    }

  @transient private lazy val isFloat: Boolean =
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
    val lut = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val cv = flat(j * ksub + c)
        var acc = 0.0
        var i2 = 0
        while (i2 < dsub) { acc += x(j * dsub + i2) * cv(i2); i2 += 1 }
        lut(j * ksub + c) = c2(j * ksub + c) - 2.0 * acc
        c += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[][]")
    val c2Ref = ctx.addReferenceObj("pqC2", c2, "double[]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val i2 = ctx.freshName("i2")
      val acc = ctx.freshName("acc")
      val lut = ctx.freshName("lut")
      val cv = ctx.freshName("cv")
      s"""
         |int $n = java.lang.Math.min($v.numElements(), $dim);
         |double[] $x = new double[$dim];
         |for (int $i = 0; $i < $n; $i++) { $x[$i] = (double) $v.$get($i); }
         |double[] $lut = new double[${m * ksub}];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double[] $cv = $flatRef[$j * $ksub + $c];
         |    double $acc = 0.0;
         |    for (int $i2 = 0; $i2 < $dsub; $i2++) {
         |      $acc += $x[$j * $dsub + $i2] * $cv[$i2];
         |    }
         |    $lut[$j * $ksub + $c] = $c2Ref[$j * $ksub + $c] - 2.0 * $acc;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The ADC scan kernel: approximate squared-L2 of (query, coded
  * vector) as Σ_{j<m} lut[j·ksub + code_j], codes unpacked from the
  * [[PqEncodeExpr]] word with shift/mask, accumulated in ascending j
  * with a 0.0-init fold — replayed in the oracle as `list_reduce` over
  * the j-ORDERED per-subspace distance list, so the score is
  * bit-identical cross-engine. m adds + m array reads per corpus row:
  * the per-vector cost of a PQ scan, independent of d. Null lut or
  * null code yields null. */
case class PqAdcScoreExpr(left: Expression, right: Expression,
                          m: Int, ksub: Int, bitsPerCode: Int)
    extends BinaryExpression {

  require(m >= 1 && ksub >= 1, "need at least one subspace and one code")
  require(ksub <= (1 << bitsPerCode),
    s"ksub=$ksub does not fit bitsPerCode=$bitsPerCode")
  private val mask = (1L << bitsPerCode) - 1L

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_score expects (array<double>, bigint), got " +
            s"${l.simpleString}, ${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val lut = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[Long]
    var acc = 0.0
    var j = 0
    while (j < m) {
      val c = ((code >>> (bitsPerCode * j)) & mask).toInt
      acc += lut.getDouble(j * ksub + c)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (lut, code) => {
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |double $acc = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  int $c = (int) (($code >>> ($bitsPerCode * $j)) & ${mask}L);
         |  $acc += $lut.getDouble($j * $ksub + $c);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused int8 symmetric quantization: per-vector scale = max |x| and
  * the quantized codes floor(x/scale·127 + 0.5), in ONE array walk
  * returning struct(q_scale double, q_emb array<int>).
  *
  * The Column formulation needed two corpus-sized `transform`
  * projections (abs for the max, then the quantize lambda) — both
  * HigherOrderFunctions, i.e. CodegenFallback, and the scale had to
  * be materialized in a separate select first because Catalyst does
  * no CSE inside lambda bodies. The kernel keeps the stage in
  * whole-stage codegen and reads the input once. IEEE order matches
  * the legacy Columns and the q56 oracle exactly: abs on the widened
  * double, left-assoc ((x/s)·127)+0.5 under floor, zero-scale rows
  * quantize to all-zero codes. Null array produces null; elements
  * assumed non-null (embedding vectors).
  *
  * Degenerate-input contract (diverges from the replaced `array_max`
  * Columns — fine for the non-empty finite embeddings this serves,
  * stated here so no caller assumes parity): an EMPTY array yields
  * q_scale = 0.0 and empty codes (array_max gave NULL, nulling the
  * whole struct), and NaN elements are ignored by the max loop
  * (`NaN > acc` is false), so an all-NaN vector also takes the
  * zero-scale path (array_max treats NaN as greatest, so the old
  * form produced a NaN scale instead). */
case class QuantizeInt8Expr(child: Expression) extends UnaryExpression {

  override def prettyName: String = "quantize_int8"

  override def dataType: DataType = StructType(Seq(
    StructField("q_scale", DoubleType, nullable = false),
    StructField("q_emb", ArrayType(IntegerType, containsNull = false),
      nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_int8 expects array<float|double>, got ${other.simpleString}")
    }

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any =
    QuantizeInt8Expr.quantize(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} =
      |  graft.functions.QuantizeInt8Expr.quantize($c, $isFloat);
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QuantizeInt8Expr {
  /** The shared eval/codegen kernel. */
  def quantize(v: ArrayData,
               isFloat: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    val x = new Array[Double](n)
    var s = 0.0
    var i = 0
    while (i < n) {
      x(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      val a = math.abs(x(i))
      if (a > s) s = a
      i += 1
    }
    val q = new Array[Int](n)
    if (s != 0.0) {
      i = 0
      while (i < n) {
        q(i) = math.floor(x(i) / s * 127.0 + 0.5).toInt
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](s,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(q)))
  }
}

/** Inverse of [[QuantizeInt8Expr]]: q·scale/127 per element, one walk
  * (the Column `transform` form was CodegenFallback). Same IEEE order
  * as the legacy lambda and the q56 oracle: (q·s)/127. */
case class DequantizeInt8Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "dequantize_int8"

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType | LongType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dequantize_int8 expects (array<int|bigint>, double), got " +
            s"${l.simpleString}, ${r.simpleString}")
    }

  @transient private lazy val isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(q: Any, s: Any): Any =
    DequantizeInt8Expr.dequantize(q.asInstanceOf[ArrayData],
      s.asInstanceOf[Double], isLong)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, s) => s"""
      |${ev.value} =
      |  graft.functions.DequantizeInt8Expr.dequantize($q, $s, $isLong);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DequantizeInt8Expr {
  /** The shared eval/codegen kernel. */
  def dequantize(q: ArrayData, s: Double, isLong: Boolean): ArrayData = {
    val n = q.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val qi = if (isLong) q.getLong(i).toDouble else q.getInt(i).toDouble
      out(i) = qi * s / 127.0
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
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

  /** Column API for [[NearestCellsExpr]]. */
  def nearestCells(v: Column, centroids: Array[(Int, Seq[Double])],
                   nProbe: Int): Column =
    ColumnBridge.column(NearestCellsExpr(
      ColumnBridge.expression(v),
      centroids.map { case (cid, c) => (cid, c.toArray) }, nProbe))

  /** Column API for [[NearestCellsChunkExpr]]. */
  def nearestCellsInChunk(v: Column, chunk: Column, nProbe: Int): Column =
    ColumnBridge.column(NearestCellsChunkExpr(
      ColumnBridge.expression(v), ColumnBridge.expression(chunk), nProbe))

  /** Column API for [[MatVecExpr]]. */
  def matVec(v: Column, matrix: Array[Array[Double]]): Column =
    ColumnBridge.column(MatVecExpr(ColumnBridge.expression(v), matrix))

  /** Column API for [[PqEncodeExpr]]. */
  def pqEncode(v: Column, codebooks: Array[Array[Array[Double]]],
               bitsPerCode: Int): Column =
    ColumnBridge.column(PqEncodeExpr(
      ColumnBridge.expression(v), codebooks, bitsPerCode))

  /** Column API for [[PqLutExpr]]. */
  def pqLut(v: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ColumnBridge.column(PqLutExpr(ColumnBridge.expression(v), codebooks))

  /** Column API for [[PqAdcScoreExpr]]. */
  def pqAdcScore(lut: Column, code: Column, m: Int, ksub: Int,
                 bitsPerCode: Int): Column =
    ColumnBridge.column(PqAdcScoreExpr(
      ColumnBridge.expression(lut), ColumnBridge.expression(code),
      m, ksub, bitsPerCode))

  /** Column API for [[QuantizeInt8Expr]]. */
  def quantizeInt8(v: Column): Column =
    ColumnBridge.column(QuantizeInt8Expr(ColumnBridge.expression(v)))

  /** Column API for [[DequantizeInt8Expr]]. */
  def dequantizeInt8(q: Column, scale: Column): Column =
    ColumnBridge.column(DequantizeInt8Expr(
      ColumnBridge.expression(q), ColumnBridge.expression(scale)))
}
