package graft.functions

import graft.SparkSpec
import graft.functions.VectorFunctions.dotProduct
import org.apache.spark.sql.functions._

/** The custom codegen'd DotProduct expression: equivalence with the
  * higher-order-function formulation (same IEEE fold), both codegen and
  * interpreted paths, float widening, null handling. */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val data: Seq[(Seq[Float], Seq[Double])] =
    Seq.fill(50)((Seq.fill(64)(rnd.nextFloat() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))

  test("matches the zip_with/aggregate fold bit-for-bit (float x double)") {
    val df = data.toDF("a", "b")
    val hof = aggregate(
      zip_with(transform($"a", _.cast("double")), $"b", (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    val rows = df.select(dotProduct($"a", $"b").as("fast"), hof.as("slow"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("interpreted eval path (Expression.eval, no codegen) matches the fold") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val a = data.head._1
    val b = data.head._2
    val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y }
    // call the expression's own eval directly — the path used when a
    // plan falls back from whole-stage codegen
    val e = DotProduct(
      Literal.create(a, ArrayType(FloatType)),
      Literal.create(b, ArrayType(DoubleType)))
    val got = e.eval(null).asInstanceOf[Double]
    assert(java.lang.Double.doubleToLongBits(got) ==
      java.lang.Double.doubleToLongBits(expected))
    // null input through eval
    assert(DotProduct(Literal.create(null, ArrayType(DoubleType)),
      Literal.create(b, ArrayType(DoubleType))).eval(null) == null)
  }

  test("null array yields null; length mismatch uses shorter prefix") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 9.9))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val got = df.select(dotProduct($"a", $"b")).collect()
    assert(got(0).getDouble(0) == 11.0) // 1*3 + 2*4, third elem ignored
    assert(got(1).isNullAt(0))
  }

  // ---- the fused multi-word LSH signature kernel ----

  private def expectedWords(v: Seq[Double],
                            planes: Array[Array[Double]]): Seq[Long] = {
    val dim = planes.headOption.map(_.length).getOrElse(0)
    val x = v.padTo(dim, 0.0) // min-length semantics: missing elems = 0
    val words = new Array[Long]((planes.length + 63) / 64)
    planes.zipWithIndex.foreach { case (p, i) =>
      val d = x.zip(p).foldLeft(0.0) { case (acc, (a, b)) => acc + a * b }
      if (d >= 0.0) words(i >>> 6) |= 1L << (i & 63)
    }
    words.toSeq
  }

  test("lshSigWords (codegen path) matches a plain-Scala sequential fold " +
    "bit-for-bit at 128 planes (2 words), float and double inputs") {
    val planes = graft.ops.Similarity.hyperplanes(128, 64)
    val df = data.toDF("a", "b")
    val rows = df.select(
      VectorFunctions.lshSigWords($"a", planes).as("wa"),
      VectorFunctions.lshSigWords($"b", planes).as("wb")).collect()
    rows.zip(data).foreach { case (r, (a, b)) =>
      assert(r.getSeq[Long](0) == expectedWords(a.map(_.toDouble), planes))
      assert(r.getSeq[Long](1) == expectedWords(b, planes))
    }
  }

  test("lshSigWords interpreted eval path matches codegen; null yields " +
    "null; a short vector zero-pads (min-length semantics)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val planes = graft.ops.Similarity.hyperplanes(65, 64) // 2 words, top word 1 bit
    val v = data.head._2
    val e = LshSignatureWordsExpr(
      Literal.create(v, ArrayType(DoubleType)), planes)
    val got = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    assert(got == expectedWords(v, planes))
    assert(LshSignatureWordsExpr(
      Literal.create(null, ArrayType(DoubleType)), planes).eval(null) == null)
    val short = LshSignatureWordsExpr(
      Literal.create(Seq(1.0, -2.0), ArrayType(DoubleType)), planes)
      .eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray.toSeq
    assert(short == expectedWords(Seq(1.0, -2.0), planes))
  }

  // ---- the fused nProbe-nearest-centroid assignment kernel ----

  test("nearestCells (codegen + interpreted) matches a plain-Scala " +
    "(d, cid) sort, including shuffled cid order and distance ties") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types._
    val cRnd = new scala.util.Random(13)
    // shuffled, non-contiguous cids; one duplicated centroid vector so
    // two cells tie exactly on d — the tie must resolve to the lower cid
    val base = Seq.fill(20)(Array.fill(64)(cRnd.nextDouble() * 2 - 1))
    val cents = (base :+ base.head.clone()).zipWithIndex
      .map { case (c, i) => (((i * 7) % 21) + 100, c) }
    def expected(v: Seq[Double], nProbe: Int): Seq[Int] =
      cents.map { case (cid, c) =>
        val x = v.padTo(64, 0.0)
        val c2 = c.map(t => t * t).sum
        val dot = x.zip(c).foldLeft(0.0) { case (a, (p, q)) => a + p * q }
        (c2 - 2.0 * dot, cid)
      }.sorted.take(nProbe).map(_._2)
    val df = data.toDF("a", "b")
    for (nProbe <- Seq(1, 3)) {
      val centsSeq = cents.map { case (cid, c) => (cid, c.toSeq) }.toArray
      val rows = df.select(
        VectorFunctions.nearestCells($"a", centsSeq, nProbe).as("fa"),
        VectorFunctions.nearestCells($"b", centsSeq, nProbe).as("fb"))
        .collect()
      rows.zip(data).foreach { case (r, (a, b)) =>
        assert(r.getSeq[Int](0) == expected(a.map(_.toDouble), nProbe))
        assert(r.getSeq[Int](1) == expected(b, nProbe))
      }
      // interpreted eval path + null
      val e = NearestCellsExpr(
        Literal.create(data.head._2, ArrayType(DoubleType)),
        cents.map { case (cid, c) => (cid, c) }.toArray, nProbe)
      assert(e.eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toIntArray.toSeq == expected(data.head._2, nProbe))
      assert(NearestCellsExpr(Literal.create(null, ArrayType(DoubleType)),
        cents.map { case (cid, c) => (cid, c) }.toArray, nProbe).eval(null) == null)
    }
  }

  // ---- the chunked (broadcast-join) nearest-centroid kernel ----

  test("nearestCellsInChunk (codegen + interpreted) matches a plain-Scala " +
    "(d, cid) sort over the chunk, ties to the lower cid; null yields null") {
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Literal}
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types._
    val cRnd = new scala.util.Random(29)
    val base = Seq.fill(11)(Array.fill(64)(cRnd.nextDouble() * 2 - 1))
    // duplicated centroid vector → exact d tie → lower cid must win
    val cents: Seq[(Long, Array[Double])] = (base :+ base.head.clone())
      .zipWithIndex.map { case (c, i) => ((((i * 5) % 12) + 40).toLong, c) }
      .sortBy(_._1) // chunks arrive cid-sorted (sort_array in assignViaJoin)
    def expected(v: Seq[Double], nProbe: Int): Seq[(Double, Long)] =
      cents.map { case (cid, c) =>
        val x = v.padTo(64, 0.0)
        val c2 = c.map(t => t * t).sum
        val dot = x.zip(c).foldLeft(0.0) { case (a, (p, q)) => a + p * q }
        (c2 - 2.0 * dot, cid)
      }.sorted.take(nProbe)
    // codegen path: chunk as a column (array<struct<long,double,array<double>>>)
    val chunkVal: Seq[(Long, Double, Seq[Double])] =
      cents.map { case (cid, c) => (cid, c.map(t => t * t).sum, c.toSeq) }
    val df = data.map { case (_, b) => (b, chunkVal) }.toDF("v", "chunk")
    for (nProbe <- Seq(1, 3)) {
      val rows = df.select(
        VectorFunctions.nearestCellsInChunk($"v", $"chunk", nProbe).as("t"))
        .collect()
      rows.zip(data).foreach { case (r, (_, b)) =>
        val got = r.getSeq[org.apache.spark.sql.Row](0)
          .map(s => (s.getDouble(0), s.getLong(1)))
        assert(got == expected(b, nProbe))
      }
      // interpreted eval path, driven with hand-built catalyst values
      val chunkType = ArrayType(StructType(Seq(
        StructField("cid", LongType), StructField("c2", DoubleType),
        StructField("v", ArrayType(DoubleType)))))
      val e = NearestCellsChunkExpr(
        Literal.create(null, ArrayType(DoubleType)),
        Literal.create(null, chunkType), nProbe)
      val vArr = new GenericArrayData(data.head._2.toArray)
      val chArr = new GenericArrayData(cents.map { case (cid, c) =>
        new GenericInternalRow(Array[Any](cid, c.map(t => t * t).sum,
          new GenericArrayData(c)))
      }.toArray[Any])
      val got = e.nullSafeEval(vArr, chArr).asInstanceOf[ArrayData]
      val asSeq = (0 until got.numElements()).map { i =>
        val s = got.getStruct(i, 2)
        (s.getDouble(0), s.getLong(1))
      }
      assert(asSeq == expected(data.head._2, nProbe))
      assert(e.eval(null) == null) // null children → null out
    }
    // short vector zero-pads; chunk smaller than nProbe returns chunkLen
    val tiny = Seq((Seq(1.0, -2.0), chunkVal.take(2))).toDF("v", "chunk")
    val r = tiny.select(
      VectorFunctions.nearestCellsInChunk($"v", $"chunk", 5).as("t"))
      .head.getSeq[org.apache.spark.sql.Row](0)
    assert(r.length == 2)
    val exp2 = cents.take(2).map { case (cid, c) =>
      val x = Seq(1.0, -2.0).padTo(64, 0.0)
      val c2 = c.map(t => t * t).sum
      (c2 - 2.0 * x.zip(c).foldLeft(0.0) { case (a, (p, q)) => a + p * q }, cid)
    }.sorted
    assert(r.map(s => (s.getDouble(0), s.getLong(1))) == exp2)
  }

  test("quantizeInt8/dequantizeInt8 kernels match the legacy " +
    "transform formulations exactly and stay in codegen") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(41)
    val rows = (0 until 50).map(i => (i.toLong, s"l$i",
      Seq.fill(64)(rnd.nextFloat() * 2 - 1))) :+
      ((50L, "zero", Seq.fill(64)(0.0f))) // zero-scale row
    val df = rows.toDF("vec_id", "label", "embedding")
    // legacy Column forms, verbatim
    val legacyQ = df.select(col("vec_id"), col("label"), col("embedding"),
        array_max(transform(col("embedding"), x => abs(x.cast("double"))))
          .as("q_scale"))
      .select(col("vec_id"), col("label"), col("q_scale"),
        transform(col("embedding"), x =>
          when(col("q_scale") === 0d, lit(0L))
            .otherwise(floor(x.cast("double") / col("q_scale") * 127d + 0.5d))
            .cast("int")).as("q_emb"))
    val kernelQ = graft.ops.Similarity.quantizeInt8(df)
    val lq = legacyQ.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getSeq[Int](3)))
    val kq = kernelQ.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getSeq[Int](3)))
    assert(lq.toSeq == kq.toSeq)
    val legacyD = legacyQ.select(col("vec_id"),
        transform(col("q_emb"),
          i => i.cast("double") * col("q_scale") / 127d).as("embedding"))
      .orderBy("vec_id").collect().map(_.getSeq[Double](1))
    val kernelD = graft.ops.Similarity.dequantizeInt8(kernelQ)
      .orderBy("vec_id").collect().map(_.getSeq[Double](2))
    assert(legacyD.toSeq == kernelD.toSeq)
    // codegen: the corpus projection sits inside a WSCG stage
    val dir = tmpDir("quant-scan")
    df.write.mode("overwrite").parquet(dir)
    val plan = graft.ops.Similarity.quantizeInt8(spark.read.parquet(dir))
      .queryExecution.executedPlan.toString
    assert(plan.split("\n").exists(l =>
      l.matches(""".*\*\(\d+\) Project .*quantize_int8.*""")),
      plan.take(1500))
    assert(!plan.contains("CodegenFallback"), plan.take(1500))
  }
}
