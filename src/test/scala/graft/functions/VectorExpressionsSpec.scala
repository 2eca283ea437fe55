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
}
