package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

/** The native DotProduct expression must be bit-identical to the
  * composable zip_with+aggregate form (the DuckDB oracles depend on
  * that), across codegen and interpreted paths. */
class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(11)
    (1 to 200).map { i =>
      (i.toLong,
        Seq.fill(64)(rnd.nextDouble() * 2 - 1),
        Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("id", "a", "b")
  }

  test("native vec_dot == composable dot, bit-for-bit, on random doubles") {
    val mismatches = vecs.select(
      VectorFunctions.vecDot(col("a"), col("b")).as("native"),
      Similarity.dotComposable(col("a"), col("b")).as("hof"))
      .filter(col("native") =!= col("hof"))
    mismatches.count() shouldBe 0
  }

  test("null/length semantics match the composable form") {
    val df = Seq(
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))), // 11.0
      (Some(Seq(1.0)), Some(Seq(1.0, 2.0))),      // length mismatch → null
      (None, Some(Seq(1.0)))                      // null input → null
    ).toDF("a", "b").select(
      VectorFunctions.vecDot(col("a"), col("b")).as("native"),
      Similarity.dotComposable(col("a"), col("b")).as("hof"))
    val rows = df.collect()
    rows(0).getDouble(0) shouldBe 11.0
    rows.foreach { r =>
      r.isNullAt(0) shouldBe r.isNullAt(1)
      if (!r.isNullAt(0)) r.getDouble(0) shouldBe r.getDouble(1)
    }
  }

  test("interpreted path (eval) agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val mk = (xs: Seq[Double]) =>
      Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(DoubleType))
    val e = VectorFunctions.DotProduct(mk(Seq(1.5, -2.0, 3.0)), mk(Seq(2.0, 0.5, 4.0)))
    e.eval(null) shouldBe (1.5 * 2.0 + -2.0 * 0.5 + 3.0 * 4.0)
  }

  test("type mismatches fail analysis with a clear message") {
    val e = intercept[Exception] {
      spark.sql("SELECT 1").select(
        VectorFunctions.vecDot(lit("not an array"), lit(2))).collect()
    }
    e.getMessage.toLowerCase should include("array")
  }

  test("vec_dot is SQL-callable after registration") {
    VectorFunctions.register(spark)
    spark.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0) shouldBe 11.0
  }
}
