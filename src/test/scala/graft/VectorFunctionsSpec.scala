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

  test("native vec_argmin_d2 == the aggregate-fold argmin, ties to lowest id") {
    // random integer-quantized vectors (the production domain: every
    // distance is an exact int64-valued double) + a duplicated entry so
    // the tie must resolve to the LOWEST id on both paths
    val rnd = new scala.util.Random(41)
    def vec(): Seq[Double] =
      Seq.fill(64)((rnd.nextInt(2001) - 1000).toDouble)
    val entries = ((1L to 12L).map(i => (i, vec())) :+ (99L, vec()))
      .sortBy(_._1)
    val dup = entries.head._2
    val withTie = (entries :+ (100L, dup)).sortBy(_._1)
    val rows = ((1L to 40L).map(i => (i, vec())) :+ (200L, dup))
      .toDF("vec_id", "qv")
    val lits = withTie.map { case (id, v) =>
      struct(lit(id).as("id"), array(v.map(lit): _*).as("v")) }
    val native = VectorFunctions.vecArgminD2(col("qv"), array(lits: _*))
    val classic = aggregate(array(lits: _*),
      struct(lit(Double.MaxValue).as("d2"), lit(Long.MaxValue).as("id")),
      (acc, e) => {
        val dd = VectorFunctions.vecDot(col("qv"), col("qv")) -
          lit(2.0) * VectorFunctions.vecDot(col("qv"), e.getField("v")) +
          VectorFunctions.vecDot(e.getField("v"), e.getField("v"))
        when(dd < acc.getField("d2"),
          struct(dd.as("d2"), e.getField("id").as("id"))).otherwise(acc)
      })
    val got = rows.select(col("vec_id"), native.as("n"), classic.as("c"))
      .select(col("vec_id"),
        col("n.d2").as("nd2"), col("n.id").as("nid"),
        col("c.d2").as("cd2"), col("c.id").as("cid"))
      .as[(Long, Double, Long, Double, Long)].collect()
    got.foreach { case (id, nd2, nid, cd2, cid) =>
      withClue(s"vec $id: ") { nd2 shouldBe cd2; nid shouldBe cid }
    }
    // the duplicated-vector row is an exact tie between ids 1 and 100:
    // both paths must elect 1
    got.find(_._1 == 200L).get._3 shouldBe withTie.head._1
  }

  test("vec_argmin_d2 rejects an entry vector shorter than the query") {
    // SQL-registered surface: a malformed entry must throw, not read
    // out of bounds on UnsafeArrayData and return garbage distances
    val entries = array(
      struct(lit(1L).as("id"), array(lit(1.0), lit(2.0), lit(3.0)).as("v")),
      struct(lit(2L).as("id"), array(lit(1.0), lit(2.0)).as("v")))
    val ex = intercept[Exception] {
      Seq(Seq(0.0, 0.0, 0.0)).toDF("qv")
        .select(VectorFunctions.vecArgminD2(col("qv"), entries))
        .collect()
    }
    ex.getMessage should include("dims")
  }
}
