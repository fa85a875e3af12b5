package graft

/** Pins the scaling-ladder harness's pure parts: the exponent fit
  * (the number SCALE.md quotes) and the synthetic generators'
  * determinism + geometry. The timed ladder itself is a bench-style
  * artifact (docs/SCALE.md table), not a unit-testable quantity. */
class ScaleLadderSpec extends SparkSpec {

  import spark.implicits._

  test("fitExponent recovers exact power laws") {
    // t = c * n^a on a 1x/3x/10x ladder
    def pts(a: Double, c: Double) =
      Seq(2000L, 6000L, 20000L).map(n => n -> c * math.pow(n.toDouble, a))
    ScaleLadder.fitExponent(pts(1.0, 1e-4)) shouldBe 1.0 +- 1e-9
    ScaleLadder.fitExponent(pts(2.0, 1e-8)) shouldBe 2.0 +- 1e-9
    ScaleLadder.fitExponent(pts(0.5, 1e-2)) shouldBe 0.5 +- 1e-9
    // degenerate: a single point (or equal sizes) has no slope
    ScaleLadder.fitExponent(Seq(100L -> 1.0)) shouldBe 0.0
  }

  test("synthetic generators are deterministic with the pinned geometry") {
    val u = ScaleLadder.syntheticUnits(spark, 500)
      .as[(String, Long, Long)].collect()
    u.length shouldBe 500
    u.map(_._1).distinct.sorted.length shouldBe 10 // 10 sources
    all(u.map(_._3)) should (be >= 1L and be <= 100L) // token range
    val u2 = ScaleLadder.syntheticUnits(spark, 500)
      .as[(String, Long, Long)].collect()
    u2.toSeq shouldBe u.toSeq
    val v = ScaleLadder.syntheticVecs(spark, 100, "vec_id", "qv", "v")
      .as[(Long, Seq[Double])].collect()
    v.length shouldBe 100
    all(v.map(_._2.length)) shouldBe 64
    all(v.flatMap(_._2)) should (be >= -1000.0 and be <= 1000.0)
    // integer-valued on the quantized grid (the graph kernels' domain)
    all(v.flatMap(_._2).map(x => x == math.rint(x))) shouldBe true
    // a different salt yields a different cloud (centroids vs vectors)
    val c = ScaleLadder.syntheticVecs(spark, 100, "vec_id", "qv", "c")
      .as[(Long, Seq[Double])].collect()
    c.map(_._2).toSeq should not be v.map(_._2).toSeq
  }
}
