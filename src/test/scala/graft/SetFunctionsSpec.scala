package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The merge-scan Jaccard must be bit-identical to the hash-set form on
  * sorted distinct arrays, across random inputs and edge cases. */
class SetFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("jaccardSorted == jaccard on random sorted distinct long arrays") {
    val rnd = new scala.util.Random(23)
    val rows = (1 to 300).map { _ =>
      val a = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(40).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(50) + 1)(rnd.nextInt(40).toLong).distinct.sorted
      (a, b)
    }
    val mismatch = rows.toDF("a", "b").select(
      Dedup.jaccardSorted(col("a"), col("b")).as("m"),
      Dedup.jaccard(col("a"), col("b")).as("h"))
      .filter(col("m") =!= col("h"))
    mismatch.count() shouldBe 0
  }

  test("edge cases: disjoint, identical, subset, nulls") {
    val df = Seq(
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))),   // disjoint → 0.0
      (Some(Seq(1L, 2L)), Some(Seq(1L, 2L))),   // identical → 1.0
      (Some(Seq(1L)), Some(Seq(1L, 2L, 3L))),   // subset → 1/3
      (None, Some(Seq(1L)))                      // null → null
    ).toDF("a", "b").select(Dedup.jaccardSorted(col("a"), col("b")).as("j"))
    val rows = df.collect()
    rows(0).getDouble(0) shouldBe 0.0
    rows(1).getDouble(0) shouldBe 1.0
    rows(2).getDouble(0) shouldBe (1.0 / 3.0)
    rows(3).isNullAt(0) shouldBe true
  }
}
