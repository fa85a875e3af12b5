package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.queries.CdcMapping

/** Salted join must be row-identical to the plain join, for inner and
  * left joins, including unmatched-fact rows. */
class SkewJoinSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  private def compare(joinType: String): Unit = {
    val facts = CdcMapping.fact(spark, d)
    val dim = CdcMapping.dim(spark, d)
      .filter(pmod(col("id"), lit(3)) =!= 0) // manufacture misses
      .withColumnRenamed("id", "dim_id")
    val plain = facts.join(dim, facts("content_id") === dim("dim_id"), joinType)
    val salted = SkewJoin.salted(facts, dim, "content_id", "dim_id",
      saltOn = facts("id"), saltCount = 8, joinType = joinType)
    salted.exceptAll(plain).count() shouldBe 0
    plain.exceptAll(salted).count() shouldBe 0
    plain.count() shouldBe salted.count()
  }

  test("salted inner join == plain inner join") { compare("inner") }
  test("salted left join == plain left join (misses preserved once)") {
    compare("left")
  }
}
