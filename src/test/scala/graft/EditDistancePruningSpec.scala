package graft

import org.apache.spark.sql.functions._

import graft.plans.EditDistancePruning

/** The bound-pruning optimizer rule: `levenshtein(a,b) <= k` gains an
  * O(1) `abs(length(a)-length(b)) <= k` guard that short-circuits the
  * O(|a|·|b|) dynamic program for length-implausible rows. */
class EditDistancePruningSpec extends SparkSpec {

  private def withRule[T](body: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ EditDistancePruning
    try body
    finally spark.experimental.extraOptimizations = prev
  }

  /** Deterministic string pairs with wide length spread, derived from a
    * range scan — NOT a literal LocalRelation, which the optimizer would
    * constant-fold straight through the filter under test. */
  private def pairsDf = spark.range(500).selectExpr(
    "substring(md5(concat('a', id)), 1, CAST(id % 12 + 2 AS INT)) AS a",
    "substring(md5(concat('b', id)), 1, CAST((id * 7) % 12 + 2 AS INT)) AS b")

  test("guard is injected into the optimized plan and preserves results") {
    def q = pairsDf.filter(levenshtein(col("a"), col("b")) <= 3)

    val unoptimized = q.collect().toSet
    withRule {
      // fresh Dataset: queryExecution is cached per-Dataset, so the
      // pre-rule instance would keep its pre-rule optimized plan
      val optimized = q
      val opt = optimized.queryExecution.optimizedPlan.toString
      opt should include("levenshtein")
      // the length lower-bound guard appears ahead of the DP predicate
      opt should include("abs(")
      opt should include("length(")
      optimized.collect().toSet shouldBe unoptimized
    }
  }

  test("rewrite is idempotent under repeated application") {
    val plan = pairsDf
      .filter(levenshtein(col("a"), col("b")) < 4)
      .queryExecution.analyzed
    val once = EditDistancePruning(plan)
    val twice = EditDistancePruning(once)
    twice shouldBe once
  }

  test("literal-first and strict forms get the matching guard") {
    val df = pairsDf
    val mirrored = df.filter(lit(3) >= levenshtein(col("a"), col("b")))
    val strict = df.filter(levenshtein(col("a"), col("b")) < 3)
    withRule {
      mirrored.queryExecution.optimizedPlan.toString should include("abs(")
      strict.queryExecution.optimizedPlan.toString should include("abs(")
      // strictness preserved: results unchanged in both forms
      mirrored.collect().length shouldBe
        df.filter(levenshtein(col("a"), col("b")) <= 3).collect().length
    }
  }
}
