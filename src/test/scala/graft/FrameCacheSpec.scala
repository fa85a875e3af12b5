package graft

import org.apache.spark.sql.functions._

import graft.queries.FrameCache

/** FrameCache contract pins — above all the r16 re-entrancy fix: a memo
  * build that resolves ANOTHER memo (directly or through helpers) must
  * never corrupt or throw. Under the previous `computeIfAbsent` form
  * the nested insert re-entered the ConcurrentHashMap while a bin lock
  * was held, and whether that threw "Recursive update" (then cascaded
  * into missing-checkpoint-block failures for every downstream
  * consumer) depended on which BIN the identity-hashed session keys
  * landed in — a per-JVM coin flip that one r16 bench run lost. */
class FrameCacheSpec extends SparkSpec {
  import spark.implicits._

  test("nested memo resolution inside a build is safe and both entries land") {
    val d = "/tmp/framecache-spec-nested"
    val outer = FrameCache.memo(spark, d, "fcspec_outer") {
      // inner memo resolved INSIDE the outer build — the hazard shape
      val inner = FrameCache.memo(spark, d, "fcspec_inner") {
        Seq(1L, 2L, 3L).toDF("v")
      }
      inner.select((col("v") * 2).as("v"))
    }
    outer.as[Long].collect().sorted shouldBe Array(2L, 4L, 6L)
    // both entries present: repeat calls are cache hits (same handle)
    val innerAgain = FrameCache.memo(spark, d, "fcspec_inner") {
      fail("inner must be cached"); null
    }
    innerAgain.as[Long].collect().sorted shouldBe Array(1L, 2L, 3L)
    val outerAgain = FrameCache.memo(spark, d, "fcspec_outer") {
      fail("outer must be cached"); null
    }
    outerAgain.as[Long].collect().sorted shouldBe Array(2L, 4L, 6L)
  }

  test("get probes without building; memo after a miss inserts") {
    val d = "/tmp/framecache-spec-get"
    FrameCache.get(spark, d, "fcspec_probe") shouldBe None
    val built = FrameCache.memo(spark, d, "fcspec_probe") {
      Seq(7L).toDF("v")
    }
    FrameCache.get(spark, d, "fcspec_probe").map(_.as[Long].collect().toSeq)
      .shouldBe(Some(Seq(7L)))
    built.as[Long].collect() shouldBe Array(7L)
  }
}
