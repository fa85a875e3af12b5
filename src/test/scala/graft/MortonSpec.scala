package graft

import org.apache.spark.sql.functions._

import graft.functions.MortonFunctions

/** The native Morton interleave must be bit-identical to the portable
  * 32-term CASE arithmetic the oracle SQL uses. */
class MortonSpec extends SparkSpec {

  private def arithmetic(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      if (((x >> i) & 1L) == 1L) z |= 1L << (2 * i)
      if (((y >> i) & 1L) == 1L) z |= 1L << (2 * i + 1)
      i += 1
    }
    z
  }

  test("JVM helper matches the arithmetic form on edges and seeded values") {
    val rnd = new scala.util.Random(11)
    val cases = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L),
      (32768L, 16384L)) ++ Seq.fill(500)((rnd.nextInt(65536).toLong,
      rnd.nextInt(65536).toLong))
    cases.foreach { case (x, y) =>
      MortonFunctions.interleave16(x, y) shouldBe arithmetic(x, y)
    }
  }

  test("codegen expression agrees with the JVM helper over a range scan") {
    val rows = spark.range(2000).select(
      (col("id") * 37 % 65536).as("x"), (col("id") * 101 % 65536).as("y"))
      .withColumn("z", MortonFunctions.mortonInterleave16(col("x"), col("y")))
      .collect()
    rows.foreach { r =>
      r.getLong(2) shouldBe MortonFunctions.interleave16(r.getLong(0), r.getLong(1))
    }
  }
}
