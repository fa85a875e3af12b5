package graft

import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextHashFunctions}
import graft.operators.Dedup

/** The native text-hash expressions must be BIT-IDENTICAL to the
  * composable Spark forms they replace — every DuckDB oracle downstream
  * depends on it. Pinned here on the real fixture corpus plus edge
  * shapes (short docs, single token, repeated tokens). */
class TextHashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.ingest.Tables
    .documents(spark, "/root/testdata/sf0.001")
    .select(col("doc_id"), col("text"))
    .unionByName(Seq(
      (100001L, "one"), (100002L, "a b"), (100003L, "x x x x x x"),
      (100004L, "Short  DOC with   Mixed  spacing"))
      .toDF("doc_id", "text"))

  private def tokens = split(Dedup.normalize(col("text")), " ")

  test("shingleStrings == array_distinct(transform(sequence, join(slice)))") {
    for (n <- Seq(1, 2, 3, 5)) {
      val w = tokens
      val classic = array_distinct(
        when(org.apache.spark.sql.functions.size(w) >= n,
          transform(sequence(lit(1), org.apache.spark.sql.functions.size(w) - lit(n - 1)),
            i => array_join(slice(w, i, lit(n)), " ")))
          .otherwise(array(array_join(w, " "))))
      val diff = docs.select(
        TextHashFunctions.shingleStrings(w, n).as("native"),
        classic.as("classic"))
        .filter(col("native") =!= col("classic"))
      withClue(s"n=$n: ") { diff.count() shouldBe 0L }
    }
  }

  test("hashedShingles60 == array_sort(transform(shingles, hash60))") {
    for (n <- Seq(1, 2, 5)) {
      val composable = array_sort(
        transform(Dedup.shingles(col("text"), n), s => PortableHash.hash60(s)))
      val diff = docs.select(
        TextHashFunctions.hashedShingles60(tokens, n).as("native"),
        composable.as("classic"))
        .filter(col("native") =!= col("classic"))
      withClue(s"n=$n: ") { diff.count() shouldBe 0L }
    }
  }

  test("minhashSig == k x array_min(transform(affine))") {
    val k = 12
    val hashed = TextHashFunctions.hashedShingles60(tokens, 1)
    val classicCols = (0 until k).map(i =>
      array_min(transform(hashed, h => PortableHash.affine(h, i))))
    val diff = docs.select(
      TextHashFunctions.minhashSig(hashed, k).as("native"),
      array(classicCols: _*).as("classic"))
      .filter(col("native") =!= col("classic"))
    diff.count() shouldBe 0L
  }

  test("native simhash16 == per-bit aggregate votes") {
    val hs = transform(tokens, w => PortableHash.hash60(w))
    val bits = (0 until 16).map { b =>
      val vote = aggregate(hs, lit(0L),
        (acc, h) => acc + (pmod(shiftright(h, b), lit(2L)) * 2L - 1L))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }
    val diff = docs.select(
      TextHashFunctions.simhash16(tokens).as("native"),
      bits.reduce(_ + _).as("classic"))
      .filter(col("native") =!= col("classic"))
    diff.count() shouldBe 0L
  }

  test("hash60 helper == conv(substring(md5,1,15),16,10)") {
    val strs = Seq("", "a", "hello world", "the quick brown fox")
    val fromSql = strs.toDF("s")
      .select(PortableHash.hash60(col("s"))).as[Long].collect()
    strs.zip(fromSql).foreach { case (s, expected) =>
      TextHashFunctions.hash60(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) shouldBe expected
    }
  }
}
