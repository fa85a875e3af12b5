package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.CatalystBridge

import graft.functions.GraftExtensions

/** The SQL-extension surface: `spark.sql.extensions=graft.functions.
  * GraftExtensions` makes the custom-expression family callable from
  * plain SQL. Installed here onto the shared session through the same
  * registration path the session builder uses. */
class ExtensionsSpec extends SparkSpec {

  private lazy val installed: Unit = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    CatalystBridge.installFunctions(ext, spark)
  }

  private def sql1(q: String) = { installed; spark.sql(q).head() }

  test("vec_dot from SQL") {
    sql1("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .getDouble(0) shouldBe 11.0
  }

  test("sorted_intersect_count from SQL") {
    sql1("SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS c")
      .getInt(0) shouldBe 2
  }

  test("shingle_strings / hashed_shingles60 / minhash_sig / simhash16 from SQL") {
    sql1("SELECT size(shingle_strings(array('a','b','c'), 2)) AS n")
      .getInt(0) shouldBe 2
    // hashed shingles are sorted — pairwise ordered
    val hs = sql1("SELECT hashed_shingles60(array('a','b','c'), 1) AS h")
      .getSeq[Long](0)
    hs shouldBe hs.sorted
    sql1("SELECT size(minhash_sig(hashed_shingles60(array('a','b'), 1), 12)) AS k")
      .getInt(0) shouldBe 12
    // matches the Scala-API expression bit-for-bit
    import org.apache.spark.sql.functions._
    val fromApi = spark.range(1).select(
      graft.functions.TextHashFunctions.simhash16(
        split(lit("a b c"), " ")).as("s")).head().getLong(0)
    sql1("SELECT simhash16(array('a','b','c')) AS s").getLong(0) shouldBe fromApi
  }

  test("morton_interleave16 from SQL") {
    sql1("SELECT morton_interleave16(3L, 1L) AS z").getLong(0) shouldBe 7L
  }

  test("lm_score_bits / vec_argmin_d2 from SQL") {
    // two bigrams, every grid entry 5 -> score 10
    sql1("SELECT lm_score_bits(array('a','b','c'), " +
      "array_repeat(5L, 65536)) AS s").getLong(0) shouldBe 10L
    // nearest of two entries by exact squared L2, struct(d2, id) out
    val r = sql1("SELECT vec_argmin_d2(array(1.0d, 0.0d), array(" +
      "named_struct('id', 7L, 'v', array(1.0d, 0.0d)), " +
      "named_struct('id', 9L, 'v', array(5.0d, 5.0d)))) AS a")
      .getStruct(0)
    r.getDouble(0) shouldBe 0.0
    r.getLong(1) shouldBe 7L
  }

  test("nb_argmax_bits from SQL") {
    // two bigrams; class p scores every grid cell 5 (fold 10), class q
    // scores 3 (fold 6) but q's e4 bonus on n_bigrams=2 flips the
    // argmax: scale 4 -> p = 4*10 - 2*0 = 40, q = 4*6 - 2*(-10) = 44
    val r = sql1("SELECT nb_argmax_bits(array('a','b','c'), array(" +
      "named_struct('cls', 'p', 'e4', 0L, 'grid', array_repeat(5L, 65536)), " +
      "named_struct('cls', 'q', 'e4', -10L, 'grid', array_repeat(3L, 65536))" +
      "), 4L) AS b").getStruct(0)
    r.getLong(0) shouldBe 44L
    r.getString(1) shouldBe "q"
  }

  test("lm_nb_fused_bits from SQL") {
    // two bigrams; target grid 7 per cell (fold 14), background 2 (fold
    // 4); NB classes as in the nb_argmax_bits case: scale 4 -> q wins
    // at 44 over p's 40 — the fused struct carries both LM folds AND
    // the same argmax the separate expressions produce
    val r = sql1("SELECT lm_nb_fused_bits(array('a','b','c'), " +
      "array(array_repeat(7L, 65536), array_repeat(2L, 65536)), array(" +
      "named_struct('cls', 'p', 'e4', 0L, 'grid', array_repeat(5L, 65536)), " +
      "named_struct('cls', 'q', 'e4', -10L, 'grid', array_repeat(3L, 65536))" +
      "), 4L) AS f").getStruct(0)
    r.getLong(0) shouldBe 14L
    r.getLong(1) shouldBe 4L
    r.getLong(2) shouldBe 44L
    r.getString(3) shouldBe "q"
  }

  test("lm_multi_score_bits from SQL") {
    // two bigrams; grid of 7s folds to 14, grid of 2s to 4 — one pass
    val r = sql1("SELECT lm_multi_score_bits(array('a','b','c'), " +
      "array(array_repeat(7L, 65536), array_repeat(2L, 65536))) AS m")
      .getSeq[Long](0)
    r shouldBe Seq(14L, 4L)
  }

  test("cms_cells / cms_sketch_agg from SQL") {
    installed
    // one token, rows=2, width=4: two sparse cells, count 1 each
    val cells = spark.sql(
      "SELECT cms_cells(array('a'), 2, 4) AS e").head()
      .getSeq[org.apache.spark.sql.Row](0)
    cells.length shouldBe 2
    cells.map(_.getLong(0)) shouldBe Seq(0L, 1L) // one cell per hash row
    cells.foreach(_.getLong(2) shouldBe 1L)
    // the aggregate over two rows equals the merged per-row partials:
    // dense 8-cell array summing to rows × total-occurrences = 2 × 3
    val agg = spark.sql(
      "SELECT cms_sketch_agg(t, 2, 4) AS s FROM VALUES " +
        "(array('a','b')), (array('a')) AS v(t)").head().getSeq[Long](0)
    agg.length shouldBe 8
    agg.sum shouldBe 6L
    // and matches the operator's full-width sketch on the same corpus
    import spark.implicits._
    val viaSql = spark.sql(
      "SELECT cms_sketch_agg(t, 4, 256) AS s FROM VALUES " +
        "(array('a','b')), (array('a')) AS v(t)").head().getSeq[Long](0)
    val viaOp = graft.operators.Sketch.cmsSketch(
        Seq((1L, "a b"), (2L, "a")).toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect()
      .map { case (r, b, c) => (r * 256 + b).toInt -> c }.toMap
    viaSql.zipWithIndex.foreach { case (c, i) =>
      c shouldBe viaOp.getOrElse(i, 0L)
    }
  }

  test("hll_sketch_agg from SQL") {
    installed
    // dense m-register array; register-wise MAX merge means feeding a
    // duplicate row changes nothing
    val agg = spark.sql(
      "SELECT hll_sketch_agg(t, 16) AS s FROM VALUES " +
        "(array('a','b')), (array('a')) AS v(t)").head().getSeq[Long](0)
    agg.length shouldBe 16
    agg.count(_ > 0L) should be <= 2 // ≤ one register per distinct token
    val dup = spark.sql(
      "SELECT hll_sketch_agg(t, 16) AS s FROM VALUES " +
        "(array('a','b')), (array('a')), (array('a','b')) AS v(t)")
      .head().getSeq[Long](0)
    dup shouldBe agg
    // geometry must be a power of two — fail loud, not garbage buckets
    val ex = intercept[Exception] {
      spark.sql("SELECT hll_sketch_agg(t, 100) AS s " +
        "FROM VALUES (array('a')) AS v(t)").head()
    }
    ex.getMessage should include("power of two")
  }

  test("kmv_sketch_agg from SQL") {
    installed
    // the k smallest DISTINCT hash values, ascending; union-merge with
    // set semantics means feeding a duplicate row changes nothing
    val agg = spark.sql(
      "SELECT kmv_sketch_agg(t, 2) AS s FROM VALUES " +
        "(array('a','b','c')), (array('a','d')) AS v(t)").head().getSeq[Long](0)
    agg.length shouldBe 2
    agg.sorted shouldBe agg
    val dup = spark.sql(
      "SELECT kmv_sketch_agg(t, 2) AS s FROM VALUES " +
        "(array('a','b','c')), (array('a','d')), (array('c','a')) AS v(t)")
      .head().getSeq[Long](0)
    dup shouldBe agg
    // a one-value "sketch" cannot estimate anything — fail loud
    val ex = intercept[Exception] {
      spark.sql("SELECT kmv_sketch_agg(t, 1) AS s " +
        "FROM VALUES (array('a')) AS v(t)").head()
    }
    ex.getMessage should include("kmv k")
  }

  test("literal-parameter contract is enforced with a clear error") {
    installed
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_sig(array(1L), CAST(rand()*4 AS INT))").collect()
    }
    e.getMessage should include("literal integer")
  }
}
