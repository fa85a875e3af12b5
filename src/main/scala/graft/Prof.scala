package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc profiling harness (dev-only): variant timings for the
  * expand-heavy aggregations bottlenecked on the 1-row-group fixture
  * scan. */
object Prof {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def time(name: String)(f: => Unit): Unit = {
    val runs = (1 to 3).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println(f"[prof] $name%-34s ${runs.min}%8.3f s (min of ${runs.size})")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.ingest.Tables.registerAll(spark, sfDir)
    val li = graft.ingest.Tables.lineitem(spark, sfDir)
    force(li) // warm-up

    time("lineitem scan only")(force(li))
    time("cube as-is (1-task scan)")(force(spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
        |  COUNT(*) AS n,
        |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(10,2))) AS DECIMAL(38,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin)))
    time("cube via repartitioned scan") {
      force(li.repartition(spark.sparkContext.defaultParallelism)
        .select(col("l_returnflag"), col("l_linestatus"),
          col("l_quantity").cast("decimal(10,2)").as("q"))
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(col("q")).as("s")))
    }
    val orders = graft.ingest.Tables.orders(spark, sfDir)
    time("profile as-is")(force(
      queries.OperatorQueries.defs("op_profile").build(spark, sfDir)))
    time("profile distinct via repartition") {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderdate", "o_orderpriority")
      val aggs = cols.flatMap(c => Seq(
        count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max")))
      force(orders.repartition(spark.sparkContext.defaultParallelism)
        .agg(aggs.head, aggs.tail: _*))
    }
    time("lateral as-is")(force(spark.sql(
      """SELECT o_orderkey, o_orderstatus, t.max_qty, t.n_items
        |FROM orders, LATERAL (
        |  SELECT MAX(l_quantity) AS max_qty, COUNT(*) AS n_items
        |  FROM lineitem WHERE l_orderkey = o_orderkey) t
        |WHERE o_orderkey % 50 = 0""".stripMargin)))
    time("components (after explode fix)")(force(
      queries.DedupQueries.defs("dedup_components").build(spark, sfDir)))
    spark.stop()
  }
}
