package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. All reads go through here so
  * that scan options (and, at cluster scale, bucketing / file-index
  * strategies) are controlled in one place. Column pruning and predicate
  * pushdown are left to Catalyst — callers express plain
  * `select`/`filter` and the parquet scan receives `ReadSchema` /
  * `PushedFilters` automatically.
  *
  * SESSION-WIDE SIDE EFFECT, by design: reading `events` flips
  * `spark.sql.legacy.parquet.nanosAsLong=true` for the whole session and
  * deliberately does NOT restore it — the flag has no per-read
  * DataFrameReader option (it is SQLConf-only in Spark 4.1), and because
  * DataFrames are lazy a restore-after-build could race the actual scan.
  * Consequence: any later read of nanos-typed parquet in the same session
  * also sees longs. All of this library's own reads go through this
  * loader, so the flip is idempotent and invisible here; an embedding
  * application that reads its own TIMESTAMP(NANOS) parquet must account
  * for it.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses by
      // default; read it as long nanos and truncate to microseconds
      // (exactly what DuckDB/Arrow do when narrowing ns → µs).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def events(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "events")
  def customer(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "customer")
  def part(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "part")
  def orders(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "orders")
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "lineitem")
  def documents(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = table(spark, sfDir, "embeddings")

  /** Register every fixture table as a temp view (for spark.sql users).
    *
    * Deliberately NO input-parallelism emulation here (contrast
    * `CdcMapping.fact`, which stands in for a multi-partition Kafka
    * source): for the SQL surface the scan→partial-aggregate fusion on
    * the pruned, pushed-down parquet read beats paying a full-width
    * round-robin exchange at fixture sizes — measured, not assumed. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
