package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed table layout — the co-located-join primitive.
  *
  * At 100 TB the dominant join cost is shuffling the fact table. Writing
  * it ONCE bucketed (and sorted) by the join key amortizes that shuffle
  * across every subsequent join/aggregation on the key: Spark's scan
  * reports the bucket hash-partitioning, so joins between two tables
  * bucketed by the same key into the same bucket count plan a
  * SortMergeJoin with NO Exchange on either side.
  *
  * The reference keeps its analogue in the warehouse DDL — clustered
  * tables (see SURVEY.md §2.6/K3); this is the Spark-native layout that
  * delivers the same "pre-organized by key" read path.
  */
object Bucketing {

  /** Write `df` as a bucketed + bucket-sorted external parquet table,
    * one file per bucket (pre-repartitioned by the bucket hash, which is
    * the same Murmur3-mod-N Spark's bucketing applies, so each task owns
    * exactly its bucket and the per-bucket sort metadata stays usable).
    * Idempotent: replaces any previous table of the same name.
    */
  def writeBucketed(spark: SparkSession, df: DataFrame, table: String,
      path: String, buckets: Int, key: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(buckets, col(key))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }
}
