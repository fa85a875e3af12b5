package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: the Spark build plus (when SQL-expressible) an
  * equivalent ANSI SQL text the driver runs in DuckDB over the same
  * parquet tables. Column names/aliases MUST match between the two — the
  * driver sorts columns by name before hashing values.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def apply(build: (SparkSession, String) => DataFrame, oracle: String): QueryDef =
    QueryDef(build, Some(oracle))
}
