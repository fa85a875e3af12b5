package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the north-star
  * extensions) is registered here as a named query over the fixture
  * tables, paired — wherever SQL-expressible — with a DuckDB oracle in
  * [[oracleSql]]. Column names are aliased identically on both sides (the
  * driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("cdc_leaderboard")(spark, "/root/testdata/sf0.001")

  private[graft] val registry: Map[String, QueryDef] =
    CdcQueries.defs ++ RelationalQueries.defs ++ OperatorQueries.defs ++
      DedupQueries.defs ++ TextQueries.defs ++ SimilarityQueries.defs ++
      MultimodalQueries.defs ++ AdvancedQueries.defs ++ GenQueries.defs ++
      WarehouseQueries.defs ++ AnalyticsQueries.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (k, v) => k -> v.build }

  def oracleSql: Map[String, String] =
    registry.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
