package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ad-hoc profiler: time (and optionally explain) a subset of registered
  * queries. `runMain graft.ProfileOne <sfDir> <query,query,...> [explain]`.
  * Same session shape as [[Bench]] so numbers are comparable.
  */
object ProfileOne {
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val doExplain = args.lift(2).contains("explain")
    // Fail on typo'd names BEFORE paying session startup + warm-up.
    val unknown = names.filterNot(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(",")} " +
        s"(valid: ${SparkEntry.queries.keys.toSeq.sorted.mkString(",")})")
      sys.exit(2)
    }
    // Same default as Bench so timings are comparable out of the box.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try force(SparkEntry.queries("cdc_enrich")(spark, sfDir))
    catch { case _: Throwable => () }
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (doExplain) fn(spark, sfDir).explain("formatted")
      val times = (1 to 2).map { _ =>
        // per-iteration cold shared caches — a profiled query must pay
        // its own compute every run, same fairness rule as Bench passes
        graft.queries.DedupQueries.clearSharedCaches()
        val t0 = System.nanoTime()
        force(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $name%-28s min=${times.min}%.3f runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
