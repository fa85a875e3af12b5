package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic harness: run ONLY the stream-bench sections (no batch
  * query passes) in a fresh JVM and print each section — isolates
  * ambient/machine effects from the batch half when a section's number
  * moves between runs. Developer tool, not part of the bench protocol.
  */
object StreamBenchProf {
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
    StreamBench.run(spark, sfDir).foreach { s =>
      println(f"SECTION ${s.name}%-14s rows=${s.rows}%7d sec=${s.sec}%7.2f " +
        f"batches=${s.batches}%2d rps=${s.rps.round}%7d")
    }
    spark.stop()
  }
}
