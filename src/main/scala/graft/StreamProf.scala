package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic harness for a single stream-bench section: runs the
  * `pipeline` section N times in one JVM and prints the per-chunk wall
  * times plus each query's per-batch `triggerExecution` seconds — the
  * data needed to attribute the round-9 3.7× cross-run spread (official
  * 39.9 s vs committed 10.8 s for the SAME code) to a query and a batch.
  * Not part of the bench protocol; a developer tool.
  */
object StreamProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to reps).foreach { i =>
      val s = StreamBench.pipelineSection(spark, sfDir)
      println(f"rep $i: sec=${s.sec}%.3f rows=${s.rows} batches=${s.batches} rps=${s.rps.round}")
      println("  chunks: " + s.chunkSec.map(c => f"$c%.3f").mkString(" "))
      s.queryBatch.foreach { case (name, bs) =>
        println(s"  $name: " + bs.map(b => f"$b%.3f").mkString(" "))
      }
    }
    spark.stop()
  }
}
