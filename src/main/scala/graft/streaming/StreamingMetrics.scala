package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** Streaming observability: a query-progress listener that captures the
  * per-micro-batch metrics a production pipeline exports to monitoring —
  * rows read, processing rate, batch duration, watermark — per query
  * name. This is the operational surface behind BASELINE.md's SLOs
  * (rec/s throughput, micro-batch latency): the numbers the reference
  * reads off its Flink dashboard come from exactly this hook in Spark.
  */
final class StreamingMetrics(maxBatches: Int = StreamingMetrics.DefaultRetention)
    extends StreamingQueryListener {

  final case class BatchMetrics(queryName: String, batchId: Long,
      numInputRows: Long, processedRowsPerSecond: Double,
      batchDurationMs: Long, eventTimeWatermark: Option[String])

  // Bounded retention: a monitoring hook on a long-running query must not
  // grow per-batch forever — beyond `maxBatches` the oldest entries are
  // dropped (a dashboard scrapes recent progress, not full history).
  private val events = new ConcurrentLinkedQueue[BatchMetrics]()

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    events.add(BatchMetrics(
      Option(p.name).getOrElse(p.id.toString),
      p.batchId,
      p.numInputRows,
      p.processedRowsPerSecond,
      p.batchDuration,
      Option(p.eventTime.get("watermark"))))
    while (events.size() > maxBatches) events.poll()
  }

  /** Snapshot of everything captured so far (oldest first). */
  def batches: Seq[BatchMetrics] = events.iterator().asScala.toSeq

  def totalInputRows(queryName: String): Long =
    batches.filter(_.queryName == queryName).map(_.numInputRows).sum
}

object StreamingMetrics {
  /** Default per-listener batch-history retention. */
  val DefaultRetention: Int = 1024

  /** Attach a fresh listener to the session; caller removes it with
    * `spark.streams.removeListener` when done. */
  def attach(spark: SparkSession): StreamingMetrics = {
    val m = new StreamingMetrics
    spark.streams.addListener(m)
    m
  }
}
