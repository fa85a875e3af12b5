package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingPipeline

/** The Kafka source line itself cannot execute here — the
  * `spark-sql-kafka-0-10` connector jar is not in this build's offline
  * jar set. What CAN be pinned without it: the reader option map, the
  * value projection over the connector's output schema, and that the
  * failure when the connector is absent is exactly the missing-provider
  * error (i.e. the wiring reaches the connector lookup, nothing before
  * it is broken). README documents the limitation.
  */
class KafkaWiringSpec extends SparkSpec {
  import spark.implicits._

  test("kafka reader options carry bootstrap/topic/offsets verbatim") {
    StreamingPipeline.kafkaOptions("broker1:9092,broker2:9092",
      "cdc.public.events", "earliest") shouldBe Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "cdc.public.events",
      "startingOffsets" -> "earliest")
  }

  test("value projection string-deserializes the connector's binary value") {
    // the connector's output schema: binary key/value + metadata — the
    // projection must keep exactly `value` as a string
    val kafkaShaped = Seq(
      ("k1".getBytes, """{"op":"c"}""".getBytes, "t", 0, 42L))
      .toDF("key", "value", "topic", "partition", "offset")
    val out = StreamingPipeline.valueAsString(kafkaShaped)
    out.columns.toSeq shouldBe Seq("value")
    out.as[String].head() shouldBe """{"op":"c"}"""
  }

  test("kafkaSource fails only at connector lookup when the jar is absent") {
    val e = intercept[Exception] {
      StreamingPipeline.kafkaSource(spark, "localhost:9092", "t", "earliest")
        .select(col("value"))
    }
    // the DataSource resolution error names the missing provider —
    // proof the reader wiring executed up to the classpath boundary
    e.getMessage.toLowerCase should include("kafka")
  }
}
