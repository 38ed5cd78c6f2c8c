package graft

import java.sql.Timestamp

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Kafka

/** Broker-less checks of the Kafka shim: option/offset assembly,
  * the decode/encode stages on kafka-shaped frames, trigger parsing,
  * and the documented failure when the connector jar is absent.
  */
class KafkaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.spark

  private def opts(start: String = "latest") = Kafka.Options(
    bootstrapServers = "broker1:9092,broker2:9092",
    subscribe = Some("events"),
    startingOffsets = start)

  test("option assembly follows the connector's contract") {
    val m = opts().copy(maxOffsetsPerTrigger = Some(50000L),
      extra = Map("kafka.security.protocol" -> "SSL")).toMap
    assert(m("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(m("subscribe") == "events")
    assert(m("maxOffsetsPerTrigger") == "50000")
    assert(m("failOnDataLoss") == "true")
    assert(m("kafka.security.protocol") == "SSL")
    assert(!m.contains("subscribePattern") && !m.contains("assign"))
  }

  test("exactly one subscription mode, offsets validated") {
    intercept[IllegalArgumentException] {
      Kafka.Options("b:9092") // none
    }
    intercept[IllegalArgumentException] {
      Kafka.Options("b:9092", subscribe = Some("a"),
        subscribePattern = Some("a.*")) // two
    }
    intercept[IllegalArgumentException] {
      opts(start = "sometimes") // not earliest/latest/JSON
    }
    intercept[IllegalArgumentException] {
      opts().copy(endingOffsets = Some("earliest")) // ending can't be earliest
    }
    intercept[IllegalArgumentException] {
      opts().copy(maxOffsetsPerTrigger = Some(0L))
    }
    // the valid JSON offset form passes
    assert(opts(start = """{"events":{"0":-2}}""").toMap("startingOffsets")
      .startsWith("{"))
  }

  test("offsetsJson emits the connector's per-partition format, deterministically") {
    val j = Kafka.offsetsJson(Map(
      "events" -> Map(1 -> 500L, 0 -> 23L),
      "audit" -> Map(0 -> -2L)))
    // sorted topics and partitions: deterministic across runs
    assert(j == """{"audit":{"0":-2},"events":{"0":23,"1":500}}""")
  }

  /** A kafka-shaped static frame: what any Kafka read produces. */
  private def kafkaFrame(values: Seq[String]) = {
    val rows = values.zipWithIndex.map { case (v, i) =>
      Row(s"k$i".getBytes("UTF-8"), v.getBytes("UTF-8"), "events", 0,
        i.toLong, new Timestamp(1700000000000L + i), 0)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Kafka.RecordSchema)
  }

  test("decodeJson parses values and carries offsets; corrupt rows quarantine as NULL") {
    val schema = StructType(Seq(
      StructField("user", LongType), StructField("kind", StringType)))
    val df = Kafka.decodeJson(kafkaFrame(Seq(
      """{"user":7,"kind":"click"}""",
      """not json at all""",
      """{"user":9,"kind":"view"}""")), schema)
    val rows = df.orderBy(col("offset")).collect()
    assert(rows.length == 3)
    assert(rows(0).getAs[Row]("parsed").getAs[Long]("user") == 7L)
    assert(rows.map(_.getAs[Boolean]("corrupt")).toSeq ==
      Seq(false, true, false),
      "corrupt value must flag, not kill the stream")
    assert(rows(2).getAs[Row]("parsed").getAs[String]("kind") == "view")
    assert(rows.map(_.getAs[Long]("offset")).toSeq == Seq(0L, 1L, 2L),
      "provenance offsets must survive the decode")
    assert(rows(0).getAs[String]("key") == "k0")
  }

  test("encodeJson emits the sink schema and round-trips through decode") {
    import spark.implicits._
    val out = Kafka.encodeJson(
      Seq((7L, "click", 1.5), (9L, "view", 2.0)).toDF("user", "kind", "score"),
      topic = "enriched", keyCol = "user")
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      Kafka.SinkSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    // encode → (synthetic transport) → decode recovers the payload
    val back = Kafka.decodeJson(
      out.withColumn("partition", lit(0)).withColumn("offset", lit(0L))
        .withColumn("timestamp", lit(new Timestamp(1700000000000L)))
        .withColumn("timestampType", lit(0)),
      StructType(Seq(StructField("kind", StringType),
        StructField("score", DoubleType))))
      .select(col("key"), col("parsed.kind"), col("parsed.score"))
      .orderBy(col("key")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(back == Seq(("7", "click", 1.5), ("9", "view", 2.0)))
  }

  test("trigger parsing covers the three modes") {
    assert(Kafka.trigger("availableNow") == Trigger.AvailableNow())
    assert(Kafka.trigger("5 seconds") == Trigger.ProcessingTime("5 seconds"))
    assert(Kafka.trigger("continuous:1 second") ==
      Trigger.Continuous("1 second"))
  }

  test("without the connector jar, load fails naming the missing source") {
    // the sandbox ships no Kafka connector: the documented hand-off
    // boundary — everything up to load() is validated above
    val e = intercept[Exception] {
      Kafka.readStream(spark, opts())
    }
    assert(e.getMessage.toLowerCase.contains("kafka"),
      s"expected the missing-data-source error to name kafka: ${e.getMessage}")
  }
}
