package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Kafka source/sink interface shim — the option, offset, and
  * trigger plumbing of Spark's Kafka connector (reference:
  * /root/reference/external/kafka-0-10-sql/src/main/scala/org/
  * apache/spark/sql/kafka010/KafkaSourceProvider.scala:1) behind the
  * same load()-shaped surface as the file stream source, validated
  * and spec-tested WITHOUT a broker.
  *
  * What is real here (and spec'd): option assembly with the
  * connector's exactly-one-subscription rule, starting/ending offset
  * JSON construction, the value-decode stage (from_json over the
  * fixed Kafka record schema, offsets carried through), the
  * key/value encode stage for the sink side, and trigger parsing.
  * What is NOT: a broker integration test — the sandbox ships no
  * Kafka connector jar or broker, so `load()` documents the one-line
  * hand-off (`spark.readStream.format("kafka").options(...).load()`)
  * and fails with the connector's own missing-source error when the
  * jar is absent. The decode/encode stages run against ANY frame
  * with the Kafka record shape, which is exactly how the specs drive
  * them.
  */
object Kafka {

  /** The fixed record schema every Kafka read produces — the shape
    * the decode stage consumes and the specs synthesize.
    */
  val RecordSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))

  /** The sink-side shape `writeStream.format("kafka")` requires. */
  val SinkSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType)))

  /** Validated connector options. Exactly one of `subscribe`
    * (topic list), `subscribePattern` (regex), `assign`
    * (topic-partitions JSON) — the connector's own rule, enforced
    * here so a misassembled job fails at build time, not at stream
    * start. Offsets accept `earliest`, `latest`, or the per-partition
    * JSON [[offsetsJson]] builds.
    */
  case class Options(
      bootstrapServers: String,
      subscribe: Option[String] = None,
      subscribePattern: Option[String] = None,
      assign: Option[String] = None,
      startingOffsets: String = "latest",
      endingOffsets: Option[String] = None,
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = true,
      extra: Map[String, String] = Map.empty) {

    require(bootstrapServers.nonEmpty, "kafka: bootstrapServers is required")
    require(Seq(subscribe, subscribePattern, assign).count(_.nonEmpty) == 1,
      "kafka: exactly one of subscribe / subscribePattern / assign")
    require(validOffsets(startingOffsets),
      s"kafka: startingOffsets must be earliest, latest, or offset JSON, " +
        s"got '$startingOffsets'")
    endingOffsets.foreach(e => require(validOffsets(e) && e != "earliest",
      s"kafka: endingOffsets must be latest or offset JSON, got '$e'"))
    maxOffsetsPerTrigger.foreach(m => require(m > 0L,
      s"kafka: maxOffsetsPerTrigger must be positive, got $m"))

    /** The exact option map the connector receives. */
    def toMap: Map[String, String] =
      extra ++
        Map("kafka.bootstrap.servers" -> bootstrapServers,
          "startingOffsets" -> startingOffsets,
          "failOnDataLoss" -> failOnDataLoss.toString) ++
        subscribe.map("subscribe" -> _) ++
        subscribePattern.map("subscribePattern" -> _) ++
        assign.map("assign" -> _) ++
        endingOffsets.map("endingOffsets" -> _) ++
        maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)
  }

  private def validOffsets(s: String): Boolean =
    s == "earliest" || s == "latest" || s.trim.startsWith("{")

  /** Per-partition offset JSON: {"topic":{"0":23,"1":-2}} — the
    * connector's startingOffsets/endingOffsets format (-2 earliest,
    * -1 latest). Topics and partitions are emitted in sorted order so
    * the string is deterministic (comparable across checkpoints).
    */
  def offsetsJson(offsets: Map[String, Map[Int, Long]]): String =
    offsets.toSeq.sortBy(_._1).map { case (topic, parts) =>
      val ps = parts.toSeq.sortBy(_._1)
        .map { case (p, o) => s""""$p":$o""" }.mkString(",")
      s""""$topic":{$ps}"""
    }.mkString("{", ",", "}")

  /** Streaming read over the assembled options — the one-line
    * hand-off to the connector. Requires the Kafka connector jar on
    * the classpath (absent in this sandbox; the call then fails with
    * Spark's missing-data-source error naming "kafka").
    */
  def readStream(spark: SparkSession, opts: Options): DataFrame =
    spark.readStream.format("kafka").options(opts.toMap).load()

  /** Batch read (bounded by `endingOffsets`) over the same options. */
  def read(spark: SparkSession, opts: Options): DataFrame =
    spark.read.format("kafka").options(opts.toMap).load()

  /** Decode stage: JSON message values parsed against `schema`,
    * keys as strings, provenance columns (topic, partition, offset,
    * kafka timestamp) carried through — the standard first transform
    * after any Kafka read. Permissive parse with an explicit
    * `corrupt` flag: from_json alone yields an all-NULL struct for
    * garbage, indistinguishable from a legitimately-null payload, so
    * the corrupt-record column is threaded through the parse and
    * surfaced as a boolean (same dead-letter posture as the lenient
    * JSON file read in [[Sources]]). Works on any frame with
    * [[RecordSchema]]'s columns, streaming or static — which is how
    * the broker-less spec drives it.
    */
  def decodeJson(records: DataFrame, schema: StructType): DataFrame = {
    val augmented = schema.add("_graft_corrupt", StringType)
    records.select(
      col("key").cast("string").as("key"),
      from_json(col("value").cast("string"), augmented,
        Map("columnNameOfCorruptRecord" -> "_graft_corrupt")).as("p"),
      col("topic"), col("partition"), col("offset"),
      col("timestamp").as("kafka_ts"))
      .select(col("key"), col("p").dropFields("_graft_corrupt").as("parsed"),
        col("p._graft_corrupt").isNotNull.as("corrupt"),
        col("topic"), col("partition"), col("offset"), col("kafka_ts"))
  }

  /** Encode stage for the sink: (key, value, topic) in the binary
    * shape `writeStream.format("kafka")` requires, value as the JSON
    * of all non-key columns.
    */
  def encodeJson(df: DataFrame, topic: String, keyCol: String): DataFrame =
    df.select(
      col(keyCol).cast("string").cast("binary").as("key"),
      to_json(struct(df.columns.filterNot(_ == keyCol).map(col)
        .toIndexedSeq: _*)).cast("binary").as("value"),
      lit(topic).as("topic"))

  /** Trigger parsing: "availableNow" (drain-and-stop),
    * "continuous:<interval>", or a processing-time interval
    * ("5 seconds") — the three trigger modes a Kafka job configures.
    */
  def trigger(spec: String): Trigger = spec.trim match {
    case "availableNow" => Trigger.AvailableNow()
    case c if c.startsWith("continuous:") =>
      Trigger.Continuous(c.stripPrefix("continuous:"))
    case interval => Trigger.ProcessingTime(interval)
  }
}
