package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** RaQL `READ FROM KAFKA TOPIC "t" [PARTITIONS [p;…]] WITH OPTIONS
  * "k"="v", … AS CSV|ROWBINARY (schema)` —
  * `/root/reference/src/raql_operation.type:71-118`,
  * `RamenOperation.ml:1528-1547`.
  *
  * Spark-first: the consumer options map onto the standard Spark Kafka
  * connector contract (`format("kafka")`), which already handles consumer
  * groups, partition assignment, offset tracking (checkpointed — the
  * reference's restart_from state file), and scales one Spark partition
  * per Kafka partition. Value decoding is a separate, connector-independent
  * stage over the connector's fixed output schema (key/value binary,
  * topic/partition/offset), so it is testable without a broker and reusable
  * for archived kafka dumps.
  */
object KafkaSource {

  final case class KafkaSpec(
      topic: String,
      partitions: Seq[Int] = Nil,
      /** Raw librdkafka-style consumer options from the RaQL text. */
      options: Map[String, String] = Map.empty)

  /** RaQL consumer options → Spark Kafka connector options.
    * "metadata.broker.list" (librdkafka's name, mandatory in the reference)
    * or "bootstrap.servers" becomes `kafka.bootstrap.servers`; explicit
    * PARTITIONS become an `assign` JSON, otherwise `subscribe`; remaining
    * consumer configs pass through under the connector's `kafka.` prefix. */
  def sparkOptions(spec: KafkaSpec): Map[String, String] = {
    val brokers = spec.options.get("metadata.broker.list")
      .orElse(spec.options.get("bootstrap.servers"))
      .getOrElse(throw new IllegalArgumentException(
        "kafka option \"metadata.broker.list\" is mandatory"))
    val route =
      if (spec.partitions.nonEmpty)
        "assign" -> s"""{"${spec.topic}":[${spec.partitions.mkString(",")}]}"""
      else "subscribe" -> spec.topic
    val passthrough =
      (spec.options - "metadata.broker.list" - "bootstrap.servers")
        .map { case (k, v) => s"kafka.$k" -> v }
    Map("kafka.bootstrap.servers" -> brokers,
      // the reference's default restart_from is OffsetFromEnd 0 = latest
      "startingOffsets" -> "latest") + route ++ passthrough
  }

  /** Decode connector-shaped rows (`value: binary`) as CSV lines with the
    * declared RaQL schema. One message = one record. */
  def decodeCsv(connectorFrame: DataFrame, schema: StructType,
      spec: CsvSource.CsvSpec = CsvSource.CsvSpec()): DataFrame =
    connectorFrame
      .select(from_csv(col("value").cast("string"), schema,
        Map("sep" -> spec.separator, "quote" -> spec.quote,
          "escape" -> spec.escape, "nullValue" -> spec.nullStr,
          "mode" -> "PERMISSIVE")).as("r"))
      .select("r.*")

  /** Decode connector-shaped rows as ClickHouse RowBinary. One message =
    * one encoded batch of rows. */
  def decodeRowBinary(connectorFrame: DataFrame, schema: StructType): DataFrame = {
    val spark = connectorFrame.sparkSession
    val rowEnc = Encoders.row(schema)
    connectorFrame
      .select(col("value"))
      .as(Encoders.BINARY)
      .mapPartitions { batches =>
        batches.flatMap(bytes => RowBinary.decode(bytes, schema))
      }(rowEnc)
      .toDF()
  }

  /** Full read path: connector stream + declared-format decode. Requires
    * the spark-sql-kafka connector on the classpath (standard Spark
    * distribution); the option mapping and decoders above are testable
    * without it. */
  def readStream(spark: SparkSession, spec: KafkaSpec, schema: StructType,
      format: String, csv: CsvSource.CsvSpec = CsvSource.CsvSpec()): DataFrame = {
    val raw = sparkOptions(spec)
      .foldLeft(spark.readStream.format("kafka")) { case (r, (k, v)) =>
        r.option(k, v)
      }
      .load()
    format match {
      case "csv" => decodeCsv(raw, schema, csv)
      case "rowbinary" => decodeRowBinary(raw, schema)
      case other =>
        throw new UnsupportedOperationException(s"kafka format $other")
    }
  }
}
