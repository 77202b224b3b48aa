package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** RaQL `READ FROM FILE … AS CSV` (`/root/reference/src/raql_operation.type:
  * 54-138`): declared schema, configurable separator/quote/escape/null,
  * optional header skip, glob paths, and DELETE-IF-done file handling.
  *
  * Spark-first: thin option mapping onto the built-in CSV source, which
  * already handles globs, schema enforcement, compression, and distributes
  * the read. `cleanSource`/`sourceArchiveDir` replace ramen's DELETE-IF in
  * streaming mode; the external preprocessor-command option is deliberately
  * not supported (run preprocessing as its own pipeline stage instead).
  */
object CsvSource {
  final case class CsvSpec(
      separator: String = ",",
      quote: String = "\"",
      escape: String = "\\",
      nullStr: String = "",
      header: Boolean = false,
      deleteAfterRead: Boolean = false)

  private def reader(spark: SparkSession, schema: StructType, spec: CsvSpec) =
    spark.read
      .schema(schema)
      .option("sep", spec.separator)
      .option("quote", spec.quote)
      .option("escape", spec.escape)
      .option("nullValue", spec.nullStr)
      .option("header", spec.header)
      .option("mode", "PERMISSIVE")

  def read(spark: SparkSession, path: String, schema: StructType,
      spec: CsvSpec = CsvSpec()): DataFrame =
    reader(spark, schema, spec).csv(path)

  /** Streaming variant: tail a directory of CSV files. */
  def readStream(spark: SparkSession, path: String, schema: StructType,
      spec: CsvSpec = CsvSpec()): DataFrame = {
    val r = spark.readStream
      .schema(schema)
      .option("sep", spec.separator)
      .option("quote", spec.quote)
      .option("escape", spec.escape)
      .option("nullValue", spec.nullStr)
      .option("header", spec.header)
    (if (spec.deleteAfterRead) r.option("cleanSource", "delete") else r).csv(path)
  }
}
