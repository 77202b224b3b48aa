package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (Array(sfDir, outDir), only) = (args.take(2), args.drop(2))
    val spark = GraftSession.get()
    new java.io.File(outDir).mkdirs()
    // optional extra args: name prefixes to restrict the dump to (local
    // iteration; the driver always passes exactly two args)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.isEmpty || only.exists(name.startsWith) }
    selected.foreach { case (name, fn) =>
      try {
        // `.coalesce(1)` directly on the query can interact with the global
        // sort (AQE may drop the range exchange), losing the row order the
        // driver's order-sensitive hash compares against. Collect (results
        // are small at verify SF) — collect preserves a global orderBy — and
        // write back from a LocalRelation, whose single coalesced partition
        // keeps list order.
        val df = fn(spark, sfDir)
        val rows = java.util.Arrays.asList(df.collect(): _*)
        spark.createDataFrame(rows, df.schema).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
