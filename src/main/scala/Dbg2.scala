import java.nio.file.{Files, Paths}
import graft._
import graft.raql.RaqlCompiler
object Dbg2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("4").getOrCreate()
    val funcDir = "/root/reference/tests/func"
    val c = RaqlCompiler.fromSources(spark, funcDir, Map(
      "fixtures/mixture" -> Files.readString(Paths.get(s"$funcDir/fixtures/mixture.ramen"))))
      .fold(e => throw new RuntimeException(e), identity)
    c.compile("fixtures/mixture/csv").show(8, false)
    spark.stop()
  }
}
