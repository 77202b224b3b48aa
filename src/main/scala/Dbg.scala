import java.nio.file.{Files, Paths}
import graft._
import graft.raql.RaqlCompiler
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("4").getOrCreate()
    spark.conf.set("graft.raql.everyRows", "150")
    val funcDir = "/root/reference/tests/func"
    def load(names: String*): RaqlCompiler =
      RaqlCompiler.fromSources(spark, funcDir,
        names.map(n => n -> Files.readString(Paths.get(s"$funcDir/$n.ramen"))).toMap)
        .fold(e => throw new RuntimeException(e), identity)
    for (spec <- args) {
      val parts = spec.split(":")     // progs...:fn
      val fn = parts.last
      val c = load(parts.dropRight(1): _*)
      println(s"==== $fn")
      try c.compile(fn).show(8, false)
      catch { case e: Exception => println("ERR " + e.toString.take(300)) }
    }
    spark.stop()
  }
}
