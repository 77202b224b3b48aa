package graft.ops

import org.apache.spark.sql.DataFrame

/** The fan-out width for the library's EXPLICIT repartitions (input
  * spreads, blocked pair joins): the session's configured shuffle width
  * when it exceeds the core count.
  *
  * Why not defaultParallelism alone: an explicit `repartition(n, …)` pins
  * its stage's partitioning — `spark.sql.shuffle.partitions` cannot widen
  * it afterwards. With width = core count, the per-partition share of a
  * pinned shuffle-hash build grows linearly with the data and eventually
  * outgrows per-task execution memory (measured at the ×1000 scale probe:
  * "Can't acquire 268435456 bytes memory to build hash relation" at 32
  * partitions over a 16 g heap). `spark.sql.shuffle.partitions` is
  * exactly the knob deployments size with data volume (SURVEY §scale), so
  * the operators' pinned exchanges must respect it as a floor; taking the
  * max keeps small-config sessions (tests pin 4) at full-core spread.
  */
object GraftPar {
  def of(df: DataFrame): Int = {
    val ss = df.sparkSession
    val shuffle =
      try ss.conf.get("spark.sql.shuffle.partitions").toInt
      catch { case _: Exception => 0 } // "auto" or unset → cores only
    math.max(ss.sparkContext.defaultParallelism, shuffle)
  }
}
