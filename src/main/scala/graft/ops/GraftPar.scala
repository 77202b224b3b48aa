package graft.ops

import org.apache.spark.sql.DataFrame

/** The fan-out width for the library's EXPLICIT repartitions (input
  * spreads, blocked pair joins): `spark.graft.fanout` when set, else the
  * session's core count.
  *
  * Why a dedicated knob: an explicit `repartition(n, …)` pins its
  * stage's partitioning — `spark.sql.shuffle.partitions` cannot widen it
  * afterwards. With width = core count, the per-partition share of a
  * pinned shuffle-hash build grows linearly with the data and eventually
  * outgrows per-task execution memory (measured at the ×1000 scale
  * probe: "Can't acquire 268435456 bytes memory to build hash relation"
  * at 32 partitions over a 16 g heap), so data-scaled deployments must
  * widen the pinned fan-outs alongside their shuffle width. Borrowing
  * `spark.sql.shuffle.partitions` itself was rejected: Spark's
  * out-of-box default is 200, which would silently inflate every spread
  * to 200 pinned tasks in any session that didn't set the conf — an
  * explicit opt-in knob can't misfire that way. The floor at core count
  * keeps a mis-set small value from starving the pair-expansion stages
  * the explicit repartitions exist to parallelize.
  */
object GraftPar {
  val Key = "spark.graft.fanout"

  def of(df: DataFrame): Int = {
    val ss = df.sparkSession
    val cores = ss.sparkContext.defaultParallelism
    val fanout =
      try ss.conf.getOption(Key).map(_.toInt).getOrElse(0)
      catch {
        case _: NumberFormatException =>
          // loud, not silent: a typo'd fanout falling back to core count
          // quietly reintroduces the ×1000 pinned-fanout OOM the knob
          // exists to prevent (r12 ADVICE)
          org.slf4j.LoggerFactory.getLogger(GraftPar.getClass).warn(
            s"malformed $Key='${ss.conf.getOption(Key).getOrElse("")}' " +
              s"ignored; falling back to core count $cores")
          0
      }
    math.max(cores, fanout)
  }
}
