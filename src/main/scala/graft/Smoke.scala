package graft

/** Replicates the driver's t1 smoke: entry() on sf0.001 must return rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get()
    val df = SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=$n queries=${SparkEntry.queries.size} " +
      s"oracles=${SparkEntry.oracleSql.size}")
    assert(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
