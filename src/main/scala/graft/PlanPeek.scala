package graft

/** Plan diagnostic: execute a registered query and print its post-AQE
  * executed plan (what actually ran — join strategies, build sides,
  * exchanges). `runMain graft.PlanPeek <query> [sfDir] [grep]`.
  * The r12 ×1000 probe OOM was diagnosed blind because the executed
  * plan of a failing run is awkward to reach from the logs; this makes
  * "which side does that SHJ build on" a one-liner. */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      throw new IllegalArgumentException("usage: PlanPeek <query> [sfDir] [grep]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val needle = args.lift(2)
    val spark = GraftSession.get()
    val q = Queries.all.find(_.name == name).getOrElse(
      throw new NoSuchElementException(name))
    val df = q.run(spark, sfDir)
    // execute THIS queryExecution (a noop write runs a SEPARATE one whose
    // adaptive plan stays isFinalPlan=false — Profile.scala's lesson), so
    // the printed plan is the finalized post-AQE one that actually ran
    df.queryExecution.toRdd.foreachPartition(_ => ())
    val plan = df.queryExecution.executedPlan.toString
    needle match {
      case Some(n) =>
        plan.split("\n").filter(_.contains(n)).foreach(l => println(s"[plan] $l"))
      case None => println(plan)
    }
    spark.stop()
  }
}
