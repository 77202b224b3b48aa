package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters — the
  * supported way for libraries shipping custom Catalyst expressions to
  * expose them as user-facing Columns in Spark 4.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Drain the async listener bus — a metrics-collecting SparkListener
    * (ScaleProbe's shuffle accounting) sees stage-completed events only
    * after the bus delivers them; without a drain the last stages of a
    * just-finished job are still in flight when the caller reads the
    * counters. `listenerBus` is `private[spark]`, hence this shim. */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000)
}
