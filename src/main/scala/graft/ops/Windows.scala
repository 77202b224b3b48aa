package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Window helpers shared by the RaQL compiler and the DataFrame operators. */
object Windows {

  /** A window partition key that is constant-VALUED but not
    * constant-FOLDABLE: `pmod(xxhash64(seed), 1)` is 0 for every row, yet
    * survives the optimizer (a literal key is folded away, turning the
    * window back into a partition-less one).
    *
    * Why it exists: several plans run an ordered window over a PROVABLY
    * BOUNDED frame — per-chunk carry totals (≤ one row per input
    * partition), an already-`limit(n)`-ed top-n, a per-bucket prefix-sum
    * base. Single-partition execution is CORRECT there, but a
    * partition-less WindowExec logs its "No Partition Defined … serious
    * performance degradation" funnel warning, which (a) buries the log
    * and (b) makes the warning useless as a scale smell. Declaring this
    * one-group key keeps the semantics (every row in one group, one
    * ordered pass) and turns "every WindowExec in the executed plan
    * declares a partition spec" into an assertable plan property — any
    * partition-less window that remains is a REAL data-sized funnel
    * (see RaqlCompiler.sequentialWindow). */
  def oneGroup(seed: Column): Column = pmod(xxhash64(seed), lit(1))
}
