package graft.ops

/** Disk-budget allocation across archived functions — the optimizing
  * counterpart of [[Archive.enforceRetention]]'s per-function policies.
  *
  * The reference formulates this as an SMT optimization
  * (`/root/reference/src/RamenArchivist.ml:214-260` states the model,
  * `:330-470` emits it for Z3): each function worker gets a share of the
  * global byte budget; querying a function's history of duration d costs
  * either the IO of reading it back (`recall_cost · bytes/s · d`, when its
  * archive covers d) or the CPU of recomputing it from its parents
  * (`cpu/s · d` plus the parents' own query costs for d, recursively —
  * infinite for sources, whose input cannot be replayed). The solver picks
  * the shares minimizing total daily query cost, then (lexicographically)
  * the archived footprint.
  *
  * This module solves the same model without an SMT engine: for a fixed
  * assignment (which functions archive, and for how long) the cost is a
  * simple bottom-up DAG evaluation, and the useful assignments per function
  * are few — nothing, or exactly one of the distinct retention durations
  * (any other share either fails the coverage test, costing the same as
  * none, or over-covers, costing the same as the next duration down — the
  * footprint objective prunes both). The assignment space is searched
  * exhaustively when small (exact optimum, same argument as the SMT's), and
  * by steepest-descent local search over per-function moves from the
  * all-archived start when large. Cluster scale is irrelevant here: this is
  * driver-side metadata math over the function graph (hundreds of nodes),
  * not a data job.
  *
  * The output plugs straight into [[Archive.enforceRetention]]: each
  * function's allocated bytes become its `Retention.sizeLimitBytes`, so the
  * GC deletes oldest buckets down to the optimized share.
  */
object Archivist {

  /** Per-function stats the allocator needs — the Spark analog of the
    * reference's `arc_stats` (RamenArchivist.ml:73-80), sourced from
    * whatever metrics store the deployment keeps (instrumentation rows,
    * Spark metrics, parquet footers). */
  final case class FnStats(
      fq: String,
      parents: Seq[String] = Nil,
      /** archive bytes produced per second of event time (recall size) */
      bytesPerSec: Double,
      /** CPU seconds to recompute one second of output (compute cost) */
      cpuPerSec: Double,
      retention: Option[Ret] = None)

  /** `PERSIST FOR duration`, queried every `queryPeriodSecs`
    * (RamenRetention.ml: duration + period). */
  final case class Ret(durationSecs: Double, queryPeriodSecs: Double)

  /** One function's slice of the plan. */
  final case class Alloc(
      fq: String,
      /** archived history length (0 = not archived) */
      durationSecs: Double,
      /** byte budget handed to [[Archive.enforceRetention]] */
      bytes: Long)

  final case class Plan(
      allocs: Map[String, Alloc],
      /** expected total query cost per day (recall_cost units) */
      dailyCost: Double,
      totalBytes: Long)

  private val Invalid = Double.PositiveInfinity

  /** Allocate `sizeLimitBytes` across `fns`, minimizing daily query cost
    * then footprint. `recallCost` prices reading one byte back relative to
    * one CPU-second (the reference's user_conf.recall_cost).
    *
    * Exact (exhaustive over per-function duration choices) when the
    * search space is ≤ `exactLimit` states; steepest-descent local search
    * from the all-archived corner otherwise. Throws if no feasible
    * assignment exists (a retained source lineage cannot fit the budget —
    * same condition the reference flags as invalid-cost). */
  def allocate(fns: Seq[FnStats], sizeLimitBytes: Long,
      recallCost: Double = 1e-6, exactLimit: Long = 300000L): Plan = {
    require(fns.map(_.fq).distinct.size == fns.size, "duplicate fq")
    val byFq = fns.map(f => f.fq -> f).toMap
    fns.foreach(f => f.parents.foreach(p => require(byFq.contains(p),
      s"${f.fq} has unknown parent $p")))
    // reject cyclic parent graphs up front: cost() recurses parent-first
    // and memoizes only on return, so a cycle would be a StackOverflow
    // instead of a typed error
    locally {
      val state = collection.mutable.Map.empty[String, Int] // 1=open 2=done
      def visit(fq: String, path: List[String]): Unit = state.get(fq) match {
        case Some(2) => ()
        case Some(1) =>
          // path is most-recent-first; render the cycle forward: fq -> … -> fq
          val cycle = ((path.takeWhile(_ != fq) :+ fq).reverse :+ fq)
          throw new IllegalArgumentException(
            s"cycle in parents graph: ${cycle.mkString(" -> ")}")
        case _ =>
          state(fq) = 1
          byFq(fq).parents.foreach(visit(_, fq :: path))
          state(fq) = 2
      }
      fns.foreach(f => visit(f.fq, Nil))
    }
    val durations = fns.flatMap(_.retention).map(_.durationSecs)
      .filter(_ > 0).distinct.sorted
    if (durations.isEmpty)
      return Plan(fns.map(f => f.fq -> Alloc(f.fq, 0.0, 0L)).toMap, 0.0, 0L)

    // only ancestors-of-retained can ever be worth archiving: anything
    // else is never queried, directly or through a recompute chain
    val candidates: Seq[FnStats] = {
      val wanted = collection.mutable.Set.empty[String]
      def mark(fq: String): Unit =
        if (wanted.add(fq)) byFq(fq).parents.foreach(mark)
      fns.filter(_.retention.exists(_.durationSecs > 0)).foreach(f => mark(f.fq))
      fns.filter(f => wanted(f.fq))
    }
    val n = candidates.length
    val idxOf = candidates.map(_.fq).zipWithIndex.toMap
    val queriesPerDay = candidates.map(_.retention match {
      case Some(r) if r.durationSecs > 0 =>
        math.ceil(86400.0 / math.max(1.0, r.queryPeriodSecs))
      case _ => 0.0
    }).toArray
    val retainedDur = candidates.map(_.retention.map(_.durationSecs)
      .getOrElse(0.0)).toArray
    def bytesFor(f: FnStats, d: Double): Long =
      math.ceil(f.bytesPerSec * d).toLong

    // assignment: per candidate, -1 = no archive, else index into durations
    // (archive exactly that much history)
    def evaluate(assign: Array[Int]): (Double, Long) = {
      val totalBytes = candidates.indices.map { i =>
        val a = assign(i)
        if (a < 0) 0L else bytesFor(candidates(i), durations(a))
      }.sum
      if (totalBytes > sizeLimitBytes) return (Invalid, totalBytes)
      // cost(i)(di): query cost of candidate i for duration index di —
      // bottom-up over the DAG (parents are upstream, recursion is finite)
      val memo = Array.fill(n, durations.length)(-1.0)
      def cost(i: Int, di: Int): Double = {
        if (memo(i)(di) >= 0) return memo(i)(di)
        val f = candidates(i)
        val d = durations(di)
        val covered = assign(i) >= 0 && durations(assign(i)) >= d
        val c =
          if (covered) recallCost * f.bytesPerSec * d
          else if (f.parents.isEmpty) Invalid
          else f.cpuPerSec * d +
            f.parents.map(p => cost(idxOf(p), di)).sum
        memo(i)(di) = c
        c
      }
      var total = 0.0
      for (i <- candidates.indices if queriesPerDay(i) > 0) {
        val di = durations.indexOf(retainedDur(i))
        total += queriesPerDay(i) * cost(i, di)
      }
      (total, totalBytes)
    }

    def better(a: (Double, Long), b: (Double, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

    val opts = durations.length + 1
    val states = math.pow(opts.toDouble, n.toDouble)
    var best: Array[Int] = null
    var bestScore: (Double, Long) = (Invalid, Long.MaxValue)
    if (states <= exactLimit.toDouble) {
      // exhaustive — exact optimum over the same space the SMT searches
      val assign = Array.fill(n)(-1)
      def rec(i: Int): Unit =
        if (i == n) {
          val s = evaluate(assign)
          if (s._1 < Invalid && better(s, bestScore)) {
            bestScore = s; best = assign.clone()
          }
        } else {
          var a = -1
          while (a < durations.length) {
            assign(i) = a; rec(i + 1); a += 1
          }
          assign(i) = -1
        }
      rec(0)
    } else {
      // all-archived-at-longest start (feasible whenever anything is,
      // modulo budget — trimmed by the descent), then steepest descent
      // over single-function moves
      val assign = Array.fill(n)(durations.length - 1)
      var cur = evaluate(assign)
      var improved = true
      while (improved) {
        improved = false
        var bi = -1; var ba = 0; var bs = cur
        for (i <- 0 until n; a <- -1 until durations.length
             if a != assign(i)) {
          val old = assign(i)
          assign(i) = a
          val s = evaluate(assign)
          if (s._1 < Invalid && better(s, bs)) { bi = i; ba = a; bs = s }
          assign(i) = old
        }
        if (bi >= 0) { assign(bi) = ba; cur = bs; improved = true }
        else if (cur._1 == Invalid) {
          // over budget and no single move fixes it: drop the least
          // valuable archive outright and keep going
          val i = (0 until n).filter(assign(_) >= 0)
            .maxByOption(i => bytesFor(candidates(i), durations(assign(i))))
            .getOrElse(throw new IllegalArgumentException(
              "no feasible archival plan fits the budget"))
          assign(i) = -1
          cur = evaluate(assign)
          improved = true
        }
      }
      if (cur._1 == Invalid) throw new IllegalArgumentException(
        "no feasible archival plan fits the budget")
      best = assign; bestScore = cur
    }
    if (best == null) throw new IllegalArgumentException(
      "no feasible archival plan fits the budget")
    val allocs = fns.map { f =>
      val a = idxOf.get(f.fq).map(best(_)).getOrElse(-1)
      val d = if (a < 0) 0.0 else durations(a)
      f.fq -> Alloc(f.fq, d, if (a < 0) 0L else bytesFor(f, d))
    }.toMap
    Plan(allocs, bestScore._1, bestScore._2)
  }

  /** The per-function retention policies of a plan — feed each into
    * [[Archive.enforceRetention]] on that function's archive directory. */
  def retentions(plan: Plan): Map[String, Archive.Retention] =
    plan.allocs.collect { case (fq, a) if a.durationSecs > 0 =>
      // keyed on ARCHIVED (duration > 0), not bytes > 0: a function whose
      // modeled write rate is 0 is still archived — a 0-byte size limit
      // would GC the history the plan just decided to keep
      fq -> Archive.Retention(
        maxAgeSecs = Some(a.durationSecs),
        sizeLimitBytes = Some(a.bytes).filter(_ > 0))
    }

  /** Default per-second costs for a worker with no usable stats yet
    * (RamenConstsDefault.ml:93-94) — archival stays an option so that once
    * it runs, real stats replace the guess on the next reallocation. */
  val DefaultComputeCost = 0.5
  val DefaultRecallSize = 100.0

  /** [[FnStats]] from a batch of `runtime_stats` rows (the shape the
    * [[graft.streaming.Instrumentation]] stream republishes) — the Spark
    * analog of the reference's stats ingestion
    * (`arc_stats_of_runtime_stats` + `compute_cost` + `recall_size`,
    * RamenArchivist.ml:73-91,278-316): keep the LATEST row per worker
    * (counters are cumulative-since-startup), estimate total output bytes
    * as avg-sampled-tuple-size × tot_out_tuples, and divide bytes/cpu by
    * the EVENT-time span to get per-second rates; a worker with no etimes
    * or an empty span falls back to the defaults. Workers named in
    * `parents`/`retention` but absent from `stats` get default-cost
    * entries (same as the reference's stats-less placeholder, :597-600).
    *
    * Driver-side metadata math: `stats` collects (one row per worker —
    * bounded by the function graph, not the data). */
  def fnStatsOfRuntimeStats(stats: org.apache.spark.sql.DataFrame,
      parents: Map[String, Seq[String]] = Map.empty,
      retention: Map[String, Ret] = Map.empty): Seq[FnStats] = {
    import org.apache.spark.sql.functions._
    val latest = stats
      .groupBy(col("worker"))
      .agg(max_by(struct(col("min_etime"), col("max_etime"),
        col("tot_out_tuples"), col("tot_full_bytes"),
        col("tot_full_bytes_samples"), col("tot_cpu")),
        col("stats_time")).as("s"))
      .select(col("worker"), col("s.*"))
      .collect()
    val observed = latest.map { r =>
      val fq = r.getString(0)
      def optD(i: Int): Option[Double] =
        if (r.isNullAt(i)) None else Some(r.getDouble(i))
      val span = for (mi <- optD(1); ma <- optD(2) if ma > mi) yield ma - mi
      val outTuples = r.getLong(3)
      val fullBytes = r.getLong(4)
      val samples = r.getLong(5)
      val cpu = r.getDouble(6)
      // no sampled tuple sizes (the Spark Instrumentation stream cannot
      // observe serialized output bytes and reports samples = 0) ⇒ the
      // DEFAULT recall size, never 0.0: a zero bytes/s model makes every
      // archive free to keep — and free to recall — so the allocator
      // would assign everyone 0 bytes and the GC tick would delete all
      // history on the first wired run. (The reference hits the same
      // degenerate stats only for never-run workers, :597-600, and uses
      // its defaults there too.)
      val totalBytes =
        if (samples > 0) fullBytes.toDouble / samples * outTuples else 0.0
      fq -> FnStats(fq,
        parents = parents.getOrElse(fq, Nil),
        bytesPerSec = span.filter(_ => totalBytes > 0)
          .map(totalBytes / _).getOrElse(DefaultRecallSize),
        cpuPerSec = span.map(cpu / _).getOrElse(DefaultComputeCost),
        retention = retention.get(fq))
    }.toMap
    val known = parents.keySet ++ parents.values.flatten ++ retention.keySet
    val missing = (known -- observed.keySet).toSeq.sorted.map(fq =>
      FnStats(fq, parents.getOrElse(fq, Nil),
        DefaultRecallSize, DefaultComputeCost, retention.get(fq)))
    observed.values.toSeq.sortBy(_.fq) ++ missing
  }

  /** One tick of the archivist loop, end-to-end: runtime stats →
    * [[fnStatsOfRuntimeStats]] → [[allocate]] → [[retentions]] →
    * [[Archive.enforceRetention]] on each function's archive directory
    * (the reference's realloc + GC cycle, RamenArchivist.ml:660-700 +
    * RamenGc). A function present in `archiveDirs` but allocated ZERO
    * bytes is GC'd down to its newest bucket (budget 0) — its history no
    * longer earns its disk, but the live bucket is never deleted.
    * Returns the plan and the dropped bucket ids per function. */
  def reallocate(stats: org.apache.spark.sql.DataFrame,
      parents: Map[String, Seq[String]],
      retention: Map[String, Ret],
      sizeLimitBytes: Long,
      archiveDirs: Map[String, String],
      recallCost: Double = 1e-6,
      conf: org.apache.hadoop.conf.Configuration =
        new org.apache.hadoop.conf.Configuration()): (Plan, Map[String, Seq[Long]]) = {
    val fns = fnStatsOfRuntimeStats(stats, parents, retention)
    val plan = allocate(fns, sizeLimitBytes, recallCost)
    val policies = retentions(plan)
    val dropped = archiveDirs.map { case (fq, dir) =>
      val policy = policies.getOrElse(fq,
        Archive.Retention(sizeLimitBytes = Some(0L)))
      fq -> Archive.enforceRetention(dir, policy, conf)
    }
    (plan, dropped)
  }
  }
