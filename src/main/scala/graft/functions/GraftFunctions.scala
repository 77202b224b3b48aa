package graft.functions

import org.apache.spark.sql.{Column, GraftShims => ExpressionUtils}
import org.apache.spark.sql.functions._

import graft.aggs.{DampedHoltAffineScan, DampedHoltScan, DecayedTopK, ExpSmoothAffineScan, ExpSmoothScan, HoltWinterAffineScan, HoltWinterScan, HysteresisScan, RecallScan, ReservoirSample, SpaceSavingTopK}

/** Column-level wrappers for graft's custom aggregates and the
  * sequential-scan functions.
  *
  * The `*Arr` scan functions (expSmoothArr / holtDampedArr /
  * hysteresisArr) re-express the reference's per-group mutable scans
  * (`/root/reference/src/CodeGenLib.ml`: ExpSmooth :343-347, DampedHolt
  * :348-359, Hysteresis :506-514) as a fold (`aggregate` HOF) over the
  * time-ordered value array. NOTE: HOFs are interpreted (no codegen) and
  * the fold is O(array) per call — fine for one fold per bounded group
  * (s05/s11/w09), a scale-killer when re-evaluated per row over growing
  * prefixes. For per-row running output use the incremental
  * [[expSmoothScan]]/[[hysteresisScan]] window aggregates instead: O(1)
  * state folded once per row by WindowExec.
  */
object GraftFunctions {

  private def col2e(c: Column) = ExpressionUtils.expression(c)

  /** RaQL `TOP k x BY w` — SpaceSaving heavy hitters.
    * Exact iff `capacity` ≥ distinct keys; reference uses capacity = 10k. */
  def topK(key: Column, weight: Column, capacity: Int, k: Int): Column =
    ExpressionUtils.column(
      SpaceSavingTopK(col2e(key.cast("string")), col2e(weight.cast("long")),
        capacity, k).toAggregateExpression())

  /** RaQL `TOP k x BY w AT TIME t FOR d ABOVE s SIGMAS` — decayed heavy
    * hitters with outlier filtering. `decay = ln 2 / (d/2)` matches the
    * reference's FOR-duration half-life (CodeGen_RaQL2DIL.ml:1602-1606). */
  def topKDecayed(key: Column, weight: Column, time: Column,
      capacity: Int, k: Int, decay: Double, sigmas: Double = 0.0): Column =
    ExpressionUtils.column(
      DecayedTopK(col2e(key.cast("string")), col2e(weight.cast("double")),
        col2e(time.cast("double")), capacity, k, decay, sigmas)
        .toAggregateExpression())

  /** The reference's FOR-duration → decay-rate mapping. */
  def decayForDuration(d: Double): Double = math.log(2.0) / (0.5 * d)

  /** RaQL `SAMPLE n, x` — uniform reservoir sample of a group. */
  def reservoir(x: Column, n: Int, seed: Long = 42L): Column =
    ExpressionUtils.column(
      ReservoirSample(col2e(x.cast("double")), n, seed).toAggregateExpression())

  /** (version, numeric address) → canonical ip text ([[FormatIp]]). */
  def formatIp(version: Column, num: Column): Column =
    ExpressionUtils.column(FormatIp(col2e(version), col2e(num)))

  /** `ip IN cidr` membership over canonical text ([[IpInCidr]]). */
  def ipInCidr(ip: Column, cidr: Column): Column =
    ExpressionUtils.column(IpInCidr(col2e(ip.cast("string")),
      col2e(cidr.cast("string"))))

  /** RaQL byte-string → binary, one byte per char ([[Latin1Bytes]]). */
  def latin1Bytes(s: Column): Column =
    ExpressionUtils.column(Latin1Bytes(col2e(s.cast("string"))))

  /** Dot product of two float/double array columns (codegen'd loop — see
    * [[VecDot]]); the workhorse of the similarity operators. */
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(col2e(a), col2e(b)))

  /** L2 norm of a float/double array column. */
  def vecNorm(v: Column): Column = sqrt(vecDot(v, v))

  /** Values of `x` ordered by `ord` within the group, as an array. */
  def orderedValues(ord: Column, x: Column): Column =
    transform(array_sort(collect_list(struct(ord.as("o"), x.as("v")))),
      p => p.getField("v"))

  /** Incremental SMOOTH for running windows: same recurrence as
    * [[expSmoothArr]], O(1) state updated once per row. Use with
    * `.over(seqWindow.rowsBetween(unboundedPreceding, 0))`. */
  def expSmoothScan(x: Column, alpha: Double): Column =
    ExpressionUtils.column(
      ExpSmoothScan(col2e(x.cast("double")), alpha).toAggregateExpression())

  /** RaQL `SMOOTH_DAMPED_HOLT(a, b, phi, x)` for running windows: O(1)
    * (level, trend) state, emits the one-step forecast per row. */
  def dampedHoltScan(x: Column, alpha: Double, beta: Double,
      phi: Double): Column =
    ExpressionUtils.column(
      DampedHoltScan(col2e(x.cast("double")), alpha, beta, phi)
        .toAggregateExpression())

  /** RaQL `SMOOTH_DAMPED_HOLT_WINTER(a, b, g, p, phi, x)` for running
    * windows: O(period) seasonal ring folded once per row. */
  def holtWinterScan(x: Column, alpha: Double, beta: Double, gamma: Double,
      period: Int, phi: Double): Column =
    ExpressionUtils.column(
      HoltWinterScan(col2e(x.cast("double")), alpha, beta, gamma, period, phi)
        .toAggregateExpression())

  /** The prefix fold of SMOOTH as an affine map struct(a, b) over the
    * incoming state (`value = a*s_in + b`; nulls are the identity) — the
    * within-chunk half of the distributed SMOOTH ([[ExpSmoothAffineScan]]). */
  def expSmoothAffine(x: Column, alpha: Double): Column =
    ExpressionUtils.column(
      ExpSmoothAffineScan(col2e(x.cast("double")), alpha).toAggregateExpression())

  /** The prefix fold of SMOOTH_DAMPED_HOLT as an affine map
    * struct(a11,a12,b1,a21,a22,b2) over the incoming (level, trend) —
    * the within-chunk half of the distributed DAMPED HOLT
    * ([[DampedHoltAffineScan]]). */
  def dampedHoltAffine(x: Column, alpha: Double, beta: Double,
      phi: Double): Column =
    ExpressionUtils.column(
      DampedHoltAffineScan(col2e(x.cast("double")), alpha, beta, phi)
        .toAggregateExpression())

  /** The prefix fold of SMOOTH_DAMPED_HOLT_WINTER as an affine map
    * struct(m: array<double> (2+p)×(3+p) row-major, cnt: int) over the
    * incoming [level, trend, seasonal ring] in chunk-relative ring
    * coordinates — the within-chunk half of the distributed HOLT WINTERS
    * ([[HoltWinterAffineScan]]). */
  def holtWinterAffine(x: Column, alpha: Double, beta: Double, gamma: Double,
      period: Int, phi: Double): Column =
    ExpressionUtils.column(
      HoltWinterAffineScan(col2e(x.cast("double")), alpha, beta, gamma,
        period, phi).toAggregateExpression())

  /** FIT_MULTI prediction over a window-collected array of (y, x1…xp)
    * structs: through-origin least squares of all but the last observation,
    * predicting at the last (Seasonal.multi_linreg semantics). */
  def fitMultiPredict(obs: Column): Column =
    ExpressionUtils.column(LinRegPredict(col2e(obs), anchorOrigin = false))

  /** RECALL (= REMEMBER refresh=false) for running windows: true while the
    * key's time is within `dur` of its current registration, O(1) state.
    * Use over a key-partitioned running window. */
  def recallScan(t: Column, dur: Double): Column =
    ExpressionUtils.column(
      RecallScan(col2e(t.cast("double")), dur).toAggregateExpression())

  /** Incremental HYSTERESIS for running windows: same transitions as
    * [[hysteresisArr]], O(1) state updated once per row. `startAcceptable`
    * sets the assumed pre-scan regime (both variants drive the chunked
    * 2-state automaton composition). */
  def hysteresisScan(x: Column, acceptable: Double, maximum: Double,
      startAcceptable: Boolean = true): Column =
    ExpressionUtils.column(
      HysteresisScan(col2e(x.cast("double")), acceptable, maximum,
        startAcceptable).toAggregateExpression())

  /** RaQL `SMOOTH alpha, x` over an ordered array: s := alpha*x + (1-a)*s,
    * seeded with the first element; returns the final smoothed value. */
  def expSmoothArr(vals: Column, alpha: Double): Column = {
    val a = lit(alpha)
    aggregate(
      slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
      element_at(vals, 1),
      (acc, x) => a * x + (lit(1.0) - a) * acc)
  }

  /** RaQL `DAMPED HOLT a, b, phi, x`: damped-trend double exponential
    * smoothing; returns the one-step forecast level + phi*trend. */
  /** RaQL `DAMPED HOLT WINTER a,b,g,phi,p,x` — damped-trend double
    * exponential smoothing plus additive seasonality of period `p`
    * (reference `src/CodeGenLib.ml:360-382`), folded over the time-ordered
    * group array. Returns the one-step forecast. Group arrays are bounded
    * per key, so the HOF fold is off the hot row path. */
  def holtWintersArr(vals: Column, alpha: Double, beta: Double,
      gamma: Double, phi: Double, period: Int): Column = {
    // state: level, trend, seasonal components s[0..p-1], index i
    val init = struct(
      element_at(vals, 1).as("l"), lit(0.0).as("b"),
      array_repeat(lit(0.0), period).as("s"), lit(1).as("i"))
    val fold = aggregate(
      slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
      init,
      (acc, x) => {
        val l = acc.getField("l"); val b = acc.getField("b")
        val s = acc.getField("s"); val i = acc.getField("i")
        val si = element_at(s, i % period + 1)
        val lNew = lit(alpha) * (x - si) +
          (lit(1.0) - lit(alpha)) * (l + lit(phi) * b)
        val bNew = lit(beta) * (lNew - l) + (lit(1.0) - lit(beta)) * lit(phi) * b
        val siNew = lit(gamma) * (x - lNew) + (lit(1.0) - lit(gamma)) * si
        val sNew = transform(sequence(lit(1), lit(period)), j =>
          when(j === i % period + 1, siNew).otherwise(element_at(s, j)))
        struct(lNew.as("l"), bNew.as("b"), sNew.as("s"), (i + 1).as("i"))
      })
    fold.getField("l") + lit(phi) * fold.getField("b") +
      element_at(fold.getField("s"), fold.getField("i") % period + 1)
  }

  def holtDampedArr(vals: Column, alpha: Double, beta: Double, phi: Double): Column = {
    val fold = aggregate(
      slice(vals, lit(2), greatest(size(vals) - 1, lit(0))),
      struct(element_at(vals, 1).as("l"), lit(0.0).as("b")),
      (acc, x) => {
        val lPrev = acc.getField("l"); val bPrev = acc.getField("b")
        val lNew = lit(alpha) * x +
          (lit(1.0) - lit(alpha)) * (lPrev + lit(phi) * bPrev)
        val bNew = lit(beta) * (lNew - lPrev) +
          (lit(1.0) - lit(beta)) * lit(phi) * bPrev
        struct(lNew.as("l"), bNew.as("b"))
      })
    fold.getField("l") + lit(phi) * fold.getField("b")
  }

  /** RaQL `FIT (latest k x)` — one-dimension linear fit, exactly the
    * reference's one_dimension (`CodeGenLib.ml:959-986`): regress over all
    * but the LAST element (x = position, x̄ = (m-1)/2), then predict
    * last-used + slope. One observation → that observation. */
  def fitArr(vals: Column): Column = {
    val m = size(vals) - 1 // observations used (last element excluded)
    val xAvg = (m - 1).cast("double") / 2.0
    val obs = slice(vals, lit(1), greatest(m, lit(0)))
    val b1n = aggregate(
      zip_with(obs, sequence(lit(0), greatest(m - 1, lit(0))),
        (y, x) => y * (x.cast("double") - xAvg)),
      lit(0.0), (acc, v) => acc + v)
    // Σ(x - x̄)² for x = 0..m-1 has the closed form m(m²-1)/12
    val b1d = (m * (m * m - 1)).cast("double") / 12.0
    when(m <= 0, lit(null))
      .when(m === 1, element_at(vals, 1).cast("double"))
      .otherwise(element_at(vals, m).cast("double") + b1n / b1d)
  }

  /** Unicode sparkline of a numeric array (RaQL SPARKLINE): each value
    * scaled min→max onto ▁▂▃▄▅▆▇█ with the REFERENCE's quantization
    * (RamenHelpersNoLog.ml:1026-1041): c = ⌊(v − min) · 7 / (max − min)⌋,
    * and a flat series renders all-bottom (ratio 0), not mid-bar. */
  def sparklineArr(vals: Column): Column = {
    val bars = "▁▂▃▄▅▆▇█"
    val mn = array_min(vals).cast("double")
    val mx = array_max(vals).cast("double")
    val span = mx - mn
    concat_ws("", transform(vals, v => {
      val idx = when(span > 0,
        floor((v.cast("double") - mn) * 7 / span)).otherwise(lit(0.0))
      substring(lit(bars), idx.cast("int") + 1, lit(1))
    }))
  }

  /** RaQL `HYSTERESIS x, acceptable, maximum`: true while the signal is in
    * the acceptable regime; flips false once it exceeds `maximum`, flips
    * back once it returns to ≤ `acceptable`. Scans the ordered array and
    * returns the final state. */
  def hysteresisArr(vals: Column, acceptable: Double, maximum: Double): Column =
    aggregate(vals, lit(true),
      (acc, x) => when(x > maximum, lit(false))
        .when(x <= acceptable, lit(true))
        .otherwise(acc))
}
