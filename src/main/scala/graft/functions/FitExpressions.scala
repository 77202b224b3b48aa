package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Multi-predictor linear-regression prediction over a window of
  * observations, mirroring the reference's two spellings:
  *
  *  - `FIT(LATEST k (y; x1; …; xp))` — the stateless FIT of an array of
  *    tuples (reference `src/CodeGenLib.ml:946-1090`, `LinReg.fit`): anchor
  *    all observations at the first non-null one (the "origin"), least-
  *    squares the origin-differences WITHOUT an intercept over every
  *    observation except the last, then predict at the last observation.
  *    Degenerate/singular systems yield NULL (the reference raises `ImNull`).
  *
  *  - `FIT_MULTI(n, y, x1, …, xp)` — the stateful `Seasonal.multi_linreg`
  *    (`src/CodeGenLib.ml:867-903`): plain through-origin least squares of
  *    the n observations BEFORE the current row (the ring buffer's zero-
  *    initialised slots contribute nothing to the normal equations, so the
  *    shorter early windows are equivalent), predicting `β·x_current`.
  *    Failures yield 0.0 (the reference catches and returns 0.).
  *
  * Input is `array<struct<numeric…>>` where field 0 is the fitted value and
  * the rest are predictors (or a bare `array<numeric>` for the 0-predictor
  * one-dimension form). An observation with any NULL component is treated
  * as a null observation and skipped, as in the reference.
  *
  * Why `CodegenFallback`: the value is computed once per output row over a
  * window-sized (k ≈ 10–30) array that a WindowExec already materialised;
  * the Gaussian solve dominates and is plain JVM code either way, so
  * interpreted dispatch here is noise. (Contrast with the hot-path scans in
  * `aggs/ScanFolds.scala`, which are codegen'd.)
  */
case class LinRegPredict(child: Expression, anchorOrigin: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "linreg_predict"

  private def numericish(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _) if st.fields.nonEmpty &&
        st.fields.forall(f => numericish(f.dataType)) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(dt, _) if numericish(dt) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<struct<numeric…>> or array<numeric>, " +
        s"got ${other.sql}")
  }

  private lazy val fieldTypes: Array[DataType] = child.dataType match {
    case ArrayType(st: StructType, _) => st.fields.map(_.dataType)
    case ArrayType(dt, _) => Array(dt)
  }
  private lazy val isStruct: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType]

  private def getDouble(get: Int => Any, j: Int): Double = get(j) match {
    case d: java.lang.Double => d
    case f: java.lang.Float => f.toDouble
    case l: java.lang.Long => l.toDouble
    case i: java.lang.Integer => i.toDouble
    case s: java.lang.Short => s.toDouble
    case b: java.lang.Byte => b.toDouble
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case other => other.toString.toDouble
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val p = fieldTypes.length
    val obs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        if (isStruct) {
          val row = arr.getStruct(i, p)
          var ok = true
          val o = new Array[Double](p)
          var j = 0
          while (j < p && ok) {
            if (row.isNullAt(j)) ok = false
            else o(j) = getDouble(row.get(_, fieldTypes(j)), j)
            j += 1
          }
          if (ok) obs(i) = o
        } else {
          obs(i) = Array(getDouble(arr.get(_, fieldTypes(0)), i))
        }
      }
      i += 1
    }
    if (anchorOrigin) FitOps.fitOrigin(obs) else FitOps.fitRaw(obs)
  }

  override protected def withNewChildInternal(newChild: Expression): LinRegPredict =
    copy(child = newChild)
}

/** The regression math shared by both FIT spellings. Plain JVM code so the
  * expression (and any future codegen) can call it statically. */
object FitOps {

  /** Solve A·β = b for the p×p normal-equation system via Gaussian
    * elimination with partial pivoting. Returns null when singular. */
  def solve(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val p = b.length
    var col = 0
    while (col < p) {
      var piv = col
      var r = col + 1
      while (r < p) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      if (math.abs(a(piv)(col)) < 1e-12) return null
      if (piv != col) {
        val tmp = a(piv); a(piv) = a(col); a(col) = tmp
        val tb = b(piv); b(piv) = b(col); b(col) = tb
      }
      r = col + 1
      while (r < p) {
        val f = a(r)(col) / a(col)(col)
        if (f != 0.0) {
          var c = col
          while (c < p) { a(r)(c) -= f * a(col)(c); c += 1 }
          b(r) -= f * b(col)
        }
        r += 1
      }
      col += 1
    }
    val beta = new Array[Double](p)
    var r = p - 1
    while (r >= 0) {
      var s = b(r)
      var c = r + 1
      while (c < p) { s -= a(r)(c) * beta(c); c += 1 }
      beta(r) = s / a(r)(r)
      r -= 1
    }
    beta
  }

  /** Through-origin least squares of rows (each `[y, x1…xp]`): accumulate
    * XᵀX / Xᵀy and solve. Returns null when singular or empty. */
  private def leastSquares(rows: Seq[Array[Double]], p: Int): Array[Double] = {
    if (rows.isEmpty) return null
    val xtx = Array.fill(p)(new Array[Double](p))
    val xty = new Array[Double](p)
    rows.foreach { o =>
      var j = 0
      while (j < p) {
        val xj = o(j + 1)
        xty(j) += xj * o(0)
        var k2 = 0
        while (k2 < p) { xtx(j)(k2) += xj * o(k2 + 1); k2 += 1 }
        j += 1
      }
    }
    solve(xtx, xty)
  }

  /** Reference `LinReg.one_dimension` (`CodeGenLib.ml:959-986`): simple
    * regression against the slot index, skipping nulls, predicting one step
    * past the last used value. */
  private def oneDimension(obs: Array[Array[Double]]): java.lang.Double = {
    val numObs = obs.length - 1
    if (numObs < 1) return null
    val xAvg = (numObs - 1).toDouble / 2.0
    var b1n = 0.0; var b1d = 0.0; var nnn = 0; var last = 0.0
    var i = 0
    while (i < numObs) {
      val o = obs(i)
      if (o != null) {
        val xd = i - xAvg
        b1n += o(0) * xd; b1d += xd * xd; nnn += 1; last = o(0)
      }
      i += 1
    }
    if (nnn == 0) null
    else if (nnn == 1) last
    else last + b1n / b1d
  }

  /** Reference `LinReg.fit` (`CodeGenLib.ml:988-1075`). */
  def fitOrigin(obs: Array[Array[Double]]): java.lang.Double = {
    val n = obs.length
    var firstIdx = -1
    var i = 0
    while (i < n && firstIdx < 0) { if (obs(i) != null) firstIdx = i; i += 1 }
    if (firstIdx < 0) return null
    val origin = obs(firstIdx)
    if (firstIdx == n - 1) return origin(0)
    val p = origin.length - 1
    if (p == 0) return oneDimension(obs)
    val last = obs(n - 1)
    if (last == null) return null
    val rows = (firstIdx + 1 until n - 1).iterator.map(obs).filter(_ != null)
      .map { o =>
        val d = new Array[Double](p + 1)
        var j = 0
        while (j <= p) { d(j) = o(j) - origin(j); j += 1 }
        d
      }.toSeq
    // under- or exactly-determined systems have no honest fit — an exact
    // solve through noisy predictors is unbounded overfit (fit.ramen f2's
    // warmup); NULL, like every other degenerate case here
    if (rows.size <= p) return null
    val beta = leastSquares(rows, p)
    if (beta == null) return null
    var y = origin(0)
    var j = 0
    while (j < p) { y += beta(j) * (last(j + 1) - origin(j + 1)); j += 1 }
    y
  }

  /** Reference `Seasonal.multi_linreg` (`CodeGenLib.ml:867-903`): regression
    * of everything before the current (= last) observation, no origin
    * anchoring, predict at the current predictors; 0.0 when unsolvable. */
  def fitRaw(obs: Array[Array[Double]]): java.lang.Double = {
    val n = obs.length
    if (n == 0) return null
    val cur = obs(n - 1)
    if (cur == null) return null
    val p = cur.length - 1
    if (p == 0) return 0.0
    val rows = (0 until n - 1).iterator.map(obs).filter(_ != null).toSeq
    val beta = leastSquares(rows.map(_.clone()), p)
    if (beta == null) return 0.0
    var y = 0.0
    var j = 0
    while (j < p) { y += beta(j) * cur(j + 1); j += 1 }
    y
  }
}
