package graft.ops

/** Overlap two INDEPENDENT eager job chains on one SparkSession (guide
  * §2.6: actions are only sequential because the driver calls them
  * sequentially; a second submitting thread lets the scheduler back-fill
  * the first chain's stage tails instead of idling the executors).
  *
  * Only for chains that are (a) mutually independent — neither reads the
  * other's output or shared mutable state — and (b) individually
  * deterministic, so overlapping cannot change any value, only the wall.
  * First use: a11b's two training sweeps (coarse-centroid k-means and
  * per-subspace PQ k-means both scan the corpus and meet only at the
  * search), each a serial chain of bounded jobs whose tails left most of
  * the session idle.
  *
  * Scheduling stays the session default (FIFO): chain `a` keeps priority
  * and `b` back-fills — the guide's recommended shape. Job
  * groups/descriptions are thread-local in Spark, so the spawned chain
  * does not inherit or clobber the caller's labels.
  */
object Concurrently {

  /** Evaluate `a` on the calling thread while `b` runs on a helper
    * thread; returns both. If `a` fails, `b` is still awaited (its jobs
    * are already submitted — abandoning the thread would leak them past
    * the caller's error handling) and `a`'s error is thrown; `b`'s own
    * failure is rethrown unwrapped. */
  def both[A, B](a: => A, b: => B): (A, B) = {
    val fb = new java.util.concurrent.FutureTask[B](() => b)
    val t = new Thread(fb, "graft-concurrent-chain")
    t.setDaemon(true)
    t.start()
    val ra =
      try a
      catch { case e: Throwable =>
        try fb.get() catch { case _: Throwable => () }
        throw e
      }
    val rb =
      try fb.get()
      catch { case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
      }
    (ra, rb)
  }
}
