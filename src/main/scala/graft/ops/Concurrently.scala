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
  * and `b` back-fills — the guide's recommended shape. Spark's local
  * properties (job group, description) live in an InheritableThreadLocal
  * cloned into child threads, so the spawned chain INHERITS the caller's
  * labels at spawn time (cancelling the caller's job group cancels the
  * helper chain too — the desired all-or-nothing contract); because the
  * clone is a snapshot, the helper can never clobber labels the caller
  * sets afterwards.
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
        // bound the drain wait so a hung `b` cannot bury a's error, and
        // preserve interrupt status if the wait itself is interrupted;
        // b's failure (if any) rides along as suppressed
        try fb.get(600L, java.util.concurrent.TimeUnit.SECONDS)
        catch {
          case ie: InterruptedException =>
            Thread.currentThread().interrupt()
            e.addSuppressed(ie)
          case be: Throwable => e.addSuppressed(be)
        }
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
