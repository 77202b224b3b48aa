package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col

/** RaQL `SORT LAST n [BY k…]` — the reference's bounded reorder buffer
  * (`/root/reference/src/RamenSortBuf.ml:1-14`; `tests/func/sort.ramen`):
  * tuples enter a size-n buffer; once it overflows, the smallest by the
  * sort key leaves first, and the buffer drains in key order at
  * end-of-stream. The output is the input re-ordered under a bounded
  * disorder horizon — NOT a total sort.
  *
  * Spark shape: genuinely sequential per-stream imperative state, so this
  * is one of the rare justified `mapPartitions` — a size-n binary heap per
  * partition, O(log n) per row, O(n) memory. RaQL sources are
  * single-partition (arrival order is load-bearing), matching the
  * reference's per-worker buffer; on a partitioned input each partition
  * reorders independently, which is the right distributed semantics (one
  * buffer per stream shard, like one per reference worker). Streaming: the
  * same operator applies per micro-batch (bounded disorder within a batch);
  * cross-batch reordering belongs to watermarks, not the sort buffer.
  */
object SortBuffer {

  /** null-last, type-natural comparison of key cells. */
  private def cmpAny(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => 1
    case (_, null) => -1
    case (x: Number, y: Number) =>
      java.lang.Double.compare(x.doubleValue(), y.doubleValue())
    case (x: String, y: String) => x.compareTo(y)
    case (x: java.lang.Boolean, y: java.lang.Boolean) => x.compareTo(y)
    case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.compareTo(y)
    case (x: java.time.Instant, y: java.time.Instant) => x.compareTo(y)
    case (x: Comparable[_], _) => x.asInstanceOf[Comparable[Any]].compareTo(b)
    case _ => 0
  }

  def apply(df: DataFrame, n: Int, keys: Seq[Column]): DataFrame = {
    if (keys.isEmpty || n <= 0) return df
    val keyNames = keys.indices.map(i => s"_sortbuf_k$i")
    val withKeys = keys.zip(keyNames).foldLeft(df) {
      case (d, (c, nm)) => d.withColumn(nm, c)
    }
    val schema = withKeys.schema
    val keyIdx = keyNames.map(schema.fieldIndex).toArray
    // (key cells, arrival seq) ordering: min-first, FIFO on ties
    implicit val ord: Ordering[(Array[Any], Long, Row)] =
      new Ordering[(Array[Any], Long, Row)] {
        def compare(a: (Array[Any], Long, Row), b: (Array[Any], Long, Row)): Int = {
          var i = 0
          while (i < keyIdx.length) {
            val c = cmpAny(a._1(i), b._1(i))
            if (c != 0) return c
            i += 1
          }
          java.lang.Long.compare(a._2, b._2)
        }
      }
    val out = withKeys.mapPartitions { it =>
      // PriorityQueue is max-first: reverse for min-first emission
      val pq = mutable.PriorityQueue.empty[(Array[Any], Long, Row)](ord.reverse)
      var arrival = 0L
      new Iterator[Row] {
        def hasNext: Boolean = it.hasNext || pq.nonEmpty
        def next(): Row = {
          // admit rows until the buffer overflows n, then release the min
          while (it.hasNext && pq.size <= n) {
            val r = it.next()
            arrival += 1
            pq.enqueue((keyIdx.map(r.get), arrival, r))
          }
          pq.dequeue()._3
        }
      }
    }(Encoders.row(schema))
    out.select(df.columns.map(col).toSeq: _*)
  }
}
