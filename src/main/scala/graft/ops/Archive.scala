package graft.ops

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Archivist-lite: time-bucketed Parquet archives with a retention policy
  * and `BEST AFTER` replay semantics.
  *
  * The reference's archivist allocates a global disk budget across workers
  * and deletes the oldest archive files first (`src/RamenArchivist.ml:31-50`,
  * the SMT allocation replaced here by the per-function budget the caller
  * passes); `PERSIST FOR d` bounds a function's history age and
  * `BEST AFTER e` declares when an output tuple stops changing
  * (`src/RamenProgram.ml:80-89`).
  *
  * Spark shape: the archive is a directory partitioned by an event-time
  * bucket column, so retention = dropping whole partition directories
  * (O(#buckets) driver work, no data rewrite) and replay reads are
  * partition-pruned parquet scans — at 100 TB both stay metadata-cheap.
  * All filesystem access goes through the Hadoop FileSystem API, so the
  * archive can live on HDFS/S3/local (`file:`) alike.
  */
object Archive {

  private val BucketCol = "_arch_bucket"

  /** Append `df` to the archive, bucketing `timeCol` (epoch seconds) into
    * `bucketSecs`-wide partitions. `format`: parquet (default) or orc —
    * the reference archives to ORC too (`tests/orc`, `CodeGen_Dessser`'s
    * C++ ORC writer). */
  def write(df: DataFrame, dir: String, timeCol: String,
      bucketSecs: Long = 3600L, format: String = "parquet"): Unit =
    df.withColumn(BucketCol,
        (col(timeCol).cast("double") / bucketSecs).cast("long") * bucketSecs)
      .write.mode(SaveMode.Append).partitionBy(BucketCol)
      .format(format).save(dir)

  /** Partition-pruned replay of `[from, until)` by event time bucket.
    * `bestAfter`: rows younger than `asOf - bestAfter` are still mutable in
    * the reference's model, so a replay "as of" a time excludes them. */
  def read(spark: SparkSession, dir: String,
      from: Option[Double] = None, until: Option[Double] = None,
      asOf: Option[Double] = None, bestAfter: Double = 0.0,
      timeCol: String = "start", bucketSecs: Long = 3600L,
      format: String = "parquet"): DataFrame = {
    var df = spark.read.format(format).load(dir)
    // bucket-level pruning (partition column) + row-level bounds
    from.foreach { f =>
      val b = math.floorDiv(f.toLong, bucketSecs) * bucketSecs
      df = df.filter(col(BucketCol) >= b && col(timeCol) >= f)
    }
    until.foreach { u =>
      df = df.filter(col(BucketCol) <= u.toLong && col(timeCol) < u)
    }
    asOf.foreach(a => df = df.filter(col(timeCol) <= a - bestAfter))
    df.drop(BucketCol)
  }

  /** The retention policy of one archived function. */
  final case class Retention(
      /** PERSIST FOR: drop buckets older than this (seconds) relative to
        * the newest archived bucket. */
      maxAgeSecs: Option[Double] = None,
      /** Disk budget: drop oldest buckets while the archive exceeds it. */
      sizeLimitBytes: Option[Long] = None)

  /** Enforce retention by deleting whole bucket partitions, oldest first
    * (the reference deletes oldest files first too). Returns the dropped
    * bucket values. `conf` carries the credentials/scheme bindings of the
    * archive's filesystem; defaults to the ambient Hadoop configuration. */
  def enforceRetention(dir: String, policy: Retention,
      conf: Configuration = new Configuration()): Seq[Long] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (!fs.exists(root)) return Nil
    val parts = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$BucketCol="))
      .map(s => (s.getPath.getName.stripPrefix(s"$BucketCol=").toLong, s.getPath))
      .sortBy(_._1)
    if (parts.isEmpty) return Nil
    val newest = parts.last._1
    // one recursive summary RPC per bucket (S3/HDFS-friendly; no tree walk)
    def sizeOf(p: Path): Long = fs.getContentSummary(p).getLength
    val dropped = scala.collection.mutable.ListBuffer.empty[Long]
    var live = parts.toVector
    // age bound first
    policy.maxAgeSecs.foreach { age =>
      val (old, keep) = live.partition { case (b, _) => newest - b > age }
      old.foreach { case (b, p) => fs.delete(p, true); dropped += b }
      live = keep
    }
    // then the size budget, oldest first, never dropping the newest bucket
    policy.sizeLimitBytes.foreach { limit =>
      var total = live.map(p => sizeOf(p._2)).sum
      while (total > limit && live.size > 1) {
        val (b, p) = live.head
        total -= sizeOf(p)
        fs.delete(p, true)
        dropped += b
        live = live.tail
      }
    }
    dropped.toSeq
  }
}
