package graft.ops

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: [[bruteForceTopK]] — exact cosine top-k via a broadcast join of
  * the (small) query set against the corpus; one pass, no shuffle of the
  * corpus, linear in corpus size. This is the verification/oracle path and
  * also the right plan whenever |queries| is small.
  *
  * Scale path: [[lshNeighbors]] — random-hyperplane LSH: each vector maps
  * to an h-bit sign signature; vectors sharing a signature band land in the
  * same bucket and only bucket-mates are compared. Corpus-side cost becomes
  * O(n · bands) tiny rows shuffled by bucket key, candidate comparisons are
  * confined to buckets (empirically ~1/2^r of the corpus per band at r bits
  * per band), and the hyperplanes are seeded so the plan is deterministic.
  */
object Similarity {

  /** Normalize + precompute norm once. */
  private def withVec(df: DataFrame, idCol: String, vecCol: String) =
    df.select(col(idCol).as("id"),
      expr(s"transform($vecCol, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("norm",
        sqrt(expr("aggregate(transform(v, x -> x * x), 0.0d, (a, x) -> a + x)")))

  private def cosine = round(
    expr("aggregate(zip_with(q.v, c.v, (x, y) -> x * y), 0.0d, (a, x) -> a + x)")
      / (col("q.norm") * col("c.norm")), 9)

  /** Cores to spread pair-expansion work over (small-input row stats
    * undersell a join with quadratic output — force the parallelism). */
  private def par(df: DataFrame): Int =
    df.sparkSession.sparkContext.defaultParallelism

  /** Exact top-k cosine neighbors of each query vector (self excluded). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = withVec(corpus, idCol, vecCol).repartition(par(corpus)).as("c")
    val q = withVec(queries, idCol, vecCol).as("q")
    import org.apache.spark.sql.expressions.Window
    val scored = q.join(c, col("q.id") =!= col("c.id"))
      .select(col("q.id").as("query_id"), col("c.id").as("neighbor_id"),
        cosine.as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Seeded random hyperplanes: `bands` bands of `r` planes each. */
  def hyperplanes(dim: Int, bands: Int, r: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new Random(seed)
    Seq.fill(bands * r)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Candidate neighbor pairs via random-hyperplane LSH; compare only
    * bucket-mates. Returns (id_a, id_b, cos) for candidates with
    * cos ≥ minCos. */
  def lshNeighbors(embs: DataFrame, idCol: String, vecCol: String,
      bands: Int = 8, r: Int = 8, minCos: Double = 0.0, seed: Long = 42L): DataFrame = {
    val first = embs.select(expr(s"size($vecCol)")).first()
    val dim = first.getInt(0)
    val planes = hyperplanes(dim, bands, r, seed)
    val spark = embs.sparkSession
    import spark.implicits._
    val v = withVec(embs, idCol, vecCol).repartition(par(embs))
    // Codegen-friendly projections: vector elements × broadcast plane
    // elements through a hash join + two-level partial aggregation (the
    // transform/zip_with HOF form is interpreted and dominates runtime).
    // Map-side partials reduce to bands×r dots then bands buckets per id
    // before each shuffle, so the exchanges stay narrow at corpus scale.
    val planeElems = broadcast(planes.zipWithIndex
      .flatMap { case (p, pid) => p.zipWithIndex.map { case (w, i) => (pid, i, w) } }
      .toDF("plane_id", "pos", "w"))
    val buckets = v
      .select(col("id"), posexplode(col("v")))
      .join(planeElems, "pos")
      .groupBy(col("id"), col("plane_id"))
      .agg(sum(col("col") * col("w")).as("dot"))
      // bucket value of band b = the r sign bits of its planes packed
      // big-endian: bit (r-1 - offset) of plane b*r + offset
      .groupBy(col("id"), (col("plane_id") / r).cast("int").as("band"))
      .agg(sum(when(col("dot") >= 0,
        call_function("shiftleft", lit(1L), lit(r - 1) - col("plane_id") % r))
        .otherwise(0L)).as("bucket"))
      .repartition(par(embs), col("band"), col("bucket"))
    val candidates = buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    // cosine only for deduped candidates; vector sides broadcast/hash-join
    candidates
      .join(v.select(col("id").as("id_a"), col("v").as("va"), col("norm").as("na")), "id_a")
      .join(v.select(col("id").as("id_b"), col("v").as("vb"), col("norm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0.0d, (a, x) -> a + x)")
          / (col("na") * col("nb")), 9).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
