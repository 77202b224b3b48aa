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

  /** Exact top-k cosine neighbors of each query vector (self excluded). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val c = withVec(corpus, idCol, vecCol).as("c")
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
    // literal plane matrix; per row compute sign bits then band bucket keys
    val planeArr = array(planes.map(p => array(p.map(lit): _*)): _*)
    val v = withVec(embs, idCol, vecCol)
      .withColumn("planes", planeArr)
      .withColumn("bits", expr(
        """transform(planes, p ->
             CASE WHEN aggregate(zip_with(p, v, (x, y) -> x * y), 0.0d, (a, x) -> a + x) >= 0
             THEN 1L ELSE 0L END)"""))
      .withColumn("buckets", expr(
        s"""transform(sequence(0, ${bands - 1}, 1), b ->
              aggregate(slice(bits, b * $r + 1, $r), 0L, (acc, x) -> acc * 2 + x))"""))
      .select(col("id"), col("v"), col("norm"), posexplode(col("buckets")))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket"))
    val pairs = v.as("q").join(v.as("c"),
        col("q.band") === col("c.band") && col("q.bucket") === col("c.bucket") &&
          col("q.id") < col("c.id"))
      .select(col("q.id").as("id_a"), col("c.id").as("id_b"), cosine.as("cos"))
      .distinct()
    pairs.filter(col("cos") >= minCos)
  }
}
