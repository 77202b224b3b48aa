package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed spherical-kmeans training with the centroid set kept as a
  * DATAFRAME, and frame-based IVF/SemDeDup assignment — the trained-
  * centroid production path above [[Dedup.autoNlist]]'s 2^16 cap.
  *
  * Why this exists (r14 verdict task 4): [[Similarity.ivfKmeansTopK]]'s
  * refinement collects per-cell means to the driver and re-embeds the
  * centroids as PLAN LITERALS — bounded by nlist×dim, fine at the
  * oracle-pinned nlist = 16, but a 33 MB literal serialized into every
  * task at 65536×64, and unusable past the cap. Here the centroids never
  * leave the cluster as a whole: training iterates the same map-only
  * assignment → (cell, dim) mean aggregation, but the means stay a
  * DataFrame that the next sweep (and the final consumer) BROADCAST-JOINS.
  * The only driver-resident centroid data is the ⌈√nlist⌉-row COARSE
  * subset (≤ 256 × dim doubles at the cap — the [[Similarity.hyperplanes]]
  * footprint class), which gates the two-level assignment join.
  *
  * Assignment with a centroid frame is the two-level shape as a JOIN:
  * each row picks its coarse winner map-only (literal kernel over the
  * √nlist coarse rows), then equi-joins the broadcast centroid frame on
  * the winner's group and argmaxes the ~√nlist fine mates —
  * O(n·√nlist) joined rows, the same dot count the
  * [[graft.functions.TwoLevelArgmax]] kernel pays, materialized as rows
  * instead of a loop. APPROXIMATE near coarse boundaries exactly like
  * the kernel (standard IVF behavior); empty coarse groups are skipped
  * identically (the coarse argmax ranges over groups that actually hold
  * fine members).
  *
  * Determinism contract (what makes the whole path SQL-oracle-able, see
  * AtScaleQueries d07c): seeds are the nlist lowest-id vectors
  * L2-normalized by a sequential ascending-dim fold; means go through
  * round-6 + DECIMAL(18,6) sums (exact, order-free); argmax ties break
  * to the lowest cidx via max(struct(dot, −cidx)); every dot is the
  * sequential [[graft.functions.VecDot]] fold.
  *
  * Background: spherical k-means (Dhillon & Modha 2001, "Concept
  * decompositions for large sparse text data using clustering"); the
  * coarse/fine two-level layout is the IVF index of Jégou et al. 2011
  * ("Product quantization for nearest neighbor search"); training at
  * corpus scale with broadcast-joined centroid frames is the standard
  * Spark MLlib-style shape, re-derived here so the assignment is
  * bit-reproducible by a SQL oracle (MLlib's kmeans is neither seeded
  * this way nor replayable).
  */
object KMeans {

  /** Kernel-path forwarder so the frame-vs-kernel equality spec can
    * reference the `private[ops]` two-level kernel from package graft. */
  private[graft] def kernelTwoLevel(v: Column, cents: Seq[Seq[Double]]): Column =
    Similarity.cellArgmaxTwoLevel(v, cents)

  /** Centroid-frame schema: (cidx INT 1-based, cv ARRAY<DOUBLE> unit). */
  private def normalizeArr(raw: Column): Column = {
    val nrm = sqrt(expr("aggregate(_raw, 0D, (a, x) -> a + x * x)"))
    transform(raw, x => x / greatest(nrm, lit(1e-12)))
  }

  /** Seed centroid frame: the `nlist` lowest-id corpus vectors,
    * L2-normalized — [[Similarity.seedCentroids]] without the driver
    * collect. The row_number window ranks only the ≤ nlist post-limit
    * rows (bounded single partition — not a data-sized window). */
  def seedCentroidsDF(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int): DataFrame =
    corpus
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("_raw"))
      .orderBy("id").limit(nlist)
      .withColumn("cidx", row_number().over(Window.orderBy("id")))
      .select(col("cidx"), normalizeArr(col("_raw")).as("cv"))

  /** Collect the ≤ ⌈√nlist⌉ coarse rows (cidx ≤ nCoarse) — the one
    * bounded driver transit of this module. */
  private def coarseRows(cents: DataFrame, nCoarse: Int): Array[Seq[Double]] =
    cents.filter(col("cidx") <= nCoarse).orderBy("cidx")
      .select("cv").collect()
      .map(_.getSeq[Double](0))

  /** (id, v, norm, cell) assignment of `corpus` against a centroid FRAME
    * via the two-level broadcast join. `nlist` is the frame's row count
    * (callers always know it — passing it saves a count job). */
  def assignWithFrame(corpus: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, nlist: Int): DataFrame = {
    val dim = Similarity.vecDim(corpus, vecCol)
    val nCoarse = math.ceil(math.sqrt(nlist.toDouble)).toInt
    val coarse = coarseRows(cents, nCoarse)
    require(coarse.nonEmpty, "assignWithFrame: empty centroid frame")
    // fine→coarse grouping, DISTRIBUTED over the centroid frame (the
    // kernel computes the same nlist·√nlist·dim dots at the driver);
    // 0-based group ids to match the kernels' convention
    val centsG = cents
      .withColumn("grp", Similarity.cellArgmax(col("cv"), coarse) - 1)
    // grouping can leave a coarse EMPTY (duplicate seed vectors) — the
    // coarse argmax must range over NON-empty groups only, mirroring
    // TwoLevelArgmax's skip; the distinct-group collect is ≤ √nlist rows
    val present = centsG.select("grp").distinct().collect()
      .map(_.getInt(0)).sorted
    val presentCoarse = present.map(g => coarse(g)).toSeq
    val cwExpr =
      if (present.length == coarse.length)
        Similarity.cellArgmax(col("v"), coarse.toSeq) - 1
      else {
        // remap the argmax over the present subset back to original ids
        val m = map(present.zipWithIndex.flatMap { case (g, i) =>
          Seq(lit(i), lit(g)) }: _*)
        element_at(m, Similarity.cellArgmax(col("v"), presentCoarse) - 1)
      }
    val rows = Dedup.spreadInput(corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"),
        Similarity.normFlat(col(vecCol), dim).as("norm")),
      GraftPar.of(corpus))
      .withColumn("cw", cwExpr)
    // broadcast the (≤ nlist)-row centroid frame, join on the coarse
    // group, argmax the ~√nlist fine mates; ties to the lowest cidx
    // (max over (dot, −cidx) = rank dot DESC, cidx ASC)
    // v/norm ride inside the max-struct rather than the grouping key:
    // (dt, nc) is already unique within a group (nc = −cidx), so the
    // array field is never actually compared, and the hash agg keys on
    // the narrow id alone
    rows.join(broadcast(centsG), col("cw") === col("grp"))
      .select(col("id"),
        struct(Similarity.dotFlat(col("v"), col("cv"), dim).as("dt"),
          (-col("cidx")).as("nc"), col("v").as("v"), col("norm").as("norm"))
          .as("sc"))
      .groupBy("id")
      .agg(max(col("sc")).as("best"))
      .select(col("id"), col("best.v").as("v"), col("best.norm").as("norm"),
        (-col("best.nc")).as("cell"))
  }

  /** `iters` spherical-kmeans sweeps over [[seedCentroidsDF]] seeds —
    * assignment via [[assignWithFrame]], means as round-6 DECIMAL sums
    * kept distributed, empty cells retaining their previous centroid.
    * Returns the refined centroid frame (cidx, cv), localCheckpointed
    * per sweep so the lineage does not stack across iterations. */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 1): DataFrame = {
    var cents = seedCentroidsDF(corpus, idCol, vecCol, nlist).localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = assignWithFrame(corpus, idCol, vecCol, cents, nlist)
      val means = assigned
        .select(col("cell"), posexplode(col("v")))
        .select(col("cell"), (col("pos") + 1).as("dim"),
          round(col("col").cast("double"), 6).as("xq"))
        .groupBy("cell", "dim")
        .agg((sum(col("xq").cast(DecimalType(18, 6))).cast("double") /
          count(lit(1))).as("mv"))
        .groupBy("cell")
        .agg(expr("transform(array_sort(collect_list(struct(dim, mv))), s -> s.mv)")
          .as("_raw"))
        .select(col("cell").as("cidx"), normalizeArr(col("_raw")).as("cv"))
      cents = cents.as("o")
        .join(means.as("n"), col("o.cidx") === col("n.cidx"), "left")
        .select(col("o.cidx").as("cidx"),
          coalesce(col("n.cv"), col("o.cv")).as("cv"))
        .localCheckpoint()
    }
    cents
  }

  /** PQ codebook TRAINING — k-means per SUBSPACE, the Jégou et al. 2011
    * construction ("Product quantization for nearest neighbor search",
    * §II.C: a separate quantizer per subvector): subspace s's codebook
    * refines [[Similarity.pqCodebooks]]' lowest-id seeds by `iters`
    * sweeps of assign → mean → re-normalize, with the SAME determinism
    * contract as [[trainCentroids]] — assignment is the argmax dot of the
    * RAW subvector against the unit codewords computed by the ONE
    * [[graft.functions.PqEncode]] kernel the encode path itself runs
    * (ties to the lowest code), means are round-6 DECIMAL(18,6) sums
    * (exact, order-free), empty codes keep their previous codeword.
    *
    * Scale shape: each sweep is ONE map-only encode pass (the PqEncode
    * literal rides the plan — a codebook is dim·codes doubles, the
    * [[Similarity.hyperplanes]] footprint class, NOT the nlist×dim
    * centroid matrix that forced [[trainCentroids]]' frame design) plus
    * one (sub, code, dim)-keyed mean aggregation of subs narrow rows per
    * vector; the only driver transit is the ≤ subs·codes mean rows per
    * sweep. Returned as a (sub, code, cw) FRAME (1-based sub and code)
    * for API symmetry with [[trainCentroids]]. */
  def trainPqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      subs: Int, codes: Int, iters: Int = 1): DataFrame = {
    val dim = Similarity.vecDim(corpus, vecCol)
    require(dim % subs == 0, s"dim $dim not divisible into $subs subspaces")
    val w = dim / subs
    var books = Similarity.pqCodebooks(corpus, idCol, vecCol, subs, codes)
    for (_ <- 1 to iters) {
      val enc = org.apache.spark.sql.GraftShims.column(
        graft.functions.PqEncode(
          org.apache.spark.sql.GraftShims.expression(col("v")), books))
      val trained = Dedup.spreadInput(
          corpus.select(col(vecCol).as("v")), GraftPar.of(corpus))
        .select(col("v"), posexplode(enc))
        .select(col("v"), col("pos").as("sub0"), col("col.code").as("code"))
        .select(col("sub0"), col("code"),
          posexplode(slice(col("v"), col("sub0") * w + 1, lit(w))))
        .select(col("sub0"), col("code"), (col("pos") + 1).as("dim"),
          round(col("col").cast("double"), 6).as("xq"))
        .groupBy("sub0", "code", "dim")
        .agg((sum(col("xq").cast(DecimalType(18, 6))).cast("double") /
          count(lit(1))).as("mv"))
        .groupBy("sub0", "code")
        .agg(expr("transform(array_sort(collect_list(struct(dim, mv))), s -> s.mv)")
          .as("_raw"))
        .select(col("sub0"), col("code"), normalizeArr(col("_raw")).as("cw"))
        .collect() // ≤ subs·codes rows — the bounded per-sweep transit
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
      books = books.zipWithIndex.map { case (cb, s) =>
        cb.zipWithIndex.map { case (cw, c) =>
          trained.getOrElse((s, c + 1), cw)
        }
      }
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    books.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (cw, c) => (s + 1, c + 1, cw) }
    }.toDF("sub", "code", "cw")
  }

  /** SemDeDup with a TRAINED centroid frame — [[Dedup.semanticDedupAuto]]
    * above the literal cap: assignment through [[assignWithFrame]], then
    * the standard cell-confined blocked pair join (min lower-id mate at
    * cosine ≥ minCos). Returns (id, cell, dup_of, is_dup). */
  def semanticDedupTrained(embs: DataFrame, idCol: String, vecCol: String,
      cents: DataFrame, nlist: Int, minCos: Double, cellCap: Int = 4096,
      scope: CacheScope = CacheScope.untracked,
      preAssigned: Option[DataFrame] = None): DataFrame = {
    val dim = Similarity.vecDim(embs, vecCol)
    // `preAssigned` lets a caller that already materialized THIS corpus's
    // [[assignWithFrame]] frame (same embs, same cents — the caller's
    // contract) share it instead of paying a second assignment pass; the
    // streaming semantic trigger reuses one assignment for both the
    // in-batch SemDeDup and its ledger append (r18, guide §2.4 "two
    // operations keyed the same way can share one exchange")
    val assigned = preAssigned.getOrElse(scope.persist(
      assignWithFrame(embs, idCol, vecCol, cents, nlist)))
    // the downstream (blocked cell self-join → min-id mate → join-back)
    // is exactly the literal-kernel SemDeDup's — shared
    Dedup.dedupWithinCells(assigned, GraftPar.of(embs), dim, minCos,
      cellCap, Dedup.leafRowBound(embs))
  }

  /** IVF top-k with a TRAINED centroid frame — [[Similarity.ivfTopK]]
    * above the literal cap. The corpus assigns via [[assignWithFrame]];
    * each (small, broadcast) query ranks its top-`nprobe` cells through
    * the same broadcast centroid frame and probes only those cells. */
  def ivfTopKTrained(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, cents: DataFrame, nlist: Int,
      nprobe: Int = 4): DataFrame = {
    val dim = Similarity.vecDim(corpus, vecCol)
    val assigned = assignWithFrame(corpus, idCol, vecCol, cents, nlist)
    val q = queries
      .select(col(idCol).as("qid"), col(vecCol).as("qv"),
        Similarity.normFlat(col(vecCol), dim).as("qnorm"))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("qv"), col("qnorm"), col("cidx").as("cell"),
        Similarity.dotFlat(col("qv"), col("cv"), dim).as("dt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(desc("dt"), asc("cell"))))
      .filter(col("rk") <= nprobe)
      .select(col("qid"), col("qv"), col("qnorm"), col("cell"))
    val scored = broadcast(q).join(assigned, Seq("cell"))
      .filter(col("qid") =!= col("id"))
      .select(col("qid").as("query_id"), col("id").as("neighbor_id"),
        round(Similarity.dotFlat(col("qv"), col("v"), dim) /
          (col("qnorm") * col("norm")), 9).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
