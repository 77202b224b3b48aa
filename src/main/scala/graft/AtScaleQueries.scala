package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity}

/** At-scale DIFFERENTIAL oracles.
  *
  * Every other registered query runs where the auto-sizing returns its
  * pinned floor (autoLshR r = 4 at n ≤ 4096, autoNlist = 16 at n ≤ 2000),
  * so the code paths a 100 TB corpus actually takes — derived-width
  * banding in [[Similarity.lshNeighbors]] and TWO-LEVEL approximate cell
  * assignment in [[Dedup.semanticDedupAuto]] once nlist > twoLevelAbove —
  * had perf probes, recall audits, and unit-equivalence specs but no
  * end-to-end value oracle. The two queries here close that: the corpus
  * is replicated INSIDE the query past the floors, and the DuckDB oracle
  * SQL is GENERATED from the same derived config (r, nlist, coarse count)
  * instead of pinned to the floor.
  *
  * Replication is structure-preserving and ARITHMETIC-FREE so both
  * engines replicate bit-identically: replica j applies a seeded
  * coordinate PERMUTATION to the embedding. cos(π(u), π(v)) = cos(u, v),
  * so intra-replica neighborhood structure is exactly the base corpus's,
  * while cross-replica pairs decorrelate — the same bijective-renaming
  * idea as ScaleProbe's word tagging, chosen over ScaleProbe's orthogonal
  * ROTATIONS because a float matrix product's accumulation order cannot
  * be replayed exactly in SQL, whereas an element shuffle has no float
  * ops at all. Replica ids offset by j·10⁷ (ScaleProbe's scheme), so
  * ORDER-BY-id centroid seeding draws the same unpermuted replica-0
  * vectors in both engines.
  */
object AtScaleQueries {

  /** Testdata embedding width (TESTDATA.md; constant across SFs) —
    * asserted against the data at run time. */
  private val Dim = 64

  /** Base embeddings row count at the verify SF (sf0.01). The generated
    * oracle SQL hard-wires the configs DERIVED from BaseN × Repl*, and the
    * query lambdas [[OraclePin]]-assert the runtime derivation matches —
    * a different verify SF fails with a named pin, not a value diff. */
  private val BaseN = 500L

  private val ReplA = 10 // a02b: 5 000 rows  ⇒ autoLshR  = 10 > rMin 4
  private val ReplD = 17 // d07b: 8 500 rows  ⇒ autoNlist = 68 > twoLevelAbove 64

  /** The derived configs the generated oracle SQL embeds. */
  private[graft] val RepR = Similarity.autoLshR(BaseN * ReplA)
  private[graft] val RepNlist = Dedup.autoNlist(BaseN * ReplD)
  private[graft] val RepNCoarse =
    math.ceil(math.sqrt(RepNlist.toDouble)).toInt
  // the whole point of these queries — fail the build, not the gate, if a
  // sizing-policy change drops them back onto the already-oracled paths
  require(RepR > 4,
    s"a02b must exercise a derived r above the rMin floor, got $RepR")
  require(RepNlist > 64,
    s"d07b must exercise two-level assignment (nlist > 64), got $RepNlist")

  private val RepBands = 8 // lshNeighbors' default banding
  private val RepMinCos = 0.3

  /** Seeded Fisher–Yates permutation of 0 until Dim; j = 0 is identity.
    * java.util.Random's LCG is spec-fixed, so each permutation is a
    * stable constant embedded in both the Spark plan and the SQL text. */
  private def permutation(j: Int): Array[Int] = {
    val p = Array.tabulate(Dim)(identity)
    if (j > 0) {
      val rng = new java.util.Random(9000L + j)
      var i = Dim - 1
      while (i > 0) {
        val k = rng.nextInt(i + 1)
        val t = p(i); p(i) = p(k); p(k) = t
        i -= 1
      }
    }
    p
  }

  /** ×k replicated corpus: replica j = (id + j·10⁷, permuted embedding).
    * Pure projections under a union — no arithmetic on the vector. */
  private def replicate(embs: DataFrame, k: Int): DataFrame =
    (0 until k).map { j =>
      val p = permutation(j)
      embs.select((col("vec_id") + lit(j * 10_000_000L)).as("vec_id"),
        array(p.toIndexedSeq.map(i => col("embedding").getItem(i)): _*)
          .as("embedding"))
    }.reduce(_ unionByName _)

  /** The same replication as DuckDB CTEs (list_select is 1-based). */
  private def repSql(k: Int): String = {
    val rows = (0 until k).map { j =>
      s"($j, [${permutation(j).map(_ + 1).mkString(", ")}])"
    }.mkString(", ")
    s"""perms(j, p) AS (VALUES $rows),
        rep AS (
          SELECT j * 10000000 + vec_id AS vec_id,
            list_select(embedding, p) AS embedding
          FROM embeddings CROSS JOIN perms)"""
  }

  /** Sequential-fold dot product — the order VecDot / the sign kernel /
    * TwoLevelArgmax.compute all use, so doubles accumulate identically. */
  private def dotSql(a: String, b: String): String = OracleSql.dot(a, b)

  private val vSql = s"""v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
          sqrt(list_reduce(list_prepend(0.0, list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (a, x) -> a + x)) AS norm
        FROM rep)"""

  /** Hyperplane literals at the DERIVED width — same seeded driver
    * constants the Spark plan projects onto (SimilarityQueries' a02
    * machinery, r parameterized instead of pinned). */
  private def planesValues(r: Int): String =
    Similarity.hyperplanes(Dim, RepBands, r).zipWithIndex.map {
      case (p, i) =>
        s"($i, [${p.map(java.lang.Double.toString).mkString(", ")}])"
    }.mkString(", ")

  /** a02's full-pipeline LSH oracle over the replicated corpus with the
    * banding width GENERATED from the derived config. */
  private def a02bSql: String = s"""WITH ${repSql(ReplA)},
        $vSql,
        planes AS (SELECT * FROM (VALUES ${planesValues(RepR)}) AS t(pid, p)),
        dots AS (
          SELECT v.vec_id, t.pid, ${dotSql("v.v", "t.p")} AS dt
          FROM v CROSS JOIN planes t),
        b AS (
          SELECT vec_id, pid // $RepR AS band,
            SUM(CASE WHEN dt >= 0 THEN (1 << (${RepR - 1} - (pid % $RepR))) ELSE 0 END) AS bucket
          FROM dots GROUP BY 1, 2),
        pairs AS (
          SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
          FROM b x JOIN b y ON x.band = y.band AND x.bucket = y.bucket
            AND x.vec_id < y.vec_id)
        SELECT id_a, id_b, cos FROM (
          SELECT p.id_a, p.id_b,
            ROUND(${dotSql("a.v", "c.v")} / (a.norm * c.norm), 9) AS cos
          FROM pairs p JOIN v a ON a.vec_id = p.id_a
            JOIN v c ON c.vec_id = p.id_b) z
        WHERE cos >= $RepMinCos ORDER BY id_a, id_b"""

  /** d07's SemDeDup oracle over the replicated corpus, replaying the
    * TWO-LEVEL assignment exactly: coarse = the first ⌈√nlist⌉ seeds,
    * fine→coarse grouping by argmax dot (row_number DESC, index ASC =
    * the kernel's strict-> first-wins), then fine argmax within the
    * winner's member group — [[graft.functions.TwoLevelArgmax]] in SQL. */
  private def d07bSql: String = s"""WITH ${repSql(ReplD)},
        $vSql,
        c AS (
          SELECT row_number() OVER (ORDER BY vec_id) AS cidx,
            list_transform(v, x -> x / greatest(norm, 1e-12)) AS cv
          FROM (SELECT vec_id, v, norm FROM v ORDER BY vec_id LIMIT $RepNlist) s0),
        grp AS (
          SELECT fidx, coidx AS g FROM (
            SELECT f.cidx AS fidx, co.cidx AS coidx,
              row_number() OVER (PARTITION BY f.cidx
                ORDER BY ${dotSql("f.cv", "co.cv")} DESC, co.cidx) AS rk
            FROM c f JOIN c co ON co.cidx <= $RepNCoarse) z1 WHERE rk = 1),
        cw AS (
          -- the coarse winner ranks over NON-EMPTY coarse groups only,
          -- mirroring TwoLevelArgmax's empty-group skip (duplicate seed
          -- vectors can tie-break every fine mate away from a coarse,
          -- leaving it memberless — the kernel then probes the next-best
          -- non-empty coarse; ranking over ALL coarse here would drop
          -- such vectors from the oracle instead — r15 advice)
          SELECT vec_id, cidx AS w FROM (
            SELECT v.vec_id, c.cidx,
              row_number() OVER (PARTITION BY v.vec_id
                ORDER BY ${dotSql("v.v", "c.cv")} DESC, c.cidx) AS rk
            FROM v JOIN c ON c.cidx <= $RepNCoarse
              AND c.cidx IN (SELECT DISTINCT g FROM grp)) z2 WHERE rk = 1),
        cell AS (
          SELECT vec_id, cidx AS cell FROM (
            SELECT v.vec_id, c.cidx,
              row_number() OVER (PARTITION BY v.vec_id
                ORDER BY ${dotSql("v.v", "c.cv")} DESC, c.cidx) AS rk
            FROM v JOIN cw ON cw.vec_id = v.vec_id
              JOIN grp ON grp.g = cw.w
              JOIN c ON c.cidx = grp.fidx) z3 WHERE rk = 1),
        dup AS (
          SELECT cb.vec_id AS id, MIN(ca.vec_id) AS dup_of
          FROM cell ca JOIN cell cb
            ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
          JOIN v a ON a.vec_id = ca.vec_id
          JOIN v b ON b.vec_id = cb.vec_id
          WHERE ROUND(${dotSql("a.v", "b.v")} / (a.norm * b.norm), 9) >= 0.4
          GROUP BY cb.vec_id)
        SELECT ce.vec_id, ce.cell, dup.dup_of,
          dup.dup_of IS NOT NULL AS is_dup
        FROM cell ce LEFT JOIN dup ON dup.id = ce.vec_id
        ORDER BY ce.vec_id"""

  // ---- d07c building blocks: the two-level assignment replay of d07b,
  // parameterized over WHICH centroid CTE it assigns against, so the
  // same SQL fragments replay both the training sweep (against the c0
  // seeds) and the final dedup assignment (against the c1 TRAINED
  // centroids).

  /** Fine→coarse grouping of centroid CTE `c`: each fine centroid under
    * its argmax-dot coarse mate (coarse = the first ⌈√nlist⌉ rows). */
  private def grpSql(c: String, grp: String): String = s"""$grp AS (
          SELECT fidx, coidx AS g FROM (
            SELECT f.cidx AS fidx, co.cidx AS coidx,
              row_number() OVER (PARTITION BY f.cidx
                ORDER BY ${dotSql("f.cv", "co.cv")} DESC, co.cidx) AS rk
            FROM $c f JOIN $c co ON co.cidx <= $RepNCoarse) zg WHERE rk = 1)"""

  /** Corpus coarse winner over NON-EMPTY groups of `grp` (the kernel's
    * empty-group skip), then fine argmax within the winner's members —
    * emits `cell` rows (vec_id, cell). */
  private def assignSql(c: String, grp: String, cw: String, cell: String): String =
    s"""$cw AS (
          SELECT vec_id, cidx AS w FROM (
            SELECT v.vec_id, c.cidx,
              row_number() OVER (PARTITION BY v.vec_id
                ORDER BY ${dotSql("v.v", "c.cv")} DESC, c.cidx) AS rk
            FROM v JOIN $c c ON c.cidx <= $RepNCoarse
              AND c.cidx IN (SELECT DISTINCT g FROM $grp)) zw WHERE rk = 1),
        $cell AS (
          SELECT vec_id, cidx AS cell FROM (
            SELECT v.vec_id, c.cidx,
              row_number() OVER (PARTITION BY v.vec_id
                ORDER BY ${dotSql("v.v", "c.cv")} DESC, c.cidx) AS rk
            FROM v JOIN $cw ON $cw.vec_id = v.vec_id
              JOIN $grp ON $grp.g = $cw.w
              JOIN $c c ON c.cidx = $grp.fidx) zc WHERE rk = 1)"""

  /** d07c: ONE distributed-kmeans sweep (KMeans.trainCentroids — means as
    * round-6 DECIMAL sums, sequential-fold normalization, empty cells
    * keeping their seed) replayed end to end, then semanticDedupTrained's
    * assignment + min-id dedup against the TRAINED centroids. */
  private def d07cSql: String = s"""WITH ${repSql(ReplD)},
        $vSql,
        c0 AS (
          SELECT row_number() OVER (ORDER BY vec_id) AS cidx,
            list_transform(v, x -> x / greatest(norm, 1e-12)) AS cv
          FROM (SELECT vec_id, v, norm FROM v ORDER BY vec_id LIMIT $RepNlist) s0),
        ${grpSql("c0", "grp0")},
        ${assignSql("c0", "grp0", "cw0", "cell0")},
        m AS (
          SELECT ce.cell AS cidx, dims.dim,
            CAST(SUM(CAST(ROUND(v.v[dims.dim], 6) AS DECIMAL(18,6))) AS DOUBLE)
              / COUNT(*) AS mv
          FROM v JOIN cell0 ce ON ce.vec_id = v.vec_id
          CROSS JOIN (SELECT unnest(generate_series(1, $Dim)) AS dim) dims
          GROUP BY ce.cell, dims.dim),
        m1 AS (SELECT cidx, list(mv ORDER BY dim) AS ml FROM m GROUP BY cidx),
        c1 AS (
          SELECT c0.cidx,
            COALESCE(list_transform(m1.ml, x -> x / greatest(
              sqrt(list_reduce(list_prepend(0.0,
                list_transform(m1.ml, y -> y * y)), (a, x2) -> a + x2)),
              1e-12)), c0.cv) AS cv
          FROM c0 LEFT JOIN m1 USING (cidx)),
        ${grpSql("c1", "grp1")},
        ${assignSql("c1", "grp1", "cw1", "cell1")},
        dup AS (
          SELECT cb.vec_id AS id, MIN(ca.vec_id) AS dup_of
          FROM cell1 ca JOIN cell1 cb
            ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
          JOIN v a ON a.vec_id = ca.vec_id
          JOIN v b ON b.vec_id = cb.vec_id
          WHERE ROUND(${dotSql("a.v", "b.v")} / (a.norm * b.norm), 9) >= 0.4
          GROUP BY cb.vec_id)
        SELECT ce.vec_id, ce.cell, dup.dup_of,
          dup.dup_of IS NOT NULL AS is_dup
        FROM cell1 ce LEFT JOIN dup ON dup.id = ce.vec_id
        ORDER BY ce.vec_id"""

  /** d15b: the SIZED streaming semantic ledger ([[graft.streaming
    * .LedgerStream.semanticStep]] with nlist DERIVED from corpus size —
    * the production configuration) replayed as three batch triggers over
    * the ×[[ReplD]] corpus. The d15 oracle pins nlist = 16 so its SQL
    * stays writable, which makes the in-batch SemDeDup's per-cell pair
    * work quadratic in the probe; here the derivation lands at
    * [[RepNlist]] = 68 > the two-level threshold, and the oracle SQL is
    * GENERATED from that derived config — so the sized `semanticStep`
    * path (two-level frame assignment of the archive, exact top-nprobe
    * probe, archive-wins recursion across triggers) is value-oracled
    * DIRECTLY, not transitively through d07b/d07c. The oracle unrolls
    * the novelty recursion (novel₀ → archive₁ → novel₁ → archive₂) with
    * the shared OracleSql two-level fragments at the derived width. */
  private def d15bSql: String = {
    def dot(a: String, b: String) = dotSql(a, b)
    s"""WITH ${repSql(ReplD)},
        $vSql,
        c AS (
          SELECT row_number() OVER (ORDER BY vec_id) AS cidx,
            list_transform(v, x -> x / greatest(norm, 1e-12)) AS cv
          FROM (SELECT vec_id, v, norm FROM v ORDER BY vec_id LIMIT $RepNlist) s0),
        ${OracleSql.twoLevelGrp("c", "grp", RepNCoarse)},
        ${OracleSql.twoLevelAssign("c", "grp", "cww", "cellh", RepNCoarse)},
        pr AS (
          SELECT vec_id, cidx AS cell FROM (
            SELECT v.vec_id, c.cidx, row_number() OVER (
              PARTITION BY v.vec_id
              ORDER BY ${dot("v.v", "c.cv")} DESC, c.cidx) AS rk
            FROM v CROSS JOIN c) zp WHERE rk <= 2),
        bb AS (SELECT vec_id, vec_id % 3 AS b FROM v),
        ib AS (
          SELECT q.vec_id AS id, MIN(a.vec_id) AS ib_dup
          FROM v q JOIN bb qb ON qb.vec_id = q.vec_id
            JOIN cellh qc ON qc.vec_id = q.vec_id
            JOIN cellh ac ON ac.cell = qc.cell
            JOIN v a ON a.vec_id = ac.vec_id AND a.vec_id < q.vec_id
            JOIN bb ab ON ab.vec_id = a.vec_id AND ab.b = qb.b
          WHERE ROUND(${dot("q.v", "a.v")} / (q.norm * a.norm), 9) >= 0.4
          GROUP BY q.vec_id),
        am0 AS (
          SELECT q.vec_id AS id, qb.b AS qb, l.vec_id AS lid,
            ROUND(${dot("q.v", "l.v")} / (q.norm * l.norm), 9) AS cos
          FROM v q JOIN bb qb ON qb.vec_id = q.vec_id
            JOIN pr ON pr.vec_id = q.vec_id
            JOIN cellh lc ON lc.cell = pr.cell
            JOIN v l ON l.vec_id = lc.vec_id
            JOIN bb lb ON lb.vec_id = l.vec_id AND lb.b < qb.b),
        am AS (SELECT id, qb, lid, cos FROM am0 WHERE cos >= 0.4),
        n0 AS (SELECT bb.vec_id FROM bb LEFT JOIN ib ON ib.id = bb.vec_id
          WHERE bb.b = 0 AND ib.id IS NULL),
        a1 AS (SELECT id, MIN(lid) AS arch, arg_min(cos, lid) AS acos
          FROM am WHERE qb = 1 AND lid IN (SELECT vec_id FROM n0)
          GROUP BY id),
        n1 AS (SELECT bb.vec_id FROM bb
          LEFT JOIN ib ON ib.id = bb.vec_id
          LEFT JOIN a1 ON a1.id = bb.vec_id
          WHERE bb.b = 1 AND ib.id IS NULL AND a1.id IS NULL),
        a2 AS (SELECT id, MIN(lid) AS arch, arg_min(cos, lid) AS acos
          FROM am WHERE qb = 2 AND (lid IN (SELECT vec_id FROM n0)
            OR lid IN (SELECT vec_id FROM n1))
          GROUP BY id),
        arch AS (SELECT * FROM a1 UNION ALL SELECT * FROM a2)
      SELECT bb.vec_id, bb.b AS ingest_batch,
        CASE WHEN arch.id IS NOT NULL THEN 'dup_of_archive'
             WHEN ib.id IS NOT NULL THEN 'dup_in_batch'
             ELSE 'novel' END AS status,
        COALESCE(arch.arch, ib.ib_dup) AS dup_of,
        arch.acos AS cos
      FROM bb LEFT JOIN arch ON arch.id = bb.vec_id
      LEFT JOIN ib ON ib.id = bb.vec_id
      ORDER BY bb.vec_id"""
  }

  val entries: Seq[QueryDef] = Seq(
    // ---- a02b: the PRODUCTION lshNeighbors plan where autoLshR derives
    // r = 10 (NOT the rMin floor the static a02 oracle pins) — the first
    // end-to-end value oracle of the at-scale banding path.
    QueryDef(
      "a02b_ann_lsh_scaled",
      (s, d) => {
        val embs = Tables.embeddings(s, d).select("vec_id", "embedding")
        require(Similarity.vecDim(embs, "embedding") == Dim,
          s"a02b oracle SQL is generated for dim=$Dim embeddings")
        val rep = replicate(embs, ReplA)
        OraclePin.assertPinned("a02b_ann_lsh_scaled", "r",
          Similarity.autoLshR(Similarity.sizingCount(rep)), RepR)
        Similarity.lshNeighbors(rep, "vec_id", "embedding",
          minCos = RepMinCos)
          .orderBy("id_a", "id_b")
      },
      Some(a02bSql)),

    // ---- d07b: the PRODUCTION semanticDedupAuto plan where autoNlist
    // derives 68 cells and assignment goes through the two-level
    // TwoLevelArgmax kernel — the first end-to-end value oracle of the
    // approximate at-scale assignment path (the approximation is vs the
    // single-level argmax; vs the kernel's OWN semantics the SQL replay
    // is exact, which is what a differential oracle must pin).
    QueryDef(
      "d07b_semantic_dedup_scaled",
      (s, d) => {
        val embs = Tables.embeddings(s, d).select("vec_id", "embedding")
        require(Similarity.vecDim(embs, "embedding") == Dim,
          s"d07b oracle SQL is generated for dim=$Dim embeddings")
        val rep = replicate(embs, ReplD)
        OraclePin.assertPinned("d07b_semantic_dedup_scaled", "nlist",
          Dedup.autoNlist(Similarity.sizingCount(rep)), RepNlist)
        Dedup.semanticDedupAuto(rep, "vec_id", "embedding", minCos = 0.4)
          .select(col("id").as("vec_id"), col("cell"), col("dup_of"),
            col("is_dup"))
          .orderBy("vec_id")
      },
      Some(d07bSql)),

    // ---- d07c: the TRAINED-centroid path (r14 verdict task 4) — one
    // distributed kmeans sweep with the centroid set kept as a DataFrame
    // (graft.ops.KMeans: broadcast-joined two-level assignment, means as
    // round-6 DECIMAL sums, NO driver literal), then SemDeDup against the
    // trained frame, at the replication where nlist = 68 > the two-level
    // threshold — so the exact code a past-the-2^16-cap corpus runs is
    // value-oracled end to end: seeding, grouping, empty-group skip,
    // training means, re-grouping against TRAINED coarse, re-assignment,
    // min-id dedup.
    QueryDef(
      "d07c_semantic_dedup_trained",
      (s, d) => {
        val embs = Tables.embeddings(s, d).select("vec_id", "embedding")
        require(Similarity.vecDim(embs, "embedding") == Dim,
          s"d07c oracle SQL is generated for dim=$Dim embeddings")
        val rep = replicate(embs, ReplD)
        val nlist = Dedup.autoNlist(Similarity.sizingCount(rep))
        OraclePin.assertPinned("d07c_semantic_dedup_trained", "nlist",
          nlist, RepNlist)
        val cents = graft.ops.KMeans.trainCentroids(rep, "vec_id",
          "embedding", nlist, iters = 1)
        graft.ops.KMeans.semanticDedupTrained(rep, "vec_id", "embedding",
          cents, nlist, minCos = 0.4)
          .select(col("id").as("vec_id"), col("cell"), col("dup_of"),
            col("is_dup"))
          .orderBy("vec_id")
      },
      Some(d07cSql)),

    // ---- d15b: the streaming semantic ledger at its PRODUCTION sizing
    // (r16 verdict task 1) — LedgerStream.semanticStep replayed as three
    // triggers (vec_id % 3) over the replicated corpus, with nlist
    // DERIVED from the corpus size (autoNlist → 68, two-level frame
    // assignment) and the oracle SQL generated from the derived config.
    // Closes the gap the d15 row leaves: its nlist=16 pin certifies the
    // recursion but runs the in-batch pair work quadratically; this row
    // certifies the SIZED path d14-class-linear probes measure.
    QueryDef(
      "d15b_semantic_ledger_scaled",
      (s, d) => {
        val embs = Tables.embeddings(s, d).select("vec_id", "embedding")
        require(Similarity.vecDim(embs, "embedding") == Dim,
          s"d15b oracle SQL is generated for dim=$Dim embeddings")
        val rep = replicate(embs, ReplD)
        val nlist = graft.ops.Dedup.autoNlist(Similarity.sizingCount(rep))
        OraclePin.assertPinned("d15b_semantic_ledger_scaled", "nlist",
          nlist, RepNlist)
        val cents = graft.ops.KMeans.seedCentroidsDF(
          rep, "vec_id", "embedding", nlist).localCheckpoint()
        val base = java.nio.file.Files
          .createTempDirectory("graft_d15b").toString
        try {
          for (b <- 0L to 2L)
            graft.streaming.LedgerStream.semanticStep(s,
              rep.filter(col("vec_id") % 3 === b), b,
              s"$base/ledger", s"$base/out", "vec_id", "embedding",
              cents, nlist = nlist, minCos = 0.4, nprobe = 2)
          s.read.option("basePath", s"$base/out").parquet(s"$base/out")
            .select(col("id").as("vec_id"),
              col("ingest_batch").cast("long").as("ingest_batch"),
              col("status"), col("dup_of"), col("cos"))
            .orderBy("vec_id").localCheckpoint()
        } finally DedupQueries.rmTree(base)
      },
      Some(d15bSql)))
}
