package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.LedgerStream

/** The always-on dedup ledger loop ([[graft.streaming.LedgerStream]]):
  * each micro-batch classifies against the accumulated archive AND appends
  * its novel rows — so a dup of a doc ingested TWO TRIGGERS AGO is flagged,
  * which the static-corpus stream guards cannot do. Plus the replay
  * contract: a re-delivered batchId must neither duplicate the ledger nor
  * classify against its own first attempt. */
class LedgerStreamSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$tag").toString

  test("exact ledger stream: a dup of a doc ingested two triggers ago flags dup_of_archive") {
    implicit val sqlCtx = spark.sqlContext
    val (ledgerDir, outDir, ckpt) = (tmp("led"), tmp("out"), tmp("ck"))
    val mem = MemoryStream[(Long, String)]
    val q = LedgerStream.exactLedgerStream(
        mem.toDS().toDF("doc_id", "text"), ledgerDir, outDir,
        "doc_id", "text")
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, "aaa bbb ccc"), (2L, "ddd eee fff"))
      q.processAllAvailable()
      mem.addData((3L, "ggg hhh iii"))
      q.processAllAvailable()
      // trigger 3: doc 4 repeats trigger-1 content (TWO triggers ago),
      // doc 5 repeats trigger 2's; 6/7 are an in-batch pair; 8 is novel
      mem.addData((4L, "aaa bbb ccc"), (5L, "ggg hhh iii"),
        (6L, "jjj kkk"), (7L, "jjj kkk"), (8L, "lll mmm"))
      q.processAllAvailable()
      val got = spark.read.option("basePath", outDir).parquet(outDir)
        .select("id", "status", "keep_id").as[(Long, String, Long)]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got(1L) == (("novel", 1L)) && got(2L) == (("novel", 2L)))
      assert(got(3L) == (("novel", 3L)))
      assert(got(4L) == (("dup_of_archive", 1L)), got)
      assert(got(5L) == (("dup_of_archive", 3L)), got)
      assert(got(6L) == (("novel", 6L)))
      assert(got(7L) == (("dup_in_batch", 6L)))
      assert(got(8L) == (("novel", 8L)))
      // the ledger holds exactly the novel fingerprints, once each
      val led = spark.read.option("basePath", ledgerDir).parquet(ledgerDir)
      assert(led.count() == 5 &&
        led.select("fp").distinct().count() == 5)
    } finally q.stop()
  }

  test("near-dup ledger stream: archive grows per trigger; exact and fuzzy dups both flag") {
    implicit val sqlCtx = spark.sqlContext
    val (ledgerDir, archDir, outDir, ckpt) =
      (tmp("nled"), tmp("narc"), tmp("nout"), tmp("nck"))
    val base = "the quick brown fox jumps over the lazy dog near the " +
      "river bank every single morning before the sun rises fully"
    val fuzzy = "the quick brown fox jumps over the lazy dog near the " +
      "river bank every single morning before the moon rises fully"
    val other = "completely different content about spark catalyst " +
      "optimizer rules and whole stage code generation pipelines"
    val mem = MemoryStream[(Long, String)]
    val q = LedgerStream.minhashLedgerStream(
        mem.toDS().toDF("doc_id", "text"), ledgerDir, archDir, outDir,
        "doc_id", "text", threshold = 0.5)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((1L, base))
      q.processAllAvailable()
      mem.addData((2L, other))
      q.processAllAvailable()
      // trigger 3: 3 = verbatim copy of doc 1 (two triggers ago),
      // 4 = one-word variant of it, 5 = novel
      mem.addData((3L, base), (4L, fuzzy),
        (5L, "unrelated text with no shared shingles at all in here today"))
      q.processAllAvailable()
      val got = spark.read.option("basePath", outDir).parquet(outDir)
        .select("id", "status", "dup_of", "jaccard")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2),
            if (r.isNullAt(3)) -1.0 else r.getDouble(3)))).toMap
      assert(got(1L)._1 == "novel" && got(2L)._1 == "novel")
      assert(got(3L) == (("dup_of_archive", 1L, 1.0)), got)
      assert(got(4L)._1 == "dup_of_archive" && got(4L)._2 == 1L &&
        got(4L)._3 >= 0.5, got)
      assert(got(5L)._1 == "novel")
      // the archive holds only the novel docs' text; the dup never entered
      val arch = spark.read.option("basePath", archDir).parquet(archDir)
      assert(arch.select("doc_id").as[Long].collect().toSet == Set(1L, 2L, 5L))
    } finally q.stop()
  }

  test("replayed batchId overwrites its own append and never classifies against it") {
    val (ledgerDir, outDir) = (tmp("rled"), tmp("rout"))
    val b0 = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val b1 = Seq((3L, "alpha beta"), (4L, "epsilon zeta")).toDF("doc_id", "text")
    LedgerStream.exactStep(spark, b0, 0L, ledgerDir, outDir, "doc_id", "text")
    val first = LedgerStream
      .exactStep(spark, b1, 1L, ledgerDir, outDir, "doc_id", "text")
      .orderBy("id").collect().toSeq
    // replay batch 1 (failure-recovery contract): identical classification
    // — doc 4 must stay NOVEL (not dup_of_archive against its own first
    // attempt) — and the ledger must not gain duplicate fingerprints
    val replay = LedgerStream
      .exactStep(spark, b1, 1L, ledgerDir, outDir, "doc_id", "text")
      .orderBy("id").collect().toSeq
    assert(first == replay)
    assert(replay.map(r => (r.getLong(0), r.getString(2))) ==
      Seq((3L, "dup_of_archive"), (4L, "novel")))
    val led = spark.read.option("basePath", ledgerDir).parquet(ledgerDir)
    assert(led.count() == 3 && led.select("fp").distinct().count() == 3)
  }

  test("ledger stream survives a RESTART: batch ids continue from the checkpoint, archive intact") {
    // the exactly-once keying depends on the checkpoint carrying batch
    // numbering across restarts (scaladoc caveat (a)) — drive it with a
    // recoverable FILE source: run, stop, land new files, restart on the
    // SAME checkpoint; the new trigger must get a FRESH batchId (not
    // re-0, which would overwrite the first trigger's ledger partition)
    // and classify against the pre-restart archive
    val (src, ledgerDir, outDir, ckpt) =
      (tmp("fsrc"), tmp("fled"), tmp("fout"), tmp("fck"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def stream() = LedgerStream.exactLedgerStream(
        spark.readStream.schema(schema).parquet(src),
        ledgerDir, outDir, "doc_id", "text")
      .option("checkpointLocation", ckpt)
    Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    val q1 = stream().start()
    try { q1.processAllAvailable() } finally q1.stop()
    Seq((3L, "alpha beta"), (4L, "epsilon zeta")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    val q2 = stream().start()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = spark.read.option("basePath", outDir).parquet(outDir)
      .select("id", "status", "keep_id", "ingest_batch")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getInt(3)))).toMap
    assert(got(1L)._1 == "novel" && got(2L)._1 == "novel")
    assert(got(1L)._3 == 0, got) // first trigger = batch 0
    // post-restart trigger continues numbering and sees the old archive
    assert(got(3L) == (("dup_of_archive", 1L, got(3L)._3)) &&
      got(3L)._3 > 0, got)
    assert(got(4L)._1 == "novel" && got(4L)._3 == got(3L)._3)
    val led = spark.read.option("basePath", ledgerDir).parquet(ledgerDir)
    assert(led.count() == 3 && led.select("fp").distinct().count() == 3)
  }

  test("semantic ledger stream: a paraphrase of a vector ingested two triggers ago flags dup_of_archive") {
    implicit val sqlCtx = spark.sqlContext
    val (ledgerDir, outDir, ckpt) = (tmp("sled"), tmp("sout"), tmp("sck"))
    // 4-dim corpus; trained/seed centroid frame fixed for the stream's
    // lifetime (axis-aligned seeds → cells are the four axes)
    val seeds = Seq((1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)), (3L, Seq(0.0, 0.0, 1.0, 0.0)),
      (4L, Seq(0.0, 0.0, 0.0, 1.0))).toDF("id", "v")
    val cents = graft.ops.KMeans.seedCentroidsDF(seeds, "id", "v", 4)
      .localCheckpoint()
    val mem = MemoryStream[(Long, Seq[Double])]
    val q = LedgerStream.semanticLedgerStream(mem.toDS().toDF("id", "v"),
        ledgerDir, outDir, "id", "v", cents, nlist = 4, minCos = 0.9)
      .option("checkpointLocation", ckpt).start()
    try {
      mem.addData((10L, Seq(0.9, 0.1, 0.0, 0.0)))
      q.processAllAvailable()
      mem.addData((11L, Seq(0.0, 0.0, 1.0, 0.1)))
      q.processAllAvailable()
      // trigger 3: 12 paraphrases doc 10 (TWO triggers ago, cos ≈ 0.9998),
      // 13 is novel, 14/15 are an in-batch paraphrase pair
      mem.addData((12L, Seq(0.88, 0.12, 0.0, 0.0)),
        (13L, Seq(0.1, 0.95, 0.0, 0.0)),
        (14L, Seq(0.0, 0.1, 0.05, 0.9)), (15L, Seq(0.0, 0.12, 0.03, 0.9)))
      q.processAllAvailable()
      val got = spark.read.option("basePath", outDir).parquet(outDir)
        .select("id", "status", "dup_of")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))).toMap
      assert(got(10L) == (("novel", -1L)) && got(11L) == (("novel", -1L)))
      assert(got(12L) == (("dup_of_archive", 10L)), got)
      assert(got(13L) == (("novel", -1L)), got)
      assert(got(14L) == (("novel", -1L)), got)
      assert(got(15L) == (("dup_in_batch", 14L)), got)
      // archive cosine recorded for the archive match
      val cos12 = spark.read.option("basePath", outDir).parquet(outDir)
        .filter(col("id") === 12L).select("cos").as[Double].collect()(0)
      assert(cos12 >= 0.99, cos12)
      // the ledger holds exactly the novel vectors with their home cells
      val led = spark.read.option("basePath", ledgerDir).parquet(ledgerDir)
      assert(led.select("id").as[Long].collect().toSet ==
        Set(10L, 11L, 13L, 14L))
    } finally q.stop()
  }

  test("compacted exact ledger probes with ZERO exchange on the ledger side") {
    // the ingest layout optimizes appends; compaction rewrites the
    // accumulated ledger bucketed by fp so the incremental classifier
    // reads it co-located — the "at scale the ledger is bucketed on disk
    // and never moves" claim of incrementalExactDedup's scale notes,
    // pinned. Values must be identical to the directory-read probe.
    val (ledgerDir, outDir) = (tmp("cled"), tmp("cout"))
    val b0 = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val b1 = Seq((3L, "epsilon zeta"), (4L, "eta theta")).toDF("doc_id", "text")
    LedgerStream.exactStep(spark, b0, 0L, ledgerDir, outDir, "doc_id", "text")
    LedgerStream.exactStep(spark, b1, 1L, ledgerDir, outDir, "doc_id", "text")
    val buckets = spark.sparkContext.defaultParallelism // = the probe fan-out
    val compacted = LedgerStream.compactExactLedger(
      spark, ledgerDir, "graft_ledger_b", buckets)
    val b2 = Seq((5L, "alpha beta"), (6L, "eta theta"), (7L, "iota kappa"))
      .toDF("doc_id", "text")
    val thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val viaTable = graft.ops.Dedup.incrementalExactDedup(
        compacted, b2, "doc_id", "text")
      val got = viaTable.orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSeq
      assert(got == Seq((5L, "dup_of_archive", 1L),
        (6L, "dup_of_archive", 4L), (7L, "novel", 7L)))
      // value-identical to the directory-read ledger
      val viaDir = graft.ops.Dedup.incrementalExactDedup(
          spark.read.option("basePath", ledgerDir).parquet(ledgerDir)
            .select("fp", "keep_id"),
          b2, "doc_id", "text")
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSeq
      assert(got == viaDir)
      // plan pin: the ONLY fp exchange is the DELTA side's pinned
      // repartition — the bucketed ledger scan provides its partitioning
      // in place (count exchanges on fp in the final plan)
      viaTable.collect()
      val p = viaTable.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      // one EXECUTED fp exchange (a ReusedExchange line cites the same
      // exchange textually but runs no second shuffle), and the ledger
      // scan must provide its layout in place
      val fpExchanges = p.split("\n")
        .filterNot(_.contains("ReusedExchange"))
        .count(_.contains("Exchange hashpartitioning(fp"))
      assert(fpExchanges == 1,
        s"expected exactly the delta-side fp exchange, got $fpExchanges:\n$p")
      assert(p.contains("Bucketed: true"),
        s"ledger scan lost its bucket layout:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
      spark.sql("DROP TABLE IF EXISTS graft_ledger_b")
    }
  }

  test("compacted minhash ledger: metadata survives the catalog round-trip, classification identical") {
    val (ledgerDir, archDir, outDir) = (tmp("mcl"), tmp("mca"), tmp("mco"))
    val b0 = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "completely different content about catalyst optimizer rules"))
      .toDF("doc_id", "text")
    val b1 = Seq((3L, "unrelated third document with its own words entirely"))
      .toDF("doc_id", "text")
    LedgerStream.minhashStep(spark, b0, 0L, ledgerDir, archDir, outDir,
      "doc_id", "text")
    LedgerStream.minhashStep(spark, b1, 1L, ledgerDir, archDir, outDir,
      "doc_id", "text")
    val compacted = LedgerStream.compactMinhashLedger(
      spark, ledgerDir, "graft_mledger_b", 4)
    try {
      // the bucket-width metadata must survive saveAsTable + spark.table —
      // without it incrementalMinhashDedup refuses the probe
      val meta = compacted.schema(
        compacted.schema.fieldIndex("bucket")).metadata
      assert(meta.contains(graft.ops.Dedup.LedgerBitsKey))
      val archive = spark.read.option("basePath", archDir).parquet(archDir)
        .select("doc_id", "text")
      val b2 = Seq(
        (4L, "the quick brown fox jumps over the lazy dog near the river"),
        (5L, "nothing in common with anything archived so far at all"))
        .toDF("doc_id", "text")
      def classify(ledger: org.apache.spark.sql.DataFrame) =
        graft.ops.Dedup.incrementalMinhashDedup(ledger, archive, b2,
            "doc_id", "text")
          .orderBy("id").collect()
          .map(r => (r.getLong(0), r.getString(1),
            if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
      val viaTable = classify(compacted)
      val viaDir = classify(
        spark.read.option("basePath", ledgerDir).parquet(ledgerDir)
          .drop("ingest_batch"))
      assert(viaTable == viaDir)
      assert(viaTable.map(t => (t._1, t._2)) ==
        Seq((4L, "dup_of_archive"), (5L, "novel")))
      assert(viaTable.head._3 == 1L)
      spark.catalog.clearCache()
    } finally spark.sql("DROP TABLE IF EXISTS graft_mledger_b")
  }

  test("minhash ledger replay: re-delivered batchId overwrites all three tables, never self-matches") {
    // the near-dup step writes THREE batch-partitioned tables (ledger +
    // archive text + out) — more ways to half-fail than the exact step's
    // two. A replayed batch must overwrite all of them (no duplicate
    // signature rows, no duplicate archive text) and must not classify a
    // doc dup_of_archive against its own first attempt's archive rows.
    val (ledgerDir, archDir, outDir) = (tmp("mrl"), tmp("mra"), tmp("mro"))
    val base = "the quick brown fox jumps over the lazy dog near the " +
      "river bank every single morning before the sun rises fully"
    val b0 = Seq((1L, base),
      (2L, "completely different content about catalyst optimizer rules"))
      .toDF("doc_id", "text")
    val b1 = Seq((3L, base),
      (4L, "novel words sharing nothing with anything else at all here"))
      .toDF("doc_id", "text")
    def step(b: org.apache.spark.sql.DataFrame, id: Long) =
      LedgerStream.minhashStep(spark, b, id, ledgerDir, archDir, outDir,
        "doc_id", "text", threshold = 0.5)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    step(b0, 0L)
    val first = step(b1, 1L)
    val ledN = spark.read.option("basePath", ledgerDir).parquet(ledgerDir).count()
    val replay = step(b1, 1L)
    assert(first == replay)
    // doc 3 = archive dup of 1; doc 4 must STAY novel on replay (its own
    // first-attempt archive text row is excluded from the probe)
    assert(replay.map(t => (t._1, t._2, t._3)) ==
      Seq((3L, "dup_of_archive", 1L), (4L, "novel", -1L)), replay)
    // signature ledger unchanged by the replay (overwrite, not append)
    val led = spark.read.option("basePath", ledgerDir).parquet(ledgerDir)
    assert(led.count() == ledN)
    // archive text: each novel doc exactly once
    val arch = spark.read.option("basePath", archDir).parquet(archDir)
    assert(arch.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L))
  }

  test("semantic ledger replay: re-delivered batchId overwrites ledger+out, never self-matches") {
    val (ledgerDir, outDir) = (tmp("srl"), tmp("sro"))
    val seeds = Seq((1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)), (3L, Seq(0.0, 0.0, 1.0, 0.0)),
      (4L, Seq(0.0, 0.0, 0.0, 1.0))).toDF("id", "v")
    val cents = graft.ops.KMeans.seedCentroidsDF(seeds, "id", "v", 4)
      .localCheckpoint()
    val b0 = Seq((10L, Seq(0.9, 0.1, 0.0, 0.0)),
      (11L, Seq(0.0, 0.0, 1.0, 0.1))).toDF("id", "v")
    val b1 = Seq((12L, Seq(0.88, 0.12, 0.0, 0.0)),
      (13L, Seq(0.1, 0.95, 0.0, 0.0))).toDF("id", "v")
    def step(b: org.apache.spark.sql.DataFrame, id: Long) =
      LedgerStream.semanticStep(spark, b, id, ledgerDir, outDir,
        "id", "v", cents, nlist = 4, minCos = 0.9)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getString(1),
          if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    step(b0, 0L)
    val first = step(b1, 1L)
    val replay = step(b1, 1L)
    assert(first == replay)
    // 12 paraphrases archived 10; 13 must STAY novel on replay (its own
    // first-attempt ledger vector is excluded from the probe)
    assert(replay == Seq((12L, "dup_of_archive", 10L), (13L, "novel", -1L)),
      replay)
    // vector ledger: each novel vector exactly once after the replay
    val led = spark.read.option("basePath", ledgerDir).parquet(ledgerDir)
    assert(led.select("id").as[Long].collect().sorted.toSeq ==
      Seq(10L, 11L, 13L))
  }

  test("minhash ledger stream survives a RESTART on the same checkpoint") {
    // exactLedgerStream's restart contract extended to the three-table
    // member: batch ids continue (no re-0 overwrite of trigger 0's
    // partitions), the post-restart trigger classifies against the
    // pre-restart signature ledger AND archive text
    val (src, ledgerDir, archDir, outDir, ckpt) =
      (tmp("mfs"), tmp("mfl"), tmp("mfa"), tmp("mfo"), tmp("mfc"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def stream() = LedgerStream.minhashLedgerStream(
        spark.readStream.schema(schema).parquet(src),
        ledgerDir, archDir, outDir, "doc_id", "text", threshold = 0.5)
      .option("checkpointLocation", ckpt)
    val base = "the quick brown fox jumps over the lazy dog near the " +
      "river bank every single morning before the sun rises fully"
    Seq((1L, base),
      (2L, "completely different content about catalyst optimizer rules"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    val q1 = stream().start()
    try { q1.processAllAvailable() } finally q1.stop()
    Seq((3L, base),
      (4L, "novel words sharing nothing with anything else at all here"))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    val q2 = stream().start()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = spark.read.option("basePath", outDir).parquet(outDir)
      .select("id", "status", "dup_of", "ingest_batch")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          r.getInt(3)))).toMap
    assert(got(1L)._1 == "novel" && got(2L)._1 == "novel")
    assert(got(1L)._3 == 0, got)
    assert(got(3L)._1 == "dup_of_archive" && got(3L)._2 == 1L &&
      got(3L)._3 > 0, got)
    assert(got(4L)._1 == "novel" && got(4L)._3 == got(3L)._3)
    val arch = spark.read.option("basePath", archDir).parquet(archDir)
    assert(arch.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 4L))
  }

  test("semantic ledger stream survives a RESTART on the same checkpoint") {
    val (src, ledgerDir, outDir, ckpt) =
      (tmp("sfs"), tmp("sfl"), tmp("sfo"), tmp("sfc"))
    val seeds = Seq((1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)), (3L, Seq(0.0, 0.0, 1.0, 0.0)),
      (4L, Seq(0.0, 0.0, 0.0, 1.0))).toDF("id", "v")
    val cents = graft.ops.KMeans.seedCentroidsDF(seeds, "id", "v", 4)
      .localCheckpoint()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType))))
    def stream() = LedgerStream.semanticLedgerStream(
        spark.readStream.schema(schema).parquet(src),
        ledgerDir, outDir, "id", "v", cents, nlist = 4, minCos = 0.9)
      .option("checkpointLocation", ckpt)
    Seq((10L, Seq(0.9, 0.1, 0.0, 0.0)), (11L, Seq(0.0, 0.0, 1.0, 0.1)))
      .toDF("id", "v").coalesce(1).write.mode("append").parquet(src)
    val q1 = stream().start()
    try { q1.processAllAvailable() } finally q1.stop()
    Seq((12L, Seq(0.88, 0.12, 0.0, 0.0)), (13L, Seq(0.1, 0.95, 0.0, 0.0)))
      .toDF("id", "v").coalesce(1).write.mode("append").parquet(src)
    val q2 = stream().start()
    try { q2.processAllAvailable() } finally q2.stop()
    val got = spark.read.option("basePath", outDir).parquet(outDir)
      .select("id", "status", "dup_of", "ingest_batch")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2),
          r.getInt(3)))).toMap
    assert(got(10L)._1 == "novel" && got(11L)._1 == "novel")
    assert(got(10L)._3 == 0, got)
    // post-restart trigger continues numbering and probes the
    // pre-restart vector ledger
    assert(got(12L)._1 == "dup_of_archive" && got(12L)._2 == 10L &&
      got(12L)._3 > 0, got)
    assert(got(13L)._1 == "novel" && got(13L)._3 == got(12L)._3)
    val led = spark.read.option("basePath", ledgerDir).parquet(ledgerDir)
    assert(led.select("id").as[Long].collect().sorted.toSeq ==
      Seq(10L, 11L, 13L))
  }

  test("compacted semantic ledger: classification identical, probe plan keeps its blocked SHJ shape") {
    val (ledgerDir, outDir) = (tmp("scl"), tmp("sco"))
    val seeds = Seq((1L, Seq(1.0, 0.0, 0.0, 0.0)),
      (2L, Seq(0.0, 1.0, 0.0, 0.0)), (3L, Seq(0.0, 0.0, 1.0, 0.0)),
      (4L, Seq(0.0, 0.0, 0.0, 1.0))).toDF("id", "v")
    val cents = graft.ops.KMeans.seedCentroidsDF(seeds, "id", "v", 4)
      .localCheckpoint()
    LedgerStream.semanticStep(spark,
      Seq((10L, Seq(0.9, 0.1, 0.0, 0.0)), (11L, Seq(0.0, 0.0, 1.0, 0.1)))
        .toDF("id", "v"),
      0L, ledgerDir, outDir, "id", "v", cents, nlist = 4, minCos = 0.9)
    LedgerStream.semanticStep(spark,
      Seq((12L, Seq(0.0, 0.95, 0.0, 0.1))).toDF("id", "v"),
      1L, ledgerDir, outDir, "id", "v", cents, nlist = 4, minCos = 0.9)
    val compacted = LedgerStream.compactSemanticLedger(
      spark, ledgerDir, "graft_sledger_b", 4)
    try {
      val b2 = Seq((20L, Seq(0.88, 0.12, 0.0, 0.0)),
        (21L, Seq(0.0, 0.1, 0.05, 0.9))).toDF("id", "v")
      def classify(ledger: org.apache.spark.sql.DataFrame) =
        graft.ops.Dedup.incrementalSemanticDedup(ledger, b2, "id", "v",
            cents, nlist = 4, minCos = 0.9)
          .orderBy("id").collect()
          .map(r => (r.getLong(0), r.getString(1),
            if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
      val viaTable = classify(compacted)
      val viaDir = classify(
        spark.read.option("basePath", ledgerDir).parquet(ledgerDir)
          .drop("ingest_batch"))
      assert(viaTable == viaDir)
      assert(viaTable == Seq((20L, "dup_of_archive", 10L),
        (21L, "novel", -1L)), viaTable)
      // probe shape against the compacted catalog table: the blocked
      // cell join stays a pinned ShuffledHashJoin, no cartesian (as with
      // the minhash ledger, full co-location additionally depends on the
      // hot-cell blocking columns — the zero-exchange pin stays with the
      // exact ledger; compaction buys CLUSTERING on the probe key)
      val df = graft.ops.Dedup.incrementalSemanticDedup(compacted, b2,
        "id", "v", cents, nlist = 4, minCos = 0.9)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ShuffledHashJoin"),
        s"compacted semantic probe lost its shuffle_hash pin:\n$p")
      assert(!p.contains("CartesianProduct"))
    } finally spark.sql("DROP TABLE IF EXISTS graft_sledger_b")
  }

  test("minhash ledger bits mismatch fails fast instead of probing misaligned keys") {
    val (ledgerDir, archDir, outDir) = (tmp("bled"), tmp("barc"), tmp("bout"))
    val b0 = Seq((1L, "one two three four five six")).toDF("doc_id", "text")
    LedgerStream.minhashStep(spark, b0, 0L, ledgerDir, archDir, outDir,
      "doc_id", "text", bits = 24)
    val b1 = Seq((2L, "seven eight nine ten eleven")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      LedgerStream.minhashStep(spark, b1, 1L, ledgerDir, archDir, outDir,
        "doc_id", "text", bits = 32)
    }
    assert(e.getMessage.contains("bits=24"))
  }
}
