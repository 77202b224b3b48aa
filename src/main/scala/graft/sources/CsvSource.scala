package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** RaQL `READ FROM FILE … AS CSV` (`/root/reference/src/raql_operation.type:
  * 54-138`): declared schema, configurable separator/quote/escape/null,
  * optional header skip, glob paths, DELETE-IF-done file handling, and
  * the external `PREPROCESS WITH "cmd"` pipe ([[readPreprocessed]]).
  *
  * Spark-first: thin option mapping onto the built-in CSV source, which
  * already handles globs, schema enforcement, compression, and distributes
  * the read. `cleanSource`/`sourceArchiveDir` replace ramen's DELETE-IF in
  * streaming mode.
  */
object CsvSource {
  final case class CsvSpec(
      separator: String = ",",
      quote: String = "\"",
      escape: String = "\\",
      nullStr: String = "",
      header: Boolean = false,
      deleteAfterRead: Boolean = false)

  private def reader(spark: SparkSession, schema: StructType, spec: CsvSpec) =
    spark.read
      .schema(schema)
      .option("sep", spec.separator)
      .option("quote", spec.quote)
      .option("escape", spec.escape)
      .option("nullValue", spec.nullStr)
      .option("header", spec.header)
      .option("mode", "PERMISSIVE")

  def read(spark: SparkSession, path: String, schema: StructType,
      spec: CsvSpec = CsvSpec()): DataFrame =
    reader(spark, schema, spec).csv(path)

  /** `READ FROM FILE … PREPROCESS WITH "cmd" AS CSV` — the reference
    * pipes each matched file through a shell command and parses the
    * command's STDOUT as the file content (`CodeGenLib_IO.ml:14-47`): a
    * `%s` in the command is replaced by the shell-quoted filename (every
    * occurrence, `String.nreplace`), otherwise the quoted filename is
    * appended.
    *
    * Spark-first shape: the glob expands driver-side (metadata only),
    * the FILE LIST parallelizes one task per file, and each task spawns
    * its command and streams stdout line-by-line — bounded memory, no
    * whole-file buffering — into the same codegen'd `from_csv` decode
    * the Kafka value path uses. At scale N files pipe concurrently
    * across executors; one file = one process, exactly the reference's
    * unit of work. A non-zero exit logs a warning and keeps the lines
    * already produced (the reference's `CSV preprocessor %S exited %s`
    * warning).
    *
    * Deviations, both inherent to an external pipe: rows are
    * line-framed, so quoted embedded newlines (which the built-in CSV
    * reader handles) are not supported through a preprocessor; and
    * `deleteAfterRead` unlinks only after a successful EOF, so a task
    * retry/speculative attempt may re-run the command (the reference
    * has the same at-most-once caveat and unlinks preprocessed files
    * only at EOF, CodeGenLib_IO.ml:60-67). */
  def readPreprocessed(spark: SparkSession, path: String,
      schema: StructType, spec: CsvSpec, preprocessor: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, from_csv}
    import spark.implicits._
    import graft.streaming.StringExpansion.shellQuote
    val files = globFiles(spark, path)
    val header = spec.header
    val delete = spec.deleteAfterRead
    val cmds = files.map { f =>
      val q = shellQuote(f)
      val c = if (preprocessor.contains("%s"))
        preprocessor.replace("%s", q)
      else s"$preprocessor $q"
      (c, f)
    }
    val par = math.max(1, math.min(cmds.size,
      spark.sparkContext.defaultParallelism))
    val lines = spark.createDataset(cmds)
      .repartition(par)
      .mapPartitions { it =>
        it.flatMap { case (cmd, file) =>
          pipeLines(cmd, file, dropFirst = header, unlink = delete)
        }
      }
    lines.toDF("value")
      .select(from_csv(col("value"), schema,
        Map("sep" -> spec.separator, "quote" -> spec.quote,
          "escape" -> spec.escape, "nullValue" -> spec.nullStr,
          "mode" -> "PERMISSIVE")).as("r"))
      .select("r.*")
  }

  /** Run one preprocessor command, streaming its stdout lines lazily —
    * a multi-GB decompression never sits in task memory. EOF triggers
    * the exit-status check and (on success) the unlink. Stderr INHERITS
    * the task's (never piped: an undrained stderr pipe deadlocks a
    * chatty command once the OS buffer fills). A task that stops pulling
    * early (limit, failure) kills the command and its descendants
    * through a TaskContext completion listener — no zombie per file.
    * Blank output lines are skipped, matching the built-in reader. */
  private def pipeLines(cmd: String, file: String, dropFirst: Boolean,
      unlink: Boolean): Iterator[String] = {
    val p = new ProcessBuilder("sh", "-c", cmd)
      .redirectError(ProcessBuilder.Redirect.INHERIT).start()
    p.getOutputStream.close()
    val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(p.getInputStream, "UTF-8"))
    // shared with the early-exit listener below: finish() at EOF and the
    // listener race only through the task's own thread (the listener runs
    // on it), so a plain flag suffices
    var closed = false
    val ctx = org.apache.spark.TaskContext.get()
    if (ctx != null) ctx.addTaskCompletionListener[Unit] { _ =>
      // task stopped pulling early (limit/abort): kill the command, CLOSE
      // the reader (it lingered until GC before r13), and log the exit —
      // everything finish() does EXCEPT the unlink, which partial
      // consumption must never trigger (r12 ADVICE)
      if (!closed) {
        closed = true
        if (p.isAlive) graft.streaming.Notify.Alerter.killTree(p)
        try r.close() catch { case _: Exception => () }
        val exited = p.waitFor(5, java.util.concurrent.TimeUnit.SECONDS)
        val code = if (exited) p.exitValue() else 124
        if (code != 0)
          System.err.println(
            s"[csv] preprocessor '$cmd' stopped early, exited $code")
      }
    }
    val it = new Iterator[String] {
      private var nextLine: String = advance()
      private def advance(): String = {
        var l = r.readLine()
        while (l != null && l.isEmpty) l = r.readLine()
        l
      }
      private def finish(): Unit = if (!closed) {
        closed = true
        r.close()
        // bounded: a command that closes stdout then LINGERS (daemonizing
        // cleanup) must not hang the task at EOF — the task-completion
        // kill listener can't help, it only fires when the task ends
        val exited = p.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
        if (!exited) graft.streaming.Notify.Alerter.killTree(p)
        val code = if (exited) p.exitValue() else 124
        if (code != 0)
          System.err.println(s"[csv] preprocessor '$cmd' exited $code")
        else if (unlink)
          try java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(file))
          catch { case e: Exception =>
            System.err.println(s"[csv] unlink $file failed: $e") }
      }
      def hasNext: Boolean = {
        if (nextLine == null) finish()
        nextLine != null
      }
      def next(): String = {
        val l = nextLine
        nextLine = advance()
        l
      }
    }
    if (dropFirst && it.hasNext) it.next()
    it
  }

  /** Driver-side glob expansion through the Hadoop FS API (sorted for a
    * deterministic row order — RaQL first/last depend on it). A matched
    * DIRECTORY expands to its direct files, matching the built-in CSV
    * reader's directory handling so adding PREPROCESS to a dir-path READ
    * doesn't silently read nothing. */
  private def globFiles(spark: SparkSession, pattern: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(pattern)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.globStatus(p)
    if (st == null) Nil
    else st.toSeq
      .flatMap { s =>
        if (s.isDirectory)
          // parity with the built-in reader's directory handling: Spark's
          // file index drops hidden/metadata entries (_SUCCESS,
          // _committed_*, dotfiles) — piping those through from_csv would
          // fabricate garbage rows
          fs.listStatus(s.getPath).toSeq.filter(c => c.isFile && {
            val n = c.getPath.getName
            !n.startsWith("_") && !n.startsWith(".")
          })
        else Seq(s).filter(_.isFile)
      }
      .map(_.getPath.toUri.getPath).sorted
  }

  /** Streaming [[readPreprocessed]]: continuously TAIL `path` for new
    * files and pipe each through the preprocessor — the reference's
    * preprocessed file read is a continuous tail
    * (`/root/reference/src/CodeGenLib_IO.ml:15-116` watches for new
    * files), while [[readPreprocessed]] is one batch pass (the r12 gap).
    *
    * Spark-first shape: the `binaryFile` file-stream source does the
    * WATCHING — checkpointed seen-file tracking, trigger batching,
    * hidden/metadata-file filtering — but only its `path` column is
    * selected (column pruning keeps the bytes out of Spark); the bytes
    * flow through the preprocessor pipe instead. Each discovered path
    * runs the exact batch pipe contract ([[pipeLines]]): lazily streamed
    * stdout, blank-line skip, bounded EOF wait, process-tree kill on
    * early task exit, at-most-once unlink on DELETE-IF. Unlinked files
    * stay consumed across restarts (the source's checkpoint remembers
    * paths, not bytes). */
  def readStreamPreprocessed(spark: SparkSession, path: String,
      schema: StructType, spec: CsvSpec, preprocessor: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, from_csv}
    import spark.implicits._
    import graft.streaming.StringExpansion.shellQuote
    val header = spec.header
    val delete = spec.deleteAfterRead
    val pre = preprocessor
    // binaryFile's schema is FIXED but the streaming source still insists
    // on an explicit one (readStream has no inference pass)
    val binSchema = {
      import org.apache.spark.sql.types._
      StructType(Seq(
        StructField("path", StringType),
        StructField("modificationTime", TimestampType),
        StructField("length", LongType),
        StructField("content", BinaryType)))
    }
    val paths = spark.readStream.format("binaryFile").schema(binSchema)
      .load(path)
      .select(col("path"))
    val lines = paths.as[String].mapPartitions { it =>
      it.flatMap { uri =>
        // binaryFile yields Hadoop Path.toString values (file:/...) — NOT
        // guaranteed RFC-2396-encoded, so java.net.URI would throw on a
        // landing file with a space (and the checkpointed source would
        // retry that file forever). Hadoop Path round-trips its own
        // rendering; the shell and the unlink want the local fs path.
        val local = new org.apache.hadoop.fs.Path(uri).toUri.getPath
        val q = shellQuote(local)
        val c = if (pre.contains("%s")) pre.replace("%s", q)
          else s"$pre $q"
        pipeLines(c, local, dropFirst = header, unlink = delete)
      }
    }
    lines.toDF("value")
      .select(from_csv(col("value"), schema,
        Map("sep" -> spec.separator, "quote" -> spec.quote,
          "escape" -> spec.escape, "nullValue" -> spec.nullStr,
          "mode" -> "PERMISSIVE")).as("r"))
      .select("r.*")
  }

  /** Streaming variant: tail a directory of CSV files. */
  def readStream(spark: SparkSession, path: String, schema: StructType,
      spec: CsvSpec = CsvSpec()): DataFrame = {
    val r = spark.readStream
      .schema(schema)
      .option("sep", spec.separator)
      .option("quote", spec.quote)
      .option("escape", spec.escape)
      .option("nullValue", spec.nullStr)
      .option("header", spec.header)
    (if (spec.deleteAfterRead) r.option("cleanSource", "delete") else r).csv(path)
  }
}
