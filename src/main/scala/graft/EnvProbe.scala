package graft

/** Machine-state fingerprint for bench/probe artifacts.
  *
  * The pure-CPU canary alone provably misses the dominant cross-session
  * noise: r14's driver session read 13.22 s where the committed same-HEAD
  * artifact read 9.88 s at near-equal CPU canary (0.3636 vs 0.3765) — the
  * divergence is page-cache/disk/contention state, which an arithmetic
  * loop cannot see. These fields make "environmental, not a regression"
  * a checkable claim instead of an assertion:
  *
  *  - `io_write_mb_s` — streaming write + fsync of a 512 MiB scratch
  *    file in the tmp filesystem (where shuffle files and spills land);
  *  - `io_read_direct_mb_s` — O_DIRECT read of the same file (page
  *    cache BYPASSED, so it measures the disk, not the cache; -1 when
  *    the platform refuses direct IO);
  *  - `free_disk_gb` — usable space on that filesystem (the d02/d08
  *    ×10000 walls were free-disk walls, and a near-full disk also
  *    throttles writes);
  *  - `load_avg` — 1-minute system load (competing work);
  *  - `cached_gb` — /proc/meminfo `Cached`: the page-cache state that
  *    makes parquet re-reads free in one session and disk-bound in
  *    another (-1 off Linux).
  */
object EnvProbe {

  private val ProbeBytes: Long = 512L * 1024 * 1024
  private val ChunkBytes: Int = 8 * 1024 * 1024

  /** (write MB/s, direct-read MB/s or -1). One scratch file, deleted
    * after; failures degrade to -1 fields, never throw (a bench must
    * not die on a probe). */
  private def ioProbe(): (Double, Double) = {
    import java.nio.ByteBuffer
    import java.nio.file.{Files, Paths, StandardOpenOption}
    val dir = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val path = dir.resolve(s"graft_io_canary_${ProcessHandle.current().pid()}.bin")
    try {
      val chunk = ByteBuffer.allocateDirect(ChunkBytes)
      var x = 0x9E3779B97F4A7C15L // xorshift fill — content is irrelevant,
      while (chunk.remaining() >= 8) { // but don't write a zero page loop
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        chunk.putLong(x)
      }
      val wT0 = System.nanoTime()
      val wch = java.nio.channels.FileChannel.open(path,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE,
        StandardOpenOption.TRUNCATE_EXISTING)
      try {
        var written = 0L
        while (written < ProbeBytes) {
          chunk.rewind()
          written += wch.write(chunk)
        }
        wch.force(true) // bill the flush to the write number, not the read
      } finally wch.close()
      val writeMbS = ProbeBytes / 1048576.0 / ((System.nanoTime() - wT0) / 1e9)
      val readMbS =
        try {
          val bs = math.max(512, Files.getFileStore(dir).getBlockSize.toInt)
          val buf = ByteBuffer.allocateDirect(ChunkBytes + bs).alignedSlice(bs)
          val rT0 = System.nanoTime()
          val rch = java.nio.channels.FileChannel.open(path,
            StandardOpenOption.READ,
            com.sun.nio.file.ExtendedOpenOption.DIRECT)
          try {
            var n = 0
            do { buf.clear(); n = rch.read(buf) } while (n > 0)
          } finally rch.close()
          ProbeBytes / 1048576.0 / ((System.nanoTime() - rT0) / 1e9)
        } catch { case _: Throwable => -1.0 }
      (writeMbS, readMbS)
    } catch { case _: Throwable => (-1.0, -1.0) }
    finally { try Files.deleteIfExists(path) catch { case _: Throwable => () } }
  }

  private def freeDiskGb(): Double =
    try new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
      .getUsableSpace / 1e9
    catch { case _: Throwable => -1.0 }

  private def loadAvg(): Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  private def cachedGb(): Double =
    try {
      val line = scala.io.Source.fromFile("/proc/meminfo").getLines()
        .find(_.startsWith("Cached:"))
      line.map(_.split("\\s+")(1).toDouble * 1024 / 1e9).getOrElse(-1.0)
    } catch { case _: Throwable => -1.0 }

  /** JSON fragment (leading comma, no braces) carrying the fingerprint —
    * appended verbatim into the bench/probe artifact objects. */
  def jsonFields(): String = {
    val (w, r) = ioProbe()
    f""","io_write_mb_s":${Bench.jnum(w)},"io_read_direct_mb_s":${Bench.jnum(r)},"free_disk_gb":${Bench.jnum(freeDiskGb())},"load_avg":${Bench.jnum(loadAvg())},"cached_gb":${Bench.jnum(cachedGb())}"""
  }
}
