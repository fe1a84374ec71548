package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.logs.LogFileLister
import graft.sources.AccessLogFiles

/** Probe the compacter's DRIVER-side metadata path at real file counts
  * (the reference's >1M-key regime is the core product scenario;
  * CompacterSpec exercises correctness at tens of files): generates N
  * one-day fixture files, then measures
  *
  *  1. `LogFileLister.listDayWithSizes` wall time (files/s) — the
  *     paginated RemoteIterator walk,
  *  2. `AccessLogFiles.binPack` wall time — first-fit-decreasing into
  *     maxPartitionBytes splits,
  *  3. driver JVM heap delta and process RSS (`/proc/self/status`
  *     VmRSS) across both — the "Paginate? Paginate." OOM bound.
  *
  * Usage: runMain graft.tools.ListerBench [nFiles=100000] [dir].
  * Fixture files carry a small real payload (size varies 64..4KB by
  * index) so byte-based packing has real sizes to pack.
  */
object ListerBench {

  private def rssKb(): Long =
    Files.readAllLines(Paths.get("/proc/self/status")).toArray.map(_.toString)
      .find(_.startsWith("VmRSS:"))
      .map(_.replaceAll("[^0-9]", "").toLong).getOrElse(-1L)

  private def heapMb(): Long = {
    val rt = Runtime.getRuntime
    (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val root = args.lift(1).getOrElse(
      Files.createTempDirectory("graft-lister").toString)
    val bucketDir = Paths.get(root, "mybucket")
    Files.createDirectories(bucketDir)
    val day = "2021-03-05"

    val t0 = System.nanoTime()
    var i = 0
    val base = ("x" * 64).getBytes(StandardCharsets.US_ASCII)
    while (i < n) {
      // name shape the reference lists: {dt}-HH-MM-SS-ID
      val name = f"$day-${i / 3600 % 24}%02d-${i / 60 % 60}%02d-${i % 60}%02d-${i}%08X"
      val reps = 1 + (i % 64) // 64 B .. 4 KB
      val payload = new Array[Byte](base.length * reps)
      var r = 0
      while (r < reps) { System.arraycopy(base, 0, payload, r * base.length, base.length); r += 1 }
      Files.write(bucketDir.resolve(name), payload)
      i += 1
    }
    val genSec = (System.nanoTime() - t0) / 1e9
    println(f"[lister-bench] generated $n files in $genSec%.1f s")

    val builder = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .appName("lister-bench")
    // optional 3rd arg: maxPartitionBytes — small values force a
    // many-bins regime to probe the packer's bin-scan cost
    args.lift(2).foreach(b =>
      builder.config("spark.sql.files.maxPartitionBytes", b))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      System.gc(); Thread.sleep(200)
      val heap0 = heapMb(); val rss0 = rssKb()

      val t1 = System.nanoTime()
      val listed = LogFileLister.listDayWithSizes(root, "mybucket", day)
      val listSec = (System.nanoTime() - t1) / 1e9
      require(listed.size == n, s"listed ${listed.size}, expected $n")

      val t2 = System.nanoTime()
      val partitions = AccessLogFiles.binPack(listed)
      val packSec = (System.nanoTime() - t2) / 1e9
      // gc before the after-measurement too: live retention is the
      // pagination claim, not transient young-gen garbage
      System.gc(); Thread.sleep(200)
      val heap1 = heapMb(); val rss1 = rssKb()

      val totalBytes = listed.map(_._2).sum
      val maxBytes = spark.sessionState.conf.filesMaxPartitionBytes
      val lowerBound = math.max(1L, (totalBytes + maxBytes - 1) / maxBytes)
      println(f"[lister-bench] files=$n list=$listSec%.2f s " +
        f"(${n / listSec}%.0f files/s) pack=$packSec%.2f s " +
        f"(${n / packSec}%.0f files/s) partitions=${partitions.length} " +
        f"(optimal>=$lowerBound) totalMB=${totalBytes / 1024 / 1024}")
      println(f"[lister-bench] heapMB $heap0 -> $heap1 " +
        f"(delta ${heap1 - heap0}) rssKB $rss0 -> $rss1 " +
        f"(delta ${rss1 - rss0})")
      // pagination bound: the walk + pack must stay far below one
      // FileStatus-array-at-once blowup — ~100 MB of headroom for 1e5
      // entries (strings + tuples are ~200 B/entry; a driver that
      // buffered page arrays or copied the listing repeatedly would
      // blow through this)
      require(heap1 - heap0 < 300,
        s"driver heap grew ${heap1 - heap0} MB over $n files")
    } finally spark.stop()
  }
}
