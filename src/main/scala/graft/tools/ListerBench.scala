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
  *
  * 10M-key regime (the reference slides' ">1,000,000 keys per prefix"
  * is a floor, not a ceiling): at n ≥ 1M the payload drops to
  * 1..64 B/file — the driver-metadata cost under test is per FILE
  * (path string + size long through the RemoteIterator walk and the
  * packer's TreeMap), not per payload byte, and 10M × 2 KB fixtures
  * would cost 20 GB of disk for no extra coverage. Point `dir` at
  * /dev/shm for the 10M run so fixture I/O is not the bottleneck.
  * The heap bound scales per-entry (~350 B/file budget): FLAT means
  * bytes/file stays constant as n grows 100× — the listing and the
  * bins are the only live retention, there is no page-array buffering.
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
    val metadataRegime = n >= 1000000 // see scaladoc: 1..64 B payloads
    while (i < n) {
      // name shape the reference lists: {dt}-HH-MM-SS-ID
      val name = f"$day-${i / 3600 % 24}%02d-${i / 60 % 60}%02d-${i % 60}%02d-${i}%08X"
      val payload =
        if (metadataRegime) new Array[Byte](1 + i % 64) // 1 B .. 64 B
        else {
          val reps = 1 + (i % 64) // 64 B .. 4 KB
          val p = new Array[Byte](base.length * reps)
          var r = 0
          while (r < reps) { System.arraycopy(base, 0, p, r * base.length, base.length); r += 1 }
          p
        }
      Files.write(bucketDir.resolve(name), payload)
      i += 1
      if (i % 1000000 == 0)
        println(f"[lister-bench] generated $i files (${(System.nanoTime() - t0) / 1e9}%.0f s)")
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
      val perFileB = (heap1 - heap0) * 1024.0 * 1024.0 / n
      println(f"[lister-bench] heapMB $heap0 -> $heap1 " +
        f"(delta ${heap1 - heap0}, $perFileB%.0f B/file) " +
        f"rssKB $rss0 -> $rss1 (delta ${rss1 - rss0})")
      // pagination bound: live retention is the listing itself (path
      // string + size + bin reference, ~200-250 B/entry) — NOT page
      // arrays or copies. Budget 350 B/entry (300 MB floor absorbs
      // JVM noise at small n); a driver that buffered FileStatus
      // pages or copied the listing would blow straight through.
      val budgetMb = math.max(300L, (n.toLong * 350) / (1024 * 1024))
      require(heap1 - heap0 < budgetMb,
        s"driver heap grew ${heap1 - heap0} MB over $n files " +
          s"(budget $budgetMb MB at 350 B/file)")
    } finally spark.stop()
  }
}
