package graft.tools

import java.nio.file.{Files, Path, Paths}
import java.util.Locale

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.logs.LogLineParser

/** Compaction WRITE-path profiler (VERDICT r3 item 8): the 1M-line day is
  * write-bound (~19 s wall incl. startup, README "Measured single-node
  * throughput"), so this main isolates the write stage and measures the
  * parquet writer knobs against it: codec, dictionary encoding, row-group
  * (block) size, page size, and the within-partition time sort.
  *
  * Method: read + parse the raw day ONCE into an in-memory cache (parse
  * cost paid before the clock starts), then for each knob set, time
  * `repartition(10).sortWithinPartitions(request_time).write.parquet`
  * end-to-end and record wall seconds + output bytes. Each config writes
  * to a fresh directory and the min of `runs` timings is reported (same
  * steady-state-minimum policy as Bench).
  *
  * Usage: runMain graft.tools.WriterBench <rawRoot> <bucket> [runs]
  * Prints one JSON line per config: {"config":..., "sec":..., "bytes":...}
  */
object WriterBench {

  private def num(v: Double): String =
    String.format(Locale.ROOT, "%.3f", Double.box(v))

  private def dirBytes(p: Path): Long =
    Files.walk(p).iterator().asScala
      .filter(Files.isRegularFile(_)).map(Files.size).sum

  private def rmdir(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.delete)

  final case class Knobs(name: String, codec: String = "snappy",
                         dictionary: Boolean = true,
                         blockBytes: Option[Long] = None,
                         pageBytes: Option[Long] = None,
                         sorted: Boolean = true)

  def main(args: Array[String]): Unit = {
    val rawRoot = args(0)
    val bucket = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-writer-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val files = Files.list(Paths.get(rawRoot, bucket)).iterator().asScala
      .map(_.toString).toSeq.sorted
    require(files.nonEmpty, s"no raw files under $rawRoot/$bucket")
    val parsed = LogLineParser.parse(
        LogLineParser.dropBlankLines(spark.read.text(files: _*)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = parsed.count() // materialize the cache: parse is NOT timed

    val configs = Seq(
      Knobs("baseline_snappy"),
      Knobs("no_dictionary", dictionary = false),
      Knobs("rowgroup_32mb", blockBytes = Some(32L << 20)),
      Knobs("rowgroup_256mb", blockBytes = Some(256L << 20)),
      Knobs("page_256kb", pageBytes = Some(256L << 10)),
      Knobs("zstd", codec = "zstd"),
      Knobs("gzip", codec = "gzip"),
      Knobs("uncompressed", codec = "uncompressed"),
      Knobs("unsorted_snappy", sorted = false))

    val out = Paths.get("/tmp/graft-writer-bench")
    rmdir(out)
    val results = configs.map { k =>
      val frame: DataFrame = {
        val rep = parsed.repartition(10)
        if (k.sorted) rep.sortWithinPartitions("request_time") else rep
      }
      val times = (1 to runs).map { r =>
        val dest = out.resolve(s"${k.name}-$r").toString
        val t0 = System.nanoTime()
        var w = frame.write.mode("overwrite").option("compression", k.codec)
          .option("parquet.enable.dictionary", k.dictionary.toString)
        k.blockBytes.foreach(b => w = w.option("parquet.block.size", b.toString))
        k.pageBytes.foreach(b => w = w.option("parquet.page.size", b.toString))
        w.parquet(dest)
        (System.nanoTime() - t0) / 1e9
      }
      val bytes = dirBytes(out.resolve(s"${k.name}-$runs"))
      println(s"""{"config":"${k.name}","sec":${num(times.min)},"bytes":$bytes,"rows":$rows}""")
      (k.name, times.min, bytes)
    }
    rmdir(out)
    val base = results.find(_._1 == "baseline_snappy").get
    System.err.println(f"[writer-bench] baseline ${num(base._2)}s, " +
      s"${base._3 / (1 << 20)} MiB for $rows rows")
    spark.stop()
  }
}
