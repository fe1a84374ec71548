package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * opaque `binary` payloads + typed metadata, with decode/feature-extract
  * as per-partition batch operators. North-star extension (SURVEY.md §2
  * extensions).
  *
  * Design for 100 TB:
  *  - payloads are BINARY columns in Parquet — scanned columnar, pruned
  *    away entirely by any query that doesn't touch `data` (the whole
  *    point of the reference's columnar argument, slides "Clue #2");
  *  - decode/feature-extract run via typed `mapPartitions` (the Scala
  *    equivalent of `mapInPandas`: one JVM call per BATCH, not per row),
  *    so codec init cost amortizes across a partition;
  *  - rows with multi-MB payloads make `spark.sql.files.maxPartitionBytes`
  *    the partition-size lever; `repartitionAssets` re-ranges by id so a
  *    task never holds more than ~targetRowsPerTask payloads;
  *  - REAL CODECS ARE STUBBED: this container has no image/audio libs, so
  *    `decodeImage` throws NotImplementedError behind a clearly-marked
  *    hook and `fakeDecode` is the deterministic stand-in used by tests
  *    and the verify gate. The Spark-side plumbing — schema, encoders,
  *    batch shape, partitioning — is real.
  */
object Multimodal {

  /** Typed asset row: opaque payload + discriminator. */
  final case class Asset(asset_id: Long, kind: String, data: Array[Byte])

  /** Extracted image-ish features (what a real decoder would emit). */
  final case class ImageFeatures(
      asset_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, channels: Int, mean_luma: Double)

  /** Video frame-sampling output: one row per sampled frame. */
  final case class FrameSample(
      asset_id: Long, frame_index: Int, frame_offset_ms: Long, frame_hash: Long)

  // ------------------------------------------------------------- ingest

  /** Pack a string column into a BINARY asset payload (utf-8). In a real
    * pipeline the binary comes from object storage; this builder exists so
    * every downstream operator is exercisable on the testdata tables.
    */
  def packAssets(df: DataFrame, idCol: String, payloadCol: String,
                 kind: String = "image"): DataFrame = {
    // fail fast on non-numeric ids: under ANSI (the engine default) the
    // cast would abort mid-scan; with ANSI off it would produce null
    // asset_ids that kill the non-nullable Asset encoder later
    val idType = df.schema(idCol).dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packAssets needs a numeric id column; '$idCol' is ${idType.simpleString} " +
        "- derive a dense numeric id first")
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(kind).as("kind"),
      encode(col(payloadCol), "UTF-8").as("data"))
  }

  /** Range-repartition by asset id so each task holds at most
    * ~targetRowsPerTask (potentially multi-MB) payloads regardless of
    * upstream layout. Costs one count() action to size the partitioning —
    * that is the point of the operator; callers who only want layout reuse
    * should repartitionByRange themselves.
    */
  def repartitionAssets(df: DataFrame, targetRowsPerTask: Int = 1024): DataFrame = {
    require(targetRowsPerTask > 0, "targetRowsPerTask must be positive")
    val rows = df.count()
    val minParts = df.sparkSession.sparkContext.defaultParallelism
    val n = math.max(math.ceil(rows.toDouble / targetRowsPerTask).toInt, minParts)
    df.repartitionByRange(n, col("asset_id"))
  }

  // ------------------------------------------------------------- decode

  /** REAL DECODER HOOK — intentionally unimplemented in this environment
    * (no image codecs in the container). Swap in e.g. TwelveMonkeys/
    * ImageIO behind this signature; everything downstream is agnostic.
    */
  def decodeImage(data: Array[Byte]): Nothing =
    throw new NotImplementedError(
      "image codec not available in this environment - use fakeDecode (STUB)")

  /** STUB decoder: deterministic features derived from the payload bytes
    * (length, first/last byte). Stands in for a real codec so the batch
    * plumbing and downstream aggregations are testable and
    * oracle-verifiable.
    */
  def fakeDecode(assetId: Long, kind: String, data: Array[Byte]): ImageFeatures = {
    val n = data.length
    val first = if (n > 0) data(0) & 0xFF else 0
    val last = if (n > 0) data(n - 1) & 0xFF else 0
    val width = 16 + (n % 240)
    val height = 16 + ((first * 7 + last) % 240)
    val meanLuma = ((width.toLong * height) % 251).toDouble / 250.0
    ImageFeatures(assetId, kind, n.toLong, width, height, 3, meanLuma)
  }

  /** Batch feature extraction: one `mapPartitions` pass, codec state (here
    * trivially none; in a real codec, the decoder instance) initialized
    * once per partition and reused across the batch.
    */
  def extractImageFeatures(assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      // per-partition init happens HERE (decoder, buffers) — once per task
      batch.map(a => fakeDecode(a.asset_id, a.kind, a.data))
    }
  }

  /** Column-API convenience over a packed DataFrame. */
  def imageFeatures(packed: DataFrame): DataFrame = {
    val spark = packed.sparkSession
    import spark.implicits._
    extractImageFeatures(packed.as[Asset]).toDF()
  }

  /** Resize output: original + target-box-fitted dimensions. */
  final case class ResizedImage(
      asset_id: Long, width: Int, height: Int,
      out_width: Int, out_height: Int, out_bytes: Long)

  /** Aspect-preserving resize into a target box — the standard
    * vision-pipeline normalization step. The PIXEL work is stubbed (no
    * codecs here); the dimension math, batch shape, and schema are the
    * real contract: scale = min(tw/w, th/h), floor, clamp to >= 1.
    */
  def resizeToBox(assets: Dataset[Asset], targetW: Int = 224,
                  targetH: Int = 224): Dataset[ResizedImage] = {
    require(targetW > 0 && targetH > 0, "target box must be positive")
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val f = fakeDecode(a.asset_id, a.kind, a.data)
        val scale = math.min(targetW.toDouble / f.width, targetH.toDouble / f.height)
        val ow = math.max(1, math.floor(f.width * scale).toInt)
        val oh = math.max(1, math.floor(f.height * scale).toInt)
        ResizedImage(a.asset_id, f.width, f.height, ow, oh, ow.toLong * oh * 3)
      }
    }
  }

  /** Extracted audio-ish features (what a real decoder would emit). */
  final case class AudioFeatures(
      asset_id: Long, n_bytes: Long, n_samples: Long,
      duration_ms: Long, rms: Double)

  /** STUB audio decode: deterministic features from payload bytes —
    * 16-bit mono PCM fiction (2 bytes/sample @ 16 kHz). Same role as
    * `fakeDecode`: real codec swaps in behind the signature, plumbing and
    * oracle stay valid.
    */
  def audioFeatures(assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      batch.map { a =>
        val n = a.data.length
        val first = if (n > 0) a.data(0) & 0xFF else 0
        val last = if (n > 0) a.data(n - 1) & 0xFF else 0
        val samples = n.toLong / 2
        AudioFeatures(a.asset_id, n.toLong, samples,
          samples / 16, ((first * 31 + last) % 1000).toDouble / 1000.0)
      }
    }
  }

  /** Frame sampling for video-kind assets: emit every `everyMs` offset up
    * to a stub duration derived from payload size (real pipeline: container
    * metadata). One row per frame, hash = deterministic frame fingerprint.
    */
  def sampleFrames(assets: Dataset[Asset], everyMs: Long = 1000L): Dataset[FrameSample] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.flatMap { a =>
      val durationMs = (a.data.length % 10) * 1000L + 1000L // STUB duration
      val n = (durationMs / everyMs).toInt
      (0 until n).iterator.map { i =>
        val off = i * everyMs
        FrameSample(a.asset_id, i, off,
          a.data.length.toLong * 1315423911L + off) // stub frame hash
      }
    }
  }
}
