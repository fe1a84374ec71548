package graft.logs

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import scala.collection.mutable.ArrayBuffer

/** Paginated object listing by prefix, the reference's manual
  * partition-pruning-at-listing-time step
  * (`scripts/oss_s3_server_side_logging_compacter.py:128-151`): only keys
  * under `{sourceBucket}/{YYYY-MM-DD}-` are ever listed, so the date filter
  * never touches Spark.
  *
  * Uses Hadoop `FileSystem.listStatusIterator` — a RemoteIterator that pages
  * under the hood (on s3a it issues continuation-token ListObjectsV2 calls),
  * keeping driver memory bounded even at >1M keys per prefix (the slides'
  * "Paginate? Paginate." OOM lesson). Works identically over `file:` for
  * local fixtures and `s3a:` in production.
  */
object LogFileLister {

  /** All file URIs directly under `dirUri` whose *name* starts with
    * `namePrefix` (empty prefix = everything). Streaming, driver-bounded.
    */
  def list(dirUri: String, namePrefix: String,
           conf: Configuration = new Configuration()): Seq[String] = {
    val dir = new Path(dirUri)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Seq.empty
    val out = ArrayBuffer.empty[String]
    val it = fs.listStatusIterator(dir)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && (namePrefix.isEmpty || st.getPath.getName.startsWith(namePrefix)))
        out += st.getPath.toString
    }
    out.toSeq
  }

  /** As `list`, also returning each object's size — one listing pass feeds
    * both the read plan and size-based output sizing (the lister already
    * has the FileStatus in hand; a second metadata round-trip per object
    * would be the S3-LIST cost all over again).
    */
  def listWithSizes(dirUri: String, namePrefix: String,
                    conf: Configuration = new Configuration()): Seq[(String, Long)] = {
    val dir = new Path(dirUri)
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) return Seq.empty
    val out = ArrayBuffer.empty[(String, Long)]
    val it = fs.listStatusIterator(dir)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && (namePrefix.isEmpty || st.getPath.getName.startsWith(namePrefix)))
        out += ((st.getPath.toString, st.getLen))
    }
    out.toSeq
  }

  /** The reference's per-day listing: keys under
    * `{accessLogRoot}/{sourceBucket}/` named `{date}-*` (reference `:212-213`
    * builds prefix `'{source_bucket}/{partition_key}-'`).
    */
  def listDay(accessLogRoot: String, sourceBucket: String, date: String,
              conf: Configuration = new Configuration()): Seq[String] =
    list(s"$accessLogRoot/$sourceBucket", s"$date-", conf)

  def listDayWithSizes(accessLogRoot: String, sourceBucket: String, date: String,
                       conf: Configuration = new Configuration()): Seq[(String, Long)] =
    listWithSizes(s"$accessLogRoot/$sourceBucket", s"$date-", conf)
}
