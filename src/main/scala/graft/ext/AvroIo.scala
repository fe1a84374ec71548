package graft.ext

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Avro Object Container Files without the spark-avro connector —
  * the interchange format a lake meets constantly (Kafka dumps, Sqoop
  * exports, event archives). Only `avro-*.jar` (the core Java
  * library, on every Spark classpath) is required: containers arrive
  * as BINARY columns (the [[Archives]] / WARC stance) and decode in a
  * per-row `mapPartitions` kernel — embarrassingly parallel, no
  * shuffle, schema carried by each container's own header, so
  * heterogeneous containers coexist in one column.
  *
  * Records surface as Avro's canonical JSON rendering (field order =
  * writer-schema order, deterministic), feeding the existing JSON
  * operators (`get_json_object`, the q32/q166 machinery) — dynamic
  * schemas stay dynamic instead of being forced through a fixed
  * struct.
  */
object AvroIo {

  /** Decode a column of Avro container bytes: one row
    * `(container_id, record_index, json)` per record. Corrupt
    * containers fail loudly with the container id in the message —
    * a silent skip would undercount a training corpus.
    */
  def decodeContainer(df: DataFrame, idCol: String,
                      binCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("bin"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val out = new ArrayBuffer[(Long, Int, String)]
          try {
            val reader = new DataFileStream[GenericRecord](
              new ByteArrayInputStream(bytes),
              new GenericDatumReader[GenericRecord]())
            try {
              var i = 0
              while (reader.hasNext) {
                out += ((id, i, reader.next().toString))
                i += 1
              }
            } finally reader.close()
          } catch {
            case e: java.io.IOException =>
              throw new IllegalArgumentException(
                s"avro container $id is corrupt: ${e.getMessage}", e)
          }
          out
        }
      }
      .toDF("container_id", "record_index", "json")
  }

  /** Encode records into one container's bytes — DETERMINISTIC: the
    * 16-byte sync marker (random in stock Avro — the classic
    * nondeterministic-artifact trap) is derived from `syncSeed`, so
    * identical records produce identical bytes across runs and
    * engines. Null codec (uncompressed) for the same reason.
    *
    * This is the fixture/egress half: callers assemble bounded
    * per-container record groups (a container is a file-sized unit by
    * construction); the distributed half is [[decodeContainer]].
    */
  def encodeContainer(schemaJson: String,
                      rows: Iterator[Map[String, Any]],
                      syncSeed: String): Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val out = new ByteArrayOutputStream()
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest(s"graft-avro-sync|$syncSeed".getBytes("UTF-8"))
    writer.create(schema, out, sync)
    try {
      rows.foreach { m =>
        val rec = new GenericData.Record(schema)
        m.foreach { case (k, v) => rec.put(k, v) }
        writer.append(rec)
      }
    } finally writer.close()
    out.toByteArray
  }
}
