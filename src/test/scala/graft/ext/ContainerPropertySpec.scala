package graft.ext

import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase

/** Randomized roundtrip laws of the container/codec layer (QOI, WARC,
  * tar, gzip): encode∘decode must be the identity on the extracted
  * features for ARBITRARY payloads, not just the gate's deterministic
  * series. Fixed seeds keep the suite deterministic; everything runs
  * driver-side (the kernels are plain functions — Spark plumbing is
  * covered by the unit specs and gates).
  */
class ContainerPropertySpec extends SparkTestBase {

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.from(0)
      .map(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
      .collect { case Some(a) => a }.take(n).toSeq

  private val bytesGen: Gen[Array[Byte]] =
    Gen.choose(0, 400).flatMap(n =>
      Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
        .map(_.toArray))

  test("qoi: random pixels round-trip to the exact luma sum") {
    val pixGen = for {
      w <- Gen.choose(1, 17)
      h <- Gen.choose(1, 13)
      ch <- Gen.oneOf(3, 4)
      px <- Gen.listOfN(w * h * ch, Gen.choose(0, 255))
    } yield (w, h, ch, px.map(_.toByte).toArray)
    sample(pixGen, 40, 7L).foreach { case (w, h, ch, px) =>
      val f = Qoi.decode(1L, "image", Qoi.encode(px, w, h, ch))
      assert(f.width == w && f.height == h && f.channels == ch)
      var milli = 0L
      var i = 0
      while (i < px.length) {
        milli += 299L * (px(i) & 0xFF) + 587L * (px(i + 1) & 0xFF) +
          114L * (px(i + 2) & 0xFF)
        i += ch
      }
      val expect = milli.toDouble / (1000.0 * 255.0 * (w.toLong * h))
      assert(f.mean_luma == expect, s"${w}x$h ch=$ch")
    }
  }

  test("warc: arbitrary binary payloads survive framing") {
    sample(bytesGen, 40, 11L).zipWithIndex.foreach { case (payload, i) =>
      val rec = Warc.parseRecord(i.toLong,
        Warc.makeRecord(s"https://x.org/$i", "2026-01-01T00:00:00Z", payload))
      assert(rec.content_length == payload.length.toLong)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      assert(rec.payload_sha256 ==
        md.digest(payload).map(b => f"${b & 0xFF}%02x").mkString, s"case $i")
    }
  }

  test("tar: random member sets list back in order with exact sizes") {
    val memberGen = for {
      n <- Gen.choose(1, 6)
      members <- Gen.listOfN(n, for {
        name <- Gen.identifier.map(_.take(20))
        body <- bytesGen
      } yield (name, body))
    } yield members.distinctBy(_._1)
    sample(memberGen, 30, 13L).foreach { members =>
      val listed = Archives.listTar(1L, Archives.makeTar(members))
      assert(listed.map(m => (m.name, m.size)) ==
        members.map { case (n, b) => (n, b.length.toLong) })
      assert(listed.map(_.member_index) == listed.indices)
    }
  }

  test("gzip: arbitrary bytes inflate back to identical digests") {
    sample(bytesGen, 40, 17L).zipWithIndex.foreach { case (payload, i) =>
      val info = Archives.gunzipInfo(i.toLong, Archives.gzip(payload))
      assert(info.decompressed_bytes == payload.length.toLong)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      assert(info.decompressed_sha256 ==
        md.digest(payload).map(b => f"${b & 0xFF}%02x").mkString, s"case $i")
    }
  }

  test("zstd: arbitrary bytes decompress back to identical digests") {
    sample(bytesGen, 40, 19L).zipWithIndex.foreach { case (payload, i) =>
      val info = Archives.unzstdInfo(i.toLong, Archives.zstd(payload))
      assert(info.decompressed_bytes == payload.length.toLong)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      assert(info.decompressed_sha256 ==
        md.digest(payload).map(b => f"${b & 0xFF}%02x").mkString, s"case $i")
    }
  }
}
