package graft.ext

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("interleaveBits: known Morton codes") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (3L, 5L))
      .toDF("x", "y")
    val got = df.select(Layout.interleaveBits(Seq(col("x"), col("y")), 4))
      .collect().map(_.getLong(0)).toSeq
    // morton(x,y) with x at even bits, y at odd: (3,5)=0b011,0b101 →
    // x bits 0,1 at pos 0,2; y bits 0,2 at pos 1,5 → 1+4+2+32 = 39
    assert(got == Seq(0L, 1L, 2L, 3L, 39L))
  }

  test("interleaveBits: rejects overflow layouts") {
    intercept[IllegalArgumentException] {
      Layout.interleaveBits(Seq(col("x"), col("y")), 32)
    }
  }

  test("zvalueByNtile equals zvalueByRange bucketing on uniform data") {
    // both strategies must produce VALID z-orderings; on unique uniform
    // data with exact quantiles they agree up to boundary rounding, so
    // compare coarse cells rather than exact values
    val df = (0 until 1024).map(i => (i.toLong, ((i * 7) % 1024).toLong))
      .toDF("a", "b")
    val viaN = Layout.zvalueByNtile(df, Seq("a", "b"), bits = 4,
      tieBreakers = Seq("a", "b"))
    assert(viaN.select("zval").distinct().count() > 100)
    val viaR = Layout.zvalueByRange(df, Seq("a", "b"), bits = 4)
    assert(viaR.select("zval").distinct().count() > 100)
    // max zval fits 2 dims x 4 bits
    assert(viaN.agg(max("zval")).head().getLong(0) < 256)
    assert(viaR.agg(max("zval")).head().getLong(0) < 256)
  }

  test("zvalueByRange degrades gracefully on empty frames and all-NULL columns") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      Seq((0 until 1).map(_ => ()), Seq.empty).headOption
        .map(_ => new org.apache.spark.sql.types.StructType()
          .add("a", "long").add("b", "long")).get)
    assert(Layout.zvalueByRange(empty, Seq("a", "b"), bits = 4).count() == 0)
    val allNull = Seq((1L, Option.empty[java.lang.Long]),
      (2L, Option.empty[java.lang.Long])).toDF("a", "b")
    val z = Layout.zvalueByRange(allNull, Seq("a", "b"), bits = 4)
    assert(z.count() == 2) // null dim → bucket 0, no NPE
  }

  test("zorderWrite clusters BOTH dimensions; single-dim sort does not") {
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, ((i * 2654435761L) % n), f"pad$i%06d" * 4)
    }.toDF("x", "y", "pad").repartition(8)

    val zDir = Files.createTempDirectory("layout-z").toString
    Layout.zorderWrite(df, Seq("x", "y"), numFiles = 16, dest = zDir)

    val linDir = Files.createTempDirectory("layout-lin").toString
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)

    def meanSpanFraction(dir: String, c: String): Double = {
      val spans = spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(((max(col(c)) - min(col(c))).cast("double") / n).as("span"))
        .collect().map(_.getAs[Double]("span"))
      spans.sum / spans.length
    }
    val zX = meanSpanFraction(zDir, "x"); val zY = meanSpanFraction(zDir, "y")
    val lX = meanSpanFraction(linDir, "x"); val lY = meanSpanFraction(linDir, "y")
    // linear sort: x is tightly clustered but y spans ~everything
    assert(lX < 0.10, s"baseline x span $lX")
    assert(lY > 0.80, s"baseline y span $lY")
    // z-order: BOTH dims narrow simultaneously (16 files → each covers
    // ~1/4 of each dim's range on a 2-D Morton curve; allow slack for
    // curve jumps and quantile rounding)
    assert(zX < 0.55, s"z-order x span $zX")
    assert(zY < 0.55, s"z-order y span $zY")
    // and the multi-dim product (proxy for 2-D pruning power) is far
    // better than the baseline's
    assert(zX * zY < 0.25 * (lX * lY + 1e-9) || zX * zY < 0.1,
      s"z product ${zX * zY} vs baseline ${lX * lY}")
  }

  /** Plain-Scala reference of [[Layout.shuffleShards]]: shard from the
    * first 4 md5 hex chars mod n, pos by (md5, id) rank within shard.
    */
  private def refShards(ids: Seq[Long], n: Int): Map[Long, (Int, Long)] = {
    def hex(id: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(id.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    val withHex = ids.map(id => (id, hex(id)))
    val byShard = withHex.groupBy { case (_, h) =>
      Integer.parseInt(h.take(4), 16) % n }
    byShard.flatMap { case (s, rs) =>
      rs.sortBy { case (id, h) => (h, id) }.zipWithIndex.map {
        case ((id, _), i) => id -> (s, i.toLong)
      }
    }
  }

  test("shuffleShards: matches the reference rank exactly, all shards dense") {
    val ids = (0L until 500L) ++ Seq(100000L, 999999L)
    val df = ids.toDF("id")
    val got = Layout.shuffleShards(df, "id", nShards = 8)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == refShards(ids, 8))
    // every shard's positions are a dense 0..k-1 range
    got.values.groupBy(_._1).foreach { case (s, rs) =>
      val ps = rs.map(_._2).toSeq.sorted
      assert(ps == (0L until ps.length), s"shard $s positions not dense")
    }
    // deterministic under repartitioning
    val again = Layout.shuffleShards(df.repartition(11), "id", 8)
      .select("id", "shard", "pos").as[(Long, Int, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(again == got)
  }

  test("shuffleShards: sizes balance; null ids excluded; bad nShards rejected") {
    val df = (0L until 4000L).toDF("id")
    val sizes = Layout.shuffleShards(df, "id", 16)
      .groupBy("shard").count().collect().map(r => r.getLong(1))
    assert(sizes.length == 16)
    assert(sizes.min > 150 && sizes.max < 350, // 250 expected, hash spread
      s"shard sizes badly skewed: ${sizes.sorted.toSeq}")
    val withNull = Seq(Some(1L), None, Some(3L)).toDF("id")
    assert(Layout.shuffleShards(withNull, "id", 4).count() == 2)
    intercept[IllegalArgumentException](Layout.shuffleShards(df, "id", 0))
    intercept[IllegalArgumentException](Layout.shuffleShards(df, "id", 70000))
  }

  test("writeWithBloomFilters: footer filters exist and answer membership") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val dest = java.nio.file.Files.createTempDirectory("graft-bloomspec")
      .toString + "/t"
    val df = (0L until 5000L).map(i => (i, s"name_$i")).toDF("id", "name")
    Layout.writeWithBloomFilters(df, dest, Seq("id"),
      ndvPerGroup = 5000L, numFiles = 2)
    // roundtrip values first
    assert(spark.read.parquet(dest).count() == 5000L)
    val files = new java.io.File(dest).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 2)
    val conf = new org.apache.hadoop.conf.Configuration()
    var present = 0L
    var absentHits = 0
    var absentProbes = 0
    files.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        reader.getRowGroups.forEach { rg =>
          val chunk = rg.getColumns.stream()
            .filter(c => c.getPath.toDotString == "id").findFirst().get()
          val bloom = reader.getBloomFilterDataReader(rg).readBloomFilter(chunk)
          assert(bloom != null, s"no bloom filter for id in ${f.getName}")
          // every written id must be (possibly) present — no false negatives
          (0L until 5000L by 97L).foreach { v =>
            if (bloom.findHash(bloom.hash(v))) present += 1
          }
          assert(present > 0)
          // far-away values: SOME must be definitively absent (a filter
          // that says yes to everything prunes nothing)
          (1000000L until 1000200L).foreach { v =>
            absentProbes += 1
            if (bloom.findHash(bloom.hash(v))) absentHits += 1
          }
          // the name column was not requested: no bloom filter
          val nameChunk = rg.getColumns.stream()
            .filter(c => c.getPath.toDotString == "name").findFirst().get()
          assert(reader.getBloomFilterDataReader(rg)
            .readBloomFilter(nameChunk) == null)
        }
      } finally reader.close()
    }
    assert(absentHits < absentProbes / 2,
      s"bloom filter useless: $absentHits/$absentProbes false positives")
    // written ids never report absent (no false negatives): re-check all
    files.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
      try {
        val idsInFile = spark.read.parquet(f.getAbsolutePath)
          .select("id").as[Long].collect()
        reader.getRowGroups.forEach { rg =>
          val chunk = rg.getColumns.stream()
            .filter(c => c.getPath.toDotString == "id").findFirst().get()
          val bloom = reader.getBloomFilterDataReader(rg).readBloomFilter(chunk)
          idsInFile.foreach { v =>
            assert(bloom.findHash(bloom.hash(v)), s"false negative for $v")
          }
        }
      } finally reader.close()
    }
    intercept[IllegalArgumentException](
      Layout.writeWithBloomFilters(df, dest, Seq.empty))
    intercept[IllegalArgumentException](
      Layout.writeWithBloomFilters(df, dest, Seq("nope")))
  }

  test("zvalueByRange refuses URL-cardinality string z-columns loudly") {
    import org.apache.spark.sql.functions._
    // a string column whose distinct count exceeds the declared bound:
    // the order-preserving boundary path would otherwise become a
    // single-task sort of a corpus-sized distinct set
    val wide = spark.range(Layout.MaxStringZDistinct + 1)
      .select(col("id"),
        concat(lit("https://example.com/p/"), col("id")).as("url"))
    val ex = intercept[IllegalArgumentException](
      Layout.zvalueByRange(wide, Seq("url"), bits = 4))
    assert(ex.getMessage.contains("distinct"), ex.getMessage)
    // bounded-vocabulary strings still bucket fine
    val ok = spark.range(1000)
      .select(col("id"), concat(lit("req"), (col("id") % 7)).as("requester"))
    assert(Layout.zvalueByRange(ok, Seq("requester"), bits = 2)
      .select("zval").distinct().count() <= 4)
  }

  test("rowGroupStats: footer stats reconcile with the data, per group") {
    val dir = Files.createTempDirectory("graft-rgstats").toString + "/ds"
    // tiny row groups: force several groups per file so the per-group
    // breakdown is actually exercised (not just one group per file)
    spark.range(0, 40000).select(col("id").as("k"),
        concat(lit("v"), col("id")).as("payload"))
      .repartition(2)
      .write
      .option("parquet.block.size", (32 * 1024).toString)
      .option("parquet.page.size", (8 * 1024).toString)
      .parquet(dir)
    val stats = Layout.rowGroupStats(spark, dir, "k").cache()
    val rows = stats.collect()
    // multiple groups per file — otherwise the block.size knob did nothing
    val groupsPerFile = rows.groupBy(_.getString(0)).map(_._2.length)
    assert(groupsPerFile.exists(_ > 1), s"expected >1 row group per file, got $groupsPerFile")
    // row counts reconcile exactly
    assert(rows.map(_.getLong(2)).sum === 40000L)
    // group indices are dense 0..k per file
    rows.groupBy(_.getString(0)).foreach { case (f, g) =>
      assert(g.map(_.getInt(1)).sorted.toSeq === (0 until g.length), f)
    }
    // every group's [min,max] really bounds its rows (footer integrity):
    // re-read and check global min/max against footers
    assert(rows.map(_.getLong(3)).min === 0L)
    assert(rows.map(_.getLong(4)).max === 39999L)
    // paths are relative to the audited root
    assert(rows.forall(r => !r.getString(0).startsWith("/") &&
      !r.getString(0).contains("graft-rgstats")))
    stats.unpersist()
  }

  test("rowGroupStats: sorted write narrows spans to non-overlapping ranges") {
    val base = Files.createTempDirectory("graft-rgsort").toString
    val df = spark.range(0, 20000)
      .select((col("id") * 2654435761L % 20000).as("k"))
    def spans(path: String): Seq[(Long, Long)] = {
      val sorted = Layout.rowGroupStats(spark, path, "k")
        .orderBy("file", "row_group").collect()
        .map(r => (r.getLong(3), r.getLong(4))).toSeq
      sorted
    }
    df.coalesce(1).sortWithinPartitions("k").write
      .option("parquet.block.size", (64 * 1024).toString)
      .parquet(base + "/sorted")
    df.coalesce(1).write
      .option("parquet.block.size", (64 * 1024).toString)
      .parquet(base + "/unsorted")
    val s = spans(base + "/sorted")
    val u = spans(base + "/unsorted")
    assert(s.size > 1 && u.size > 1)
    // clustered layout: consecutive groups do not overlap (each group's
    // min is past the previous group's max) — THE property that makes
    // row-group pruning effective. The unsorted layout fails it.
    assert(s.sliding(2).forall { case Seq((_, aMax), (bMin, _)) => bMin > aMax },
      s"sorted spans overlap: $s")
    assert(!u.sliding(2).forall { case Seq((_, aMax), (bMin, _)) => bMin > aMax },
      s"unsorted spans unexpectedly disjoint: $u")
  }

  test("rowGroupStats: loud errors on a missing column") {
    val dir = Files.createTempDirectory("graft-rgmiss").toString + "/ds"
    spark.range(10).select(col("id").as("k")).write.parquet(dir)
    val ex = intercept[org.apache.spark.SparkException](
      Layout.rowGroupStats(spark, dir, "nope").collect())
    assert(ex.getMessage.contains("not found") ||
      Option(ex.getCause).exists(_.getMessage.contains("not found")))
  }

  test("compactionPlan: closed-form contiguous bins per partition") {
    import spark.implicits._
    // A: 60+50 straddles into bin 0; 30+100 into bin 1.
    // B: one 250-byte file alone in bin 0 (no rewrite); the next file's
    //    bytesBefore = 250 → bin 2 (bin ids may skip — they are offsets).
    val files = Seq(
      ("A", "f1", 60L), ("A", "f2", 50L), ("A", "f3", 30L), ("A", "f4", 100L),
      ("B", "g1", 250L), ("B", "g2", 10L)
    ).toDF("part", "file", "bytes")
    val plan = Layout.compactionPlan(files, "part", "file", "bytes",
        targetBytes = 100L)
      .as[(String, Int, Long, Long, String, String, Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(plan.toSeq == Seq(
      ("A", 0, 2L, 110L, "f1", "f2", true),
      ("A", 1, 2L, 130L, "f3", "f4", true),
      ("B", 0, 1L, 250L, "g1", "g1", false),
      ("B", 2, 1L, 10L, "g2", "g2", false)))
    intercept[IllegalArgumentException](
      Layout.compactionPlan(files, "part", "file", "bytes", 0L))
  }

  test("zoneMapStats: closed-form stats including all-NULL zones") {
    val rows = Seq(("z1", Some(5L)), ("z1", Some(1L)), ("z1", None),
      ("z2", Some(100L)), ("z3", None)).toDF("z", "v")
    val got = Layout.zoneMapStats(rows, col("z"), "v")
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    assert(got("z1") == (("z1", 3L, 1L, Some(1L), Some(5L))))
    assert(got("z2") == (("z2", 1L, 0L, Some(100L), Some(100L))))
    assert(got("z3") == (("z3", 1L, 1L, None, None)))
  }

  test("zoneMapPrune: soundness and boundary inclusivity") {
    // zones z1 [1,5], z2 [100,100], z3 all-NULL
    val rows = Seq(("z1", Some(5L)), ("z1", Some(1L)), ("z1", None),
      ("z2", Some(100L)), ("z3", None)).toDF("z", "v")
    val zones = Layout.zoneMapStats(rows, col("z"), "v")
    val out = Layout.zoneMapPrune(zones,
        Seq((1L, 5L, 50L),    // touches z1 exactly at vmax
          (2L, 6L, 99L),      // gap between the zones -> prune all
          (3L, 0L, 1000L)))   // covers everything with values
      .as[(Long, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(out((1L, "z1")) && !out((1L, "z2")) && !out((1L, "z3")))
    assert(!out((2L, "z1")) && !out((2L, "z2")) && !out((2L, "z3")))
    assert(out((3L, "z1")) && out((3L, "z2")) && !out((3L, "z3")),
      "an all-NULL zone can never match a range predicate")
    intercept[IllegalArgumentException](Layout.zoneMapPrune(zones, Seq()))
  }

  test("zoneMapPrune soundness property on random correlated data") {
    val rnd = new scala.util.Random(11)
    val data = (0 until 5000).map { _ =>
      val v = rnd.nextInt(10000).toLong
      (s"zone-${v / 500}", v) // zone correlates with value
    }.toDF("z", "v")
    val preds = Seq((1L, 1234L, 2345L), (2L, 9000L, 9100L), (3L, 42L, 43L))
    val pruned = Layout.zoneMapPrune(
        Layout.zoneMapStats(data, col("z"), "v"), preds)
      .filter(!col("kept")).select("pred_id", "zone")
      .as[(Long, String)].collect().toSet
    val rows = data.as[(String, Long)].collect()
    preds.foreach { case (id, lo, hi) =>
      rows.foreach { case (z, v) =>
        if (pruned((id, z)))
          assert(v < lo || v > hi,
            s"pred $id pruned zone $z but row $v matches")
      }
    }
  }
}
