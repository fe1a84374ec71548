package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity

/** Measured recall@k of every approximate ANN path against the exact
  * brute-force ranking, on the real `embeddings` table at the configured
  * scale factor (`SPARK_GRAFT_SF_DIR`, default sf0.1) — the number that
  * justifies choosing an approximate index at 100 TB. Prints one
  * markdown-ready row per method: recall@k, mean wall seconds per run,
  * and the method's corpus-work profile.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.tools.AnnRecallBench'
  */
object AnnRecallBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val k = 10
    val nQueries = 20
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.load(spark, sfDir, "embeddings").cache()
    val n = emb.count()
    // deterministic query picks spread over the id space
    val stride = math.max(n / nQueries, 1L)
    val queries = emb.filter(col("vec_id") % stride === 0)
      .limit(nQueries)
      .select(col("vec_id").as("query_id"), col("embedding")).cache()
    queries.count()

    def topkSet(df: DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

    def timed(name: String, profile: String)(f: => DataFrame): (String, Map[Long, Set[Long]]) = {
      val t0 = System.nanoTime()
      val res = topkSet(f)
      val sec = (System.nanoTime() - t0) / 1e9
      (s"| $name | @@RECALL@@ | ${f"$sec%.2f"} | $profile |", res)
    }

    val qs = queries.select(col("query_id"), col("embedding"))
    val (_, truth) = timed("brute", "")(
      Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", "query_id", k))

    val rows = Seq(
      timed("brute-force (exact)", "full corpus scan per query batch")(
        Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", "query_id", k)),
      timed("LSH auto-bit multi-probe", "scores only matching + adjacent buckets")(
        Similarity.lshTopK(emb, qs, "vec_id", "embedding", "query_id", k)),
      timed("LSH 6-bit multi-probe", "bigger buckets: more corpus scored, higher recall")(
        Similarity.lshTopK(emb, qs, "vec_id", "embedding", "query_id", k, bits = 6)),
      timed("IVF nprobe=3/auto", "scores only probed cells")(
        Similarity.ivfTopK(emb, qs, "vec_id", "embedding", "query_id", k)),
      timed("IVF nprobe=8/auto", "more cells probed: recall/cost midpoint")(
        Similarity.ivfTopK(emb, qs, "vec_id", "embedding", "query_id", k, nprobe = 8)),
      timed("PQ 8x16 rerank=4", "ADC over codes; raw vectors only for re-rank pool")(
        Similarity.pqTopK(emb, qs, "vec_id", "embedding", "query_id", k)),
      timed("PQ 8x16 rerank=16", "wider exact re-rank pool over the same codes")(
        Similarity.pqTopK(emb, qs, "vec_id", "embedding", "query_id", k, rerankFactor = 16)),
      timed("IVF join nprobe=3/auto", "cell equi-join, raw vectors ride the join")(
        Similarity.ivfTopKJoin(qs, emb, "query_id", "vec_id", "embedding", k)),
      timed("IVF+PQ join 8x16 rerank=4", "cell equi-join over codes; raw vectors only for re-rank pool")(
        Similarity.ivfPqTopKJoin(qs, emb, "query_id", "vec_id", "embedding", k)),
      timed("IVF+PQ join 8x16 rerank=16", "same codes, wider exact pool")(
        Similarity.ivfPqTopKJoin(qs, emb, "query_id", "vec_id", "embedding", k,
          rerankFactor = 16))
    ).map { case (tmpl, res) =>
      val recalls = truth.toSeq.map { case (q, exact) =>
        res.get(q).map(a => (a & exact).size.toDouble / exact.size).getOrElse(0.0)
      }
      val recall = recalls.sum / math.max(recalls.size, 1)
      tmpl.replace("@@RECALL@@", f"$recall%.3f")
    }

    println(s"ANN recall@$k over $nQueries queries, corpus n=$n ($sfDir)")
    println("| method | recall@10 | wall s | corpus work |")
    println("|---|---|---|---|")
    rows.foreach(println)
    spark.stop()
  }
}
