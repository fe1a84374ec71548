package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeQ177 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .appName("probe").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/tmp/sf1ish"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val names = docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), trim(lower(substring(col("text"), 1, 20))).as("name"))
    val probes = names.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 90000).as("probe_id"),
        expr("concat(substr(name,1,4), substr(name,6,1), substr(name,5,1), substr(name,7))").as("name"))
    println("names=" + names.count() + " probes=" + probes.count())
    val l = probes.select(col("name").as("n")).withColumn("p", substring(col("n"),1,4)).withColumn("lon", length(col("n")))
    val r = names.select(col("name").as("n")).withColumn("p", substring(col("n"),1,4)).withColumn("lon", length(col("n")))
    val lc = l.groupBy("p","lon").count().withColumnRenamed("count","cl").withColumnRenamed("lon","ll")
    val rc = r.groupBy("p","lon").count().withColumnRenamed("count","cr").withColumnRenamed("lon","lr")
    val pairs = lc.join(rc, Seq("p")).filter(abs(col("ll")-col("lr")) <= 2)
      .agg(sum(col("cl")*col("cr"))).collect()(0)
    println("contract pair volume = " + pairs)
    val t0 = System.nanoTime
    val out = graft.ext.Linkage.fuzzyJoin(probes, "probe_id", "name", names, "doc_id", "name",
      threshold=0.85, lengthBand=2, blockPrefix=4)
    println("result rows = " + out.count())
    println("fuzzyJoin count secs = " + (System.nanoTime-t0)/1e9)
    println(out.queryExecution.executedPlan.toString.linesIterator.take(30).mkString("\n"))
    spark.stop()
  }
}
