package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd k-means over an embedding column — the clustering
  * step an embedding-heavy curation pipeline runs between PCA and
  * sampling (topic balance audits, diversity-stratified mixtures,
  * per-cluster quality review). FIXED iteration count, exact integer/
  * decimal arithmetic where cross-engine parity needs it — the gate
  * oracle replays entire Lloyd rounds in SQL, so every step must be a
  * pure deterministic function of the input:
  *
  *  - init: the md5-rank donor sample ([[Similarity.donorSample]] — the
  *    IVF bootstrap; id-distribution-free, replayable as
  *    `ORDER BY md5(id), id`), donors in id order;
  *  - assignment: exact L2 argmin via the `PqEncode` kernel with ONE
  *    subspace — argmax of `dot(x, c) − |c|²/2` over centroid literals,
  *    ties to the lowest centroid index; one codegen'd node per row, no
  *    join, the corpus never shuffles for assignment;
  *  - update: [[Similarity.groupCentroids]]' decimal-exact per-(cluster,
  *    dim) means (partition-order-independent), collected to the driver
  *    (k·d doubles — bounded, the centroid-literal round trip every
  *    distributed k-means pays); an emptied cluster keeps its previous
  *    centroid (the standard rule, and the oracle's LEFT JOIN).
  *
  * Per round: one scan + one skinny (cluster, dim) aggregate. Lineage
  * does not grow with rounds — each round's plan reads the input fresh
  * with the new centroid literals. Convergence detection is
  * deliberately absent: a fixed `iters` is deterministic and
  * replayable; callers watching movement can compare `Model.centroids`
  * across calls.
  */
object KMeans {

  /** Trained model: row-major centroids (k×d) in initial-donor order. */
  final case class Model(centroids: Array[Array[Double]], iters: Int) {
    def k: Int = centroids.length
  }

  /** Exact L2 cluster index of `vec` against centroid literals (0-based;
    * ties to the lowest index).
    */
  def clusterOf(vec: Column, centroids: Seq[Seq[Double]]): Column =
    element_at(graft.functions.PqFunctions.pqEncode(vec, centroids, 1), 1)

  /** Fit `k` clusters with `iters` Lloyd rounds. `idCol` must be numeric
    * (the donor-sample contract).
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
          iters: Int = 5): Model = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val clean = df.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
    val donors = Similarity.donorSample(clean, idCol, vecCol, k)
    require(donors.nonEmpty, "k-means init sample is empty — no non-null rows")
    var centroids: Seq[Seq[Double]] = donors.toSeq.map(_._2.toSeq)
    var round = 0
    while (round < iters) {
      val assigned = clean.select(col(vecCol).as("__v"),
        clusterOf(col(vecCol), centroids).as("__c"))
      val updated: Map[Int, Seq[Double]] =
        Similarity.groupCentroids(assigned, "__c", "__v")
          .collect()
          .map(r => r.getInt(0) ->
            r.getSeq[Any](1).map(v => v.asInstanceOf[Number].doubleValue()).toSeq)
          .toMap
      centroids = centroids.zipWithIndex.map { case (prev, j) =>
        updated.getOrElse(j, prev) // empty cluster keeps its centroid
      }
      round += 1
    }
    Model(centroids.map(_.toArray).toArray, iters)
  }

  /** Assign every row to its nearest model centroid: (idCol, cluster). */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             model: Model): DataFrame =
    df.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol),
        clusterOf(col(vecCol), model.centroids.toSeq.map(_.toSeq))
          .cast("int").as("cluster"))

  /** Simplified silhouette per cluster — the fit-quality number a
    * clustering audit reports: per point, a = L2 distance to its OWN
    * centroid, b = distance to the nearest OTHER centroid,
    * s = (b − a)/max(a, b) ∈ [−1, 1] (the centroid-based simplification
    * of the classic O(n²) pairwise silhouette — the only form that
    * scales). Distances come from one `matVec` kernel pass per row
    * (array of dot products against the k centroid literals) plus the
    * per-centroid |c|² constants: dist_j = √max(|x|² − 2·x·c_j + |c_j|²,
    * 0) in ONE fixed double shape, s floored at e6 — every number
    * identical on any IEEE engine, so the oracle replays the whole
    * audit. Output: (cluster, n_members, mean_sil_e6) with the mean a
    * floored integer division.
    */
  def silhouette(df: DataFrame, idCol: String, vecCol: String,
                 model: Model): DataFrame = {
    require(model.k >= 2, s"silhouette needs k >= 2, got ${model.k}")
    val cents = model.centroids.toSeq.map(_.toSeq)
    val ccs: Seq[Double] = model.centroids.toSeq.map { c =>
      var s = 0.0
      var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }
    val xx = graft.functions.VectorFunctions.vecDot(col(vecCol), col(vecCol))
    val dots = graft.functions.VectorFunctions.matVec(col(vecCol), cents)
    val base = df.filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol),
        clusterOf(col(vecCol), cents).as("cluster"),
        transform(sequence(lit(0), lit(model.k - 1)), j =>
          sqrt(greatest(xx - lit(2.0) * element_at(dots, j + 1)
            + element_at(typedLit(ccs), j + 1), lit(0.0)))).as("__d"))
    val a = element_at(col("__d"), col("cluster") + 1)
    val b = array_min(transform(
      filter(sequence(lit(0), lit(model.k - 1)), j => j =!= col("cluster")),
      j => element_at(col("__d"), j + 1)))
    val s6 = floor(
      when(greatest(a, b) > 0, (b - a) / greatest(a, b)).otherwise(lit(0.0))
        * lit(1e6)).cast("long")
    base.select(col("cluster"), s6.as("__s6"))
      .groupBy("cluster")
      .agg(count(lit(1)).cast("long").as("n_members"),
        floor(sum(col("__s6")).cast("double") / count(lit(1)))
          .cast("long").as("mean_sil_e6"))
  }

  /** Per-cluster audit frame: size and exact-decimal mean vector — the
    * "what did we actually cluster" report; one skinny aggregate.
    */
  def clusterProfile(df: DataFrame, idCol: String, vecCol: String,
                     model: Model): DataFrame = {
    val assigned = assign(df, idCol, vecCol, model)
      .join(df.select(col(idCol), col(vecCol)), Seq(idCol))
    assigned.groupBy(col("cluster"))
      .agg(count(lit(1)).cast("long").as("n_members"))
      .join(Similarity.groupCentroids(
          assigned.select(col("cluster"), col(vecCol)), "cluster", vecCol),
        Seq("cluster"))
  }
}
