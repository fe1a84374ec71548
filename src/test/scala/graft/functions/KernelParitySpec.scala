package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Bit-parity of the native constant-matrix kernels against the composed
  * Column formulations they replaced. The kernels exist for OPTIMIZER
  * cost (a reference object instead of K×dim literal nodes), not for
  * different semantics — so on randomized inputs every kernel must equal
  * the original composed expression exactly, bit for bit. This is the
  * contract the generated SQL oracles (q16/q28/q80/q86) lean on; a future
  * kernel edit that drifts by an ulp fails here before it flakes a gate.
  */
class KernelParitySpec extends SparkTestBase {
  import spark.implicits._

  private val dim = 16
  private lazy val vecs = (0L until 150L).map { i =>
    (i, Array.tabulate(dim)(d => (math.sin(i * 31 + d * 7) * 3).toFloat))
  }.toDF("id", "v")

  private val rnd = new scala.util.Random(99L)
  private val matrix: Seq[Seq[Double]] =
    Seq.fill(6)(Seq.fill(dim)(rnd.nextGaussian()))

  private def dot(a: Column, b: Column) = VectorFunctions.vecDot(a, b)

  private def assertSame(kernel: Column, composed: Column): Unit = {
    val bad = vecs.select(col("id"), kernel.as("k"), composed.as("c"))
      .filter(!(col("k") <=> col("c")))
      .collect()
    assert(bad.isEmpty, s"kernel diverges from composed form: ${bad.take(3).toSeq}")
  }

  test("MatVec == per-row literal-dot array") {
    val composed = array(matrix.map(row =>
      dot(col("v"), array(row.map(lit): _*))): _*)
    assertSame(VectorFunctions.matVec(col("v"), matrix), composed)
  }

  test("HyperplaneBucket == when/shiftleft OR-reduction") {
    val composed = matrix.zipWithIndex.map { case (p, i) =>
      when(dot(col("v"), array(p.map(lit): _*)) >= 0,
        shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    assertSame(
      VectorFunctions.hyperplaneBucket(col("v"), matrix), composed)
  }

  test("NearestCentroid == array_max over (cosine, -index) structs") {
    val composed = -array_max(array(matrix.zipWithIndex.map { case (c, j) =>
      struct(VectorFunctions.vecCosine(col("v"), array(c.map(lit): _*)).as("c"),
        lit(-j).as("nj"))
    }: _*)).getField("nj")
    assertSame(
      VectorFunctions.nearestCentroid(col("v"), matrix), composed.cast("int"))
  }

  test("PqEncode == per-subspace argmax of dot - |c|^2/2") {
    val numSub = 4
    val subDim = dim / numSub
    // codebook rows must span the full dim like pqTopK's sampled donors
    val codebook: Seq[Seq[Double]] = Seq.fill(8)(Seq.fill(dim)(rnd.nextGaussian()))
    def codeFor(m: Int): Column = {
      val entries = codebook.indices.map { j =>
        val c = codebook(j).slice(m * subDim, (m + 1) * subDim)
        struct(
          (dot(slice(col("v"), m * subDim + 1, subDim), array(c.map(lit): _*))
            - lit(0.5 * c.map(x => x * x).sum)).as("s"),
          lit(-j).as("nj"))
      }
      -array_max(array(entries: _*)).getField("nj")
    }
    val composed = array((0 until numSub).map(m => codeFor(m).cast("int")): _*)
    assertSame(PqFunctions.pqEncode(col("v"), codebook, numSub), composed)
  }

  test("PqLut == per-subspace literal-dot matrix") {
    val numSub = 4
    val subDim = dim / numSub
    val codebook: Seq[Seq[Double]] = Seq.fill(8)(Seq.fill(dim)(rnd.nextGaussian()))
    val composed = array((0 until numSub).map { m =>
      array(codebook.indices.map { j =>
        val c = codebook(j).slice(m * subDim, (m + 1) * subDim)
        dot(slice(col("v"), m * subDim + 1, subDim), array(c.map(lit): _*))
      }: _*)
    }: _*)
    assertSame(PqFunctions.pqLut(col("v"), codebook, numSub), composed)
  }

  test("TokenModeCount == array_max over distinct filter-counts") {
    val toks = (0L until 100L).map { i =>
      (i, Seq.tabulate(12)(j => s"w${(i * 7 + j * j) % 5}"))
    }.toDF("id", "toks")
    val composed = coalesce(
      array_max(transform(array_distinct(col("toks")),
        t => size(filter(col("toks"), x => x === t)))), lit(0))
    val bad = toks.select(col("id"),
        SketchFunctions.tokenModeCount(col("toks")).as("k"), composed.as("c"))
      .filter(!(col("k") <=> col("c"))).collect()
    assert(bad.isEmpty, s"tokenModeCount diverges: ${bad.take(3).toSeq}")
  }

  test("PortableMinHash == md5-transform/array_min composition") {
    // the exact declarative form StreamingMinhashLsh used before the
    // kernel (and that its DuckDB oracle still replays): slot i =
    // array_min over shingles of the first 16 hex chars of md5("i|" ++ s)
    val numHashes = 16
    val rows = (0L until 80L).map { i =>
      (i, Seq.tabulate((i % 7).toInt + 1)(j => s"sh ${(i * 13 + j * 5) % 23} x$j"))
    } :+ (999L, Seq.empty[String])
    val docs = rows.toDF("id", "sh")
    val composed = transform(sequence(lit(0), lit(numHashes - 1)), i =>
      array_min(transform(col("sh"), s => substring(
        md5(concat(i.cast("string"), lit("|"), s).cast("binary")), 1, 16))))
    val bad = docs.select(col("id"),
        SketchFunctions.portableMinhash(col("sh"), numHashes).as("k"),
        composed.as("c"))
      .filter(!(col("k") <=> col("c"))).collect()
    assert(bad.isEmpty, s"portableMinhash diverges: ${bad.take(3).toSeq}")
  }
}
