package graft.ext

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PCA against a constructed eigenstructure: points laid out along
  * known orthogonal axes with known variances, so eigenvalues,
  * components (up to the canonical sign), projections, and whitening
  * are all checkable by hand. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // x = a·(0.6, 0.8) + b·(−0.8, 0.6), a ∈ ±5, b ∈ ±2 (all 4 combos):
  // population covariance has eigenpairs (25, (0.6,0.8)) and
  // (4, (−0.8,0.6)); means are exactly 0
  private def planted() = (for {
    a <- Seq(-5.0, 5.0); b <- Seq(-2.0, 2.0)
  } yield (a, b, Array(a * 0.6 + b * -0.8, a * 0.8 + b * 0.6))).zipWithIndex
    .map { case ((a, b, v), i) => (i.toLong, a, b, v.map(_.toFloat)) }
    .toDF("id", "a", "b", "v")

  test("fit recovers planted eigenvalues, axes, and canonical signs") {
    val m = Pca.fit(planted(), "v")
    assert(m.dim == 2)
    // inputs are float32 (the embedding dtype), so data-derived
    // quantities carry ~1e-6 relative rounding
    assert(math.abs(m.eigenvalues(0) - 25.0) < 1e-4 &&
      math.abs(m.eigenvalues(1) - 4.0) < 1e-4, m.eigenvalues.toSeq)
    // first axis: largest-|entry| (0.8) positive -> (0.6, 0.8)
    assert(math.abs(m.components(0)(0) - 0.6) < 1e-5 &&
      math.abs(m.components(0)(1) - 0.8) < 1e-5)
    // second axis (−0.8, 0.6) canonicalizes to (0.8, −0.6)
    assert(math.abs(m.components(1)(0) - 0.8) < 1e-5 &&
      math.abs(m.components(1)(1) + 0.6) < 1e-5)
    assert(math.abs(m.explainedRatio(1) - 25.0 / 29.0) < 1e-6)
    assert(m.explainedRatio(2) == 1.0)
  }

  test("transform projects onto the axes; whiten gives unit variance") {
    val df = planted()
    val m = Pca.fit(df, "v")
    // raw projection: y0 == a, y1 == −b (second axis flipped by the
    // sign canon), exactly
    val proj = Pca.transform(df, "v", m, k = 2, outCol = "y")
      .select($"a", $"b", $"y"(0).as("y0"), $"y"(1).as("y1"))
      .as[(Double, Double, Double, Double)].collect()
    proj.foreach { case (a, b, y0, y1) =>
      assert(math.abs(y0 - a) < 1e-4 && math.abs(y1 + b) < 1e-4,
        s"($a, $b) -> ($y0, $y1)")
    }
    // whitened: per-component population variance is 1
    val w = Pca.transform(df, "v", m, k = 2, outCol = "y", whiten = true)
    val vs = w.agg(var_pop($"y"(0)), var_pop($"y"(1)))
      .as[(Double, Double)].head()
    assert(math.abs(vs._1 - 1.0) < 1e-9 && math.abs(vs._2 - 1.0) < 1e-9)
  }

  test("jacobi: diagonal input is already solved; larger random matrix " +
      "reconstructs") {
    val (vals, vecs) = Pca.jacobiEigSym(
      Array(Array(3.0, 0.0), Array(0.0, 7.0)))
    assert(vals.toSeq == Seq(7.0, 3.0))
    assert(vecs(0).toSeq == Seq(0.0, 1.0) && vecs(1).toSeq == Seq(1.0, 0.0))
    // random symmetric 12x12: V diag(L) V^T must reconstruct A
    val rnd = new scala.util.Random(5)
    val n = 12
    val h = Array.fill(n, n)(rnd.nextGaussian())
    val sym = Array.tabulate(n, n)((i, j) => (h(i)(j) + h(j)(i)) / 2)
    val (l, v) = Pca.jacobiEigSym(sym)
    assert((1 until n).forall(j => l(j - 1) >= l(j)))
    for (i <- 0 until n; j <- 0 until n) {
      val rec = (0 until n).map(k => v(k)(i) * l(k) * v(k)(j)).sum
      assert(math.abs(rec - sym(i)(j)) < 1e-9, s"A($i)($j)")
    }
  }

  test("fit refuses ragged vectors and empty input") {
    val ragged = Seq(
      (1L, Array(1.0f, 2.0f)), (2L, Array(1.0f, 2.0f, 3.0f)))
      .toDF("id", "v")
    intercept[Exception](Pca.fit(ragged, "v"))
    val empty = Seq.empty[(Long, Array[Float])].toDF("id", "v")
    intercept[IllegalArgumentException](Pca.fit(empty, "v"))
  }

  test("fit refuses a null ELEMENT inside a vector (not silent 0.0)") {
    // getSeq[Double] would unbox a null element to 0.0 and silently
    // corrupt the moments — the contract is a loud failure instead
    val rows = Seq(
      Row(1L, Seq[java.lang.Double](1.0, 2.0)),
      Row(2L, Seq[java.lang.Double](3.0, null)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = true))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val e = intercept[Exception](Pca.fit(df, "v"))
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.contains("null element"))
  }
}
