package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Principal-component analysis / whitening over an embedding column —
  * the standard preprocessing leg of an embedding pipeline (decorrelate
  * before quantization, reduce before ANN indexing, whiten before
  * cosine so dominant directions stop swamping similarity; the same
  * role sklearn's PCA(whiten=True) plays in retrieval stacks).
  *
  * Scale shape (the only one that survives 100 TB):
  *  - [[fit]] is ONE distributed pass: each partition accumulates the
  *    dim-vector of sums and the dim×dim upper triangle of raw
  *    second moments into local arrays (`treeAggregate` — per-partition
  *    imperative accumulation is the documented RDD exception), so the
  *    shuffle carries O(partitions · dim²) doubles, never rows. The
  *    dim×dim covariance and its eigendecomposition live on the driver
  *    BY CONSTRUCTION (dim ≤ a few thousand; 64×64 here) — the same
  *    boundary every distributed PCA draws (Spark ML's own
  *    RowMatrix.computePrincipalComponents does exactly this).
  *  - [[transform]] is MAP-ONLY: k codegen'd [[Similarity.dot]]
  *    products against literal component vectors; no shuffle, no UDF.
  *
  * Eigensolver: cyclic Jacobi on the symmetric covariance — O(dim³)
  * per sweep, converges in ~log(dim) sweeps, exact enough that the
  * projected covariance is diagonal to ~1e-12 relative (certified
  * in-query by q185). Eigenvector SIGNS are canonicalized (largest-
  * magnitude entry positive) so a refit on the same data reproduces
  * the same model.
  */
object Pca {

  /** Fitted model: per-dimension means, eigenvalues (descending,
    * population covariance), components(j) = j-th principal axis.
    * Driver-held O(dim²) doubles — bounded by the embedding width. */
  final case class Model(mean: Array[Double], eigenvalues: Array[Double],
      components: Array[Array[Double]]) {
    def dim: Int = mean.length
    /** Fraction of total variance carried by the top-k components. */
    def explainedRatio(k: Int): Double = {
      val tot = eigenvalues.sum
      if (tot <= 0) 0.0 else eigenvalues.take(k).sum / tot
    }
  }

  /** One-pass fit of the population covariance's eigenstructure.
    * `vecCol` must hold fixed-width numeric arrays (float or double);
    * rows with a null vector are skipped; a wrong-width vector or a
    * null ELEMENT inside a vector fails the job loudly (silent
    * truncation / null→0.0 unboxing would corrupt the moments). */
  def fit(df: DataFrame, vecCol: String): Model = {
    val first = df.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .head(1)
    require(first.nonEmpty, s"pca fit: no non-null vectors in $vecCol")
    val dim = first.head.getSeq[Number](0).length
    require(dim > 0, "pca fit: zero-width vectors")
    val tri = dim * (dim + 1) / 2
    // acc layout: [0] = n, [1..dim] = sums, [dim+1 ..] = upper-tri
    // raw second moments (i <= j at offset i*dim - i*(i-1)/2 + (j-i))
    val zero = new Array[Double](1 + dim + tri)
    val acc = df.select(col(vecCol).cast("array<double>")).rdd
      .treeAggregate(zero)(
        seqOp = (a, row) => {
          val raw = row.getSeq[java.lang.Double](0)
          if (raw != null) {
            require(raw.length == dim,
              s"pca fit: vector of width ${raw.length}, expected $dim")
            // Read BOXED and require non-null per element: getSeq[Double]
            // silently unboxes a null element to 0.0, which would corrupt
            // the moments instead of failing loudly (the doc contract).
            val v = new Array[Double](dim)
            var k = 0
            while (k < dim) {
              val b = raw(k)
              require(b != null,
                s"pca fit: null element at index $k in $vecCol vector")
              v(k) = b.doubleValue
              k += 1
            }
            a(0) += 1.0
            var i = 0
            var off = 1 + dim
            while (i < dim) {
              val xi = v(i)
              a(1 + i) += xi
              var j = i
              while (j < dim) { a(off) += xi * v(j); off += 1; j += 1 }
              i += 1
            }
          }
          a
        },
        combOp = (a, b) => {
          var i = 0
          while (i < a.length) { a(i) += b(i); i += 1 }
          a
        })
    val n = acc(0)
    require(n >= 2, s"pca fit: need >= 2 vectors, got ${n.toLong}")
    val mean = Array.tabulate(dim)(i => acc(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var off = 1 + dim
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val c = acc(off) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        off += 1; j += 1
      }
      i += 1
    }
    val (eigVals, eigVecs) = jacobiEigSym(cov)
    Model(mean, eigVals, eigVecs)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues desc, eigenvectors(j) = unit axis j, signs
    * canonicalized). Driver-side O(dim³) — the deliberate boundary. */
  private[ext] def jacobiEigSym(m: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    val a = Array.tabulate(n, n)((i, j) => m(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def offNorm(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    var sweep = 0
    while (offNorm() > 1e-20 && sweep < 64) {
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1))
            val c = 1.0 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < n) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(j => -a(j)(j))
    val vals = order.map(j => a(j)(j)).toArray
    val vecs = order.map { j =>
      val w = Array.tabulate(n)(i => v(i)(j))
      // canonical sign: the largest-magnitude entry is positive, so a
      // refit reproduces the same axes bit-for-bit (modulo summation)
      val imax = (0 until n).maxBy(i => math.abs(w(i)))
      if (w(imax) < 0) w.map(x => -x) else w
    }.toArray
    (vals, vecs)
  }

  /** Project `vecCol` onto the top-k components as `outCol`
    * (array<double>, width k): y_j = (x - mean) · comp_j, computed as
    * k codegen'd dot products against literal axes (the mean term
    * folds into a per-component constant — map-only, no shuffle).
    * `whiten` divides each coordinate by sqrt(eigenvalue + eps) so
    * the output has unit variance per component. */
  def transform(df: DataFrame, vecCol: String, model: Model, k: Int,
      outCol: String = "pca", whiten: Boolean = false,
      eps: Double = 1e-12): DataFrame = {
    require(k > 0 && k <= model.dim,
      s"need 0 < k <= ${model.dim}, got $k")
    val x = col(vecCol).cast("array<double>")
    val comps: Seq[Column] = (0 until k).map { j =>
      val comp = model.components(j)
      val c0 = (0 until model.dim)
        .map(i => model.mean(i) * comp(i)).sum // mean · comp_j
      val y = Similarity.dot(x, array(comp.map(lit).toSeq: _*)) - lit(c0)
      if (whiten) y / lit(math.sqrt(model.eigenvalues(j) + eps)) else y
    }
    df.withColumn(outCol, array(comps: _*))
  }
}
