package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Product quantization: seeded fit is deterministic and refuses bad
  * input; encode picks the nearest sub-centroid with lowest-id ties;
  * ADC approximates well enough to preselect; and the exactness
  * anchor — re-ranking a pool that covers the corpus reproduces
  * brute force bit-for-bit (same scores, same tie discipline). */
class PqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs(seed: Int, n: Int, dim: Int, center: Array[Double],
      spread: Double): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong,
        center.map(c => (c + rnd.nextGaussian() * spread).toFloat))
    }
  }

  private def corpus(dim: Int = 16): DataFrame = {
    // two well-separated clusters plus a shifted band — enough
    // structure that a 8-row codebook reconstructs meaningfully
    val a = vecs(1, 40, dim, Array.fill(dim)(1.0), 0.15)
    val b = vecs(2, 40, dim, Array.tabulate(dim)(i =>
      if (i % 2 == 0) 4.0 else -2.0), 0.15)
      .map { case (i, v) => (100L + i, v) }
    val c = vecs(3, 20, dim, Array.tabulate(dim)(i => i * 0.3), 0.15)
      .map { case (i, v) => (200L + i, v) }
    (a ++ b ++ c).toDF("vec_id", "embedding")
  }

  test("fit is seed-deterministic, validates geometry, refuses nulls") {
    val df = corpus()
    val m1 = Pq.fit(df, "vec_id", "embedding", m = 4, ks = 8, seed = 7)
    val m2 = Pq.fit(df, "vec_id", "embedding", m = 4, ks = 8, seed = 7)
    assert(m1 == m2, "same seed must fit the same codebooks")
    val m3 = Pq.fit(df, "vec_id", "embedding", m = 4, ks = 8, seed = 8)
    assert(m1 != m3, "a different seed must sample differently")
    assert(m1.dsub == 4 && m1.codebooks.size == 4 &&
      m1.codebooks.forall(cb => cb.size == 8 && cb.forall(_.size == 4)))
    assert(m1.compressionRatio == 16.0) // 16 dims * 4B / 4 codes
    // dim not divisible by m
    intercept[IllegalArgumentException](
      Pq.fit(df, "vec_id", "embedding", m = 5, ks = 8))
    // a null vector in the sampled window must refuse loudly
    val withNull = df.unionByName(Seq((999L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding"))
    intercept[IllegalArgumentException](
      Pq.fit(withNull.filter($"vec_id" === 999L || $"vec_id" < 8),
        "vec_id", "embedding", m = 4, ks = 8))
  }

  test("encode: codes bounded by ks; a sampled row reconstructs to " +
      "itself (zero sub-distance picks its own codeword)") {
    val df = corpus()
    val model = Pq.fit(df, "vec_id", "embedding", m = 4, ks = 8, seed = 7)
    val enc = Pq.encode(df, "embedding", model)
    val codes = enc.select($"vec_id", $"pq_code").as[(Long, Seq[Int])]
      .collect().toMap
    assert(codes.values.forall(cd =>
      cd.size == 4 && cd.forall(c => c >= 0 && c < 8)))
    // every sampled vector's slices sit IN the codebook at one shared
    // row index, so its reconstruction error is exactly zero
    val sampleIds = df
      .withColumn("_h", md5(concat(lit("pqfit:7:"),
        $"vec_id".cast("string"))))
      .orderBy($"_h", $"vec_id").limit(8)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])]
      .collect()
    sampleIds.foreach { case (id, v) =>
      val recon = model.reconstruct(codes(id))
      val err = v.map(_.toDouble).zip(recon)
        .map { case (x, y) => (x - y) * (x - y) }.sum
      assert(err == 0.0, s"sampled row $id must self-reconstruct: $err")
    }
  }

  test("null vectors encode to NULL codes and ADC-rank last — never " +
      "silently as centroid-0 codes (the r17 ADVICE doc/behavior gap)") {
    val df = corpus()
    val model = Pq.fit(df, "vec_id", "embedding", m = 4, ks = 8, seed = 7)
    val withNull = df.unionByName(
      Seq((999L, null.asInstanceOf[Array[Float]]))
        .toDF("vec_id", "embedding"))
    val enc = Pq.encode(withNull, "embedding", model)
    // the null row's code is NULL, not a real centroid-0 word
    assert(enc.filter($"vec_id" === 999L)
      .select($"pq_code").head().isNullAt(0),
      "a null vector must encode to a null code word")
    // and through ADC it scores null → desc NULLS LAST → ranks last,
    // exactly as the scaladoc promises a standalone caller
    val q = df.filter($"vec_id" === 1L)
    val ranked = Pq.adcTopK(q, enc, "vec_id", "embedding", "pq_code",
      model, pool = Int.MaxValue)
    val last = ranked.orderBy($"rank".desc)
      .select($"neighbor_id", $"adc_sim").head()
    assert(last.getLong(0) == 999L && last.isNullAt(1),
      s"the null row must rank last with a null score: $last")
  }

  test("exactness anchor: re-ranking a pool that covers the corpus " +
      "reproduces brute force; ADC preselection keeps high recall") {
    val df = corpus()
    // finer geometry than the unit tests: 8 subspaces of 2 dims, 16
    // codewords each — reconstruction good enough to preselect
    val model = Pq.fit(df, "vec_id", "embedding", m = 8, ks = 16, seed = 7)
    val enc = Pq.encode(df, "embedding", model)
    val queries = df.filter($"vec_id".isin(0L, 5L, 105L, 210L))
    val exact = Similarity.bruteForceTopK(
        queries.select($"vec_id", $"embedding"),
        df.select($"vec_id", $"embedding"),
        "vec_id", "embedding", 10)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    // pool = the whole corpus → re-rank IS brute force (scores and
    // ties computed identically)
    val full = Pq.adcTopK(queries, enc, "vec_id", "embedding",
      "pq_code", model, pool = 100)
    val rrFull = Pq.rerankExact(full, df, queries, "vec_id",
        "embedding", 10)
      .select($"query_id", $"neighbor_id", $"rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(rrFull == exact,
      s"missing=${exact -- rrFull} extra=${rrFull -- exact}")
    // a bounded pool (3x the k, 30 of 100) must still cover the true
    // top-10 on this clustered corpus — the preselection contract
    val pool30 = Pq.adcTopK(queries, enc, "vec_id", "embedding",
        "pq_code", model, pool = 30)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toSet
    val truth = exact.map { case (q, n, _) => (q, n) }
    val recall = truth.count(pool30.contains).toDouble / truth.size
    assert(recall >= 0.9, s"ADC pool-30 recall too low: $recall")
  }

  test("refine: Lloyd rounds cut reconstruction error and do not hurt " +
      "pool recall (the production training path; gates stay seeded)") {
    val df = corpus()
    def sqErr(model: Pq.PqModel): Double = {
      val codes = Pq.encode(df, "embedding", model)
        .select($"vec_id", $"embedding", $"pq_code")
        .as[(Long, Seq[Float], Seq[Int])].collect()
      codes.map { case (_, v, cd) =>
        v.map(_.toDouble).zip(model.reconstruct(cd))
          .map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum
    }
    def poolRecall(model: Pq.PqModel): Double = {
      val enc = Pq.encode(df, "embedding", model)
      val queries = df.filter($"vec_id".isin(0L, 5L, 105L, 210L))
      val truth = Similarity.bruteForceTopK(
          queries.select($"vec_id", $"embedding"),
          df.select($"vec_id", $"embedding"),
          "vec_id", "embedding", 10)
        .select($"query_id", $"neighbor_id")
        .as[(Long, Long)].collect().toSet
      val pool = Pq.adcTopK(queries, enc, "vec_id", "embedding",
          "pq_code", model, pool = 30)
        .select($"query_id", $"neighbor_id")
        .as[(Long, Long)].collect().toSet
      truth.count(pool.contains).toDouble / truth.size
    }
    // the deliberately-coarse geometry (m=4, ks=8) leaves headroom
    val seeded = Pq.fit(df, "vec_id", "embedding", m = 4, ks = 8,
      seed = 7)
    val refined = Pq.refine(df, "embedding", seeded, iters = 3)
    val (e0, e1) = (sqErr(seeded), sqErr(refined))
    assert(e1 < e0 * 0.9,
      s"3 Lloyd rounds must cut reconstruction error: $e0 -> $e1")
    val (r0, r1) = (poolRecall(seeded), poolRecall(refined))
    assert(r1 >= r0,
      s"refined codebooks must not hurt pool recall: $r0 -> $r1")
    assert(Pq.refine(df, "embedding", seeded, iters = 0) == seeded)
  }

  test("OPQ parametric init: PCA + eigenvalue allocation cuts PQ " +
      "reconstruction error on cross-subspace-correlated data; a " +
      "bare PCA rotation does NOT (it concentrates variance)") {
    // PQ's independence assumption: each subspace is quantized alone,
    // so correlations STRADDLING subspace boundaries waste codebook
    // budget. Mix 4 seeded latents into all 16 dims — every subspace
    // sees the same latents. A bare PCA rotation is an isometry but
    // packs ~all variance into the FIRST subspace (one 8-codeword
    // quantizer carries everything — the OPQ paper's motivating
    // failure, reproduced below); eigenvalue allocation rebalances
    // the components so each sub-quantizer sees comparable variance
    // and quantizes an effectively low-rank slice.
    val rnd = new scala.util.Random(9)
    val mix = Array.fill(16, 4)(rnd.nextGaussian())
    val rows = (0 until 120).map { i =>
      val z = Array.fill(4)(rnd.nextGaussian() * 2.0)
      val v = mix.map(r =>
        (r.zip(z).map { case (a, b) => a * b }.sum +
          rnd.nextGaussian() * 0.05).toFloat)
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
    val pca = Pca.fit(df, "embedding")
    val rotated = Pca.transform(df, "embedding", pca, 16, "y")
      .select($"vec_id", $"y")
    def sqErr(frame: org.apache.spark.sql.DataFrame,
        vecCol: String): Double = {
      val model = Pq.fit(frame, "vec_id", vecCol, m = 4, ks = 8,
        seed = 7)
      Pq.encode(frame, vecCol, model)
        .select(col(vecCol), col("pq_code"))
        .collect().map { r =>
          val v = r.getSeq[Number](0).map(_.doubleValue())
          val recon = model.reconstruct(r.getSeq[Int](1))
          v.zip(recon).map { case (x, y) => (x - y) * (x - y) }.sum
        }.sum
    }
    val perm = Pq.eigenAllocation(pca.eigenvalues.toSeq, m = 4)
    assert(perm.sorted == (0 until 16), s"not a permutation: $perm")
    val allocated = rotated.select($"vec_id",
      Pq.permute($"y", perm).as("ya"))
    val eRaw = sqErr(df, "embedding")
    val eRot = sqErr(rotated, "y")
    val eAlloc = sqErr(allocated, "ya")
    // the allocated basis must win MATERIALLY over raw; the bare
    // rotation reproducing the paper's failure mode is informative,
    // not required (it documents WHY allocation exists)
    assert(eAlloc < eRaw * 0.8,
      s"PCA + allocation must cut quantization error materially: " +
        s"raw=$eRaw rotated=$eRot allocated=$eAlloc")
    assert(eAlloc < eRot,
      s"allocation must beat the variance-concentrating bare " +
        s"rotation: rotated=$eRot allocated=$eAlloc")
    // OPQ NON-PARAMETRIC on top of the parametric init (the r17
    // verdict's stretch item): the learned rotation + Lloyd
    // alternation is monotone in the training objective, so its
    // error must land BELOW the init's — and the rotation must be a
    // real orthogonal matrix that actually moved off identity
    val (rOpq, opq) = Pq.opqFit(allocated, "vec_id", "ya", m = 4,
      ks = 8, iters = 3, seed = 7)
    val d = rOpq.size
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(k => rOpq(i)(k) * rOpq(j)(k)).sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9,
        s"R must stay orthogonal: row $i · row $j = $dot")
    }
    val moved = (0 until d).flatMap(i => (0 until d).map(j =>
      math.abs(rOpq(i)(j) - (if (i == j) 1.0 else 0.0)))).max
    assert(moved > 0.01,
      s"the learned rotation must move off identity: max|R-I|=$moved")
    val rotFrame = allocated.select($"vec_id",
      Pq.rotate($"ya", rOpq).as("rz"))
    val eOpq = Pq.encode(rotFrame, "rz", opq)
      .agg(sum(Pq.quantErr(col("rz"), col("pq_code"), opq)))
      .head().getDouble(0)
    assert(eOpq < eAlloc,
      s"learned rotation must reconstruct at-or-better than its " +
        s"parametric init: opq=$eOpq alloc=$eAlloc")
  }
}
