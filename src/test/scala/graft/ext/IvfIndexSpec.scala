package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.VersionedTable

/** Incremental IVF maintenance: full probe of the refreshed index must
  * equal brute force over the post-churn corpus, the refresh must be
  * delta-sized (untouched centroids' files survive byte-identical),
  * and the drift metric must recommend retrain exactly when post-build
  * inserts assign materially worse than the build corpus did. */
class IvfIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ivf").toString

  /** Deterministic unit-ish vectors around `center` (seeded). */
  private def vecs(seed: Int, n: Int, dim: Int,
      center: Array[Double], spread: Double): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      center.map(c => (c + rnd.nextGaussian() * spread).toFloat)
    }
  }

  private def corpusDf(rows: Seq[(Long, Array[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  private def brute(corpus: DataFrame, queries: DataFrame,
      k: Int): Set[(Long, Long, Int)] =
    Similarity.bruteForceTopK(
        queries.select(col("vec_id"), col("embedding")),
        corpus.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet

  test("churn (append + delete + update) then refresh: full probe == " +
      "brute force on the post-churn corpus; watermark rides the commit") {
    val (root, idx) = (tmp() + "/corpus", tmp() + "/idx")
    val dim = 8
    val a = vecs(1, 30, dim, Array.fill(dim)(1.0), 0.2)
    val b = vecs(2, 30, dim, Array(5.0, -3.0, 1.0, 0.0, 2.0, -1.0, 4.0, 0.5), 0.2)
    val base = a.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      b.zipWithIndex.map { case (v, i) => (100L + i, v) }
    VersionedTable.create(spark, root, corpusDf(base)) // v1
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 4, idx)
    assert(IvfIndex.watermark(spark, idx) == 1L)
    // churn: new in-distribution vectors, a deleted slice, an update
    val fresh = vecs(3, 10, dim, Array.fill(dim)(1.0), 0.2)
      .zipWithIndex.map { case (v, i) => (200L + i, v) }
    VersionedTable.append(spark, root, corpusDf(fresh)) // v2
    VersionedTable.deleteWhere(spark, root,
      col("vec_id") % 5 === 2, cdf = true) // v3
    VersionedTable.updateWhere(spark, root, col("vec_id") === 3L,
      Map("embedding" -> reverse(col("embedding"))), cdf = true) // v4
    val lv = IvfIndex.refresh(spark, idx)
    assert(IvfIndex.watermark(spark, idx) == 4L)
    // one atomic commit for the whole churn range
    assert(lv == 2L, s"create + one refresh commit, got version $lv")
    // full probe ≡ brute force over the post-churn snapshot
    val corpus = VersionedTable.read(spark, root)
    val queries = corpus.filter(col("vec_id") < 10)
    val got = IvfIndex.probe(queries, idx, "vec_id", "embedding",
      k = 3, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    got // materialized
    val want = brute(corpus, queries, 3)
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    // a second refresh with no corpus motion is a metadata no-op
    assert(IvfIndex.refresh(spark, idx) == lv)
    // in-distribution churn must NOT recommend retrain
    val (buildMean, churnMean, churnN) = IvfIndex.drift(spark, idx)
    // 10 appends − 2 appended-then-deleted (202, 207) + 1 update
    // postimage: drift counts what actually LANDS (net inserts)
    assert(churnN == 9, s"net inserts should be 9, got $churnN")
    assert(!IvfIndex.recommendRetrain(spark, idx),
      s"build=$buildMean churn=$churnMean should be close")
  }

  test("refresh is delta-sized: untouched centroids' files survive " +
      "byte-identical; probes prune unprobed lists' files") {
    val (root, idx) = (tmp() + "/corpus", tmp() + "/idx")
    val dim = 4
    // four tight, well-separated clusters => the sampled quantizer
    // and every assignment are stable
    val centers = Seq(
      Array(1.0, 0.0, 0.0, 0.0), Array(0.0, 1.0, 0.0, 0.0),
      Array(0.0, 0.0, 1.0, 0.0), Array(0.0, 0.0, 0.0, 1.0))
    val base = centers.zipWithIndex.flatMap { case (c, ci) =>
      vecs(10 + ci, 25, dim, c, 0.02).zipWithIndex
        .map { case (v, i) => (ci * 1000L + i, v) }
    }
    VersionedTable.create(spark, root, corpusDf(base))
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 4, idx)
    val lists = s"$idx/lists"
    def filesByCentroid(): Map[Int, Set[String]] =
      VersionedTable.read(spark, lists)
        .select(col("centroid_id"), col("_metadata.file_path").as("f"))
        .distinct().as[(Int, String)].collect()
        .groupBy(_._1).map { case (c, fs) => c -> fs.map(_._2).toSet }
    val before = filesByCentroid()
    assert(before.size == 4, s"all four lists populated: ${before.keySet}")
    // churn ONE list, chosen from the live layout (centroid ids come
    // from a hash-ordered sample, so pick rather than predict): the
    // HIGHEST centroid id — inserts sit right on its weight vector,
    // the delete victim is one of its current members, and the keyed
    // rewrite's range box then covers just that centroid
    val target = before.keySet.max
    val targetW = IvfIndex.centroidsOf(spark, idx)(target).toArray
    val victim = VersionedTable.read(spark, lists)
      .filter(col("centroid_id") === target)
      .select("neighbor_id").as[Long].head()
    VersionedTable.append(spark, root, corpusDf(
      vecs(99, 5, dim, targetW, 0.002).zipWithIndex
        .map { case (v, i) => (5000L + i, v) }))
    VersionedTable.deleteWhere(spark, root, col("vec_id") === victim,
      cdf = true)
    IvfIndex.refresh(spark, idx)
    val after = filesByCentroid()
    val churned = VersionedTable.read(spark, lists)
      .filter(col("neighbor_id") >= 5000L)
      .select("centroid_id").distinct().as[Int].collect().toSet + target
    assert(churned == Set(target),
      s"test setup: inserts strayed off centroid $target: $churned")
    // file-granular contract: the refresh may rewrite only files that
    // HOLD churned keys (range boundaries are sampled, so one file may
    // straddle centroids — that file is legitimately touched); every
    // other file survives byte-identical
    val touchable = before(target)
    val allBefore = before.values.flatten.toSet
    val allAfter = after.values.flatten.toSet
    val untouched = allBefore -- touchable
    assert(untouched.nonEmpty,
      s"test setup: every file holds centroid-$target rows — reseed")
    untouched.foreach { f =>
      assert(allAfter.contains(f),
        s"file $f holds no churned key but was rewritten")
    }
    // the probe's manifest prune reads a strict subset for one list
    val (kept, total) = IvfIndex.pruneAudit(spark, idx, Seq(1))
    assert(kept < total && kept >= 1,
      s"one-centroid probe must prune files: kept=$kept total=$total")
  }

  test("time-travel probes: an as-of probe answers from that version's " +
      "corpus AND its own quantizer generation, across a rebuild") {
    val (root, idx) = (tmp() + "/corpus", tmp() + "/idx")
    val dim = 6
    val base = vecs(21, 30, dim, Array.fill(dim)(1.0), 0.2)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    VersionedTable.create(spark, root, corpusDf(base)) // corpus v1
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 3, idx)
    // churn + refresh => lists v2 reflects corpus v3
    VersionedTable.append(spark, root, corpusDf(
      vecs(22, 8, dim, Array.fill(dim)(1.0), 0.2)
        .zipWithIndex.map { case (v, i) => (300L + i, v) })) // v2
    VersionedTable.deleteWhere(spark, root, col("vec_id") === 4L,
      cdf = true) // v3
    IvfIndex.refresh(spark, idx)
    // retrain => lists v3, a NEW quantizer generation
    IvfIndex.rebuild(spark, idx)
    assert(VersionedTable.currentVersion(spark, s"$idx/lists")
      .contains(3L), "rebuild must be a REPLACE version, not a wipe")
    def probeAt(lv: Option[Long], corpusV: Long): Unit = {
      val corpus = VersionedTable.read(spark, root, Some(corpusV))
      val queries = corpus.filter(col("vec_id") < 6)
      val got = IvfIndex.probe(queries, idx, "vec_id", "embedding",
        k = 3, nprobe = 3, version = lv)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .as[(Long, Long, Int)].collect().toSet
      assert(got == brute(corpus, queries, 3),
        s"as-of probe at lists $lv must equal brute force at corpus " +
          s"$corpusV")
    }
    probeAt(Some(1L), 1L) // the build snapshot, original quantizer
    probeAt(Some(2L), 3L) // post-churn, original quantizer
    probeAt(None, 3L) // current = the rebuilt generation
    // and the maintained lane keeps working after the replace rebuild
    VersionedTable.append(spark, root, corpusDf(
      vecs(23, 4, dim, Array.fill(dim)(1.0), 0.2)
        .zipWithIndex.map { case (v, i) => (400L + i, v) })) // v4
    IvfIndex.refresh(spark, idx)
    assert(IvfIndex.watermark(spark, idx) == 4L)
    probeAt(None, 4L)
  }

  test("drift: out-of-distribution inserts push the churn mean down " +
      "and recommendRetrain flips; rebuild resets the counters") {
    val (root, idx) = (tmp() + "/corpus", tmp() + "/idx")
    val dim = 6
    val base = vecs(5, 40, dim, Array.fill(dim)(1.0), 0.05)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    VersionedTable.create(spark, root, corpusDf(base))
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 2, idx)
    // inserts from a direction the quantizer never saw: alternating
    // signs is near-orthogonal to the all-ones build cluster
    val ood = vecs(6, 20, dim, Array(1.0, -1.0, 1.0, -1.0, 1.0, -1.0), 0.05)
      .zipWithIndex.map { case (v, i) => (900L + i, v) }
    VersionedTable.append(spark, root, corpusDf(ood))
    IvfIndex.refresh(spark, idx)
    val (buildMean, churnMean, churnN) = IvfIndex.drift(spark, idx)
    assert(churnN == 20)
    assert(buildMean - churnMean > 0.2,
      s"OOD churn must drag the mean: build=$buildMean churn=$churnMean")
    assert(IvfIndex.recommendRetrain(spark, idx))
    // the answer to the signal: a deliberate rebuild over the current
    // corpus — counters reset, watermark jumps to the corpus head
    IvfIndex.rebuild(spark, idx)
    val (b2, _, n2) = IvfIndex.drift(spark, idx)
    assert(n2 == 0 && b2 > 0.5,
      "rebuild must retrain over the full current corpus and reset drift")
    assert(!IvfIndex.recommendRetrain(spark, idx))
    assert(IvfIndex.watermark(spark, idx) == 2L)
    // and the rebuilt index still answers exactly
    val corpus = VersionedTable.read(spark, root)
    val queries = corpus.filter(col("vec_id") >= 900L && col("vec_id") < 905L)
    val got = IvfIndex.probe(queries, idx, "vec_id", "embedding",
      k = 2, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute(corpus, queries, 2))
  }

  test("rebuild crossing a refresh: the stale old-generation payload " +
      "refuses (StaleRefresh) and refresh recomputes against the new " +
      "generation") {
    // the maintainOnChanges deployment shape: a live refresher races
    // an operator-issued rebuild. The refresher's delta was ASSIGNED
    // against generation-1 centroids; rebuild lands first via
    // VersionedTable.replace, which resets the manifest meta — and
    // with it the stream.ivf_refresh.batch replay guard — so without
    // the expectMeta pins the frozen payload would look brand-new and
    // land gen-1 centroid ids into the gen-2 lists (plus silently
    // regress the watermark and drift counters via extraMeta). The
    // seam interleaves the rebuild deterministically in that window.
    val (root, idx) = (tmp() + "/corpus", tmp() + "/idx")
    val dim = 8
    val base = (vecs(7, 30, dim, Array.fill(dim)(1.0), 0.2)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      vecs(8, 30, dim, Array(5.0, -3.0, 1.0, 0.0, 2.0, -1.0, 4.0, 0.5), 0.2)
        .zipWithIndex.map { case (v, i) => (100L + i, v) })
    VersionedTable.create(spark, root, corpusDf(base)) // v1
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 4, idx)
    def genDir(): String =
      VersionedTable.metaOf(spark, idx + "/lists")("ivf.centroids_dir")
    val gen1 = genDir()
    val fresh = vecs(9, 12, dim, Array.fill(dim)(1.0), 0.2)
      .zipWithIndex.map { case (v, i) => (200L + i, v) }
    VersionedTable.append(spark, root, corpusDf(fresh)) // v2
    var fired = 0
    IvfIndex.refresh(spark, idx, { () =>
      if (fired == 0) { fired += 1; IvfIndex.rebuild(spark, idx) }
    })
    // the seam fired exactly once: attempt 1 computed its delta, the
    // rebuild crossed it, the pinned commit threw StaleRefresh, and
    // the recompute (attempt 2) saw the rebuilt watermark already at
    // the corpus head — a no-op that never reaches the seam again
    assert(fired == 1, s"seam fired $fired times")
    // the stale payload never landed: the rebuild's reset drift
    // counters survive (a landed gen-1 extraMeta would set churnN=12
    // and regress the watermark pre-rebuild)
    val (_, _, churnN) = IvfIndex.drift(spark, idx)
    assert(churnN == 0L, s"stale refresh counters landed: churnN=$churnN")
    assert(IvfIndex.watermark(spark, idx) == 2L)
    assert(genDir() != gen1,
      "rebuild must have installed a new quantizer generation")
    // and the index answers exactly over the post-churn corpus
    val corpus = VersionedTable.read(spark, root)
    val queries = corpus.filter(col("vec_id") >= 200L && col("vec_id") < 206L)
    val got = IvfIndex.probe(queries, idx, "vec_id", "embedding",
      k = 3, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute(corpus, queries, 3))
    // a crossed REFRESH converges the same way: churn again, and let
    // a concurrent same-delta refresher win inside the seam window —
    // the loser's commit is a pure replay (guard checked BEFORE the
    // pins) and returns the winner's version untouched
    VersionedTable.append(spark, root, corpusDf(
      vecs(10, 5, dim, Array.fill(dim)(1.0), 0.2)
        .zipWithIndex.map { case (v, i) => (300L + i, v) })) // v3
    var fired2 = 0
    val lv = IvfIndex.refresh(spark, idx, { () =>
      if (fired2 == 0) { fired2 += 1; IvfIndex.refresh(spark, idx) }
    })
    assert(fired2 == 1)
    assert(lv == VersionedTable.currentVersion(spark,
      idx + "/lists").get)
    assert(IvfIndex.watermark(spark, idx) == 3L)
    val (_, _, churnN2) = IvfIndex.drift(spark, idx)
    assert(churnN2 == 5L, s"replay must count the delta once: $churnN2")
  }

  test("maintain autopilot: drift-gated rebuild fires exactly once; " +
      "file-count-gated compaction folds refresh accretion and keeps " +
      "the prune") {
    val (root, idx) = (tmp() + "/corpus", tmp() + "/idx")
    val dim = 6
    val base = vecs(11, 40, dim, Array.fill(dim)(1.0), 0.05)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    VersionedTable.create(spark, root, corpusDf(base))
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 2, idx)
    // in-distribution churn: maintain refreshes, does NOT retrain
    VersionedTable.append(spark, root, corpusDf(
      vecs(12, 10, dim, Array.fill(dim)(1.0), 0.05)
        .zipWithIndex.map { case (v, i) => (500L + i, v) }))
    val m1 = IvfIndex.maintain(spark, idx)
    assert(!m1.rebuilt && !m1.compacted &&
      IvfIndex.watermark(spark, idx) == 2L)
    // OOD churn: ONE maintain call refreshes AND retrains; the next
    // is a no-op (rebuild reset the drift counters)
    VersionedTable.append(spark, root, corpusDf(
      vecs(13, 20, dim, Array(1.0, -1.0, 1.0, -1.0, 1.0, -1.0), 0.05)
        .zipWithIndex.map { case (v, i) => (900L + i, v) }))
    val m2 = IvfIndex.maintain(spark, idx)
    assert(m2.rebuilt, "OOD churn must trip the drift-gated retrain")
    val m3 = IvfIndex.maintain(spark, idx)
    assert(!m3.rebuilt && m3.version == m2.version,
      "a maintained index with no corpus motion must not move")
    // accrete small files with several single-row refreshes, then let
    // the file-count gate trigger a clustering-preserving fold
    (0 until 4).foreach { i =>
      VersionedTable.append(spark, root, corpusDf(
        vecs(20 + i, 1, dim, Array.fill(dim)(1.0), 0.05)
          .map(v => (1000L + i, v))))
      IvfIndex.refresh(spark, idx)
    }
    val filesBefore = VersionedTable.fileCount(spark, idx + "/lists")
    val m4 = IvfIndex.maintain(spark, idx, compactAboveFiles = 3)
    assert(m4.compacted && !m4.rebuilt,
      s"file-count gate must compact: $filesBefore files before")
    assert(VersionedTable.fileCount(spark, idx + "/lists") < filesBefore)
    val (kept, total) = IvfIndex.pruneAudit(spark, idx, Seq(0))
    assert(kept < total,
      s"clustering must survive maintain's compaction: $kept/$total")
    // and the maintained+compacted index still answers exactly
    val corpus = VersionedTable.read(spark, root)
    val queries = corpus.filter(col("vec_id") < 5)
    val got = IvfIndex.probe(queries, idx, "vec_id", "embedding",
      k = 3, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute(corpus, queries, 3))
  }

  test("IVF-PQ: posting lists carry codes, maintenance survives churn " +
      "and rebuild, full probe with a covering pool stays exact, and " +
      "time travel decodes with each generation's codebooks") {
    val (root, idx) = (tmp() + "/corpus", tmp() + "/idx")
    val dim = 8
    val base = (vecs(31, 30, dim, Array.fill(dim)(1.0), 0.2)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      vecs(32, 30, dim, Array(5.0, -3.0, 1.0, 0.0, 2.0, -1.0, 4.0, 0.5), 0.2)
        .zipWithIndex.map { case (v, i) => (100L + i, v) })
    VersionedTable.create(spark, root, corpusDf(base)) // v1
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 4, idx,
      pq = Some((4, 8)))
    // the compression is structural: the lists carry codes, NO vectors
    val lists = VersionedTable.read(spark, idx + "/lists")
    assert(lists.columns.toSet ==
      Set("centroid_id", "neighbor_id", "pq_code"),
      s"pq lists must not store vectors: ${lists.columns.mkString(",")}")
    // churn every shape, refresh: the delta encodes against the frozen
    // codebooks and the full probe stays exact (re-rank is exact)
    VersionedTable.append(spark, root, corpusDf(
      vecs(33, 10, dim, Array.fill(dim)(1.0), 0.2)
        .zipWithIndex.map { case (v, i) => (200L + i, v) })) // v2
    VersionedTable.deleteWhere(spark, root,
      col("vec_id") % 5 === 2, cdf = true) // v3
    VersionedTable.updateWhere(spark, root, col("vec_id") === 3L,
      Map("embedding" -> reverse(col("embedding"))), cdf = true) // v4
    assert(IvfIndex.refresh(spark, idx) == 2L)
    assert(IvfIndex.watermark(spark, idx) == 4L)
    val corpus = VersionedTable.read(spark, root)
    val queries = corpus.filter(col("vec_id") < 10)
    def fullProbe(version: Option[Long] = None) =
      IvfIndex.probe(queries, idx, "vec_id", "embedding",
          k = 3, nprobe = 4, version = version, pool = Int.MaxValue)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .as[(Long, Long, Int)].collect().toSet
    assert(fullProbe() == brute(corpus, queries, 3))
    // probed files prune like the raw-vector index
    val (kept, total) = IvfIndex.pruneAudit(spark, idx, Seq(0))
    assert(kept < total, s"pq lists must file-prune: $kept/$total")
    // a bounded pool returns exactly k rows per query, all drawn from
    // the probed candidates (the ADC preselection contract)
    val bounded = IvfIndex.probe(queries, idx, "vec_id", "embedding",
      k = 3, nprobe = 4, pool = 12)
    assert(bounded.groupBy("query_id").count()
      .filter(col("count") =!= 3).isEmpty)
    // rebuild retrains BOTH artifacts; the rebuilt index stays exact
    IvfIndex.rebuild(spark, idx)
    assert(fullProbe() == brute(corpus, queries, 3))
    // time travel: the pre-rebuild version decodes with ITS codebooks
    // and re-ranks against ITS watermark corpus (v4 == post-churn)
    assert(fullProbe(version = Some(2L)) == brute(corpus, queries, 3))
    // FILTERED search on both index modes: full probe over a predicate
    // == brute force over the filtered corpus, and the raw-vector and
    // PQ paths agree with each other exactly
    val rawIdx = tmp() + "/raw_idx"
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 4,
      rawIdx)
    val pred = col("vec_id") % 3 === 1
    def filteredProbe(ix: String) =
      IvfIndex.probe(queries, ix, "vec_id", "embedding", k = 3,
          nprobe = 4, pool = Int.MaxValue, where = Some(pred))
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .as[(Long, Long, Int)].collect().toSet
    val wantFiltered = brute(corpus.filter(pred), queries, 3)
    assert(filteredProbe(idx) == wantFiltered,
      "pq filtered probe must equal brute force over the filtered corpus")
    assert(filteredProbe(rawIdx) == wantFiltered,
      "raw filtered probe must equal brute force over the filtered corpus")
  }

  test("residual codes reconstruct better than raw-vector codes: " +
      "bounded-pool probe recall does not regress, exactness holds " +
      "either way") {
    // two PQ indexes over the same clustered corpus, identical
    // geometry, one residual (the default/canonical layout) and one
    // raw — residual codes quantize v − centroid, so a tiny codebook
    // spends its entire budget on within-cluster structure
    val (root, resIdx, rawIdx) =
      (tmp() + "/corpus", tmp() + "/res", tmp() + "/raw")
    val dim = 8
    val base = (vecs(41, 40, dim, Array.fill(dim)(1.0), 0.25)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      vecs(42, 40, dim, Array(5.0, -3.0, 1.0, 0.0, 2.0, -1.0, 4.0, 0.5), 0.25)
        .zipWithIndex.map { case (v, i) => (100L + i, v) } ++
      vecs(43, 20, dim, Array.tabulate(dim)(i => 1.0 + i * 0.4), 0.25)
        .zipWithIndex.map { case (v, i) => (200L + i, v) })
    VersionedTable.create(spark, root, corpusDf(base))
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 4,
      resIdx, pq = Some((4, 8))) // residual default
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 4,
      rawIdx, pq = Some((4, 8)), pqResidual = false)
    val corpus = VersionedTable.read(spark, root)
    val queries = corpus.filter(col("vec_id").isin(
      1L, 7L, 103L, 108L, 205L, 211L))
    val truth = brute(corpus, queries, 5)
      .map { case (q, n, _) => (q, n) }
    def poolRecall(ix: String): Double = {
      val pool = IvfIndex.probe(queries, ix, "vec_id", "embedding",
          k = 20, nprobe = 4, pool = 20)
        .select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().toSet
      truth.count(pool.contains).toDouble / truth.size
    }
    val (rRes, rRaw) = (poolRecall(resIdx), poolRecall(rawIdx))
    assert(rRes >= rRaw,
      s"residual codes must not preselect worse: res=$rRes raw=$rRaw")
    assert(rRes >= 0.9, s"residual pool recall too low: $rRes")
    // and both stay exact under the covering-pool contract
    def full(ix: String) = IvfIndex.probe(queries, ix, "vec_id",
        "embedding", k = 5, nprobe = 4, pool = Int.MaxValue)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    val want = brute(corpus, queries, 5)
    assert(full(resIdx) == want && full(rawIdx) == want)
  }

  test("tuneNprobe: the ladder is monotone against the index's own " +
      "full probe, the pick is the minimal rung clearing the target, " +
      "and the PQ mode tunes through the same loop") {
    val (root, idx) = (tmp() + "/corpus", tmp() + "/idx")
    val dim = 6
    // four separated clusters: small nprobe misses cross-cluster
    // neighbors, full probe is exact — a real tuning curve
    val centers = Seq(
      Array(1.0, 1.0, 1.0, 1.0, 1.0, 1.0),
      Array(5.0, -3.0, 1.0, 0.0, 2.0, -1.0),
      Array(-1.0, 4.0, -2.0, 3.0, 0.5, 1.5),
      Array(0.0, 0.0, 5.0, -5.0, 1.0, 2.0))
    val base = centers.zipWithIndex.flatMap { case (c, ci) =>
      vecs(81 + ci, 25, dim, c, 0.4).zipWithIndex
        .map { case (v, i) => (ci * 1000L + i, v) }
    }
    VersionedTable.create(spark, root, corpusDf(base))
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 4, idx)
    // churn + refresh first: tuning runs against the MAINTAINED state
    VersionedTable.append(spark, root, corpusDf(
      vecs(89, 8, dim, centers(1), 0.4).zipWithIndex
        .map { case (v, i) => (5000L + i, v) }))
    IvfIndex.refresh(spark, idx)
    val queries = VersionedTable.read(spark, root)
      .filter(col("vec_id").isin(1L, 7L, 1003L, 2005L, 3011L, 5001L))
    val (pick, lf) = IvfIndex.tuneNprobe(queries, idx, "vec_id",
      "embedding", k = 5, target = 1.0)
    val rows = lf.select(col("nprobe"), col("recall"))
      .as[(Int, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4), s"doubling ladder: " +
      rows.map(_._1).mkString(","))
    assert(rows.last._2 == 1.0,
      s"the full rung must be exact against itself: ${rows.last._2}")
    assert(rows.sliding(2).forall {
      case Array((_, r0), (_, r1)) => r1 >= r0
      case _ => true
    }, s"monotone ladder: ${rows.mkString(",")}")
    assert(rows.filter(_._1 < pick).forall(_._2 < 1.0) &&
      rows.find(_._1 == pick).exists(_._2 >= 1.0),
      s"pick $pick must be minimal: ${rows.mkString(",")}")
    // a relaxed target picks an at-most-equal rung
    val (pickLoose, _) = IvfIndex.tuneNprobe(queries, idx, "vec_id",
      "embedding", k = 5, target = 0.5)
    assert(pickLoose <= pick, s"looser target, smaller rung: " +
      s"$pickLoose vs $pick")
    // the PQ mode rides the same loop (reference forced covering)
    val pqIdx = tmp() + "/pq"
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 4,
      pqIdx, pq = Some((3, 8)))
    val (pickPq, lfPq) = IvfIndex.tuneNprobe(queries, pqIdx, "vec_id",
      "embedding", k = 5, target = 1.0, pool = Int.MaxValue)
    val rowsPq = lfPq.select(col("nprobe"), col("recall"))
      .as[(Int, Double)].collect().sortBy(_._1)
    assert(rowsPq.last._2 == 1.0 && pickPq <= 4,
      s"covering-pool PQ rungs must reach exactness: " +
        rowsPq.mkString(","))
  }

  test("OPQ rotation in the index build: exactness holds through " +
      "rotation across churn, rebuild, and time travel; the learned " +
      "generation reconstructs at-or-better than the plain seeded fit") {
    val (root, plain, opq) =
      (tmp() + "/corpus", tmp() + "/plain", tmp() + "/opq")
    val dim = 8
    // correlated data (adjacent dims track each other at different
    // scales) — the regime a learned rotation pays in; the ≤ cert is
    // monotone-descent math and holds on any data
    val rnd = new scala.util.Random(61)
    val base = (0 until 60).map { i =>
      val g = Array.fill(4)(rnd.nextGaussian())
      (i.toLong, Array(
        g(0), 0.9 * g(0) + 0.1 * g(1), 3.0 * g(1),
        0.8 * g(1) + 0.2 * g(2), g(2), 0.25 * g(3),
        2.0 * g(3), 0.7 * g(3) + 0.3 * g(0)).map(_.toFloat))
    }
    VersionedTable.create(spark, root, corpusDf(base))
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 2,
      plain, pq = Some((4, 16)))
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 2,
      opq, pq = Some((4, 16)), pqOpqIters = 2)
    // the learned generation's build-time reconstruction error is
    // at-or-below the plain seeded fit's (same seed, same sample —
    // OPQ descends from exactly that init)
    val (errPlain, _, _) = IvfIndex.pqDrift(spark, plain)
    val (errOpq, _, _) = IvfIndex.pqDrift(spark, opq)
    assert(errOpq <= errPlain * (1 + 1e-9) + 1e-12,
      s"opq must reconstruct at-or-better: $errOpq vs $errPlain")
    // exactness through the rotation: covering-pool probe ≡ brute
    // force (the q192 contract, now with rotated ADC legs)
    val corpus = VersionedTable.read(spark, root)
    val queries = corpus.filter(col("vec_id") < 4)
    def want(c: DataFrame) = brute(c, c.filter(col("vec_id") < 4), 3)
    def got(v: Option[Long] = None, c: DataFrame = corpus) =
      IvfIndex.probe(c.filter(col("vec_id") < 4), opq, "vec_id",
          "embedding", k = 3, nprobe = 2, version = v,
          pool = Int.MaxValue)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .as[(Long, Long, Int)].collect().toSet
    assert(got() == want(corpus), "covering probe must stay exact")
    // a bounded pool still answers through the rotated ADC ranking
    assert(IvfIndex.probe(queries, opq, "vec_id", "embedding", k = 3,
      nprobe = 2, pool = 10).count() > 0)
    // churn + refresh: the delta encodes in the SAME rotated space
    // (drift counters accumulate there) and exactness survives
    VersionedTable.append(spark, root, corpusDf(
      (0 until 7).map { i =>
        val g = Array.fill(4)(rnd.nextGaussian())
        (700L + i, Array(
          g(0), 0.9 * g(0) + 0.1 * g(1), 3.0 * g(1),
          0.8 * g(1) + 0.2 * g(2), g(2), 0.25 * g(3),
          2.0 * g(3), 0.7 * g(3) + 0.3 * g(0)).map(_.toFloat))
      }))
    IvfIndex.refresh(spark, opq)
    val (_, churnErr, churnN) = IvfIndex.pqDrift(spark, opq)
    assert(churnN == 7L && !churnErr.isNaN,
      s"churn must accumulate rotated-space error: $churnN / $churnErr")
    val corpus2 = VersionedTable.read(spark, root)
    assert(got(c = corpus2) == want(corpus2),
      "exactness must survive churn through the rotation")
    // rebuild: the new generation retrains quantizer + codebooks +
    // rotation together; the OLD generation (with ITS rotation) still
    // serves time travel
    def pqDir(v: Option[Long]): String =
      VersionedTable.metaOf(spark, opq + "/lists", v)("ivf.pq_dir")
    val prevLists = VersionedTable.currentVersion(spark,
      opq + "/lists").get
    val gen1 = pqDir(None)
    IvfIndex.rebuild(spark, opq)
    assert(pqDir(None) != gen1, "rebuild must land a new generation")
    assert(got(c = corpus2) == want(corpus2),
      "the rebuilt rotated generation must stay exact")
    assert(got(v = Some(prevLists), c = corpus2) == want(corpus2),
      "the pre-rebuild generation must keep serving with its own " +
        "rotation")
  }

  test("tuneOperatingPoint: the (nprobe, pool) grid measures the " +
      "DEPLOYED ADC + re-rank read; pool axis is monotone; the pick " +
      "is the minimal-cost clearing cell; raw indexes are refused") {
    val (root, idx) = (tmp() + "/corpus", tmp() + "/pq")
    val dim = 6
    val centers = Seq(
      Array(1.0, 1.0, 1.0, 1.0, 1.0, 1.0),
      Array(5.0, -3.0, 1.0, 0.0, 2.0, -1.0),
      Array(-1.0, 4.0, -2.0, 3.0, 0.5, 1.5),
      Array(0.0, 0.0, 5.0, -5.0, 1.0, 2.0))
    val base = centers.zipWithIndex.flatMap { case (c, ci) =>
      vecs(91 + ci, 25, dim, c, 0.4).zipWithIndex
        .map { case (v, i) => (ci * 1000L + i, v) }
    }
    VersionedTable.create(spark, root, corpusDf(base))
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 4,
      idx, pq = Some((3, 8)))
    val queries = VersionedTable.read(spark, root)
      .filter(col("vec_id").isin(1L, 7L, 1003L, 2005L, 3011L))
    val ((np, p), grid) = IvfIndex.tuneOperatingPoint(queries, idx,
      "vec_id", "embedding", k = 5, target = 1.0,
      nprobes = Seq(1, 2, 4), pools = Seq(5, 20, 100))
    val cells = grid.select("nprobe", "pool", "recall", "cost",
        "meets_target", "chosen")
      .as[(Int, Int, Double, Long, Boolean, Boolean)].collect()
    assert(cells.length == 9, "the full grid must be measured")
    // pool axis monotone at every nprobe (the structural requirement
    // the method enforces — re-checked from the returned frame)
    Seq(1, 2, 4).foreach { n =>
      val rs = cells.filter(_._1 == n).sortBy(_._2).map(_._3)
      assert(rs.sliding(2).forall {
        case Array(a, b) => b >= a
        case _ => true
      }, s"pool axis at nprobe=$n: ${rs.mkString(",")}")
    }
    // the covering corner reaches exactness on this well-separated
    // corpus, so a grid pick exists and is the cost argmin
    val pc = cells.find(c => c._1 == np && c._2 == p)
    assert(pc.exists(_._5), s"the pick must clear the target: ($np, $p)")
    assert(cells.filter(_._4 < pc.get._4).forall(!_._5),
      "every cheaper cell must miss the target")
    assert(cells.count(_._6) == 1 && pc.exists(_._6),
      "exactly the picked cell is flagged chosen")
    // a starved pool at the full probe must hurt recall vs the
    // covering pool (the effect tuneNprobe could not see)
    val full5 = cells.find(c => c._1 == 4 && c._2 == 5).get._3
    val full100 = cells.find(c => c._1 == 4 && c._2 == 100).get._3
    assert(full100 == 1.0, s"covering corner must be exact: $full100")
    assert(full5 <= full100, s"pool starvation: $full5 vs $full100")
    // an impossible target falls back to the covering configuration
    // on a grid that cannot clear it
    val ((fnp, fp), _) = IvfIndex.tuneOperatingPoint(queries, idx,
      "vec_id", "embedding", k = 5, target = 1.0,
      nprobes = Seq(1), pools = Seq(5))
    if (fnp == 4) assert(fp == Int.MaxValue,
      "a non-grid fallback must be the covering configuration")
    // a raw-vector index has no deployed-PQ path to tune
    val rawIdx = tmp() + "/raw"
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 4,
      rawIdx)
    val e = intercept[IllegalArgumentException](
      IvfIndex.tuneOperatingPoint(queries, rawIdx, "vec_id",
        "embedding", k = 5, target = 1.0, nprobes = Seq(1),
        pools = Seq(5)))
    assert(e.getMessage.contains("tuneNprobe"), e.getMessage)
  }

  test("hot-centroid skew: a centroid holding ~50% of the corpus " +
      "sub-splits into bounded files, the prune survives, refresh " +
      "stays delta-sized, and answers stay exact") {
    val (root, idx) = (tmp() + "/corpus", tmp() + "/idx")
    val dim = 6
    // heavy skew: 120 rows on one tight direction, 40 spread across
    // three others — one posting list would hold half the corpus
    val hot = vecs(71, 120, dim, Array.fill(dim)(1.0), 0.02)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val cold = Seq(
      Array(5.0, -3.0, 1.0, 0.0, 2.0, -1.0),
      Array(-1.0, 4.0, -2.0, 3.0, 0.5, 1.5),
      Array(0.0, 0.0, 5.0, -5.0, 1.0, 2.0)).zipWithIndex.flatMap {
      case (c, ci) => vecs(72 + ci, 14, dim, c, 0.02).zipWithIndex
        .map { case (v, i) => (1000L * (ci + 1) + i, v) }
    }
    VersionedTable.create(spark, root, corpusDf(hot ++ cold))
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 4, idx,
      rowsPerFile = 30L)
    val lists = s"$idx/lists"
    // per-file row counts are CAPPED: the hot list spans several
    // bounded files instead of one giant rewrite/probe unit (range
    // boundaries are sampled, so allow 2x slop over the target)
    def fileRows(): Map[String, Long] =
      VersionedTable.read(spark, lists)
        .groupBy(col("_metadata.file_path")).count()
        .as[(String, Long)].collect().toMap
    val sizes = fileRows()
    assert(sizes.size >= 6,
      s"162 rows at 30/file must sub-split past nlist=4: ${sizes.size}")
    assert(sizes.values.max <= 60,
      s"per-file rows must stay bounded under skew: ${sizes.values.max}")
    // the hot centroid's rows really span several files
    val hotCentroid = VersionedTable.read(spark, lists)
      .groupBy("centroid_id").count()
      .orderBy(col("count").desc).as[(Int, Long)].head()._1
    val hotFiles = VersionedTable.read(spark, lists)
      .filter(col("centroid_id") === hotCentroid)
      .select(col("_metadata.file_path")).distinct().count()
    assert(hotFiles >= 3,
      s"the hot list must sub-split across files: $hotFiles")
    // the centroid prune is intact: probing ONE cold centroid keeps a
    // strict subset of files
    val coldCentroid = VersionedTable.read(spark, lists)
      .groupBy("centroid_id").count()
      .orderBy(col("count").asc).as[(Int, Long)].head()._1
    val (kept, total) = IvfIndex.pruneAudit(spark, idx, Seq(coldCentroid))
    assert(kept < total && kept >= 1,
      s"sub-splitting must keep the prune: $kept/$total")
    // and probing the HOT centroid must not read the cold files
    val (keptHot, totalHot) = IvfIndex.pruneAudit(spark, idx,
      Seq(hotCentroid))
    assert(keptHot < totalHot,
      s"hot-centroid probes must still prune: $keptHot/$totalHot")
    // refresh stays delta-sized: churn the hot centroid; only files
    // holding churned keys may be rewritten, and the sub-split layout
    // keeps each such file bounded
    VersionedTable.append(spark, root, corpusDf(
      vecs(79, 10, dim, Array.fill(dim)(1.0), 0.02).zipWithIndex
        .map { case (v, i) => (5000L + i, v) }))
    IvfIndex.refresh(spark, idx)
    val sizesAfter = fileRows()
    assert(sizesAfter.values.max <= 60,
      s"refresh must preserve the cap: ${sizesAfter.values.max}")
    // exactness end to end on the skewed layout
    val corpus = VersionedTable.read(spark, root)
    val queries = corpus.filter(col("vec_id").isin(1L, 2L, 1001L, 3003L))
    val got = IvfIndex.probe(queries, idx, "vec_id", "embedding",
        k = 3, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute(corpus, queries, 3))
    // compaction under the same policy: folding small files must not
    // weld the hot centroid back into one giant file
    IvfIndex.compact(spark, idx, smallFileBytes = 1L << 20)
    val sizesCompacted = fileRows()
    assert(sizesCompacted.values.max <= 60,
      s"compaction must hold the cap: ${sizesCompacted.values.max}")
    val (keptC, totalC) = IvfIndex.pruneAudit(spark, idx,
      Seq(coldCentroid))
    assert(keptC < totalC, "compaction must keep the prune")
    val got2 = IvfIndex.probe(queries, idx, "vec_id", "embedding",
        k = 3, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got2 == got, "layout work must not change answers")
  }

  test("codebook drift: churn in-distribution for the quantizer but " +
      "drifting for the codebooks trips ONLY the reconstruction-error " +
      "signal; rebuild resets it and re-certifies bounded-pool recall") {
    val (root, idx) = (tmp() + "/corpus", tmp() + "/idx")
    val dim = 8
    // two directions; residual magnitudes small at build time
    val base = (vecs(61, 40, dim, Array.fill(dim)(1.0), 0.1)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      vecs(62, 40, dim, Array(5.0, -3.0, 1.0, 0.0, 2.0, -1.0, 4.0, 0.5), 0.1)
        .zipWithIndex.map { case (v, i) => (100L + i, v) })
    VersionedTable.create(spark, root, corpusDf(base)) // v1
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 2, idx,
      pq = Some((4, 8)))
    val (bErr0, _, n0) = IvfIndex.pqDrift(spark, idx)
    assert(n0 == 0 && bErr0 >= 0.0, "fresh index: no churn counters")
    // churn: the SAME directions scaled 8x — cosine to every centroid
    // is unchanged (scale-invariant), so the assignment signal stays
    // flat; the residuals v−c blow up 8x, so the frozen codebooks
    // reconstruct the delta badly — exactly the invisible case
    val churn = base.take(30).map { case (id, v) =>
      (2000L + id, v.map(x => x * 8.0f)) }
    VersionedTable.append(spark, root, corpusDf(churn)) // v2
    IvfIndex.refresh(spark, idx)
    val (buildMean, churnMean, churnN) = IvfIndex.drift(spark, idx)
    assert(churnN == 30)
    assert(buildMean - churnMean < 0.05,
      s"assignment cosine must stay flat (scale-invariant): " +
        s"build=$buildMean churn=$churnMean")
    val (bErr, cErr, cN) = IvfIndex.pqDrift(spark, idx)
    assert(cN == 30 && cErr > bErr * 2.0,
      s"8x-scaled residuals must blow the reconstruction error: " +
        s"build=$bErr churn=$cErr")
    // the OLD signal alone would have slept through it; the combined
    // recommendation trips on the pq leg
    assert(IvfIndex.recommendRetrain(spark, idx),
      "codebook drift must recommend retrain")
    assert(!IvfIndex.recommendRetrain(spark, idx,
      pqErrFactor = Double.MaxValue),
      "with the pq leg disabled the assignment signal must NOT trip — " +
        "this is the churn shape the r17 verdict called invisible")
    // maintain answers the signal with a rebuild; counters reset and
    // the rebuilt codebooks cover the new distribution
    val m = IvfIndex.maintain(spark, idx)
    assert(m.rebuilt, "maintain must retrain on the pq signal")
    val (_, _, nAfter) = IvfIndex.pqDrift(spark, idx)
    assert(nAfter == 0, "rebuild must reset the pq churn counters")
    assert(!IvfIndex.recommendRetrain(spark, idx))
    // re-certify: bounded-pool probe recall against brute force over
    // the post-rebuild corpus (pool covers generously; recall == 1)
    val corpus = VersionedTable.read(spark, root)
    val queries = corpus.filter(col("vec_id") >= 2000L &&
      col("vec_id") < 2006L)
    val got = IvfIndex.probe(queries, idx, "vec_id", "embedding",
        k = 3, nprobe = 2, pool = 200)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == brute(corpus, queries, 3),
      "rebuilt codebooks must re-certify bounded-pool exactness here")
    // a raw-vector index refuses the pq drift question loudly
    val rawIdx = tmp() + "/raw"
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 2, rawIdx)
    intercept[IllegalArgumentException](IvfIndex.pqDrift(spark, rawIdx))
  }

  test("composition: an as-of FILTERED probe of a PQ index answers " +
      "from the historical filtered corpus") {
    // the three probe axes — time travel, predicate, compressed
    // lists — are one code path, so their composition must hold: ask
    // at the pre-churn version with a predicate, on residual codes
    val (root, idx) = (tmp() + "/corpus", tmp() + "/idx")
    val dim = 8
    val base = (vecs(51, 30, dim, Array.fill(dim)(1.0), 0.2)
        .zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      vecs(52, 30, dim, Array(5.0, -3.0, 1.0, 0.0, 2.0, -1.0, 4.0, 0.5), 0.2)
        .zipWithIndex.map { case (v, i) => (100L + i, v) })
    VersionedTable.create(spark, root, corpusDf(base)) // corpus v1
    IvfIndex.create(spark, root, "vec_id", "embedding", nlist = 4, idx,
      pq = Some((4, 8))) // lists v1, wm 1
    VersionedTable.append(spark, root, corpusDf(
      vecs(53, 10, dim, Array.fill(dim)(1.0), 0.2)
        .zipWithIndex.map { case (v, i) => (200L + i, v) })) // v2
    IvfIndex.refresh(spark, idx) // lists v2, wm 2  <- the pivot
    VersionedTable.deleteWhere(spark, root, col("vec_id") % 4 === 1,
      cdf = true) // v3
    IvfIndex.refresh(spark, idx) // lists v3, wm 3
    val pred = col("vec_id") % 3 === 1
    val histCorpus = VersionedTable.read(spark, root, Some(2L))
    val queries = histCorpus.filter(col("vec_id") < 6)
    val got = IvfIndex.probeAsOf(queries, idx, "vec_id", "embedding",
        k = 3, nprobe = 4, corpusVersion = 2L,
        pool = Int.MaxValue, where = Some(pred))
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    // the truth: filtered HISTORICAL corpus — rows deleted at v3
    // (e.g. 13, 25: % 4 == 1 AND % 3 == 1) must still be answerable
    val want = brute(histCorpus.filter(pred), queries, 3)
    assert(got == want, s"missing=${want -- got} extra=${got -- want}")
    val sawDeleted = got.exists { case (_, n, _) => n % 4 == 1 }
    assert(sawDeleted,
      "the as-of answer should surface at least one later-deleted row " +
        "(otherwise this spec is not exercising time travel)")
    // a layout-only compaction must not confuse the as-of walk (it
    // carries the watermark meta — the Bm25IndexSpec twin)
    IvfIndex.compact(spark, idx, smallFileBytes = 1L << 20)
    val got2 = IvfIndex.probeAsOf(queries, idx, "vec_id", "embedding",
        k = 3, nprobe = 4, corpusVersion = 2L,
        pool = Int.MaxValue, where = Some(pred))
      .select(col("query_id"), col("neighbor_id"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got2 == want,
      "as-of filtered probes must survive a compaction commit")
  }
}
