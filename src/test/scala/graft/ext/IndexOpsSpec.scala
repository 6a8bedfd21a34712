package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.VersionedTable

/** Operational hygiene of the maintained indexes (IvfIndex /
  * Bm25Index) under sustained churn: compaction folds refresh-accreted
  * small files while preserving the clustered layout (pruning and
  * answers unchanged, downstream stats views skip the layout-only
  * commit), concurrent refreshers collapse to exactly one commit,
  * a corpus vacuumed past the watermark refuses loudly and rebuild
  * recovers, and the streaming tail keeps an index current without
  * polling code. */
class IndexOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_idxops").toString

  private def vecs(seed: Int, n: Int, dim: Int,
      spread: Double): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(_ => Array.fill(dim)(
      (1.0 + rnd.nextGaussian() * spread).toFloat))
  }

  private def corpusDf(rows: Seq[(Long, Array[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")

  test("compaction after many refreshes: small files fold, clustering " +
      "and answers survive, the stats view skips the layout commit") {
    val (corpus, root) = (tmp() + "/corpus", tmp() + "/bm25")
    val docs = (1L to 40L).map(i =>
      (i, s"term${"%02d".format(i % 20)} filler$i shared"))
    VersionedTable.create(spark, corpus, docs.toDF("doc_id", "text"))
    Bm25Index.create(spark, corpus, "doc_id", "text", root, nParts = 8)
    // five churn rounds, each its own refresh commit — small files
    // accrete on the postings table
    (0 until 5).foreach { r =>
      VersionedTable.append(spark, corpus, Seq(
        (1000L + r, s"term${"%02d".format(r)} fresh$r shared"))
        .toDF("doc_id", "text"))
      VersionedTable.deleteWhere(spark, corpus,
        $"doc_id" === (2L + r), cdf = true)
      Bm25Index.refresh(spark, root)
    }
    val postings = s"$root/postings"
    def score() = Bm25Index.topN(spark, root, Seq("term03", "shared"), 10)
      .as[(Long, Double)].collect().toSeq
    val before = score()
    val filesBefore = VersionedTable.read(spark, postings)
      .select(col("_metadata.file_path")).distinct().count()
    // compact WITH the cluster keys: range-repartition preserves the
    // term clustering through the rewrite
    val v = VersionedTable.compact(spark, postings,
      smallFileBytes = 1L << 20, targetPartitions = 4,
      sortCols = Seq("term", "doc_id"))
    assert(v > 0)
    val filesAfter = VersionedTable.read(spark, postings)
      .select(col("_metadata.file_path")).distinct().count()
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file count: $filesBefore -> $filesAfter")
    val (kept, total) = Bm25Index.pruneAudit(spark, root, Seq("term03"))
    assert(kept < total, s"clustering must survive compaction: $kept/$total")
    assert(score() == before, "answers must be untouched by layout work")
    // the df stats view skips the layout-only (cdfNone) commit and
    // keeps maintaining afterwards
    VersionedTable.append(spark, corpus,
      Seq((2000L, "term03 late shared")).toDF("doc_id", "text"))
    Bm25Index.refresh(spark, root)
    val dfTerm = graft.sources.MaterializedView.read(spark, s"$root/df_view")
      .filter($"term" === "term03").select("cnt").as[Long].head()
    val truth = VersionedTable.read(spark, corpus)
      .filter(array_contains(split($"text", " "), "term03")).count()
    assert(dfTerm == truth,
      s"df must keep tracking through compaction: $dfTerm vs $truth")
  }

  test("concurrent IVF refreshers: exactly one commit lands; both " +
      "callers see the refreshed index") {
    val (corpus, idx) = (tmp() + "/corpus", tmp() + "/idx")
    VersionedTable.create(spark, corpus, corpusDf(
      vecs(1, 40, 6, 0.2).zipWithIndex.map { case (v, i) => (i.toLong, v) }))
    IvfIndex.create(spark, corpus, "vec_id", "embedding", nlist = 4, idx)
    VersionedTable.append(spark, corpus, corpusDf(
      vecs(2, 10, 6, 0.2).zipWithIndex.map { case (v, i) => (500L + i, v) }))
    VersionedTable.deleteWhere(spark, corpus, $"vec_id" === 3L, cdf = true)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val fs = (1 to 2).map(_ => scala.concurrent.Future(
        IvfIndex.refresh(spark, idx)))
      val versions = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(fs),
        scala.concurrent.duration.Duration.Inf)
      // both succeed; the loser replays idempotently or retries into
      // the winner's commit — either way exactly ONE version lands
      assert(versions.forall(_ == 2L), versions)
    } finally { pool.shutdown(); () }
    assert(VersionedTable.currentVersion(spark, s"$idx/lists")
      .contains(2L))
    assert(IvfIndex.watermark(spark, idx) == 3L)
    val corpusNow = VersionedTable.read(spark, corpus)
    val queries = corpusNow.filter($"vec_id" < 5)
    val got = IvfIndex.probe(queries, idx, "vec_id", "embedding",
      k = 3, nprobe = 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val want = Similarity.bruteForceTopK(
        queries.select($"vec_id", $"embedding"),
        corpusNow.select($"vec_id", $"embedding"),
        "vec_id", "embedding", 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("corpus vacuumed past the watermark: refresh refuses loudly, " +
      "rebuild recovers; a PQ probe's watermark re-rank refuses too") {
    val (corpus, idx, pqIdx) =
      (tmp() + "/corpus", tmp() + "/idx", tmp() + "/pq")
    VersionedTable.create(spark, corpus, corpusDf(
      vecs(5, 30, 6, 0.2).zipWithIndex.map { case (v, i) => (i.toLong, v) }))
    IvfIndex.create(spark, corpus, "vec_id", "embedding", nlist = 2, idx)
    IvfIndex.create(spark, corpus, "vec_id", "embedding", nlist = 2,
      pqIdx, pq = Some((3, 8)))
    // corpus moves on and its history is vacuumed past the watermark
    VersionedTable.append(spark, corpus, corpusDf(
      vecs(6, 5, 6, 0.2).zipWithIndex.map { case (v, i) => (900L + i, v) }))
    VersionedTable.updateWhere(spark, corpus, $"vec_id" === 1L,
      Map("embedding" -> reverse($"embedding")), cdf = true)
    VersionedTable.vacuum(spark, corpus, keepFrom = 3L,
      orphanGraceMs = 0L)
    // the feed the refresh needs is gone — loud failure, not silence
    intercept[Exception](IvfIndex.refresh(spark, idx))
    // a STALE PQ index is also unservable: its probe re-ranks against
    // the corpus AT ITS WATERMARK (v1), which the vacuum dropped —
    // loud failure, never a silently-wrong answer from leftover codes
    val q0 = VersionedTable.read(spark, corpus).filter($"vec_id" < 3)
    intercept[Exception](IvfIndex.probe(q0, pqIdx, "vec_id",
      "embedding", k = 2, nprobe = 2, pool = 5).collect())
    // recovery is the deliberate rebuild over the current snapshot —
    // for BOTH index modes (the autopilot shape: vacuum retention must
    // keep every index's watermark version, or rebuild)
    IvfIndex.rebuild(spark, idx)
    IvfIndex.rebuild(spark, pqIdx)
    assert(IvfIndex.watermark(spark, idx) == 3L)
    val gotPq = IvfIndex.probe(q0, pqIdx, "vec_id", "embedding",
        k = 2, nprobe = 2, pool = Int.MaxValue)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val corpusNow0 = VersionedTable.read(spark, corpus)
    assert(gotPq == Similarity.bruteForceTopK(
        q0.select($"vec_id", $"embedding"),
        corpusNow0.select($"vec_id", $"embedding"),
        "vec_id", "embedding", 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet)
    val corpusNow = VersionedTable.read(spark, corpus)
    val queries = corpusNow.filter($"vec_id" >= 900L)
    val got = IvfIndex.probe(queries, idx, "vec_id", "embedding",
      k = 2, nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val want = Similarity.bruteForceTopK(
        queries.select($"vec_id", $"embedding"),
        corpusNow.select($"vec_id", $"embedding"),
        "vec_id", "embedding", 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got == want)
  }

  test("streaming maintenance: the corpus tail keeps the index current " +
      "without polling code") {
    val (corpus, idx) = (tmp() + "/corpus", tmp() + "/idx")
    val cp = tmp() + "/cp"
    VersionedTable.create(spark, corpus, corpusDf(
      vecs(7, 30, 6, 0.2).zipWithIndex.map { case (v, i) => (i.toLong, v) }))
    IvfIndex.create(spark, corpus, "vec_id", "embedding", nlist = 2, idx)
    // the tail drives the full AUTOPILOT, not just refresh: drift-gated
    // rebuild and file-count-gated compaction ride the same callback
    val q = graft.streaming.Streams.maintainOnChanges(spark, corpus, cp)(
      s => { IvfIndex.maintain(s, idx, compactAboveFiles = 64); () })
    try {
      q.processAllAvailable()
      VersionedTable.append(spark, corpus, corpusDf(
        vecs(8, 8, 6, 0.2).zipWithIndex.map { case (v, i) => (700L + i, v) }))
      VersionedTable.deleteWhere(spark, corpus, $"vec_id" === 2L,
        cdf = true)
      q.processAllAvailable()
      assert(IvfIndex.watermark(spark, idx) == 3L,
        "the tail must have folded both churn versions")
      val corpusNow = VersionedTable.read(spark, corpus)
      val queries = corpusNow.filter($"vec_id" >= 700L)
      val got = IvfIndex.probe(queries, idx, "vec_id", "embedding",
        k = 2, nprobe = 2)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      val want = Similarity.bruteForceTopK(
          queries.select($"vec_id", $"embedding"),
          corpusNow.select($"vec_id", $"embedding"),
          "vec_id", "embedding", 2)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(got == want)
    } finally q.stop()
  }

  test("safeVacuum: retention is computed FROM the indexes — history " +
      "below every watermark drops, every probe/refresh/as-of still " +
      "answers, and mismatched indexes are refused") {
    val (corpus, idx, pqIdx) =
      (tmp() + "/corpus", tmp() + "/idx", tmp() + "/pq")
    VersionedTable.create(spark, corpus, corpusDf(
      vecs(15, 30, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (i.toLong, v) })) // v1
    IvfIndex.create(spark, corpus, "vec_id", "embedding", nlist = 2, idx)
    IvfIndex.create(spark, corpus, "vec_id", "embedding", nlist = 2,
      pqIdx, pq = Some((3, 8)))
    VersionedTable.append(spark, corpus, corpusDf(
      vecs(16, 5, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (900L + i, v) })) // v2
    IvfIndex.refresh(spark, pqIdx) // pq wm 2
    VersionedTable.deleteWhere(spark, corpus, $"vec_id" === 1L,
      cdf = true) // v3
    IvfIndex.refresh(spark, idx) // raw wm 3
    // the pq index is the laggard: keepFrom must be ITS watermark
    val kept = IndexRetention.safeVacuum(spark, corpus,
      ivfIndexes = Seq(idx, pqIdx), orphanGraceMs = 0L)
    assert(kept == 2L, s"keepFrom must be min(3, 2) = 2, got $kept")
    // the vacuum really dropped v1...
    intercept[Exception](
      VersionedTable.read(spark, corpus, Some(1L)).collect())
    // ...and EVERY index operation still answers: the pq probe
    // re-ranks at its wm-2 snapshot, the raw probe at wm 3, and the
    // pq refresh folds the retained (2, 3] change feed
    val q0 = VersionedTable.read(spark, corpus).filter($"vec_id" < 3)
    val corpusNow = VersionedTable.read(spark, corpus)
    def want(k: Int) = Similarity.bruteForceTopK(
        q0.select($"vec_id", $"embedding"),
        corpusNow.select($"vec_id", $"embedding"),
        "vec_id", "embedding", k)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(IvfIndex.probe(q0, idx, "vec_id", "embedding", k = 2,
        nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet == want(2))
    IvfIndex.probe(q0, pqIdx, "vec_id", "embedding", k = 2,
      nprobe = 2, pool = 5).collect() // wm-2 re-rank must not refuse
    IvfIndex.refresh(spark, pqIdx)
    assert(IvfIndex.watermark(spark, pqIdx) == 3L)
    assert(IvfIndex.probe(q0, pqIdx, "vec_id", "embedding", k = 2,
        nprobe = 2, pool = Int.MaxValue)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet == want(2))
    // an as-of HORIZON holds older history open: churn once more,
    // refresh both, and safeVacuum(horizon = 2) must keep v2 even
    // though both live watermarks sit at the head
    VersionedTable.append(spark, corpus, corpusDf(
      vecs(17, 4, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (950L + i, v) })) // v4
    IvfIndex.refresh(spark, idx)
    IvfIndex.refresh(spark, pqIdx)
    // the RAW index's version serving corpus v2 is its build (wm 1 —
    // it was only refreshed later, at wm 3), and a FILTERED as-of
    // probe reads the corpus at that serving watermark: the
    // coordinated min is 1, strictly more conservative than the
    // horizon itself. v1 is already gone (dropped above), so this
    // vacuum drops nothing more — retention never regresses.
    val kept2 = IndexRetention.safeVacuum(spark, corpus,
      ivfIndexes = Seq(idx, pqIdx), asOfHorizon = Some(2L),
      orphanGraceMs = 0L)
    assert(kept2 == 1L,
      s"the raw index's serving watermark must hold keepFrom at 1, " +
        s"got $kept2")
    // dropping the raw index from the set lifts keepFrom to the
    // horizon-consistent pq serving watermark (= 2)
    val kept3 = IndexRetention.safeVacuum(spark, corpus,
      ivfIndexes = Seq(pqIdx), asOfHorizon = Some(2L),
      orphanGraceMs = 0L)
    assert(kept3 == 2L,
      s"the horizon must hold keepFrom at 2, got $kept3")
    val asOf = IvfIndex.probeAsOf(q0, pqIdx, "vec_id", "embedding",
        k = 2, nprobe = 2, corpusVersion = 2L, pool = Int.MaxValue)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val histCorpus = VersionedTable.read(spark, corpus, Some(2L))
    assert(asOf == Similarity.bruteForceTopK(
        q0.select($"vec_id", $"embedding"),
        histCorpus.select($"vec_id", $"embedding"),
        "vec_id", "embedding", 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet,
      "the horizon-retained history must answer as-of probes exactly")
    // an index of a DIFFERENT corpus is refused, not silently folded
    // into the wrong retention computation
    val otherCorpus = tmp() + "/other"
    VersionedTable.create(spark, otherCorpus, corpusDf(
      vecs(18, 10, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (i.toLong, v) }))
    val otherIdx = tmp() + "/other_idx"
    IvfIndex.create(spark, otherCorpus, "vec_id", "embedding",
      nlist = 2, otherIdx)
    intercept[IllegalArgumentException](IndexRetention.safeVacuum(
      spark, corpus, ivfIndexes = Seq(otherIdx), orphanGraceMs = 0L))
  }

  test("safeVacuum on a bm25 corpus: the doc change feed below the " +
      "index watermark drops, maintained scoring and as-of both hold") {
    val (corpus, root) = (tmp() + "/corpus", tmp() + "/bm25")
    val docs = (1L to 30L).map(i =>
      (i, s"term${"%02d".format(i % 10)} filler$i shared"))
    VersionedTable.create(spark, corpus, docs.toDF("doc_id", "text"))
    Bm25Index.create(spark, corpus, "doc_id", "text", root, nParts = 4)
    VersionedTable.append(spark, corpus, Seq(
      (100L, "term03 fresh shared")).toDF("doc_id", "text")) // v2
    Bm25Index.refresh(spark, root) // wm 2
    VersionedTable.deleteWhere(spark, corpus, $"doc_id" === 5L,
      cdf = true) // v3
    Bm25Index.refresh(spark, root) // wm 3
    val kept = IndexRetention.safeVacuum(spark, corpus,
      bm25Indexes = Seq(root), asOfHorizon = Some(2L),
      orphanGraceMs = 0L)
    assert(kept == 2L, s"horizon-pinned keepFrom should be 2: $kept")
    intercept[Exception](
      VersionedTable.read(spark, corpus, Some(1L)).collect())
    // live scoring == recompute over the retained head
    val got = Bm25Index.topN(spark, root, Seq("term03", "shared"), 10)
      .as[(Long, Double)].collect().toSeq
    val want = TextAnalysis.bm25TopN(
        VersionedTable.read(spark, corpus), "doc_id", "text",
        Seq("term03", "shared"), 10)
      .as[(Long, Double)].collect().toSeq.filter(_._2 > 0)
    assert(got == want)
    // the horizon version still answers as-of
    val gotAsOf = Bm25Index.topNAsOf(spark, root,
        Seq("term03", "shared"), 10, corpusVersion = 2L)
      .as[(Long, Double)].collect().toSeq
    val wantAsOf = TextAnalysis.bm25TopN(
        VersionedTable.read(spark, corpus, Some(2L)), "doc_id", "text",
        Seq("term03", "shared"), 10)
      .as[(Long, Double)].collect().toSeq.filter(_._2 > 0)
    assert(gotAsOf == wantAsOf)
    // and maintenance keeps folding new churn afterwards
    VersionedTable.append(spark, corpus, Seq(
      (200L, "term03 late shared")).toDF("doc_id", "text"))
    Bm25Index.refresh(spark, root)
    assert(Bm25Index.watermark(spark, root) == 4L)
  }

  test("maintainAll: one call brings every index to the corpus head " +
      "and moves the retention floor forward; the horizon holds") {
    val (corpus, idx, pqIdx) =
      (tmp() + "/corpus", tmp() + "/idx", tmp() + "/pq")
    VersionedTable.create(spark, corpus, corpusDf(
      vecs(25, 30, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (i.toLong, v) })) // v1
    IvfIndex.create(spark, corpus, "vec_id", "embedding", nlist = 2, idx)
    IvfIndex.create(spark, corpus, "vec_id", "embedding", nlist = 2,
      pqIdx, pq = Some((3, 8)))
    VersionedTable.append(spark, corpus, corpusDf(
      vecs(26, 6, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (800L + i, v) })) // v2
    VersionedTable.deleteWhere(spark, corpus, $"vec_id" === 4L,
      cdf = true) // v3
    // ONE call: both indexes fold the churn, then the vacuum floor
    // advances to the (now-shared) head watermark
    val kept = IndexRetention.maintainAll(spark, corpus,
      ivfIndexes = Seq(idx, pqIdx), orphanGraceMs = 0L)
    assert(kept.contains(3L),
      s"maintenance-then-vacuum must move the floor to the head: $kept")
    assert(IvfIndex.watermark(spark, idx) == 3L &&
      IvfIndex.watermark(spark, pqIdx) == 3L)
    intercept[Exception](
      VersionedTable.read(spark, corpus, Some(1L)).collect())
    // both indexes answer exactly after the cycle
    val corpusNow = VersionedTable.read(spark, corpus)
    val queries = corpusNow.filter($"vec_id" < 3)
    val want = Similarity.bruteForceTopK(
        queries.select($"vec_id", $"embedding"),
        corpusNow.select($"vec_id", $"embedding"),
        "vec_id", "embedding", 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    Seq(idx, pqIdx).foreach { ix =>
      val got = IvfIndex.probe(queries, ix, "vec_id", "embedding",
          k = 2, nprobe = 2, pool = Int.MaxValue)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
      assert(got == want, s"$ix must answer exactly after maintainAll")
    }
    // a horizon call keeps the asked version even as the heads move on
    VersionedTable.append(spark, corpus, corpusDf(
      vecs(27, 4, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (900L + i, v) })) // v4
    val kept2 = IndexRetention.maintainAll(spark, corpus,
      ivfIndexes = Seq(idx, pqIdx), asOfHorizon = Some(3L),
      orphanGraceMs = 0L)
    assert(kept2.contains(3L), s"the horizon must pin the floor: $kept2")
    // the horizon version still answers as-of on the PQ index
    IvfIndex.probeAsOf(queries, pqIdx, "vec_id", "embedding", k = 2,
      nprobe = 2, corpusVersion = 3L, pool = Int.MaxValue).collect()
    // vacuum = false maintains without touching retention
    VersionedTable.append(spark, corpus, corpusDf(
      vecs(28, 2, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (950L + i, v) })) // v5
    assert(IndexRetention.maintainAll(spark, corpus,
      ivfIndexes = Seq(idx, pqIdx), vacuum = false).isEmpty)
    assert(IvfIndex.watermark(spark, idx) == 5L)
    VersionedTable.read(spark, corpus, Some(3L)).collect() // retained
  }

  test("index-history vacuum (ivf): churn cycles under " +
      "maintainAll(indexVacuum) keep the lists version count bounded, " +
      "stale generation dirs are GCed, as-of >= horizon answers " +
      "exactly, below-horizon refuses loudly") {
    val (corpus, idx) = (tmp() + "/corpus", tmp() + "/pq")
    VersionedTable.create(spark, corpus, corpusDf(
      vecs(31, 30, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (i.toLong, v) })) // v1
    IvfIndex.create(spark, corpus, "vec_id", "embedding", nlist = 2,
      idx, pq = Some((3, 8)))
    val lists = s"$idx/lists"
    // three churn cycles, each closed by the full scheduler call with
    // index vacuum on: without it the lists table accretes one version
    // per refresh forever (the r18 verdict's missing #2)
    (0 until 3).foreach { r =>
      VersionedTable.append(spark, corpus, corpusDf(
        vecs(32 + r, 4, 6, 0.2).zipWithIndex.map { case (v, i) =>
          (1000L * (r + 1) + i, v) }))
      VersionedTable.deleteWhere(spark, corpus,
        $"vec_id" === (r + 2).toLong, cdf = true)
      Thread.sleep(5) // age writes past the grace-0 cutoff
      IndexRetention.maintainAll(spark, corpus, ivfIndexes = Seq(idx),
        indexVacuum = true, orphanGraceMs = 0L)
      assert(VersionedTable.versions(spark, lists).size == 1,
        "index vacuum must bound the lists history per cycle")
    }
    // probes answer exactly from the vacuumed-to-head index
    val corpusNow = VersionedTable.read(spark, corpus)
    val queries = corpusNow.filter($"vec_id" < 2)
    val want = Similarity.bruteForceTopK(
        queries.select($"vec_id", $"embedding"),
        corpusNow.select($"vec_id", $"embedding"),
        "vec_id", "embedding", 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(IvfIndex.probe(queries, idx, "vec_id", "embedding", k = 2,
        nprobe = 2, pool = Int.MaxValue)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet == want)
    // a rebuild strands the old quantizer/codebook generation; the
    // next history vacuum GCs the unreferenced dirs (grace-aged)
    IvfIndex.rebuild(spark, idx)
    val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    def genDirs(prefix: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(idx))
        .count(st => st.isDirectory &&
          st.getPath.getName.startsWith(prefix))
    assert(genDirs("centroids_") == 2 && genDirs("pq_") == 2,
      "the rebuild must have landed a second generation")
    Thread.sleep(5)
    IvfIndex.vacuumHistory(spark, idx, orphanGraceMs = 0L)
    assert(genDirs("centroids_") == 1 && genDirs("pq_") == 1,
      "unreferenced generation dirs must be GCed")
    assert(IvfIndex.probe(queries, idx, "vec_id", "embedding", k = 2,
        nprobe = 2, pool = Int.MaxValue)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet == want,
      "the surviving generation must keep answering after the GC")
    // an as-of HORIZON keeps its serving version: churn + refresh
    // twice, vacuum to the interior version, probe both sides of it
    VersionedTable.append(spark, corpus, corpusDf(
      vecs(40, 3, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (5000L + i, v) }))
    val hv = IvfIndex.refresh(spark, idx) // serving version
    val horizon = IvfIndex.watermark(spark, idx)
    VersionedTable.append(spark, corpus, corpusDf(
      vecs(41, 3, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (6000L + i, v) }))
    IvfIndex.refresh(spark, idx)
    Thread.sleep(5)
    val keptV = IvfIndex.vacuumHistory(spark, idx,
      horizon = Some(horizon), orphanGraceMs = 0L)
    assert(keptV == hv, s"the horizon-serving lists version must be " +
      s"the floor: $keptV vs $hv")
    assert(VersionedTable.versions(spark, lists).head == hv,
      "history below the serving version must be gone")
    // >= horizon answers exactly against the historical corpus
    val hist = VersionedTable.read(spark, corpus, Some(horizon))
    val wantAsOf = Similarity.bruteForceTopK(
        queries.select($"vec_id", $"embedding"),
        hist.select($"vec_id", $"embedding"),
        "vec_id", "embedding", 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(IvfIndex.probeAsOf(queries, idx, "vec_id", "embedding",
        k = 2, nprobe = 2, corpusVersion = horizon,
        pool = Int.MaxValue)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet == wantAsOf)
    // below the horizon: a LOUD refusal naming the vacuumed floor,
    // not a missing-manifest crash
    val e = intercept[IllegalArgumentException](IvfIndex.probeAsOf(
      queries, idx, "vec_id", "embedding", k = 2, nprobe = 2,
      corpusVersion = horizon - 1))
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
  }

  test("crossed writers around maintainAll: a full concurrent cycle " +
      "and a manual rebuild inside the refresh->vacuum window keep " +
      "the floor monotone, serve the horizon, and count drift once") {
    val (corpus, idx) = (tmp() + "/corpus", tmp() + "/idx")
    VersionedTable.create(spark, corpus, corpusDf(
      vecs(51, 30, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (i.toLong, v) })) // v1
    IvfIndex.create(spark, corpus, "vec_id", "embedding", nlist = 2, idx)
    VersionedTable.append(spark, corpus, corpusDf(
      vecs(52, 5, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (800L + i, v) })) // v2
    VersionedTable.deleteWhere(spark, corpus, $"vec_id" === 3L,
      cdf = true) // v3
    // (a) a COMPLETE second cycle lands between cycle A's maintenance
    // and its vacuum-floor computation: A must recompute the floor
    // from the post-B state (monotone), never vacuum below what B
    // left serving, and the shared delta must count once in drift
    var keptB: Option[Long] = None
    var fired = 0
    val keptA = IndexRetention.maintainAllSeam(spark, corpus,
      Seq(idx), Seq.empty, None, 0.05, 2.0, 0, Int.MaxValue,
      8L * 1024 * 1024, vacuum = true, indexVacuum = false, 0L,
      () => if (fired == 0) {
        fired += 1
        keptB = IndexRetention.maintainAll(spark, corpus,
          ivfIndexes = Seq(idx), orphanGraceMs = 0L)
      })
    assert(fired == 1 && keptB.nonEmpty)
    assert(keptA.get >= keptB.get,
      s"the floor must stay monotone across crossed cycles: " +
        s"A=${keptA.get} B=${keptB.get}")
    assert(keptA.contains(3L), s"both cycles land the head floor: $keptA")
    // B's refresh folded the delta; A's maintenance had already
    // folded it — the replay guard makes the second apply a no-op, so
    // the post-build inserts count ONCE
    val (_, _, churnN) = IvfIndex.drift(spark, idx)
    assert(churnN == 5L, s"crossed cycles must count the delta once: $churnN")
    // nothing a cycle still serves was vacuumed: the live probe
    // answers exactly at the shared floor
    val corpusNow = VersionedTable.read(spark, corpus)
    val queries = corpusNow.filter($"vec_id" < 3)
    def want(c: DataFrame) = Similarity.bruteForceTopK(
        queries.select($"vec_id", $"embedding"),
        c.select($"vec_id", $"embedding"),
        "vec_id", "embedding", 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(IvfIndex.probe(queries, idx, "vec_id", "embedding", k = 2,
        nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet == want(corpusNow))
    // (b) a manual REBUILD lands in the same window of a
    // horizon-carrying cycle: the rebuild jumps the live watermark to
    // the head, but the floor is computed AFTER from the walk over
    // the current manifests — the version SERVING the horizon pins it
    VersionedTable.append(spark, corpus, corpusDf(
      vecs(53, 4, 6, 0.2).zipWithIndex.map { case (v, i) =>
        (900L + i, v) })) // v4
    def genDir(): String =
      VersionedTable.metaOf(spark, idx + "/lists")("ivf.centroids_dir")
    val gen1 = genDir()
    var fired2 = 0
    val kept2 = IndexRetention.maintainAllSeam(spark, corpus,
      Seq(idx), Seq.empty, Some(3L), 0.05, 2.0, 0, Int.MaxValue,
      8L * 1024 * 1024, vacuum = true, indexVacuum = false, 0L,
      () => if (fired2 == 0) { fired2 += 1; IvfIndex.rebuild(spark, idx) })
    assert(fired2 == 1 && genDir() != gen1,
      "the crossed rebuild must have landed a new generation")
    assert(kept2.contains(3L),
      s"the horizon-serving version must pin the floor: $kept2")
    // the horizon still answers exactly from the OLD generation...
    val hist = VersionedTable.read(spark, corpus, Some(3L))
    assert(IvfIndex.probeAsOf(queries, idx, "vec_id", "embedding",
        k = 2, nprobe = 2, corpusVersion = 3L)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet == want(hist),
      "the crossed rebuild must not unserve the horizon")
    // ...and the NEW generation serves the head
    assert(IvfIndex.probe(queries, idx, "vec_id", "embedding", k = 2,
        nprobe = 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet ==
      want(VersionedTable.read(spark, corpus)))
  }

  test("index-history vacuum (bm25): all four tables' histories bound " +
      "under maintainAll(indexVacuum); scoring, as-of at the horizon, " +
      "and onward maintenance all hold") {
    val (corpus, root) = (tmp() + "/corpus", tmp() + "/bm25")
    val docs = (1L to 30L).map(i =>
      (i, s"term${"%02d".format(i % 10)} filler$i shared"))
    VersionedTable.create(spark, corpus, docs.toDF("doc_id", "text"))
    Bm25Index.create(spark, corpus, "doc_id", "text", root, nParts = 4)
    (0 until 3).foreach { r =>
      VersionedTable.append(spark, corpus, Seq(
        (1000L + r, s"term${"%02d".format(r)} fresh$r shared"))
        .toDF("doc_id", "text"))
      Thread.sleep(5)
      IndexRetention.maintainAll(spark, corpus, bm25Indexes = Seq(root),
        indexVacuum = true, orphanGraceMs = 0L)
      Seq("postings", "doclens", "df_view", "global_view").foreach { t =>
        assert(VersionedTable.versions(spark, s"$root/$t").size == 1,
          s"$t history must be bounded per cycle")
      }
    }
    def recompute(terms: Seq[String], v: Option[Long]) =
      TextAnalysis.bm25TopN(
          v.fold(VersionedTable.read(spark, corpus))(x =>
            VersionedTable.read(spark, corpus, Some(x))),
          "doc_id", "text", terms, 10)
        .as[(Long, Double)].collect().toSeq.filter(_._2 > 0)
    assert(Bm25Index.topN(spark, root, Seq("term03", "shared"), 10)
      .as[(Long, Double)].collect().toSeq ==
      recompute(Seq("term03", "shared"), None))
    // horizon: one more churn + refresh past an interior version
    VersionedTable.append(spark, corpus, Seq(
      (2000L, "term03 mid shared")).toDF("doc_id", "text"))
    Bm25Index.refresh(spark, root)
    val horizon = Bm25Index.watermark(spark, root)
    VersionedTable.append(spark, corpus, Seq(
      (3000L, "term03 late shared")).toDF("doc_id", "text"))
    Bm25Index.refresh(spark, root)
    Thread.sleep(5)
    Bm25Index.vacuumHistory(spark, root, horizon = Some(horizon),
      orphanGraceMs = 0L)
    assert(Bm25Index.topNAsOf(spark, root, Seq("term03", "shared"), 10,
        corpusVersion = horizon)
      .as[(Long, Double)].collect().toSeq ==
      recompute(Seq("term03", "shared"), Some(horizon)),
      "the horizon-retained snapshot must answer as-of exactly")
    val e = intercept[IllegalArgumentException](Bm25Index.topNAsOf(
      spark, root, Seq("term03", "shared"), 10,
      corpusVersion = horizon - 1))
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
    // maintenance keeps folding after the vacuum
    VersionedTable.append(spark, corpus, Seq(
      (4000L, "term03 newest shared")).toDF("doc_id", "text"))
    Bm25Index.refresh(spark, root)
    assert(Bm25Index.topN(spark, root, Seq("term03", "shared"), 10)
      .as[(Long, Double)].collect().toSeq ==
      recompute(Seq("term03", "shared"), None))
  }

  test("bm25 maintain/compact wrappers: the file-count gate folds " +
      "accretion with the term clustering baked in") {
    val (corpus, root) = (tmp() + "/corpus", tmp() + "/bm25")
    val docs = (1L to 40L).map(i =>
      (i, s"term${"%02d".format(i % 20)} filler$i shared"))
    VersionedTable.create(spark, corpus, docs.toDF("doc_id", "text"))
    Bm25Index.create(spark, corpus, "doc_id", "text", root, nParts = 8)
    (0 until 5).foreach { r =>
      VersionedTable.append(spark, corpus, Seq(
        (1000L + r, s"term${"%02d".format(r)} fresh$r shared"))
        .toDF("doc_id", "text"))
      Bm25Index.refresh(spark, root)
    }
    def score() = Bm25Index.topN(spark, root, Seq("term03", "shared"), 10)
      .as[(Long, Double)].collect().toSeq
    val before = score()
    val postings = s"$root/postings"
    val filesBefore = VersionedTable.fileCount(spark, postings)
    // under the gate: maintain refreshes (no-op) and does NOT compact
    val (v1, c1) = Bm25Index.maintain(spark, root,
      compactAboveFiles = 1000)
    assert(!c1 && VersionedTable.fileCount(spark, postings) == filesBefore)
    // over the gate: one call folds the accretion, clustering intact
    val (v2, c2) = Bm25Index.maintain(spark, root, compactAboveFiles = 4)
    assert(c2 && v2 > v1, "the file-count gate must trigger the fold")
    assert(VersionedTable.fileCount(spark, postings) < filesBefore)
    val (kept, total) = Bm25Index.pruneAudit(spark, root, Seq("term03"))
    assert(kept < total,
      s"wrapper compaction must keep the term prune: $kept/$total")
    assert(score() == before, "answers must be untouched by layout work")
    // maintenance keeps working across the layout commit
    VersionedTable.append(spark, corpus,
      Seq((2000L, "term03 late shared")).toDF("doc_id", "text"))
    Bm25Index.maintain(spark, root)
    val dfTerm = graft.sources.MaterializedView.read(spark, s"$root/df_view")
      .filter($"term" === "term03").select("cnt").as[Long].head()
    val truth = VersionedTable.read(spark, corpus)
      .filter(array_contains(split($"text", " "), "term03")).count()
    assert(dfTerm == truth,
      s"df must keep tracking through the wrapper fold: $dfTerm vs $truth")
  }
}
