package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.VersionedTable

/** Incremental BM25 state: after any churn + refresh, scoring from the
  * maintained postings/doclens/df/global state must equal the
  * recompute-everything [[TextAnalysis.bm25TopN]] over the post-churn
  * corpus — including df retraction on deletes and posting removal for
  * terms an update dropped from a document. */
class Bm25IndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_bm25").toString

  private def docsDf(rows: (Long, String)*): DataFrame =
    rows.toSeq.toDF("doc_id", "text")

  private def assertMatches(root: String, corpus: String,
      terms: Seq[String], k: Int): Unit = {
    val got = Bm25Index.topN(spark, root, terms, k)
      .as[(Long, Double)].collect().toSeq
    val want = TextAnalysis.bm25TopN(
        VersionedTable.read(spark, corpus), "doc_id", "text", terms, k)
      .as[(Long, Double)].collect().toSeq
      .filter(_._2 > 0) // zero-score docs are absent from the index
    assert(got == want, s"index $got != recompute $want")
  }

  test("churn (append + delete + term-dropping update) then refresh: " +
      "index scoring == full recompute; stats retract exactly") {
    val (corpus, root) = (tmp() + "/corpus", tmp() + "/idx")
    VersionedTable.create(spark, corpus, docsDf(
      (1L, "spark joins data"), (2L, "hash join spark spark"),
      (3L, "data lakes hold data"), (4L, "hash tables"),
      (5L, "spark hash")))
    Bm25Index.create(spark, corpus, "doc_id", "text", root, nParts = 4)
    assertMatches(root, corpus, Seq("spark", "hash"), 5)
    // churn: new docs, a deleted doc, an update that DROPS a term
    // (doc 2 loses 'hash' — its posting must leave, df must fall)
    VersionedTable.append(spark, corpus, docsDf(
      (6L, "spark spark spark"), (7L, "plain prose")))
    VersionedTable.deleteWhere(spark, corpus, $"doc_id" === 4L,
      cdf = true)
    VersionedTable.updateWhere(spark, corpus, $"doc_id" === 2L,
      Map("text" -> lit("join spark spark")), cdf = true)
    Bm25Index.refresh(spark, root)
    assert(Bm25Index.watermark(spark, root) == 4L)
    assertMatches(root, corpus, Seq("spark", "hash"), 7)
    assertMatches(root, corpus, Seq("data"), 7)
    // df('hash') must be exactly the live count: docs 4 gone, 2 lost it
    val dfHash = graft.sources.MaterializedView
      .read(spark, s"$root/df_view")
      .filter($"term" === "hash").select("cnt").as[Long].collect()
    assert(dfHash.toSeq == Seq(1L), s"df(hash) should be 1: $dfHash")
    // a doc inserted and deleted in the SAME refresh window never lands
    VersionedTable.append(spark, corpus, docsDf((8L, "ephemeral spark")))
    VersionedTable.deleteWhere(spark, corpus, $"doc_id" === 8L,
      cdf = true)
    Bm25Index.refresh(spark, root)
    assert(VersionedTable.read(spark, s"$root/postings")
      .filter($"doc_id" === 8L).isEmpty)
    assertMatches(root, corpus, Seq("spark", "hash"), 7)
    // replay is a no-op
    val v = VersionedTable.currentVersion(spark, s"$root/postings").get
    assert(Bm25Index.refresh(spark, root) == v)
  }

  test("topNAsOf: historical queries answer from the snapshot " +
      "consistent with that corpus version, across later churn") {
    val (corpus, root) = (tmp() + "/corpus", tmp() + "/idx")
    VersionedTable.create(spark, corpus, docsDf(
      (1L, "spark joins data"), (2L, "hash join spark"),
      (3L, "data lakes"))) // corpus v1
    Bm25Index.create(spark, corpus, "doc_id", "text", root, nParts = 4)
    // epoch 2: churn + refresh
    VersionedTable.append(spark, corpus, docsDf(
      (4L, "spark spark everywhere"))) // v2
    VersionedTable.deleteWhere(spark, corpus, $"doc_id" === 2L,
      cdf = true) // v3
    Bm25Index.refresh(spark, root)
    // epoch 3: more churn + refresh
    VersionedTable.updateWhere(spark, corpus, $"doc_id" === 1L,
      Map("text" -> lit("plain prose now")), cdf = true) // v4
    Bm25Index.refresh(spark, root)
    def want(v: Long) = TextAnalysis.bm25TopN(
        VersionedTable.read(spark, corpus, Some(v)),
        "doc_id", "text", Seq("spark", "hash"), 5)
      .as[(Long, Double)].collect().toSeq.filter(_._2 > 0)
    def got(v: Long) = Bm25Index.topNAsOf(spark, root,
        Seq("spark", "hash"), 5, corpusVersion = v)
      .as[(Long, Double)].collect().toSeq
    // each refresh boundary answers exactly the historical recompute
    assert(got(1L) == want(1L), s"${got(1L)} vs ${want(1L)} at v1")
    assert(got(3L) == want(3L), s"${got(3L)} vs ${want(3L)} at v3")
    assert(got(4L) == want(4L), s"${got(4L)} vs ${want(4L)} at v4")
    // a corpus version BETWEEN refreshes answers from the latest
    // index state at-or-before it (v2 was folded together with v3)
    assert(got(2L) == want(1L),
      "between refreshes the as-of answer is the prior index state")
    // current-path equivalence: asOf(head) == topN
    assert(got(4L) == Bm25Index.topN(spark, root, Seq("spark", "hash"), 5)
      .as[(Long, Double)].collect().toSeq)
    // a LAYOUT-ONLY commit between refreshes must not confuse the
    // as-of walk: compaction carries the watermark meta, so the walk
    // lands on the compacted layout of the same logical state and
    // every historical answer above is unchanged
    Bm25Index.compact(spark, root, smallFileBytes = 1L << 20)
    assert(got(1L) == want(1L) && got(3L) == want(3L) &&
      got(4L) == want(4L),
      "as-of answers must survive a compaction commit")
    // and maintenance continues across it
    VersionedTable.append(spark, corpus, docsDf(
      (9L, "hash hash hash"))) // v5
    Bm25Index.refresh(spark, root)
    assert(got(5L) == want(5L), s"${got(5L)} vs ${want(5L)} at v5")
    assert(got(4L) == want(4L),
      "pre-compaction history must stay answerable after new churn")
  }

  test("query-term scans file-prune the postings; missing terms score " +
      "through df = 0") {
    val (corpus, root) = (tmp() + "/corpus", tmp() + "/idx")
    // many distinct terms so the term-ranged files are disjoint
    val rows = (1L to 60L).map(i => (i, s"term${"%02d".format(i % 30)} " +
      s"term${"%02d".format((i + 1) % 30)} filler$i"))
    VersionedTable.create(spark, corpus, docsDf(rows: _*))
    Bm25Index.create(spark, corpus, "doc_id", "text", root, nParts = 8)
    val (kept, total) = Bm25Index.pruneAudit(spark, root, Seq("term05"))
    assert(kept < total && kept >= 1,
      s"one-term scan must prune postings files: $kept/$total")
    // a term the corpus has never seen contributes zero, not a crash
    val got = Bm25Index.topN(spark, root, Seq("term05", "nosuchterm"), 3)
      .as[(Long, Double)].collect()
    val want = TextAnalysis.bm25TopN(VersionedTable.read(spark, corpus),
        "doc_id", "text", Seq("term05", "nosuchterm"), 3)
      .as[(Long, Double)].collect().filter(_._2 > 0)
    assert(got.toSeq == want.toSeq)
  }

  test("filtered retrieval: `where` pre-filters candidates before the " +
      "cut (never the starving post-filter), stats stay whole-" +
      "collection, and the doclens read is candidate-bounded") {
    val (corpus, root) = (tmp() + "/corpus", tmp() + "/idx")
    // 40 docs sharing 'shared'; doc_id % 4 == 1 is the serving slice.
    // A post-filter of topN(3) would starve: the global top-3 for
    // 'shared' are dominated by the shortest docs, few of which match.
    val rows = (1L to 40L).map { i =>
      val filler = Seq.fill((i % 7).toInt + 1)(s"filler$i").mkString(" ")
      (i, s"shared $filler term${"%02d".format(i % 10)}")
    }
    VersionedTable.create(spark, corpus, docsDf(rows: _*))
    Bm25Index.create(spark, corpus, "doc_id", "text", root, nParts = 8)
    val pred = col("doc_id") % 4 === 1
    val got = Bm25Index.topN(spark, root, Seq("shared"), 5,
        where = Some(pred))
      .as[(Long, Double)].collect().toSeq
    // truth: recompute over the FULL corpus (whole-collection stats),
    // filter to the predicate slice, THEN cut — pre-filter semantics
    val want = TextAnalysis.bm25TopN(
        VersionedTable.read(spark, corpus), "doc_id", "text",
        Seq("shared"), Int.MaxValue)
      .filter(pred).as[(Long, Double)].collect().toSeq
      .filter(_._2 > 0).sortBy { case (id, s) => (-s, id) }.take(5)
    assert(got == want, s"filtered index $got != filtered recompute $want")
    assert(got.size == 5 && got.forall(_._1 % 4 == 1),
      "a selective predicate must not starve the cut (pre-filter)")
    // post-filter would differ: the unfiltered top-5 keeps <5 matches
    val post = Bm25Index.topN(spark, root, Seq("shared"), 5)
      .as[(Long, Double)].collect().toSeq.filter(_._1 % 4 == 1)
    assert(post.size < 5,
      "test premise: post-filtering the top-5 must starve here")
    // the doclens read file-prunes to the candidates' doc_id ranges
    // (doc_id-clustered files + the range-compressed id predicate):
    // a narrow candidate slice keeps a strict subset of the files
    val narrowIds = (1L to 5L).map(x => x: Any)
    val (kept, total) = VersionedTable.pruneProfile(spark,
      s"$root/doclens",
      IdPredicate.predicate(col("doc_id"), narrowIds).get)
    assert(kept < total && kept >= 1,
      s"doclens must file-prune on candidate ids: $kept/$total")
    // filtered AS-OF composes: churn past, ask at v1 with the predicate
    VersionedTable.deleteWhere(spark, corpus, col("doc_id") % 8 === 1,
      cdf = true) // v2 kills half the serving slice (1, 9, 17, ...)
    Bm25Index.refresh(spark, root)
    val gotAsOf = Bm25Index.topNAsOf(spark, root, Seq("shared"), 5,
        corpusVersion = 1L, where = Some(pred))
      .as[(Long, Double)].collect().toSeq
    assert(gotAsOf == want,
      "as-of filtered retrieval must replay the historical filtered cut")
    // and the live filtered answer reflects the delete
    val gotLive = Bm25Index.topN(spark, root, Seq("shared"), 5,
        where = Some(pred))
      .as[(Long, Double)].collect().toSeq
    assert(gotLive.nonEmpty &&
      gotLive.forall(r => r._1 % 4 == 1 && r._1 % 8 != 1),
      s"live filtered answers must come from the surviving slice: " +
        s"$gotLive")
  }

  test("exactness is unconditional: null-text docs sit outside the " +
      "collection on BOTH sides, duplicate query terms collapse to one " +
      "contribution") {
    // the two formerly-unstated gaps: (1) the index never tokenizes
    // null texts, so its N/avgdl exclude them — bm25TopN must too (a
    // counted-but-lengthless row would deflate avgdl and inflate N);
    // (2) query terms are a set — a duplicated term scores once, not
    // once per occurrence
    val (corpus, root) = (tmp() + "/corpus", tmp() + "/idx")
    val rows = Seq[(Long, String)](
      (1L, "spark joins data"), (2L, "hash join spark spark"),
      (3L, "data lakes hold data"), (4L, null),
      (5L, "spark hash"), (6L, null))
    VersionedTable.create(spark, corpus, rows.toDF("doc_id", "text"))
    Bm25Index.create(spark, corpus, "doc_id", "text", root, nParts = 4)
    val dup = Seq("spark", "hash", "spark", "spark")
    val got = Bm25Index.topN(spark, root, dup, 6)
      .as[(Long, Double)].collect().toSeq
    val want = TextAnalysis.bm25TopN(
        VersionedTable.read(spark, corpus), "doc_id", "text", dup, 6)
      .as[(Long, Double)].collect().toSeq.filter(_._2 > 0)
    assert(got == want, s"index $got != recompute $want")
    assert(got == Bm25Index.topN(spark, root, Seq("spark", "hash"), 6)
      .as[(Long, Double)].collect().toSeq,
      "duplicate terms must not change the ranking")
    // the global stats see 4 live docs, not 6: N rides the one-row
    // view, and bm25TopN's recompute now agrees by construction
    val g = graft.sources.MaterializedView
      .read(spark, s"$root/global_view")
      .select("cnt").as[Long].collect()
    assert(g.toSeq == Seq(4L), s"null texts leaked into N: ${g.toSeq}")
    // null-text rows never rank (they have no terms and no length)
    assert(!got.exists(r => r._1 == 4L || r._1 == 6L))
  }

  test("topNBatch: per-query output equals topN (live, filtered, and " +
      "as-of); driver-action count and plan size constant in |queries|") {
    val (corpus, root) = (tmp() + "/corpus", tmp() + "/idx")
    val vocab = Vector("spark", "hash", "join", "scan", "sort",
      "merge", "data", "lake")
    val rows = (1L to 60L).map { i =>
      val t = (0 until 8).map(j => vocab(((i * 7 + j * 3) % 23 %
        vocab.size).toInt)).mkString(" ")
      (i, t)
    }
    VersionedTable.create(spark, corpus, rows.toDF("doc_id", "text"))
    Bm25Index.create(spark, corpus, "doc_id", "text", root, nParts = 4)
    // churn + refresh so the batch reads maintained (not build-time)
    // state, and v1 is a real historical snapshot for the as-of leg
    VersionedTable.append(spark, corpus,
      docsDf((61L, "spark merge spark"), (62L, "lake scan lake")))
    VersionedTable.deleteWhere(spark, corpus, $"doc_id" % 11 === 3,
      cdf = true)
    Bm25Index.refresh(spark, root)

    def batchOf(n: Int): DataFrame = (1 to n).map { q =>
      (q.toLong, Seq(vocab(q % vocab.size), vocab((q + 3) % vocab.size)))
    }.toDF("qid", "terms")

    def checkAgainstTopN(n: Int, where: Option[
        org.apache.spark.sql.Column], asOf: Option[Long]): Unit = {
      val out = Bm25Index.topNBatch(batchOf(n), root, "qid", "terms",
          topN = 5, where = where, corpusVersion = asOf)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
          r.getInt(3)))
        .groupBy(_._1)
      (1 to n).foreach { q =>
        val terms = Seq(vocab(q % vocab.size), vocab((q + 3) % vocab.size))
        val want = asOf.fold(Bm25Index.topN(spark, root, terms, 5,
            where = where))(v => Bm25Index.topNAsOf(spark, root, terms,
            5, v, where = where))
          .as[(Long, Double)].collect().toSeq
        val got = out.getOrElse(q.toLong, Array.empty).sortBy(_._4)
          .map(r => (r._2, r._3)).toSeq
        assert(got == want,
          s"query $q (where=$where asOf=$asOf): batch $got != topN $want")
      }
    }
    checkAgainstTopN(6, None, None)
    checkAgainstTopN(4, Some($"doc_id" % 2 === 0), None)
    checkAgainstTopN(4, None, Some(1L))
    checkAgainstTopN(3, Some($"doc_id" % 2 === 0), Some(1L))

    // driver-coordination constancy: the CONSTRUCTION of the batched
    // frame runs a fixed set of size-capped driver actions — a 10x
    // larger batch must not add jobs (the per-query-job shape this
    // operator replaces). Counted via listener; polled until the
    // async bus drains.
    def jobsDuring(body: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        var prev = -1
        var stable = 0
        while (stable < 3) {
          Thread.sleep(200)
          val cur = counter.get()
          if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        }
        counter.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    var smallPlan: String = null
    var largePlan: String = null
    val jSmall = jobsDuring {
      smallPlan = Bm25Index.topNBatch(batchOf(4), root, "qid", "terms",
        topN = 5).queryExecution.executedPlan.toString
    }
    val jLarge = jobsDuring {
      largePlan = Bm25Index.topNBatch(batchOf(40), root, "qid", "terms",
        topN = 5).queryExecution.executedPlan.toString
    }
    assert(jLarge == jSmall,
      s"batch construction must run a constant job count: " +
        s"4 queries -> $jSmall jobs, 40 queries -> $jLarge jobs")
    assert(largePlan.length <= smallPlan.length * 3 / 2 + 2000,
      s"plan must not grow with the batch: ${smallPlan.length} -> " +
        s"${largePlan.length} chars")

    // in-plan refusals: duplicate and empty-terms query rows
    val dup = Seq((1L, Seq("spark")), (1L, Seq("hash")))
      .toDF("qid", "terms")
    val e1 = intercept[Exception](Bm25Index.topNBatch(dup, root,
      "qid", "terms", 5).collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e1).exists(_.contains("duplicate query id")),
      msgs(e1).mkString(" | "))
    val empty = Seq((1L, Seq.empty[String])).toDF("qid", "terms")
    val e2 = intercept[Exception](Bm25Index.topNBatch(empty, root,
      "qid", "terms", 5).collect())
    assert(msgs(e2).exists(_.contains("null/empty term array")),
      msgs(e2).mkString(" | "))
  }
}
