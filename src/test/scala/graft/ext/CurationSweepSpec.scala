package graft.ext

import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Multi-seed randomized parity for the curation operators: each
  * distributed result must equal an independent driver-side reference
  * implementation on random corpora (small vocabularies force heavy
  * span sharing, duplicates, and budget-boundary collisions). */
class CurationSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("id", LongType), StructField("text", StringType)))
  private def frame(rows: Seq[(Long, String)]) =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), docSchema)

  /** The engine's shingle definition, reimplemented independently.
    * Tokens are joined with U+0001 (written as an escape so the
    * delimiter is visible in review), matching the TokenShingles
    * contract — a bare concatenation would collapse distinct shingles
    * whenever the vocabulary has variable-width tokens (("a","bb") vs
    * ("ab","b")) and the sweep would stop being independent. */
  private def refShingles(text: String, k: Int): Seq[String] = {
    val toks = text.split(" ", -1)
    val last = math.max(toks.length - k, 0)
    (0 to last).map(i => toks.slice(i, math.min(i + k, toks.length))
      .mkString("\u0001")).distinct
  }

  test("spanDupStats equals the brute-force reference across seeds") {
    // the second vocabulary is deliberately variable-width with
    // concatenation collisions ("a"+"bb" == "ab"+"b") — it passes only
    // because engine and reference both delimit shingle tokens
    for (seed <- Seq(3, 11, 42); k <- Seq(2, 4);
         vocab <- Seq(Seq("aa", "bb", "cc", "dd"),
                      Seq("a", "b", "ab", "bb"))) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 40L).map { i =>
        i -> (1 to (1 + rnd.nextInt(12)))
          .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      // reference: span -> set of docs, then per-doc dup counts
      val byDoc = rows.map { case (id, t) => id -> refShingles(t, k) }
      val docsPerSpan = byDoc.flatMap { case (id, sh) => sh.map(_ -> id) }
        .groupBy(_._1).map { case (sh, xs) => sh -> xs.map(_._2).size }
      val want = byDoc.map { case (id, sh) =>
        id -> ((sh.size.toLong, sh.count(docsPerSpan(_) >= 2).toLong))
      }.toMap
      val got = Dedup.spanDupStats(frame(rows), "id", "text", k = k)
        .select("id", "n_spans", "n_dup_spans")
        .as[(Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == want, s"seed=$seed k=$k vocab=$vocab")
    }
  }

  test("capPerGroupBudget equals the sequential reference across seeds") {
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("id", LongType), StructField("tok", LongType)))
    for (seed <- Seq(5, 19); budget <- Seq(10L, 37L)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 60L).map(i =>
        (s"g${rnd.nextInt(4)}", i, 1L + rnd.nextInt(20)))
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        var cum = 0L
        rs.sortBy(_._2).flatMap { case (_, id, tok) =>
          val keep = cum < budget
          cum += tok
          if (keep) Some(id -> cum) else None
        }
      }.toMap
      val df = spark.createDataFrame(
        java.util.Arrays.asList(rows.map(Row.fromTuple): _*), schema)
      val got = TextAnalysis.capPerGroupBudget(df, "g", "id", col("tok"),
          budget)
        .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
      assert(got == want, s"seed=$seed budget=$budget")
    }
  }

  test("capPerGroupBudgetSkew equals the sequential reference across seeds, budgets, bucketings") {
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("id", LongType), StructField("ord", DoubleType),
      StructField("tok", LongType)))
    for (seed <- Seq(5, 19, 31); budget <- Seq(10L, 37L, 5000L);
         buckets <- Seq(4, 1024)) {
      val rnd = new scala.util.Random(seed)
      // non-unique order keys (quality scores collide) force the idCol
      // tie-break; one group is 10x wider than the rest (the skew the
      // variant exists for); budget 5000 leaves every group uncut
      val rows = (1L to 80L).map { i =>
        val g = if (i <= 50) "wide" else s"g${rnd.nextInt(3)}"
        (g, i, (rnd.nextInt(12) / 3).toDouble, 1L + rnd.nextInt(20))
      }
      val want = rows.groupBy(_._1).flatMap { case (_, rs) =>
        var cum = 0L
        rs.sortBy(r => (r._3, r._2)).flatMap { case (_, id, _, tok) =>
          val keep = cum < budget
          cum += tok
          if (keep) Some(id) else None
        }
      }.toSet
      val df = spark.createDataFrame(
        java.util.Arrays.asList(rows.map(Row.fromTuple): _*), schema)
      val out = TextAnalysis.capPerGroupBudgetSkew(df, "g", "ord", "id",
        col("tok"), budget, buckets = buckets)
      val got = out.select("id").as[Long].collect().toSet
      assert(got == want, s"seed=$seed budget=$budget buckets=$buckets")
      // the whole point: at most ONE Window in the plan, fed by the
      // threshold-bucket filter — the bulk keep/drop is a narrow filter
      val plan = out.queryExecution.executedPlan.toString
      assert("(?m)^\\s*[+:\\\\*-]*\\s*Window ".r.findAllIn(plan).size <= 1,
        s"bulk path must be window-free:\n$plan")
    }
  }

  test("capPerGroupBudgetSkew boundary discipline: exact-budget edges, loud refusals") {
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("id", LongType), StructField("ord", DoubleType),
      StructField("tok", LongType)))
    def mk(rows: Seq[(String, Long, Double, Long)]) =
      spark.createDataFrame(
        java.util.Arrays.asList(rows.map(Row.fromTuple): _*), schema)
    // cumulative mass hits the budget EXACTLY at a row edge: the next
    // row's prior == budget, not < — it must be dropped
    val exact = mk(Seq(("a", 1L, 1.0, 5L), ("a", 2L, 2.0, 5L),
      ("a", 3L, 3.0, 1L)))
    assert(TextAnalysis.capPerGroupBudgetSkew(exact, "g", "ord", "id",
        col("tok"), budget = 10L)
      .select("id").as[Long].collect().toSet == Set(1L, 2L))
    // all-identical order keys: one bucket, degrades to the windowed
    // behavior, still exact under the id tie-break
    val flat = mk((1L to 10L).map(i => ("a", i, 7.0, 3L)))
    assert(TextAnalysis.capPerGroupBudgetSkew(flat, "g", "ord", "id",
        col("tok"), budget = 7L)
      .select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
    // zero / NULL tokens refuse loudly (exactness depends on strict
    // positivity), and the histogram cap points at the windowed variant
    val zero = mk(Seq(("a", 1L, 1.0, 0L)))
    val e1 = intercept[Exception] {
      TextAnalysis.capPerGroupBudgetSkew(zero, "g", "ord", "id",
        col("tok"), budget = 5L).collect()
    }
    assert(e1.getMessage.contains("strictly positive"))
    // NaN order keys refuse loudly (a NaN buckets to null and would
    // silently vanish from BOTH filter halves)
    val nan = mk(Seq(("a", 1L, 1.0, 2L), ("a", 2L, Double.NaN, 2L)))
    val e3 = intercept[Exception] {
      TextAnalysis.capPerGroupBudgetSkew(nan, "g", "ord", "id",
        col("tok"), budget = 5L).collect()
    }
    assert(e3.getMessage.contains("NaN"))
    val many = mk((1L to 50L).map(i => (s"g$i", i, i.toDouble, 2L)))
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.capPerGroupBudgetSkew(many, "g", "ord", "id",
        col("tok"), budget = 1L, maxHistRows = 10)
    }
    assert(e2.getMessage.contains("capPerGroupBudget"))
  }

  test("quotaSampleSkew equals quotaSample exactly (rows AND ranks) across seeds and quotas") {
    val schema = StructType(Seq(StructField("g", StringType),
      StructField("id", LongType)))
    for (seed <- Seq(3, 11); n <- Seq(5, 40)) {
      val rnd = new scala.util.Random(seed)
      // one group 10x wider than the rest (the wall the variant
      // removes); some groups smaller than the quota (kept whole)
      val rows = (1L to 150L).map { i =>
        val g = if (i <= 100) "wide" else s"g${rnd.nextInt(8)}"
        (g, i)
      }
      val df = spark.createDataFrame(
        java.util.Arrays.asList(rows.map(Row.fromTuple): _*), schema)
      val want = TextAnalysis.quotaSample(df, "g", "id", n, seed)
        .select("g", "id", "sample_rank")
        .as[(String, Long, Int)].collect().toSet
      val got = TextAnalysis.quotaSampleSkew(df, "g", "id", n, seed)
        .select("g", "id", "sample_rank")
        .as[(String, Long, Int)].collect().toSet
      assert(got == want, s"seed=$seed n=$n")
      assert(got.count(_._1 == "wide") == math.min(n, 100),
        s"wide group must fill its quota (seed=$seed n=$n)")
    }
    // histogram overflow refuses and points at the windowed variant
    val many = spark.createDataFrame(java.util.Arrays.asList(
      (1L to 60L).map(i => Row(s"g$i", i)): _*), schema)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.quotaSampleSkew(many, "g", "id", n = 2, seed = 1,
        maxHistRows = 10)
    }
    assert(e.getMessage.contains("quotaSample"))
  }

  test("cdcChunks equals the sequential reference across seeds (incl. empty tokens)") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    for (seed <- Seq(4, 19, 77); modulus <- Seq(3, 8)) {
      val rnd = new scala.util.Random(seed)
      val vocab = (1 to 12).map(i => s"v$i")
      val rows = (1L to 30L).map { id =>
        // occasional empty tokens (double spaces) exercise the
        // tokenizer contract both engines share
        id -> (1 to (5 + rnd.nextInt(40))).map(_ =>
          if (rnd.nextInt(12) == 0) "" else vocab(rnd.nextInt(vocab.length)))
          .mkString(" ")
      }
      def refChunks(text: String): Seq[(Int, Long, String)] = {
        val toks = text.split(" ", -1)
        val out = scala.collection.mutable.Buffer.empty[Seq[String]]
        var cur = scala.collection.mutable.Buffer.empty[String]
        toks.foreach { t =>
          cur += t
          if (Character.digit(md5hex(t).charAt(31), 16) % modulus == 0) {
            out += cur.toSeq; cur = scala.collection.mutable.Buffer.empty
          }
        }
        if (cur.nonEmpty) out += cur.toSeq
        out.toSeq.zipWithIndex.map { case (c, i) =>
          (i, c.size.toLong, c.mkString(" ")) }
      }
      val want = rows.flatMap { case (id, t) =>
        refChunks(t).map { case (i, n, c) => (id, i, n, c) } }.toSet
      val got = TextAnalysis.cdcChunks(frame(rows), "id", "text", modulus)
        .select("id", "chunk_index", "n_chunk_tokens", "chunk_text")
        .as[(Long, Int, Long, String)].collect().toSet
      assert(got == want, s"seed=$seed modulus=$modulus")
    }
  }

  test("exciseContaminatedSpans equals the sequential reference across seeds") {
    // tiny vocabs → real overlaps; the second is variable-width with
    // concatenation collisions ("w"+"1w" == "w1"+"w") to prove both
    // sides delimit shingle tokens
    for (seed <- Seq(6, 29); k <- Seq(3, 5);
         vocab <- Seq((1 to 8).map(i => s"w$i"),
                      Seq("w", "1w", "w1", "1", "w11"))) {
      val rnd = new scala.util.Random(seed)
      def text(n: Int) =
        (1 to n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      val bench = (100L to 103L).map(i => i -> text(4 + rnd.nextInt(8)))
      val corpus = (1L to 40L).map(i => i -> text(1 + rnd.nextInt(20)))
      // reference: benchmark shingle set with the short-doc contract,
      // covered = union of [i, i+k-1] for matching starts
      def shinglesOf(t: String): Seq[String] = {
        val ws = t.split(" ", -1)
        (0 to math.max(ws.length - k, 0)).map(i =>
          ws.slice(i, math.min(i + k, ws.length)).mkString("\u0001"))
      }
      val bset = bench.flatMap(b => shinglesOf(b._2)).toSet
      val want = corpus.map { case (id, t) =>
        val ws = t.split(" ", -1)
        val covered = (0 to math.max(ws.length - k, 0)).flatMap { i =>
          if (bset.contains(ws.slice(i, math.min(i + k, ws.length))
              .mkString("\u0001")))
            i to math.min(i + k - 1, ws.length - 1)
          else Seq.empty
        }.toSet
        val kept = ws.zipWithIndex.filterNot(p => covered.contains(p._2))
        (id, ws.length.toLong, covered.size.toLong, kept.map(_._1).mkString(" "))
      }.toSet
      val got = TextAnalysis.exciseContaminatedSpans(
          frame(corpus), "id", "text",
          frame(bench), "text", k)
        .select("id", "n_tokens", "n_removed", "clean_text")
        .as[(Long, Long, Long, String)].collect().toSet
      assert(got == want, s"seed=$seed k=$k vocab=$vocab")
    }
  }

  test("prefix filters survive the exact-threshold float boundary (J = C = 0.9)") {
    // 0.9*10 rounds to 9.000000000000002 in IEEE doubles; a ceil over
    // it shortens the prefix by one and silently drops pairs sitting
    // EXACTLY at the threshold. The adversarial variant is the one
    // whose non-shared token owns the smallest xxhash64 — it then
    // occupies the entire one-token prefix the buggy bound produces —
    // so pin that variant explicitly (plus a sweep for good measure).
    val sharedToks = (1 to 9).map(i => s"t$i")
    // Build the adversarial variant by construction: widen the candidate
    // pool until at least one extra token xxhash64s below every shared
    // token (xxhash64 is deterministic, so a fixed pool either always
    // holds or always fails — search makes the precondition a certainty).
    var pool = 12
    var hashOf = Map.empty[String, Long]
    var minShared = Long.MaxValue
    while (!(1 to pool).exists(k => hashOf.getOrElse(s"x$k", Long.MaxValue)
        < minShared)) {
      hashOf = spark.createDataset(
          sharedToks ++ (1 to pool).map(k => s"x$k"))(Encoders.STRING)
        .select(col("value"), xxhash64(col("value")).as("h"))
        .as[(String, Long)].collect().toMap
      minShared = sharedToks.map(hashOf).min
      if (!(1 to pool).exists(k => hashOf(s"x$k") < minShared)) pool *= 4
    }
    // Sweep the 12 smallest-hash candidates — the adversarial one
    // (below every shared hash) is guaranteed to be among them — and
    // BOTH prefix orders (canonical df-ascending and native hash):
    // losslessness must hold for each at the exact threshold.
    val extraIdx = (1 to pool).sortBy(k => hashOf(s"x$k")).take(12)
    for (k <- extraIdx; dfOrdered <- Seq(true, false)) {
      val shared = sharedToks
      val a = shared                        // |A| = 9
      val b = shared :+ s"x$k"              // |B| = 10, J = 9/10 = 0.9
      val df = frame(Seq(1L -> a.mkString(" "), 2L -> b.mkString(" ")))
        .select(col("id"), lit("blk").as("b"),
          array_distinct(split(col("text"), " ")).as("ws"))
      val jac = Dedup.jaccardNearDupPairs(df, "id", "ws",
          threshold = 0.9, blockCol = Some("b"),
          dfOrderedPrefix = dfOrdered)
        .select("ida", "idb").as[(Long, Long)].collect().toSet
      assert(jac == Set((1L, 2L)),
        s"jaccard boundary lost pair for x$k dfOrdered=$dfOrdered")
      // containment boundary: |A'| = 10 with exactly 9 in corpus doc
      val a2 = shared :+ s"only$k"          // C(A'→B) = 9/10 = 0.9
      val probe = frame(Seq(1L -> a2.mkString(" ")))
        .select(col("id"), array_distinct(split(col("text"), " ")).as("ws"))
      val corpus = frame(Seq(2L -> b.mkString(" ")))
        .select(col("id"), array_distinct(split(col("text"), " ")).as("ws"))
      val cont = Dedup.containmentPairs(probe, corpus, "id", "ws",
          threshold = 0.9)
        .select("ida", "idb").as[(Long, Long)].collect().toSet
      assert(cont == Set((1L, 2L)), s"containment boundary lost pair for x$k")
    }
  }

  test("jaccard prefix orders agree across random corpora (df-ascending == native hash)") {
    // the prefix bound is lossless for ANY total order, so the two
    // implementations must produce IDENTICAL pair sets — heavy span
    // sharing from a tiny vocab stresses both candidate generators
    for (seed <- Seq(7, 23); t <- Seq(0.5, 0.8)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Seq("aa", "bb", "cc", "dd", "ee")
      val rows = (1L to 60L).map { i =>
        i -> (1 to (3 + rnd.nextInt(7)))
          .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      val df = frame(rows)
        .select(col("id"), array_distinct(split(col("text"), " ")).as("ws"))
        .filter(size(col("ws")) > 0)
      def pairs(dfOrdered: Boolean) =
        Dedup.jaccardNearDupPairs(df, "id", "ws", threshold = t,
            dfOrderedPrefix = dfOrdered)
          .select("ida", "idb").as[(Long, Long)].collect().toSet
      val (canonical, hashed) = (pairs(true), pairs(false))
      assert(canonical == hashed && canonical.nonEmpty, s"seed=$seed t=$t")
    }
  }

  test("semanticDedup equals driver union-find over brute-force pairs") {
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", ArrayType(FloatType, containsNull = false))))
    for (seed <- Seq(2, 13)) {
      val rnd = new scala.util.Random(seed)
      // random unit-ish vectors plus planted twins → real clusters
      val base = (1L to 25L).map { i =>
        i -> Array.fill(4)(rnd.nextGaussian().toFloat)
      }
      val twins = base.take(8).map { case (i, v) =>
        (i + 100L) -> v.zipWithIndex.map { case (x, j) =>
          if (j == 0) x + 0.001f else x }
      }
      val rows = base ++ twins
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val d = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
        d / math.sqrt(a.map(x => x.toDouble * x).sum) /
          math.sqrt(b.map(x => x.toDouble * x).sum)
      }
      // driver union-find over all-pairs at the threshold
      val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      for ((ia, va) <- rows; (ib, vb) <- rows if ia < ib
           if cos(va, vb) >= 0.99) {
        val (ra, rb) = (find(ia), find(ib))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = rows.map(r => r._1 -> find(r._1)).toMap
      val df = spark.createDataFrame(java.util.Arrays.asList(
        rows.map { case (i, v) => Row(i, v.toSeq) }: _*), schema)
      val got = Similarity.semanticDedup(df, "id", "v", threshold = 0.99)
        .select("id", "cluster_id").as[(Long, Long)].collect().toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("cleanLines equals the rule-by-rule reference across seeds") {
    val blacklist = Seq("cookie", "javascript", "terms of use",
      "privacy policy")
    def refKeep(l: String): Boolean = {
      val lt = l.trim
      lt.nonEmpty &&
        Set('.', '!', '?').contains(lt.last) &&
        lt.split(" ", -1).length >= 3 &&
        blacklist.forall(b => !lt.toLowerCase.contains(b))
    }
    val frags = Seq("good solid line", "cookie", "ok", "short", "x y z",
      "   ", "accept the Terms of Use", "fine words here")
    val ends = Seq(".", "!", "?", "", " ")
    for (seed <- Seq(5, 17, 99)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1L to 30L).map { i =>
        i -> (1 to (1 + rnd.nextInt(6))).map(_ =>
          frags(rnd.nextInt(frags.length)) + ends(rnd.nextInt(ends.length)))
          .mkString("\n")
      }
      val want = rows.map { case (id, t) =>
        id -> t.split("\n", -1).toSeq.filter(refKeep)
      }.toMap
      val got = frame(rows)
        .select(col("id"), TextAnalysis.cleanLines(col("text")).as("k"))
        .as[(Long, Seq[String])].collect().toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("tokenEntropy equals the driver-side reference across seeds") {
    for (seed <- Seq(7, 23, 61)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Seq("a", "bb", "ccc", "dd", "e")
      val rows = (1L to 30L).map { i =>
        i -> (1 to (1 + rnd.nextInt(15)))
          .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      }
      def round6(x: Double) = BigDecimal(x)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val want = rows.map { case (id, t) =>
        val counts = t.split(" ", -1).filter(_.nonEmpty)
          .groupBy(identity).map(_._2.length)
        val n = counts.sum.toDouble
        val h = round6(-counts.map(c => c / n * math.log(c / n)).sum + 0.0)
        val ratio = if (counts.size == 1) 1.0
          else round6(h / math.log(counts.size))
        id -> ((counts.sum.toLong, counts.size.toLong, h, ratio))
      }.toMap
      val got = TextAnalysis.tokenEntropy(frame(rows), "id", "text")
        .select("id", "n_tokens", "n_distinct", "entropy", "entropy_ratio")
        .as[(Long, Long, Long, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("temperatureQuota equals the md5-rank reference across seeds") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    for (seed <- Seq(2, 31); nGroups <- Seq(2, 5)) {
      val rnd = new scala.util.Random(seed)
      // skewed random group sizes incl. a singleton
      val rows = (1L to 60L).map(i => i -> s"g${rnd.nextInt(nGroups)}") :+
        (61L -> "lonely")
      val sizes = rows.groupBy(_._2).map { case (g, xs) => g -> xs.size }
      val nmin = sizes.values.min
      val quota = sizes.map { case (g, n) =>
        g -> math.round(math.sqrt(nmin.toDouble * n))
      }
      val want = rows.groupBy(_._2).flatMap { case (g, xs) =>
        xs.map(_._1).sortBy(id => (md5hex(s"tq:$seed:$id"), id))
          .take(quota(g).toInt)
      }.toSet
      val df = rows.toDF("id", "grp")
      val got = TextAnalysis.temperatureQuota(df, "grp", "id", seed = seed)
        .select("id").as[Long].collect().toSet
      assert(got == want, s"seed=$seed nGroups=$nGroups")
    }
  }
}
