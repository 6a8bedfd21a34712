package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Scale utilities: bucketed joins must not shuffle; salted joins must
  * equal their unsalted counterpart. */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val facts = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") * 2).as("v1"))
    val dims = spark.range(0, 100).select(col("id").as("k"),
      (col("id") * 3).as("v2"))
    spark.sql("DROP TABLE IF EXISTS bkt_facts")
    spark.sql("DROP TABLE IF EXISTS bkt_dims")
    Scale.writeBucketed(facts, "bkt_facts", 4, Seq("k"))
    Scale.writeBucketed(dims, "bkt_dims", 4, Seq("k"))
    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("bkt_facts").join(spark.table("bkt_dims"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == 100)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("changedKeys prefilter: downstream output equals the unfiltered pipeline") {
    val target = spark.range(0, 1000).select(col("id").as("k"),
      (col("id") % 7).as("payload"), (col("id") % 7).as("cs"))
    // feed: keys 100..1099; payload changed for k % 10 == 0
    val feed = spark.range(100, 1100).select(col("id").as("k"),
      when(col("id") % 10 === 0, lit(99L)).otherwise(col("id") % 7).as("payload"))
      .withColumn("cs", col("payload"))
    def upserted(f: org.apache.spark.sql.DataFrame,
        t: org.apache.spark.sql.DataFrame) =
      f.alias("f").join(t.alias("t"), Seq("k"), "full_outer")
        .filter(!(col("f.cs") <=> col("t.cs")))
        .select(col("k"),
          coalesce(col("f.payload"), col("t.payload")).as("payload"))
    val plain = upserted(feed, target).collect().toSet
    val (fc, tc) = Scale.changedKeys(feed, target, Seq("k"),
      col("cs"), col("cs"))
    val filtered = upserted(fc, tc).collect().toSet
    assert(filtered == plain && plain.nonEmpty)
    // the prefilter really prunes: unchanged matching keys are gone
    assert(fc.count() < feed.count() && tc.count() < target.count())
  }

  test("curation-op plan shapes hold: projections stay shuffle-free, top-k avoids SinglePartition") {
    val docs = spark.range(0, 200).select(col("id"),
      concat_ws(" ", lit("the"), lit("word"), (col("id") % 9).cast("string"),
        lit("tail"), (col("id") % 4).cast("string")).as("text"))
    // duplicate-n-gram screen: pure projection, zero exchanges
    val (occ, rep) = graft.ext.TextAnalysis.repeatedNgramCounts(col("text"), 3)
    val repPlan = docs.select(col("id"), occ.as("o"), rep.as("r"))
      .queryExecution.executedPlan.toString
    assert(!repPlan.contains("Exchange"),
      s"repeated-ngram screen must be map-only:\n$repPlan")
    // vocabulary top-k: TakeOrderedAndProject, never a single-partition
    // shuffle of the term table
    val vocabPlan = graft.ext.TextAnalysis.vocabOovRate(docs, "id", "text",
        vocabSize = 5)
      .queryExecution.executedPlan.toString
    assert(vocabPlan.contains("TakeOrderedAndProject"),
      s"vocab top-k should plan TakeOrderedAndProject:\n$vocabPlan")
    assert(!vocabPlan.contains("Exchange SinglePartition"),
      s"vocab top-k must not single-partition the term table:\n$vocabPlan")
    // per-group budget cap: exactly one hash exchange (the group key)
    val capPlan = graft.ext.TextAnalysis.capPerGroupBudget(docs, "text",
        "id", lit(1L), budget = 3L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(capPlan).size == 1,
      s"budget cap should shuffle once, on the group key:\n$capPlan")
  }

  test("round-7 op plan shapes: projection ops stay map-only, selection broadcasts back") {
    val docs = spark.range(0, 200).select(col("id"),
      concat_ws(" ", lit("alpha"), (col("id") % 9).cast("string"),
        lit("beta"), (col("id") % 4).cast("string")).as("text"))
    val vecs = spark.range(0, 50).select(col("id"),
      array((0 until 6).map(i => (col("id") * (i + 1)).cast("float")
        / lit(50.0f)): _*).as("v"))
    // CDC chunking: per-row array lambdas — zero exchanges
    val cdcPlan = graft.ext.TextAnalysis.cdcChunks(docs, "id", "text", 8)
      .queryExecution.executedPlan.toString
    assert(!cdcPlan.contains("Exchange"),
      s"CDC chunking must be map-only:\n$cdcPlan")
    // deterministic split: pure projection — zero exchanges
    val splitPlan = graft.ext.TextAnalysis.deterministicSplit(
        docs, "id", seed = 1, trainCut = 204, valCut = 230)
      .queryExecution.executedPlan.toString
    assert(!splitPlan.contains("Exchange"),
      s"deterministic split must be map-only:\n$splitPlan")
    // signed random projection: native vec_dot over sign literals —
    // zero exchanges
    val rpPlan = graft.ext.Similarity.signedRandomProjection(
        vecs, "id", "v", dim = 6, outDim = 3, seed = 1)
      .queryExecution.executedPlan.toString
    assert(!rpPlan.contains("Exchange"),
      s"random projection must be map-only:\n$rpPlan")
    // variance selection: top-k dims broadcast back onto the exploded
    // vectors — a broadcast join, never a shuffle of the vector side
    val vsPlan = graft.ext.Similarity.selectTopVarianceDims(
        vecs, "id", "v", k = 2)
      .queryExecution.executedPlan.toString
    assert(vsPlan.contains("BroadcastHashJoin"),
      s"variance selection should broadcast the kept-dim set:\n$vsPlan")
  }

  test("round-8 plan shapes: banded cosine verify joins broadcast under the gate") {
    // candidates outnumber vectors quadratically — the exact-verify
    // joins must broadcast the id->vector side below the size gate so
    // candidate rows never shuffle with a full vector attached
    val vecs = spark.range(0, 60).select(col("id"),
      array((0 until 8).map(i => (col("id") * (i + 1)).cast("float")
        / lit(60.0f)): _*).as("v"))
    val plan = graft.ext.Similarity.cosineNearDupPairs(
        vecs, "id", "v", threshold = 0.99)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"verify joins should broadcast the vector side:\n$plan")
  }

  test("z-order compaction: content identity, both-dimension skipping, sizing cache released") {
    // 40x40 uniform grid — the shape where single-dim sorting gives
    // zero skipping on the second dimension
    val grid = spark.range(0, 1600).select(
      (col("id") % 40).as("a"), (col("id") / 40).cast("long").as("b"),
      col("id").as("payload"))
    val path = java.nio.file.Files.createTempDirectory("graft_zorder")
      .toString + "/t"
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val files = Scale.compactWriteZ(grid, path, targetRowsPerFile = 100L,
      colA = "a", colB = "b")
    val back = spark.read.parquet(path)
    // compaction never changes rows
    assert(back.select("a", "b", "payload").collect().toSet ==
      grid.collect().toSet)
    // per-file stats must be narrow on BOTH dims: a bottom-decile
    // predicate on either dimension hits at most half the files
    // (q121-style range sort would make every file span dim b fully)
    val stats = back.groupBy(input_file_name())
      .agg(min("a"), max("a"), min("b"), max("b"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(stats.length == files && files >= 8, s"files=$files")
    val hitA = stats.count(_._1 <= 3L)  // a in [0, 3] = bottom decile
    val hitB = stats.count(_._3 <= 3L)
    assert(hitA <= files / 2, s"a-predicate hit $hitA of $files files")
    assert(hitB <= files / 2, s"b-predicate hit $hitB of $files files")
    // the derived (non-scan) input was persisted for sizing and the
    // blocks are dropped before returning (snapshot-relative: other
    // suites share the session and may hold contract-persisted frames)
    assert(spark.sparkContext.getPersistentRDDs.keySet == cachedBefore,
      "sizing cache leaked")
  }

  test("compactWrite sizes derived inputs from a cache, bare scans as-is") {
    // derived input (aggregate): persisted for the sizing count, one
    // source pass, cache released afterwards
    val derived = spark.range(0, 500)
      .groupBy((col("id") % 50).as("k")).agg(count(lit(1)).as("n"))
    val path = java.nio.file.Files.createTempDirectory("graft_compact")
      .toString + "/t"
    val cachedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val files = Scale.compactWrite(derived, path, targetRowsPerFile = 10L,
      sortCols = Seq("k"))
    assert(files == 5)
    assert(spark.read.parquet(path).collect().toSet ==
      derived.collect().toSet)
    assert(spark.sparkContext.getPersistentRDDs.keySet == cachedBefore,
      "sizing cache leaked")
  }

  test("salted join equals the plain join result") {
    // one hot key (0) with many rows, plus a long tail
    val left = spark.range(0, 2000)
      .select(when(col("id") < 1000, 0L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val right = Seq((0L, "hot"), (1500L, "cold"), (9999L, "unmatched"))
      .toDF("k", "name")
    val plain = left.join(right, Seq("k"), "inner")
      .select("k", "payload", "name").collect().toSet
    val salted = Scale.saltedJoin(left, right, Seq("k"), saltFactor = 8)
      .select("k", "payload", "name").collect().toSet
    assert(salted == plain && plain.size == 1001)
    val saltedDet = Scale.saltedJoinBy(left, right, Seq("k"), 8, col("payload"))
      .select("k", "payload", "name").collect().toSet
    assert(saltedDet == plain)
  }

  test("auto salt factor: hottest key's fair-share multiple, 1 when uniform") {
    // 50% hot key over 32 shuffle partitions: the hot key holds 16
    // fair shares -> factor 16 (the formula, exactly)
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val skewed = spark.range(0, 10000)
      .select(when(col("id") < 5000, 0L).otherwise(col("id")).as("k"),
        col("id").as("payload"))
    val expected = math.min(64,
      math.ceil(5000.0 / math.max(1, 10000 / parts)).toInt)
    assert(Scale.hotKeyFactor(skewed, Seq("k")) == expected)
    // uniform keys: factor 1, and the auto join takes the plain path
    val uniform = spark.range(0, 10000)
      .select(col("id").as("k"), col("id").as("payload"))
    assert(Scale.hotKeyFactor(uniform, Seq("k")) == 1)
    // sampled histogram still sees a 50% hot key
    assert(Scale.hotKeyFactor(skewed, Seq("k"), sampleFraction = 0.2) >=
      expected / 2)
    // auto join: same rows as the plain join on the skewed shape
    val right = Seq((0L, "hot"), (7500L, "cold"), (99999L, "unmatched"))
      .toDF("k", "name")
    val plain = skewed.join(right, Seq("k"), "inner")
      .select("k", "payload", "name").collect().toSet
    val (auto, factor) = Scale.saltedJoinAuto(skewed, right, Seq("k"),
      col("payload"))
    assert(factor == expected)
    assert(auto.select("k", "payload", "name").collect().toSet == plain)
  }
}
