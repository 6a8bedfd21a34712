package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale text corpora — the BASELINE
  * extension surface (SURVEY §0, §7.1 item 7). The reference only
  * *recognizes* Fuzzy Grouping (data_engineering_parser.py:1114); here
  * the machinery is real and built scale-first:
  *
  *   - candidate generation is ALWAYS blocked/banded (LSH bands or
  *     band-hash buckets), never an all-pairs product;
  *   - signatures are computed with codegen'd native functions
  *     (xxhash64, higher-order array ops) — no UDFs in the hot path;
  *   - verification joins carry only (id, signature) pairs and re-join
  *     the shingle sets, so the exploded band table stays narrow.
  */
object Dedup {

  // ---------- exact ----------

  /** Exact dedup: keep one row per key set, the one with the smallest
    * `orderCol` (deterministic, unlike dropDuplicates' arbitrary pick).
    * One hash-partition shuffle on the key. */
  def exactKeepFirst(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Exact content dedup at scale: group on a 64-bit content hash, not
    * the content itself — the shuffle carries 8 bytes per row instead of
    * the document. */
  def exactByContent(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    exactKeepFirst(df.withColumn("__h", xxhash64(col(contentCol))), Seq("__h"), idCol)
      .drop("__h")

  // ---------- shingling & Jaccard ----------

  /** Whitespace tokens (exact single-space split — matches the oracle's
    * string_split semantics on the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct k-gram token shingles joined with a U+0001 separator. */
  def shingles(text: Column, k: Int): Column = {
    val t = tokens(text)
    val grams = transform(
      sequence(lit(0), greatest(size(t) - lit(k), lit(0))),
      i => concat_ws("\u0001", slice(t, i + lit(1), lit(k))))
    array_distinct(grams)
  }

  /** Exact Jaccard similarity of two pre-distinct arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  // ---------- MinHash + banded LSH ----------

  /** MinHash signature: H independent hash functions realized as
    * xxhash64 seeded by position — array<long> of length `numHashes`. */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(shingleSet, s => xxhash64(lit(i), s)))
    }: _*)

  /** Banded LSH keys: split the signature into `bands` bands of
    * `rowsPerBand` and hash each — array<struct<band:int,key:long>>. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand)).as("key"))
    }: _*)

  /** Near-duplicate pairs via MinHash-LSH banding: candidates are id
    * pairs sharing ≥1 band bucket; each candidate is verified with the
    * exact shingle Jaccard. Returns (idA, idB, jaccard_sim), idA < idB.
    *
    * Scale shape: the exploded band table is (id, band, key) — 20 bytes
    * a row — and the candidate join shuffles on (band, key). Skewed
    * buckets (a degenerate shingle shared by everything) are the one
    * hazard; cap bucket width upstream if the corpus has boilerplate.
    */
  def minhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val withSets = df.select(col(idCol).as("id"),
        shingles(col(textCol), k).as("sh"))
      .filter(size(col("sh")) > 0)
    val sets = withSets.persist()
    val banded = sets
      .select(col("id"),
        explode(lshBandKeys(minhashSignature(col("sh"), numHashes), bands,
          numHashes / bands)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = banded.alias("l")
    val r = banded.alias("r")
    val candidates = l.join(r,
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("ida"), col("r.id").as("idb"))
      .distinct()
    val a = sets.select(col("id").as("ida"), col("sh").as("sha"))
    val b = sets.select(col("id").as("idb"), col("sh").as("shb"))
    candidates.join(a, "ida").join(b, "idb")
      .select(col("ida"), col("idb"),
        jaccard(col("sha"), col("shb")).as("jaccard_sim"))
      .filter(col("jaccard_sim") >= threshold)
  }

  /** Fuzzy dedup: drop every document that has a near-duplicate with a
    * smaller id (the canonical survivor is the earliest). */
  def minhashDedup(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, numHashes: Int = 64, bands: Int = 16,
      threshold: Double = 0.5): DataFrame = {
    val dupIds = minhashNearDupPairs(df, idCol, textCol, k, numHashes, bands, threshold)
      .select(col("idb").as(idCol)).distinct()
    df.join(dupIds, Seq(idCol), "left_anti")
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash over the token multiset: each token votes ±1 on
    * every bit of its xxhash64; the fingerprint keeps the majority sign.
    * Pure native expressions (aggregate/zip_with over a 64-slot array). */
  def simhash64(text: Column): Column = {
    val bitVotes = (t: Column) => transform(
      sequence(lit(0), lit(63)),
      i => when(call_function("shiftright", xxhash64(t), i).bitwiseAND(lit(1L)) === lit(1L),
        lit(1L)).otherwise(lit(-1L)))
    val votes = aggregate(
      tokens(text),
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc, bitVotes(t), (a, b) => a + b))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs, blocked on 16-bit bands of the fingerprint
    * (two fingerprints within Hamming distance 3 share ≥1 of 4 bands —
    * the classic pigeonhole blocking; never all-pairs). */
  def simhashNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"), simhash64(col(textCol)).as("fp")).persist()
    val banded = fp.select(col("id"), col("fp"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          call_function("shiftright", col("fp"), lit(b * 16))
            .bitwiseAND(lit(0xFFFFL)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("fp"), col("bk.band").as("band"), col("bk.key").as("key"))
    val l = banded.alias("l")
    val r = banded.alias("r")
    l.join(r, col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col("l.id") < col("r.id"))
      .select(col("l.id").as("ida"), col("r.id").as("idb"),
        hamming(col("l.fp"), col("r.fp")).as("hamming_dist"))
      .distinct()
      .filter(col("hamming_dist") <= maxHamming)
  }
}
