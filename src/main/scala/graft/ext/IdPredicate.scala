package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bounded-size scan predicates over a collected id set — the shared
  * fix for the "`isin` literal grows with the candidate set" hazard in
  * the index re-rank paths ([[IvfIndex.probe]]'s bounded-pool corpus
  * read, [[Bm25Index]]'s doclens read): a probe batch of 1,000 queries
  * at pool 200 is a 200k-element `In` literal — plan bloat, analyzer
  * cost, and codegen risk that all grow with the batch.
  *
  * Instead, the SORTED id set is merged into at most `maxRanges`
  * `[lo, hi]` intervals — numeric ids split at the LARGEST GAPS (the
  * tightest cover a fixed interval budget can buy), strings into
  * contiguous equal-count chunks — and the predicate becomes an OR of
  * BETWEENs whose size is CONSTANT in the id count. The manifest
  * pruner skips files on min/max stats, so a range predicate prunes
  * exactly as well as the id list it covers (stats pruning is interval
  * containment either way); the cover is a SUPERSET of the ids, so
  * every caller re-joins on the exact id column afterwards — both
  * call sites already do (inner/semi joins on the id).
  */
private[graft] object IdPredicate {

  /** Max ids a caller should collect before falling back to a
    * streaming join — bounds the driver round-trip (a few MB), NOT the
    * plan (that is [[ranges]]' job). */
  val MaxCollectedIds = 262144

  /** Merge a SORTED id seq into at most `maxRanges` [lo, hi] covering
    * intervals. Numeric ids (Byte/Short/Int/Long) split at the
    * `maxRanges - 1` largest gaps; strings split into contiguous
    * equal-count chunks (no numeric gap metric, but coverage and
    * boundedness hold the same). `None` when the id type has no
    * useful range order — the caller falls back to its join. */
  def ranges(sortedIds: Seq[Any], maxRanges: Int): Option[Seq[(Any, Any)]] = {
    require(maxRanges > 0, s"maxRanges must be positive: $maxRanges")
    if (sortedIds.isEmpty) return Some(Seq.empty)
    // O(1) indexing: the callers hand in collected Seqs (often Lists)
    // and the gap sort below indexes — a linear-seq apply here is the
    // O(n² log n) trap this helper exists to avoid
    val ids = sortedIds.toIndexedSeq
    ids.head match {
      case _: Byte | _: Short | _: Int | _: Long =>
        val longs = ids.map(_.asInstanceOf[Number].longValue()).toArray
        // split AFTER the positions with the largest forward gaps.
        // Gaps compare UNSIGNED: hash-derived ids span the full signed
        // range, so a true gap can exceed Long.MaxValue and the plain
        // difference wraps negative — a signed sort would then cut
        // inside clusters and leave intervals spanning the void
        // (correct via the re-join, but at full-scan cost). The
        // wrapped difference of ascending longs IS the true gap
        // mod 2^64, so unsigned comparison orders it right.
        def gap(i: Int): Long = longs(i + 1) - longs(i)
        val cuts =
          if (ids.size <= maxRanges) (0 until longs.length - 1).toSet
          else longs.indices.init
            .sortWith((a, b) =>
              java.lang.Long.compareUnsigned(gap(a), gap(b)) > 0 ||
                (gap(a) == gap(b) && a < b))
            .take(maxRanges - 1).toSet
        val out = Seq.newBuilder[(Any, Any)]
        var lo = 0
        longs.indices.foreach { i =>
          if (i == longs.length - 1 || cuts(i)) {
            out += ((ids(lo), ids(i)))
            lo = i + 1
          }
        }
        Some(out.result())
      case _: String =>
        val chunk = math.max(1, (ids.size + maxRanges - 1) / maxRanges)
        Some(ids.grouped(chunk).map(g => (g.head, g.last)).toSeq)
      case _ => None
    }
  }

  /** The OR-of-BETWEENs column for [[ranges]]; `None` when the id type
    * is not rangeable, `lit(false)` for an empty set. */
  def predicate(c: Column, sortedIds: Seq[Any],
      maxRanges: Int = 128): Option[Column] =
    ranges(sortedIds, maxRanges).map { rs =>
      if (rs.isEmpty) lit(false)
      else rs.map { case (lo, hi) =>
        if (lo == hi) c === lit(lo) else c >= lit(lo) && c <= lit(hi)
      }.reduce(_ || _)
    }
}
