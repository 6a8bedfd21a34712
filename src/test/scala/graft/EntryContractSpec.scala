package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over SparkEntry: the oracle map and the
  * query map must stay in lockstep — an oracle without a query is dead
  * SQL the driver reports as MISSING-DUMP, and a query without an
  * oracle silently downgrades to the weaker rows-only check. Any NEW
  * rows-only query must be added here deliberately. */
class EntryContractSpec extends AnyFunSuite {

  // xxhash64/LSH bucketing has no DuckDB form — rows-only BY DESIGN
  private val rowsOnlyByDesign =
    Set("q20_minhash_pairs", "q22_simhash_pairs", "q28_ann_lsh")

  test("every oracle belongs to a query; only the designed rows-only queries lack one") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty,
      s"oracles without a query: ${(os -- qs).toSeq.sorted}")
    assert((qs -- os) == rowsOnlyByDesign,
      s"unexpected rows-only queries: ${(qs -- os -- rowsOnlyByDesign).toSeq.sorted}")
  }

  // NOTE the HUGEINT dtype trap (DuckDB integer SUM → HUGEINT →
  // pandas float64 vs Spark int64 in the driver hasher) is guarded
  // EMPIRICALLY by tools/dtype_check.py over actual Verify output —
  // a textual SUM scan cannot tell an internal comparison sum from a
  // projected one.
}
