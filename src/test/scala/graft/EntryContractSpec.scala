package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over SparkEntry: the oracle map and the
  * query map must stay in lockstep — an oracle without a query is dead
  * SQL the driver reports as MISSING-DUMP, and a query without an
  * oracle silently downgrades to the weaker rows-only check. Any NEW
  * rows-only query must be added here deliberately. */
class EntryContractSpec extends AnyFunSuite {

  // r12: the last rows-only rows (q20/q22/q28 raw LSH dumps) are
  // retired — their operators are certified by the full-oracle capture
  // audits q131/q132/q133. EVERY query must now carry an oracle; a new
  // rows-only query is a contract break, not a default.
  test("every oracle belongs to a query and every query has an oracle") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty,
      s"oracles without a query: ${(os -- qs).toSeq.sorted}")
    assert((qs -- os).isEmpty,
      s"queries without an oracle: ${(qs -- os).toSeq.sorted}")
  }

  // NOTE the HUGEINT dtype trap (DuckDB integer SUM → HUGEINT →
  // pandas float64 vs Spark int64 in the driver hasher) is guarded
  // EMPIRICALLY by tools/dtype_check.py over actual Verify output —
  // a textual SUM scan cannot tell an internal comparison sum from a
  // projected one.
}
