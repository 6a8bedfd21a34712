package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.VersionedTable

/** Incrementally-maintained duplicate clusters
  * ([[Dedup.maintainClusters]]): maintained labels must equal a full
  * CC recompute over the ACCUMULATED pair set at every version, the
  * re-resolve work must be bounded by the delta's neighborhood
  * (untouched clusters never read, unchanged members never
  * rewritten), and the loud contracts (unknown endpoints,
  * re-arrivals) must refuse. */
class ClusterMaintenanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ccmaint").toString

  private def fullRecompute(ids: Seq[Long],
      pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.resolveClusters(ids.toDF("id"), "id",
        pairs.toDF("ida", "idb"))
      .as[(Long, Long)].collect().toMap

  private def tableLabels(root: String): Map[Long, Long] =
    VersionedTable.read(spark, root)
      .as[(Long, Long)].collect().toMap

  test("maintained labels equal full recompute across a churn timeline " +
      "(singletons, growth, and a cluster-merging bridge)") {
    val root = tmp() + "/labels"
    // v1: corpus of 1..12 with two clusters {1,2,3} and {7,8} plus
    // singletons
    val ids0 = (1L to 12L)
    val pairs0 = Seq((1L, 2L), (2L, 3L), (7L, 8L))
    VersionedTable.create(spark, root,
      Dedup.resolveClusters(ids0.toDF("id"), "id",
        pairs0.toDF("ida", "idb")))
    assert(tableLabels(root) == fullRecompute(ids0, pairs0))

    // batch 1: arrivals 20..23; 20 joins cluster {7,8}, 21 pairs with
    // 22 (new-only cluster), 23 is a singleton
    val p1 = Seq((20L, 7L), (21L, 22L))
    val r1 = Dedup.maintainClusters(spark, root, "id",
      Seq(20L, 21L, 22L, 23L).toDF("id"), p1.toDF("ida", "idb"))
    val want1 = fullRecompute(ids0 ++ Seq(20L, 21L, 22L, 23L),
      pairs0 ++ p1)
    assert(tableLabels(root) == want1)
    // only cluster {7,8} was touched — {1,2,3} and the singletons
    // were never read
    assert(r1.touchedClusters == 1 && r1.touchedRows == 2 &&
      r1.newRows == 4)

    // batch 2: arrival 30 BRIDGES clusters {1,2,3} and {7,8,20} —
    // the merge case min-id stability exists for (merged min = 1)
    val p2 = Seq((30L, 3L), (30L, 8L))
    val r2 = Dedup.maintainClusters(spark, root, "id",
      Seq(30L).toDF("id"), p2.toDF("ida", "idb"))
    val want2 = fullRecompute(ids0 ++ Seq(20L, 21L, 22L, 23L, 30L),
      pairs0 ++ p1 ++ p2)
    assert(tableLabels(root) == want2)
    assert(tableLabels(root)(20L) == 1L,
      "the bridged cluster must take the merged minimum")
    assert(r2.touchedClusters == 2 && r2.touchedRows == 6)

    // batch 3: pure singleton arrivals, no pairs — labels self, no
    // existing cluster touched
    val r3 = Dedup.maintainClusters(spark, root, "id",
      Seq(40L, 41L).toDF("id"),
      Seq.empty[(Long, Long)].toDF("ida", "idb"))
    assert(r3.touchedClusters == 0 && r3.touchedRows == 0 &&
      r3.newRows == 2)
    assert(tableLabels(root)(40L) == 40L && tableLabels(root)(41L) == 41L)
  }

  test("delta-bounding is real: an untouched wide cluster's files are " +
      "not rewritten, and a no-op batch commits nothing") {
    val root = tmp() + "/labels"
    // a WIDE cluster 100..299 (all labeled 100) and a small one {1,2}
    val wide = (100L to 299L).map(i => (i, 100L))
    val small = Seq((1L, 1L), (2L, 1L))
    VersionedTable.create(spark, root,
      (wide ++ small).toDF("id", "cluster_id"))
    val v0 = VersionedTable.currentVersion(spark, root).get
    // arrival 5 joins the SMALL cluster: the wide cluster must not be
    // touched (receipts pin the re-resolve set at the small cluster)
    val r = Dedup.maintainClusters(spark, root, "id",
      Seq(5L).toDF("id"), Seq((5L, 2L)).toDF("ida", "idb"))
    assert(r.touchedClusters == 1 && r.touchedRows == 2 && r.newRows == 1)
    assert(tableLabels(root)(5L) == 1L)
    // unchanged members were not rewritten: the merge's source is the
    // CHANGED set only, so the commit adds files for one upsert, and
    // the wide cluster's rows still read back intact
    assert(tableLabels(root).count(_._2 == 100L) == 200)
    // no-op batch: no arrivals, no pairs — version must NOT advance
    val vAfter = VersionedTable.currentVersion(spark, root).get
    val rNoop = Dedup.maintainClusters(spark, root, "id",
      Seq.empty[Long].toDF("id"),
      Seq.empty[(Long, Long)].toDF("ida", "idb"))
    assert(rNoop.version == vAfter &&
      VersionedTable.currentVersion(spark, root).get == vAfter)
    assert(vAfter > v0)
  }

  test("loud contracts: unknown pair endpoints and re-arrivals refuse") {
    val root = tmp() + "/labels"
    VersionedTable.create(spark, root,
      Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster_id"))
    // endpoint 99 is in neither the table nor the arrivals
    val e1 = intercept[IllegalArgumentException] {
      Dedup.maintainClusters(spark, root, "id",
        Seq(10L).toDF("id"), Seq((10L, 99L)).toDF("ida", "idb"))
    }
    assert(e1.getMessage.contains("neither"))
    // id 2 already exists — ids are immutable identity
    val e2 = intercept[IllegalArgumentException] {
      Dedup.maintainClusters(spark, root, "id",
        Seq(2L).toDF("id"),
        Seq.empty[(Long, Long)].toDF("ida", "idb"))
    }
    assert(e2.getMessage.contains("immutable"))
  }
}
