package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: prints the formatted physical plan of named
  * SparkEntry queries (all of them with no names given). The per-round
  * discipline: after a query is correct, READ its plan — pushed
  * filters, broadcast vs shuffle joins, WholeStageCodegen spans — and
  * fix the plan, not just the result.
  *
  * Usage: runMain graft.Explain <sfDir> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = args.drop(1).toSeq
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted =
      if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names
    wanted.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      println(s"\n========== $n ==========")
      try println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Exception =>
        println(s"EXPLAIN FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}") }
    }
    spark.stop()
  }
}
