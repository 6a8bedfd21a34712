package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog of the TESTDATA star schema (see TESTDATA.md).
  *
  * Replaces the reference's connection-manager + schema-mapper layer
  * (/root/reference/parsing/data_engineering_parser.py:75-188,
  * /root/reference/mapping/schema_mapper.py:79-131): instead of regex-
  * rewriting table names inside SQL text, we resolve names through a
  * plain reader registry and let Catalyst do the rest.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS) which the vectorized reader
    // rejects; read nanos as epoch-nano longs (convert where a query
    // needs wall-clock: timestamp_micros(col / 1000)).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Register every table as a temp view so spark.sql(...) works — the
    * engine's analog of the reference's Execute SQL Task surface. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
