package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ir._
import graft.ir.Component._
import graft.dag.{DataFlowExec, PipelineContext}

/** Fuzzy Lookup / Fuzzy Grouping / Term Lookup / Term Extraction —
  * the four §2.4 operators the reference only *recognizes*
  * (data_engineering_parser.py:1204-1207, :1114, :1119-1120) — all
  * engine-routed through DataFlowExec and oracle-checked exactly: the
  * q-gram candidate blocking is LOSSLESS, so the blocked engine result
  * equals the all-pairs result the DuckDB oracle computes.
  *
  * Test corpus: part names mangled in-query (last two characters
  * dropped) give every stream row a unique high-similarity match; the
  * grouping query unions originals and mangles so every component has
  * >= 2 members.
  */
object FuzzyQueries extends QueryPack {

  private def run(s: SparkSession, dir: String, flow: DataFlow): Map[String, DataFrame] =
    DataFlowExec.run(flow, PipelineContext.overDir(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q35_fuzzy_lookup" -> { (s, dir) =>
      val flow = DataFlow("q35", Seq(
        SourceTable("src", "part", columns = Seq("p_partkey", "p_name")),
        DerivedColumn("mangle",
          Seq("sname" -> "SUBSTRING(p_name, 1, LEN(p_name) - 2)")),
        FuzzyLookup("fl", refTable = "part",
          streamKey = "sname", refIdColumn = "p_partkey", refKey = "p_name",
          copyColumns = Seq("p_partkey" -> "matched_partkey",
            "p_name" -> "matched_name"),
          minSimilarity = 0.8, simColumn = "similarity")),
        Seq(Path("src", "mangle"), Path("mangle", "fl")))
      run(s, dir, flow)("fl.out")
        .select(col("p_partkey"), col("sname"), col("matched_partkey"),
          col("matched_name"), col("similarity"))
        .orderBy(col("p_partkey"))
    },

    // MaxOutputMatchesPerInput > 1 (reference parses it at
    // data_engineering_parser.py:1204-1207): up to 2 ranked matches per
    // input row; the reference side is deduped on the normalized key
    // (min partkey per key) exactly as the engine's fuzzy index is.
    "q54_fuzzy_topn" -> { (s, dir) =>
      val flow = DataFlow("q54", Seq(
        SourceTable("src", "part", columns = Seq("p_partkey", "p_name"),
          filter = Some("p_partkey <= 400")),
        DerivedColumn("mangle",
          Seq("sname" -> "SUBSTRING(p_name, 1, LEN(p_name) - 2)")),
        FuzzyLookup("fl", refTable = "part",
          streamKey = "sname", refIdColumn = "p_partkey", refKey = "p_name",
          copyColumns = Seq("p_partkey" -> "matched_partkey"),
          minSimilarity = 0.8, simColumn = "similarity", maxMatches = 2)),
        Seq(Path("src", "mangle"), Path("mangle", "fl")))
      run(s, dir, flow)("fl.out")
        .select(col("p_partkey"), col("sname"), col("matched_partkey"),
          col("similarity"), col("similarity_rank"))
        .orderBy(col("p_partkey"), col("similarity_rank"))
    },

    "q36_fuzzy_group" -> { (s, dir) =>
      val flow = DataFlow("q36", Seq(
        SourceTable("orig", "part", columns = Seq("p_partkey", "p_name")),
        SourceTable("dup", "part", columns = Seq("p_partkey", "p_name")),
        DerivedColumn("mangle", Seq(
          "p_name" -> "SUBSTRING(p_name, 1, LEN(p_name) - 2)",
          "p_partkey" -> "p_partkey + 10000000")),
        UnionAll("u"),
        FuzzyGrouping("fg", idColumn = "p_partkey", keyColumn = "p_name",
          minSimilarity = 0.8, keyOutColumn = "key_out")),
        Seq(Path("orig", "u"), Path("dup", "mangle"), Path("mangle", "u"),
          Path("u", "fg")))
      run(s, dir, flow)("fg.out")
        .select(col("p_partkey"), col("key_out"))
        .orderBy(col("p_partkey"))
    },

    "q37_term_extract" -> { (s, dir) =>
      val flow = DataFlow("q37", Seq(
        SourceTable("src", "documents"),
        TermExtraction("te", textColumn = "text", minCount = 100L)),
        Seq(Path("src", "te")))
      run(s, dir, flow)("te.out").orderBy(col("term"))
    },

    "q38_term_lookup" -> { (s, dir) =>
      val flow = DataFlow("q38", Seq(
        SourceTable("src", "documents"),
        TermLookup("tl", idColumn = "doc_id", textColumn = "text",
          terms = Seq("spark", "vector", "stream"))),
        Seq(Path("src", "tl")))
      run(s, dir, flow)("tl.out").orderBy(col("doc_id"), col("term"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q35_fuzzy_lookup" ->
      """WITH stream AS (
        |  SELECT p_partkey, substr(p_name, 1, length(p_name) - 2) AS sname
        |  FROM part),
        |keys AS (SELECT DISTINCT lower(trim(sname)) AS akey FROM stream),
        |cand AS (
        |  SELECT k.akey, r.p_partkey AS bid, r.p_name AS bname,
        |    1.0 - levenshtein(k.akey, lower(trim(r.p_name))) * 1.0
        |      / greatest(length(k.akey), length(lower(trim(r.p_name))), 1) AS sim
        |  FROM keys k CROSS JOIN part r),
        |best AS (
        |  SELECT akey, bid, bname, sim FROM (
        |    SELECT *, row_number() OVER (PARTITION BY akey
        |        ORDER BY sim DESC, bid) AS rn
        |    FROM cand WHERE sim >= 0.8)
        |  WHERE rn = 1)
        |SELECT s.p_partkey, s.sname, b.bid AS matched_partkey,
        |  b.bname AS matched_name, b.sim AS similarity
        |FROM stream s LEFT JOIN best b ON lower(trim(s.sname)) = b.akey
        |ORDER BY s.p_partkey""".stripMargin,
    "q54_fuzzy_topn" ->
      """WITH stream AS (
        |  SELECT p_partkey, substr(p_name, 1, length(p_name) - 2) AS sname
        |  FROM part WHERE p_partkey <= 400),
        |keys AS (SELECT DISTINCT lower(trim(sname)) AS akey FROM stream),
        |refk AS (SELECT lower(trim(p_name)) AS bkey, min(p_partkey) AS bid
        |  FROM part GROUP BY 1),
        |cand AS (
        |  SELECT k.akey, r.bid,
        |    1.0 - levenshtein(k.akey, r.bkey) * 1.0
        |      / greatest(length(k.akey), length(r.bkey), 1) AS sim
        |  FROM keys k CROSS JOIN refk r),
        |top AS (
        |  SELECT akey, bid, sim, rn FROM (
        |    SELECT *, row_number() OVER (PARTITION BY akey
        |        ORDER BY sim DESC, bid) AS rn
        |    FROM cand WHERE sim >= 0.8)
        |  WHERE rn <= 2)
        |SELECT s.p_partkey, s.sname, t.bid AS matched_partkey,
        |  t.sim AS similarity, CAST(t.rn AS INT) AS similarity_rank
        |FROM stream s LEFT JOIN top t ON lower(trim(s.sname)) = t.akey
        |ORDER BY s.p_partkey, similarity_rank""".stripMargin,
    "q36_fuzzy_group" ->
      """WITH RECURSIVE all_rows AS (
        |  SELECT p_partkey, lower(trim(p_name)) AS key FROM part
        |  UNION ALL
        |  SELECT p_partkey + 10000000,
        |    lower(trim(substr(p_name, 1, length(p_name) - 2))) FROM part),
        |pairs AS (
        |  SELECT a.p_partkey AS ia, b.p_partkey AS ib
        |  FROM all_rows a JOIN all_rows b ON a.p_partkey <> b.p_partkey
        |  WHERE 1.0 - levenshtein(a.key, b.key) * 1.0
        |      / greatest(length(a.key), length(b.key), 1) >= 0.8),
        |reach(id, r) AS (
        |  SELECT p_partkey, p_partkey FROM all_rows
        |  UNION
        |  SELECT p.ia, r.r FROM pairs p JOIN reach r ON p.ib = r.id)
        |SELECT id AS p_partkey, min(r) AS key_out
        |FROM reach GROUP BY id ORDER BY p_partkey""".stripMargin,
    "q37_term_extract" ->
      """SELECT term, COUNT(*) AS term_count FROM (
        |  SELECT unnest(string_split(text, ' ')) AS term FROM documents)
        |WHERE length(term) > 0
        |GROUP BY term HAVING COUNT(*) >= 100
        |ORDER BY term""".stripMargin,
    "q38_term_lookup" ->
      """SELECT doc_id, term, COUNT(*) AS term_freq FROM (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents)
        |WHERE term IN ('spark', 'vector', 'stream')
        |GROUP BY doc_id, term
        |ORDER BY doc_id, term""".stripMargin
  )
}
