package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Multi-seed property sweep: q-gram candidate blocking must be a
  * lossless superset of brute force at several thresholds, across
  * random corpora including short strings and duplicates. */
class FuzzySweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("key", StringType)))

  test("candidatePairs lossless across seeds and thresholds") {
    for (seed <- Seq(1, 7, 23); t <- Seq(0.7, 0.8, 0.9)) {
      val rnd = new scala.util.Random(seed)
      val vocab = "abcd"
      def randStr(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.length))).mkString
      val base = (1L to 35L).map(i => i -> randStr(1 + rnd.nextInt(14)))
      val mutated = base.take(18).map { case (i, s) =>
        val mut = rnd.nextInt(3) match {
          case 0 if s.length > 1 => s.init                       // delete
          case 1 => s + vocab(rnd.nextInt(4))                    // insert
          case _ => s.updated(rnd.nextInt(s.length), 'z')        // substitute
        }
        (i + 100L) -> mut
      }
      val dup = base.take(5).map { case (i, s) => (i + 200L) -> s }
      val rows = base ++ mutated ++ dup
      val d = spark.createDataFrame(
        java.util.Arrays.asList(rows.map(r => Row(r._1, r._2)): _*), schema)
      val a = d.select(col("id").as("aid"), Fuzzy.normalize(col("key")).as("akey"))
      val b = d.select(col("id").as("bid"), Fuzzy.normalize(col("key")).as("bkey"))
      val cand = Fuzzy.candidatePairs(a, b, t).as[(Long, Long)].collect().toSet
      val brute = a.crossJoin(b)
        .filter(Fuzzy.editSimilarity(col("akey"), col("bkey")) >= t)
        .select(col("aid"), col("bid")).as[(Long, Long)].collect().toSet
      val missed = brute -- cand
      assert(missed.isEmpty,
        s"seed=$seed t=$t dropped true pairs: ${missed.take(5)}")
    }
  }
}
