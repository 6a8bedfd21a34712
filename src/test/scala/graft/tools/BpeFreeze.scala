package graft.tools

/** Dev helper: regenerate the frozen merges literal for
  * TokenizerQueries (run after changing the literal training corpus).
  * Test/runMain graft.tools.BpeFreeze */
object BpeFreeze {
  def main(args: Array[String]): Unit = {
    val wc = graft.queries.TokenizerQueries.trainCorpus
      .flatMap(_.split(" ")).groupBy(identity)
      .map { case (w, g) => (w, g.size.toLong) }.toSeq
    val m = graft.functions.Bpe.trainOnCounts(wc, 64)
    println("MERGES_START")
    m.foreach { case (l, r) => println(s"""    ("$l", "$r"),""") }
    println("MERGES_END")
  }
}
