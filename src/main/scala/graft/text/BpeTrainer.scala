package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding trainer — the tokenizer-training step
  * of a corpus pipeline (d12 builds a word vocabulary; this learns the
  * SUBWORD merge table a BPE tokenizer runs).
  *
  * Scale design, the part that matters at 100 TB: the corpus is touched
  * by exactly ONE tokenize+count shuffle ([[wordCounts]]). Training then
  * iterates over the DISTINCT-WORD table — vocab-sized (millions of
  * rows), not corpus-sized — exactly how production BPE trainers
  * decompose the problem. Each greedy iteration is one partial+final
  * aggregate over the current symbol sequences plus a 1-row driver
  * collect (the merge decision — a scalar, not data movement), and the
  * merge application is map-only. Lineage is cut with `localCheckpoint`
  * every few iterations so long trainings don't re-plan a growing DAG.
  *
  * Determinism: the argmax tie-breaks on (count desc, left symbol, right
  * symbol) and merge application is the standard greedy left-to-right
  * scan, so the learned merge table is bit-identical on any cluster
  * layout — property-proven against a sequential reference in
  * BpeTrainerSpec.
  */
object BpeTrainer {

  /** The one corpus-sized pass: lowercased whitespace word frequencies. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Greedy left-to-right application of one learned merge to a symbol
    * sequence (the same scan both training and encoding use). */
  def mergeOnce(syms: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toIndexedSeq
  }

  /** Learn `iterations` merge rules from a (word, cnt) frequency table.
    * Returns the rules in learned order (fewer if pairs run out). */
  def train(wordCounts: DataFrame, iterations: Int): Seq[(String, String)] = {
    require(iterations >= 0, "iterations must be non-negative")
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var words = wordCounts
      .select(split(col("word"), "").as("syms"), col("cnt"))
      .localCheckpoint()
    var i = 0
    var exhausted = false
    while (i < iterations && !exhausted) {
      val top = pairCounts(words)
        .orderBy(desc("n"), asc("a"), asc("b")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val applyOne = udf((syms: Seq[String]) =>
          mergeOnce(syms.toIndexedSeq, a, b))
        words = words.select(applyOne(col("syms")).as("syms"), col("cnt"))
        if ((i + 1) % 5 == 0) words = words.localCheckpoint()
      }
      i += 1
    }
    merges.toSeq
  }

  /** Adjacent symbol-pair frequencies weighted by word count — one
    * partial+final aggregate over the vocab-sized table. */
  def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(expr(
        "transform(sequence(1, size(syms) - 1), " +
          "i -> struct(syms[i - 1] AS a, syms[i] AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("cnt")).as("n"))

  /** Tokenize with a learned merge table: rules applied in learned
    * order (map-only over any frame carrying a word column). */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.split("").toIndexedSeq: IndexedSeq[String]) {
      case (syms, (a, b)) => mergeOnce(syms, a, b)
    }

  /** Column form of [[encodeWord]] for corpus-wide encoding. */
  def encode(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val rules = merges.toIndexedSeq
    val enc = udf((w: String) => if (w == null) null else encodeWord(w, rules))
    words.withColumn("bpe_tokens", enc(col(wordCol)))
  }
}
