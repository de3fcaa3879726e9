package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.dedup.{Dedup, SignatureKernel}
import graft.zeek.SharedSpark

/** Pins [[SignatureKernel]] bit-for-bit to the String-based formulation
  * it replaced: `Dedup.shingleHashes(text.split semantics)` and the
  * former MinHash/SimHash UDF loops. Bit-identity (not just statistical
  * equivalence) is the requirement — the d06 near-dup pair set is
  * oracle-verified against exact Jaccard, so any change in signature
  * bits would change banding recall and could drop a verified pair. */
class SignatureKernelSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val tricky = Seq(
    "", " ", "  ", "\t", "a", " a", "a ", " a ", "a b", "a  b",
    "\ta\nbc\fd\re", "one", "one two", "one two three four five",
    "dup dup dup dup", "a b a b a b", "Hello, World! Hello, World!",
    "héllo wörld ünïcode", "你好 世界 你好", "emoji 😀 pair 😀😀 end",
    "x   y", // NBSP is not \s: one middle token " "
    "😀" * 3, "mixed ASCII 你好 😀 tail")

  private def fuzz(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val atoms = Vector("the", "and", "xyz", "Fox9", "héllo", "世界", "😀",
      ".", " ", "  ", "\t", "\n", "", "\r", "doc", "a")
    (1 to n).map(_ => (0 until rnd.nextInt(16)).map(_ => atoms(rnd.nextInt(atoms.size))).mkString)
  }

  // the former UDF loops, inlined as the oracle
  private def oldMinhash(text: String, numHashes: Int, shingleSize: Int): Array[Long] = {
    val hs = Dedup.shingleHashes(text, shingleSize)
    Array.tabulate(numHashes) { i =>
      val a = Dedup.mix64(2 * i + 1) | 1L
      val b = Dedup.mix64(1000003L * i)
      hs.map(h => a * h + b).foldLeft(Long.MaxValue)(math.min)
    }
  }
  private def oldSimhash(text: String): Long = {
    val hs = Dedup.shingleHashes(text, 2)
    val counts = new Array[Int](64)
    hs.foreach { h =>
      (0 until 64).foreach(j => if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1)
    }
    (0 until 64).foldLeft(0L)((acc, j) => if (counts(j) > 0) acc | (1L << j) else acc)
  }

  test("kernel shingle hashes are bit-identical to the String path") {
    (tricky ++ fuzz(500, 42L)).foreach { t =>
      val fused = SignatureKernel.shingleHashes(UTF8String.fromString(t), 2)
      val ref = Dedup.shingleHashes(t, 2)
      assert(fused.toSeq == ref.toSeq, s"shingle mismatch on ${t.take(40)}")
      val f3 = SignatureKernel.shingleHashes(UTF8String.fromString(t), 3)
      assert(f3.toSeq == Dedup.shingleHashes(t, 3).toSeq, s"3-gram mismatch on ${t.take(40)}")
    }
  }

  test("minhash_sig / simhash64 columns are bit-identical to the UDF loops") {
    import spark.implicits._
    val corpus = tricky ++ fuzz(300, 7L)
    val rows = corpus.toDF("text").select(
      Dedup.minhashSignature(16, 2)(col("text")).as("sig"),
      Dedup.simhash64(col("text")).as("sim"),
      col("text")).collect()
    rows.foreach { r =>
      val t = r.getString(2)
      assert(r.getSeq[Long](0) == oldMinhash(t, 16, 2).toSeq, s"minhash mismatch on ${t.take(40)}")
      assert(r.getLong(1) == oldSimhash(t), s"simhash mismatch on ${t.take(40)}")
    }
  }

  test("null text propagates to null signature") {
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("text").select(
      Dedup.minhashSignature(8, 2)(col("text")).as("sig"),
      Dedup.simhash64(col("text")).as("sim")).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
