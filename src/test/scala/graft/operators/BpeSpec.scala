package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges: hand-computed sequence incl. overlap counting and lexicographic ties") {
    // "aaab" f=1 → symbols a a a b </w>
    // round 1: (a,a)=2 (overlap counted), (a,b)=1, (b,</w>)=1 → merge (a,a)
    //          apply left-to-right: [aa, a, b, </w>]
    // round 2: (aa,a)=1, (a,b)=1, (b,</w>)=1 — tie → lexicographically
    //          smallest pair: ("a","b") < ("aa","a") < ("b","</w>")?
    //          ("</w>" starts with '<' — ("b","</w>") has left "b" > "aa")
    //          smallest is ("a","b") → [aa, ab, </w>]
    val m = Bpe.trainMerges(Seq(("aaab", 1L)), 2)
    assert(m == Seq(("a", "a"), ("a", "b")))
  }

  test("trainMerges: frequency weighting picks the heavy word's pair first") {
    // "ab" f=10, "cd" f=3 → (a,b)=10, (b,</w>)=10, (c,d)=3, (d,</w>)=3
    // tie (a,b) vs (b,</w>) at 10 → ("a","b") lexicographically first
    val m = Bpe.trainMerges(Seq(("ab", 10L), ("cd", 3L)), 3)
    assert(m.take(2) == Seq(("a", "b"), ("ab", "</w>")))
    assert(m(2) == (("c", "d")))
  }

  test("trainMerges terminates when every word is fully merged") {
    val m = Bpe.trainMerges(Seq(("ab", 5L)), 100)
    // a b </w> → ab → ab</w> → nothing left
    assert(m == Seq(("a", "b"), ("ab", "</w>")))
  }

  test("encodeWord: greedy lowest-rank-first; unseen word stays at char level") {
    val merges = Bpe.trainMerges(Seq(("low", 5L), ("lowest", 3L)), 6)
    val ranks = merges.zipWithIndex.toMap
    // a word fully covered by training merges compresses far below
    // char count; an unseen-alphabet word cannot merge at all
    assert(Bpe.encodeWord("low", ranks) <= 2)
    assert(Bpe.encodeWord("xyz", ranks) == 4) // x y z </w>
    assert(Bpe.encodeWord("", ranks) == 0)
  }

  test("encode: distributed counts match driver-side encodeWord; ratio exact; empty doc null") {
    val df = Seq((1L, "low low lowest"), (2L, "xyz"), (3L, "")).toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", nMerges = 8)
    val ranks = merges.zipWithIndex.toMap
    val out = Bpe.encode(df, "doc_id", "text", merges).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), Option(r.get(3)))).toMap
    val expect1 = 2L * Bpe.encodeWord("low", ranks) + Bpe.encodeWord("lowest", ranks)
    assert(out(1L) == ((3L, expect1, Some(expect1.toDouble / 3.0))))
    assert(out(2L)._1 == 1L && out(2L)._2 == Bpe.encodeWord("xyz", ranks).toLong)
    assert(out(3L) == ((0L, 0L, None)))
  }

  test("train is deterministic under repartitioning") {
    val text = (1 to 50).map(i => s"tok${i % 7} tok${i % 11}").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val a = Bpe.train(df, "text", 10)
    val b = Bpe.train(df.repartition(13), "text", 10)
    assert(a == b)
  }

  test("maxVocab guard truncates to top words but still trains") {
    val df = Seq((1L, "aa aa aa bb bb cc")).toDF("doc_id", "text")
    val m = Bpe.train(df, "text", nMerges = 2, maxVocab = 2)
    // cc (freq 1) is truncated; merges come from aa/bb only
    assert(m.nonEmpty && m.forall { case (l, r) => !(l + r).contains("c") })
  }

  test("saveMerges/loadMerges round-trips in rank order; stored encode ≡ fresh encode") {
    val df = Seq((1L, "the cat sat on the mat"), (2L, "the bat and the rat"))
      .toDF("doc_id", "text")
    val trained = Bpe.train(df, "text", nMerges = 12)
    val dir = tmpDir("bpe-merges")
    Bpe.saveMerges(spark, trained, dir)
    val loaded = Bpe.loadMerges(spark, dir)
    assert(loaded == trained, "rank order must survive the parquet round-trip")
    val fresh = Bpe.encode(df, "doc_id", "text", trained).collect().map(_.toSeq).toSeq
    val stored = Bpe.encode(df, "doc_id", "text", loaded).collect().map(_.toSeq).toSeq
    assert(stored == fresh)
  }

  test("oracle fold identity: greedy last-element folding == applyMerge for any single rule (fuzz)") {
    // BpeOracle's list_reduce applies one merge by folding left and
    // merging whenever the accumulator's last symbol is l and the next
    // is r. The documented argument: a just-merged symbol l||r is
    // strictly longer than l, so it can never re-match l, which makes
    // greedy folding exactly left-to-right non-overlapping application.
    // Fuzz it against the reference applyMerge over small alphabets
    // (where overlapping-run cases like (a,a) on "aaaa" actually occur).
    def foldApply(s: Seq[String], m: (String, String)): Seq[String] =
      s.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == m._1 && x == m._2)
          acc.init :+ (m._1 + m._2)
        else acc :+ x
      }
    val rnd = new scala.util.Random(42)
    val alphabet = Vector("a", "b", "ab", "ba", "aa")
    for (_ <- 1 to 20000) {
      val s = Array.fill(1 + rnd.nextInt(12))(alphabet(rnd.nextInt(alphabet.size)))
      val m = (alphabet(rnd.nextInt(alphabet.size)), alphabet(rnd.nextInt(alphabet.size)))
      val ref = Bpe.applyMerge(s, m).toSeq
      assert(foldApply(s.toSeq, m) == ref,
        s"fold != applyMerge on ${s.toSeq} with $m")
    }
  }
}
