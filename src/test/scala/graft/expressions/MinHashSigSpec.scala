package graft.expressions

import graft.SparkSpec
import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** The codegen'd whole-signature MinHash expression against the composable
  * reference construction (explode shingles → k × min((a_i*h + b_i) % P)
  * over the md5-head base h): identical signatures on random corpora, same
  * NULL contract on the degenerate edges. A match here plus the DuckDB
  * oracle on `dedup_minhash_sig` pins all three implementations to one
  * semantics. */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private val n = 3
  private val k = 8

  /** h(shingle): unsigned 32-bit head of md5, as the JVM impl computes it. */
  private def head32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** The pre-expression form, kept as executable spec. */
  private def referenceSigs(df: org.apache.spark.sql.DataFrame) = {
    val (as, bs) = MinHashImpl.coeffs(k)
    val p = MinHashImpl.Prime
    val ex = df.select(col("doc_id").as("doc"),
      explode_outer(TextOps.shingles(TextOps.tokens(col("text")), n)).as("s"))
      .withColumn("h", conv(substring(md5(col("s")), 1, 8), 16, 10).cast("long"))
    val mins = (0 until k).map(i =>
      min((lit(as(i)) * col("h") + lit(bs(i))) % lit(p)).as(s"m$i"))
    ex.groupBy("doc").agg(mins.head, mins.tail: _*)
      .select(col("doc"),
        when(col("m0").isNotNull, array((0 until k).map(i => col(s"m$i")): _*))
          .otherwise(lit(null)).as("sig"))
  }

  private def randomCorpus(rows: Int): org.apache.spark.sql.DataFrame = {
    val rnd = new scala.util.Random(11)
    val words = Vector("lorem", "ipsum", "dolor", "sit", "amet", "x", "yy",
      "消息", "emoji😀", "tab\tchar", "")
    (0 until rows).map { i =>
      val len = rnd.nextInt(12) // includes 0,1,2 (< n tokens) edges
      (i.toLong, Seq.fill(len)(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("coefficients are in range and stable") {
    val (as, bs) = MinHashImpl.coeffs(k)
    assert(as.forall(a => a >= 1 && a < MinHashImpl.Prime))
    assert(bs.forall(b => b >= 0 && b < MinHashImpl.Prime))
    assert(as.distinct.length == k, "degenerate coefficient collision")
    // worst case product stays in signed-64 range
    assert((MinHashImpl.Prime - 1) <= Long.MaxValue / 0xffffffffL)
  }

  test("expression signatures == composable-form signatures on a random corpus") {
    val df = randomCorpus(400)
    val got = Dedup.minhashSignatures(df, "doc_id", "text", n, k)
    val want = referenceSigs(df)
    val joined = got.alias("g").join(want.alias("w"), col("g.doc") === col("w.doc"))
      .select(col("g.doc"), col("g.sig").as("gs"), col("w.sig").as("ws"))
    assert(joined.count() == 400)
    val mismatch = joined.filter(
      !(col("gs") <=> col("ws"))).collect()
    assert(mismatch.isEmpty, s"mismatches: ${mismatch.take(3).mkString(", ")}")

    // third form: the composable HOF expression over a materialized
    // shingle attribute (what ad-hoc SQL users would compose)
    val hof = df
      .select(col("doc_id").as("doc"),
        TextOps.shingles(TextOps.tokens(col("text")), n).as("sh"))
      .select(col("doc"),
        when(size(col("sh")) > 0, Dedup.minhashSignature(col("sh"), k))
          .otherwise(lit(null)).as("sig"))
    val hofJoined = got.alias("g").join(hof.alias("h"), col("g.doc") === col("h.doc"))
      .filter(!(col("g.sig") <=> col("h.sig"))).collect()
    assert(hofJoined.isEmpty, s"HOF-form mismatches: ${hofJoined.take(3).mkString(", ")}")
  }

  test("NULL contract: null text, empty text, fewer than n tokens") {
    val df = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, ""),
      (3L, "   "),
      (4L, "one two"),          // 2 tokens < n=3
      (5L, "one two three")     // exactly n ⇒ one shingle
    ).toDF("doc_id", "text")
    val rows = Dedup.minhashSignatures(df, "doc_id", "text", n, k)
      .orderBy("doc").collect()
    assert(rows.take(4).forall(_.isNullAt(1)))
    val sig = rows(4).getSeq[Long](1)
    // one shingle ⇒ sig(i) = (a_i*h + b_i) % P exactly
    val (as, bs) = MinHashImpl.coeffs(k)
    val h = head32("one two three")
    val expect = (0 until k).map(i => (as(i) * h + bs(i)) % MinHashImpl.Prime)
    assert(sig == expect)
  }

  test("interpreted eval path matches codegen path") {
    // Force the interpreted path by evaluating the expression directly.
    val toks = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("a", "b", "c", "d").map(org.apache.spark.unsafe.types.UTF8String.fromString))
    val viaImpl = MinHashImpl.eval(toks, n, k)
    assert(viaImpl != null && viaImpl.numElements() == k)
    val (as, bs) = MinHashImpl.coeffs(k)
    val want = (0 until k).map { i =>
      Seq("a b c", "b c d").map(s => (as(i) * head32(s) + bs(i)) % MinHashImpl.Prime).min
    }
    assert((0 until k).map(viaImpl.getLong) == want)
  }
}
