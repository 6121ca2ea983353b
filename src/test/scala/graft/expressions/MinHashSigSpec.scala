package graft.expressions

import graft.SparkSpec
import graft.operators.{Dedup, TextOps}
import org.apache.spark.sql.functions._

/** The codegen'd whole-signature MinHash expression against the composable
  * reference construction (explode shingles → k × min(md5(seed‖"|"‖s))):
  * identical signatures on random corpora, same NULL contract on the
  * degenerate edges. A match here plus the DuckDB oracle on
  * `dedup_minhash_sig` pins all three implementations to one semantics. */
class MinHashSigSpec extends SparkSpec {
  import spark.implicits._

  private val n = 3
  private val k = 8

  /** The pre-expression form, kept as executable spec. */
  private def referenceSigs(df: org.apache.spark.sql.DataFrame) = {
    val ex = df.select(col("doc_id").as("doc"),
      explode_outer(TextOps.shingles(TextOps.tokens(col("text")), n)).as("s"))
    val mins = (0 until k).map(i =>
      min(md5(concat(lit(i.toString), lit("|"), col("s")))).as(s"m$i"))
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
    val sig = rows(4).getSeq[String](1)
    assert(sig.length == k && sig.forall(_.length == 32))
    // one shingle ⇒ sig(i) = md5(i + "|one two three") exactly
    val mdRef = java.security.MessageDigest.getInstance("MD5")
    val expect = (0 until k).map { i =>
      mdRef.digest(s"$i|one two three".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    }
    assert(sig == expect)
  }

  test("interpreted eval path matches codegen path") {
    // Force the interpreted path by evaluating the expression directly.
    val toks = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Array("a", "b", "c", "d").map(org.apache.spark.unsafe.types.UTF8String.fromString))
    val viaImpl = MinHashImpl.eval(toks, n, k)
    assert(viaImpl != null && viaImpl.numElements() == k)
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = (0 until k).map { i =>
      Seq("a b c", "b c d").map(s =>
        md.digest(s"$i|$s".getBytes("UTF-8")).map("%02x".format(_)).mkString).min
    }
    assert((0 until k).map(viaImpl.getUTF8String(_).toString) == want)
  }
}
