package graft.operators

import graft.SparkSpec

/** Pins the Aho-Corasick semantics: dictionary-suffix outputs (the
  * classic ushers case), ALL-end-positions counting for
  * self-overlapping patterns, substring (not word) matching, and the
  * frame operator's hits-only contract. */
class MultiPatternSpec extends SparkSpec {
  import spark.implicits._

  private def counts(pats: Seq[String], text: String): Map[String, Long] = {
    val ac = new MultiPattern.Automaton(pats.toIndexedSeq)
    pats.zip(ac.countHits(text)).toMap.filter(_._2 > 0)
  }

  test("dictionary-suffix outputs: the ushers classic") {
    assert(counts(Seq("he", "she", "his", "hers"), "ushers") ==
      Map("he" -> 1L, "she" -> 1L, "hers" -> 1L))
    assert(counts(Seq("he", "she", "his", "hers"), "his sheer hers he") ==
      Map("his" -> 1L, "she" -> 1L, "he" -> 3L, "hers" -> 1L))
  }

  test("all end positions count: self-overlapping and nested patterns") {
    assert(counts(Seq("aa"), "aaaa") == Map("aa" -> 3L))
    assert(counts(Seq("aba", "ba"), "ababa") == Map("aba" -> 2L, "ba" -> 2L))
    assert(counts(Seq("the", "join the"), "join the dots, the fast way") ==
      Map("the" -> 2L, "join the" -> 1L))
    assert(counts(Seq("x"), "") == Map.empty)
    // brute-force cross-check on a generated text over a tiny alphabet
    val text = (0 until 400).map(i => "ab" (i * 7 % 2)).mkString
    val pats = Seq("ab", "ba", "aab", "abab", "b")
    val brute = pats.map { p =>
      p -> (0 to text.length - p.length).count(i => text.startsWith(p, i)).toLong
    }.filter(_._2 > 0).toMap
    assert(counts(pats, text) == brute)
  }

  test("redact: leftmost-longest, non-overlapping, length-preserving") {
    val ac = new MultiPattern.Automaton(IndexedSeq("join the", "the", "he"))
    // longest wins at a shared start; inner matches are consumed
    assert(ac.redact("join the dots") == ("######## dots", 1))
    // leftmost wins across overlapping alternatives
    assert(ac.redact("the he") == ("### ##", 2))
    // overlapping matches of one pattern take the earliest
    val ac2 = new MultiPattern.Automaton(IndexedSeq("aba"))
    assert(ac2.redact("ababa") == ("###ba", 1))
    // length and untouched text preserved
    val ac3 = new MultiPattern.Automaton(IndexedSeq("xyz"))
    assert(ac3.redact("no hits here") == ("no hits here", 0))
  }

  test("degenerate inputs: pattern longer than text, text = pattern, unicode") {
    val ac = new MultiPattern.Automaton(IndexedSeq("abcdef"))
    assert(ac.countHits("abc").forall(_ == 0L))
    assert(ac.redact("abc") == ("abc", 0))
    assert(ac.countHits("abcdef").toSeq == Seq(1L))
    assert(ac.redact("abcdef") == ("######", 1))
    val uni = new MultiPattern.Automaton(IndexedSeq("café", "汉字"))
    assert(uni.countHits("un café aux 汉字 et café").toSeq == Seq(2L, 1L))
    assert(uni.redact("café!") == ("####!", 1))
  }

  test("construction contract: empty or duplicate patterns rejected") {
    intercept[IllegalArgumentException] {
      new MultiPattern.Automaton(IndexedSeq("a", ""))
    }
    intercept[IllegalArgumentException] {
      new MultiPattern.Automaton(IndexedSeq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      new MultiPattern.Automaton(IndexedSeq.empty)
    }
  }

  test("frame operator: hits-only rows, null text, id passthrough") {
    val docs = Seq(
      (1L, "the vector stream"),
      (2L, "nothing here"),
      (3L, null.asInstanceOf[String])).toDF("doc", "text")
    val got = MultiPattern.blocklistHits(docs, "doc", "text",
      Seq("vector", "stream", "absent"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "vector", 1L), (1L, "stream", 1L)))
    // case folding: mixed-case evasion hits, emitted pattern is folded,
    // spellings that fold together merge into one entry
    val evasive = Seq((9L, "VeCtOr soup Vector")).toDF("doc", "text")
    val folded = MultiPattern.blocklistHits(evasive, "doc", "text",
      Seq("Vector", "VECTOR"), foldCase = true)
      .as[(Long, String, Long)].collect().toSet
    assert(folded == Set((9L, "vector", 2L)))
    assert(MultiPattern.blocklistHits(evasive, "doc", "text",
      Seq("Vector")).count() == 1, "unfolded matching stays exact-case")
  }

  test("columnar posture: no RDD scan in either operator's plan; redact null contract") {
    val docs = Seq((1L, "vector here"), (2L, null.asInstanceOf[String]))
      .toDF("doc", "text")
    val hits = MultiPattern.blocklistHits(docs, "doc", "text", Seq("vector", "here"))
    hits.collect()
    val hitsPlan = hits.queryExecution.executedPlan.toString
    assert(!hitsPlan.contains("ExistingRDD"),
      s"blocklistHits must stay columnar, plan was:\n$hitsPlan")
    assert(hitsPlan.contains("graft_blocklist_counts"), "the codegen'd kernel is in the plan")
    val red = MultiPattern.redactBlocklist(docs, "text", Seq("vector"))
    val rows = red.select("doc", "text_redacted", "n_redacted")
      .as[(Long, Option[String], Long)].collect().toSet
    assert(rows == Set((1L, Some("###### here"), 1L), (2L, None, 0L)),
      "null text keeps the (null out, 0 spans) contract")
    assert(!red.queryExecution.executedPlan.toString.contains("ExistingRDD"),
      "redactBlocklist must stay columnar")
  }

  test("SQL surface: graft_blocklist_counts / graft_redact_blocklist literal forms") {
    org.apache.spark.sql.graftbridge.Bridge.attachFunctions(
      spark, new graft.GraftExtensions().apply)
    val got = spark.sql(
      "SELECT graft_blocklist_counts('Vector vector soup', array('vector', 'soup'), true) AS c")
      .head.getSeq[Long](0)
    assert(got == Seq(2L, 1L))
    val red = spark.sql(
      "SELECT graft_redact_blocklist('mask the vector now', array('vector')) AS r")
      .select("r.red", "r.n").head
    assert(red.getString(0) == "mask the ###### now" && red.getLong(1) == 1L)
    // non-literal pattern arrays are a loud error, not a silent rebuild per row
    val e = intercept[Exception] {
      spark.sql("SELECT graft_blocklist_counts(c, array(c)) FROM (SELECT 'x' AS c)")
        .collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
