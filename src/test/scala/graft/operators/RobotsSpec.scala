package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the REP parser's group-state machine (RFC 9309 §2.2) and the
  * evaluator's precedence: most-specific agent group, longest prefix,
  * Allow on ties, default allowed. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("parse: comments, case, shared groups, group reset, empty values, CRLF") {
    val txt =
      "# banner comment\r\n" +
        "User-Agent: GoogleBot   # trailing comment\r\n" +
        "user-agent: graftbot\n" +
        "Disallow: /private\n" +
        "ALLOW: /private/ok\n" +
        "Disallow:\n" +              // empty value: no-op rule, closes group
        "User-agent: *\r" +          // after rules: NEW group, not appended
        "Crawl-delay: 10\n" +        // unknown field must not disturb state
        "Disallow: /tmp\n" +
        "Sitemap: https://x.org/s.xml\n" +
        "notacolonline\n" +
        "Allow: /tmp/keep\n"
    val rules = Robots.parse(txt)
    assert(rules.toSet == Set(
      Robots.Rule("googlebot", false, "/private"),
      Robots.Rule("graftbot", false, "/private"),
      Robots.Rule("googlebot", true, "/private/ok"),
      Robots.Rule("graftbot", true, "/private/ok"),
      Robots.Rule("*", false, "/tmp"),
      Robots.Rule("*", true, "/tmp/keep")))
    assert(Robots.parse("") == Seq.empty)
    assert(Robots.parse("Disallow: /orphan") == Seq.empty, "rule before any group")
  }

  test("evaluate: agent-group selection, longest match, Allow tie-break, default") {
    val rules = Seq(
      ("a.org", "*", false, "/x"),
      ("a.org", "*", true, "/x/pub"),
      ("a.org", "bot", true, "/"),          // exact group overrides * entirely
      ("a.org", "bot", false, "/x"),
      ("b.org", "*", false, "/p"),
      ("b.org", "*", true, "/p"),           // same length: Allow wins
      ("c.org", "*", false, "/only")
    ).toDF("domain", "agent", "allow", "prefix")
    val urls = Seq(
      ("a.org", "/x/pub/1"),   // bot group: /x disallow (len 2) beats / allow -> blocked
      ("a.org", "/y"),         // bot group: / allow matches -> allowed
      ("b.org", "/p/deep"),    // tie at len 2 -> Allow wins
      ("b.org", "/q"),         // no match -> default allowed
      ("d.org", "/anything")   // domain with no rules -> allowed
    ).toDF("domain", "path")
    val got = Robots.evaluate(urls, rules, "Bot")
      .select("domain", "path", "allowed").as[(String, String, Boolean)]
      .collect().map { case (d, p, al) => (d, p) -> al }.toMap
    assert(got == Map(
      ("a.org", "/x/pub/1") -> false,
      ("a.org", "/y") -> true,
      ("b.org", "/p/deep") -> true,
      ("b.org", "/q") -> true,
      ("d.org", "/anything") -> true))
  }
}
