package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robots Exclusion Protocol (RFC 9309) — the crawl-side admission gate
  * in front of the frontier: parse each domain's robots.txt into
  * (agent, allow, prefix) rules, then evaluate URLs with the standard
  * precedence (most-specific agent group; longest-prefix rule wins;
  * Allow wins length ties; no match ⇒ allowed).
  *
  * RFC 9309 `*`/`$` wildcards ARE interpreted (§2.2.3): `*` matches
  * any character run, a trailing `$` anchors the pattern at the path's
  * end, and precedence still ranks by the raw pattern's octet length.
  * Patterns without wildcards compile to `^literal` — byte-identical
  * to the old startsWith semantics — so wildcard support changes no
  * plain-prefix verdict. The parser is line-stateful (group semantics
  * cannot be a per-row regexp): it runs inside a `flatMap` over
  * domains — one row in, a handful of rule rows out, embarrassingly
  * parallel.
  *
  * Evaluation is relational end-to-end: a domain equi-join from URLs to
  * the selected agent group's rules with a `startsWith` predicate, then
  * ONE bounded aggregation computing the winning rule via the integer
  * rank `2·len(prefix) + (allow ? 1 : 0)` — longest first, Allow on
  * ties — with no window function. At 100 TB the rules side is tiny
  * relative to the corpus (a few rules per domain) and joins on the
  * same domain key the URL table is naturally clustered by; AQE
  * broadcasts it when it fits. */
object Robots {

  final case class Rule(agent: String, allow: Boolean, prefix: String)

  /** Everything one robots.txt declares: path rules, per-agent-group
    * crawl delays (milliseconds, exact integer arithmetic on the
    * decimal-seconds value), and the file-global sitemap URLs. */
  final case class Directives(rules: Seq[Rule], delays: Seq[(String, Long)],
                              sitemaps: Seq[String])

  /** "1.5" / "10" / "0.25" → exact milliseconds (frac digits past 3
    * truncate — sub-ms politeness is noise); None on a malformed value. */
  private[operators] def delayMs(v: String): Option[Long] = {
    val parts = v.split("\\.", -1)
    def digits(s: String) = s.nonEmpty && s.forall(_.isDigit)
    parts match {
      case Array(i) if digits(i)               => Some(i.toLong * 1000L)
      case Array(i, f) if digits(i) && digits(f) =>
        Some(i.toLong * 1000L + (f + "000").take(3).toLong)
      case _ => None
    }
  }

  /** Line-stateful robots.txt parse. Comments (`#` to end of line)
    * strip first; field names are case-insensitive; consecutive
    * `User-agent` lines share one group; a `User-agent` line AFTER a
    * rule line starts a new group; empty-valued Allow/Disallow lines
    * are no-ops for matching (RFC 9309 §2.2.2) but still close the
    * group. `Crawl-delay` attaches to the CURRENT agent group and —
    * like every other non-`User-agent` line inside a group — CLOSES it
    * (RFC 9309 §2.2.1: a start-group line after any rule line starts a
    * new group), so the delay and path-rule extractions agree on group
    * boundaries: in `User-agent: a / Crawl-delay: 1 / User-agent: b /
    * Disallow: /x` the delay belongs to `a` alone and the Disallow to
    * `b` alone. `Sitemap` is file-global per the sitemaps protocol.
    * Agent names compare case-insensitively. */
  def parseAll(txt: String): Directives = {
    val rules = Seq.newBuilder[Rule]
    val delays = Seq.newBuilder[(String, Long)]
    val sitemaps = Seq.newBuilder[String]
    var agents = List.empty[String]
    var lastWasRule = false
    txt.split("\r\n|\n|\r", -1).foreach { raw =>
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      val sep = line.indexOf(':')
      if (line.nonEmpty && sep > 0) {
        val field = line.substring(0, sep).trim.toLowerCase
        val value = line.substring(sep + 1).trim
        field match {
          case "user-agent" =>
            if (lastWasRule) agents = List(value.toLowerCase)
            else agents = value.toLowerCase :: agents
            lastWasRule = false
          case "allow" | "disallow" =>
            if (agents.nonEmpty && value.nonEmpty)
              agents.foreach(a => rules += Rule(a, field == "allow", value))
            lastWasRule = true
          case "crawl-delay" =>
            if (agents.nonEmpty)
              delayMs(value).foreach(ms => agents.foreach(a => delays += (a -> ms)))
            lastWasRule = true
          case "sitemap" =>
            if (value.nonEmpty) sitemaps += value
          case _ => () // unknown fields: no group effect
        }
      }
    }
    Directives(rules.result(), delays.result(), sitemaps.result())
  }

  /** Path rules only (the original surface; see [[parseAll]]). */
  def parse(txt: String): Seq[Rule] = parseAll(txt).rules

  /** Explode a (domain, robots.txt) frame into (domain, agent, allow,
    * prefix) rule rows via the stateful parser. */
  def rulesFrame(df: DataFrame, domainCol: String, txtCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(domainCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (domain, txt) =>
        parse(Option(txt).getOrElse("")).map(r => (domain, r.agent, r.allow, r.prefix))
      }
      .toDF("domain", "agent", "allow", "prefix")
  }

  /** Explode a (domain, robots.txt) frame into per-agent crawl-delay
    * rows `(domain, agent, delay_ms)` — the politeness source
    * [[graft.queries.WebQueries]]' fetch scheduler consumes (previously
    * the delay arrived as an external seed while the parser threw the
    * directive away). */
  def delaysFrame(df: DataFrame, domainCol: String, txtCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(domainCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (domain, txt) =>
        parseAll(Option(txt).getOrElse("")).delays.map { case (a, ms) => (domain, a, ms) }
      }
      .toDF("domain", "agent", "delay_ms")
  }

  /** Explode a (domain, robots.txt) frame into `(domain, sitemap)` rows
    * — the in-band sitemap discovery channel feeding the frontier. */
  def sitemapsFrame(df: DataFrame, domainCol: String, txtCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(domainCol).cast("string"), col(txtCol).cast("string"))
      .as[(String, String)]
      .flatMap { case (domain, txt) =>
        parseAll(Option(txt).getOrElse("")).sitemaps.map(sm => (domain, sm))
      }
      .toDF("domain", "sitemap")
  }

  /** Resolve one crawler identity's delay per domain with the same
    * precedence as [[evaluate]]'s group selection — the exact agent's
    * delay when declared, else the `*` group's, else `defaultMs`.
    * Repeated declarations in a group resolve to the MAX (conservative
    * politeness). Output: `(domain, delay_ms)`, one row per domain in
    * `delays`. */
  def selectDelay(delays: DataFrame, agent: String, defaultMs: Long): DataFrame = {
    val a = agent.toLowerCase
    delays.groupBy("domain")
      .agg(max(when(col("agent") === a, col("delay_ms"))).as("_exact"),
        max(when(col("agent") === "*", col("delay_ms"))).as("_star"))
      .select(col("domain"),
        coalesce(col("_exact"), col("_star"), lit(defaultMs)).as("delay_ms"))
  }

  /** Evaluate `urls` (domain, path + carried columns) against `rules`
    * (domain, agent, allow, prefix) for one crawler identity: per
    * domain the group is the exact agent match when present, else the
    * `*` group; per URL the verdict is the longest matching pattern
    * (RFC 9309 octet length — `octet_length`, so multi-byte patterns
    * rank by their wire size, not their char count — wildcards
    * interpreted) with Allow winning ties, default allowed. Output:
    * the input columns plus `allowed`. The per-pair pattern match is
    * [[graft.expressions.RobotsMatchExpr]] — a linear greedy segment
    * walk, NOT a compiled regex: patterns are untrusted robots.txt
    * content, and `*`→`.*` regexes backtrack explosively on hostile
    * star runs like `*a*a*a*a` after a slash (one domain's file
    * slowing the whole join). The match is confined to the tiny selected-rules side of
    * the join — URL bytes never re-shuffle for it. */
  def evaluate(urls: DataFrame, rules: DataFrame, agent: String,
               domainCol: String = "domain", pathCol: String = "path"): DataFrame = {
    val a = agent.toLowerCase
    // which group does each domain use for this agent?
    val groupOf = rules.groupBy(col("domain").as("_gd"))
      .agg(max(when(col("agent") === a, lit(a)).otherwise(lit("*"))).as("_use"))
    val selected = rules
      .join(groupOf, rules("domain") === col("_gd") && rules("agent") === col("_use"))
      .select(rules("domain").as("_rd"), col("allow").as("_allow"),
        octet_length(col("prefix")).as("_plen"), col("prefix").as("_pre"))
    val rank = when(col("_allow"), col("_plen") * 2 + 1).otherwise(col("_plen") * 2)
    import org.apache.spark.sql.graftbridge.Bridge
    val matches = Bridge.column(graft.expressions.RobotsMatchExpr(
      Bridge.expression(urls(pathCol)), Bridge.expression(col("_pre"))))
    urls
      .join(selected, urls(domainCol) === col("_rd") && matches, "left_outer")
      .groupBy(urls.columns.map(urls(_)): _*)
      .agg(max(rank).as("_best"))
      .withColumn("allowed", col("_best").isNull || col("_best") % 2 === 1)
      .drop("_best")
  }
}
