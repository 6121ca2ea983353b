package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parity proof for the round-14 native URL expressions: the REPLACED
  * column chains, reconstructed here verbatim from their pre-round-14
  * form, run side by side with [[UrlCanonicalize]]/[[UrlResolve]] over
  * a seeded fuzz corpus of adversarial URLs — ports, utm params,
  * percent escapes, unicode, dot segments, fragments, scheme-less
  * garbage, empty and null fields. The native impls claim parity BY
  * CONSTRUCTION (same cached Java regex, same UTF-8-byte sort); this
  * spec is the direct instrument for that claim, independent of the
  * oracle suite (whose fixtures are clean by design).
  *
  * Locale caveat: the native impl lowercases with Locale.ROOT, while
  * the replaced chain's lower() falls back to DEFAULT-locale
  * String.toLowerCase for non-ASCII — a deliberate divergence (hosts
  * must lowercase locale-independently; Turkish dotted-I is the classic
  * failure). Parity therefore holds only under a locale whose ASCII
  * case mapping is standard, which the guard below pins: if this suite
  * ever runs under tr/az (where 'I'.toLower ≠ 'i'), it fails loudly
  * here instead of mysteriously in the fuzz comparison. */
class UrlExpressionParitySpec extends SparkSpec {
  import spark.implicits._

  test("jvm default locale upholds the parity assumption (ROOT-equal ASCII case)") {
    val tag = java.util.Locale.getDefault.getLanguage
    assert("ITLI".toLowerCase == "itli",
      s"default locale '$tag' breaks ASCII case folding; the old-chain vs " +
        "native comparison below is only meaningful under a ROOT-like locale")
  }

  /** The pre-round-14 urlCanonicalize column chain, verbatim. */
  private def oldCanon(url: Column): Column = {
    val pat = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"
    val scheme = lower(regexp_extract(url, pat, 1))
    val host0 = lower(regexp_extract(url, pat, 2))
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val path0 = regexp_extract(url, pat, 3)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val q = array_join(
      array_sort(filter(split(regexp_extract(url, pat, 4), "&"),
        x => x =!= "" && !x.startsWith("utm_"))), "&")
    when(scheme === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, path,
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** The pre-round-14 urlResolve column chain, verbatim. */
  private def oldResolve(base: Column, ref: Column): Column = {
    val pat = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*).*$"
    val scheme = lower(regexp_extract(base, pat, 1))
    val hostport = regexp_extract(base, pat, 2)
    val bpath0 = regexp_extract(base, pat, 3)
    val bpath = when(bpath0 === "", lit("/")).otherwise(bpath0)
    val origin = concat(scheme, lit("://"), hostport)
    val dir0 = regexp_replace(bpath, "[^/]*$", "")
    val dir = when(dir0 === "", lit("/")).otherwise(dir0)
    val r = ref
    val hasScheme = r.rlike("^[A-Za-z][A-Za-z0-9+.-]*:")
    val merged =
      when(r.startsWith("/"), r).otherwise(concat(dir, r))
    val mergedPath = regexp_extract(merged, "^([^?#]*)", 1)
    val mergedSuffix = regexp_replace(merged, "^[^?#]*", "")
    val foldedPath = (1 to 4).foldLeft(mergedPath) { (p, _) =>
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        p, "/\\./", "/"), "/\\.$", "/"),
        "/[^/]+/\\.\\./", "/"), "/[^/]+/\\.\\.$", "/"),
        "^/\\.\\.(/|$)", "/")
    }
    val resolved =
      when(hasScheme, r)
        .when(r.startsWith("//"), concat(scheme, lit(":"), r))
        .when(r.startsWith("?"), concat(origin, bpath, r))
        .when(r.startsWith("#"), concat(base, r))
        .when(r === "", base)
        .otherwise(concat(origin, foldedPath, mergedSuffix))
    when(scheme === "" && !hasScheme, lit(null).cast("string")).otherwise(resolved)
  }

  private def fuzzUrls(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val schemes = Seq("http", "https", "HTTP", "ftp", "a+b-c.d", "1bad", "")
    val hosts = Seq("A.ORG", "a.org:80", "a.org:443", "a.org:8080", "δ.example",
      "a_b.org", "", "a.org.")
    val paths = Seq("", "/", "/p", "/P/Q", "/a/./b", "/a/../b", "/a/b/../../c",
      "/../x", "/p%41th", "/p%2Fx", "/p%zz", "/ /x", "/p#inline")
    val queries = Seq("", "?", "?b=2&a=1", "?a=1&&b=2", "?utm_source=x&a=1",
      "?utm_only=1", "?A=1&a=2", "?x=%2f", "?return=/a/../b")
    val frags = Seq("", "#f", "#", "#a#b")
    (1 to n).map { _ =>
      val pick = rnd.nextInt(10)
      if (pick == 0) Seq("not a url", "a.org/x", "://x", "mailto:x@y",
        "  ", "%41", "//proto.rel/x")(rnd.nextInt(7))
      else
        schemes(rnd.nextInt(schemes.length)) + "://" +
          hosts(rnd.nextInt(hosts.length)) +
          paths(rnd.nextInt(paths.length)) +
          queries(rnd.nextInt(queries.length)) +
          frags(rnd.nextInt(frags.length))
    }
  }

  test("UrlCanonicalize ≡ the replaced column chain over 600 adversarial URLs") {
    val urls = (fuzzUrls(600, 0x14C4) ++ Seq(null: String)).toDF("u")
    val mismatches = urls
      .select(col("u"), oldCanon(col("u")).as("old"),
        graft.operators.TextOps.urlCanonicalize(col("u")).as("nw"))
      .filter(!(col("old") <=> col("nw")))
      .collect()
    assert(mismatches.isEmpty,
      s"native canonicalize diverged on: ${mismatches.take(5).mkString("; ")}")
  }

  test("UrlResolve ≡ the replaced column chain over 600 (base, ref) pairs") {
    val rnd = new scala.util.Random(0x14C5)
    val bases = fuzzUrls(120, 0x14C6) :+ (null: String)
    val refs = Seq("", "/abs", "rel", "rel/x", "../up", "../../up2", "./same",
      "?q=1", "#frag", "//other.org/p", "http://abs.org/x", "mailto:x@y",
      "a:b", "..", ".", "/a/../b?keep=/c/../d", null)
    val pairs = (1 to 600).map { _ =>
      (bases(rnd.nextInt(bases.length)), refs(rnd.nextInt(refs.length)))
    }.toDF("b", "r")
    val mismatches = pairs
      .select(col("b"), col("r"), oldResolve(col("b"), col("r")).as("old"),
        graft.operators.TextOps.urlResolve(col("b"), col("r")).as("nw"))
      .filter(!(col("old") <=> col("nw")))
      .collect()
    assert(mismatches.isEmpty,
      s"native resolve diverged on: ${mismatches.take(5).mkString("; ")}")
  }
}
