package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.expressions._

/** `spark.sql.extensions` entry point — the idiomatic cluster-deployment
  * wiring (`--conf spark.sql.extensions=graft.GraftExtensions`): injects
  * the library's native Catalyst expressions into the SQL function
  * registry, so a SQL-only user (a notebook, a BI tool, a `spark.sql`
  * pipeline) gets the codegen'd kernels — NOT UDF shims — with no Scala
  * import. The Scala surface (`graft.operators.*`) builds the same
  * expression nodes directly; this class is the SQL door to them.
  *
  * Only stateless, arity-checkable expressions are injected. The
  * bloom/manifest pruning rule (`plans.TxidIndexPruneRule`) stays on
  * its store-scoped registration path — an optimizer rule bound to a
  * TableStore instance has no meaningful session-global form.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_cosine"),
      info(classOf[CosineSim], "graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two float arrays, NULL on zero norms"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_cosine(a, b)")
        CosineSim(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info(classOf[VectorDot], "graft_dot",
        "graft_dot(a, b) - dot product of two float arrays"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(a, b)")
        VectorDot(args(0), args(1))
      }))
    ext.injectFunction((FunctionIdentifier("graft_simhash16"),
      info(classOf[SimHash16], "graft_simhash16",
        "graft_simhash16(tokens) - 16-bit SimHash of a token array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_simhash16(tokens)")
        SimHash16(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_nfc"),
      info(classOf[NfcNormalize], "graft_nfc",
        "graft_nfc(s) - Unicode NFC normalization"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_nfc(s)")
        NfcNormalize(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_fix_mojibake"),
      info(classOf[FixMojibakeExpr], "graft_fix_mojibake",
        "graft_fix_mojibake(s) - repair utf-8-read-as-cp1252 mojibake, clean text unchanged"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_fix_mojibake(s)")
        FixMojibakeExpr(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_deflate_len"),
      info(classOf[DeflateLength], "graft_deflate_len",
        "graft_deflate_len(s) - deflate-compressed byte length of a string"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_deflate_len(s)")
        DeflateLength(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_int8_quantize"),
      info(classOf[Int8Quantize], "graft_int8_quantize",
        "graft_int8_quantize(v) - SQ8 lattice quantization of a float array"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_int8_quantize(v)")
        Int8Quantize(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_hll_bucket_rho"),
      info(classOf[HllBucketRho], "graft_hll_bucket_rho",
        "graft_hll_bucket_rho(key) - HLL (bucket, rho) struct from the key's md5 digest"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_hll_bucket_rho(key)")
        HllBucketRho(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_charset_decode"),
      info(classOf[CharsetDecodeExpr], "graft_charset_decode",
        "graft_charset_decode(blob) - charset sniff + strict decode: " +
          "struct(charset, text); 'unknown' = quarantine verdict"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_charset_decode(blob)")
        CharsetDecodeExpr(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_gunzip_text"),
      info(classOf[GzipTextExpr], "graft_gunzip_text",
        "graft_gunzip_text(blob) - gunzip-by-content to UTF-8 text: gzip magic decodes " +
          "all concatenated members, plain bytes read as UTF-8, malformed gzip -> NULL"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_gunzip_text(blob)")
        GzipTextExpr(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_url_pct_normalize"),
      info(classOf[UrlPctNormalize], "graft_url_pct_normalize",
        "graft_url_pct_normalize(url) - RFC 3986 percent normalization: unreserved " +
          "escapes decode, reserved escapes uppercase, malformed % copies literally"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_url_pct_normalize(url)")
        UrlPctNormalize(args(0))
      }))
    ext.injectFunction((FunctionIdentifier("graft_blocklist_counts"),
      info(classOf[BlocklistCountsExpr], "graft_blocklist_counts",
        "graft_blocklist_counts(text, array('p1', ...)[, fold_case]) - per-pattern " +
          "Aho-Corasick occurrence counts, aligned with the literal pattern array"),
      (args: Seq[Expression]) => {
        require(args.length == 2 || args.length == 3,
          "graft_blocklist_counts(text, patterns[, fold_case])")
        val fold = if (args.length == 3) literalBoolean(args(2), "fold_case") else false
        val pats = literalPatterns(args(1), "graft_blocklist_counts")
        BlocklistCountsExpr(args(0),
          if (fold) pats.map(_.toLowerCase(java.util.Locale.ROOT)).distinct else pats,
          fold)
      }))
    ext.injectFunction((FunctionIdentifier("graft_redact_blocklist"),
      info(classOf[RedactBlocklistExpr], "graft_redact_blocklist",
        "graft_redact_blocklist(text, array('p1', ...)) - leftmost-longest " +
          "length-preserving redaction: struct(red, n)"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_redact_blocklist(text, patterns)")
        RedactBlocklistExpr(args(0), literalPatterns(args(1), "graft_redact_blocklist"))
      }))
  }

  /** The pattern list must be a compile-time literal — the automaton
    * builds once per plan, not per row. Accepts both the `array('a',
    * 'b')` form (CreateArray of literals) and a pre-folded array
    * literal. */
  private def literalPatterns(e: Expression, fn: String): Seq[String] = e match {
    case org.apache.spark.sql.catalyst.expressions.CreateArray(items, _) =>
      items.map {
        case org.apache.spark.sql.catalyst.expressions.Literal(
            s: org.apache.spark.unsafe.types.UTF8String, _) => s.toString
        case other => throw new IllegalArgumentException(
          s"$fn: patterns must be string literals, got $other")
      }
    case org.apache.spark.sql.catalyst.expressions.Literal(
        arr: org.apache.spark.sql.catalyst.util.ArrayData,
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType, _)) =>
      arr.toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString).toSeq
    case other => throw new IllegalArgumentException(
      s"$fn: patterns must be a literal string array, got $other")
  }

  private def literalBoolean(e: Expression, what: String): Boolean = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(b: java.lang.Boolean, _) => b
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }
}
