package graft.queries

import graft.Tables
import graft.operators.{Bpe, Dedup, Sharding, Similarity, Sketches, TextOps, WordPiece}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over `documents` / `embeddings`
  * (builder mandate: dedup, similarity search, text analysis at 100 TB
  * scale). Library implementations live in graft.operators; these entries
  * bind them to the driver corpus with DuckDB oracles.
  *
  * Scale notes: everything here is a single groupBy/aggregation pass or a
  * broadcast join against a constant-size side — no pairwise blowup on the
  * full corpus (LSH banding keeps candidate generation sub-quadratic).
  */
object DataPipelineQueries {

  private val wordsCol = TextOps.tokens(col("text"))

  // Shared by pipeline_dsir_select AND pipeline_dsir_incremental — the
  // incremental-BM25 doctrine: the arrival-path result must be
  // bit-identical to the from-scratch one, proven by one oracle.
  private val DsirSelectOracleSql: String =
    s"""WITH t AS (SELECT doc_id, coalesce(lang = 'en', false) AS is_t,
         |             list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
         |e AS (SELECT doc_id, is_t, unnest(ws) AS w FROM t),
         |eb AS (SELECT doc_id, is_t,
         |         CAST(CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(w), 1, 8)[i]) - 1)
         |              * power(16, 8 - i) for i in range(1, 9) ]) AS BIGINT) % 1024 AS INTEGER) AS b
         |       FROM e),
         |db AS (SELECT doc_id, is_t, b, CAST(count(*) AS BIGINT) AS occ FROM eb GROUP BY 1, 2, 3),
         |stats AS (SELECT b, CAST(sum(CASE WHEN is_t THEN occ ELSE 0 END) + 1 AS BIGINT) AS t,
         |                 CAST(sum(occ) + 1 AS BIGINT) AS r FROM db GROUP BY b),
         |tots AS (SELECT CAST(sum(t) AS BIGINT) AS tt, CAST(sum(r) AS BIGINT) AS rt FROM stats),
         |nd AS (SELECT b, t * rt AS num, r * tt AS den FROM stats, tots),
         |${DsirOracle.fixedPointLog2Cte("nd")},
         |pd AS (SELECT db.doc_id, CAST(sum(sbq.sb * db.occ) AS BIGINT) AS raw,
         |              CAST(sum(db.occ) AS BIGINT) AS n
         |       FROM db JOIN sbq USING (b) GROUP BY db.doc_id),
         |sc AS (SELECT d.doc_id AS doc, coalesce(pd.n, 0) AS n_tokens,
         |              coalesce(pd.raw, 0) AS imp_q8
         |       FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id),
         |hist AS (SELECT imp_q8, CAST(count(*) AS BIGINT) AS c FROM sc GROUP BY imp_q8),
         |cum AS (SELECT imp_q8, sum(c) OVER (ORDER BY imp_q8 DESC) AS cm FROM hist),
         |cut AS (SELECT max(imp_q8) AS cutoff FROM cum
         |        WHERE cm >= ((SELECT count(*) FROM sc) * 300 + 999) // 1000)
         |SELECT sc.doc, sc.n_tokens, sc.imp_q8,
         |       sc.imp_q8 >= cut.cutoff AS selected
         |FROM sc, cut ORDER BY sc.doc""".stripMargin

  // The four-gate CTE prefix (gopher -> classifier -> unigram surprisal
  // -> bigram surprisal keep flags per doc) shared VERBATIM by
  // pipeline_filter_funnel and pipeline_drop_reasons, so the audit can
  // never drift from the funnel.
  private val FilterGatePrefixSql: String =
    """WITH docs AS (SELECT doc_id, coalesce(lang, '??') AS lang, text,
        |    list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws,
        |    string_split(text, chr(10)) AS ls
        |  FROM documents),
        |gm AS (SELECT doc_id,
        |    len(ws) AS n,
        |    CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / nullif(len(ws), 0) AS mean_len,
        |    (CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
        |      + CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3.0)
        |      / nullif(len(ws), 0) AS sym_ratio,
        |    CAST(len(list_filter(ls, l -> left(ltrim(l), 1) IN ('-', '*'))) AS DOUBLE) / len(ls) AS bullet_frac,
        |    CAST(len(list_filter(ls, l -> right(l, 3) = '...')) AS DOUBLE) / len(ls) AS ell_frac,
        |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE) / nullif(len(ws), 0) AS alpha_frac,
        |    len(list_filter(['spark','window','merge','table','column','vector','stream','value'], s -> list_contains(ws, s))) AS stop_hits
        |  FROM docs),
        |gk AS (SELECT doc_id,
        |    (n >= 20 AND n <= 100000 AND coalesce(mean_len >= 3.0 AND mean_len <= 10.0, false)
        |     AND coalesce(sym_ratio <= 0.1, false) AND bullet_frac <= 0.9 AND ell_frac <= 0.3
        |     AND coalesce(alpha_frac >= 0.8, false) AND stop_hits >= 2) AS g_keep
        |  FROM gm),
        |cv(w, wt) AS (VALUES ('vector', 400), ('stream', 300), ('query', 250), ('data', 200),
        |              ('join', 150), ('the', -50), ('a', -20), ('slow', -350)),
        |ce AS (SELECT doc_id, unnest(ws) AS w FROM docs),
        |ch AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS raw FROM ce JOIN cv USING (w) GROUP BY doc_id),
        |ck AS (SELECT d.doc_id,
        |    coalesce(coalesce(h.raw, 0) /
        |      (CASE WHEN len(d.ws) = 0 THEN NULL ELSE len(d.ws) END * 1000.0) >= 0.02, false) AS c_keep
        |  FROM docs d LEFT JOIN ch h ON h.doc_id = d.doc_id),
        |sdw AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS occ FROM ce GROUP BY doc_id, w),
        |sv AS (SELECT w, CAST(sum(occ) AS BIGINT) AS cnt FROM sdw GROUP BY w),
        |stot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM sv),
        |sbits AS (SELECT w, CAST(length(bin(total // cnt)) - 1 AS BIGINT) AS bits FROM sv, stot),
        |sdoc AS (SELECT sdw.doc_id, CAST(sum(sbits.bits * sdw.occ) AS BIGINT) AS raw_bits,
        |             CAST(sum(sdw.occ) AS BIGINT) AS n
        |      FROM sdw JOIN sbits USING (w) GROUP BY sdw.doc_id),
        |sk AS (SELECT d.doc_id,
        |    coalesce(s.raw_bits / CAST(CASE WHEN coalesce(s.n, 0) = 0 THEN NULL ELSE s.n END AS DOUBLE)
        |      BETWEEN 4.01 AND 4.4, false) AS s_keep
        |  FROM docs d LEFT JOIN sdoc s ON s.doc_id = d.doc_id),
        |be AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM docs WHERE len(ws) >= 2)),
        |bbi AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS occ FROM be GROUP BY 1, 2, 3),
        |bbig AS (SELECT w1, w2, CAST(sum(occ) AS BIGINT) AS big FROM bbi GROUP BY 1, 2),
        |bctx AS (SELECT w1, CAST(sum(big) AS BIGINT) AS ctx FROM bbig GROUP BY 1),
        |blm AS (SELECT w1, w2, CAST(length(bin(ctx // big)) - 1 AS BIGINT) AS bits
        |       FROM bbig JOIN bctx USING (w1)),
        |bdoc AS (SELECT bbi.doc_id, CAST(sum(blm.bits * bbi.occ) AS BIGINT) AS raw_bits,
        |             CAST(sum(bbi.occ) AS BIGINT) AS n
        |      FROM bbi JOIN blm USING (w1, w2) GROUP BY 1),
        |bk AS (SELECT d.doc_id,
        |    coalesce(b.raw_bits / CAST(CASE WHEN coalesce(b.n, 0) = 0 THEN NULL ELSE b.n END AS DOUBLE)
        |      BETWEEN 4.15 AND 4.45, false) AS b_keep
        |  FROM docs d LEFT JOIN bdoc b ON b.doc_id = d.doc_id)""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // ── Exact dedup: content-hash groupBy, keep lowest doc_id per group. ──
    QueryDef.sql(
      "dedup_exact",
      """SELECT md5(text) AS content_hash,
        |  CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
        |  CAST(COUNT(*) AS BIGINT) AS group_size
        |FROM documents
        |GROUP BY md5(text)
        |ORDER BY content_hash NULLS LAST""".stripMargin) {
      (s, d) =>
        Dedup.exact(Tables.documents(s, d), "doc_id", "text")
          .orderBy(asc_nulls_last("content_hash"))
    },

    // ── Text normalization (HTML strip → NFC → case fold → whitespace
    //    collapse): the pre-dedup cleaning pass. A projection — its
    //    bench line is scan+count (the long-standing count()-pruning
    //    caveat); correctness is hash-pinned through Verify. ──
    QueryDef.sql(
      "text_normalize",
      """WITH n AS (SELECT doc_id,
        |  trim(regexp_replace(lower(nfc_normalize(regexp_replace(text, '<[^>]*>', ' ', 'g'))), '\s+', ' ', 'g')) AS norm_text
        |FROM documents)
        |SELECT doc_id, norm_text, CAST(length(norm_text) AS BIGINT) AS n_chars
        |FROM n ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            TextOps.normalize(col("text"), stripHtml = true).as("norm_text"))
          .select(col("doc_id"), col("norm_text"),
            length(col("norm_text")).cast("long").as("n_chars"))
          .orderBy("doc_id")
    },

    // ── HTML → text extraction — the web-corpus entry stage, a real
    //    step beyond the bare tag strip: script/style ELEMENTS drop
    //    with their contents (the classic JS/CSS contamination a tag
    //    strip leaks), comments drop, <br>/</p> become newlines so
    //    paragraphs survive for paragraph dedup, remaining tags strip,
    //    named entities decode (&amp; LAST or it double-decodes),
    //    whitespace tidies. Both engines build the SAME HTML wrapper
    //    around each doc (title + style + script + heading + entity
    //    suffix) and run the SAME RE2-compatible chain — a pattern
    //    drift, flag difference, or entity-order bug breaks the md5. ──
    QueryDef.sql(
      "text_html_extract",
      """WITH h AS (SELECT doc_id,
        |    '<html><head><title>t</title><style>p { color: red; }</style>' ||
        |    '<script>if (1 < 2) { go(); }</script></head><body><!-- note -->' ||
        |    '<h1>Doc ' || doc_id || '</h1><p>' || coalesce(text, '') || '</p><br>' ||
        |    '<p>A &amp; B &lt;x&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p></body></html>' AS html
        |  FROM documents),
        |c1 AS (SELECT doc_id,
        |    regexp_replace(html, '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS t FROM h),
        |c2 AS (SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM c1),
        |c3 AS (SELECT doc_id, regexp_replace(t, '(?i)<br[^>]*>|</p[^>]*>', chr(10), 'g') AS t FROM c2),
        |c4 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM c3),
        |c5 AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(t, '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |      '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS t FROM c4),
        |c6 AS (SELECT doc_id, regexp_replace(t, '[ \t]+', ' ', 'g') AS t FROM c5),
        |c7 AS (SELECT doc_id, regexp_replace(regexp_replace(t, '(?: ?\n ?)+', chr(10), 'g'),
        |                                     '^\n+|\n+$', '', 'g') AS t FROM c6),
        |clean AS (SELECT doc_id, trim(t) AS t FROM c7)
        |SELECT doc_id, CAST(length(t) AS BIGINT) AS n_chars,
        |  CAST(1 + length(t) - length(replace(t, chr(10), '')) AS BIGINT) AS n_lines,
        |  md5(t) AS clean_md5
        |FROM clean ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val html = concat(
          lit("<html><head><title>t</title><style>p { color: red; }</style>" +
            "<script>if (1 < 2) { go(); }</script></head><body><!-- note --><h1>Doc "),
          col("doc_id").cast("string"),
          lit("</h1><p>"), coalesce(col("text"), lit("")),
          lit("</p><br><p>A &amp; B &lt;x&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</p></body></html>"))
        Tables.documents(s, d)
          .select(col("doc_id"), TextOps.htmlExtract(html).as("t"))
          .select(col("doc_id"),
            length(col("t")).cast("long").as("n_chars"),
            (lit(1) + length(col("t")) - length(regexp_replace(col("t"), "\n", "")))
              .cast("long").as("n_lines"),
            md5(col("t").cast("binary")).as("clean_md5"))
          .orderBy("doc_id")
    },

    // ── C4 rule set (Raffel et al. 2020 §2.2) — the NAMED per-row
    //    filter family beside the Gopher gates: line tier (non-blank,
    //    ≥3 words, terminal punctuation, no "javascript" banner), then
    //    doc tier (lorem-ipsum placeholder, curly-brace code, <5
    //    sentences over the KEPT lines) in C4's gate order. Both
    //    engines synthesize the SAME multi-line page (headline fragment
    //    that always fails the line tier, a body line, and mod-keyed
    //    banner/placeholder/code/extra-sentence lines) and replay the
    //    SAME predicate chain — a word-count, terminal-punct, gate-order
    //    or sentence-count drift breaks verdicts and md5s. Corpus-
    //    frequency line removal and span dedup — the cross-doc half of
    //    the C4 pass — are text_boilerplate_lines / text_para_dedup. ──
    QueryDef.sql(
      "text_c4_filters",
      """WITH raw AS (SELECT doc_id,
        |  'Headline ' || doc_id || chr(10) ||
        |  substr(coalesce(text, ''), 1, 120) || ' ends here.' ||
        |  CASE WHEN doc_id % 3 = 0 THEN chr(10) || 'Please enable JavaScript to continue.' ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'Lorem ipsum dolor sit amet.' ELSE '' END ||
        |  CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'function f() { return 1; }' ELSE '' END ||
        |  CASE WHEN doc_id % 2 = 0 THEN chr(10) || 'One more ends here. Another follows! Shall we? Yes.' ELSE '' END AS t
        |  FROM documents),
        |f AS (SELECT doc_id, t,
        |  list_filter(regexp_split_to_array(t, '\r?\n'), l ->
        |    trim(l) <> '' AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
        |    AND regexp_matches(trim(l), '[.!?"]$')
        |    AND NOT contains(lower(trim(l)), 'javascript')) AS kept
        |  FROM raw),
        |c AS (SELECT doc_id, t, kept, coalesce(array_to_string(kept, chr(10)), '') AS clean FROM f),
        |v AS (SELECT doc_id, t, kept, clean,
        |  CAST(len(regexp_split_to_array(clean, '[.!?]')) - 1 AS BIGINT) AS n_sentences FROM c)
        |SELECT doc_id,
        |  CAST(len(regexp_split_to_array(t, '\r?\n')) AS BIGINT) AS n_lines,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  n_sentences,
        |  CASE WHEN contains(lower(t), 'lorem ipsum') THEN 'lorem_ipsum'
        |       WHEN contains(t, '{') THEN 'curly_brace'
        |       WHEN n_sentences < 5 THEN 'too_few_sentences'
        |       ELSE 'kept' END AS verdict,
        |  md5(clean) AS clean_md5
        |FROM v ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val raw = concat(
          lit("Headline "), col("doc_id").cast("string"), lit("\n"),
          substring(coalesce(col("text"), lit("")), 1, 120), lit(" ends here."),
          when(pmod(col("doc_id"), lit(3)) === 0,
            "\nPlease enable JavaScript to continue.").otherwise(""),
          when(pmod(col("doc_id"), lit(7)) === 0,
            "\nLorem ipsum dolor sit amet.").otherwise(""),
          when(pmod(col("doc_id"), lit(11)) === 0,
            "\nfunction f() { return 1; }").otherwise(""),
          when(pmod(col("doc_id"), lit(2)) === 0,
            "\nOne more ends here. Another follows! Shall we? Yes.").otherwise(""))
        TextOps.c4Filter(
            Tables.documents(s, d).select(col("doc_id"), raw.as("t")),
            "doc_id", "t")
          .select(col("doc_id"), col("n_lines"), col("n_kept"),
            col("n_sentences"), col("verdict"),
            md5(col("clean_text").cast("binary")).as("clean_md5"))
          .orderBy("doc_id")
    },

    // ── HTML link graph — href/src targets a plain-text URL scan never
    //    sees (the URL lives in the ATTRIBUTE; the extracted text keeps
    //    only the anchor words): per-doc links from seed-built markup
    //    (two absolute targets + one relative that must be excluded by
    //    the domain parse), rolled up per domain — the provenance /
    //    per-domain-cap statistic of a web-corpus pipeline. ──
    QueryDef.sql(
      "text_html_links",
      """WITH l AS (
        |  SELECT 'd' || (doc_id % 50) || '.example.com' AS domain FROM documents
        |  UNION ALL
        |  SELECT 'img' || (doc_id % 20) || '.cdn.net' FROM documents)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_refs
        |FROM l GROUP BY domain ORDER BY domain""".stripMargin) {
      (s, d) =>
        val html = concat(
          lit("<p>read <a href=\"https://d"), pmod(col("doc_id"), lit(50)).cast("string"),
          lit(".example.com/p"), col("doc_id").cast("string"),
          lit("\">here</a><img src=\"https://img"), pmod(col("doc_id"), lit(20)).cast("string"),
          lit(".cdn.net/x.png\"><a href=\"/local/page\">rel</a></p>"))
        Tables.documents(s, d)
          .select(explode(TextOps.htmlLinks(html)).as("link"))
          .select(explode(TextOps.urlDomains(col("link"))).as("domain"))
          .groupBy("domain")
          .agg(count(lit(1)).cast("long").as("n_refs"))
          .orderBy("domain")
    },

    // ── WEB-CORPUS capstone — the full funnel from RAW BYTES: charset
    //    sniff + decode (even docs arrive as REAL windows-1252 bytes —
    //    the em-dash/euro tail encodes to 0x97/0x80 — odd docs as
    //    utf-8; the gate must label both and hand identical Unicode
    //    downstream) → HTML extraction (script/style/comment drop,
    //    entities, block newlines) → quality gates on the EXTRACTED
    //    text → exact dedup keep-min → per-domain cap (3 docs/domain
    //    through the bounded heap, never a hot rank window).
    //    pipeline_corpus_build's sibling with the entry stage the web
    //    actually arrives in; the shell deliberately omits doc ids so
    //    extraction output — and therefore dedup — depends on the text
    //    alone. The oracle never sees bytes: it replays the decoded
    //    shell, the 11-step extraction chain, the gates, the dedup,
    //    the domain arithmetic, and the md5-ordered cap — a mojibake'd
    //    euro in any even doc lands in that group's hash. ──
    QueryDef.sql(
      "pipeline_web_corpus",
      """WITH h AS (SELECT doc_id,
        |    '<html><head><style>p { x }</style><script>let a = 1 < 2;</script></head>' ||
        |    '<body><!-- c --><p>' || coalesce(text, '') ||
        |    '</p><br><p>A &amp; B&nbsp;tail — €1</p></body></html>' AS html
        |  FROM documents),
        |c1 AS (SELECT doc_id,
        |    regexp_replace(html, '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS t FROM h),
        |c2 AS (SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM c1),
        |c3 AS (SELECT doc_id, regexp_replace(t, '(?i)<br[^>]*>|</p[^>]*>', chr(10), 'g') AS t FROM c2),
        |c4 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM c3),
        |c5 AS (SELECT doc_id,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(t, '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
        |      '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS t FROM c4),
        |c6 AS (SELECT doc_id, regexp_replace(t, '[ \t]+', ' ', 'g') AS t FROM c5),
        |c7 AS (SELECT doc_id, regexp_replace(regexp_replace(t, '(?: ?\n ?)+', chr(10), 'g'),
        |                                     '^\n+|\n+$', '', 'g') AS t FROM c6),
        |clean AS (SELECT doc_id, trim(t) AS t FROM c7),
        |toks AS (SELECT doc_id, t,
        |    list_filter(string_split(trim(t), ' '), w -> w <> '') AS ws FROM clean),
        |feat AS (SELECT doc_id, t, len(ws) AS n_tokens,
        |    len(list_filter(ws, w -> w IN ('the','a','of','and'))) AS n_en,
        |    round(CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        |      / nullif(len(ws), 0), 4) AS sr
        |  FROM toks),
        |kept AS (SELECT doc_id, t, n_tokens FROM feat
        |         WHERE n_en >= 2 AND n_tokens >= 5 AND sr <= 0.5),
        |dd AS (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
        |              CAST(count(*) AS BIGINT) AS group_size,
        |              CAST(min(n_tokens) AS BIGINT) AS n_tokens
        |       FROM kept GROUP BY md5(t)),
        |dom AS (SELECT doc_id, group_size, n_tokens,
        |               'd' || (doc_id % 50) || '.example.com' AS domain FROM dd)
        |SELECT domain, doc_id, group_size, n_tokens FROM dom
        |QUALIFY row_number() OVER (PARTITION BY domain
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 3
        |ORDER BY domain, doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val stops = Seq("the", "a", "of", "and", "to", "in", "is")
        // the wire form, one layer deeper than the charset bytes: every
        // doc ships as a full HTTP response (even docs' bodies encode
        // to windows-1252 — the tail's em-dash/euro become single
        // 0x97/0x80 bytes, genuinely non-UTF-8 — odd docs to utf-8),
        // and every THIRD doc's body is additionally gzip-coded with
        // `Content-Encoding: gzip`, so the funnel exercises de-frame →
        // content-decode → charset gate in sequence: a missing gunzip
        // hands the charset gate compressed bytes and mojibakes the
        // group hash. The oracle never sees bytes; it replays the
        // decoded text, so it is UNCHANGED by the transport layer.
        val payloads = Tables.documents(s, d)
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
          .as[(Long, String)]
          .mapPartitions(_.map { case (id, text) =>
            val shell =
              "<html><head><style>p { x }</style><script>let a = 1 < 2;</script></head>" +
                s"<body><!-- c --><p>$text</p><br><p>A &amp; B&nbsp;tail — €1</p></body></html>"
            val encoded = graft.codec.CharsetCodec.encode(shell,
              if (id % 2 == 0) "windows-1252" else "utf-8")
            val wire =
              if (id % 3 == 0) graft.codec.HttpCodec.write(200, "OK",
                Seq("Content-Type" -> "text/html", "Content-Encoding" -> "gzip"),
                graft.codec.GzipCodec.gzipMember(encoded))
              else graft.codec.HttpCodec.write(200, "OK",
                Seq("Content-Type" -> "text/html"), encoded)
            (id, wire)
          })
          .toDF("doc_id", "wire")
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, wire) =>
            val r = graft.codec.HttpCodec.parse(wire)
              .getOrElse(sys.error(s"own wire response failed to parse: doc $id"))
            (id, r.body)
          })
          .toDF("doc_id", "payload")
        val clean = TextOps.htmlExtract(col("html"))
        val (n, _, sr) = TextOps.qualityMetrics(col("ws"), stops)
        val gated = TextOps.decodeCharset(payloads, "payload", "charset", "html")
          .select(col("doc_id"), clean.as("clean"))
          .select(col("doc_id"), col("clean"), TextOps.tokens(col("clean")).as("ws"))
          .select(col("doc_id"), col("clean"), n.as("n_tokens"),
            TextOps.langIdEn(col("ws"), Seq("the", "a", "of", "and"), minHits = 2).as("plang"),
            sr.as("sr"))
          .filter(col("plang") === "en" && col("n_tokens") >= 5 && col("sr") <= 0.5)
        val dedup = gated
          .groupBy(md5(col("clean").cast("binary")).as("h"))
          .agg(min("doc_id").cast("long").as("doc_id"),
            count(lit(1)).cast("long").as("group_size"),
            min("n_tokens").cast("long").as("n_tokens"))
        val dom = dedup.select(col("doc_id"), col("group_size"), col("n_tokens"),
          concat(lit("d"), pmod(col("doc_id"), lit(50)).cast("string"),
            lit(".example.com")).as("domain"))
        Sharding.samplePerGroupRows(dom, "domain", "doc_id", 3,
            Seq("group_size", "n_tokens"))
          .select(col("domain"), col("doc_id"), col("group_size"), col("n_tokens"))
          .orderBy("domain", "doc_id")
    },

    // ── ARTICLE-CORPUS capstone — the modern web recipe end-to-end,
    //    composing the round's two named filters into the funnel:
    //    charset-encoded BYTES (even docs real windows-1252 — the
    //    article paragraph itself carries an em-dash and a euro that
    //    encode to 0x97/0x80, so a decode bug lands in the KEPT text
    //    and breaks group hashes — odd docs utf-8) → charset gate →
    //    block-level MAIN-CONTENT extraction (nav/related/footer
    //    chrome drops by link density; the h1 carrying the doc id
    //    drops by length, so the surviving text is ID-FREE and dedup
    //    depends on content alone) → C4 rules over the extracted
    //    blocks (the mod-3 "enable JavaScript" paragraph SURVIVES the
    //    density bar — it is long and link-free — and only the C4
    //    line tier removes it: the two filters catch different
    //    boilerplate, which is why real recipes run both) → exact
    //    dedup keep-min — REAL dup mass at every SF: every tenth doc
    //    is a syndicated MIRROR carrying one shared wire story with no
    //    per-doc paragraphs, so the whole slice collapses to a single
    //    keep-min group (group_size = |slice|) while per-doc pages
    //    stay unique — → per-domain cap of 3 via the bounded heap.
    //    Gate interplay pinned: lorem > curly > sentence verdicts on
    //    mod-7/mod-11 paragraphs that PASS main-content extraction.
    //    Plan: per-row stages ride the scan; one shuffle for the dedup
    //    groupBy, one for the bounded-heap cap — no window over a hot
    //    domain, no explode. The oracle never sees bytes: it replays
    //    the decoded page, both filter chains, the dedup, and the
    //    md5-ordered cap. ──
    QueryDef.sql(
      "pipeline_article_corpus",
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>d</title><style>.x{color:red}</style></head><body>' ||
        |  '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>' ||
        |  '<h1>Doc ' || doc_id || '</h1>' ||
        |  '<div class="post">' ||
        |  CASE WHEN doc_id % 10 = 9 THEN '<p>The shared syndicated wire story repeats verbatim across mirrors. It has five sentences to pass the gate. Three now follows here! Shall it pass? Yes indeed it does.</p>'
        |  ELSE '<p>' || coalesce(text, '') || ' ' || chr(8212) || ' ' || chr(8364) || '1 ends here.</p>' ||
        |    CASE WHEN doc_id % 3 = 0 THEN '<p>Please enable JavaScript to view the comments on this page.</p>' ELSE '' END ||
        |    CASE WHEN doc_id % 2 = 0 THEN '<p>One more thought ends here. Another follows! Shall we? Yes indeed.</p>' ELSE '' END ||
        |    CASE WHEN doc_id % 7 = 0 THEN '<p>Lorem ipsum dolor sit amet consectetur adipiscing elit sed do.</p>' ELSE '' END ||
        |    CASE WHEN doc_id % 11 = 0 THEN '<p>Widget config uses braces { color: red } inline for styling now.</p>' ELSE '' END ||
        |    CASE WHEN doc_id % 4 = 0 THEN '<blockquote>A quoted passage long enough to pass the chars bar with <a href="/cite">one link</a> inside it stays content.</blockquote>' ELSE '' END
        |  END ||
        |  '</div><ul><li><a href="/r/1">Related one</a></li><li><a href="/r/2">Related two</a></li></ul>' ||
        |  '<footer>Copyright 2026 <a href="/legal">legal</a> <a href="/privacy">privacy</a></footer></body></html>' AS html
        |  FROM documents),
        |c1 AS (SELECT doc_id, regexp_replace(html, '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS t FROM h),
        |c2 AS (SELECT doc_id, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM c1),
        |b AS (SELECT doc_id, regexp_split_to_array(t,
        |  '(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|header|footer|nav|aside|blockquote|pre|br)(?:\s[^>]*)?/?>') AS blocks FROM c2),
        |e AS (SELECT doc_id, list_transform(blocks, x -> struct_pack(
        |    txt := trim(regexp_replace(regexp_replace(x, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')),
        |    alen := CAST(length(trim(regexp_replace(regexp_replace(coalesce(array_to_string(regexp_extract_all(x, '(?is)<a(?:\s[^>]*)?>(.*?)</a>', 1), ' '), ''), '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))) AS BIGINT))) AS bs FROM b),
        |ne AS (SELECT doc_id, list_filter(bs, s -> length(s.txt) > 0) AS bs FROM e),
        |k AS (SELECT doc_id,
        |  list_filter(bs, s -> length(s.txt) >= 25 AND CAST(s.alen AS DOUBLE) <= 0.33 * length(s.txt)) AS keep FROM ne),
        |m AS (SELECT doc_id, coalesce(array_to_string(list_transform(keep, s -> s.txt), chr(10)), '') AS main FROM k),
        |f AS (SELECT doc_id, main,
        |  list_filter(regexp_split_to_array(main, '\r?\n'), l ->
        |    trim(l) <> '' AND len(regexp_split_to_array(trim(l), '\s+')) >= 3
        |    AND regexp_matches(trim(l), '[.!?"]$')
        |    AND NOT contains(lower(trim(l)), 'javascript')) AS keptl
        |  FROM m),
        |c AS (SELECT doc_id, main, keptl, coalesce(array_to_string(keptl, chr(10)), '') AS clean FROM f),
        |v AS (SELECT doc_id, main, keptl, clean,
        |  CAST(len(regexp_split_to_array(clean, '[.!?]')) - 1 AS BIGINT) AS n_sentences FROM c),
        |vv AS (SELECT doc_id, clean, n_sentences, CAST(len(keptl) AS BIGINT) AS n_kept,
        |  CASE WHEN contains(lower(main), 'lorem ipsum') THEN 'lorem_ipsum'
        |       WHEN contains(main, '{') THEN 'curly_brace'
        |       WHEN n_sentences < 5 THEN 'too_few_sentences'
        |       ELSE 'kept' END AS verdict FROM v),
        |dd AS (SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
        |              CAST(count(*) AS BIGINT) AS group_size,
        |              CAST(min(n_kept) AS BIGINT) AS n_kept,
        |              CAST(min(n_sentences) AS BIGINT) AS n_sentences
        |       FROM vv WHERE verdict = 'kept' GROUP BY md5(clean)),
        |dom AS (SELECT doc_id, group_size, n_kept, n_sentences,
        |               'd' || (doc_id % 50) || '.example.com' AS domain FROM dd)
        |SELECT domain, doc_id, group_size, n_kept, n_sentences FROM dom
        |QUALIFY row_number() OVER (PARTITION BY domain
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) <= 3
        |ORDER BY domain, doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = Tables.documents(s, d)
          .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
          .as[(Long, String)]
          .mapPartitions(_.map { case (id, text) =>
            val page =
              "<html><head><title>d</title><style>.x{color:red}</style></head><body>" +
                "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></nav>" +
                s"<h1>Doc $id</h1>" +
                "<div class=\"post\">" +
                (if (id % 10 == 9)
                  "<p>The shared syndicated wire story repeats verbatim across mirrors. " +
                    "It has five sentences to pass the gate. Three now follows here! " +
                    "Shall it pass? Yes indeed it does.</p>"
                else
                  "<p>" + text + " — €1 ends here.</p>" +
                    (if (id % 3 == 0) "<p>Please enable JavaScript to view the comments on this page.</p>" else "") +
                    (if (id % 2 == 0) "<p>One more thought ends here. Another follows! Shall we? Yes indeed.</p>" else "") +
                    (if (id % 7 == 0) "<p>Lorem ipsum dolor sit amet consectetur adipiscing elit sed do.</p>" else "") +
                    (if (id % 11 == 0) "<p>Widget config uses braces { color: red } inline for styling now.</p>" else "") +
                    (if (id % 4 == 0) "<blockquote>A quoted passage long enough to pass the chars bar with <a href=\"/cite\">one link</a> inside it stays content.</blockquote>" else "")) +
                "</div><ul><li><a href=\"/r/1\">Related one</a></li><li><a href=\"/r/2\">Related two</a></li></ul>" +
                "<footer>Copyright 2026 <a href=\"/legal\">legal</a> <a href=\"/privacy\">privacy</a></footer></body></html>"
            (id, graft.codec.CharsetCodec.encode(page,
              if (id % 2 == 0) "windows-1252" else "utf-8"))
          })
          .toDF("doc_id", "raw")
        val decoded = TextOps.decodeCharset(payloads, "raw", "charset", "html")
        val main = decoded.select(col("doc_id"),
          TextOps.mainContent(col("html")).as("t"))
        val kept = TextOps.c4Filter(main, "doc_id", "t")
          .filter(col("verdict") === "kept")
        val dd = kept
          .groupBy(md5(col("clean_text").cast("binary")).as("h"))
          .agg(min("doc_id").cast("long").as("doc_id"),
            count(lit(1)).cast("long").as("group_size"),
            min("n_kept").cast("long").as("n_kept"),
            min("n_sentences").cast("long").as("n_sentences"))
        val dom = dd.select(col("doc_id"), col("group_size"), col("n_kept"),
          col("n_sentences"),
          concat(lit("d"), pmod(col("doc_id"), lit(50)).cast("string"),
            lit(".example.com")).as("domain"))
        Sharding.samplePerGroupRows(dom, "domain", "doc_id", 3,
            Seq("group_size", "n_kept", "n_sentences"))
          .select(col("domain"), col("doc_id"), col("group_size"),
            col("n_kept"), col("n_sentences"))
          .orderBy("domain", "doc_id")
    },

    // ── Multi-pattern blocklist gate — ONE Aho-Corasick pass counts
    //    every filter-list phrase per document (the wordlist/canary
    //    gate; the naive form is |patterns| regex scans per row). The
    //    oracle counts each pattern independently by replace-length
    //    arithmetic — exact because the patterns are BORDER-FREE (no
    //    proper prefix = suffix), so occurrences cannot self-overlap
    //    and non-overlapping greedy counting equals the automaton's
    //    all-end-positions count (overlap semantics themselves are
    //    spec-pinned with bordered patterns). ──
    QueryDef.sql(
      "text_blocklist",
      """WITH p AS (SELECT * FROM (VALUES ('vector'), ('stream'), ('data'),
        |                                 ('query'), ('join the')) t(pat)),
        |h AS (SELECT doc_id, pat,
        |        CAST((length(text) - length(replace(text, pat, ''))) // length(pat)
        |          AS BIGINT) AS n_hits
        |      FROM documents, p WHERE text IS NOT NULL)
        |SELECT doc_id, pat AS pattern, n_hits FROM h WHERE n_hits > 0
        |ORDER BY doc_id, pattern""".stripMargin) {
      (s, d) =>
        graft.operators.MultiPattern.blocklistHits(
          QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text",
          Seq("vector", "stream", "data", "query", "join the"))
          .orderBy("doc_id", "pattern")
    },

    // ── Blocklist REDACTION — the mask half of the gate: one automaton
    //    pass masks every filter-list phrase leftmost-longest with
    //    length-preserving '#'s. The fixture's patterns are pairwise
    //    NON-INTERACTING (no suffix-prefix overlap, none a substring of
    //    another, all border-free), so leftmost-longest equals masking
    //    every occurrence independently and the oracle replays it as a
    //    chained same-length replace (order-irrelevant by
    //    construction); the interacting cases ("join the" vs "the",
    //    overlapping starts) are spec-pinned instead. ──
    QueryDef.sql(
      "text_redact_blocklist",
      """SELECT doc_id,
        |  CAST((length(t) - length(replace(t, 'vector', ''))) // 6
        |     + (length(t) - length(replace(t, 'stream', ''))) // 6
        |     + (length(t) - length(replace(t, 'data', ''))) // 4
        |     + (length(t) - length(replace(t, 'query', ''))) // 5
        |     + (length(t) - length(replace(t, 'join the', ''))) // 8 AS BIGINT) AS n_redacted,
        |  md5(replace(replace(replace(replace(replace(t,
        |    'vector', '######'), 'stream', '######'), 'data', '####'),
        |    'query', '#####'), 'join the', '########')) AS redacted_md5
        |FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        graft.operators.MultiPattern.redactBlocklist(
          QueryDef.fanOutIfNarrow(Tables.documents(s, d))
            .select(col("doc_id"), coalesce(col("text"), lit("")).as("t")),
          "t", Seq("vector", "stream", "data", "query", "join the"))
          .select(col("doc_id"), col("n_redacted"),
            md5(col("text_redacted").cast("binary")).as("redacted_md5"))
          .orderBy("doc_id")
    },

    // ── Mojibake repair — the ftfy-class hygiene pass a real corpus
    //    needs after mixed-pipeline ingestion: text that is UTF-8 read
    //    as cp1252 ("cafÃ©", "â€”") inverts deterministically (chars →
    //    cp1252 bytes; if they form STRICT multi-byte UTF-8, decode).
    //    The fixture builds the corruption ENGINE-side (decodeAs of the
    //    true text's utf-8 bytes under the wrong label) for k=0 rows,
    //    leaves genuinely accented text (k=1, NOT valid UTF-8 as bytes)
    //    and ASCII (k=2) untouched — the oracle knows only the INTENDED
    //    text and the flag arithmetic, so an over-eager repair (mangling
    //    clean accents) or a missed one breaks that row. ──
    QueryDef.sql(
      "text_fix_mojibake",
      """SELECT doc_id, doc_id % 3 = 0 AS was_mojibake,
        |  md5(CASE doc_id % 3
        |    WHEN 0 THEN 'Doc ' || doc_id || ' café — “ok” résumé'
        |    WHEN 1 THEN 'Doc ' || doc_id || ' café naïve'
        |    ELSE 'Doc ' || doc_id || ' plain ascii'
        |  END) AS fixed_md5
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val corrupted = Tables.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val t = (id % 3) match {
              case 0 =>
                val orig = s"Doc $id café — “ok” résumé"
                graft.codec.CharsetCodec.decodeAs(orig.getBytes("UTF-8"), "windows-1252")
              case 1 => s"Doc $id café naïve"
              case _ => s"Doc $id plain ascii"
            }
            (id, t)
          })
          .toDF("doc_id", "text")
        TextOps.repairMojibake(corrupted, "text")
          .select(col("doc_id"), col("was_mojibake"),
            md5(col("text_fixed").cast("binary")).as("fixed_md5"))
          .orderBy("doc_id")
    },

    // ── Token-window chunking with overlap (the RAG/embedding-pipeline
    //    granularity): windows of 32 tokens advancing by 24, so
    //    consecutive chunks share 8 tokens of context. Chunk count is
    //    max(1, ceil((n-overlap)/stride)) — the tail window may be
    //    short but never a pure suffix of its predecessor. One per-row
    //    sequence explode, zero shuffles; ORDER BY is presentation.
    //    Integer arithmetic stays positive so Spark's truncating `div`
    //    and DuckDB's flooring `//` agree. ──
    QueryDef.sql(
      "text_chunk_tokens",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |s AS (SELECT doc_id, ws, len(ws) AS n FROM t WHERE len(ws) > 0),
        |c AS (SELECT doc_id, ws,
        |        unnest(range(0, CASE WHEN n <= 8 THEN 1 ELSE (n - 8 + 23) // 24 END)) AS chunk_idx
        |      FROM s)
        |SELECT doc_id AS doc, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  CAST(chunk_idx * 24 AS BIGINT) AS start_tok,
        |  CAST(len(list_slice(ws, chunk_idx * 24 + 1, chunk_idx * 24 + 32)) AS BIGINT) AS n_tokens,
        |  array_to_string(list_slice(ws, chunk_idx * 24 + 1, chunk_idx * 24 + 32), ' ') AS chunk_text
        |FROM c ORDER BY doc, chunk_idx""".stripMargin) {
      (s, d) =>
        TextOps.chunkTokens(Tables.documents(s, d), "doc_id", "text",
          chunkSize = 32, overlap = 8)
          .orderBy("doc", "chunk_idx")
    },

    // ── PMI collocation mining: which word pairs travel together beyond
    //    chance (the classic phrase detector — p(ab) ≫ p(a)p(b) scores
    //    high regardless of raw count). Integer-bit PMI =
    //    floor(log2(c_ab·N / c_a·c_b)) via length(bin(div)) on exact
    //    longs, sign-split for negative PMI — the surprisal-gate
    //    doctrine, no transcendental, bit-identical across engines.
    //    min count 5 kills the hapax-pair PMI explosion. ──
    QueryDef.sql(
      "text_pmi_bigrams",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS ws FROM documents),
        |g AS (SELECT CASE WHEN len(ws) >= 2 THEN [array_to_string(list_slice(ws, j, j + 1), ' ') for j in range(1, len(ws))] ELSE CAST([] AS VARCHAR[]) END AS gs FROM t),
        |bi AS (SELECT unnest(gs) AS bg FROM g),
        |bc AS (SELECT bg, CAST(count(*) AS BIGINT) AS c_ab FROM bi GROUP BY bg),
        |n AS (SELECT CAST(coalesce(sum(c_ab), 0) AS BIGINT) AS nn FROM bc),
        |uni AS (SELECT unnest(ws) AS w FROM t),
        |uc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY w),
        |cand AS (SELECT bc.bg, bc.c_ab, a.c AS c_a, b.c AS c_b,
        |           bc.c_ab * n.nn AS num, a.c * b.c AS den
        |         FROM bc CROSS JOIN n
        |         JOIN uc a ON a.w = string_split(bc.bg, ' ')[1]
        |         JOIN uc b ON b.w = string_split(bc.bg, ' ')[2]
        |         WHERE bc.c_ab >= 5)
        |SELECT bg AS bigram, c_ab AS n_pair, c_a AS n_left, c_b AS n_right,
        |  CASE WHEN num >= den THEN CAST(length(bin(num // den)) - 1 AS BIGINT)
        |       ELSE -CAST(length(bin(den // num)) - 1 AS BIGINT) END AS pmi_bits,
        |  round(CAST(num AS DOUBLE) / den, 4) AS lift
        |FROM cand
        |ORDER BY pmi_bits DESC, lift DESC, n_pair DESC, bigram LIMIT 20""".stripMargin) {
      (s, d) =>
        TextOps.pmiCollocations(
          QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text",
          minCount = 5L, topK = 20)
    },

    // ── Content-defined chunking (rsync/FastCDC at token granularity):
    //    a boundary falls after token e whenever the 3-token window
    //    ending at e md5-folds to 0 mod 4 — boundaries are a function
    //    of CONTENT, not position, so an insertion near the head shifts
    //    every downstream token without moving downstream boundaries
    //    (fixed windows lose all alignment; CDC re-synchronizes at the
    //    first content boundary — spec-pinned shift-resilience). All
    //    chunk geometry in-row; the only explode is the per-doc chunk
    //    list. ──
    QueryDef.sql(
      "text_cdc_chunks",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS ws FROM documents),
        |f AS (SELECT doc_id, ws, len(ws) AS n,
        |        CASE WHEN len(ws) >= 3 THEN [array_to_string(list_slice(ws, j, j + 2), ' ') for j in range(1, len(ws) - 1)] ELSE CAST([] AS VARCHAR[]) END AS sh
        |      FROM t WHERE len(ws) > 0),
        |b AS (SELECT doc_id, ws, n,
        |        [ j + 2 for j in range(1, len(sh) + 1)
        |          if CAST(CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(sh[j]),1,8)[i]) - 1) * power(16, 8 - i) for i in range(1,9) ]) AS BIGINT) % 4 AS INTEGER) = 0
        |             and j + 2 < n ] AS be
        |      FROM f),
        |c AS (SELECT doc_id, ws, list_prepend(1, [e + 1 for e in be]) AS starts, list_append(be, n) AS ends FROM b),
        |u AS (SELECT doc_id, ws, unnest(range(1, len(starts) + 1)) AS ci, unnest(starts) AS st, unnest(ends) AS en FROM c)
        |SELECT doc_id AS doc, CAST(ci - 1 AS BIGINT) AS chunk_idx,
        |  CAST(st AS BIGINT) AS start_tok, CAST(en - st + 1 AS BIGINT) AS n_toks,
        |  md5(array_to_string(list_slice(ws, st, en), ' ')) AS chunk_hash
        |FROM u ORDER BY doc, chunk_idx""".stripMargin) {
      (s, d) =>
        TextOps.cdcChunks(QueryDef.fanOutIfNarrow(Tables.documents(s, d)),
            "doc_id", "text", w = 3, divisor = 4)
          .orderBy("doc", "chunk_idx")
    },

    // ── Shift-resilient chunk dedup over the CDC chunks: a chunk is
    //    duplicated iff its hash occurs in >1 document (min≠max per
    //    hash — constant state, partial-agg, hot-hash-safe), coverage
    //    token-weighted — the crossDupCoverage twin that survives
    //    prepended boilerplate. ──
    QueryDef.sql(
      "text_cdc_dedup",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS ws FROM documents),
        |f AS (SELECT doc_id, ws, len(ws) AS n,
        |        CASE WHEN len(ws) >= 3 THEN [array_to_string(list_slice(ws, j, j + 2), ' ') for j in range(1, len(ws) - 1)] ELSE CAST([] AS VARCHAR[]) END AS sh
        |      FROM t WHERE len(ws) > 0),
        |b AS (SELECT doc_id, ws, n,
        |        [ j + 2 for j in range(1, len(sh) + 1)
        |          if CAST(CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(sh[j]),1,8)[i]) - 1) * power(16, 8 - i) for i in range(1,9) ]) AS BIGINT) % 4 AS INTEGER) = 0
        |             and j + 2 < n ] AS be
        |      FROM f),
        |c AS (SELECT doc_id, ws, list_prepend(1, [e + 1 for e in be]) AS starts, list_append(be, n) AS ends FROM b),
        |u AS (SELECT doc_id, unnest(starts) AS st, unnest(ends) AS en FROM c),
        |ch AS (SELECT u.doc_id AS doc, en - st + 1 AS n_toks,
        |         md5(array_to_string(list_slice(c2.ws, u.st, u.en), ' ')) AS chunk_hash
        |       FROM u JOIN c c2 ON c2.doc_id = u.doc_id),
        |stats AS (SELECT chunk_hash, min(doc) AS mind, max(doc) AS maxd FROM ch GROUP BY 1)
        |SELECT ch.doc, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN s.mind <> s.maxd THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
        |  round(CAST(sum(CASE WHEN s.mind <> s.maxd THEN ch.n_toks ELSE 0 END) AS DOUBLE) / sum(ch.n_toks), 4) AS dup_token_frac
        |FROM ch JOIN stats s USING (chunk_hash)
        |GROUP BY ch.doc ORDER BY doc""".stripMargin) {
      (s, d) =>
        TextOps.cdcDedupCoverage(
            QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text",
            w = 3, divisor = 4)
          .orderBy("doc")
    },

    // ── FastCDC-style bounded chunking: the same content gate, plus a
    //    min-chunk-size-4 constraint applied as an in-row sequential
    //    fold (keep a candidate end only if ≥ 4 past the previous KEPT
    //    end — greedy left-to-right streaming-cut semantics; both
    //    engines run the identical fold, Spark aggregate() vs DuckDB
    //    list_reduce over a prepended-empty accumulator. DuckDB v1.0
    //    list_reduce BUG: a lambda branch returning `acc` unchanged
    //    silently drops earlier appends — the else branch must build a
    //    NEW list, hence list_concat(acc, [])). Kills the
    //    pathological run of adjacent boundaries a degenerate token
    //    sequence produces; the tail may still be short by design. ──
    QueryDef.sql(
      "text_cdc_bounded",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS ws FROM documents),
        |f AS (SELECT doc_id, ws, len(ws) AS n,
        |        CASE WHEN len(ws) >= 3 THEN [array_to_string(list_slice(ws, j, j + 2), ' ') for j in range(1, len(ws) - 1)] ELSE CAST([] AS VARCHAR[]) END AS sh
        |      FROM t WHERE len(ws) > 0),
        |b AS (SELECT doc_id, ws, n,
        |        [ j + 2 for j in range(1, len(sh) + 1)
        |          if CAST(CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(sh[j]),1,8)[i]) - 1) * power(16, 8 - i) for i in range(1,9) ]) AS BIGINT) % 4 AS INTEGER) = 0
        |             and j + 2 < n ] AS be
        |      FROM f),
        |k AS (SELECT doc_id, ws, n,
        |        list_reduce(list_prepend(CAST([] AS INTEGER[]), [[e] for e in be]),
        |          (acc, x) -> CASE WHEN (len(acc) = 0 AND x[1] >= 4) OR (len(acc) > 0 AND x[1] - acc[-1] >= 4)
        |                      THEN list_append(acc, x[1])
        |                      ELSE list_concat(acc, CAST([] AS INTEGER[])) END) AS be
        |      FROM b),
        |c AS (SELECT doc_id, ws, list_prepend(1, [e + 1 for e in be]) AS starts, list_append(be, n) AS ends FROM k),
        |u AS (SELECT doc_id, ws, unnest(range(1, len(starts) + 1)) AS ci, unnest(starts) AS st, unnest(ends) AS en FROM c)
        |SELECT doc_id AS doc, CAST(ci - 1 AS BIGINT) AS chunk_idx,
        |  CAST(st AS BIGINT) AS start_tok, CAST(en - st + 1 AS BIGINT) AS n_toks,
        |  md5(array_to_string(list_slice(ws, st, en), ' ')) AS chunk_hash
        |FROM u ORDER BY doc, chunk_idx""".stripMargin) {
      (s, d) =>
        TextOps.cdcChunks(QueryDef.fanOutIfNarrow(Tables.documents(s, d)),
            "doc_id", "text", w = 3, divisor = 4, minLen = 4)
          .orderBy("doc", "chunk_idx")
    },

    // ── Incremental CDC dedup — the arrival path: the corpus's chunk
    //    hashes are a STORED index (persisted + reloaded here, the
    //    bpe_stored precedent); an arriving batch (doc_id % 10 == 0) is
    //    chunked and probed against it — no corpus re-chunking, probe
    //    volume = the batch's own chunks. Shift-resilience is what makes
    //    the stored index durable: edits upstream of a chunk don't
    //    invalidate downstream hashes. ──
    QueryDef.sql(
      "text_cdc_incremental",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS ws FROM documents),
        |f AS (SELECT doc_id, ws, len(ws) AS n,
        |        CASE WHEN len(ws) >= 3 THEN [array_to_string(list_slice(ws, j, j + 2), ' ') for j in range(1, len(ws) - 1)] ELSE CAST([] AS VARCHAR[]) END AS sh
        |      FROM t WHERE len(ws) > 0),
        |b AS (SELECT doc_id, ws, n,
        |        [ j + 2 for j in range(1, len(sh) + 1)
        |          if CAST(CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(sh[j]),1,8)[i]) - 1) * power(16, 8 - i) for i in range(1,9) ]) AS BIGINT) % 4 AS INTEGER) = 0
        |             and j + 2 < n ] AS be
        |      FROM f),
        |c AS (SELECT doc_id, ws, list_prepend(1, [e + 1 for e in be]) AS starts, list_append(be, n) AS ends FROM b),
        |u AS (SELECT doc_id, unnest(starts) AS st, unnest(ends) AS en FROM c),
        |ch AS (SELECT u.doc_id AS doc, en - st + 1 AS n_toks,
        |         md5(array_to_string(list_slice(c2.ws, u.st, u.en), ' ')) AS chunk_hash
        |       FROM u JOIN c c2 ON c2.doc_id = u.doc_id),
        |idx AS (SELECT DISTINCT chunk_hash FROM ch WHERE doc % 10 <> 0),
        |bt AS (SELECT doc, n_toks, chunk_hash FROM ch WHERE doc % 10 = 0)
        |SELECT bt.doc, CAST(count(*) AS BIGINT) AS n_chunks,
        |  CAST(sum(CASE WHEN idx.chunk_hash IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_known_chunks,
        |  round(CAST(sum(CASE WHEN idx.chunk_hash IS NOT NULL THEN bt.n_toks ELSE 0 END) AS DOUBLE) / sum(bt.n_toks), 4) AS known_token_frac
        |FROM bt LEFT JOIN idx ON idx.chunk_hash = bt.chunk_hash
        |GROUP BY bt.doc ORDER BY doc""".stripMargin) {
      (s, d) =>
        val docs = QueryDef.fanOutIfNarrow(Tables.documents(s, d))
        val corpusChunks = TextOps.cdcChunks(
          docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", w = 3, divisor = 4)
        val dir = java.nio.file.Files.createTempDirectory("graft-cdc-idx").toString
        corpusChunks.select("chunk_hash").distinct()
          .write.mode("overwrite").parquet(dir)
        val idx = s.read.parquet(dir)
          .withColumn("_known", lit(1))
        val batch = TextOps.cdcChunks(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", w = 3, divisor = 4)
        batch.join(idx, Seq("chunk_hash"), "left_outer")
          .groupBy("doc")
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("_known").isNotNull, 1L).otherwise(0L)).as("n_known_chunks"),
            round(sum(when(col("_known").isNotNull, col("n_toks")).otherwise(0L))
              .cast("double") / sum(col("n_toks")), 4).as("known_token_frac"))
          .orderBy("doc")
    },

    // ── Paragraph-granularity dedup (C4/RefinedWeb shape): the raw
    //    corpus has no paragraph breaks, so the query first builds a
    //    paragraph'd corpus deterministically — three docs per group,
    //    blank-line-joined in doc_id order, plus the SAME boilerplate
    //    footer paragraph on every group (the C4 motivation: site-wide
    //    boilerplate; also inherits the corpus's real duplicate docs as
    //    cross-group duplicate paragraphs at sf0.1) — then keep-first
    //    paragraph dedup + reassembly: every group but the first loses
    //    the footer. ──
    QueryDef.sql(
      "text_para_dedup",
      """WITH g AS (
        |  SELECT CAST(doc_id AS BIGINT) // 3 AS doc,
        |    string_agg(text, chr(10) || chr(10) ORDER BY doc_id)
        |      || chr(10) || chr(10) || 'all rights reserved contact us for details' AS text
        |  FROM documents GROUP BY 1),
        |p AS (
        |  SELECT doc,
        |    CAST(generate_subscripts(string_split(text, chr(10) || chr(10)), 1) - 1 AS INTEGER) AS pos,
        |    unnest(string_split(text, chr(10) || chr(10))) AS para
        |  FROM g),
        |m AS (
        |  SELECT doc, pos, para,
        |    row_number() OVER (PARTITION BY md5(para) ORDER BY doc, pos) AS rn
        |  FROM p)
        |SELECT doc,
        |  CAST(count(*) AS BIGINT) AS n_paras,
        |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN para END, chr(10) || chr(10) ORDER BY pos), '') AS clean_text
        |FROM m GROUP BY doc ORDER BY doc""".stripMargin) {
      (s, d) =>
        val grouped = Tables.documents(s, d)
          .groupBy(expr("CAST(doc_id AS BIGINT) div 3").as("doc"))
          .agg(concat(
            array_join(
              transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
                x => x.getField("text")), "\n\n"),
            lit("\n\nall rights reserved contact us for details")).as("text"))
        Dedup.paragraphDedup(grouped, "doc", "text").orderBy("doc")
    },

    // ── Corpus-level boilerplate LINE removal (the other half of the
    //    C4 cleaning pass): strip EVERY occurrence of a line occurring
    //    in ≥ 2 distinct documents — [[text_para_dedup]] keeps the
    //    first copy; a boilerplate line keeps none. Same deterministic
    //    line-structured corpus construction (3 docs per group,
    //    newline-joined, shared footer line on every group): the footer
    //    vanishes from ALL groups, and any doc text duplicated across
    //    groups (present at sf0.1) vanishes from both. ──
    QueryDef.sql(
      "text_line_dedup",
      """WITH g AS (
        |  SELECT CAST(doc_id AS BIGINT) // 3 AS doc,
        |    string_agg(text, chr(10) ORDER BY doc_id)
        |      || chr(10) || 'copyright footer all rights reserved' AS text
        |  FROM documents GROUP BY 1),
        |l AS (
        |  SELECT doc,
        |    CAST(generate_subscripts(string_split(text, chr(10)), 1) - 1 AS INTEGER) AS pos,
        |    unnest(string_split(text, chr(10))) AS line
        |  FROM g),
        |d AS (
        |  SELECT md5(line) AS h, count(DISTINCT doc) AS n_docs
        |  FROM l GROUP BY 1),
        |m AS (
        |  SELECT doc, pos, line, n_docs < 2 AS keep
        |  FROM l JOIN d ON md5(line) = d.h)
        |SELECT doc,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  coalesce(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '') AS clean_text
        |FROM m GROUP BY doc ORDER BY doc""".stripMargin) {
      (s, d) =>
        val grouped = Tables.documents(s, d)
          .groupBy(expr("CAST(doc_id AS BIGINT) div 3").as("doc"))
          .agg(concat(
            array_join(
              transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
                x => x.getField("text")), "\n"),
            lit("\ncopyright footer all rights reserved")).as("text"))
        Dedup.lineDedupCorpus(grouped, "doc", "text", minDocs = 2L).orderBy("doc")
    },

    // ── Token counting (whitespace tokenizer) + char counts. ──
    QueryDef.sql(
      "text_tokens",
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(trim(text), ' '), w -> w <> '')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_text
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .select(
            col("doc_id"),
            size(wordsCol).cast("long").as("n_tokens"),
            length(col("text")).cast("long").as("n_chars_text"))
          .orderBy("doc_id")
    },

    // ── Distributed classifier TRAINING (rows-only: full-batch GD is an
    //    iterative global reduce no SQL oracle can express; the algorithm
    //    is pinned by ClassifierSpec's bit-identical local twin instead).
    //    Label = doc mentions 'spark'; separable, so the loss/accuracy
    //    trajectory is the observable. One treeAggregate scan per epoch,
    //    long-quantized gradients → same bits under any partitioning. ──
    QueryDef.rowsOnly("text_classifier_train") { (s, d) =>
      val s2 = s
      import s2.implicits._
      val docs = Tables.documents(s, d)
        .withColumn("label",
          array_contains(TextOps.tokens(col("text")), "spark").cast("int"))
      val m = graft.operators.Classifier.train(docs, "text", "label",
        dim = 4096, epochs = 12, lr = 0.5)
      m.epochLoss.indices.map(e =>
          (e.toLong, m.epochLoss(e), m.epochAccuracy(e)))
        .toDF("epoch", "loss", "accuracy")
        .orderBy("epoch")
    },

    // ── Learned BPE tokenizer. The oracle is GENERATED unrolled-iteration
    //    SQL (the graph_pagerank precedent): DuckDB re-derives all 30
    //    merges from the corpus word-freq table — global pair counts,
    //    count-desc/pair-asc argmax, left-to-right merge application via
    //    a list_reduce fold — then greedily encodes every distinct word
    //    under the derived ranks, so tokenizer TRAINING and ENCODING are
    //    both independently verified (was rows-only through round 8).
    //    Spark side: train once on the corpus word-freq table (ONE
    //    distributed scan + guarded driver merge loop — the sentencepiece
    //    shape), then encode per doc under the broadcast rank map. ──
    QueryDef.sql(
      "text_bpe_tokenize",
      BpeOracle.tokenizeSql(n = 30, encodeSteps = 12)) { (s, d) =>
      val docs = Tables.documents(s, d)
      Bpe.encode(docs, "doc_id", "text", Bpe.train(docs, "text", nMerges = 30))
        .orderBy("doc")
    },
    QueryDef.sql(
      "text_bpe_merges",
      BpeOracle.mergesSql(n = 30)) { (s, d) =>
      val s2 = s
      import s2.implicits._
      Bpe.train(Tables.documents(s, d), "text", nMerges = 30)
        .zipWithIndex.map { case ((l, r), i) => (i.toLong, l, r) }
        .toDF("rank", "left", "right")
        .orderBy("rank")
    },
    // ── Learned WORDPIECE tokenizer — the third tokenizer family
    //    beside BPE (count argmax) and unigram-LM (EM pruning): merges
    //    maximize the likelihood ratio count(ab)/(count(a)*count(b))
    //    under the pinned fixed-point score key (c*10^24 div ca*cb,
    //    exact integer arithmetic both engines — BigInt here, HUGEINT
    //    in the oracle), encoding is greedy longest-match with ##
    //    continuations and whole-word [UNK]. The oracle is GENERATED
    //    unrolled-iteration SQL (the BpeOracle doctrine) and re-derives
    //    training AND encoding independently; its guard column asserts
    //    the 8-char word bound the encode unroll depends on (the
    //    UnigramOracle ADVICE lesson). ──
    QueryDef.sql(
      "text_wordpiece_tokenize",
      WordPieceOracle.tokenizeSql(n = 20, encodeSteps = 8)) { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = WordPiece.train(docs, "text", nMerges = 20)
      val voc = WordPiece.vocab(
        docs.select(explode(filter(split(trim(col("text")), " "), _ =!= "")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("f"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
        merges)
      val maxWord = docs
        .select(explode_outer(
          filter(split(trim(col("text")), " "), _ =!= "")).as("w"))
        .agg(max(length(col("w"))).as("m"))
      WordPiece.encode(docs, "doc_id", "text", voc)
        .withColumnRenamed("doc_id", "doc")
        .crossJoin(broadcast(maxWord))
        .withColumn("guard_ok", when(coalesce(col("m"), lit(0)) <= 8, lit(0)))
        .drop("m")
        .orderBy("doc")
    },
    // ── WordPiece FERTILITY by language — the tokenizer-equity report
    //    under the third family's vocab, plus the UNK-word rate only
    //    WordPiece can express (BPE/unigram encodes are total). Same
    //    derived vocab as text_wordpiece_tokenize; oracle is the
    //    generated derivation rolled up per lang. ──
    QueryDef.sql(
      "text_wordpiece_fertility",
      WordPieceOracle.fertilitySql(n = 20, encodeSteps = 8)) { (s, d) =>
      val docs = Tables.documents(s, d)
      val merges = WordPiece.train(docs, "text", nMerges = 20)
      val voc = WordPiece.vocab(
        docs.select(explode(filter(split(trim(col("text")), " "), _ =!= "")).as("w"))
          .groupBy("w").agg(count(lit(1)).as("f"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
        merges)
      WordPiece.encode(docs, "doc_id", "text", voc)
        .withColumnRenamed("doc_id", "doc")
        .join(docs.select(col("doc_id").as("doc"), col("lang"),
          coalesce(length(col("text")), lit(0)).cast("long").as("_nc")), Seq("doc"))
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("n_tokens").cast("long").as("n_words"),
          sum("n_pieces").cast("long").as("n_pieces"),
          sum("n_unk_words").cast("long").as("n_unk_words"),
          round(sum("n_pieces").cast("double") /
            when(sum("n_tokens") === 0, lit(null)).otherwise(sum("n_tokens")), 4)
            .as("fertility"),
          round(lit(100.0) * sum("n_pieces") /
            when(sum("_nc") === 0, lit(null)).otherwise(sum("_nc")), 4)
            .as("pieces_per_100_chars"))
        .orderBy(asc_nulls_last("lang"))
    },
    QueryDef.sql(
      "text_wordpiece_merges",
      WordPieceOracle.mergesSql(n = 20)) { (s, d) =>
      val s2 = s
      import s2.implicits._
      WordPiece.train(Tables.documents(s, d), "text", nMerges = 20)
        .zipWithIndex.map { case ((l, r, m), i) => (i.toLong, l, r, m) }
        .toDF("rank", "left", "right", "piece")
        .orderBy("rank")
    },

    // ── Tokenizer FERTILITY by language — the tokenizer-equity report
    //    training-data teams calibrate mixtures with: pieces per word
    //    and pieces per 100 chars, per corpus language, under the SAME
    //    derived merges as text_bpe_tokenize (a tokenizer trained on
    //    one language's text fragments the others harder — the
    //    fertility gap IS that measurement). Oracle: the generated
    //    unrolled-iteration BPE derivation, rolled up per lang. ──
    QueryDef.sql(
      "text_bpe_fertility",
      BpeOracle.fertilitySql(n = 30, encodeSteps = 12)) { (s, d) =>
      val docs = Tables.documents(s, d)
      val enc = Bpe.encode(docs, "doc_id", "text", Bpe.train(docs, "text", nMerges = 30))
      enc.join(docs.select(col("doc_id").as("doc"), col("lang"),
          coalesce(length(col("text")), lit(0)).cast("long").as("_nc")), Seq("doc"))
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("n_tokens").cast("long").as("n_words"),
          sum("n_bpe").cast("long").as("n_pieces"),
          round(sum("n_bpe").cast("double") /
            when(sum("n_tokens") === 0, lit(null)).otherwise(sum("n_tokens")), 4)
            .as("fertility"),
          round(lit(100.0) * sum("n_bpe") /
            when(sum("_nc") === 0, lit(null)).otherwise(sum("_nc")), 4)
            .as("pieces_per_100_chars"))
        .orderBy(asc_nulls_last("lang"))
    },

    // ── UNIGRAM-LM tokenizer (SentencePiece-style) — the SECOND
    //    tokenizer family next to BPE: a piece VOCABULARY trained by
    //    hard-EM (seed substring counts → Viterbi-segment every word
    //    under (pieces ASC, Σcount DESC) → re-count → prune; the
    //    engine-portable integer variant of unigram-LM — soft-EM float
    //    likelihoods can't hash across engines, see the operator's
    //    scaladoc), then per-doc fertility under the trained pieces.
    //    Oracle: the generated unrolled-EM derivation (UnigramOracle —
    //    the BpeOracle precedent): every DP position, path-walk step,
    //    and M-step re-count replayed as literal CTEs. ──
    QueryDef.sql(
      "text_unigram_tokenize",
      UnigramOracle.tokenizeSql(nVocab = 24)) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.operators.Unigram.encode(docs, "doc_id", "text",
          graft.operators.Unigram.train(docs, "text", nVocab = 24))
        .orderBy("doc")
    },

    // ── Unigram fertility by language — the tokenizer-equity report
    //    under the SECOND tokenizer family (text_bpe_fertility's shape
    //    under the unigram vocabulary): pieces per word per corpus
    //    language; the fertility gap measures whom this tokenizer
    //    fragments hardest, and comparing it against the BPE row is
    //    exactly the report a tokenizer bake-off reads. ──
    QueryDef.sql(
      "text_unigram_fertility",
      UnigramOracle.fertilitySql(nVocab = 24)) { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.operators.Unigram.encode(docs, "doc_id", "text",
          graft.operators.Unigram.train(docs, "text", nVocab = 24))
        .join(docs.select(col("doc_id").as("doc"), col("lang")), Seq("doc"))
        .groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("n_tokens").cast("long").as("n_words"),
          sum("n_pieces").cast("long").as("n_pieces"),
          (sum("n_pieces").cast("double") / sum("n_tokens")).as("fertility"))
        .orderBy(asc_nulls_last("lang"))
    },

    // ── Unigram BYTE-FALLBACK encode — OOV robustness for text the
    //    vocabulary never saw (the SentencePiece contract: a character
    //    with no piece cover encodes as its UTF-8 bytes, one <0xNN>
    //    piece per byte, so the encoder is TOTAL and the piece count
    //    reflects real modeling cost). Every doc's encode input
    //    carries one appended OOV token `☃☃<doc_id%10>` (U+2603 never
    //    occurs in the corpus): two 3-byte fallbacks + one covered
    //    digit = exactly 7 pieces, 1 token — arithmetic the oracle
    //    replays on top of the full unrolled-EM derivation; the
    //    appended token also makes zero-token docs encodable, so the
    //    fallback branch is live on every row. ──
    QueryDef.sql(
      "text_unigram_byte_fallback",
      UnigramOracle.byteFallbackSql(nVocab = 24)) { (s, d) =>
      val docs = Tables.documents(s, d)
      val withOov = docs.select(col("doc_id"),
        concat(coalesce(col("text"), lit("")), lit(" ☃☃"),
          pmod(col("doc_id"), lit(10))).as("text"))
      graft.operators.Unigram.encode(withOov, "doc_id", "text",
          graft.operators.Unigram.train(docs, "text", nVocab = 24),
          byteFallback = true)
        .orderBy("doc")
    },

    // ── The trained unigram vocabulary itself — the stored artifact
    //    (rank = (count DESC, piece ASC); singles never prune, they
    //    are the fallback alphabet). The oracle re-derives the whole
    //    EM chain and must land on the identical table. ──
    QueryDef.sql(
      "text_unigram_vocab",
      UnigramOracle.vocabSql(nVocab = 24)) { (s, d) =>
      import s.implicits._
      val pieces = graft.operators.Unigram.train(
        Tables.documents(s, d), "text", nVocab = 24)
      pieces.zipWithIndex
        .map { case ((p, c), i) => (i.toLong, p, c) }
        .toDF("rank", "piece", "n")
        .orderBy("rank")
    },

    // ── Stored-tokenizer deploy path: train on the FIRST corpus slice,
    //    persist the merge table, reload it, encode the WHOLE corpus
    //    under the stored ranks — the train-once/encode-many contract
    //    (retraining per job silently shifts token boundaries
    //    mid-corpus; round-trip identity is spec-pinned in BpeSpec).
    //    The oracle re-derives the merges from the SAME doc_id < 200
    //    slice and encodes the whole corpus — persist/reload must be an
    //    exact identity for the hashes to meet. ──
    QueryDef.sql(
      "text_bpe_stored",
      BpeOracle.tokenizeSql(n = 30, encodeSteps = 12,
        trainSrc = "(SELECT * FROM documents WHERE doc_id < 200)")) { (s, d) =>
      val docs = Tables.documents(s, d)
      val dir = java.nio.file.Files.createTempDirectory("graft-bpe").toString
      Bpe.saveMerges(s,
        Bpe.train(docs.filter(col("doc_id") < 200), "text", nMerges = 30), dir)
      Bpe.encode(docs, "doc_id", "text", Bpe.loadMerges(s, dir))
        .orderBy("doc")
    },

    // ── Per-language length percentiles: the quantile profile a quality
    //    gate is calibrated against (cutoffs are usually set at P10/P90
    //    of the corpus, not absolute numbers). Spark's exact percentile
    //    and DuckDB's quantile_cont share linear interpolation, so the
    //    values hash-match after rounding. At 100 TB, calibrate on a
    //    sample or switch to approx_percentile (a KLL-style sketch whose
    //    merge is corpus-size-free) — exact percentile buffers each
    //    group's values; the exact form here is the oracle-checkable
    //    calibration path. ───────────────────────────────────────────────
    QueryDef.sql(
      "corpus_length_percentiles",
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(quantile_cont(length(text), 0.1) AS DOUBLE), 4) AS p10,
        |  round(CAST(quantile_cont(length(text), 0.5) AS DOUBLE), 4) AS p50,
        |  round(CAST(quantile_cont(length(text), 0.9) AS DOUBLE), 4) AS p90
        |FROM documents GROUP BY lang ORDER BY lang NULLS LAST""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            round(expr("percentile(length(text), 0.1)"), 4).as("p10"),
            round(expr("percentile(length(text), 0.5)"), 4).as("p50"),
            round(expr("percentile(length(text), 0.9)"), 4).as("p90"))
          // Spark asc puts nulls FIRST, DuckDB last — pin it
          .orderBy(asc_nulls_last("lang"))
    },

    // ── Duplicate-mass curve: how much of the corpus sits in exact-dup
    //    families of each size — the dedup-planning evidence (family-size
    //    1 = unique mass; the tail tells you what keep-first will delete
    //    and whether near-dup machinery is even worth running). Group
    //    sizes from content hashes, then a size histogram with doc mass
    //    and its descending cumulative share. ──
    QueryDef.sql(
      "corpus_dup_mass_curve",
      """WITH g AS (SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS fam
        |           FROM documents WHERE text IS NOT NULL GROUP BY md5(text)),
        |s AS (SELECT fam, CAST(count(*) AS BIGINT) AS n_families,
        |             CAST(sum(fam) AS BIGINT) AS n_docs
        |      FROM g GROUP BY fam),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM s)
        |SELECT s.fam AS family_size, s.n_families, s.n_docs,
        |  round(CAST(sum(s.n_docs) OVER (ORDER BY s.fam DESC) AS DOUBLE) / t.total, 4)
        |    AS cum_share_ge
        |FROM s, t ORDER BY family_size""".stripMargin) {
      (s, d) =>
        import org.apache.spark.sql.expressions.Window
        val g = Tables.documents(s, d).where(col("text").isNotNull)
          .groupBy(md5(col("text")).as("h")).agg(count(lit(1)).as("fam"))
        val sz = g.groupBy("fam")
          .agg(count(lit(1)).as("n_families"), sum("fam").as("n_docs"))
        val total = sz.agg(sum("n_docs").as("total"))
        // size histogram is tiny (distinct family sizes) — the window is
        // bounded by the histogram, not the corpus
        val w = Window.orderBy(col("fam").desc)
        sz.crossJoin(broadcast(total))
          .withColumn("cum_share_ge",
            round(sum("n_docs").over(w).cast("double") / col("total"), 4))
          .select(col("fam").as("family_size"), col("n_families"),
            col("n_docs"), col("cum_share_ge"))
          .orderBy("family_size")
    },

    // ── Boilerplate-line report: the lines shared by the most documents
    //    (nav bars, footers, license blurbs) — the evidence table behind
    //    the C4 "drop lines seen in ≥ N docs" rule, and the calibration
    //    input for text_line_dedup's threshold. Lines travel as md5
    //    hashes (identity, not text); distinct-doc counts are min≠max-
    //    free exact counts over the (line, doc) distinct frame. ──
    QueryDef.sql(
      "text_boilerplate_lines",
      """WITH l AS (SELECT DISTINCT doc_id, unnest(list_filter(string_split(text, chr(10)), x -> trim(x) <> '')) AS line
        |           FROM documents WHERE text IS NOT NULL),
        |c AS (SELECT md5(line) AS line_hash, CAST(max(length(line)) AS BIGINT) AS line_len,
        |             CAST(count(*) AS BIGINT) AS n_docs
        |      FROM l GROUP BY md5(line))
        |SELECT line_hash, line_len, n_docs
        |FROM c ORDER BY n_docs DESC, line_hash LIMIT 25""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d).where(col("text").isNotNull)
          .select(col("doc_id"),
            explode(filter(split(col("text"), "\n"), x => trim(x) =!= "")).as("line"))
          .distinct()
          .groupBy(md5(col("line")).as("line_hash"))
          .agg(max(length(col("line"))).cast("long").as("line_len"),
            count(lit(1)).as("n_docs"))
          .orderBy(col("n_docs").desc, col("line_hash"))
          .limit(25)
    },

    // ── Gini coefficient of doc lengths per language — the inequality
    //    lens on corpus balance (0 = uniform lengths, →1 = a few huge
    //    docs dominate), computed from the HISTOGRAM, not a global
    //    sort: for a run of c equal values v after B predecessors,
    //    Σ rank·x = v·(c·B + c(c+1)/2) — exact longs through the
    //    domain-bounded window, two fixed-order closing divisions. ──
    QueryDef.sql(
      "corpus_length_gini",
      """WITH h AS (SELECT lang, length(text) AS v, CAST(count(*) AS BIGINT) AS c
        |           FROM documents WHERE text IS NOT NULL GROUP BY 1, 2),
        |w AS (SELECT lang, v, c,
        |        CAST(coalesce(sum(c) OVER (PARTITION BY lang ORDER BY v
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS b
        |      FROM h),
        |a AS (SELECT lang,
        |        CAST(sum(c) AS BIGINT) AS n,
        |        CAST(sum(v * c) AS BIGINT) AS s,
        |        CAST(sum(v * (c * b + c * (c + 1) // 2)) AS BIGINT) AS t
        |      FROM w GROUP BY lang)
        |SELECT lang, n, s AS sum_len,
        |  round(2.0 * t / (CAST(n AS DOUBLE) * s) - (n + 1.0) / n, 4) AS gini
        |FROM a ORDER BY lang NULLS LAST""".stripMargin) {
      (s, d) =>
        import org.apache.spark.sql.expressions.Window
        val h = Tables.documents(s, d).where(col("text").isNotNull)
          .groupBy(col("lang"), length(col("text")).as("v"))
          .agg(count(lit(1)).cast("long").as("c"))
        val w = Window.partitionBy("lang").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, -1)
        val ranked = h.withColumn("b", coalesce(sum("c").over(w), lit(0L)))
        ranked.groupBy("lang")
          .agg(sum("c").as("n"), sum(col("v") * col("c")).as("s"),
            sum(col("v") * (col("c") * col("b") +
              expr("(c * (c + 1)) div 2"))).as("t"))
          .select(col("lang"), col("n"), col("s").as("sum_len"),
            round(lit(2.0) * col("t") / (col("n").cast("double") * col("s")) -
              (col("n") + lit(1.0)) / col("n"), 4).as("gini"))
          .orderBy(asc_nulls_last("lang"))
    },

    // ── Histogram twin of the exact percentiles — the scale-CORRECT
    //    exact path for integer-domain metrics: reduce to a
    //    (group, value, count) histogram (partial-agg, state bounded by
    //    the value DOMAIN, not the row count), then an exact
    //    interpolation walk. SHARES the buffering form's oracle — the
    //    answers must be identical, only the memory shape differs. ──
    QueryDef.sql(
      "corpus_length_percentiles_hist",
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(quantile_cont(length(text), 0.1) AS DOUBLE), 4) AS p10,
        |  round(CAST(quantile_cont(length(text), 0.5) AS DOUBLE), 4) AS p50,
        |  round(CAST(quantile_cont(length(text), 0.9) AS DOUBLE), 4) AS p90
        |FROM documents GROUP BY lang ORDER BY lang NULLS LAST""".stripMargin) {
      (s, d) =>
        Sketches.histQuantiles(Tables.documents(s, d), "lang", length(col("text")),
            Seq("p10" -> 0.1, "p50" -> 0.5, "p90" -> 0.9))
          .orderBy(asc_nulls_last("lang"))
    },

    // ── INCREMENTAL percentiles (the arrival path for order
    //    statistics): the (group, value, count) histogram is an ADDITIVE
    //    artifact — built per corpus half, union+summed, served — and
    //    the result must be bit-identical to the from-scratch histogram
    //    walk, so it SHARES corpus_length_percentiles_hist's oracle
    //    (which itself shares the buffering percentile's). An arriving
    //    batch folds in at O(batch distinct values). ──
    QueryDef.sql(
      "corpus_percentiles_incremental",
      """SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(quantile_cont(length(text), 0.1) AS DOUBLE), 4) AS p10,
        |  round(CAST(quantile_cont(length(text), 0.5) AS DOUBLE), 4) AS p50,
        |  round(CAST(quantile_cont(length(text), 0.9) AS DOUBLE), 4) AS p90
        |FROM documents GROUP BY lang ORDER BY lang NULLS LAST""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val h1 = Sketches.histBuild(
          docs.filter(col("doc_id") % 2 === 0), "lang", length(col("text")))
        val h2 = Sketches.histBuild(
          docs.filter(col("doc_id") % 2 === 1), "lang", length(col("text")))
        val q = Sketches.histQuantilesFromHist(Sketches.histMerge(h1, h2),
            Seq("p10" -> 0.1, "p50" -> 0.5, "p90" -> 0.9))
          .drop("n").withColumnRenamed("g", "_g")
        // raw-row count (incl. null-text rows) rides beside the artifact
        val n = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        n.join(q, col("lang") <=> col("_g"), "left_outer")
          .select(col("lang"), col("n"), col("p10"), col("p50"), col("p90"))
          .orderBy(asc_nulls_last("lang"))
    },

    // ── Winsorized length statistics: per-language doc lengths clipped
    //    to [p10, p90] — the outlier-robust mean a calibration pass
    //    reports next to the raw one (one 500k-char doc shouldn't move
    //    a language's "typical length"). Quantiles come from the
    //    histogram walk (domain-bounded state); clipped values sum
    //    through decimal(20,4) so the mean is order-proof. ──
    QueryDef.sql(
      "corpus_winsorize_lengths",
      """WITH q AS (SELECT lang,
        |    CAST(count(*) AS BIGINT) AS n,
        |    round(CAST(quantile_cont(length(text), 0.1) AS DOUBLE), 4) AS p10,
        |    round(CAST(quantile_cont(length(text), 0.9) AS DOUBLE), 4) AS p90
        |  FROM documents GROUP BY lang)
        |SELECT d.lang, q.n, q.p10, q.p90,
        |  round(CAST(sum(CAST(length(d.text) AS DECIMAL(20,4))) AS DOUBLE) / q.n, 4) AS mean_raw,
        |  round(CAST(sum(CAST(least(greatest(CAST(length(d.text) AS DOUBLE), q.p10), q.p90)
        |                      AS DECIMAL(20,4))) AS DOUBLE) / q.n, 4) AS mean_winsorized
        |FROM documents d JOIN q ON q.lang IS NOT DISTINCT FROM d.lang
        |GROUP BY d.lang, q.n, q.p10, q.p90
        |ORDER BY d.lang NULLS LAST""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val q = Sketches.histQuantiles(docs, "lang", length(col("text")),
            Seq("p10" -> 0.1, "p90" -> 0.9))
          .withColumnRenamed("lang", "_ql")
        docs.join(broadcast(q), col("lang") <=> col("_ql"))
          .withColumn("_len", length(col("text")).cast("double"))
          .withColumn("_w", least(greatest(col("_len"), col("p10")), col("p90")))
          .groupBy(col("lang"), col("n"), col("p10"), col("p90"))
          .agg(
            round(sum(col("_len").cast("decimal(20,4)")).cast("double") / col("n"), 4)
              .as("mean_raw"),
            round(sum(col("_w").cast("decimal(20,4)")).cast("double") / col("n"), 4)
              .as("mean_winsorized"))
          .orderBy(asc_nulls_last("lang"))
    },

    // ── Sketch twin of the exact percentiles: approx_percentile's
    //    KLL-family buffer is O(sketch), not O(group) — exact
    //    `percentile` materializes EVERY value of a group in its
    //    aggregation buffer, which OOMs on a billion-row language
    //    group; this is the form a 100 TB job runs. Rows-only on
    //    purpose: sketch outputs are engine-specific by construction
    //    and can't hash-match any oracle (the exact query above stays
    //    the oracle-pinned calibration path). ──
    //    Scalar columns, not one array: the driver's rows-only check
    //    still loads the parquet into pandas, and an array-typed cell
    //    crashes its sort (numpy arrays aren't hashable) — unpack the
    //    sketch's three quantiles into p10/p50/p90 columns. ──
    QueryDef.rowsOnly("corpus_length_percentiles_approx") {
      (s, d) =>
        Tables.documents(s, d)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            expr("approx_percentile(length(text), array(0.1, 0.5, 0.9), 10000)")
              .as("q"))
          .select(col("lang"), col("n"),
            col("q").getItem(0).as("approx_p10"),
            col("q").getItem(1).as("approx_p50"),
            col("q").getItem(2).as("approx_p90"))
          .orderBy(asc_nulls_last("lang"))
    },

    // ── Approx-percentile twin for CONTINUOUS metrics: classifier
    //    scores are real-valued (score = raw_permille / (n·1000)), so
    //    histQuantiles' exact integer-domain histogram does not apply —
    //    this is the GK-sketch (approx_percentile) side of the family,
    //    per language, the shape that survives a 100 TB corpus where
    //    sorting scores per group would shuffle everything. rows-only
    //    (sketch internals are engine-specific); RowsOnlyQueriesSpec
    //    pins each sketch quantile within rank-error of the exactly
    //    sorted scores. Same scalar-column unpacking as the length twin
    //    (array cells crash the driver's pandas sort). ──
    QueryDef.rowsOnly("text_score_percentiles_approx") {
      (s, d) =>
        val scored = TextOps.classifierScore(Tables.documents(s, d), "doc_id", "text",
          weightsPermille = Map(
            "vector" -> 400L, "stream" -> 300L, "query" -> 250L, "data" -> 200L,
            "join" -> 150L, "the" -> -50L, "a" -> -20L, "slow" -> -350L),
          threshold = 0.02)
        Tables.documents(s, d).select(col("doc_id").as("doc"), col("lang"))
          .join(scored, Seq("doc"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            expr("approx_percentile(score, array(0.1, 0.5, 0.9), 10000)").as("q"))
          .select(col("lang"), col("n"),
            round(col("q").getItem(0), 6).as("approx_p10"),
            round(col("q").getItem(1), 6).as("approx_p50"),
            round(col("q").getItem(2), 6).as("approx_p90"))
          .orderBy(asc_nulls_last("lang"))
    },

    // ── Compression-ratio quality gate: deflate_bytes/utf8_bytes per
    //    doc (repetitive text → low, random soup → ~1, prose in a
    //    band). No SQL engine exposes deflate → rows-only; semantics
    //    pinned by OperatorsSpec goldens + RowsOnlyQueriesSpec shape. ──
    QueryDef.rowsOnly("text_compression_gate") { (s, d) =>
      TextOps.compressionSignal(Tables.documents(s, d), "doc_id", "text",
          minRatio = 0.25, maxRatio = 0.9)
        .orderBy("doc")
    },

    // ── TF-IDF key-phrase extraction: top-3 word 3-grams per doc by
    //    tf·idf with the INTEGER-bit idf = floor(log2(n_docs div df)) —
    //    exact integer score, no transcendental (surprisal-gate
    //    doctrine). 3-grams, not unigrams: this corpus is template-
    //    heavy, every unigram's idf rounds to 0 and unigram extraction
    //    degenerates (measured: 8 docs of 500 surfaced anything).
    //    idf-0 (ubiquitous) terms are dropped BEFORE the vocab join on
    //    both engines, so stop-word mass never travels; per-doc top-k
    //    is the bounded heap, the oracle ranks with row_number. ──
    QueryDef.sql(
      "text_tfidf_terms",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(ws) >= 3 THEN [array_to_string(list_slice(ws, j, j + 2), ' ') for j in range(1, len(ws) - 1)] ELSE CAST([] AS VARCHAR[]) END AS gs FROM t),
        |e AS (SELECT doc_id, unnest(gs) AS w FROM g),
        |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM e GROUP BY 1, 2),
        |dfq AS (SELECT w, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |idf AS (SELECT w, CAST(length(bin(n_docs // dfc)) - 1 AS BIGINT) AS idf_bits
        |        FROM dfq, n),
        |sc AS (SELECT tf.doc_id AS doc, tf.w AS term, tf.tf * idf.idf_bits AS score
        |       FROM tf JOIN idf ON idf.w = tf.w WHERE idf.idf_bits > 0),
        |rk AS (SELECT doc, term, score,
        |         CAST(row_number() OVER (PARTITION BY doc ORDER BY score DESC, term) AS INTEGER) AS rank
        |       FROM sc)
        |SELECT doc, term, score, rank FROM rk WHERE rank <= 3
        |ORDER BY doc, rank""".stripMargin) {
      (s, d) =>
        TextOps.tfIdfTerms(QueryDef.fanOutIfNarrow(Tables.documents(s, d)),
            "doc_id", "text", k = 3, ngram = 3)
          .orderBy("doc", "rank")
    },

    // ── Token-budget corpus assembly: fill each language's token budget
    //    with its best-scoring docs (score = 50-char length bucket —
    //    the discrete-score contract; a continuous quality score gets
    //    bucketized first). Admission is score-group-atomic in score-
    //    descending order; the cumsum window runs over the (source,
    //    score) AGGREGATE — score-cardinality rows per source, never
    //    corpus rows — and the admitted pairs broadcast back as a
    //    map-side filter. en gets 6000 tokens, everything else 2500. ──
    QueryDef.sql(
      "pipeline_token_budget",
      """WITH t AS (SELECT doc_id, coalesce(lang, '??') AS source,
        |             CAST(length(text) // 50 AS BIGINT) AS score,
        |             CAST(len(list_filter(string_split(trim(text), ' '), w -> w <> '')) AS BIGINT) AS n_tokens
        |           FROM documents),
        |g AS (SELECT source, score, sum(n_tokens) AS gt FROM t GROUP BY 1, 2),
        |c AS (SELECT source, score,
        |        sum(gt) OVER (PARTITION BY source ORDER BY score DESC) AS cum FROM g),
        |adm AS (SELECT source, score FROM c
        |        WHERE cum <= CASE WHEN source = 'en' THEN 6000 ELSE 2500 END)
        |SELECT t.doc_id, t.source, t.score, t.n_tokens
        |FROM t JOIN adm USING (source, score) ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d).select(col("doc_id"),
          coalesce(col("lang"), lit("??")).as("source"),
          expr("CAST(length(text) div 50 AS BIGINT)").as("score"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        Sharding.fillTokenBudget(docs, "source", "score", "n_tokens",
            budgets = Map("en" -> 6000L), defaultBudget = 2500L)
          .select("doc_id", "source", "score", "n_tokens")
          .orderBy("doc_id")
    },

    // ── Deterministic train/val/test split: 90/5/5 on the doc_id's
    //    md5 fold — membership re-derivable by any engine from the key
    //    alone (no RNG/seed state), splits disjoint by construction.
    //    Output is the per-(split, lang) profile a data card reports. ──
    QueryDef.sql(
      "pipeline_split_train_eval",
      """WITH b AS (SELECT doc_id, lang, text,
        |    CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS UBIGINT) % 1000 AS INT) AS bkt
        |  FROM documents),
        |s AS (SELECT CASE WHEN bkt < 900 THEN 'train' WHEN bkt < 950 THEN 'val' ELSE 'test' END AS split,
        |        lang,
        |        len(list_filter(string_split(trim(text), ' '), w -> w <> '')) AS nt
        |      FROM b)
        |SELECT split, lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens
        |FROM s GROUP BY 1, 2 ORDER BY split, lang""".stripMargin) {
      (s, d) =>
        // md5 the STRING form of the id (matches the oracle's VARCHAR
        // cast; a bare long would md5 its binary encoding instead)
        Sharding.splitByHash(
            Tables.documents(s, d).withColumn("_key", col("doc_id").cast("string")), "_key")
          .groupBy("split", "lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(wordsCol)).as("n_tokens"))
          .orderBy("split", "lang")
    },

    // ── PII redaction before training: emails → <EMAIL>, IPv4 → <IP>,
    //    long digit runs → <NUM>, as one codegen'd regexp_replace chain.
    //    Deterministic PII is APPENDED to every document from doc_id
    //    arithmetic on both engines, so the hash pins the regex
    //    semantics (Java vs RE2) on real matches, not on a corpus that
    //    happens to contain none. ──────────────────────────────────────
    QueryDef.sql(
      "text_redact_pii",
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    coalesce(text, '') || ' contact user' || doc_id || '@example.com via 10.0.'
        |      || (doc_id % 256) || '.7 ref ' || (doc_id * 1000000007),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{9,}\b', '<NUM>', 'g') AS clean
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val raw = concat(
          coalesce(col("text"), lit("")), lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com via 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".7 ref "),
          (col("doc_id") * 1000000007L).cast("string"))
        Tables.documents(s, d)
          .select(col("doc_id"), TextOps.redactPii(raw).as("clean"))
          .orderBy("doc_id")
    },

    // ── PII DETECTION profile: per-class match counts (emails, IPv4s,
    //    long digit runs) + has_pii — the audit a privacy review runs
    //    BEFORE deciding to redact; same pattern literals and masking
    //    precedence as text_redact_pii (emails counted raw, IPs after
    //    emails masked, digit runs after both). Same injected-PII text
    //    as the redact query so every class actually fires. ──
    QueryDef.sql(
      "text_pii_profile",
      """WITH r AS (SELECT doc_id,
        |    coalesce(text, '') || ' contact user' || doc_id || '@example.com via 10.0.'
        |      || (doc_id % 256) || '.7 ref ' || (doc_id * 1000000007) AS raw
        |  FROM documents),
        |m AS (SELECT doc_id, raw,
        |    regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS no_email
        |  FROM r),
        |m2 AS (SELECT doc_id, raw, no_email,
        |    regexp_replace(no_email, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS no_ip
        |  FROM m),
        |c AS (SELECT doc_id,
        |    CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |    CAST(len(regexp_extract_all(no_email, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |    CAST(len(regexp_extract_all(no_ip, '\b\d{9,}\b')) AS BIGINT) AS n_longnums
        |  FROM m2)
        |SELECT doc_id, n_emails, n_ips, n_longnums,
        |  (n_emails + n_ips + n_longnums > 0) AS has_pii
        |FROM c ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val raw = concat(
          coalesce(col("text"), lit("")), lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com via 10.0."),
          (col("doc_id") % 256).cast("string"), lit(".7 ref "),
          (col("doc_id") * 1000000007L).cast("string"))
        Tables.documents(s, d)
          .select(col("doc_id"), TextOps.piiProfile(raw).as("p"))
          .select(col("doc_id"), col("p.n_emails").as("n_emails"),
            col("p.n_ips").as("n_ips"), col("p.n_longnums").as("n_longnums"),
            col("p.has_pii").as("has_pii"))
          .orderBy("doc_id")
    },

    // ── Quality scoring: length stats + stopword ratio. Single-op double
    //    division (bit-exact across engines), rounded defensively. ──
    QueryDef.sql(
      "text_quality",
      """SELECT doc_id,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  round(CAST(sum_len AS DOUBLE) / nullif(n_tokens, 0), 4) AS mean_token_len,
        |  round(CAST(n_stop AS DOUBLE) / nullif(n_tokens, 0), 4) AS stopword_ratio
        |FROM (
        |  SELECT doc_id,
        |    len(ws) AS n_tokens,
        |    list_sum(list_transform(ws, w -> length(w))) AS sum_len,
        |    len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is'))) AS n_stop
        |  FROM (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        // nullif-guarded ratios (TextOps.qualityMetrics): empty docs yield
        // NULL, not a non-ANSI NULL-vs-NaN divergence between engines.
        val (n, meanLen, stopRatio) = TextOps.qualityMetrics(
          col("ws"), Seq("the", "a", "of", "and", "to", "in", "is"))
        Tables.documents(s, d)
          .select(col("doc_id"), wordsCol.as("ws"))
          .select(col("doc_id"), n.as("n_tokens"),
            meanLen.as("mean_token_len"), stopRatio.as("stopword_ratio"))
          .orderBy("doc_id")
    },

    // ── Gopher-rule quality gate (Rae et al. 2021 §A1.1): per-language
    //    kept count + per-rule rejection counts, all from ONE
    //    whole-stage-codegen projection pass (TextOps.gopherFilters) +
    //    one partial-agg groupBy. The published thresholds produce a
    //    real mix on the driver corpus (~half the docs sit under the
    //    50-word minimum; stopword-hits≥2 splits the rest). ──
    QueryDef.sql(
      "text_gopher_filters",
      """WITH t AS (
        |  SELECT lang, text,
        |    list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws,
        |    string_split(text, chr(10)) AS ls
        |  FROM documents),
        |m AS (
        |  SELECT lang,
        |    len(ws) AS n,
        |    CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
        |      / nullif(len(ws), 0) AS mean_len,
        |    (CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
        |      + CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE) / 3.0)
        |      / nullif(len(ws), 0) AS sym_ratio,
        |    CAST(len(list_filter(ls, l -> left(ltrim(l), 1) IN ('-', '*'))) AS DOUBLE)
        |      / len(ls) AS bullet_frac,
        |    CAST(len(list_filter(ls, l -> right(l, 3) = '...')) AS DOUBLE)
        |      / len(ls) AS ell_frac,
        |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
        |      / nullif(len(ws), 0) AS alpha_frac,
        |    len(list_filter(['the','be','to','of','and','that','have','with'],
        |        s -> list_contains(ws, s))) AS stop_hits
        |  FROM t),
        |b AS (
        |  SELECT lang,
        |    n >= 50 AND n <= 100000 AS p_words,
        |    coalesce(mean_len >= 3.0 AND mean_len <= 10.0, false) AS p_mean,
        |    coalesce(sym_ratio <= 0.1, false) AS p_sym,
        |    bullet_frac <= 0.9 AS p_bullet,
        |    ell_frac <= 0.3 AS p_ell,
        |    coalesce(alpha_frac >= 0.8, false) AS p_alpha,
        |    stop_hits >= 2 AS p_stop
        |  FROM m)
        |SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN p_words AND p_mean AND p_sym AND p_bullet
        |                 AND p_ell AND p_alpha AND p_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN NOT p_words THEN 1 ELSE 0 END) AS BIGINT) AS fail_words,
        |  CAST(sum(CASE WHEN NOT p_mean THEN 1 ELSE 0 END) AS BIGINT) AS fail_mean_len,
        |  CAST(sum(CASE WHEN NOT p_sym THEN 1 ELSE 0 END) AS BIGINT) AS fail_symbol,
        |  CAST(sum(CASE WHEN NOT p_bullet THEN 1 ELSE 0 END) AS BIGINT) AS fail_bullet,
        |  CAST(sum(CASE WHEN NOT p_ell THEN 1 ELSE 0 END) AS BIGINT) AS fail_ellipsis,
        |  CAST(sum(CASE WHEN NOT p_alpha THEN 1 ELSE 0 END) AS BIGINT) AS fail_alpha,
        |  CAST(sum(CASE WHEN NOT p_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop
        |FROM b GROUP BY lang ORDER BY lang NULLS LAST""".stripMargin) {
      (s, d) =>
        def failCnt(f: String) = sum(when(!col(s"q.$f"), 1L).otherwise(0L))
        Tables.documents(s, d)
          .select(col("lang"), TextOps.gopherFilters(col("text")).as("q"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("q.keep"), 1L).otherwise(0L)).as("n_kept"),
            failCnt("pass_words").as("fail_words"),
            failCnt("pass_mean_len").as("fail_mean_len"),
            failCnt("pass_symbol").as("fail_symbol"),
            failCnt("pass_bullet").as("fail_bullet"),
            failCnt("pass_ellipsis").as("fail_ellipsis"),
            failCnt("pass_alpha").as("fail_alpha"),
            failCnt("pass_stop").as("fail_stop"))
          .orderBy(asc_nulls_last("lang"))
    },

    // ── Corpus profile: per-language counts + EXACT percentiles of doc
    //    length (both engines interpolate linearly; round(,4) absorbs the
    //    last-ulp arithmetic drift). One shuffle, map-side partials. ──
    QueryDef.sql(
      "corpus_stats",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  round(quantile_cont(n_chars, 0.5), 4) AS median_chars,
        |  round(quantile_cont(n_chars, 0.9), 4) AS p90_chars
        |FROM documents GROUP BY lang ORDER BY lang NULLS LAST""".stripMargin) {
      (s, d) =>
        // NULLS LAST pinned on both sides: Spark ASC defaults nulls
        // FIRST, DuckDB LAST — a NULL lang row would silently flip the
        // row order between engines.
        Tables.documents(s, d)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_chars").as("total_chars"),
            round(expr("percentile(n_chars, 0.5)"), 4).as("median_chars"),
            round(expr("percentile(n_chars, 0.9)"), 4).as("p90_chars"))
          .orderBy(asc_nulls_last("lang"))
    },

    // ── Corpus vocabulary: token frequencies, top-k — the wordcount
    //    shape (explode → hash agg with map-side partials → top-k heap;
    //    no global sort). ──
    QueryDef.sql(
      "text_vocab_topk",
      """SELECT w AS token, CAST(count(*) AS BIGINT) AS freq
        |FROM (SELECT unnest(list_filter(string_split(trim(text), ' '), t -> t <> '')) AS w
        |      FROM documents)
        |GROUP BY w ORDER BY freq DESC, token LIMIT 100""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .select(explode(wordsCol).as("token"))
          .groupBy("token").agg(count(lit(1)).as("freq"))
          .orderBy(desc("freq"), asc("token"))
          .limit(100)
    },

    // ── Stopword mining: derive the function-word list from the corpus
    //    itself — words present in ≥ half of all documents, with
    //    document-frequency and token-share stats. This is where the
    //    funnel's calibrated stop list COMES from (the Rae list is just
    //    this query run on English web text). Distinct-doc counts via
    //    (word, doc) pre-agg — no count-distinct Expand; thresholds are
    //    integer comparisons against the one-row doc count broadcast. ──
    QueryDef.sql(
      "text_stopword_mining",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |e AS (SELECT doc_id, unnest(ws) AS w FROM t),
        |wd AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS occ FROM e GROUP BY 1, 2),
        |st AS (SELECT w, CAST(count(*) AS BIGINT) AS df, CAST(sum(occ) AS BIGINT) AS tf FROM wd GROUP BY w),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS n_tokens FROM st)
        |SELECT st.w AS word, st.df, st.tf,
        |  round(CAST(st.df AS DOUBLE) / n.n_docs, 4) AS df_frac,
        |  round(CAST(st.tf AS DOUBLE) / tot.n_tokens, 4) AS token_share
        |FROM st, n, tot
        |WHERE st.df * 2 >= n.n_docs
        |ORDER BY df DESC, word""".stripMargin) {
      (s, d) =>
        val e = Tables.documents(s, d)
          .select(col("doc_id"), explode(wordsCol).as("w"))
        val st = e.groupBy("w", "doc_id").agg(count(lit(1)).as("occ"))
          .groupBy("w").agg(count(lit(1)).as("df"), sum("occ").as("tf"))
        val n = Tables.documents(s, d).agg(count(lit(1)).as("n_docs"))
        val tot = st.agg(sum("tf").as("n_tokens"))
        st.crossJoin(broadcast(n)).crossJoin(broadcast(tot))
          .filter(col("df") * 2 >= col("n_docs"))
          .select(col("w").as("word"), col("df"), col("tf"),
            round(col("df").cast("double") / col("n_docs"), 4).as("df_frac"),
            round(col("tf").cast("double") / col("n_tokens"), 4).as("token_share"))
          .orderBy(desc("df"), asc("word"))
    },

    // ── Lexical diversity (type-token ratio family): per doc, distinct
    //    types over tokens plus root-TTR (types/√tokens, the
    //    length-robust variant — plain TTR shrinks with doc length by
    //    construction). sqrt is correctly rounded in IEEE arithmetic on
    //    every platform (the flattenedKeepPermille doctrine), so both
    //    ratios hash-match unrounded-then-rounded. Per-row distinct via
    //    array_distinct — no corpus state at all. ──
    QueryDef.sql(
      "text_lexical_diversity",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |m AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
        |        CAST(len(list_distinct(ws)) AS BIGINT) AS n_types FROM t)
        |SELECT doc_id AS doc, n_tokens, n_types,
        |  round(CAST(n_types AS DOUBLE) / nullif(n_tokens, 0), 4) AS ttr,
        |  round(CAST(n_types AS DOUBLE) / nullif(sqrt(CAST(n_tokens AS DOUBLE)), 0), 4) AS rttr
        |FROM m ORDER BY doc""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id").as("doc"),
            size(wordsCol).cast("long").as("n_tokens"),
            size(array_distinct(wordsCol)).cast("long").as("n_types"))
          .select(col("doc"), col("n_tokens"), col("n_types"),
            round(col("n_types").cast("double") /
              when(col("n_tokens") === 0, lit(null)).otherwise(col("n_tokens")), 4).as("ttr"),
            round(col("n_types").cast("double") /
              when(col("n_tokens") === 0, lit(null))
                .otherwise(sqrt(col("n_tokens").cast("double"))), 4).as("rttr"))
          .orderBy("doc")
    },

    // ── Token-length histogram: docs per 16-token bucket (plus a
    //    cumulative fraction) — the length-distribution panel on every
    //    corpus dashboard; the shape that picks chunk/pack sizes. ──
    QueryDef.sql(
      "corpus_token_histogram",
      """WITH t AS (SELECT CAST(len(list_filter(string_split(trim(text), ' '), w -> w <> '')) AS BIGINT) AS n
        |           FROM documents),
        |h AS (SELECT CAST(n // 16 AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n_docs
        |      FROM t GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM h)
        |SELECT h.bucket, h.bucket * 16 AS lo_tokens, h.n_docs,
        |  round(CAST(sum(h.n_docs) OVER (ORDER BY h.bucket) AS DOUBLE) / tot.total, 4) AS cum_frac
        |FROM h, tot ORDER BY bucket""".stripMargin) {
      (s, d) =>
        val h = Tables.documents(s, d)
          .select(size(wordsCol).cast("long").as("n"))
          .select(expr("CAST(n div 16 AS BIGINT)").as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n_docs"))
        val tot = h.agg(sum("n_docs").as("total"))
        // the cumsum window runs over the BUCKET aggregate (vocabGrowth
        // posture): tens of rows, never corpus rows
        h.crossJoin(broadcast(tot))
          .withColumn("cum",
            sum("n_docs").over(org.apache.spark.sql.expressions.Window
              .orderBy("bucket").rowsBetween(Long.MinValue, 0)))
          .select(col("bucket"), (col("bucket") * 16).as("lo_tokens"), col("n_docs"),
            round(col("cum").cast("double") / col("total"), 4).as("cum_frac"))
          .orderBy("bucket")
    },

    // ── Distribution-drift profile between two corpus versions (stand-in:
    //    even vs odd doc ids — deterministic halves with the same
    //    generative process, so contributions hover near zero; a real
    //    drift would spike specific buckets): per token-length bucket,
    //    each side's probability mass and the symmetric chi-square
    //    contribution (pa−pb)²/(pa+pb). Deliberately NOT PSI: PSI's
    //    ln(pa/pb) is a transcendental at query time, chi-square is
    //    rational — divisions and products only, bit-stable across
    //    engines (surprisal-gate doctrine). Per-bucket rows, no
    //    cross-bucket float sum anywhere. ──
    QueryDef.sql(
      "corpus_drift_profile",
      """WITH t AS (SELECT doc_id,
        |    CAST(len(list_filter(string_split(trim(text), ' '), w -> w <> '')) AS BIGINT) AS n
        |  FROM documents),
        |b AS (SELECT CAST(n // 16 AS BIGINT) AS bucket,
        |        CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |        CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |      FROM t GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb FROM b),
        |p AS (SELECT bucket, n_a, n_b,
        |        CAST(n_a AS DOUBLE) / ta AS pa, CAST(n_b AS DOUBLE) / tb AS pb
        |      FROM b, tot)
        |SELECT bucket, n_a, n_b, round(pa, 6) AS pa, round(pb, 6) AS pb,
        |  round((pa - pb) * (pa - pb) / nullif(pa + pb, 0), 6) AS chi2_contrib
        |FROM p ORDER BY bucket""".stripMargin) {
      (s, d) =>
        val t = Tables.documents(s, d)
          .select(col("doc_id"), size(wordsCol).cast("long").as("n"))
        val b = t.select(col("doc_id"), expr("CAST(n div 16 AS BIGINT)").as("bucket"))
          .groupBy("bucket")
          .agg(sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)).as("n_b"))
        val tot = b.agg(sum("n_a").as("ta"), sum("n_b").as("tb"))
        val pa = col("n_a").cast("double") / col("ta")
        val pb = col("n_b").cast("double") / col("tb")
        b.crossJoin(broadcast(tot))
          .select(col("bucket"), col("n_a"), col("n_b"),
            round(pa, 6).as("pa"), round(pb, 6).as("pb"),
            round((pa - pb) * (pa - pb) /
              when(pa + pb === 0, lit(null)).otherwise(pa + pb), 6).as("chi2_contrib"))
          .orderBy("bucket")
    },

    // ── Heavy-hitters sketch twin: Count-Min estimates for the exact
    //    top-20 tokens, exact counts riding beside (the HLL-twin
    //    pattern: the sketch's error is OBSERVABLE in the result). CMS
    //    counters are commutative sums — deterministic under any
    //    partitioning at a fixed seed — and never underestimate; both
    //    properties are pinned in RowsOnlyQueriesSpec. At 100 TB the
    //    sketch replaces a full token groupBy with O(width·depth)
    //    mergeable state per partition. rows-only: no SQL engine
    //    reproduces Spark's CMS hashing. ──
    QueryDef.rowsOnly("text_heavyhitters_sketch") { (s, d) =>
      val s2 = s
      import s2.implicits._
      val toks = Tables.documents(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("w"))
      val exact = toks.groupBy("w").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("w")).limit(20)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val cms = toks.stat.countMinSketch("w", eps = 0.0005, confidence = 0.99, seed = 42)
      exact.map { case (w, n) => (w, n, cms.estimateCount(w)) }.toSeq
        .toDF("term", "exact_count", "cms_count")
        .orderBy(desc("exact_count"), asc("term"))
    },

    // ── Sketch twin of the vocabulary size: approx_count_distinct's
    //    HLL++ buffer is O(sketch) per group where an exact distinct
    //    needs the full (lang, word) pre-aggregation pass — at 100 TB
    //    the sketch answers "how big is each language's vocabulary"
    //    from ONE scan with constant memory. Rows-only on purpose
    //    (sketch estimates are engine-specific); the exact twin is
    //    pinned through text_vocab_topk/text_vocab_growth. The exact
    //    per-lang count rides along so the sketch's relative error is
    //    OBSERVABLE in the artifact, not asserted blindly. ──
    QueryDef.rowsOnly("text_vocab_approx") { (s, d) =>
      Tables.documents(s, d)
        .select(coalesce(col("lang"), lit("??")).as("lang"), explode(wordsCol).as("w"))
        .groupBy("lang")
        .agg(approx_count_distinct(col("w")).as("approx_vocab"),
          count(lit(1)).as("n_tokens"))
        .join(
          Tables.documents(s, d)
            .select(coalesce(col("lang"), lit("??")).as("lang"), explode(wordsCol).as("w"))
            .groupBy("lang", "w").agg(count(lit(1)).as("_c"))
            .groupBy("lang").agg(count(lit(1)).as("exact_vocab")),
          Seq("lang"))
        .select(col("lang"), col("n_tokens"), col("exact_vocab"), col("approx_vocab"))
        .orderBy("lang")
    },

    // ── Vocabulary growth curve (Heaps'-law audit): distinct words by
    //    first-appearance bucket + cumulative vocab. min(doc) per word
    //    is partial-agg (hot word collapses map-side); the only window
    //    runs over the nBuckets-row aggregate. ──
    QueryDef.sql(
      "text_vocab_growth",
      """WITH e AS (SELECT doc_id, unnest(list_filter(string_split(trim(text), ' '), t -> t <> '')) AS w
        |           FROM documents),
        |f AS (SELECT w, min(doc_id) AS fd FROM e GROUP BY w),
        |mx AS (SELECT max(doc_id) AS mid FROM documents),
        |pb AS (SELECT CAST(fd * 10 // (mid + 1) AS BIGINT) AS bucket,
        |              CAST(count(*) AS BIGINT) AS nw
        |       FROM f, mx GROUP BY 1),
        |sp AS (SELECT unnest(range(0, 10)) AS bucket)
        |SELECT sp.bucket, coalesce(pb.nw, 0) AS new_words,
        |  CAST(sum(coalesce(pb.nw, 0)) OVER (ORDER BY sp.bucket) AS BIGINT) AS cum_vocab
        |FROM sp LEFT JOIN pb USING (bucket) ORDER BY bucket""".stripMargin) {
      (s, d) =>
        TextOps.vocabGrowth(Tables.documents(s, d), "doc_id", "text", nBuckets = 10)
          .orderBy("bucket")
    },

    // ── Heaps-law exponent: β in V(n) ≈ K·n^β from the 10-bucket vocab
    //    growth curve — least squares of log cum_vocab vs log cum_tokens
    //    with both logs from the fixed-point ladder (the Zipf regression
    //    shape; natural text β ≈ 0.4–0.6, a closed template vocabulary
    //    → β ≈ 0 once the vocab saturates). All sums exact longs, one
    //    closing division; every frame is 10 rows past the partial-agg
    //    bucket counts. ──
    QueryDef.sql(
      "corpus_heaps_slope",
      s"""WITH e AS (SELECT doc_id, unnest(list_filter(string_split(trim(text), ' '), t -> t <> '')) AS w
         |           FROM documents),
         |mx AS (SELECT max(doc_id) AS mid FROM documents),
         |tb AS (SELECT CAST(doc_id * 10 // (mid + 1) AS BIGINT) AS bucket,
         |              CAST(count(*) AS BIGINT) AS nt FROM e, mx GROUP BY 1),
         |f AS (SELECT w, min(doc_id) AS fd FROM e GROUP BY w),
         |pb AS (SELECT CAST(fd * 10 // (mid + 1) AS BIGINT) AS bucket,
         |              CAST(count(*) AS BIGINT) AS nw FROM f, mx GROUP BY 1),
         |sp AS (SELECT unnest(range(0, 10)) AS bucket),
         |cum AS (SELECT sp.bucket,
         |          CAST(sum(coalesce(tb.nt, 0)) OVER (ORDER BY sp.bucket) AS BIGINT) AS ct,
         |          CAST(sum(coalesce(pb.nw, 0)) OVER (ORDER BY sp.bucket) AS BIGINT) AS cv
         |        FROM sp LEFT JOIN tb USING (bucket) LEFT JOIN pb USING (bucket)),
         |ndn AS (SELECT CAST(bucket AS VARCHAR) AS b, greatest(ct, 1) AS num, CAST(1 AS BIGINT) AS den FROM cum),
         |${DsirOracle.fixedPointLog2Cte("ndn", "n")},
         |ndv AS (SELECT CAST(bucket AS VARCHAR) AS b, greatest(cv, 1) AS num, CAST(1 AS BIGINT) AS den FROM cum),
         |${DsirOracle.fixedPointLog2Cte("ndv", "v")},
         |xy AS (SELECT n.sb AS x, v.sb AS y FROM nsbq n JOIN vsbq v ON v.b = n.b),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |        CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
         |      FROM xy)
         |SELECT n,
         |  n * sxy - sx * sy AS num,
         |  n * sxx - sx * sx AS den,
         |  round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 4) AS heaps_beta
         |FROM s""".stripMargin) {
      (s, d) =>
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
        val e = docs.select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("w"))
        val mid = docs.agg(max("doc_id")).collect().head.getLong(0)
        val bucketOf = (c: org.apache.spark.sql.Column) =>
          expr(s"(${c.toString} * 10) div ${mid + 1}")
        val tb = e.groupBy(bucketOf(col("doc_id")).as("bucket"))
          .agg(count(lit(1)).cast("long").as("nt"))
        val pb = e.groupBy("w").agg(min("doc_id").as("fd"))
          .groupBy(bucketOf(col("fd")).as("bucket"))
          .agg(count(lit(1)).cast("long").as("nw"))
        val spine = s.range(10).select(col("id").as("bucket"))
        val w10 = Window.orderBy("bucket") // 10-row frame, bounded by design
        val cum = spine
          .join(tb, Seq("bucket"), "left_outer")
          .join(pb, Seq("bucket"), "left_outer")
          .select(col("bucket"),
            sum(coalesce(col("nt"), lit(0L))).over(w10).as("ct"),
            sum(coalesce(col("nw"), lit(0L))).over(w10).as("cv"))
          .withColumn("ctg", greatest(col("ct"), lit(1L)))
          .withColumn("cvg", greatest(col("cv"), lit(1L)))
        val withX = TextOps.withFixedPointLog2Q8(cum, "ctg", "1", "x")
        val withXY = TextOps.withFixedPointLog2Q8(withX, "cvg", "1", "y")
        withXY.agg(count(lit(1)).as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
          .select(col("n"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("den"),
            round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")), 4).as("heaps_beta"))
    },

    // ── Training-shard assignment: content-keyed md5 sharding (the
    //    export stage; membership reproducible by any engine — DuckDB
    //    re-derives the hex value with a digit fold). Balance check via
    //    per-shard counts. ──
    QueryDef.sql(
      "pipeline_shard_assign",
      """WITH a AS (
        |  SELECT doc_id,
        |    CAST(CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(text),1,8)[i]) - 1)
        |                         * power(16, 8 - i) for i in range(1,9) ]) AS BIGINT)
        |         % 16 AS INTEGER) AS shard
        |  FROM documents)
        |SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(min(doc_id) AS BIGINT) AS min_doc, CAST(max(doc_id) AS BIGINT) AS max_doc
        |FROM a GROUP BY shard ORDER BY shard""".stripMargin) {
      (s, d) =>
        Sharding.assign(Tables.documents(s, d), "text", nShards = 16)
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
          .orderBy("shard")
    },

    // ── Deterministic GLOBAL training order (epoch shuffle): every row
    //    gets its exact position in the md5-permuted order — computed
    //    via contiguous hash-buckets + driver cumsum of 256 bucket
    //    counts + per-bucket rank windows (~n/256 rows per task), NOT a
    //    partition-less row_number window (one task over the whole
    //    corpus). The oracle IS that naive global window — DuckDB can
    //    afford it at driver scale — pinning that the bucketed
    //    composition equals the total order exactly. ──
    QueryDef.sql(
      "pipeline_epoch_order",
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(row_number() OVER (
        |    ORDER BY md5('ep1:' || CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS pos
        |FROM documents ORDER BY pos""".stripMargin) {
      (s, d) =>
        Sharding.epochOrder(Tables.documents(s, d).select("doc_id"), "doc_id", "ep1")
          .select(col("doc_id"), col("pos"))
          .orderBy("pos")
    },

    // ── Training-mix sampling: deterministic per-stratum keep-rates on
    //    a content-hash fold — "all of en, 60% of de/fr, 30% of es, 15%
    //    of zh", reproducible by any engine with md5, no RNG state. ──
    QueryDef.sql(
      "pipeline_sample_mix",
      """WITH a AS (
        |  SELECT doc_id, lang,
        |    CAST(CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(text),1,8)[i]) - 1)
        |                         * power(16, 8 - i) for i in range(1,9) ]) AS BIGINT)
        |         % 1000 AS INTEGER) AS bkt
        |  FROM documents)
        |SELECT doc_id, lang FROM a
        |WHERE bkt < CASE lang WHEN 'en' THEN 1000 WHEN 'de' THEN 600 WHEN 'fr' THEN 600
        |                      WHEN 'es' THEN 300 WHEN 'zh' THEN 150 ELSE 0 END
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Sharding.sampleStratified(Tables.documents(s, d), "text", "lang",
            Map("en" -> 1000, "de" -> 600, "fr" -> 600, "es" -> 300, "zh" -> 150))
          .select("doc_id", "lang").orderBy("doc_id")
    },

    // ── Temperature-flattened mixing: keep-rates DERIVED from the
    //    corpus itself (α = 0.5 of the p^α family, via correctly-rounded
    //    sqrt so both engines compute identical rates) — dominant langs
    //    down-sample toward uniform, the rarest keeps 100%. ──
    QueryDef.sql(
      "pipeline_sample_temperature",
      """WITH n AS (SELECT lang, CAST(count(*) AS DOUBLE) AS cnt FROM documents GROUP BY 1),
        |r AS (SELECT lang,
        |        CAST(round(1000 * sqrt((SELECT min(cnt) FROM n) / cnt)) AS INTEGER) AS permille
        |      FROM n),
        |a AS (
        |  SELECT doc_id, lang,
        |    CAST(CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(text),1,8)[i]) - 1)
        |                         * power(16, 8 - i) for i in range(1,9) ]) AS BIGINT)
        |         % 1000 AS INTEGER) AS bkt
        |  FROM documents)
        |SELECT a.doc_id, a.lang FROM a JOIN r USING (lang)
        |WHERE a.bkt < r.permille
        |ORDER BY a.doc_id""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        // stratum counts are tiny (|langs| rows) — driver-derived rates,
        // then the same one-predicate sampling scan as pipeline_sample_mix
        val counts = docs.groupBy("lang").count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        Sharding.sampleStratified(docs, "text", "lang",
            Sharding.flattenedKeepPermille(counts))
          .select("doc_id", "lang").orderBy("doc_id")
    },

    // ── Quality-WEIGHTED sampling: per-doc keep-rate derived from the
    //    doc's own classifier score — keep-permille = clamp(500 +
    //    score-per-token-permille, 0, 1000), so good docs keep at up to
    //    100% and junk decays toward 0 — then the same reproducible
    //    md5-fold membership test as every sampler here (no RNG state;
    //    any engine re-derives who stayed). The per-doc-rate form
    //    generalizes the per-stratum temperature sampler. All integer
    //    until the membership compare. ──
    QueryDef.sql(
      "pipeline_sample_quality_weighted",
      """WITH t AS (SELECT doc_id, text, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |v(w, wt) AS (VALUES ('vector', 400), ('stream', 300), ('query', 250), ('data', 200),
        |             ('join', 150), ('the', -50), ('a', -20), ('slow', -350)),
        |e AS (SELECT doc_id, unnest(ws) AS w FROM t),
        |h AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS raw FROM e JOIN v USING (w) GROUP BY doc_id),
        |p AS (SELECT t.doc_id, t.text,
        |        greatest(0, least(1000,
        |          500 + coalesce(h.raw, 0) * 1000 // (CASE WHEN len(t.ws) = 0 THEN NULL ELSE len(t.ws) END * 1000)
        |        )) AS permille
        |      FROM t LEFT JOIN h USING (doc_id)),
        |b AS (SELECT doc_id, permille,
        |        CAST(CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(text), 1, 8)[i]) - 1)
        |             * power(16, 8 - i) for i in range(1, 9) ]) AS BIGINT) % 1000 AS INTEGER) AS bkt
        |      FROM p)
        |SELECT doc_id, CAST(permille AS BIGINT) AS keep_permille
        |FROM b WHERE bkt < permille ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val scored = TextOps.classifierScore(docs, "doc_id", "text",
          weightsPermille = Map(
            "vector" -> 400L, "stream" -> 300L, "query" -> 250L, "data" -> 200L,
            "join" -> 150L, "the" -> -50L, "a" -> -20L, "slow" -> -350L),
          threshold = 0.02)
          .select(col("doc").as("doc_id"),
            greatest(lit(0L), least(lit(1000L),
              lit(500L) + expr("(raw_permille * 1000) div " +
                "(CASE WHEN n_tokens = 0 THEN NULL ELSE n_tokens END * 1000)")))
              .as("keep_permille"))
        docs.join(scored, Seq("doc_id"))
          .where(Sharding.hashBucket1000(col("text")) < col("keep_permille"))
          .select(col("doc_id"), col("keep_permille"))
          .orderBy("doc_id")
    },

    // ── Sequence packing: per shard, documents concatenate in id order
    //    and chunk into fixed 256-token packs (the standard pretraining
    //    layout — docs spanning a cut straddle two packs). Pure integer
    //    arithmetic over a per-shard running sum: hash-exact across
    //    engines by construction. ──
    QueryDef.sql(
      "pipeline_pack_sequences",
      """WITH a AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(trim(text), ' '), w -> w <> '')) AS BIGINT) AS n_tokens,
        |    CAST(CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(text),1,8)[i]) - 1)
        |                         * power(16, 8 - i) for i in range(1,9) ]) AS BIGINT)
        |         % 8 AS INTEGER) AS shard
        |  FROM documents),
        |b AS (
        |  SELECT shard, doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens AS BIGINT) AS tok_start
        |  FROM a)
        |SELECT shard, doc_id, n_tokens, tok_start,
        |  tok_start // 256 AS pack_first,
        |  greatest(tok_start + n_tokens - 1, tok_start) // 256 AS pack_last
        |FROM b ORDER BY shard, doc_id""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        Sharding.packSequences(docs, "doc_id", "n_tokens",
            keyCol = "text", nShards = 8, seqLen = 256)
          .select("shard", "doc_id", "n_tokens", "tok_start", "pack_first", "pack_last")
          .orderBy("shard", "doc_id")
    },

    // ── Packing-efficiency report: per shard, how much of the fixed
    //    seqLen×packs token budget the concatenate-and-cut layout
    //    actually fills — the padding waste a training run pays for.
    //    Derived from the same running-sum assignment as
    //    pipeline_pack_sequences; one aggregate over its output. ──
    QueryDef.sql(
      "pipeline_pack_efficiency",
      """WITH a AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(trim(text), ' '), w -> w <> '')) AS BIGINT) AS n_tokens,
        |    CAST(CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(text),1,8)[i]) - 1)
        |                         * power(16, 8 - i) for i in range(1,9) ]) AS BIGINT)
        |         % 8 AS INTEGER) AS shard
        |  FROM documents),
        |b AS (
        |  SELECT shard, doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens AS BIGINT) AS tok_start
        |  FROM a),
        |c AS (
        |  SELECT shard, doc_id, n_tokens,
        |    greatest(tok_start + n_tokens - 1, tok_start) // 256 AS pack_last
        |  FROM b)
        |SELECT shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(max(pack_last) + 1 AS BIGINT) AS n_packs,
        |  CAST((max(pack_last) + 1) * 256 - sum(n_tokens) AS BIGINT) AS pad_tokens,
        |  round(CAST((max(pack_last) + 1) * 256 - sum(n_tokens) AS DOUBLE)
        |        / ((max(pack_last) + 1) * 256), 4) AS pad_frac
        |FROM c GROUP BY shard ORDER BY shard""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
        Sharding.packSequences(docs, "doc_id", "n_tokens",
            keyCol = "text", nShards = 8, seqLen = 256)
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("n_tokens"),
            (max("pack_last") + 1).as("n_packs"),
            ((max("pack_last") + 1) * 256 - sum("n_tokens")).as("pad_tokens"),
            round(((max("pack_last") + 1) * 256 - sum("n_tokens")).cast("double") /
              ((max("pack_last") + 1) * 256), 4).as("pad_frac"))
          .orderBy("shard")
    },

    // ── Repetition signal (Gopher/C4 family): duplicate-bigram fraction
    //    per document — boilerplate scores high, prose near 0. Pure
    //    per-row expression: shingle, distinct, ratio inside the row. ──
    QueryDef.sql(
      "text_repetition",
      """WITH g AS (
        |  SELECT doc_id,
        |    [ws[i] || ' ' || ws[i + 1] for i in range(1, len(ws))] AS grams
        |  FROM (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws
        |        FROM documents))
        |SELECT doc_id,
        |  CAST(len(grams) AS BIGINT) AS n_grams,
        |  round(CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
        |        / nullif(len(grams), 0), 4) AS dup_fraction
        |FROM g ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        // Tokenize into an attribute FIRST (an interpreted HOF lambda
        // re-evaluates non-lambda subexpressions per element — shingling
        // over the raw tokenizer expression would re-tokenize per gram),
        // then shingle ONCE into an attribute the sizes/distinct read.
        Tables.documents(s, d)
          .select(col("doc_id"), wordsCol.as("ws"))
          .select(col("doc_id"), TextOps.shingles(col("ws"), 2).as("sh"))
          .select(col("doc_id"),
            size(col("sh")).cast("long").as("n_grams"),
            TextOps.dupFractionOfShingles(col("sh")).as("dup_fraction"))
          .orderBy("doc_id")
    },

    // ── Language-ID heuristic: function-word marker counting (n-gram
    //    heuristics degenerate on this synthetic corpus, so the classifier
    //    is marker-based; the oracle pins the exact same rule). ──
    QueryDef.sql(
      "text_langid",
      """SELECT doc_id, lang AS labeled_lang,
        |  CASE WHEN n_en >= 2 THEN 'en' ELSE 'und' END AS predicted_lang
        |FROM (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(trim(text), ' '), w -> w IN ('the','a','of','and'))) AS n_en
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang").as("labeled_lang"), wordsCol.as("ws"))
          .select(col("doc_id"), col("labeled_lang"),
            TextOps.langIdEn(col("ws"), Seq("the", "a", "of", "and"), minHits = 2)
              .as("predicted_lang"))
          .orderBy("doc_id")
    },

    // ── N-gram novelty scoring: per doc, the fraction of its distinct
    //    4-grams appearing in no other doc, and the mean document
    //    frequency of its grams — the corpus-frequency quality signal.
    //    Per-doc grams are deduped first so df needs no count-distinct
    //    and the gram agg stays map-side combinable under hot grams. ──
    QueryDef.sql(
      "text_novelty",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |         CASE WHEN len(ws) >= 4
        |           THEN [array_to_string(list_slice(ws, j, j + 3), ' ') for j in range(1, len(ws) - 2)]
        |           ELSE CAST([] AS VARCHAR[]) END)) AS g
        |       FROM t),
        |dfq AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY g)
        |SELECT sh.doc_id AS doc, CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
        |  round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 4) AS novel_frac,
        |  round(CAST(sum(df) AS DOUBLE) / count(*), 4) AS mean_gram_df
        |FROM sh JOIN dfq USING (g)
        |GROUP BY sh.doc_id ORDER BY doc""".stripMargin) {
      (s, d) =>
        TextOps.ngramNovelty(QueryDef.fanOutIfNarrow(Tables.documents(s, d)), "doc_id", "text", n = 4)
          .orderBy("doc")
    },

    // ── EXACT-substring cross-doc coverage: which token positions sit
    //    inside an exact ≥5-token run shared with ANOTHER document — the
    //    suffix-array-shaped operator, via the span-union identity
    //    (position covered ⇔ some 5-gram through it is cross-doc). The
    //    oracle recomputes the union with gaps-and-islands windows over
    //    the shared-gram positions. ──
    QueryDef.sql(
      "text_exact_runs",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |b AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, ws FROM t WHERE len(ws) >= 5),
        |g AS (SELECT doc_id,
        |        unnest(range(1, len(ws) - 3)) AS pos,
        |        unnest([array_to_string(list_slice(ws, j, j + 4), ' ') for j in range(1, len(ws) - 3)]) AS gram
        |      FROM b),
        |s AS (SELECT gram FROM g GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
        |sp AS (SELECT g.doc_id, g.pos FROM g JOIN s USING (gram)),
        |isl AS (SELECT doc_id, pos,
        |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 5 THEN 0 ELSE 1 END AS brk
        |        FROM sp),
        |grp AS (SELECT doc_id, pos,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
        |        FROM isl),
        |iv AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 4 AS e FROM grp GROUP BY 1, 2),
        |cov AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS covered_tokens,
        |               CAST(max(e - s + 1) AS BIGINT) AS max_run
        |        FROM iv GROUP BY 1)
        |SELECT b.doc_id AS doc, b.n_tokens,
        |  CAST(coalesce(covered_tokens, 0) AS BIGINT) AS covered_tokens,
        |  round(CAST(coalesce(covered_tokens, 0) AS DOUBLE) / n_tokens, 4) AS covered_frac,
        |  CAST(coalesce(max_run, 0) AS BIGINT) AS max_run
        |FROM b LEFT JOIN cov ON cov.doc_id = b.doc_id
        |ORDER BY doc""".stripMargin) {
      (s, d) =>
        TextOps.exactRunCoverage(Tables.documents(s, d), "doc_id", "text", n = 5)
          .orderBy("doc")
    },

    // ── CHARACTER-granularity exact-run coverage — the tier token
    //    n-grams provably miss: duplicates perturbed by whitespace or
    //    punctuation INSIDE tokens share no token n-gram but share
    //    long char runs (the Lee et al. 2022 suffix-array shape, via
    //    the span-union identity at char offsets: position covered ⇔
    //    some 20-char gram through it occurs in another doc). The
    //    oracle replays the union with the same gaps-and-islands
    //    windows over shared-gram char positions. The all-positions
    //    explode is the EXACT instrument the oracle can replay; the
    //    winnowed-minimizer variant (charRunCoverageAnchored, ~w× less
    //    volume, ≥ k+w−1 detection guarantee) is the 100 TB path,
    //    spec-pinned as a bounded lower envelope of this one. ──
    QueryDef.sql(
      "text_char_runs",
      """WITH b AS (SELECT doc_id, text AS t, CAST(length(text) AS BIGINT) AS n_chars
        |           FROM documents WHERE text IS NOT NULL AND length(text) >= 20),
        |g AS (SELECT doc_id,
        |        unnest(range(1, CAST(n_chars AS INT) - 18)) AS pos,
        |        unnest([substr(t, j, 20) for j in range(1, CAST(n_chars AS INT) - 18)]) AS gram
        |      FROM b),
        |s AS (SELECT gram FROM g GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
        |sp AS (SELECT g.doc_id, g.pos FROM g JOIN s USING (gram)),
        |isl AS (SELECT doc_id, pos,
        |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20 THEN 0 ELSE 1 END AS brk
        |        FROM sp),
        |grp AS (SELECT doc_id, pos,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
        |        FROM isl),
        |iv AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 19 AS e FROM grp GROUP BY 1, 2),
        |cov AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS covered_chars,
        |               CAST(max(e - s + 1) AS BIGINT) AS max_run
        |        FROM iv GROUP BY 1)
        |SELECT b.doc_id AS doc, b.n_chars,
        |  CAST(coalesce(covered_chars, 0) AS BIGINT) AS covered_chars,
        |  round(CAST(coalesce(covered_chars, 0) AS DOUBLE) / n_chars, 4) AS covered_frac,
        |  CAST(coalesce(max_run, 0) AS BIGINT) AS max_run
        |FROM b LEFT JOIN cov ON cov.doc_id = b.doc_id
        |ORDER BY doc""".stripMargin) {
      (s, d) =>
        TextOps.charRunCoverage(Tables.documents(s, d), "doc_id", "text", k = 20)
          .orderBy("doc")
    },

    // ── The char-granularity CUT (keep-first): spans of ≥ 20 chars
    //    already present in an EARLIER doc are removed and the kept
    //    characters re-join WITHOUT separators (char offsets, not
    //    tokens) — what substring dedup actually excises from the
    //    whitespace/punctuation-perturbed copies the token cut leaves
    //    intact. Oracle: per-char anti-join against the covered union,
    //    string_agg in position order. ──
    QueryDef.sql(
      "text_char_dedup",
      """WITH b AS (SELECT doc_id, text AS t, CAST(length(text) AS BIGINT) AS n_chars
        |           FROM documents WHERE text IS NOT NULL AND length(text) >= 20),
        |g AS (SELECT doc_id,
        |        unnest(range(1, CAST(n_chars AS INT) - 18)) AS pos,
        |        unnest([substr(t, j, 20) for j in range(1, CAST(n_chars AS INT) - 18)]) AS gram
        |      FROM b),
        |m AS (SELECT gram, min(doc_id) AS mind FROM g GROUP BY gram),
        |rp AS (SELECT g.doc_id, g.pos FROM g JOIN m USING (gram) WHERE m.mind < g.doc_id),
        |cov AS (SELECT DISTINCT doc_id, pos + o AS p FROM rp, (SELECT unnest(range(0, 20)) AS o) oo),
        |tok AS (SELECT doc_id, unnest(range(1, CAST(n_chars AS INT) + 1)) AS p,
        |          unnest([substr(t, j, 1) for j in range(1, CAST(n_chars AS INT) + 1)]) AS w
        |        FROM b),
        |kept AS (SELECT tok.doc_id, tok.p, tok.w FROM tok
        |         LEFT JOIN cov ON cov.doc_id = tok.doc_id AND cov.p = tok.p
        |         WHERE cov.p IS NULL),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |          string_agg(w, '' ORDER BY p) AS clean_text
        |        FROM kept GROUP BY doc_id)
        |SELECT b.doc_id AS doc, b.n_chars,
        |  CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(agg.clean_text, '') AS clean_text
        |FROM b LEFT JOIN agg ON agg.doc_id = b.doc_id
        |ORDER BY doc""".stripMargin) {
      (s, d) =>
        TextOps.charRunDedupText(Tables.documents(s, d), "doc_id", "text", k = 20)
          .orderBy("doc")
    },

    // ── The ANCHORED char-run ENVELOPE report — per exact-coverage
    //    decile, the exact vs anchored covered-char mass and the
    //    envelope check (anchored ≤ exact on every doc, by
    //    construction). ORACLE-PINNED since round 14 (the r13 verdict
    //    ask): both sides were already SQL-expressible — the oracle
    //    composes the text_char_runs exact-coverage chain and the
    //    text_char_anchored winnowing chain over ONE shared gram table
    //    and rolls the join up by decile, so a drift in either path or
    //    in the report arithmetic moves a decile row's hash. ──
    QueryDef.sql(
      "dedup_char_anchored",
      """WITH b AS (SELECT doc_id, text AS t, CAST(length(text) AS BIGINT) AS n_chars
        |           FROM documents WHERE text IS NOT NULL AND length(text) >= 20),
        |g AS (SELECT doc_id, CAST(n_chars AS INT) - 19 AS n,
        |        unnest(range(1, CAST(n_chars AS INT) - 18)) AS i,
        |        unnest([md5(substr(t, j, 20)) for j in range(1, CAST(n_chars AS INT) - 18)]) AS h,
        |        unnest([substr(t, j, 20) for j in range(1, CAST(n_chars AS INT) - 18)]) AS gram
        |      FROM b),
        |es AS (SELECT gram FROM g GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
        |esp AS (SELECT g.doc_id, g.i AS pos FROM g JOIN es USING (gram)),
        |eisl AS (SELECT doc_id, pos,
        |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20 THEN 0 ELSE 1 END AS brk
        |        FROM esp),
        |egrp AS (SELECT doc_id, pos,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
        |        FROM eisl),
        |eiv AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 19 AS e FROM egrp GROUP BY 1, 2),
        |ecov AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS ec FROM eiv GROUP BY 1),
        |wm AS (SELECT doc_id, i, n,
        |         min(h) OVER (PARTITION BY doc_id ORDER BY i
        |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        |       FROM g),
        |wv AS (SELECT doc_id, i, wmin FROM wm WHERE i - 1 <= greatest(n - 4, 0)),
        |anch0 AS (SELECT wv.doc_id, wv.i AS wstart, min(g.i) AS j
        |          FROM wv JOIN g ON g.doc_id = wv.doc_id
        |            AND g.i BETWEEN wv.i AND wv.i + 3 AND g.h = wv.wmin
        |          GROUP BY wv.doc_id, wv.i),
        |a AS (SELECT DISTINCT doc_id, j FROM anch0),
        |ag AS (SELECT a.doc_id, a.j, g.gram FROM a
        |       JOIN g ON g.doc_id = a.doc_id AND g.i = a.j),
        |ash AS (SELECT gram FROM ag GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
        |asp AS (SELECT ag.doc_id, ag.j AS pos FROM ag JOIN ash USING (gram)),
        |aisl AS (SELECT doc_id, pos,
        |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20 THEN 0 ELSE 1 END AS brk
        |        FROM asp),
        |agrp AS (SELECT doc_id, pos,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
        |        FROM aisl),
        |aiv AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 19 AS e FROM agrp GROUP BY 1, 2),
        |acov AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS ac FROM aiv GROUP BY 1),
        |per AS (SELECT b.doc_id,
        |          CAST(coalesce(ecov.ec, 0) AS BIGINT) AS ec,
        |          round(CAST(coalesce(ecov.ec, 0) AS DOUBLE) / b.n_chars, 4) AS ef,
        |          CAST(coalesce(acov.ac, 0) AS BIGINT) AS ac
        |        FROM b LEFT JOIN ecov ON ecov.doc_id = b.doc_id
        |               LEFT JOIN acov ON acov.doc_id = b.doc_id)
        |SELECT CAST(floor(ef * 10) AS BIGINT) AS decile,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(ec) AS BIGINT) AS exact_covered,
        |  CAST(sum(ac) AS BIGINT) AS anchored_covered,
        |  CAST(sum(CASE WHEN ac > ec THEN 1 ELSE 0 END) AS BIGINT) AS envelope_violations
        |FROM per GROUP BY 1 ORDER BY decile""".stripMargin) {
      (s, d) =>
        val exact = TextOps.charRunCoverage(Tables.documents(s, d), "doc_id", "text", k = 20)
          .select(col("doc"), col("covered_chars").as("exact_cov"),
            col("covered_frac").as("ef"))
        val anch = TextOps.charRunCoverageAnchored(
          Tables.documents(s, d), "doc_id", "text", k = 20, w = 4)
          .select(col("doc"), col("covered_chars").as("anch_cov"))
        exact.join(anch, Seq("doc"))
          .groupBy(floor(col("ef") * 10).cast("long").as("decile"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum("exact_cov").cast("long").as("exact_covered"),
            sum("anch_cov").cast("long").as("anchored_covered"),
            sum(when(col("anch_cov") > col("exact_cov"), 1L).otherwise(0L))
              .cast("long").as("envelope_violations"))
          .orderBy("decile")
    },

    // ── The anchored char-run path ORACLE-PINNED (the r12 verdict ask):
    //    DuckDB replays the winnowing itself — per doc, md5 over every
    //    char 20-gram, leftmost-min per 4-window (hex-string min IS the
    //    unsigned digest-byte order; the min-position join replays the
    //    leftmost tie-break exactly), valid window starts only
    //    (i−1 ≤ max(n−w, 0), the text_winnow_fingerprint frame), then
    //    the cross-doc test over the ANCHOR set (content-determined
    //    anchoring: a shared run anchors identically in every doc) and
    //    the same gaps-and-islands span union as text_char_runs. One
    //    drifted anchor anywhere moves covered_chars and the hash.
    //    dedup_char_anchored stays as the exact-vs-anchored ENVELOPE
    //    instrument; this row pins the anchored production path
    //    byte-for-byte. ──
    QueryDef.sql(
      "text_char_anchored",
      """WITH b AS (SELECT doc_id, text AS t, CAST(length(text) AS BIGINT) AS n_chars
        |           FROM documents WHERE text IS NOT NULL AND length(text) >= 20),
        |g AS (SELECT doc_id, CAST(n_chars AS INT) - 19 AS n,
        |        unnest(range(1, CAST(n_chars AS INT) - 18)) AS i,
        |        unnest([md5(substr(t, j, 20)) for j in range(1, CAST(n_chars AS INT) - 18)]) AS h,
        |        unnest([substr(t, j, 20) for j in range(1, CAST(n_chars AS INT) - 18)]) AS gram
        |      FROM b),
        |wm AS (SELECT doc_id, i, n,
        |         min(h) OVER (PARTITION BY doc_id ORDER BY i
        |                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        |       FROM g),
        |wv AS (SELECT doc_id, i, wmin FROM wm WHERE i - 1 <= greatest(n - 4, 0)),
        |anch0 AS (SELECT wv.doc_id, wv.i AS wstart, min(g.i) AS j
        |          FROM wv JOIN g ON g.doc_id = wv.doc_id
        |            AND g.i BETWEEN wv.i AND wv.i + 3 AND g.h = wv.wmin
        |          GROUP BY wv.doc_id, wv.i),
        |a AS (SELECT DISTINCT doc_id, j FROM anch0),
        |ag AS (SELECT a.doc_id, a.j, g.gram FROM a
        |       JOIN g ON g.doc_id = a.doc_id AND g.i = a.j),
        |s AS (SELECT gram FROM ag GROUP BY gram HAVING min(doc_id) <> max(doc_id)),
        |sp AS (SELECT ag.doc_id, ag.j AS pos FROM ag JOIN s USING (gram)),
        |isl AS (SELECT doc_id, pos,
        |          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 20 THEN 0 ELSE 1 END AS brk
        |        FROM sp),
        |grp AS (SELECT doc_id, pos,
        |          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
        |        FROM isl),
        |iv AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 19 AS e FROM grp GROUP BY 1, 2),
        |cov AS (SELECT doc_id, CAST(sum(e - s + 1) AS BIGINT) AS covered_chars,
        |               CAST(max(e - s + 1) AS BIGINT) AS max_run
        |        FROM iv GROUP BY 1)
        |SELECT b.doc_id AS doc, b.n_chars,
        |  CAST(coalesce(covered_chars, 0) AS BIGINT) AS covered_chars,
        |  round(CAST(coalesce(covered_chars, 0) AS DOUBLE) / n_chars, 4) AS covered_frac,
        |  CAST(coalesce(max_run, 0) AS BIGINT) AS max_run
        |FROM b LEFT JOIN cov ON cov.doc_id = b.doc_id
        |ORDER BY doc""".stripMargin) {
      (s, d) =>
        TextOps.charRunCoverageAnchored(Tables.documents(s, d), "doc_id", "text",
          k = 20, w = 4)
          .orderBy("doc")
    },

    // ── Fixed-budget per-source sample: at most 20 docs per source, the
    //    first 20 of each group in md5-of-key order (deterministic,
    //    engine-reproducible). Spark runs it through the bounded-collect
    //    heap (O(n) state, map-side partials — no per-group sort); the
    //    oracle is the window row_number form. ──
    QueryDef.sql(
      "pipeline_sample_per_source",
      """SELECT source, doc_id FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) t
        |WHERE rn <= 20
        |ORDER BY source, doc_id""".stripMargin) {
      (s, d) =>
        Sharding.samplePerGroup(Tables.documents(s, d), "source", "doc_id", n = 20)
          .orderBy("source", "doc_id")
    },

    // ── Mixture-design SOLVER: target mix (permille per source) + global
    //    token budget → per-source want/take/rate/deficit plan. Curated
    //    sources (src0-3) ask 150‰ each of a 12k-token budget — more
    //    than they hold at small SF, so the deficit column actually
    //    fires; exact long sizing, one closing division for the rate. ──
    {
      val weights: Map[String, Long] =
        (0 to 3).map(i => s"src$i" -> 150L).toMap ++
          (4 to 19).map(i => s"src$i" -> 25L).toMap
      val budget = 12000L
      val valuesSql = weights.toSeq.sortBy(_._1)
        .map { case (s, p) => s"('$s', $p)" }.mkString(", ")
      QueryDef.sql(
        "pipeline_mixture_solver",
        s"""WITH w(src, tp) AS (VALUES $valuesSql),
           |a AS (SELECT source,
           |        CAST(count(*) AS BIGINT) AS n_docs,
           |        CAST(sum(len(list_filter(string_split(trim(text), ' '), t -> t <> ''))) AS BIGINT) AS avail_tokens
           |      FROM documents GROUP BY source),
           |p AS (SELECT a.source, a.n_docs, a.avail_tokens,
           |        CAST(coalesce(w.tp, 0) AS BIGINT) AS target_permille,
           |        CAST($budget * coalesce(w.tp, 0) // 1000 AS BIGINT) AS want_tokens
           |      FROM a LEFT JOIN w ON w.src = a.source)
           |SELECT source, n_docs, avail_tokens, target_permille, want_tokens,
           |  least(avail_tokens, want_tokens) AS take_tokens,
           |  round(CAST(least(avail_tokens, want_tokens) AS DOUBLE) / nullif(avail_tokens, 0), 4) AS rate,
           |  want_tokens > avail_tokens AS deficit
           |FROM p ORDER BY source""".stripMargin) {
        (s, d) =>
          Sharding.mixtureSolver(Tables.documents(s, d), "source", "text",
            targetPermille = weights, budgetTokens = budget)
            .orderBy("source")
      }
    },

    // ── BM25-shaped retrieval top-k (rational idf for cross-engine bit
    //    parity — see TextOps.bm25TopK scaladoc; ln is not correctly
    //    rounded across libms, rational arithmetic is). The SQL mirrors
    //    the Spark expression tree operation-for-operation. ──
    QueryDef.sql(
      "text_bm25_topk",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |bse AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS len,
        |          CAST(len(list_filter(ws, w -> w = 'spark')) AS DOUBLE) AS tf0,
        |          CAST(len(list_filter(ws, w -> w = 'window')) AS DOUBLE) AS tf1,
        |          CAST(len(list_filter(ws, w -> w = 'merge')) AS DOUBLE) AS tf2
        |        FROM t),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(len) AS avgl,
        |          sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
        |          sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
        |          sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
        |        FROM bse),
        |sc AS (SELECT doc_id, CAST(len AS BIGINT) AS n_tokens,
        |        round(
        |          (n - df0 + 0.5) / (df0 + 0.5) * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgl))
        |        + (n - df1 + 0.5) / (df1 + 0.5) * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgl))
        |        + (n - df2 + 0.5) / (df2 + 0.5) * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgl))
        |        , 4) AS score
        |       FROM bse, st)
        |SELECT doc_id AS doc, n_tokens, score FROM sc WHERE score > 0
        |ORDER BY score DESC, doc LIMIT 15""".stripMargin) {
      (s, d) =>
        TextOps.bm25TopK(Tables.documents(s, d), "doc_id", "text",
          terms = Seq("spark", "window", "merge"), k = 15)
    },

    // ── Retrieval-quality EVAL: MRR@10 / recall@10 / NDCG@10 of the BM25
    //    ranker against derived relevance (doc relevant iff it contains
    //    EVERY query term). All five queries score in ONE corpus pass
    //    (batched tf columns), per-query top-k through the bounded heap
    //    (no per-query window sort). The NDCG discount table and its
    //    prefix sums are computed ONCE here in Scala and interpolated
    //    into BOTH engines as identical double literals — no log()
    //    evaluates at query time (generated-oracle doctrine). ──
    {
      val evalQueries = Seq(
        "q_all3" -> Seq("spark", "window", "merge"),
        "q_merge" -> Seq("merge"),
        "q_spark" -> Seq("spark"),
        "q_spark_window" -> Seq("spark", "window"),
        "q_window_merge" -> Seq("window", "merge"))
      val k = 10
      val allTerms = evalQueries.flatMap(_._2).distinct
      val w = (1 to k).map(r => 1.0 / (math.log(r + 1.0) / math.log(2.0)))
      val idcg = w.scanLeft(0.0)(_ + _).tail
      val tfDefs = allTerms.zipWithIndex.map { case (t, i) =>
        s"CAST(len(list_filter(ws, w -> w = '$t')) AS DOUBLE) AS tf$i" }.mkString(", ")
      val dfDefs = allTerms.indices.map(i =>
        s"sum(CASE WHEN tf$i > 0 THEN 1.0 ELSE 0.0 END) AS df$i").mkString(", ")
      val branches = evalQueries.map { case (qid, terms) =>
        val score = terms.map { t =>
          val i = allTerms.indexOf(t)
          s"(n - df$i + 0.5) / (df$i + 0.5) * (tf$i * (1.2 + 1.0)) / (tf$i + 1.2 * (1.0 - 0.75 + 0.75 * len / avgl))"
        }.mkString(" + ")
        val rel = terms.map(t => s"tf${allTerms.indexOf(t)} > 0").mkString(" AND ")
        s"SELECT doc_id, '$qid' AS qid, round($score, 4) AS score, ($rel) AS rel FROM bse, st"
      }.mkString("\nUNION ALL\n")
      QueryDef.sql(
        "text_retrieval_eval",
        s"""WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
           |bse AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS len, $tfDefs FROM t),
           |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(len) AS avgl, $dfDefs FROM bse),
           |scored AS (
           |$branches),
           |f AS (SELECT * FROM scored WHERE score > 0),
           |tk AS (SELECT qid, doc_id, rel,
           |         row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
           |       FROM f),
           |h AS (SELECT qid,
           |        CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           |        min(CASE WHEN rel THEN rank END) AS minr,
           |        sum(CASE WHEN rel THEN (${w.mkString("[", ", ", "]")})[rank] ELSE 0.0 END) AS dcg
           |      FROM tk WHERE rank <= $k GROUP BY qid),
           |r AS (SELECT qid, CAST(sum(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_relevant
           |      FROM f GROUP BY qid),
           |qs AS (SELECT unnest([${evalQueries.map(q => s"'${q._1}'").mkString(", ")}]) AS qid)
           |SELECT qs.qid AS qid,
           |  coalesce(n_relevant, 0) AS n_relevant,
           |  coalesce(n_hits, 0) AS n_hits,
           |  round(coalesce(1.0 / minr, 0.0), 4) AS rr,
           |  round(CAST(coalesce(n_hits, 0) AS DOUBLE) / nullif(coalesce(n_relevant, 0), 0), 4) AS recall,
           |  round(CASE WHEN coalesce(n_relevant, 0) = 0 THEN NULL
           |        ELSE dcg / (${idcg.mkString("[", ", ", "]")})[least(n_relevant, $k)] END, 4) AS ndcg
           |FROM qs LEFT JOIN r ON r.qid = qs.qid LEFT JOIN h ON h.qid = qs.qid
           |ORDER BY qs.qid""".stripMargin) {
        (s, d) =>
          TextOps.retrievalEval(Tables.documents(s, d), "doc_id", "text",
            evalQueries, k = k).orderBy("qid")
      }
    },

    // ── INCREMENTAL BM25 index: build the stats artifact on the first
    //    corpus half, fold the second half in via exact long addition,
    //    serve top-k from the stored stats in ONE corpus scan. The
    //    oracle recomputes FULL-corpus statistics from scratch — so a
    //    hash-match proves build+update ≡ full rebuild, the stored-index
    //    contract (avgl is computed as sum(len)/count on both engines:
    //    one division of exact integers, no float-aggregation order). ──
    QueryDef.sql(
      "text_bm25_incremental",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |bse AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS len,
        |          CAST(len(list_filter(ws, w -> w = 'spark')) AS DOUBLE) AS tf0,
        |          CAST(len(list_filter(ws, w -> w = 'window')) AS DOUBLE) AS tf1,
        |          CAST(len(list_filter(ws, w -> w = 'merge')) AS DOUBLE) AS tf2
        |        FROM t),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |          CAST(CAST(sum(len) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgl,
        |          sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
        |          sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
        |          sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
        |        FROM bse),
        |sc AS (SELECT doc_id, CAST(len AS BIGINT) AS n_tokens,
        |        round(
        |          (n - df0 + 0.5) / (df0 + 0.5) * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgl))
        |        + (n - df1 + 0.5) / (df1 + 0.5) * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgl))
        |        + (n - df2 + 0.5) / (df2 + 0.5) * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgl))
        |        , 4) AS score
        |       FROM bse, st)
        |SELECT doc_id AS doc, n_tokens, score FROM sc WHERE score > 0
        |ORDER BY score DESC, doc LIMIT 15""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val dir = java.nio.file.Files.createTempDirectory("graft-bm25").toString
        TextOps.bm25IndexBuild(dir, docs.filter(col("doc_id") < 250), "text")
        TextOps.bm25IndexUpdate(s, dir, docs.filter(col("doc_id") >= 250), "text")
        TextOps.bm25TopKStored(s, dir, docs, "doc_id", "text",
          terms = Seq("spark", "window", "merge"), k = 15)
    },

    // ── Posting-list BM25 serve: the index is built once (postings
    //    bucket-partitioned by term hash + the stats artifact), then
    //    top-k is answered WITHOUT scanning the corpus — the read prunes
    //    to the queried terms' buckets. Same oracle as the fresh
    //    ranker (exact-avg form): a hash-match proves the inverted
    //    index serves byte-identical rankings. ──
    QueryDef.sql(
      "text_bm25_postings",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |bse AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS len,
        |          CAST(len(list_filter(ws, w -> w = 'spark')) AS DOUBLE) AS tf0,
        |          CAST(len(list_filter(ws, w -> w = 'window')) AS DOUBLE) AS tf1,
        |          CAST(len(list_filter(ws, w -> w = 'merge')) AS DOUBLE) AS tf2
        |        FROM t),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |          CAST(CAST(sum(len) AS BIGINT) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgl,
        |          sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
        |          sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
        |          sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
        |        FROM bse),
        |sc AS (SELECT doc_id, CAST(len AS BIGINT) AS n_tokens,
        |        round(
        |          (n - df0 + 0.5) / (df0 + 0.5) * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgl))
        |        + (n - df1 + 0.5) / (df1 + 0.5) * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgl))
        |        + (n - df2 + 0.5) / (df2 + 0.5) * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgl))
        |        , 4) AS score
        |       FROM bse, st)
        |SELECT doc_id AS doc, n_tokens, score FROM sc WHERE score > 0
        |ORDER BY score DESC, doc LIMIT 15""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val dir = java.nio.file.Files.createTempDirectory("graft-postings").toString
        TextOps.bm25IndexBuild(dir, docs, "text")
        TextOps.bm25PostingsBuild(dir, docs, "doc_id", "text")
        TextOps.bm25TopKPostings(s, dir,
          terms = Seq("spark", "window", "merge"), k = 15)
    },

    // ── EXACT-substring dedup, the CUT half: spans already present in an
    //    EARLIER doc (keep-first) are removed and the cleaned token
    //    stream re-joined. The oracle rebuilds the text with an anti-join
    //    of token positions against the covered-position union. ──
    QueryDef.sql(
      "text_exact_dedup",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |b AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, ws FROM t WHERE len(ws) >= 5),
        |g AS (SELECT doc_id,
        |        unnest(range(1, len(ws) - 3)) AS pos,
        |        unnest([array_to_string(list_slice(ws, j, j + 4), ' ') for j in range(1, len(ws) - 3)]) AS gram
        |      FROM b),
        |m AS (SELECT gram, min(doc_id) AS mind FROM g GROUP BY gram),
        |rp AS (SELECT g.doc_id, g.pos FROM g JOIN m USING (gram) WHERE m.mind < g.doc_id),
        |cov AS (SELECT DISTINCT doc_id, pos + o AS p FROM rp, (SELECT unnest(range(0, 5)) AS o) oo),
        |tok AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS p, unnest(ws) AS w FROM b),
        |kept AS (SELECT tok.doc_id, tok.p, tok.w FROM tok
        |         LEFT JOIN cov ON cov.doc_id = tok.doc_id AND cov.p = tok.p
        |         WHERE cov.p IS NULL),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |          string_agg(w, ' ' ORDER BY p) AS clean_text
        |        FROM kept GROUP BY doc_id)
        |SELECT b.doc_id AS doc, b.n_tokens,
        |  CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(agg.clean_text, '') AS clean_text
        |FROM b LEFT JOIN agg ON agg.doc_id = b.doc_id
        |ORDER BY doc""".stripMargin) {
      (s, d) =>
        TextOps.exactRunDedupText(Tables.documents(s, d), "doc_id", "text", n = 5)
          .orderBy("doc")
    },

    // ── Within-doc repetition cut (de-looping): keep-first over the
    //    doc's OWN 3-gram runs — the degenerate-generation cleaner; the
    //    within-doc sibling of text_exact_dedup. Every key is
    //    (doc, gram): document-scoped state, no hot-gram risk at all. ──
    QueryDef.sql(
      "text_selfrep_dedup",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |b AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, ws FROM t WHERE len(ws) >= 3),
        |g AS (SELECT doc_id,
        |        unnest(range(1, len(ws) - 1)) AS pos,
        |        unnest([array_to_string(list_slice(ws, j, j + 2), ' ') for j in range(1, len(ws) - 1)]) AS gram
        |      FROM b),
        |m AS (SELECT doc_id, gram, min(pos) AS fp, count(*) AS c FROM g GROUP BY 1, 2),
        |rp AS (SELECT g.doc_id, g.pos FROM g JOIN m USING (doc_id, gram)
        |       WHERE m.c > 1 AND g.pos > m.fp),
        |cov AS (SELECT DISTINCT doc_id, pos + o AS p FROM rp, (SELECT unnest(range(0, 3)) AS o) oo),
        |tok AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS p, unnest(ws) AS w FROM b),
        |kept AS (SELECT tok.doc_id, tok.p, tok.w FROM tok
        |         LEFT JOIN cov ON cov.doc_id = tok.doc_id AND cov.p = tok.p
        |         WHERE cov.p IS NULL),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |          string_agg(w, ' ' ORDER BY p) AS clean_text
        |        FROM kept GROUP BY doc_id)
        |SELECT b.doc_id AS doc, b.n_tokens,
        |  CAST(coalesce(agg.n_kept, 0) AS BIGINT) AS n_kept,
        |  coalesce(agg.clean_text, '') AS clean_text
        |FROM b LEFT JOIN agg ON agg.doc_id = b.doc_id
        |ORDER BY doc""".stripMargin) {
      (s, d) =>
        TextOps.selfRepDedupText(Tables.documents(s, d), "doc_id", "text", n = 3)
          .orderBy("doc")
    },

    // ── MULTI-language ID: ten char-trigram profiles (de en es fr it nl
    //    pl pt sv tr), score = total profile-gram occurrences in the
    //    lowercased text, argmax with ties to the smallest code, all-zero
    //    ⇒ 'und'. The oracle's per-language branches are GENERATED from
    //    the same Scala profile literals, so Spark and DuckDB can never
    //    drift. On this synthetic corpus several languages genuinely
    //    fire ('order' contains de's 'der', 'query' contains es/fr's
    //    'que'), so the downstream per-language machinery sees >1 class;
    //    real-text behavior is pinned in OperatorsSpec with native
    //    sentences per language. ──
    QueryDef.sql(
      "text_langid_multi",
      s"""WITH t AS (SELECT doc_id, lower(text) AS tx FROM documents),
         |sc AS (
         |${TextOps.langIdMultiOracleBranches("doc_id", "tx")}),
         |r AS (SELECT doc_id, lang, score,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
         |      FROM sc)
         |SELECT doc_id, CASE WHEN score = 0 THEN 'und' ELSE lang END AS lang_pred,
         |  CAST(score AS BIGINT) AS score
         |FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"), TextOps.langIdMulti(col("text")).as("lm"))
          .select(col("doc_id"), col("lm.lang_pred").as("lang_pred"),
            col("lm.score").as("score"))
          .orderBy("doc_id")
    },

    // ── Language-ID CONFUSION MATRIX: predicted vs labeled language —
    //    the evaluation table behind any classifier deployment (which
    //    labels bleed into which predictions). Reuses the generated
    //    per-profile oracle branches; counts are exact. On this corpus
    //    the trigram profiles disagree with the labels wholesale
    //    (templates are language-agnostic) — the matrix SHOWS that,
    //    which is precisely its job. ──
    QueryDef.sql(
      "text_langid_confusion",
      s"""WITH t AS (SELECT doc_id, coalesce(lang, '??') AS label, lower(text) AS tx FROM documents),
         |sc AS (
         |${TextOps.langIdMultiOracleBranches("doc_id", "tx")}),
         |r AS (SELECT doc_id, lang, score,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
         |      FROM sc),
         |p AS (SELECT doc_id, CASE WHEN score = 0 THEN 'und' ELSE lang END AS lang_pred
         |      FROM r WHERE rn = 1)
         |SELECT t.label, p.lang_pred, CAST(count(*) AS BIGINT) AS n_docs
         |FROM t JOIN p USING (doc_id)
         |GROUP BY 1, 2 ORDER BY label, lang_pred""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .select(coalesce(col("lang"), lit("??")).as("label"),
            TextOps.langIdMulti(col("text")).getField("lang_pred").as("lang_pred"))
          .groupBy("label", "lang_pred")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("label", "lang_pred")
    },

    // ── Code-mixing / language-consistency signal: language-ID each
    //    NON-overlapping 32-token window (overlap would double-count
    //    boundary text), then per doc: window count, distinct detected
    //    languages, modal language and its share. A whole-doc classifier
    //    averages a bilingual doc into one label; windows expose the
    //    mix. Composition: chunkTokens → the langIdMulti expression →
    //    two partial-agg groupBys + min(struct) argmax (no rank window,
    //    no count-distinct Expand). Oracle reuses the GENERATED langid
    //    branches over the chunk CTE, so both engines share one
    //    classifier definition. ──
    QueryDef.sql(
      "text_code_mixing",
      s"""WITH d0 AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
         |s0 AS (SELECT doc_id, ws, len(ws) AS n FROM d0 WHERE len(ws) > 0),
         |c0 AS (SELECT doc_id, ws, unnest(range(0, (n + 31) // 32)) AS ci FROM s0),
         |t AS (SELECT doc_id * 100000 + ci AS cid, doc_id, ci,
         |        lower(array_to_string(list_slice(ws, ci * 32 + 1, ci * 32 + 32), ' ')) AS tx
         |      FROM c0),
         |sc AS (
         |${TextOps.langIdMultiOracleBranches("cid", "tx")}),
         |r AS (SELECT cid, lang, score,
         |        row_number() OVER (PARTITION BY cid ORDER BY score DESC, lang) AS rn
         |      FROM sc),
         |p AS (SELECT cid, CASE WHEN score = 0 THEN 'und' ELSE lang END AS lp
         |      FROM r WHERE rn = 1),
         |j AS (SELECT t.doc_id, p.lp FROM p JOIN t USING (cid)),
         |lc AS (SELECT doc_id, lp, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY 1, 2),
         |agg AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chunks,
         |          CAST(count(*) AS BIGINT) AS n_langs FROM lc GROUP BY 1),
         |top AS (SELECT doc_id, lp AS top_lang, c AS topc FROM (
         |          SELECT doc_id, lp, c, row_number() OVER (PARTITION BY doc_id
         |            ORDER BY c DESC, lp) AS rn FROM lc) WHERE rn = 1)
         |SELECT a.doc_id AS doc, a.n_chunks, a.n_langs, top.top_lang,
         |  round(CAST(top.topc AS DOUBLE) / a.n_chunks, 4) AS consistency,
         |  a.n_langs > 1 AS mixed
         |FROM agg a JOIN top USING (doc_id) ORDER BY doc""".stripMargin) {
      (s, d) =>
        val perChunk = TextOps.chunkTokens(Tables.documents(s, d), "doc_id", "text",
            chunkSize = 32, overlap = 0)
          .select(col("doc"), TextOps.langIdMulti(col("chunk_text")).as("lm"))
          .select(col("doc"), col("lm.lang_pred").as("lp"))
        val lc = perChunk.groupBy("doc", "lp").agg(count(lit(1)).as("c"))
        val agg = lc.groupBy("doc").agg(sum("c").as("n_chunks"), count(lit(1)).as("n_langs"))
        val top = lc.groupBy("doc")
          .agg(min(struct((-col("c")).as("nc"), col("lp"))).as("m"))
          .select(col("doc"), col("m.lp").as("top_lang"), (-col("m.nc")).as("topc"))
        agg.join(top, Seq("doc"))
          .select(col("doc"), col("n_chunks"), col("n_langs"), col("top_lang"),
            round(col("topc").cast("double") / col("n_chunks"), 4).as("consistency"),
            (col("n_langs") > 1).as("mixed"))
          .orderBy("doc")
    },

    // ── Language-ID confidence margin: top-1 minus top-2 score per doc
    //    — the routing signal (a doc whose best and runner-up languages
    //    score nearly equal shouldn't be hard-routed; margin 0 means
    //    genuinely ambiguous). Oracle ranks the same GENERATED branches
    //    twice; Spark evaluates the classifier expression once per
    //    language column-wise and takes the two largest scores with
    //    greatest()/array_sort — no explode, no window. ──
    QueryDef.sql(
      "text_langid_margin",
      s"""WITH t AS (SELECT doc_id, lower(text) AS tx FROM documents),
         |sc AS (
         |${TextOps.langIdMultiOracleBranches("doc_id", "tx")}),
         |r AS (SELECT doc_id, lang, score,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
         |      FROM sc),
         |top1 AS (SELECT doc_id, CASE WHEN score = 0 THEN 'und' ELSE lang END AS lang_pred,
         |           CAST(score AS BIGINT) AS s1 FROM r WHERE rn = 1),
         |top2 AS (SELECT doc_id, CAST(score AS BIGINT) AS s2 FROM r WHERE rn = 2)
         |SELECT top1.doc_id AS doc, top1.lang_pred, top1.s1 AS best_score,
         |  top1.s1 - top2.s2 AS margin,
         |  top1.s1 - top2.s2 <= 1 AS ambiguous
         |FROM top1 JOIN top2 USING (doc_id) ORDER BY doc""".stripMargin) {
      (s, d) =>
        // per-language scores as columns, then the top-2 via one sorted
        // array expression — per-row, no explode, no window
        val tx = lower(col("text"))
        val scoreCols = TextOps.langProfiles.map { case (lang, grams) =>
          val cnt = grams.map(g =>
            ((length(tx) - length(regexp_replace(tx, java.util.regex.Pattern.quote(g), ""))) /
              lit(g.codePointCount(0, g.length))).cast("long"))
            .reduce(_ + _)
          struct(cnt.as("score"), lit(lang).as("lang"))
        }
        Tables.documents(s, d)
          .select(col("doc_id").as("doc"),
            array_sort(array(scoreCols: _*),
              (a, b) => when(a.getField("score") > b.getField("score"), -1)
                .when(a.getField("score") < b.getField("score"), 1)
                .when(a.getField("lang") < b.getField("lang"), -1)
                .when(a.getField("lang") > b.getField("lang"), 1)
                .otherwise(0)).as("ranked"))
          .select(col("doc"),
            when(element_at(col("ranked"), 1).getField("score") === 0, lit("und"))
              .otherwise(element_at(col("ranked"), 1).getField("lang")).as("lang_pred"),
            element_at(col("ranked"), 1).getField("score").as("best_score"),
            (element_at(col("ranked"), 1).getField("score") -
              element_at(col("ranked"), 2).getField("score")).as("margin"))
          .withColumn("ambiguous", col("margin") <= 1)
          .orderBy("doc")
    },

    // ── Per-DETECTED-language corpus profile — the grouping the
    //    temperature-mix sampler consumes, now over a real multi-class
    //    classifier instead of the labeled metadata column. ──
    QueryDef.sql(
      "corpus_langid_profile",
      s"""WITH t AS (SELECT doc_id, lower(text) AS tx FROM documents),
         |sc AS (
         |${TextOps.langIdMultiOracleBranches("doc_id", "tx")}),
         |r AS (SELECT doc_id, lang, score,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang) AS rn
         |      FROM sc),
         |p AS (SELECT doc_id, CASE WHEN score = 0 THEN 'und' ELSE lang END AS lang_pred, score
         |      FROM r WHERE rn = 1)
         |SELECT lang_pred, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(avg(CAST(score AS DOUBLE)), 4) AS avg_score
         |FROM p GROUP BY 1 ORDER BY lang_pred""".stripMargin) {
      (s, d) =>
        // extract fields in a SEPARATE cheap projection: grouping and agg
        // expressions that reach into the struct directly make the
        // aggregate re-evaluate the expensive classifier per reference
        // (measured 1.9 s vs 0.4 s at sf0.1)
        Tables.documents(s, d)
          .select(TextOps.langIdMulti(col("text")).as("lm"))
          .select(col("lm.lang_pred").as("lang_pred"),
            col("lm.score").cast("double").as("score"))
          .groupBy("lang_pred")
          .agg(count(lit(1)).as("n_docs"),
            round(avg(col("score")), 4).as("avg_score"))
          .orderBy("lang_pred")
    },

    // ── Document fingerprint: hash of the sorted distinct token set
    //    (bag-normalized content fingerprint for near-dup bucketing). ──
    QueryDef.sql(
      "text_fingerprint",
      """SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(list_filter(string_split(trim(text), ' '), w -> w <> ''))), ' ')) AS fingerprint
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        Tables.documents(s, d)
          .select(col("doc_id"),
            md5(concat_ws(" ", array_sort(array_distinct(wordsCol)))).as("fingerprint"))
          .orderBy("doc_id")
    },

    // ── Composite cleaning pipeline: language gate → quality gate →
    //    exact dedup, one declarative plan (the operators compose without
    //    materialization barriers: Catalyst fuses the gates into the scan
    //    and only the dedup groupBy shuffles — one exchange total). ──
    QueryDef.sql(
      "pipeline_clean_corpus",
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id, text, len(ws) AS n_tokens,
        |    len(list_filter(ws, w -> w IN ('the','a','of','and'))) AS n_en,
        |    round(CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        |      / nullif(len(ws), 0), 4) AS sr
        |  FROM toks),
        |kept AS (
        |  SELECT doc_id, text, n_tokens FROM feat
        |  WHERE n_en >= 2 AND n_tokens >= 5 AND sr <= 0.5)
        |SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS group_size,
        |  CAST(MIN(n_tokens) AS BIGINT) AS n_tokens,
        |  md5(text) AS content_hash
        |FROM kept GROUP BY md5(text)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val stops = Seq("the", "a", "of", "and", "to", "in", "is")
        val (n, _, sr) = TextOps.qualityMetrics(col("ws"), stops)
        Tables.documents(s, d)
          .select(col("doc_id"), col("text"), wordsCol.as("ws"))
          .select(col("doc_id"), col("text"), n.as("n_tokens"),
            TextOps.langIdEn(col("ws"), Seq("the", "a", "of", "and"), minHits = 2).as("plang"),
            sr.as("sr"))
          .filter(col("plang") === "en" && col("n_tokens") >= 5 && col("sr") <= 0.5)
          .groupBy(md5(col("text")).as("content_hash"))
          .agg(min("doc_id").cast("long").as("doc_id"),
            count(lit(1)).cast("long").as("group_size"),
            min("n_tokens").cast("long").as("n_tokens"))
          .select(col("doc_id"), col("group_size"), col("n_tokens"), col("content_hash"))
          .orderBy("doc_id")
    },

    // ── Capstone composition — the corpus build a trainer consumes, as
    //    ONE declarative plan: quality gates → exact dedup (min doc per
    //    content hash) → deterministic 60% content sample → shard →
    //    sequence packing. Every stage reuses an operator with its own
    //    oracle-pinned query; this pins their COMPOSITION (gates fuse
    //    into the scan, one shuffle for the dedup groupBy, one for the
    //    per-shard pack window). ──
    QueryDef.sql(
      "pipeline_corpus_build",
      """WITH toks AS (
        |  SELECT doc_id, text,
        |    list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws
        |  FROM documents),
        |feat AS (
        |  SELECT doc_id, text, len(ws) AS n_tokens,
        |    len(list_filter(ws, w -> w IN ('the','a','of','and'))) AS n_en,
        |    round(CAST(len(list_filter(ws, w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        |      / nullif(len(ws), 0), 4) AS sr
        |  FROM toks),
        |kept AS (
        |  SELECT doc_id, text, n_tokens FROM feat
        |  WHERE n_en >= 2 AND n_tokens >= 5 AND sr <= 0.5),
        |dedup AS (
        |  SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, min(text) AS text,
        |    CAST(min(n_tokens) AS BIGINT) AS n_tokens
        |  FROM kept GROUP BY md5(text)),
        |f AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(list_sum([ (strpos('0123456789abcdef', substr(md5(text),1,8)[i]) - 1)
        |                    * power(16, 8 - i) for i in range(1,9) ]) AS BIGINT) AS fold
        |  FROM dedup),
        |samp AS (SELECT doc_id, n_tokens, CAST(fold % 8 AS INTEGER) AS shard
        |         FROM f WHERE fold % 1000 < 600),
        |packed AS (
        |  SELECT shard, doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens AS BIGINT) AS tok_start
        |  FROM samp)
        |SELECT shard, doc_id, n_tokens, tok_start,
        |  tok_start // 256 AS pack_first,
        |  greatest(tok_start + n_tokens - 1, tok_start) // 256 AS pack_last
        |FROM packed ORDER BY shard, doc_id""".stripMargin) {
      (s, d) =>
        val stops = Seq("the", "a", "of", "and", "to", "in", "is")
        val (n, _, sr) = TextOps.qualityMetrics(col("ws"), stops)
        val cleaned = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), wordsCol.as("ws"))
          .select(col("doc_id"), col("text"), n.as("n_tokens"),
            TextOps.langIdEn(col("ws"), Seq("the", "a", "of", "and"), minHits = 2).as("plang"),
            sr.as("sr"))
          .filter(col("plang") === "en" && col("n_tokens") >= 5 && col("sr") <= 0.5)
          .groupBy(md5(col("text")).as("content_hash"))
          .agg(min("doc_id").cast("long").as("doc_id"), min("text").as("text"),
            min("n_tokens").cast("long").as("n_tokens"))
        Sharding.packSequences(
            Sharding.sampleByHash(cleaned, "text", permille = 600),
            "doc_id", "n_tokens", keyCol = "text", nShards = 8, seqLen = 256)
          .select("shard", "doc_id", "n_tokens", "tok_start", "pack_first", "pack_last")
          .orderBy("shard", "doc_id")
    },

    // ── Brute-force cosine top-k against a query vector (the ANN
    //    baseline; LSH-bucketed variant in graft.operators.Similarity).
    //    Query side is one broadcast row; scan side is one pass. ──
    QueryDef.sql(
      "sim_cosine_topk",
      """WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
        |u AS (SELECT e.vec_id,
        |        unnest(e.embedding) AS x, unnest(q.qvec) AS y
        |      FROM embeddings e, q WHERE e.vec_id <> 0),
        |s AS (SELECT vec_id,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |      FROM u GROUP BY vec_id)
        |SELECT vec_id, round(dot / sqrt(na * nb), 4) AS cos_sim
        |FROM s WHERE na * nb > 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin) {
      (s, d) =>
        // Similarity.cosineTopK: native codegen'd CosineSim (NULL on zero
        // norm — the same degenerate-vector guard as the oracle's
        // na*nb > 0), broadcast query row, TakeOrderedAndProject top-k.
        val emb = Tables.embeddings(s, d)
        Similarity.cosineTopK(
          emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          query = emb.filter(col("vec_id") === 0), k = 20)
    },

    // ── "More like these": retrieval from a SET of positive examples —
    //    the curation gesture (mark 5 good docs, pull the nearest
    //    neighbors of their mean). The centroid is the kmeans dyadic
    //    idiom: per-dim quantized-long sums, ONE truncating division by
    //    n, float-cast (IEEE round-to-nearest on both engines) — so the
    //    query vector is bit-identical cross-engine and the rest is the
    //    standard broadcast-query cosine scan, seeds excluded. ──
    QueryDef.sql(
      "sim_morelikethese",
      """WITH u AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i, unnest(embedding) AS x
        |           FROM embeddings WHERE vec_id IN (0, 10, 20, 30, 40)),
        |cq AS (SELECT i,
        |         CAST(CAST(sum(CAST(round(CAST(x AS DOUBLE) * 4294967296.0) AS BIGINT)) // 5
        |              AS DOUBLE) / 4294967296.0 AS FLOAT) AS y
        |       FROM u GROUP BY i),
        |v AS (SELECT e.vec_id, generate_subscripts(e.embedding, 1) AS i, unnest(e.embedding) AS x
        |      FROM embeddings e WHERE e.vec_id NOT IN (0, 10, 20, 30, 40)),
        |s AS (SELECT v.vec_id,
        |        sum(CAST(v.x AS DOUBLE) * CAST(cq.y AS DOUBLE)) AS dot,
        |        sum(CAST(v.x AS DOUBLE) * CAST(v.x AS DOUBLE)) AS na,
        |        sum(CAST(cq.y AS DOUBLE) * CAST(cq.y AS DOUBLE)) AS nb
        |      FROM v JOIN cq USING (i) GROUP BY v.vec_id)
        |SELECT vec_id, round(dot / sqrt(na * nb), 4) AS cos_sim
        |FROM s WHERE na * nb > 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 15""".stripMargin) {
      (s, d) =>
        val seedIds = Seq(0L, 10L, 20L, 30L, 40L)
        val emb = Tables.embeddings(s, d)
        val arrs = emb.filter(col("vec_id").isin(seedIds: _*))
          .select(col("embedding").cast("array<float>"))
          .collect().map(_.getSeq[Float](0))
        require(arrs.nonEmpty, "no seed vectors found")
        val centroid =
          graft.operators.KMeans.dyadicMeanFloat(arrs.toSeq).toSeq
        val s2 = s
        import s2.implicits._
        val qdf = Seq((-1L, centroid)).toDF("vec_id", "embedding")
        Similarity.cosineTopK(
          emb.filter(!col("vec_id").isin(seedIds: _*)), "vec_id", "embedding",
          query = qdf, k = 15)
    },

    // ── MaxSim late-interaction top-k (ColBERT shape): doc + query as 8
    //    sub-vectors of 8 dims; score = Σ over query tokens of the best
    //    doc-token cosine. The per-token maxes sum as SCALED INTEGERS
    //    (round(max·10⁴)) closed by one division — a raw double sum is
    //    addition-order-dependent and the oracle's hash-agg emission
    //    order is not Spark's; the integer sum is order-free. ──
    QueryDef.sql(
      "sim_maxsim_topk",
      """WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
        |tj AS (SELECT e.vec_id, tt.t, jj.j,
        |         list_slice(q.qvec, tt.t * 8 + 1, tt.t * 8 + 8) AS qs,
        |         list_slice(e.embedding, jj.j * 8 + 1, jj.j * 8 + 8) AS ds
        |       FROM embeddings e, q,
        |         (SELECT unnest(range(0, 8)) AS t) tt,
        |         (SELECT unnest(range(0, 8)) AS j) jj
        |       WHERE e.vec_id <> 0),
        |u AS (SELECT vec_id, t, j, unnest(ds) AS x, unnest(qs) AS y FROM tj),
        |c AS (SELECT vec_id, t, j,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |      FROM u GROUP BY 1, 2, 3),
        |mx AS (SELECT vec_id, t, max(dot / sqrt(na * nb)) AS mc
        |       FROM c WHERE na * nb > 0 GROUP BY 1, 2),
        |s AS (SELECT vec_id, sum(round(mc * 10000)) AS sc FROM mx GROUP BY 1)
        |SELECT e.vec_id, coalesce(s.sc, 0) / 10000.0 AS maxsim
        |FROM (SELECT vec_id FROM embeddings WHERE vec_id <> 0) e
        |LEFT JOIN s ON s.vec_id = e.vec_id
        |ORDER BY maxsim DESC, e.vec_id LIMIT 20""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        Similarity.maxSimTopK(
          emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          query = emb.filter(col("vec_id") === 0), dims = 64, m = 8, k = 20)
    },

    // ── SQ8-quantized cosine top-k: the billion-vector scan format
    //    (int8 lattice, 4× less IO; per-vector scale cancels in cosine).
    //    The oracle reproduces the lattice exactly — round(x) is
    //    floor(x+0.5) on both engines, and every sum over the lattice is
    //    an exact integer in double, so the hash compare is bit-safe. ──
    QueryDef.sql(
      "sim_cosine_topk_int8",
      """WITH z AS (SELECT vec_id, embedding,
        |        list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS maxabs
        |      FROM embeddings),
        |qz AS (SELECT vec_id,
        |        CASE WHEN maxabs > 0 THEN
        |          [GREATEST(-127.0, LEAST(127.0, FLOOR(127.0 * CAST(x AS DOUBLE) / maxabs + 0.5))) for x in embedding]
        |        ELSE [0.0 * CAST(x AS DOUBLE) for x in embedding] END AS q
        |      FROM z),
        |qq AS (SELECT q AS qv FROM qz WHERE vec_id = 0),
        |u AS (SELECT e.vec_id, unnest(e.q) AS x, unnest(qq.qv) AS y
        |      FROM qz e, qq WHERE e.vec_id <> 0),
        |s AS (SELECT vec_id, sum(x * y) AS dot, sum(x * x) AS na, sum(y * y) AS nb
        |      FROM u GROUP BY vec_id)
        |SELECT vec_id, round(dot / sqrt(na * nb), 4) AS cos_sim
        |FROM s WHERE na > 0 AND nb > 0
        |ORDER BY cos_sim DESC, vec_id LIMIT 20""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        Similarity.cosineTopKQuantized(
          emb.filter(col("vec_id") =!= 0), "vec_id", "embedding",
          query = emb.filter(col("vec_id") === 0), k = 20)
    },

    // ── SQ8 quantization recall: |int8-lattice top-20 ∩ exact-cosine
    //    top-20|/20 — completes the three-tier approximation-quality
    //    family (IVF cells: sim_ann_recall; PQ codes: sim_pq_recall;
    //    SQ8 lattice: here). SQ8's O(1/127) per-coordinate perturbation
    //    should cost little recall at k=20 — now measured, not assumed. ──
    QueryDef.sql(
      "sim_sq8_recall",
      """WITH z AS (SELECT vec_id, embedding,
        |        list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS maxabs
        |      FROM embeddings),
        |qz AS (SELECT vec_id,
        |        CASE WHEN maxabs > 0 THEN
        |          [GREATEST(-127.0, LEAST(127.0, FLOOR(127.0 * CAST(x AS DOUBLE) / maxabs + 0.5))) for x in embedding]
        |        ELSE [0.0 * CAST(x AS DOUBLE) for x in embedding] END AS q
        |      FROM z),
        |qq AS (SELECT q AS qv FROM qz WHERE vec_id = 0),
        |u AS (SELECT e.vec_id, unnest(e.q) AS x, unnest(qq.qv) AS y
        |      FROM qz e, qq WHERE e.vec_id <> 0),
        |s AS (SELECT vec_id, sum(x * y) AS dot, sum(x * x) AS na, sum(y * y) AS nb
        |      FROM u GROUP BY vec_id),
        |qtop AS (SELECT vec_id FROM (
        |           SELECT vec_id, round(dot / sqrt(na * nb), 4) AS cs FROM s WHERE na > 0 AND nb > 0
        |           ORDER BY cs DESC, vec_id LIMIT 20)),
        |qf AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
        |uf AS (SELECT e.vec_id, unnest(e.embedding) AS x, unnest(qf.qe) AS y
        |       FROM embeddings e, qf WHERE e.vec_id <> 0),
        |sf AS (SELECT vec_id,
        |         sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |         sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |         sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |       FROM uf GROUP BY vec_id),
        |exact AS (SELECT vec_id FROM (
        |            SELECT vec_id, round(dot / sqrt(na * nb), 4) AS cs FROM sf WHERE na * nb > 0
        |            ORDER BY cs DESC, vec_id LIMIT 20))
        |SELECT CAST(20 AS BIGINT) AS k,
        |  CAST(count(q.vec_id) AS BIGINT) AS n_overlap,
        |  round(count(q.vec_id) / 20.0, 4) AS recall
        |FROM exact e LEFT JOIN qtop q ON q.vec_id = e.vec_id""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        val corpus = emb.filter(col("vec_id") =!= 0)
        val query = emb.filter(col("vec_id") === 0)
        val q8 = Similarity.cosineTopKQuantized(corpus, "vec_id", "embedding", query, k = 20)
          .select(col("vec_id").as("q8_hit"))
        val exact = Similarity.cosineTopK(corpus, "vec_id", "embedding", query, k = 20)
          .select("vec_id")
        exact.join(q8, exact("vec_id") === q8("q8_hit"), "left_outer")
          .agg(lit(20L).as("k"),
            count(col("q8_hit")).as("n_overlap"),
            round(count(col("q8_hit")).cast("double") / 20.0, 4).as("recall"))
    },

    // ── Composed end-to-end cleaning pipeline (the text-side analogue
    //    of engine_ingest_e2e): normalize → exact-dedup survivors →
    //    Gopher gate → per-language yield profile, ONE Spark plan with
    //    ONE full DuckDB oracle. Pins that the operators compose —
    //    dedup keys on the NORMALIZED text (the reason normalize runs
    //    first), the gate reads the survivor frame, and the profile is
    //    a partial-agg groupBy on lang. mean_kept_words divides two
    //    exact integer sums (no double-summation order drift). ──
    QueryDef.sql(
      "pipeline_clean_e2e",
      """WITH n AS (
        |  SELECT doc_id, lang,
        |    trim(regexp_replace(lower(nfc_normalize(regexp_replace(text, '<[^>]*>', ' ', 'g'))), '\s+', ' ', 'g')) AS t
        |  FROM documents),
        |k AS (SELECT min(doc_id) AS doc_id FROM n GROUP BY md5(t)),
        |s AS (SELECT n.* FROM n JOIN k USING (doc_id)),
        |m AS (
        |  SELECT lang, t,
        |    list_filter(string_split(trim(t), ' '), w -> w <> '') AS ws,
        |    string_split(t, chr(10)) AS ls
        |  FROM s),
        |b AS (
        |  SELECT lang, len(ws) AS n,
        |    len(ws) >= 50 AND len(ws) <= 100000
        |    AND coalesce(CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE)
        |          / nullif(len(ws), 0) BETWEEN 3.0 AND 10.0, false)
        |    AND coalesce((CAST(length(t) - length(replace(t, '#', '')) AS DOUBLE)
        |          + CAST(length(t) - length(replace(t, '...', '')) AS DOUBLE) / 3.0)
        |          / nullif(len(ws), 0) <= 0.1, false)
        |    AND CAST(len(list_filter(ls, l -> left(ltrim(l), 1) IN ('-', '*'))) AS DOUBLE)
        |          / len(ls) <= 0.9
        |    AND CAST(len(list_filter(ls, l -> right(l, 3) = '...')) AS DOUBLE)
        |          / len(ls) <= 0.3
        |    AND coalesce(CAST(len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS DOUBLE)
        |          / nullif(len(ws), 0) >= 0.8, false)
        |    AND len(list_filter(['the','be','to','of','and','that','have','with'],
        |          s2 -> list_contains(ws, s2))) >= 2 AS keep
        |  FROM m)
        |SELECT lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  round(CAST(sum(CASE WHEN keep THEN n ELSE 0 END) AS DOUBLE)
        |    / nullif(sum(CASE WHEN keep THEN 1 ELSE 0 END), 0), 4) AS mean_kept_words
        |FROM b GROUP BY lang ORDER BY lang NULLS LAST""".stripMargin) {
      (s, d) =>
        val n = Tables.documents(s, d).select(col("doc_id"), col("lang"),
          TextOps.normalize(col("text"), stripHtml = true).as("t"))
        val keepers = n.groupBy(md5(col("t"))).agg(min("doc_id").as("doc_id"))
          .select("doc_id")
        val survivors = n.join(keepers, Seq("doc_id"), "left_semi")
        survivors.select(col("lang"), TextOps.gopherFilters(col("t")).as("q"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("q.keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("q.keep"), col("q.n_words")).otherwise(0L)).as("_sw"))
          .select(col("lang"), col("n_docs"), col("n_kept"),
            round(col("_sw").cast("double") /
              when(col("n_kept") === 0L, lit(null)).otherwise(col("n_kept")), 4)
              .as("mean_kept_words"))
          .orderBy(asc_nulls_last("lang"))
    },

    // ── Hybrid retrieval (retrieve-then-rerank, the RAG/eval shape):
    //    BM25 top-50 lexical candidates re-ranked by embedding cosine
    //    against the vec_id-0 query vector. At sf0.1 the embedding
    //    table covers only part of the corpus, so the null-cos_sim
    //    lexical-only path is exercised for real: those docs keep
    //    their BM25 standing below every reranked doc (nulls last)
    //    instead of vanishing. Candidates broadcast into the one pass
    //    over embeddings; the ≤50-row cosine frame broadcasts back. ──
    QueryDef.sql(
      "text_hybrid_retrieval",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |bse AS (SELECT doc_id, CAST(len(ws) AS DOUBLE) AS len,
        |          CAST(len(list_filter(ws, w -> w = 'vector')) AS DOUBLE) AS tf0,
        |          CAST(len(list_filter(ws, w -> w = 'stream')) AS DOUBLE) AS tf1,
        |          CAST(len(list_filter(ws, w -> w = 'join')) AS DOUBLE) AS tf2
        |        FROM t),
        |st AS (SELECT CAST(count(*) AS DOUBLE) AS n, avg(len) AS avgl,
        |          sum(CASE WHEN tf0 > 0 THEN 1.0 ELSE 0.0 END) AS df0,
        |          sum(CASE WHEN tf1 > 0 THEN 1.0 ELSE 0.0 END) AS df1,
        |          sum(CASE WHEN tf2 > 0 THEN 1.0 ELSE 0.0 END) AS df2
        |        FROM bse),
        |sc AS (SELECT doc_id, CAST(len AS BIGINT) AS n_tokens,
        |        round(
        |          (n - df0 + 0.5) / (df0 + 0.5) * (tf0 * (1.2 + 1.0)) / (tf0 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgl))
        |        + (n - df1 + 0.5) / (df1 + 0.5) * (tf1 * (1.2 + 1.0)) / (tf1 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgl))
        |        + (n - df2 + 0.5) / (df2 + 0.5) * (tf2 * (1.2 + 1.0)) / (tf2 + 1.2 * (1.0 - 0.75 + 0.75 * len / avgl))
        |        , 4) AS score
        |       FROM bse, st),
        |cand AS (SELECT doc_id AS doc, n_tokens, score FROM sc WHERE score > 0
        |         ORDER BY score DESC, doc LIMIT 50),
        |q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
        |u AS (SELECT c.doc, unnest(e.embedding) AS x, unnest(q.qvec) AS y
        |      FROM cand c JOIN embeddings e ON e.vec_id = c.doc, q),
        |s2 AS (SELECT doc,
        |        sum(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)) AS dot,
        |        sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) AS na,
        |        sum(CAST(y AS DOUBLE) * CAST(y AS DOUBLE)) AS nb
        |      FROM u GROUP BY doc)
        |SELECT c.doc, c.n_tokens, c.score,
        |  CASE WHEN s2.na * s2.nb > 0 THEN round(s2.dot / sqrt(s2.na * s2.nb), 4) END AS cos_sim
        |FROM cand c LEFT JOIN s2 USING (doc)
        |ORDER BY cos_sim DESC NULLS LAST, score DESC, doc LIMIT 10""".stripMargin) {
      (s, d) =>
        val emb = Tables.embeddings(s, d)
        TextOps.hybridRetrievalTopK(
          Tables.documents(s, d), "doc_id", "text",
          terms = Seq("vector", "stream", "join"),
          emb = emb, embIdCol = "vec_id", embCol = "embedding",
          query = emb.filter(col("vec_id") === 0),
          kCand = 50, k = 10)
    },

    // ── URL/domain profile (the web-corpus URL-filtering stage). The
    //    corpus has no URLs, so — redact_pii precedent — both engines
    //    append the SAME deterministic URLs: a doc_id-derived shard host
    //    plus a 1-in-7 blocklisted tracker / 6-in-7 benign host, giving
    //    a hot domain (6/7 of all docs), a blocked suffix-match case
    //    (ads.tracker.net vs blocklist entry tracker.net), and 39 cold
    //    shard hosts. Distinct-doc counts via (domain, doc) dedup +
    //    plain count — no count-distinct Expand. ──
    QueryDef.sql(
      "text_url_domains",
      """WITH t AS (SELECT doc_id, lower(coalesce(text, '') || ' see http://w' || (doc_id % 13)
        |    || '.shard' || (doc_id % 3) || '.example.com/p and '
        |    || CASE WHEN doc_id % 7 = 0 THEN 'https://ads.tracker.net/x?q=1'
        |            ELSE 'http://docs.open-data.org/y' END) AS tx FROM documents),
        |u AS (SELECT doc_id, unnest(regexp_extract_all(tx, 'https?://([a-z0-9.-]+)', 1)) AS domain FROM t),
        |a AS (SELECT domain, count(*) AS n_urls FROM u GROUP BY domain),
        |b AS (SELECT domain, count(*) AS n_docs
        |      FROM (SELECT DISTINCT domain, doc_id FROM u) GROUP BY domain)
        |SELECT a.domain, a.n_urls, b.n_docs,
        |  (a.domain = 'tracker.net' OR a.domain LIKE '%.tracker.net') AS blocked
        |FROM a JOIN b USING (domain)
        |ORDER BY n_urls DESC, domain LIMIT 25""".stripMargin) {
      (s, d) =>
        val raw = concat(
          coalesce(col("text"), lit("")), lit(" see http://w"),
          (col("doc_id") % 13).cast("string"), lit(".shard"),
          (col("doc_id") % 3).cast("string"), lit(".example.com/p and "),
          when(col("doc_id") % 7 === 0, lit("https://ads.tracker.net/x?q=1"))
            .otherwise(lit("http://docs.open-data.org/y")))
        TextOps.urlDomainProfile(
          Tables.documents(s, d).select(col("doc_id"), raw.as("text")),
          "doc_id", "text", blocklist = Seq("tracker.net"))
          .orderBy(desc("n_urls"), asc("domain")).limit(25)
    },

    // ── Linear bag-of-words quality classifier (the learned-filter
    //    gate). INTEGER permille weights → exact long accumulation; ONE
    //    closing division of exact operands (IEEE-identical on both
    //    engines) and NO decimal round — round(x,4) flips halfway cases
    //    (0.03525 → 0.0353 Java HALF_UP vs 0.0352 DuckDB, measured). ──
    QueryDef.sql(
      "text_classifier_score",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |v(w, wt) AS (VALUES ('vector', 400), ('stream', 300), ('query', 250), ('data', 200),
        |             ('join', 150), ('the', -50), ('a', -20), ('slow', -350)),
        |e AS (SELECT doc_id, unnest(ws) AS w FROM t),
        |h AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits, CAST(sum(wt) AS BIGINT) AS raw
        |      FROM e JOIN v USING (w) GROUP BY doc_id),
        |sc AS (SELECT t.doc_id AS doc, CAST(len(t.ws) AS BIGINT) AS n_tokens,
        |        coalesce(h.n_hits, 0) AS n_hits,
        |        coalesce(h.raw, 0) AS raw_permille,
        |        coalesce(h.raw, 0) /
        |          (CASE WHEN len(t.ws) = 0 THEN NULL ELSE len(t.ws) END * 1000.0) AS score
        |       FROM t LEFT JOIN h ON h.doc_id = t.doc_id)
        |SELECT doc, n_tokens, n_hits, raw_permille, score, coalesce(score >= 0.02, false) AS keep
        |FROM sc ORDER BY doc""".stripMargin) {
      (s, d) =>
        TextOps.classifierScore(Tables.documents(s, d), "doc_id", "text",
          weightsPermille = Map(
            "vector" -> 400L, "stream" -> 300L, "query" -> 250L, "data" -> 200L,
            "join" -> 150L, "the" -> -50L, "a" -> -20L, "slow" -> -350L),
          threshold = 0.02)
          .orderBy("doc")
    },

    // ── Classifier CALIBRATION: score bins vs observed label rate — the
    //    reliability diagram every deployed quality filter needs (a
    //    monotone pos_frac over bins means the score ranks; a flat one
    //    means the threshold is theater). Binning stays integer: score
    //    per token in permille spt = raw·1000 div n_tokens (both engines
    //    truncate integer division toward zero — the kmeans-measured
    //    semantics), width-25 bins clamped to ±12; ONE closing division
    //    per bin row. Label = 'en' (the DSIR target), so this also reads
    //    as "does the keyword score predict the DSIR target". ──
    QueryDef.sql(
      "text_classifier_calibration",
      """WITH t AS (SELECT doc_id, coalesce(lang = 'en', false) AS is_pos,
        |             list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |v(w, wt) AS (VALUES ('vector', 400), ('stream', 300), ('query', 250), ('data', 200),
        |             ('join', 150), ('the', -50), ('a', -20), ('slow', -350)),
        |e AS (SELECT doc_id, unnest(ws) AS w FROM t),
        |h AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS raw FROM e JOIN v USING (w) GROUP BY doc_id),
        |sc AS (SELECT t.doc_id, t.is_pos, CAST(len(t.ws) AS BIGINT) AS n_tokens,
        |         coalesce(h.raw, 0) AS raw FROM t LEFT JOIN h USING (doc_id)
        |       WHERE len(t.ws) > 0),
        |b AS (SELECT doc_id, is_pos,
        |        greatest(-12, least(12, (raw * 1000 // n_tokens) // 25)) AS bin FROM sc)
        |SELECT CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |  round(sum(CASE WHEN is_pos THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS pos_frac
        |FROM b GROUP BY bin ORDER BY bin""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val scored = TextOps.classifierScore(docs, "doc_id", "text",
          weightsPermille = Map(
            "vector" -> 400L, "stream" -> 300L, "query" -> 250L, "data" -> 200L,
            "join" -> 150L, "the" -> -50L, "a" -> -20L, "slow" -> -350L),
          threshold = 0.02)
        val labels = docs.select(col("doc_id").as("doc"),
          coalesce(col("lang") === "en", lit(false)).as("is_pos"))
        scored.join(labels, Seq("doc"))
          .where(col("n_tokens") > 0)
          .withColumn("bin",
            greatest(lit(-12L), least(lit(12L),
              expr("(raw_permille * 1000 div n_tokens) div 25"))))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("is_pos"), 1L).otherwise(0L)).as("n_pos"))
          .withColumn("pos_frac",
            round(col("n_pos").cast("double") / col("n_docs"), 4))
          .orderBy("bin")
    },

    // ── Unigram-LM surprisal gate (perplexity-proxy quality filter).
    //    FP-parity-safe by construction: per-word surprisal is the
    //    INTEGER bit length floor(log2(total div cnt)) via bin() —
    //    identical exact-integer semantics in both engines, no
    //    transcendental — long accumulation, ONE closing division,
    //    score ships unrounded (the classifier doctrine). ──
    QueryDef.sql(
      "text_surprisal_gate",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |e AS (SELECT doc_id, unnest(ws) AS w FROM t),
        |dw AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS occ FROM e GROUP BY doc_id, w),
        |v AS (SELECT w, CAST(sum(occ) AS BIGINT) AS cnt FROM dw GROUP BY w),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v),
        |s AS (SELECT w, CAST(length(bin(total // cnt)) - 1 AS BIGINT) AS bits FROM v, tot),
        |d AS (SELECT dw.doc_id AS doc, CAST(sum(s.bits * dw.occ) AS BIGINT) AS raw_bits,
        |             CAST(sum(dw.occ) AS BIGINT) AS n_tokens
        |      FROM dw JOIN s USING (w) GROUP BY dw.doc_id)
        |SELECT t.doc_id AS doc,
        |  coalesce(d.n_tokens, 0) AS n_tokens,
        |  coalesce(d.raw_bits, 0) AS raw_bits,
        |  coalesce(d.raw_bits, 0) / CAST(CASE WHEN coalesce(d.n_tokens, 0) = 0 THEN NULL
        |                                      ELSE d.n_tokens END AS DOUBLE) AS mean_bits,
        |  coalesce(coalesce(d.raw_bits, 0) / CAST(CASE WHEN coalesce(d.n_tokens, 0) = 0 THEN NULL
        |      ELSE d.n_tokens END AS DOUBLE) BETWEEN 4.01 AND 4.4, false) AS keep
        |FROM t LEFT JOIN d ON d.doc = t.doc_id
        |ORDER BY doc""".stripMargin) {
      (s, d) =>
        TextOps.surprisalScore(Tables.documents(s, d), "doc_id", "text",
          minBits = 4.01, maxBits = 4.4)
          .orderBy("doc")
    },

    // ── HELD-OUT surprisal (the honest perplexity shape): the unigram
    //    LM trains on the EVEN half and scores the ODD half — a model
    //    scoring its own training data under-reads surprisal, and every
    //    real perplexity eval separates the two. Unseen words score as
    //    count-1 events (floor(log2 total), the exact-integer add-one
    //    stand-in). Same integer-bit core and ONE closing division as
    //    the self-scored gate. ──
    QueryDef.sql(
      "text_surprisal_heldout",
      """WITH trn AS (SELECT list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws
        |             FROM documents WHERE doc_id % 2 = 0),
        |v AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
        |      FROM (SELECT unnest(ws) AS w FROM trn) GROUP BY w),
        |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM v),
        |s AS (SELECT w, CAST(length(bin(total // cnt)) - 1 AS BIGINT) AS bits FROM v, tot),
        |t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws
        |      FROM documents WHERE doc_id % 2 = 1),
        |e AS (SELECT doc_id, unnest(ws) AS w FROM t),
        |dw AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS occ FROM e GROUP BY doc_id, w),
        |d AS (SELECT dw.doc_id AS doc,
        |        CAST(sum(coalesce(s.bits, (SELECT length(bin(total)) - 1 FROM tot)) * dw.occ) AS BIGINT) AS raw_bits,
        |        CAST(sum(dw.occ) AS BIGINT) AS n_tokens
        |      FROM dw LEFT JOIN s USING (w) GROUP BY dw.doc_id)
        |SELECT t.doc_id AS doc,
        |  coalesce(d.n_tokens, 0) AS n_tokens,
        |  coalesce(d.raw_bits, 0) AS raw_bits,
        |  coalesce(d.raw_bits, 0) / CAST(CASE WHEN coalesce(d.n_tokens, 0) = 0 THEN NULL
        |                                      ELSE d.n_tokens END AS DOUBLE) AS mean_bits,
        |  coalesce(coalesce(d.raw_bits, 0) / CAST(CASE WHEN coalesce(d.n_tokens, 0) = 0 THEN NULL
        |      ELSE d.n_tokens END AS DOUBLE) BETWEEN 4.01 AND 4.4, false) AS keep
        |FROM t LEFT JOIN d ON d.doc = t.doc_id
        |ORDER BY doc""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val lm = docs.filter(col("doc_id") % 2 === 0)
          .select(explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).cast("long").as("cnt"))
        TextOps.surprisalScore(docs.filter(col("doc_id") % 2 === 1),
            "doc_id", "text", minBits = 4.01, maxBits = 4.4, lm = Some(lm))
          .orderBy("doc")
    },

    // ── The data card: the one-row corpus summary that ships with a
    //    dataset release — sizes, language mix (mode via min(struct)
    //    argmax, no rank window), exact-duplication rate. Every number
    //    is an exact integer or one closing division. ──
    QueryDef.sql(
      "pipeline_data_card",
      """WITH t AS (SELECT doc_id, coalesce(lang, '??') AS lang, text,
        |             len(list_filter(string_split(trim(text), ' '), w -> w <> '')) AS n_toks
        |           FROM documents),
        |base AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |           CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |           CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |           CAST(count(DISTINCT text) AS BIGINT) AS n_unique_texts
        |         FROM t),
        |lc AS (SELECT lang, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY lang),
        |top AS (SELECT lang AS top_lang, c AS top_c FROM lc
        |        ORDER BY c DESC, lang LIMIT 1)
        |SELECT b.n_docs, b.n_tokens, b.n_chars, b.n_langs,
        |  top.top_lang,
        |  round(CAST(top.top_c AS DOUBLE) / b.n_docs, 4) AS top_lang_share,
        |  b.n_docs - b.n_unique_texts AS exact_dup_docs,
        |  round(CAST(b.n_docs - b.n_unique_texts AS DOUBLE) / b.n_docs, 4) AS dup_frac,
        |  round(CAST(b.n_tokens AS DOUBLE) / b.n_docs, 4) AS mean_doc_tokens
        |FROM base b, top""".stripMargin) {
      (s, d) =>
        val t = Tables.documents(s, d).select(col("doc_id"),
          coalesce(col("lang"), lit("??")).as("lang"), col("text"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_toks"))
        // Expand-free distincts: pre-aggregate on the distinct key
        val uniqueTexts = t.groupBy("text").agg(count(lit(1)).as("_c"))
          .agg(count(lit(1)).as("n_unique_texts"))
        val langCounts = t.groupBy("lang").agg(count(lit(1)).as("_c"))
        val nLangs = langCounts.agg(count(lit(1)).as("n_langs"))
        val top = langCounts
          .agg(min(struct((-col("_c")).as("nc"), col("lang"))).as("_m"))
          .select(col("_m.lang").as("top_lang"), (-col("_m.nc")).as("_topc"))
        val base = t.agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
          sum(length(col("text"))).cast("long").as("n_chars"))
        base.crossJoin(nLangs).crossJoin(uniqueTexts).crossJoin(top)
          .select(col("n_docs"), col("n_tokens"), col("n_chars"), col("n_langs"),
            col("top_lang"),
            round(col("_topc").cast("double") / col("n_docs"), 4).as("top_lang_share"),
            (col("n_docs") - col("n_unique_texts")).as("exact_dup_docs"),
            round((col("n_docs") - col("n_unique_texts")).cast("double") / col("n_docs"), 4)
              .as("dup_frac"),
            round(col("n_tokens").cast("double") / col("n_docs"), 4).as("mean_doc_tokens"))
    },

    // ── The cleaning FUNNEL: all four oracled quality gates composed in
    //    pipeline order (gopher rules → classifier → unigram surprisal →
    //    bigram surprisal) with per-language cumulative pass counts —
    //    the attrition report every filtering run ships. One Spark plan:
    //    four per-doc gate frames joined on the doc spine, one groupBy.
    //    Each gate reuses its production operator verbatim, so the
    //    funnel can never drift from the individual gate queries. ──
    QueryDef.sql(
      "pipeline_filter_funnel",
      (FilterGatePrefixSql + """
        
        |SELECT d.lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN g_keep THEN 1 ELSE 0 END) AS BIGINT) AS pass_gopher,
        |  CAST(sum(CASE WHEN g_keep AND c_keep THEN 1 ELSE 0 END) AS BIGINT) AS pass_classifier,
        |  CAST(sum(CASE WHEN g_keep AND c_keep AND s_keep THEN 1 ELSE 0 END) AS BIGINT) AS pass_surprisal,
        |  CAST(sum(CASE WHEN g_keep AND c_keep AND s_keep AND b_keep THEN 1 ELSE 0 END) AS BIGINT) AS pass_bigram
        |FROM docs d
        |JOIN gk USING (doc_id) JOIN ck USING (doc_id)
        |JOIN sk USING (doc_id) JOIN bk USING (doc_id)
        |GROUP BY d.lang ORDER BY lang""".stripMargin)) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val weights = Map(
          "vector" -> 400L, "stream" -> 300L, "query" -> 250L, "data" -> 200L,
          "join" -> 150L, "the" -> -50L, "a" -> -20L, "slow" -> -350L)
        // corpus-calibrated gopher stage: the driver corpus is synthetic
        // (no English function words, median 54 tokens), so the Rae
        // defaults reject every doc at the stopword rule — calibrate the
        // stop list to the corpus's own top words and the word floor to
        // its P10, exactly what a real pipeline does per language.
        val g = docs.select(col("doc_id"),
          coalesce(col("lang"), lit("??")).as("lang"),
          TextOps.gopherFilters(col("text"),
            stopwords = Seq("spark", "window", "merge", "table",
              "column", "vector", "stream", "value"),
            minWords = 20L).getField("keep").as("g_keep"))
        val c = TextOps.classifierScore(docs, "doc_id", "text", weights, threshold = 0.02)
          .select(col("doc").as("doc_id"), col("keep").as("c_keep"))
        val s1 = TextOps.surprisalScore(docs, "doc_id", "text", minBits = 4.01, maxBits = 4.4)
          .select(col("doc").as("doc_id"), col("keep").as("s_keep"))
        val s2 = TextOps.bigramSurprisal(docs, "doc_id", "text", minBits = 4.15, maxBits = 4.45)
          .select(col("doc").as("doc_id"), col("keep").as("b_keep"))
        g.join(c, Seq("doc_id")).join(s1, Seq("doc_id")).join(s2, Seq("doc_id"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("g_keep"), 1L).otherwise(0L)).as("pass_gopher"),
            sum(when(col("g_keep") && col("c_keep"), 1L).otherwise(0L)).as("pass_classifier"),
            sum(when(col("g_keep") && col("c_keep") && col("s_keep"), 1L).otherwise(0L))
              .as("pass_surprisal"),
            sum(when(col("g_keep") && col("c_keep") && col("s_keep") && col("b_keep"), 1L)
              .otherwise(0L)).as("pass_bigram"))
          .orderBy("lang")
    },

    // ── Per-doc drop-reason audit: the FIRST gate that kills each doc,
    //    rolled up to (lang, reason) counts — the "where did my corpus
    //    go" table a filtering run ships next to the funnel. Shares the
    //    funnel's four-gate CTE prefix VERBATIM (one Scala val), so the
    //    two reports cannot disagree about a gate. ──
    QueryDef.sql(
      "pipeline_drop_reasons",
      (FilterGatePrefixSql + """
        |SELECT d.lang,
        |  CASE WHEN NOT g_keep THEN 'gopher'
        |       WHEN NOT c_keep THEN 'classifier'
        |       WHEN NOT s_keep THEN 'surprisal'
        |       WHEN NOT b_keep THEN 'bigram'
        |       ELSE 'kept' END AS reason,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM docs d
        |JOIN gk USING (doc_id) JOIN ck USING (doc_id)
        |JOIN sk USING (doc_id) JOIN bk USING (doc_id)
        |GROUP BY 1, 2 ORDER BY lang, reason""".stripMargin)) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val weights = Map(
          "vector" -> 400L, "stream" -> 300L, "query" -> 250L, "data" -> 200L,
          "join" -> 150L, "the" -> -50L, "a" -> -20L, "slow" -> -350L)
        val g = docs.select(col("doc_id"),
          coalesce(col("lang"), lit("??")).as("lang"),
          TextOps.gopherFilters(col("text"),
            stopwords = Seq("spark", "window", "merge", "table",
              "column", "vector", "stream", "value"),
            minWords = 20L).getField("keep").as("g_keep"))
        val c = TextOps.classifierScore(docs, "doc_id", "text", weights, threshold = 0.02)
          .select(col("doc").as("doc_id"), col("keep").as("c_keep"))
        val s1 = TextOps.surprisalScore(docs, "doc_id", "text", minBits = 4.01, maxBits = 4.4)
          .select(col("doc").as("doc_id"), col("keep").as("s_keep"))
        val s2 = TextOps.bigramSurprisal(docs, "doc_id", "text", minBits = 4.15, maxBits = 4.45)
          .select(col("doc").as("doc_id"), col("keep").as("b_keep"))
        g.join(c, Seq("doc_id")).join(s1, Seq("doc_id")).join(s2, Seq("doc_id"))
          .withColumn("reason",
            when(!col("g_keep"), "gopher")
              .when(!col("c_keep"), "classifier")
              .when(!col("s_keep"), "surprisal")
              .when(!col("b_keep"), "bigram")
              .otherwise("kept"))
          .groupBy("lang", "reason")
          .agg(count(lit(1)).as("n_docs"))
          .orderBy("lang", "reason")
    },

    // ── Bigram-conditional surprisal gate: the second-order LM signal —
    //    a unigram model can't see scrambled word order (same bag of
    //    words ⇒ same unigram surprisal); transitions can. Per
    //    transition bits = floor(log2(ctx(w1) div big(w1,w2))), exact
    //    integers, ONE closing division (surprisal doctrine). Band
    //    [4.15, 4.45] exercises keep and reject at every sf (probed:
    //    medians 4.14–4.33, tails 4.0–5.0). ──
    QueryDef.sql(
      "text_bigram_surprisal",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |e AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2
        |      FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM t WHERE len(ws) >= 2)),
        |bi AS (SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS occ FROM e GROUP BY 1, 2, 3),
        |big AS (SELECT w1, w2, CAST(sum(occ) AS BIGINT) AS big FROM bi GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(big) AS BIGINT) AS ctx FROM big GROUP BY 1),
        |lm AS (SELECT w1, w2, CAST(length(bin(ctx // big)) - 1 AS BIGINT) AS bits
        |       FROM big JOIN ctx USING (w1)),
        |d AS (SELECT bi.doc_id AS doc, CAST(sum(lm.bits * bi.occ) AS BIGINT) AS raw_bits,
        |             CAST(sum(bi.occ) AS BIGINT) AS n
        |      FROM bi JOIN lm USING (w1, w2) GROUP BY 1)
        |SELECT t.doc_id AS doc,
        |  coalesce(d.n, 0) AS n_transitions,
        |  coalesce(d.raw_bits, 0) AS raw_bits,
        |  coalesce(d.raw_bits, 0) / CAST(CASE WHEN coalesce(d.n, 0) = 0 THEN NULL
        |                                      ELSE d.n END AS DOUBLE) AS mean_bits,
        |  coalesce(coalesce(d.raw_bits, 0) / CAST(CASE WHEN coalesce(d.n, 0) = 0 THEN NULL
        |      ELSE d.n END AS DOUBLE) BETWEEN 4.15 AND 4.45, false) AS keep
        |FROM t LEFT JOIN d ON d.doc = t.doc_id
        |ORDER BY doc""".stripMargin) {
      (s, d) =>
        TextOps.bigramSurprisal(Tables.documents(s, d), "doc_id", "text",
            minBits = 4.15, maxBits = 4.45)
          .orderBy("doc")
    },

    // ── Per-language classifier-score percentiles: the calibration
    //    table a threshold gate is tuned against (set the cutoff at a
    //    score quantile, not an absolute). Exact percentile ≡
    //    quantile_cont (linear interpolation both engines); the score
    //    itself is the bit-exact classifier score. ──
    QueryDef.sql(
      "text_quality_percentiles",
      """WITH t AS (SELECT doc_id, coalesce(lang, '??') AS lang,
        |             list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |v(w, wt) AS (VALUES ('vector', 400), ('stream', 300), ('query', 250), ('data', 200),
        |             ('join', 150), ('the', -50), ('a', -20), ('slow', -350)),
        |e AS (SELECT doc_id, unnest(ws) AS w FROM t),
        |h AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS raw FROM e JOIN v USING (w) GROUP BY doc_id),
        |sc AS (SELECT t.lang,
        |        coalesce(h.raw, 0) /
        |          (CASE WHEN len(t.ws) = 0 THEN NULL ELSE len(t.ws) END * 1000.0) AS score
        |       FROM t LEFT JOIN h ON h.doc_id = t.doc_id)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n,
        |  round(CAST(quantile_cont(score, 0.1) AS DOUBLE), 4) AS p10,
        |  round(CAST(quantile_cont(score, 0.5) AS DOUBLE), 4) AS p50,
        |  round(CAST(quantile_cont(score, 0.9) AS DOUBLE), 4) AS p90
        |FROM sc GROUP BY lang ORDER BY lang""".stripMargin) {
      (s, d) =>
        val weights = Map(
          "vector" -> 400L, "stream" -> 300L, "query" -> 250L, "data" -> 200L,
          "join" -> 150L, "the" -> -50L, "a" -> -20L, "slow" -> -350L)
        val scored = TextOps.classifierScore(Tables.documents(s, d), "doc_id", "text",
            weights, threshold = 0.0)
          .select(col("doc").as("doc_id"), col("score"))
        Tables.documents(s, d)
          .select(col("doc_id"), coalesce(col("lang"), lit("??")).as("lang"))
          .join(scored, Seq("doc_id"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            round(expr("percentile(score, 0.1)"), 4).as("p10"),
            round(expr("percentile(score, 0.5)"), 4).as("p50"),
            round(expr("percentile(score, 0.9)"), 4).as("p90"))
          .orderBy("lang")
    },

    // ── Per-language top-fraction quality gate: keep the top 30% of
    //    each language by classifier score. Threshold = exact per-group
    //    percentile (≡ quantile_cont; unrounded — the score doubles are
    //    bit-identical cross-engine, see text_classifier_score), then
    //    one broadcast join + map-side count. NO per-group rank window:
    //    a top-⌈frac·n⌉ cut is O(group)-per-task, a threshold is O(1)
    //    per row at any group size. ──
    QueryDef.sql(
      "pipeline_quality_topfrac",
      """WITH t AS (SELECT d.doc_id, d.lang,
        |        list_filter(string_split(trim(d.text), ' '), w -> w <> '') AS ws FROM documents d),
        |v(w, wt) AS (VALUES ('vector', 400), ('stream', 300), ('query', 250), ('data', 200),
        |             ('join', 150), ('the', -50), ('a', -20), ('slow', -350)),
        |e AS (SELECT doc_id, unnest(ws) AS w FROM t),
        |h AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS raw FROM e JOIN v USING (w) GROUP BY doc_id),
        |sc AS (SELECT t.doc_id, t.lang,
        |        coalesce(h.raw, 0) /
        |          (CASE WHEN len(t.ws) = 0 THEN NULL ELSE len(t.ws) END * 1000.0) AS score
        |       FROM t LEFT JOIN h USING (doc_id)),
        |q AS (SELECT lang, quantile_cont(score, 0.7) AS thr FROM sc GROUP BY lang)
        |SELECT sc.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN sc.score >= q.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  q.thr
        |FROM sc JOIN q USING (lang)
        |GROUP BY sc.lang, q.thr ORDER BY sc.lang""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d)
        val scored = TextOps.classifierScore(docs, "doc_id", "text",
            weightsPermille = Map(
              "vector" -> 400L, "stream" -> 300L, "query" -> 250L, "data" -> 200L,
              "join" -> 150L, "the" -> -50L, "a" -> -20L, "slow" -> -350L),
            threshold = 0.02)
          .join(docs.select(col("doc_id").as("doc"), col("lang")), Seq("doc"))
        scored
          .join(broadcast(Sharding.topFractionThresholds(scored, "lang", "score", frac = 0.3)),
            Seq("lang"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("score") >= col("thr"), 1L).otherwise(0L)).as("n_kept"),
            max("thr").as("thr"))
          .orderBy("lang")
    },

    // ── Blocklist MINING: per-domain corpus-weighted mean classifier
    //    score, low-quality domains flagged — how blocklists are
    //    derived rather than hand-written (closes the urlDomains +
    //    classifierScore loop). Same deterministic URL synthesis as
    //    text_url_domains; the tracker appears only on doc_id % 7 = 0
    //    docs, so its doc population — and mean — genuinely differs
    //    from the hot benign domain. Means are exact long sums with ONE
    //    closing division. ──
    QueryDef.sql(
      "pipeline_domain_quality",
      """WITH t0 AS (SELECT doc_id, lower(coalesce(text, '') || ' see http://w' || (doc_id % 13)
        |    || '.shard' || (doc_id % 3) || '.example.com/p and '
        |    || CASE WHEN doc_id % 7 = 0 THEN 'https://ads.tracker.net/x?q=1'
        |            ELSE 'http://docs.open-data.org/y' END) AS tx FROM documents),
        |t AS (SELECT doc_id, tx, list_filter(string_split(trim(tx), ' '), w -> w <> '') AS ws FROM t0),
        |v(w, wt) AS (VALUES ('vector', 400), ('stream', 300), ('query', 250), ('data', 200),
        |             ('join', 150), ('the', -50), ('a', -20), ('slow', -350)),
        |e AS (SELECT doc_id, unnest(ws) AS w FROM t),
        |h AS (SELECT doc_id, CAST(sum(wt) AS BIGINT) AS raw FROM e JOIN v USING (w) GROUP BY doc_id),
        |sc AS (SELECT t.doc_id, CAST(len(t.ws) AS BIGINT) AS n_tokens, coalesce(h.raw, 0) AS raw
        |       FROM t LEFT JOIN h USING (doc_id)),
        |u AS (SELECT DISTINCT doc_id, unnest(regexp_extract_all(tx, 'https?://([a-z0-9.-]+)', 1)) AS domain FROM t),
        |g AS (SELECT u.domain, CAST(count(*) AS BIGINT) AS n_docs,
        |        CAST(sum(sc.raw) AS BIGINT) AS sraw, CAST(sum(sc.n_tokens) AS BIGINT) AS stoks
        |      FROM u JOIN sc USING (doc_id) GROUP BY u.domain)
        |SELECT domain, n_docs,
        |  sraw / (CASE WHEN stoks = 0 THEN NULL ELSE stoks END * 1000.0) AS mean_score,
        |  coalesce(sraw / (CASE WHEN stoks = 0 THEN NULL ELSE stoks END * 1000.0) < 0.01, false) AS low_quality
        |FROM g ORDER BY mean_score ASC NULLS LAST, domain LIMIT 25""".stripMargin) {
      (s, d) =>
        val raw = lower(concat(
          coalesce(col("text"), lit("")), lit(" see http://w"),
          (col("doc_id") % 13).cast("string"), lit(".shard"),
          (col("doc_id") % 3).cast("string"), lit(".example.com/p and "),
          when(col("doc_id") % 7 === 0, lit("https://ads.tracker.net/x?q=1"))
            .otherwise(lit("http://docs.open-data.org/y"))))
        TextOps.domainQuality(
            Tables.documents(s, d).select(col("doc_id"), raw.as("text")),
            "doc_id", "text",
            weightsPermille = Map(
              "vector" -> 400L, "stream" -> 300L, "query" -> 250L, "data" -> 200L,
              "join" -> 150L, "the" -> -50L, "a" -> -20L, "slow" -> -350L),
            minScore = 0.01)
          .orderBy(asc_nulls_last("mean_score"), asc("domain")).limit(25)
    },

    // ── Gopher character-mass repetition signals: chars in the heaviest
    //    2-gram + chars across duplicated 5-grams, over raw text length.
    //    Exact integer numerators, ONE unrounded closing division. ──
    QueryDef.sql(
      "text_rep_signals",
      """WITH t AS (SELECT doc_id, text, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |g2 AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
        |         THEN [array_to_string(list_slice(ws, j, j + 1), ' ') for j in range(1, len(ws))]
        |         ELSE CAST([] AS VARCHAR[]) END) AS g FROM t),
        |c2 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM g2 GROUP BY doc_id, g),
        |t2 AS (SELECT doc_id, max(c * length(g)) AS topchars FROM c2 GROUP BY doc_id),
        |g5 AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 5
        |         THEN [array_to_string(list_slice(ws, j, j + 4), ' ') for j in range(1, len(ws) - 3)]
        |         ELSE CAST([] AS VARCHAR[]) END) AS g FROM t),
        |c5 AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c FROM g5 GROUP BY doc_id, g),
        |d5 AS (SELECT doc_id, CAST(sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END) AS BIGINT) AS dupchars
        |       FROM c5 GROUP BY doc_id)
        |SELECT t.doc_id AS doc, CAST(length(t.text) AS BIGINT) AS n_chars,
        |  coalesce(t2.topchars, 0) /
        |    (CASE WHEN length(t.text) = 0 THEN NULL ELSE length(t.text) END * 1.0) AS top_char_frac,
        |  coalesce(d5.dupchars, 0) /
        |    (CASE WHEN length(t.text) = 0 THEN NULL ELSE length(t.text) END * 1.0) AS dup_char_frac
        |FROM t LEFT JOIN t2 USING (doc_id) LEFT JOIN d5 USING (doc_id)
        |ORDER BY doc""".stripMargin) {
      (s, d) =>
        TextOps.repetitionSignals(Tables.documents(s, d), "doc_id", "text", topN = 2, dupN = 5)
          .orderBy("doc")
    },

    // ── HyperLogLog register frame over distinct document bodies — the
    //    mergeable distinct-count sketch, pinned bit-for-bit: registers
    //    derive from md5 hex digits through integer CASE arithmetic only
    //    (Sketches.hllBucket/hllRho), so DuckDB reproduces every one of
    //    the 256 rows. The key is the DOC BODY — "how many unique
    //    documents" is the dedup-planning cardinality. count(DISTINCT)
    //    shuffles every distinct value; at
    //    100 TB this frame is 256 rows no matter the corpus, collapsed
    //    map-side by partial agg. Empty buckets surface as register 0
    //    (dropping them is the classic HLL estimate bug). ──
    QueryDef.sql(
      "corpus_hll_registers",
      """WITH h AS (SELECT DISTINCT text AS w FROM documents WHERE text IS NOT NULL),
        |rr AS (SELECT (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) AS bucket,
        |              substr(md5(w), 3, 16) AS tail FROM h),
        |z AS (SELECT bucket, tail, length(regexp_extract(tail, '^(0*)', 1)) AS nz FROM rr),
        |dv AS (SELECT bucket, nz, strpos('0123456789abcdef', substr(tail, nz + 1, 1)) - 1 AS d FROM z),
        |rho AS (SELECT bucket, CASE WHEN nz >= 16 THEN 40 ELSE
        |          least(4 * nz + CASE WHEN d >= 8 THEN 0 WHEN d >= 4 THEN 1
        |                              WHEN d >= 2 THEN 2 ELSE 3 END + 1, 40) END AS rho
        |        FROM dv),
        |regs0 AS (SELECT bucket, CAST(max(rho) AS INTEGER) AS register FROM rho GROUP BY bucket)
        |SELECT CAST(b.range AS INTEGER) AS bucket,
        |       CAST(coalesce(r0.register, 0) AS INTEGER) AS register
        |FROM range(0, 256) b LEFT JOIN regs0 r0 ON r0.bucket = b.range
        |ORDER BY bucket""".stripMargin) {
      (s, d) =>
        // no .distinct(): registers are max-folds, duplicate-insensitive
        // by construction (spec-pinned) — a distinct here would shuffle
        // the corpus CONTENT; without it the bucket groupBy partial-aggs
        // map-side and the exchange is <= 256 rows per task
        val words = Tables.documents(s, d)
          .select(col("text").as("w")).where(col("w").isNotNull)
        Sketches.hllRegisters(words, "w").orderBy("bucket")
    },

    // ── The HLL estimate against ground truth, one row: exact integer
    //    harmonic numerator S = Σ 2^(40-register) (≤ 2^48, so ANY
    //    summation order is bit-identical), then the alpha·m²/Σ2^-M
    //    closing estimate as one fixed-order IEEE chain both engines
    //    round identically (temperature-sampler doctrine). The true
    //    distinct count rides along to show the ~6.5% (1.04/√256)
    //    expected error honestly. ──
    QueryDef.sql(
      "corpus_hll_estimate",
      """WITH h AS (SELECT DISTINCT text AS w FROM documents WHERE text IS NOT NULL),
        |rr AS (SELECT (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) AS bucket,
        |              substr(md5(w), 3, 16) AS tail FROM h),
        |z AS (SELECT bucket, tail, length(regexp_extract(tail, '^(0*)', 1)) AS nz FROM rr),
        |dv AS (SELECT bucket, nz, strpos('0123456789abcdef', substr(tail, nz + 1, 1)) - 1 AS d FROM z),
        |rho AS (SELECT bucket, CASE WHEN nz >= 16 THEN 40 ELSE
        |          least(4 * nz + CASE WHEN d >= 8 THEN 0 WHEN d >= 4 THEN 1
        |                              WHEN d >= 2 THEN 2 ELSE 3 END + 1, 40) END AS rho
        |        FROM dv),
        |regs0 AS (SELECT bucket, CAST(max(rho) AS INTEGER) AS register FROM rho GROUP BY bucket),
        |regs AS (SELECT CAST(b.range AS INTEGER) AS bucket, coalesce(r0.register, 0) AS register
        |         FROM range(0, 256) b LEFT JOIN regs0 r0 ON r0.bucket = b.range),
        |agg AS (SELECT CAST(sum(CAST(1 AS BIGINT) << (40 - register)) AS BIGINT) AS s_sum,
        |               CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        |        FROM regs)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM h) AS n_distinct_true,
        |  CAST(256 AS INTEGER) AS m, agg.s_sum, agg.n_zero,
        |  round(((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0) * 256.0
        |        * 1099511627776.0 / CAST(agg.s_sum AS DOUBLE), 4) AS hll_estimate
        |FROM agg""".stripMargin) {
      (s, d) =>
        // registers over the RAW stream (duplicate-insensitive); only the
        // ground-truth column pays the distinct, and it exists to expose
        // the sketch's error, not to serve it
        val words = Tables.documents(s, d)
          .select(col("text").as("w")).where(col("w").isNotNull)
        words.agg(countDistinct(col("w")).cast("long").as("n_distinct_true"))
          .crossJoin(Sketches.hllEstimate(Sketches.hllRegisters(words, "w")))
    },

    // ── Zipf rank-frequency slope: least squares of log f vs log r over
    //    the top-30 words — the corpus-naturalness diagnostic (natural
    //    text ≈ −1; template soup ≈ 0). BOTH logs are the fixed-point
    //    integer ladder (two prefixed instances in one oracle — the PCA
    //    deflation-prefix precedent), so Σx, Σy, Σxy, Σx² are exact
    //    longs and the slope is ONE closing division of exact integers.
    //    The rank window runs on a 30-row frame (bounded by K, never by
    //    the corpus). ──
    QueryDef.sql(
      "corpus_zipf_slope",
      s"""WITH t AS (SELECT list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
         |e AS (SELECT unnest(ws) AS w FROM t),
         |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY w),
         |rk AS (SELECT w, cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rank
         |       FROM wc ORDER BY cnt DESC, w LIMIT 30),
         |ndr AS (SELECT w AS b, CAST(rank AS BIGINT) AS num, CAST(1 AS BIGINT) AS den FROM rk),
         |${DsirOracle.fixedPointLog2Cte("ndr", "r")},
         |ndf AS (SELECT w AS b, cnt AS num, CAST(1 AS BIGINT) AS den FROM rk),
         |${DsirOracle.fixedPointLog2Cte("ndf", "f")},
         |xy AS (SELECT r.b, r.sb AS x, f.sb AS y FROM rsbq r JOIN fsbq f ON f.b = r.b),
         |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |        CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
         |      FROM xy)
         |SELECT n,
         |  n * sxy - sx * sy AS num,
         |  n * sxx - sx * sx AS den,
         |  round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 4) AS zipf_slope
         |FROM s""".stripMargin) {
      (s, d) =>
        import org.apache.spark.sql.expressions.Window
        val wc = Tables.documents(s, d)
          .select(explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).cast("long").as("cnt"))
        // rank window over the K-row frame — bounded by K, never the corpus
        val ranked = wc.orderBy(col("cnt").desc, col("w")).limit(30)
          .withColumn("rank",
            row_number().over(Window.orderBy(col("cnt").desc, col("w"))).cast("long"))
        val withX = TextOps.withFixedPointLog2Q8(ranked, "rank", "1", "x")
        val withXY = TextOps.withFixedPointLog2Q8(withX, "cnt", "1", "y")
        withXY.agg(count(lit(1)).as("n"),
            sum("x").as("sx"), sum("y").as("sy"),
            sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
          .select(col("n"),
            (col("n") * col("sxy") - col("sx") * col("sy")).as("num"),
            (col("n") * col("sxx") - col("sx") * col("sx")).as("den"),
            round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")), 4).as("zipf_slope"))
    },

    // ── Per-language unigram ENTROPY in exact fixed-point: H =
    //    Σ cnt·floor(256·log2(total/cnt)) / (256·total) — the corpus
    //    diversity metric (low = template soup, high = diverse prose),
    //    computed with NO transcendental: the same 8-step integer
    //    squaring ladder as DSIR (DsirOracle generates the DuckDB twin;
    //    the ladder's opaque id column carries lang|word), one closing
    //    IEEE division. Vocab-sized frames throughout — the groupBys
    //    partial-agg, hot words collapse map-side. ──
    QueryDef.sql(
      "corpus_entropy_by_lang",
      s"""WITH t AS (SELECT coalesce(lang, '~null~') AS lang,
         |             list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
         |e AS (SELECT lang, unnest(ws) AS w FROM t),
         |c AS (SELECT lang, w, CAST(count(*) AS BIGINT) AS cnt FROM e GROUP BY 1, 2),
         |tt AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS total FROM c GROUP BY 1),
         |nd AS (SELECT c.lang || '|' || c.w AS b, tt.total AS num, c.cnt AS den,
         |              c.lang, c.cnt FROM c JOIN tt USING (lang)),
         |${DsirOracle.fixedPointLog2Cte("nd")},
         |pd AS (SELECT nd.lang, CAST(sum(sbq.sb * nd.cnt) AS BIGINT) AS raw_q8,
         |              CAST(sum(nd.cnt) AS BIGINT) AS n_tokens
         |       FROM nd JOIN sbq USING (b) GROUP BY nd.lang)
         |SELECT lang, n_tokens, raw_q8,
         |  round(raw_q8 / (256.0 * n_tokens), 4) AS entropy_bits
         |FROM pd ORDER BY lang""".stripMargin) {
      (s, d) =>
        val c = Tables.documents(s, d)
          .select(coalesce(col("lang"), lit("~null~")).as("lang"),
            explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy("lang", "w").agg(count(lit(1)).cast("long").as("cnt"))
        val tt = c.groupBy("lang").agg(sum("cnt").as("total"))
        val sc = TextOps.withFixedPointLog2Q8(c.join(tt, Seq("lang")),
          "total", "cnt", "lq8")
        sc.groupBy("lang")
          .agg(sum(col("lq8") * col("cnt")).as("raw_q8"),
            sum(col("cnt")).as("n_tokens"))
          .select(col("lang"), col("n_tokens"), col("raw_q8"),
            round(col("raw_q8").cast("double") / (lit(256.0) * col("n_tokens")), 4)
              .as("entropy_bits"))
          .orderBy("lang")
    },

    // ── GROUPED HLL — the shape that replaces GROUP BY + count(DISTINCT)
    //    at scale: per-lang register frames (≤ |groups|·256 exchange rows
    //    instead of every distinct (lang, text) pair), missing buckets
    //    accounted arithmetically (S += (m − present)·2^40) instead of
    //    materialized per group. True per-lang distincts ride along to
    //    expose the per-group error honestly — and at driver SF they
    //    expose the SMALL-RANGE BIAS: groups of ~100 distinct under 256
    //    registers sit far below the 2.5m linear-counting crossover, so
    //    the raw estimate reads ~3× high (71 true → 220.4 at sf0.001).
    //    That is the correct raw-HLL value (the oracle pins it); the
    //    n_zero column is exactly the V that linear counting m·ln(m/V)
    //    needs, and the serving layer applies it — ln is transcendental
    //    and stays outside the bit-exactness contract (the PSI/chi-square
    //    precedent). ──
    QueryDef.sql(
      "corpus_hll_by_lang",
      """WITH h AS (SELECT DISTINCT lang AS g, text AS w FROM documents WHERE text IS NOT NULL),
        |rr AS (SELECT g, (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) AS bucket,
        |              substr(md5(w), 3, 16) AS tail FROM h),
        |z AS (SELECT g, bucket, tail, length(regexp_extract(tail, '^(0*)', 1)) AS nz FROM rr),
        |dv AS (SELECT g, bucket, nz, strpos('0123456789abcdef', substr(tail, nz + 1, 1)) - 1 AS d FROM z),
        |rho AS (SELECT g, bucket, CASE WHEN nz >= 16 THEN 40 ELSE
        |          least(4 * nz + CASE WHEN d >= 8 THEN 0 WHEN d >= 4 THEN 1
        |                              WHEN d >= 2 THEN 2 ELSE 3 END + 1, 40) END AS rho
        |        FROM dv),
        |regs AS (SELECT g, bucket, CAST(max(rho) AS INTEGER) AS register FROM rho GROUP BY 1, 2),
        |agg AS (SELECT g, CAST(count(*) AS BIGINT) AS present,
        |          CAST(sum(CAST(1 AS BIGINT) << (40 - register)) AS BIGINT) AS sp,
        |          CAST(sum(CASE WHEN register = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zp
        |        FROM regs GROUP BY g),
        |tr AS (SELECT lang AS g, CAST(count(DISTINCT text) AS BIGINT) AS n_true
        |       FROM documents WHERE text IS NOT NULL GROUP BY 1)
        |SELECT a.g AS lang, tr.n_true,
        |  CAST(a.sp + (256 - a.present) * (CAST(1 AS BIGINT) << 40) AS BIGINT) AS s_sum,
        |  CAST(a.zp + (256 - a.present) AS BIGINT) AS n_zero,
        |  round(((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0) * 256.0 * 1099511627776.0
        |    / CAST(a.sp + (256 - a.present) * (CAST(1 AS BIGINT) << 40) AS DOUBLE), 4) AS hll_estimate
        |FROM agg a JOIN tr ON tr.g IS NOT DISTINCT FROM a.g
        |ORDER BY lang NULLS LAST""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d).where(col("text").isNotNull)
        val est = Sketches.hllEstimateByGroup(
          Sketches.hllRegistersByGroup(docs, "lang", "text"))
        val truth = docs.groupBy(col("lang").as("_g2"))
          .agg(countDistinct("text").cast("long").as("n_true"))
        est.join(truth, col("g") <=> col("_g2"))
          .select(col("g").as("lang"), col("n_true"), col("s_sum"),
            col("n_zero"), col("hll_estimate"))
          .orderBy(asc_nulls_last("lang"))
    },

    // ── Fixed-size RAG chunking: 48-token windows every 32 tokens
    //    (16-token overlap) — the retrieval-prep twin of the CDC
    //    chunker (content-defined, overlap-free, for DEDUP; this one is
    //    uniform with context overlap so no answer span straddles a
    //    boundary unseen). Pure in-row HOFs, no shuffle. ──
    QueryDef.sql(
      "text_rag_chunks",
      """WITH t AS (SELECT doc_id, list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |x AS (SELECT doc_id, ws, unnest([ i for i in range(1, len(ws) + 1, 32) ]) AS st,
        |             generate_subscripts([ i for i in range(1, len(ws) + 1, 32) ], 1) AS ci
        |      FROM t WHERE len(ws) >= 1)
        |SELECT doc_id AS doc, CAST(ci - 1 AS BIGINT) AS chunk_idx,
        |  CAST(st AS BIGINT) AS start_tok,
        |  CAST(least(48, len(ws) - st + 1) AS BIGINT) AS n_toks,
        |  md5(array_to_string(list_slice(ws, st, st + 47), ' ')) AS chunk_hash
        |FROM x ORDER BY doc, chunk_idx""".stripMargin) {
      (s, d) =>
        TextOps.ragChunks(Tables.documents(s, d), "doc_id", "text",
            chunkTokens = 48, overlap = 16)
          .orderBy("doc", "chunk_idx")
    },

    // ── HLL set algebra: estimated overlap of two document sets by
    //    inclusion-exclusion — |A∩B| ≈ E(A) + E(B) − E(A ⊔ B), where the
    //    union sketch is the REGISTER MAX-MERGE (the only set operation
    //    the lattice gives; intersection has no direct sketch). This is
    //    the join-cardinality estimator a planner wants from two table
    //    sketches without scanning either side. True intersection rides
    //    along; at corpus scale the three estimates cost 3·m register
    //    rows. A = en docs, B = docs mentioning 'vector'. ──
    QueryDef.sql(
      "corpus_hll_overlap",
      """WITH a AS (SELECT DISTINCT text AS w FROM documents WHERE text IS NOT NULL AND lang = 'en'),
        |b AS (SELECT DISTINCT text AS w FROM documents WHERE text IS NOT NULL AND contains(text, 'vector')),
        |ra AS (SELECT (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) AS bucket,
        |              substr(md5(w), 3, 16) AS tail, 0 AS side FROM a),
        |rb AS (SELECT (strpos('0123456789abcdef', substr(md5(w), 1, 1)) - 1) * 16
        |            + (strpos('0123456789abcdef', substr(md5(w), 2, 1)) - 1) AS bucket,
        |              substr(md5(w), 3, 16) AS tail, 1 AS side FROM b),
        |rr AS (SELECT * FROM ra UNION ALL SELECT * FROM rb),
        |z AS (SELECT side, bucket, tail, length(regexp_extract(tail, '^(0*)', 1)) AS nz FROM rr),
        |dv AS (SELECT side, bucket, nz, strpos('0123456789abcdef', substr(tail, nz + 1, 1)) - 1 AS d FROM z),
        |rho AS (SELECT side, bucket, CASE WHEN nz >= 16 THEN 40 ELSE
        |          least(4 * nz + CASE WHEN d >= 8 THEN 0 WHEN d >= 4 THEN 1
        |                              WHEN d >= 2 THEN 2 ELSE 3 END + 1, 40) END AS rho
        |        FROM dv),
        |regs AS (SELECT side, bucket, CAST(max(rho) AS INTEGER) AS register FROM rho GROUP BY 1, 2),
        |full0 AS (SELECT s.side, CAST(g.range AS INTEGER) AS bucket, coalesce(r.register, 0) AS register
        |          FROM (SELECT 0 AS side UNION ALL SELECT 1) s CROSS JOIN range(0, 256) g
        |          LEFT JOIN regs r ON r.bucket = g.range AND r.side = s.side),
        |uni AS (SELECT bucket, CAST(max(register) AS INTEGER) AS register FROM full0 GROUP BY bucket),
        |est AS (SELECT side, CAST(sum(CAST(1 AS BIGINT) << (40 - register)) AS BIGINT) AS s_sum
        |        FROM full0 GROUP BY side),
        |estu AS (SELECT CAST(sum(CAST(1 AS BIGINT) << (40 - register)) AS BIGINT) AS s_sum FROM uni),
        |ev AS (SELECT
        |  round(((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0) * 256.0 * 1099511627776.0
        |    / CAST((SELECT s_sum FROM est WHERE side = 0) AS DOUBLE), 4) AS est_a,
        |  round(((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0) * 256.0 * 1099511627776.0
        |    / CAST((SELECT s_sum FROM est WHERE side = 1) AS DOUBLE), 4) AS est_b,
        |  round(((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0) * 256.0 * 1099511627776.0
        |    / CAST((SELECT s_sum FROM estu) AS DOUBLE), 4) AS est_union),
        |tru AS (SELECT CAST(count(*) AS BIGINT) AS n_inter_true
        |        FROM a JOIN b ON a.w = b.w)
        |SELECT ev.est_a, ev.est_b, ev.est_union,
        |  round(ev.est_a + ev.est_b - ev.est_union, 4) AS est_intersection,
        |  tru.n_inter_true
        |FROM ev, tru""".stripMargin) {
      (s, d) =>
        val docs = Tables.documents(s, d).where(col("text").isNotNull)
        val a = docs.where(col("lang") === "en").select(col("text").as("w"))
        val b = docs.where(col("text").contains("vector")).select(col("text").as("w"))
        val ra = Sketches.hllRegisters(a, "w")
        val rb = Sketches.hllRegisters(b, "w")
        val estA = Sketches.hllEstimate(ra).select(col("hll_estimate").as("est_a"))
        val estB = Sketches.hllEstimate(rb).select(col("hll_estimate").as("est_b"))
        val estU = Sketches.hllEstimate(Sketches.hllMerge(ra, rb))
          .select(col("hll_estimate").as("est_union"))
        val truth = a.distinct().join(b.distinct(), Seq("w"))
          .agg(count(lit(1)).cast("long").as("n_inter_true"))
        estA.crossJoin(estB).crossJoin(estU)
          .withColumn("est_intersection",
            round(col("est_a") + col("est_b") - col("est_union"), 4))
          .crossJoin(truth)
          .select("est_a", "est_b", "est_union", "est_intersection", "n_inter_true")
    },

    // ── Count-min heavy hitters: build the 4×1024 integer cell frame
    //    from word counts (CMS is linear — counts and raw occurrences
    //    yield identical cells, spec-pinned), probe the 20 true heaviest
    //    words, report true vs estimate side by side. Every cell and
    //    estimate is an exact BIGINT; the row-salted md5 fold gives both
    //    engines the same d hash functions. At 100 TB the sketch is
    //    4096 cells merged by addition — heavy-hitter serving without a
    //    corpus-sized vocabulary. ──
    QueryDef.sql(
      "text_cms_heavy",
      """WITH t AS (SELECT list_filter(string_split(trim(text), ' '), w -> w <> '') AS ws FROM documents),
        |e AS (SELECT unnest(ws) AS w FROM t),
        |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS true_cnt FROM e GROUP BY w),
        |cr AS (SELECT wc.w, wc.true_cnt, r.range AS r,
        |         CAST(CAST(list_sum([ (strpos('0123456789abcdef',
        |                 substr(md5(CAST(r.range AS VARCHAR) || ':' || wc.w), 1, 8)[i]) - 1)
        |                 * power(16, 8 - i) for i in range(1, 9) ]) AS BIGINT)
        |              % 1024 AS INTEGER) AS b
        |       FROM wc, range(0, 4) r),
        |cells AS (SELECT r, b, CAST(sum(true_cnt) AS BIGINT) AS c FROM cr GROUP BY r, b),
        |probes AS (SELECT w, true_cnt FROM wc ORDER BY true_cnt DESC, w LIMIT 20)
        |SELECT p.w, p.true_cnt, CAST(min(c.c) AS BIGINT) AS cms_est
        |FROM probes p JOIN cr ON cr.w = p.w JOIN cells c ON c.r = cr.r AND c.b = cr.b
        |GROUP BY p.w, p.true_cnt
        |ORDER BY p.true_cnt DESC, p.w""".stripMargin) {
      (s, d) =>
        val wc = Tables.documents(s, d)
          .select(explode(TextOps.tokens(col("text"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("true_cnt"))
        val cells = Sketches.cmsCells(wc, "w", "true_cnt")
        val probes = wc.orderBy(col("true_cnt").desc, col("w").asc).limit(20)
        Sketches.cmsEstimate(QueryDef.broadcastIfSmall(cells), probes, "w")
          .orderBy(col("true_cnt").desc, col("w").asc)
    },

    // ── DSIR-shaped data selection: score every doc by how 'en'-like
    //    its hashed-unigram distribution is — the sub-bit (1/256-bit)
    //    fixed-point log-ratio of smoothed target vs raw bucket
    //    frequencies, 8 unrolled integer squaring steps generated by
    //    DsirOracle so both engines run the identical ladder (whole-bit
    //    PMI quantization measured degenerate here: corpus lifts are
    //    0.93–1.15×, all rounding to 0 bits). Selection keeps the top
    //    300‰ via the score-histogram cutoff (driver-sized at any
    //    corpus — no global sort); boundary scores over-select rather
    //    than tie-break arbitrarily. ──
    QueryDef.sql(
      "pipeline_dsir_select",
      DsirSelectOracleSql) {
      (s, d) =>
        val docs = Tables.documents(s, d)
          .withColumn("is_en", coalesce(col("lang") === "en", lit(false)))
        TextOps.importanceSelect(
            TextOps.importanceScore(docs, "doc_id", "text", "is_en"),
            keepPermille = 300)
          .orderBy("doc")
    },

    // ── Incremental DSIR (the arrival path): raw bucket counts are
    //    ADDITIVE sufficient statistics — built per corpus half, merged
    //    by union+sum, served with add-one smoothing applied once at
    //    score time. SHARES pipeline_dsir_select's oracle verbatim (the
    //    incremental-BM25 doctrine): merged-counts scoring must be
    //    bit-identical to from-scratch scoring or the hashes cannot
    //    meet. A production run persists the counts frame (1024 rows)
    //    and folds each arriving batch in O(batch). ──
    QueryDef.sql(
      "pipeline_dsir_incremental",
      DsirSelectOracleSql) {
      (s, d) =>
        val docs = Tables.documents(s, d)
          .withColumn("is_en", coalesce(col("lang") === "en", lit(false)))
        val c1 = TextOps.importanceBucketCounts(
          docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", "is_en")
        val c2 = TextOps.importanceBucketCounts(
          docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", "is_en")
        TextOps.importanceSelect(
            TextOps.importanceScoreFromCounts(docs, "doc_id", "text",
              TextOps.importanceCountsMerge(c1, c2)),
            keepPermille = 300)
          .orderBy("doc")
    },
  )
}
