package graft.queries

import graft.Tables
import graft.operators.{Sharding, TextOps}
import org.apache.spark.sql.functions._

/** Web-corpus acquisition layer — the stages BEFORE a training-data
  * pipeline's clean-text entry point: the WARC container crawls arrive
  * in ([[graft.codec.WarcCodec]]), URL canonicalization, robots
  * evaluation, and crawl-frontier scheduling. Sits in front of the
  * HTML-extraction stage (`text_html_extract`) the way the tar layer
  * sits after sharding.
  *
  * Scale notes: WARC pack/read shuffles once on the shard id (bytes per
  * record ride the shuffle exactly once); everything else is per-row
  * expressions plus hash-groupBy aggregations — no pairwise blowup.
  */
object WebQueries {

  /** One-record-per-doc HTML shell shared by the WARC queries — kept
    * deliberately small; the extraction-chain torture shell lives in
    * `text_html_extract`. */
  private def shellSql =
    "'<html><head><script>let i = 1 < 2;</script></head><body><h1>Doc ' || doc_id || " +
      "'</h1><p>' || coalesce(text, '') || '</p><br><p>A &amp; B&nbsp;end</p></body></html>'"

  private def shellCol = concat(
    lit("<html><head><script>let i = 1 < 2;</script></head><body><h1>Doc "),
    col("doc_id").cast("string"),
    lit("</h1><p>"), coalesce(col("text"), lit("")),
    lit("</p><br><p>A &amp; B&nbsp;end</p></body></html>"))

  def defs: Seq[QueryDef] = Seq(

    // ── WARC WRITER byte layout — WARC is, like tar, a container whose
    //    WRITTEN bytes are oracle-safe (no compression, fixed header
    //    order, epoch WARC-Date): the oracle REBUILDS every record
    //    byte-for-byte by string concatenation — version line, six
    //    headers with CRLF framing, payload, terminator — and compares
    //    md5 + length of the bytes the engine's writer produced. A
    //    drifted header order, date, separator, or Content-Length
    //    arithmetic breaks every row's hash. ──
    QueryDef.sql(
      "web_warc_build",
      s"""WITH c AS (SELECT chr(13) || chr(10) AS nl),
         |h AS (SELECT doc_id, $shellSql AS html FROM documents),
         |r AS (SELECT doc_id,
         |    'WARC/1.0' || nl ||
         |    'WARC-Type: response' || nl ||
         |    'WARC-Record-ID: <urn:graft:' || lpad(CAST(doc_id AS VARCHAR), 12, '0') || '>' || nl ||
         |    'WARC-Date: 1970-01-01T00:00:00Z' || nl ||
         |    'WARC-Target-URI: https://d' || (doc_id % 50) || '.example.com/p' || doc_id || nl ||
         |    'Content-Type: text/html' || nl ||
         |    'Content-Length: ' || CAST(length(html) AS VARCHAR) || nl ||
         |    nl || html || nl || nl AS rec
         |  FROM h, c)
         |SELECT doc_id, CAST(length(rec) AS BIGINT) AS n_bytes, md5(rec) AS rec_md5
         |FROM r ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        Tables.documents(s, d)
          .select(col("doc_id"), shellCol.as("html")).as[(Long, String)]
          .mapPartitions(_.map { case (id, html) =>
            (id, graft.codec.WarcCodec.write(Seq(graft.codec.WarcRecord(
              "response", f"urn:graft:$id%012d",
              Some(s"https://d${id % 50}.example.com/p$id"),
              "text/html", html.getBytes("UTF-8")))))
          })
          .toDF("doc_id", "warc")
          .select(col("doc_id"), length(col("warc")).cast("long").as("n_bytes"),
            md5(col("warc")).as("rec_md5"))
          .orderBy("doc_id")
    },

    // ── WARC REVISIT deduplication — how production archives avoid
    //    storing the same bytes twice (ISO 28500 revisit records,
    //    identical-payload-digest profile): trios of docs share one
    //    payload, so per digest the FIRST arrival packs as a full
    //    response record and the two later arrivals pack as
    //    payload-less revisit records carrying WARC-Refers-To /
    //    WARC-Payload-Digest / WARC-Profile. The oracle rebuilds every
    //    record byte-for-byte (both layouts), concatenates each
    //    shard's records in arrival order, and compares counts, byte
    //    sizes, the SAVED duplicate mass, and the file md5 — a drifted
    //    extra-header order, digest spelling, or original-selection
    //    rule breaks a shard's hash. ──
    QueryDef.sql(
      "web_warc_revisit",
      s"""WITH c AS (SELECT chr(13) || chr(10) AS nl),
         |d AS (SELECT doc_id, doc_id % 4 AS shard, doc_id // 3 AS g,
         |    '<html><body><p>Group ' || (doc_id // 3) ||
         |      ' shared content body</p></body></html>' AS html,
         |    'https://d' || (doc_id % 50) || '.example.com/p' || doc_id AS uri
         |  FROM documents),
         |o AS (SELECT g, min(doc_id) AS orig FROM d GROUP BY g),
         |r AS (SELECT d.doc_id, d.shard, length(d.html) AS plen,
         |    d.doc_id <> o.orig AS is_rev,
         |    'WARC/1.0' || nl ||
         |    CASE WHEN d.doc_id = o.orig THEN 'WARC-Type: response' ELSE 'WARC-Type: revisit' END || nl ||
         |    'WARC-Record-ID: <urn:graft:' || lpad(CAST(d.doc_id AS VARCHAR), 12, '0') || '>' || nl ||
         |    'WARC-Date: 1970-01-01T00:00:00Z' || nl ||
         |    'WARC-Target-URI: ' || d.uri || nl ||
         |    CASE WHEN d.doc_id = o.orig THEN '' ELSE
         |      'WARC-Refers-To: <urn:graft:' || lpad(CAST(o.orig AS VARCHAR), 12, '0') || '>' || nl ||
         |      'WARC-Payload-Digest: md5:' || md5(d.html) || nl ||
         |      'WARC-Profile: http://netpreserve.org/warc/1.0/revisit/identical-payload-digest' || nl
         |    END ||
         |    'Content-Type: text/html' || nl ||
         |    'Content-Length: ' || CASE WHEN d.doc_id = o.orig
         |      THEN CAST(length(d.html) AS VARCHAR) ELSE '0' END || nl ||
         |    nl || CASE WHEN d.doc_id = o.orig THEN d.html ELSE '' END || nl || nl AS rec
         |  FROM d JOIN o USING (g), c),
         |sh AS (SELECT shard, string_agg(rec, '' ORDER BY doc_id) AS warc,
         |    CAST(count(*) AS BIGINT) AS n_records,
         |    CAST(sum(CASE WHEN is_rev THEN 0 ELSE 1 END) AS BIGINT) AS n_response,
         |    CAST(sum(CASE WHEN is_rev THEN 1 ELSE 0 END) AS BIGINT) AS n_revisit,
         |    CAST(sum(CASE WHEN is_rev THEN plen ELSE 0 END) AS BIGINT) AS n_saved_bytes
         |  FROM r GROUP BY shard)
         |SELECT shard, n_records, n_response, n_revisit,
         |  CAST(length(warc) AS BIGINT) AS n_warc_bytes, n_saved_bytes,
         |  md5(warc) AS warc_md5
         |FROM sh ORDER BY shard""".stripMargin) {
      (s, d) =>
        val pages = Tables.documents(s, d)
          .select(col("doc_id"),
            pmod(col("doc_id"), lit(4)).cast("int").as("shard"),
            concat(lit("<html><body><p>Group "), (col("doc_id") / 3).cast("long"),
              lit(" shared content body</p></body></html>")).cast("binary").as("blob"),
            concat(lit("https://d"), pmod(col("doc_id"), lit(50)),
              lit(".example.com/p"), col("doc_id")).as("uri"))
        Sharding.packWarcRevisitShards(pages, "shard", "doc_id", "uri", "blob")
          .select(col("shard"), col("n_records"), col("n_response"),
            col("n_revisit"), col("n_warc_bytes"), col("n_saved_bytes"),
            md5(col("warc")).as("warc_md5"))
          .orderBy("shard")
    },

    // ── WARC shard round trip → HTML extraction — the crawl-side twin
    //    of mm_tar_shards: every doc's HTML response packs into its
    //    shard's WARC file (one shuffle on the shard id), the files are
    //    PARSED BACK by the engine's own reader, the recovered payloads
    //    run the 11-step extraction chain, and the target URI recovered
    //    from the record header feeds the domain parse. The oracle
    //    replays shard assignment, the shell, the extraction, and the
    //    URI arithmetic — a member misroute, payload corruption, or
    //    header loss breaks the hash. ──
    QueryDef.sql(
      "web_warc_extract",
      s"""WITH h AS (SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard, $shellSql AS html
         |  FROM documents),
         |c1 AS (SELECT doc_id, shard,
         |    regexp_replace(html, '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS t FROM h),
         |c2 AS (SELECT doc_id, shard, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM c1),
         |c3 AS (SELECT doc_id, shard, regexp_replace(t, '(?i)<br[^>]*>|</p[^>]*>', chr(10), 'g') AS t FROM c2),
         |c4 AS (SELECT doc_id, shard, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM c3),
         |c5 AS (SELECT doc_id, shard,
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |      regexp_replace(t, '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
         |      '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS t FROM c4),
         |c6 AS (SELECT doc_id, shard, regexp_replace(t, '[ \t]+', ' ', 'g') AS t FROM c5),
         |c7 AS (SELECT doc_id, shard, regexp_replace(regexp_replace(t, '(?: ?\n ?)+', chr(10), 'g'),
         |                                            '^\n+|\n+$$', '', 'g') AS t FROM c6),
         |clean AS (SELECT doc_id, shard, trim(t) AS t FROM c7)
         |SELECT shard, doc_id AS member_id,
         |  'd' || (doc_id % 50) || '.example.com' AS domain,
         |  CAST(length(t) AS BIGINT) AS n_chars, md5(t) AS clean_md5
         |FROM clean ORDER BY member_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d)
          .select(col("doc_id"), shellCol.as("html")).as[(Long, String)]
          .mapPartitions(_.map { case (id, html) =>
            (id, (id % 8).toInt, s"https://d${id % 50}.example.com/p$id",
              html.getBytes("UTF-8"))
          })
          .toDF("doc_id", "shard", "uri", "blob")
        val warcs = Sharding.packWarcShards(blobs, "shard", "doc_id", "uri", "blob")
        val members = Sharding.readWarcRecords(warcs, "shard", "warc")
        members
          .select(col("shard"), col("member_id"),
            explode(TextOps.urlDomains(col("target_uri"))).as("domain"),
            TextOps.htmlExtract(col("blob").cast("string")).as("t"))
          .select(col("shard"), col("member_id"), col("domain"),
            length(col("t")).cast("long").as("n_chars"),
            md5(col("t").cast("binary")).as("clean_md5"))
          .orderBy("member_id")
    },
    // ── WET derivation — the full crawl→text round trip: response WARC
    //    shards parse back, payloads run the extraction chain, and the
    //    RESULTS re-pack as `conversion` (WET) records — the layer
    //    extracted-text corpora actually ship as. The oracle rebuilds
    //    each conversion record's bytes from the replayed extraction
    //    and pins the ENTIRE shard file: md5 over the id-ordered record
    //    concatenation (string_agg ORDER BY) — one member out of order,
    //    one length drifted, and the whole-file hash breaks. ──
    QueryDef.sql(
      "web_warc_wet",
      s"""WITH c AS (SELECT chr(13) || chr(10) AS nl),
         |h AS (SELECT doc_id, CAST(doc_id % 8 AS INT) AS shard, $shellSql AS html
         |  FROM documents),
         |c1 AS (SELECT doc_id, shard,
         |    regexp_replace(html, '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' ', 'g') AS t FROM h),
         |c2 AS (SELECT doc_id, shard, regexp_replace(t, '(?s)<!--.*?-->', ' ', 'g') AS t FROM c1),
         |c3 AS (SELECT doc_id, shard, regexp_replace(t, '(?i)<br[^>]*>|</p[^>]*>', chr(10), 'g') AS t FROM c2),
         |c4 AS (SELECT doc_id, shard, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t FROM c3),
         |c5 AS (SELECT doc_id, shard,
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |      regexp_replace(t, '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '"', 'g'),
         |      '&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS t FROM c4),
         |c6 AS (SELECT doc_id, shard, regexp_replace(t, '[ \t]+', ' ', 'g') AS t FROM c5),
         |c7 AS (SELECT doc_id, shard, regexp_replace(regexp_replace(t, '(?: ?\n ?)+', chr(10), 'g'),
         |                                            '^\n+|\n+$$', '', 'g') AS t FROM c6),
         |clean AS (SELECT doc_id, shard, trim(t) AS t FROM c7),
         |r AS (SELECT doc_id, shard,
         |    'WARC/1.0' || nl ||
         |    'WARC-Type: conversion' || nl ||
         |    'WARC-Record-ID: <urn:graft:' || lpad(CAST(doc_id AS VARCHAR), 12, '0') || '>' || nl ||
         |    'WARC-Date: 1970-01-01T00:00:00Z' || nl ||
         |    'WARC-Target-URI: https://d' || (doc_id % 50) || '.example.com/p' || doc_id || nl ||
         |    'Content-Type: text/plain' || nl ||
         |    'Content-Length: ' || CAST(length(t) AS VARCHAR) || nl ||
         |    nl || t || nl || nl AS rec
         |  FROM clean, c)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_records,
         |  CAST(sum(length(rec)) AS BIGINT) AS n_bytes,
         |  md5(string_agg(rec, '' ORDER BY doc_id)) AS wet_md5
         |FROM r GROUP BY shard ORDER BY shard""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d)
          .select(col("doc_id"), shellCol.as("html")).as[(Long, String)]
          .mapPartitions(_.map { case (id, html) =>
            (id, (id % 8).toInt, s"https://d${id % 50}.example.com/p$id",
              html.getBytes("UTF-8"))
          })
          .toDF("doc_id", "shard", "uri", "blob")
        val members = Sharding.readWarcRecords(
          Sharding.packWarcShards(blobs, "shard", "doc_id", "uri", "blob"),
          "shard", "warc")
        val extracted = members.select(col("shard"), col("member_id").as("doc_id"),
          col("target_uri"),
          TextOps.htmlExtract(col("blob").cast("string")).as("t"))
        val wet = Sharding.packWarcShards(
          extracted.select(col("shard"), col("doc_id"), col("target_uri").as("uri"),
            col("t").cast("binary").as("blob")),
          "shard", "doc_id", "uri", "blob",
          warcType = "conversion", contentType = "text/plain")
        wet.select(col("shard"), col("n_records"),
            col("n_warc_bytes").as("n_bytes"), md5(col("warc")).as("wet_md5"))
          .orderBy("shard")
    },
    // ── HTTP response framing — the layer INSIDE a crawl archive's
    //    response records: the engine serializes each doc's HTML as a
    //    chunked HTTP/1.1 response (per-doc chunk size 7+id%13) and
    //    parses it back through the tolerant decoder. The raw bytes are
    //    compression-free, so the oracle rebuilds the ENTIRE response —
    //    status line, headers, every `<lowercase hex>CRLF<data>CRLF`
    //    chunk frame, terminal chunk — by string concatenation
    //    (`lower(to_hex(..))` matches `Integer.toHexString`) and pins
    //    md5 of both the raw framing and the de-chunked body; a drifted
    //    chunk boundary, hex case, or missed terminal frame breaks
    //    every row. ──
    QueryDef.sql(
      "web_http_parse",
      s"""WITH c AS (SELECT chr(13) || chr(10) AS nl),
         |h AS (SELECT doc_id, $shellSql AS html, CAST(7 + doc_id % 13 AS INT) AS k
         |  FROM documents),
         |r AS (SELECT doc_id, html, k,
         |    'HTTP/1.1 200 OK' || nl ||
         |    'Content-Type: text/html; charset=utf-8' || nl ||
         |    'Server: graft' || nl ||
         |    'Transfer-Encoding: chunked' || nl || nl ||
         |    array_to_string(list_transform(range(CAST(ceil(length(html) / (k * 1.0)) AS BIGINT)),
         |      i -> lower(to_hex(length(substr(html, CAST(1 + i * k AS BIGINT), k)))) || nl ||
         |           substr(html, CAST(1 + i * k AS BIGINT), k) || nl), '') ||
         |    '0' || nl || nl AS raw
         |  FROM h, c)
         |SELECT doc_id, CAST(200 AS INT) AS status,
         |  'text/html; charset=utf-8' AS ctype,
         |  CAST(ceil(length(html) / (k * 1.0)) AS BIGINT) AS n_chunks,
         |  CAST(length(html) AS BIGINT) AS body_len, md5(html) AS body_md5,
         |  CAST(length(raw) AS BIGINT) AS raw_len, md5(raw) AS raw_md5
         |FROM r ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        Tables.documents(s, d)
          .select(col("doc_id"), shellCol.as("html")).as[(Long, String)]
          .mapPartitions(_.map { case (id, html) =>
            val raw = graft.codec.HttpCodec.writeChunked(200, "OK",
              Seq("Content-Type" -> "text/html; charset=utf-8", "Server" -> "graft"),
              html.getBytes("UTF-8"), (7 + id % 13).toInt)
            val r = graft.codec.HttpCodec.parse(raw)
              .getOrElse(sys.error(s"own response failed to parse: doc $id"))
            (id, r.status, r.header("content-type").getOrElse(""),
              r.nChunks.toLong, r.body, raw)
          })
          .toDF("doc_id", "status", "ctype", "n_chunks", "body", "raw")
          .select(col("doc_id"), col("status"), col("ctype"), col("n_chunks"),
            length(col("body")).cast("long").as("body_len"), md5(col("body")).as("body_md5"),
            length(col("raw")).cast("long").as("raw_len"), md5(col("raw")).as("raw_md5"))
          .orderBy("doc_id")
    },
    // ── Content-Encoding through the funnel — real responses are
    //    overwhelmingly gzip-coded, so the de-framed body is NOT yet
    //    text: one content-decode layer sits between framing and the
    //    charset gate. Three wire shapes per doc (gzip under
    //    Content-Length, gzip under CHUNKED framing — the layers must
    //    compose, de-frame first then content-decode — and zlib
    //    deflate), all built with the engine's own gzip writer.
    //    Compressed bytes are never oracle-safe (the GzipCodec
    //    doctrine), so the oracle pins what survives decoding: the
    //    applied coding token, the framing flag, and the DECODED
    //    body's length + md5 — a missing decode hands the hash
    //    compressed bytes and breaks every third row. ──
    QueryDef.sql(
      "web_http_gzip",
      s"""WITH h AS (SELECT doc_id, $shellSql AS html FROM documents)
         |SELECT doc_id,
         |  CASE WHEN doc_id % 3 = 2 THEN 'deflate' ELSE 'gzip' END AS coding,
         |  (doc_id % 3 = 1) AS chunked,
         |  CAST(length(html) AS BIGINT) AS body_len, md5(html) AS body_md5
         |FROM h ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        Tables.documents(s, d)
          .select(col("doc_id"), shellCol.as("html")).as[(Long, String)]
          .mapPartitions(_.map { case (id, html) =>
            val bytes = html.getBytes("UTF-8")
            val hdrs = Seq("Content-Type" -> "text/html")
            val wire = (id % 3) match {
              case 0 => graft.codec.HttpCodec.write(200, "OK",
                hdrs :+ ("Content-Encoding" -> "gzip"),
                graft.codec.GzipCodec.gzipMember(bytes))
              case 1 => graft.codec.HttpCodec.writeChunked(200, "OK",
                hdrs :+ ("Content-Encoding" -> "gzip"),
                graft.codec.GzipCodec.gzipMember(bytes), 64)
              case _ =>
                val dfl = new java.util.zip.Deflater(
                  java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
                dfl.setInput(bytes); dfl.finish()
                val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 32)
                val buf = new Array[Byte](8192)
                while (!dfl.finished()) { val n = dfl.deflate(buf); out.write(buf, 0, n) }
                dfl.end()
                graft.codec.HttpCodec.write(200, "OK",
                  hdrs :+ ("Content-Encoding" -> "deflate"), out.toByteArray)
            }
            val r = graft.codec.HttpCodec.parse(wire)
              .getOrElse(sys.error(s"own coded response failed to parse: doc $id"))
            (id, r.contentCoding, r.chunked, r.body)
          })
          .toDF("doc_id", "coding", "chunked", "body")
          .select(col("doc_id"), col("coding"), col("chunked"),
            length(col("body")).cast("long").as("body_len"),
            md5(col("body")).as("body_md5"))
          .orderBy("doc_id")
    },
    // ── Content-coding FUNNEL accounting — what the wire entry KEEPS
    //    vs what it DROPS, per Content-Encoding token: identity / gzip
    //    / deflate bodies decode and pass the charset gate; `br`
    //    bodies (modern crawls run 30-40% brotli) decode only when the
    //    optional brotli runtime backs commons-compress — on this
    //    classpath it does not, so the parser passes them through
    //    CODED with the token recorded, the funnel drops them AT THE
    //    TOKEN (compressed bytes must never reach the charset gate —
    //    short gzip blobs even pass the density bar and mojibake as
    //    Latin), and THIS query surfaces the dropped mass per token
    //    instead of letting it vanish: the observability contract
    //    VERDICT r12 asked for. The br fixture
    //    bodies are gzip members under a br label — deterministic
    //    stand-ins for undecodable coded bytes (real brotli cannot be
    //    built here: no encoder exists even when the decoder does).
    //    Oracle: pure seed arithmetic — counts and recovered char mass
    //    replay from the templates; compressed byte sizes never enter
    //    (never oracle-safe). ──
    QueryDef.sql(
      "web_http_coding_funnel",
      """WITH t AS (SELECT doc_id, doc_id % 4 AS m,
        |    'Page ' || doc_id || ' the quick data fee is ' || (doc_id % 97) AS txt
        |  FROM documents)
        |SELECT CASE m WHEN 0 THEN 'identity' WHEN 1 THEN 'gzip'
        |    WHEN 2 THEN 'deflate' ELSE 'br' END AS coding,
        |  CAST(count(*) AS BIGINT) AS n_pages,
        |  CAST(sum(CASE WHEN m = 3 THEN 0 ELSE 1 END) AS BIGINT) AS n_recovered,
        |  CAST(sum(CASE WHEN m = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  CAST(sum(CASE WHEN m = 3 THEN 0 ELSE length(txt) END) AS BIGINT) AS recovered_chars
        |FROM t GROUP BY 1 ORDER BY coding""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val wire = Tables.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val txt = s"Page $id the quick data fee is ${id % 97}"
            val bytes = txt.getBytes("UTF-8")
            val hdrs = Seq("Content-Type" -> "text/html")
            val raw = (id % 4) match {
              case 0 => graft.codec.HttpCodec.write(200, "OK", hdrs, bytes)
              case 1 => graft.codec.HttpCodec.write(200, "OK",
                hdrs :+ ("Content-Encoding" -> "gzip"),
                graft.codec.GzipCodec.gzipMember(bytes))
              case 2 =>
                val dfl = new java.util.zip.Deflater(
                  java.util.zip.Deflater.DEFAULT_COMPRESSION, false)
                dfl.setInput(bytes); dfl.finish()
                val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 32)
                val buf = new Array[Byte](8192)
                while (!dfl.finished()) { val n = dfl.deflate(buf); out.write(buf, 0, n) }
                dfl.end()
                graft.codec.HttpCodec.write(200, "OK",
                  hdrs :+ ("Content-Encoding" -> "deflate"), out.toByteArray)
              case _ => graft.codec.HttpCodec.write(200, "OK",
                hdrs :+ ("Content-Encoding" -> "br"),
                graft.codec.GzipCodec.gzipMember(bytes))
            }
            graft.codec.HttpCodec.parse(raw) match {
              case Some(r) => (id, r.contentCoding, r.body)
              // a classpath WITH the brotli runtime rejects the br
              // stand-in bytes outright (no brotli encoder exists
              // anywhere to build real ones) — same accounting: the
              // response is dropped br mass either way
              case None if id % 4 == 3 => (id, "br", Array.emptyByteArray)
              case None => sys.error(s"own coded response failed to parse: doc $id")
            }
          })
          .toDF("doc_id", "coding", "payload")
        // a body the parser could not content-decode is DROPPED at the
        // coding token, BEFORE the charset gate — compressed bytes must
        // never reach text sniffing (short gzip blobs can even pass the
        // density bar and mojibake as Latin). The decodable set is
        // FIXED: this fixture's br rows are undecodable stand-ins on
        // every classpath (see above), so counting br as decodable
        // when a runtime is present would only mis-score the stand-ins
        val kept = col("coding").isin("identity", "gzip", "deflate")
        TextOps.decodeCharset(wire, "payload", "charset", "t")
          .groupBy("coding")
          .agg(count(lit(1)).cast("long").as("n_pages"),
            sum(when(kept && col("charset") =!= "unknown", 1L).otherwise(0L)).as("n_recovered"),
            sum(when(!kept || col("charset") === "unknown", 1L).otherwise(0L)).as("n_dropped"),
            sum(when(kept && col("charset") =!= "unknown", length(col("t")))
              .otherwise(0L)).cast("long").as("recovered_chars"))
          .orderBy("coding")
    },

    // ── WARC × HTTP composition — the shape real crawl archives ship:
    //    each WARC response record's payload is the FULL HTTP response
    //    (status line, headers, chunked framing), `Content-Type:
    //    application/http; msgtype=response`. The engine frames each
    //    doc's HTML as a chunked HTTP response, packs the responses
    //    into WARC shards, walks the shards back through the indexed
    //    WARC parser (rec_len + payload digest pin the OUTER layer),
    //    and de-chunks the payloads through the HTTP parser (status /
    //    chunk count / body pin the INNER layer). The oracle rebuilds
    //    both framings by string concatenation — a drift in either
    //    layer's arithmetic (chunk boundaries, Content-Length of the
    //    raw response, WARC header bytes) breaks every row. ──
    QueryDef.sql(
      "web_warc_http",
      s"""WITH c AS (SELECT chr(13) || chr(10) AS nl),
         |h AS (SELECT doc_id, doc_id % 50 AS m, CAST(doc_id % 8 AS INT) AS shard,
         |    $shellSql AS html, CAST(7 + doc_id % 13 AS INT) AS k FROM documents),
         |p AS (SELECT doc_id, m, shard, html, k,
         |    'HTTP/1.1 200 OK' || nl ||
         |    'Content-Type: text/html; charset=utf-8' || nl ||
         |    'Transfer-Encoding: chunked' || nl || nl ||
         |    array_to_string(list_transform(range(CAST(ceil(length(html) / (k * 1.0)) AS BIGINT)),
         |      i -> lower(to_hex(length(substr(html, CAST(1 + i * k AS BIGINT), k)))) || nl ||
         |           substr(html, CAST(1 + i * k AS BIGINT), k) || nl), '') ||
         |    '0' || nl || nl AS raw
         |  FROM h, c),
         |r AS (SELECT doc_id, shard, html, k, raw,
         |    'WARC/1.0' || nl ||
         |    'WARC-Type: response' || nl ||
         |    'WARC-Record-ID: <urn:graft:' || lpad(CAST(doc_id AS VARCHAR), 12, '0') || '>' || nl ||
         |    'WARC-Date: 1970-01-01T00:00:00Z' || nl ||
         |    'WARC-Target-URI: https://d' || m || '.example.com/p' || doc_id || nl ||
         |    'Content-Type: application/http; msgtype=response' || nl ||
         |    'Content-Length: ' || CAST(length(raw) AS VARCHAR) || nl ||
         |    nl || raw || nl || nl AS rec
         |  FROM p, c)
         |SELECT doc_id, CAST(200 AS INT) AS status,
         |  CAST(ceil(length(html) / (k * 1.0)) AS BIGINT) AS n_chunks,
         |  CAST(length(html) AS BIGINT) AS body_len, md5(html) AS body_md5,
         |  CAST(length(rec) AS BIGINT) AS rec_len, md5(raw) AS raw_md5
         |FROM r ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d)
          .select(col("doc_id"), shellCol.as("html")).as[(Long, String)]
          .mapPartitions(_.map { case (id, html) =>
            val raw = graft.codec.HttpCodec.writeChunked(200, "OK",
              Seq("Content-Type" -> "text/html; charset=utf-8"),
              html.getBytes("UTF-8"), (7 + id % 13).toInt)
            (id, (id % 8).toInt, s"https://d${id % 50}.example.com/p$id", raw)
          })
          .toDF("doc_id", "shard", "uri", "blob")
        val warcs = Sharding.packWarcShards(blobs, "shard", "doc_id", "uri", "blob",
          contentType = "application/http; msgtype=response")
        val outer = Sharding.warcIndex(warcs, "shard", "warc")
          .select(col("member_id").as("doc_id"), col("rec_len"),
            col("digest").as("raw_md5"))
        val inner = Sharding.readWarcRecords(warcs, "shard", "warc")
          .select(col("member_id").as("doc_id"), col("blob")).as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, raw) =>
            val r = graft.codec.HttpCodec.parse(raw)
              .getOrElse(sys.error(s"http payload failed to parse: doc $id"))
            (id, r.status, r.nChunks.toLong, r.body)
          })
          .toDF("doc_id", "status", "n_chunks", "body")
        inner.join(outer, Seq("doc_id"))
          .select(col("doc_id"), col("status"), col("n_chunks"),
            length(col("body")).cast("long").as("body_len"),
            md5(col("body")).as("body_md5"), col("rec_len"), col("raw_md5"))
          .orderBy("doc_id")
    },
    // ── Compressed archives — the `.warc.gz` form crawls actually
    //    ship: each record gzips as its OWN member (members
    //    concatenate, so compressed offsets still address records).
    //    Deflate output is a zlib implementation detail, so unlike
    //    every other container here the archive BYTES are not
    //    oracle-safe; the pin is the full round trip instead — the
    //    engine packs, walks the members back (inflate + CRC32 +
    //    ISIZE), parses each as a WARC record, and the oracle
    //    recomputes the recovered content: per-doc payload md5 and the
    //    DECOMPRESSED record length (deterministic WarcCodec
    //    arithmetic). A drifted member boundary, bad CRC, or lost
    //    record drops or corrupts a row. ──
    QueryDef.sql(
      "web_warc_gz",
      s"""WITH c AS (SELECT chr(13) || chr(10) AS nl),
         |h AS (SELECT doc_id, doc_id % 50 AS m, $shellSql AS html FROM documents),
         |r AS (SELECT doc_id, m, html,
         |    length('WARC/1.0' || nl ||
         |    'WARC-Type: response' || nl ||
         |    'WARC-Record-ID: <urn:graft:' || lpad(CAST(doc_id AS VARCHAR), 12, '0') || '>' || nl ||
         |    'WARC-Date: 1970-01-01T00:00:00Z' || nl ||
         |    'WARC-Target-URI: https://d' || m || '.example.com/p' || doc_id || nl ||
         |    'Content-Type: text/html' || nl ||
         |    'Content-Length: ' || CAST(length(html) AS VARCHAR) || nl ||
         |    nl || html || nl || nl) AS rec_len
         |  FROM h, c)
         |SELECT doc_id, 'd' || m || '.example.com' AS domain,
         |  CAST(rec_len AS BIGINT) AS rec_len,
         |  CAST(length(html) AS BIGINT) AS n_bytes, md5(html) AS payload_md5
         |FROM r ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d)
          .select(col("doc_id"), shellCol.as("html")).as[(Long, String)]
          .mapPartitions(_.map { case (id, html) =>
            (id, (id % 8).toInt, s"https://d${id % 50}.example.com/p$id",
              html.getBytes("UTF-8"))
          })
          .toDF("doc_id", "shard", "uri", "blob")
        val gz = Sharding.packWarcGzShards(blobs, "shard", "doc_id", "uri", "blob")
        Sharding.readWarcGzRecords(gz, "shard", "warcgz")
          .select(col("member_id").as("doc_id"),
            explode(TextOps.urlDomains(col("target_uri"))).as("domain"),
            col("rec_len"),
            length(col("blob")).cast("long").as("n_bytes"),
            md5(col("blob")).as("payload_md5"))
          .orderBy("doc_id")
    },
    // ── CDX index — the lookup structure OVER the archives: the engine
    //    packs response WARC shards, walks them back with the indexed
    //    parser, and emits one row per record with its exact byte
    //    position (offset, length), payload digest, and SURT sort key
    //    (host labels reversed — the ordering that makes a domain
    //    lookup a prefix scan). The oracle never parses: WarcCodec
    //    bytes are deterministic, so it rebuilds every record string,
    //    takes offsets as the per-shard running sum of record lengths
    //    in member order, and the SURT key arithmetically from the
    //    seed. One byte of header drift anywhere in a shard shifts
    //    every later offset and breaks the hash. ──
    QueryDef.sql(
      "web_surt_cdx",
      s"""WITH c AS (SELECT chr(13) || chr(10) AS nl),
         |h AS (SELECT doc_id, doc_id % 50 AS m, CAST(doc_id % 8 AS INT) AS shard,
         |    $shellSql AS html FROM documents),
         |r AS (SELECT doc_id, m, shard, html,
         |    'WARC/1.0' || nl ||
         |    'WARC-Type: response' || nl ||
         |    'WARC-Record-ID: <urn:graft:' || lpad(CAST(doc_id AS VARCHAR), 12, '0') || '>' || nl ||
         |    'WARC-Date: 1970-01-01T00:00:00Z' || nl ||
         |    'WARC-Target-URI: https://d' || m || '.example.com/p' || doc_id || nl ||
         |    'Content-Type: text/html' || nl ||
         |    'Content-Length: ' || CAST(length(html) AS VARCHAR) || nl ||
         |    nl || html || nl || nl AS rec
         |  FROM h, c)
         |SELECT 'com,example,d' || m || ')/p' || doc_id AS surt, shard,
         |  CAST(coalesce(sum(length(rec)) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS offset,
         |  CAST(length(rec) AS BIGINT) AS rec_len, md5(html) AS digest
         |FROM r ORDER BY surt""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d)
          .select(col("doc_id"), shellCol.as("html")).as[(Long, String)]
          .mapPartitions(_.map { case (id, html) =>
            (id, (id % 8).toInt, s"https://d${id % 50}.example.com/p$id",
              html.getBytes("UTF-8"))
          })
          .toDF("doc_id", "shard", "uri", "blob")
        val warcs = Sharding.packWarcShards(blobs, "shard", "doc_id", "uri", "blob")
        Sharding.warcIndex(warcs, "shard", "warc")
          .select(TextOps.urlSurt(col("target_uri")).as("surt"),
            col("shard"), col("offset"), col("rec_len"), col("digest"))
          .orderBy("surt")
    },
    // ── Revisit dedup — the STORAGE-layer dedup crawls run between
    //    snapshots: snapshot 2 re-fetches every URI but only docs with
    //    `doc_id % 7 = 0` changed; the engine joins snapshot-2 payloads
    //    against snapshot-1's digest index on the URI (the previous
    //    crawl's CDX digest column — bytes per record, never payloads),
    //    writes changed docs as full `response` records and unchanged
    //    ones as empty-payload `revisit` records into ONE mixed-type
    //    archive per shard. The oracle replays the change seed and
    //    rebuilds every record of the mixed archive — a misclassified
    //    row flips a record's type, length, and payload at once, and
    //    the whole-file md5 (string_agg in member order) breaks. ──
    QueryDef.sql(
      "web_revisit",
      s"""WITH c AS (SELECT chr(13) || chr(10) AS nl),
         |h AS (SELECT doc_id, doc_id % 50 AS m, CAST(doc_id % 8 AS INT) AS shard,
         |    $shellSql AS html, doc_id % 7 = 0 AS chg FROM documents),
         |h2 AS (SELECT doc_id, m, shard, chg,
         |    CASE WHEN chg THEN html || '<!-- rev2 -->' ELSE html END AS html2 FROM h),
         |r AS (SELECT doc_id, shard, chg,
         |    'WARC/1.0' || nl ||
         |    'WARC-Type: ' || CASE WHEN chg THEN 'response' ELSE 'revisit' END || nl ||
         |    'WARC-Record-ID: <urn:graft:' || lpad(CAST(doc_id AS VARCHAR), 12, '0') || '>' || nl ||
         |    'WARC-Date: 1970-01-01T00:00:00Z' || nl ||
         |    'WARC-Target-URI: https://d' || m || '.example.com/p' || doc_id || nl ||
         |    'Content-Type: ' || CASE WHEN chg THEN 'text/html' ELSE 'message/http' END || nl ||
         |    'Content-Length: ' || CASE WHEN chg THEN CAST(length(html2) AS VARCHAR) ELSE '0' END || nl ||
         |    nl || CASE WHEN chg THEN html2 ELSE '' END || nl || nl AS rec
         |  FROM h2, c)
         |SELECT shard,
         |  CAST(sum(CASE WHEN chg THEN 1 ELSE 0 END) AS BIGINT) AS n_response,
         |  CAST(sum(CASE WHEN chg THEN 0 ELSE 1 END) AS BIGINT) AS n_revisit,
         |  CAST(sum(length(rec)) AS BIGINT) AS n_bytes,
         |  md5(string_agg(rec, '' ORDER BY doc_id)) AS file_md5
         |FROM r GROUP BY shard ORDER BY shard""".stripMargin) {
      (s, d) =>
        val base = Tables.documents(s, d)
          .select(col("doc_id"), shellCol.as("html"),
            concat(lit("https://d"), pmod(col("doc_id"), lit(50)).cast("string"),
              lit(".example.com/p"), col("doc_id").cast("string")).as("uri"))
        // snapshot 1's digest index — at 100 TB this is the previous
        // crawl's CDX digest column, never its payloads
        val prior = base.select(col("uri"),
          md5(col("html").cast("binary")).as("digest1"))
        val snap2 = base.select(col("doc_id"),
          pmod(col("doc_id"), lit(8)).cast("int").as("shard"), col("uri"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("html"), lit("<!-- rev2 -->"))).otherwise(col("html"))
            .as("html2"))
        val joined = snap2.join(prior, Seq("uri"))
          .withColumn("rev", md5(col("html2").cast("binary")) === col("digest1"))
        val recs = joined.select(col("shard"), col("doc_id"), col("uri"),
          when(col("rev"), lit(Array.emptyByteArray))
            .otherwise(col("html2").cast("binary")).as("blob"),
          when(col("rev"), lit("revisit")).otherwise(lit("response")).as("wtype"),
          when(col("rev"), lit("message/http")).otherwise(lit("text/html")).as("ctype"))
        val counts = joined.groupBy("shard").agg(
          sum(when(col("rev"), 0L).otherwise(1L)).as("n_response"),
          sum(when(col("rev"), 1L).otherwise(0L)).as("n_revisit"))
        Sharding.packWarcShardsMixed(recs, "shard", "doc_id", "uri", "blob",
            "wtype", "ctype")
          .join(counts, Seq("shard"))
          .select(col("shard"), col("n_response"), col("n_revisit"),
            col("n_warc_bytes").as("n_bytes"), md5(col("warc")).as("file_md5"))
          .orderBy("shard")
    },
    // ── CDX lookup — the SERVE side of the index web_surt_cdx builds:
    //    a domain query is a keyset-paged PREFIX SCAN over the
    //    surt-sorted index ("everything under d7.example.com, first
    //    page of 20, after token") returning the (offset, rec_len)
    //    pairs a reader needs for ranged record fetches. Deterministic
    //    paging because surt keys are unique and both engines sort the
    //    same byte strings; the oracle replays the index arithmetic,
    //    the prefix predicate, and the LIMIT. Pins that SURT actually
    //    delivers its promise — the domain's records ARE one
    //    contiguous key range. ──
    QueryDef.sql(
      "web_cdx_lookup",
      s"""WITH c AS (SELECT chr(13) || chr(10) AS nl),
         |h AS (SELECT doc_id, doc_id % 50 AS m, CAST(doc_id % 8 AS INT) AS shard,
         |    $shellSql AS html FROM documents),
         |r AS (SELECT doc_id, m, shard, html,
         |    'WARC/1.0' || nl ||
         |    'WARC-Type: response' || nl ||
         |    'WARC-Record-ID: <urn:graft:' || lpad(CAST(doc_id AS VARCHAR), 12, '0') || '>' || nl ||
         |    'WARC-Date: 1970-01-01T00:00:00Z' || nl ||
         |    'WARC-Target-URI: https://d' || m || '.example.com/p' || doc_id || nl ||
         |    'Content-Type: text/html' || nl ||
         |    'Content-Length: ' || CAST(length(html) AS VARCHAR) || nl ||
         |    nl || html || nl || nl AS rec
         |  FROM h, c),
         |cdx AS (SELECT 'com,example,d' || m || ')/p' || doc_id AS surt, shard,
         |    coalesce(sum(length(rec)) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off,
         |    length(rec) AS rec_len
         |  FROM r)
         |SELECT surt, shard, CAST(off AS BIGINT) AS offset,
         |  CAST(rec_len AS BIGINT) AS rec_len
         |FROM cdx
         |WHERE surt > 'com,example,d7)/p' AND surt < 'com,example,d7)/q'
         |ORDER BY surt LIMIT 20""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d)
          .select(col("doc_id"), shellCol.as("html")).as[(Long, String)]
          .mapPartitions(_.map { case (id, html) =>
            (id, (id % 8).toInt, s"https://d${id % 50}.example.com/p$id",
              html.getBytes("UTF-8"))
          })
          .toDF("doc_id", "shard", "uri", "blob")
        val warcs = Sharding.packWarcShards(blobs, "shard", "doc_id", "uri", "blob")
        Sharding.warcIndex(warcs, "shard", "warc")
          .select(TextOps.urlSurt(col("target_uri")).as("surt"),
            col("shard"), col("offset"), col("rec_len"))
          .filter(col("surt") > "com,example,d7)/p" && col("surt") < "com,example,d7)/q")
          .orderBy("surt").limit(20)
    },
    // ── URL canonicalization — the frontier identity: four messy
    //    variants per doc (upper-cased scheme/host, explicit default
    //    ports, unsorted query params, utm_* tracking params, fragments,
    //    an empty path) collapse under RFC 3986 normalization. Three
    //    variants share one per-doc canonical; the fourth collapses
    //    ACROSS docs onto its domain's canonical — the seen-set dedup a
    //    crawl frontier actually performs. The oracle replays the same
    //    regexp split + CASE port strip + list sort in DuckDB; a rule
    //    drift in either engine splits a group and changes the counts. ──
    QueryDef.sql(
      "web_url_canonical",
      """WITH v AS (
        |  SELECT 'HTTP://D' || (doc_id % 50) || '.Example.COM:80/Path/p' || doc_id ||
        |         '?b=2&a=1&utm_source=x#frag' AS url FROM documents
        |  UNION ALL SELECT 'http://d' || (doc_id % 50) || '.example.com/Path/p' || doc_id ||
        |         '?a=1&b=2' FROM documents
        |  UNION ALL SELECT 'http://d' || (doc_id % 50) || '.example.com:80/Path/p' || doc_id ||
        |         '?utm_campaign=z&b=2&a=1#other' FROM documents
        |  UNION ALL SELECT 'https://H' || (doc_id % 50) || '.example.net:443?z=1&utm_x=1'
        |    FROM documents),
        |p AS (SELECT url,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 1)) AS sch,
        |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 2)) AS hp,
        |    regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 3) AS pa,
        |    regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\?([^#]*))?(?:#.*)?$', 4) AS qq
        |  FROM v),
        |n AS (SELECT
        |    sch || '://' ||
        |    (CASE WHEN sch = 'http' THEN regexp_replace(hp, ':80$', '')
        |          WHEN sch = 'https' THEN regexp_replace(hp, ':443$', '')
        |          ELSE hp END) ||
        |    (CASE WHEN pa = '' THEN '/' ELSE pa END) ||
        |    (CASE WHEN q2 = '' THEN '' ELSE '?' || q2 END) AS canonical
        |  FROM (SELECT sch, hp, pa,
        |          array_to_string(list_sort(list_filter(string_split(qq, '&'),
        |            x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') AS q2
        |        FROM p))
        |SELECT canonical, CAST(count(*) AS BIGINT) AS n_variants
        |FROM n GROUP BY canonical ORDER BY canonical""".stripMargin) {
      (s, d) =>
        val m = pmod(col("doc_id"), lit(50)).cast("string")
        val id = col("doc_id").cast("string")
        val variants = array(
          concat(lit("HTTP://D"), m, lit(".Example.COM:80/Path/p"), id,
            lit("?b=2&a=1&utm_source=x#frag")),
          concat(lit("http://d"), m, lit(".example.com/Path/p"), id, lit("?a=1&b=2")),
          concat(lit("http://d"), m, lit(".example.com:80/Path/p"), id,
            lit("?utm_campaign=z&b=2&a=1#other")),
          concat(lit("https://H"), m, lit(".example.net:443?z=1&utm_x=1")))
        Tables.documents(s, d)
          .select(explode(variants).as("url"))
          .select(TextOps.urlCanonicalize(col("url")).as("canonical"))
          .groupBy("canonical")
          .agg(count(lit(1)).cast("long").as("n_variants"))
          .orderBy("canonical")
    },
    // ── Percent-encoding normalization — the char-level half of
    //    frontier identity the regex canonicalizer documents away:
    //    "%41" and "A" spell one URL, and a crawl that treats them as
    //    two keys re-fetches pages and splits dedup families. Each doc
    //    spells its URL with an unreserved escape in the path (%41 →
    //    A, %7e → ~ — case-insensitive hex), a RESERVED escape in the
    //    query that must survive with UPPERCASED hex (%2f → %2F), and
    //    a lone malformed % that copies literally; the engine runs
    //    urlPctNormalize → urlCanonicalize and the oracle CONSTRUCTS
    //    the expected canonical from the seed — one mis-decoded
    //    escape, a dropped tilde, or a hex case drift breaks the
    //    hash. ──
    QueryDef.sql(
      "web_url_pct",
      """SELECT doc_id,
        |  'https://d' || (doc_id % 50) || '.example.com/pAth~' || doc_id ||
        |    '/x%25y/m%zq?a=%2Fv' || doc_id || '&b=2' AS canonical
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val m = pmod(col("doc_id"), lit(50)).cast("string")
        val id = col("doc_id").cast("string")
        val url = concat(
          lit("HTTPS://d"), m, lit(".example.com/p%41th%7e"), id,
          lit("/x%25y/m%zq?b=2&a=%2fv"), id, lit("#frag"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            TextOps.urlCanonicalize(TextOps.urlPctNormalize(url)).as("canonical"))
          .orderBy("doc_id")
    },
    // ── Redirect resolution — the hop between fetch and frontier
    //    identity: the seed builds a redirect edge per doc whose id ends
    //    in 0 (→ id+1) or 1 (→ id+2) — two-hop chains — plus a 7↔8
    //    two-cycle every 100 ids; the engine resolves every URL through
    //    maxHops=4 successive left joins and classifies targets that
    //    STILL redirect as loops. The oracle replays the identical walk
    //    as four LEFT JOINs against the same arithmetic edge CTE — an
    //    off-by-one in hop counting, a pass-through row advancing, or a
    //    loop escaping the probe breaks the hash. ──
    QueryDef.sql(
      "web_redirects",
      """WITH e AS (SELECT doc_id AS src,
        |    CASE WHEN doc_id % 100 = 7 THEN doc_id + 1
        |         WHEN doc_id % 100 = 8 THEN doc_id - 1
        |         WHEN doc_id % 10 = 0 THEN doc_id + 1
        |         WHEN doc_id % 10 = 1 THEN doc_id + 2 END AS dst
        |  FROM documents
        |  WHERE doc_id % 100 IN (7, 8) OR doc_id % 10 IN (0, 1)),
        |u AS (SELECT doc_id, doc_id AS t FROM documents),
        |h1 AS (SELECT u.doc_id, coalesce(e.dst, u.t) AS t,
        |    CASE WHEN e.dst IS NULL THEN 0 ELSE 1 END AS h
        |  FROM u LEFT JOIN e ON u.t = e.src),
        |h2 AS (SELECT h1.doc_id, coalesce(e.dst, h1.t) AS t,
        |    h1.h + CASE WHEN e.dst IS NULL THEN 0 ELSE 1 END AS h
        |  FROM h1 LEFT JOIN e ON h1.t = e.src),
        |h3 AS (SELECT h2.doc_id, coalesce(e.dst, h2.t) AS t,
        |    h2.h + CASE WHEN e.dst IS NULL THEN 0 ELSE 1 END AS h
        |  FROM h2 LEFT JOIN e ON h2.t = e.src),
        |h4 AS (SELECT h3.doc_id, coalesce(e.dst, h3.t) AS t,
        |    h3.h + CASE WHEN e.dst IS NULL THEN 0 ELSE 1 END AS h
        |  FROM h3 LEFT JOIN e ON h3.t = e.src),
        |p AS (SELECT h4.doc_id, h4.t, h4.h, e.src IS NOT NULL AS looping
        |  FROM h4 LEFT JOIN e ON h4.t = e.src)
        |SELECT doc_id,
        |  'https://d' || (t % 50) || '.example.com/p' || t AS final_url,
        |  CAST(h AS BIGINT) AS n_hops,
        |  CASE WHEN looping THEN 'redirect_loop' ELSE 'resolved' END AS status
        |FROM p ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        def url(idc: org.apache.spark.sql.Column) = concat(
          lit("https://d"), pmod(idc, lit(50)).cast("string"),
          lit(".example.com/p"), idc.cast("string"))
        val m100 = pmod(col("doc_id"), lit(100))
        val m10 = pmod(col("doc_id"), lit(10))
        val dstId = when(m100 === 7, col("doc_id") + 1)
          .when(m100 === 8, col("doc_id") - 1)
          .when(m10 === 0, col("doc_id") + 1)
          .when(m10 === 1, col("doc_id") + 2)
        val docs = Tables.documents(s, d)
        val edges = docs
          .select(url(col("doc_id")).as("src"), url(dstId).as("dst"))
          .filter(col("dst").isNotNull)
        val urls = docs.select(col("doc_id"), url(col("doc_id")).as("url"))
        graft.operators.Redirects.resolve(urls, "url", edges, "src", "dst", 4)
          .select(col("doc_id"), col("final_url"), col("n_hops"), col("status"))
          .orderBy("doc_id")
    },
    // ── Location-header reference RESOLUTION — the step between a 3xx
    //    response and the frontier: RFC 9110 allows RELATIVE Location
    //    values and real servers emit every form below, so the engine
    //    resolves against the request URL (RFC 3986 §5, TextOps
    //    .urlResolve as pure column ops) and canonicalizes. Six shapes
    //    by doc_id % 6: absolute (wins outright), protocol-relative
    //    (base scheme), absolute-path (base origin), sibling-with-query
    //    (merges against the base DIRECTORY, base query dropped per the
    //    RFC, target query sorted by the canonicalizer), ../ traversal
    //    (dot-segment fold), query-only (base path kept, base query
    //    REPLACED per the RFC). Seed-arithmetic oracle: DuckDB CONSTRUCTS each
    //    expected resolved URL directly from the id — one wrong merge
    //    rule, fold, or sort anywhere breaks that row's hash. ──
    QueryDef.sql(
      "web_redirect_resolve",
      """SELECT doc_id,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'https://ext' || (doc_id % 50) || '.org/x' || doc_id
        |    WHEN 1 THEN 'https://cdn' || (doc_id % 50) || '.example.net/lib' || doc_id || '.js'
        |    WHEN 2 THEN 'https://d' || (doc_id % 50) || '.example.com/r/p' || doc_id
        |    WHEN 3 THEN 'https://d' || (doc_id % 50) || '.example.com/a' || (doc_id % 7) || '/b/next' || doc_id || '?a=1&b=2'
        |    WHEN 4 THEN 'https://d' || (doc_id % 50) || '.example.com/a' || (doc_id % 7) || '/up/t' || doc_id
        |    ELSE 'https://d' || (doc_id % 50) || '.example.com/a' || (doc_id % 7) || '/b/c?page=' || doc_id
        |  END AS resolved
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val id = col("doc_id")
        val mS = pmod(id, lit(50)).cast("string")
        val kS = pmod(id, lit(7)).cast("string")
        val base = concat(lit("https://d"), mS, lit(".example.com/a"), kS,
          lit("/b/c?z=1"))
        val ref = when(pmod(id, lit(6)) === 0,
            concat(lit("https://ext"), mS, lit(".org/x"), id.cast("string")))
          .when(pmod(id, lit(6)) === 1,
            concat(lit("//cdn"), mS, lit(".example.net/lib"), id.cast("string"), lit(".js")))
          .when(pmod(id, lit(6)) === 2,
            concat(lit("/r/p"), id.cast("string")))
          .when(pmod(id, lit(6)) === 3,
            concat(lit("next"), id.cast("string"), lit("?b=2&a=1")))
          .when(pmod(id, lit(6)) === 4,
            concat(lit("../up/t"), id.cast("string")))
          .otherwise(concat(lit("?page="), id.cast("string")))
        Tables.documents(s, d)
          .select(id.as("doc_id"),
            TextOps.urlCanonicalize(TextOps.urlResolve(base, ref)).as("resolved"))
          .orderBy("doc_id")
    },

    // ── Sitemap round trip — the crawl's OTHER frontier source beside
    //    extracted links: the engine assembles each domain's sitemap
    //    XML (one <url> entry per doc, doc-id order — a real groupBy +
    //    ordered collect, the per-domain assembly shape), serves a
    //    third of the domains COMPRESSED (.xml.gz — the parse enters
    //    from bytes and gunzips by content), and parses it
    //    back through the flat-XML leaf extractor. The oracle never
    //    sees XML: it recomputes every per-domain aggregate — URL-list
    //    md5 in document order, lastmod range, priority mass — directly
    //    from the seed, so a lost entry, a reordered entry, or an
    //    extractor that swallows neighboring tags breaks the hash. ──
    QueryDef.sql(
      "web_sitemap",
      """WITH e AS (SELECT doc_id, doc_id % 50 AS m,
        |    'https://d' || (doc_id % 50) || '.example.com/p' || doc_id AS loc,
        |    '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod,
        |    doc_id % 9 + 1 AS pri FROM documents)
        |SELECT 'd' || m || '.example.com' AS domain,
        |  CAST(count(*) AS BIGINT) AS n_urls,
        |  md5(string_agg(loc, chr(10) ORDER BY doc_id)) AS locs_md5,
        |  min(lastmod) AS min_lastmod, max(lastmod) AS max_lastmod,
        |  CAST(sum(pri) AS BIGINT) AS pri_decis
        |FROM e GROUP BY m ORDER BY domain""".stripMargin) {
      (s, d) =>
        val m = pmod(col("doc_id"), lit(50)).cast("string")
        val id = col("doc_id").cast("string")
        val entry = concat(
          lit("<url><loc>https://d"), m, lit(".example.com/p"), id,
          lit("</loc><lastmod>2026-01-"),
          lpad((pmod(col("doc_id"), lit(28)) + 1).cast("string"), 2, "0"),
          lit("</lastmod><priority>0."),
          (pmod(col("doc_id"), lit(9)) + 1).cast("string"),
          lit("</priority></url>"))
        import s.implicits._
        val sitemaps = Tables.documents(s, d)
          .select(m.as("m"), struct(col("doc_id"), entry.as("e")).as("de"))
          .groupBy("m")
          .agg(concat(
            lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
              "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
            array_join(transform(array_sort(collect_list(col("de"))),
              x => x.getField("e")), ""),
            lit("</urlset>")).as("xml"))
        // a third of the domains publish `sitemap.xml.gz` (sitemaps.org
        // allows it): the parse enters from BYTES and must gunzip by
        // content before extraction — the oracle pins the DECODED parse
        // and never sees the wire form
        val wired = sitemaps.as[(String, String)].map { case (m0, xml) =>
          val b = xml.getBytes("UTF-8")
          (m0, if (m0.toLong % 3 == 0) graft.codec.GzipCodec.gzipMember(b) else b)
        }.toDF("m", "xmlb")
        val xmlC = TextOps.sitemapText(col("xmlb"))
        val parsed = wired.select(
          concat(lit("d"), col("m"), lit(".example.com")).as("domain"),
          TextOps.xmlTagValues(xmlC, "loc").as("locs"),
          TextOps.xmlTagValues(xmlC, "lastmod").as("mods"),
          TextOps.xmlTagValues(xmlC, "priority").as("pris"))
        parsed.select(col("domain"),
            size(col("locs")).cast("long").as("n_urls"),
            md5(array_join(col("locs"), "\n").cast("binary")).as("locs_md5"),
            array_min(col("mods")).as("min_lastmod"),
            array_max(col("mods")).as("max_lastmod"),
            aggregate(transform(col("pris"),
                p => substring(p, 3, 1).cast("long")),
              lit(0L), (acc, x) => acc + x).as("pri_decis"))
          .orderBy("domain")
    },
    // ── Sitemap INDEX files — the nesting layer large sites actually
    //    publish (sitemaps.org: a <sitemapindex> of <sitemap><loc>
    //    children, each a urlset): the engine parses the INDEX with
    //    the same leaf extractor, follows every child loc (the fetch
    //    step a crawler does — here the child builds deterministically
    //    from its identity), parses each child urlset, and rolls up
    //    per domain: child count, total URLs, the URL list hash in
    //    (child, position) order, and the index-level freshest
    //    lastmod. The oracle replays both layers arithmetically —
    //    a child dropped by the index parse or a URL dropped by the
    //    child parse moves two integers and the hash. ──
    QueryDef.sql(
      "web_sitemap_index",
      """WITH m AS (SELECT DISTINCT doc_id % 50 AS m FROM documents),
        |sm AS (SELECT m, unnest(range(0, 1 + m % 3)) AS j FROM m),
        |urls AS (SELECT m, j, unnest(range(0, 2 + (m + j) % 4)) AS i FROM sm),
        |u AS (SELECT m, j, i,
        |        'https://d' || m || '.example.com/c' || j || '/p' || i AS loc FROM urls),
        |lm AS (SELECT m, CAST(count(*) AS BIGINT) AS n_sitemaps,
        |         max('2026-02-' || lpad(CAST((m + j) % 28 + 1 AS VARCHAR), 2, '0')) AS max_lastmod
        |       FROM sm GROUP BY m)
        |SELECT 'd' || u.m || '.example.com' AS domain, lm.n_sitemaps,
        |  CAST(count(*) AS BIGINT) AS n_urls,
        |  md5(string_agg(loc, chr(10) ORDER BY j, i)) AS locs_md5,
        |  lm.max_lastmod
        |FROM u JOIN lm ON u.m = lm.m
        |GROUP BY 1, lm.n_sitemaps, lm.max_lastmod ORDER BY domain""".stripMargin) {
      (s, d) =>
        val mS = col("m").cast("string")
        val doms = Tables.documents(s, d)
          .select(pmod(col("doc_id"), lit(50)).cast("long").as("m")).distinct()
        import s.implicits._
        val idx = doms.select(col("m"), concat(
          lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
            "<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
          array_join(transform(sequence(lit(0L), pmod(col("m"), lit(3))),
            j => concat(lit("<sitemap><loc>https://d"), mS,
              lit(".example.com/sm_"), j.cast("string"),
              // every third child ships COMPRESSED (sitemaps.org allows
              // .xml.gz; large sites use it for exactly these children)
              when(pmod(col("m") + j, lit(3)) === 0, lit(".xml.gz"))
                .otherwise(lit(".xml")),
              lit("</loc><lastmod>2026-02-"),
              lpad((pmod(col("m") + j, lit(28)) + 1).cast("string"), 2, "0"),
              lit("</lastmod></sitemap>"))), ""),
          lit("</sitemapindex>")).as("xml"))
        val perDomain = idx.select(col("m"),
          size(TextOps.xmlTagValues(col("xml"), "loc")).cast("long").as("n_sitemaps"),
          array_max(TextOps.xmlTagValues(col("xml"), "lastmod")).as("max_lastmod"))
        // follow every child loc the INDEX parse surfaced
        val kids = idx.select(col("m"),
            explode(TextOps.xmlTagValues(col("xml"), "loc")).as("smloc"))
          .withColumn("j",
            regexp_extract(col("smloc"), "/sm_(\\d+)\\.xml(\\.gz)?$", 1).cast("long"))
        val childXml = kids.select(col("m"), col("j"), concat(
          lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
            "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
          array_join(transform(
            sequence(lit(0L), pmod(col("m") + col("j"), lit(4)) + 1),
            i => concat(lit("<url><loc>https://d"), mS, lit(".example.com/c"),
              col("j").cast("string"), lit("/p"), i.cast("string"),
              lit("</loc></url>"))), ""),
          lit("</urlset>")).as("xml"))
        // the fetch returns BYTES: the .xml.gz children arrive gzipped
        // and the parse gunzips by content before leaf extraction
        val childBytes = childXml.as[(Long, Long, String)].map { case (m0, j, xml) =>
          val b = xml.getBytes("UTF-8")
          (m0, j, if ((m0 + j) % 3 == 0) graft.codec.GzipCodec.gzipMember(b) else b)
        }.toDF("m", "j", "xmlb")
        val childUrls = childBytes.select(col("m"), col("j"),
          posexplode(TextOps.xmlTagValues(
            TextOps.sitemapText(col("xmlb")), "loc")).as(Seq("i", "loc")))
        childUrls
          .groupBy("m")
          .agg(count(lit(1)).cast("long").as("n_urls"),
            md5(array_join(transform(
              array_sort(collect_list(struct(col("j"), col("i"), col("loc")))),
              x => x.getField("loc")), "\n").cast("binary")).as("locs_md5"))
          .join(perDomain, Seq("m"))
          .select(concat(lit("d"), mS, lit(".example.com")).as("domain"),
            col("n_sitemaps"), col("n_urls"), col("locs_md5"), col("max_lastmod"))
          .orderBy("domain")
    },
    // ── Anchor-text rollup — the signal htmlLinks loses: what the web
    //    CALLS a page belongs to the TARGET document (ranking/training
    //    signal), and it only exists at markup level — after tag strip
    //    the target is gone and the words have lost their attribution.
    //    The engine extracts (href, leaf text) pairs from seed-built
    //    markup (an img src and a nested-markup anchor must NOT
    //    contribute) and rolls them up per target domain. The oracle
    //    rebuilds both anchor families arithmetically — a pair
    //    misalignment between the two zipped extraction passes
    //    scrambles text attribution and breaks the counts. ──
    QueryDef.sql(
      "web_anchor_text",
      """WITH a AS (
        |  SELECT 'd' || ((doc_id + 1) % 50) || '.example.com' AS domain,
        |    'next ' || (doc_id + 1) AS text FROM documents
        |  UNION ALL
        |  SELECT 'd' || ((doc_id * 7 + 3) % 50) || '.example.com',
        |    'ref ' || doc_id FROM documents)
        |SELECT domain, CAST(count(*) AS BIGINT) AS n_anchors,
        |  CAST(count(DISTINCT text) AS BIGINT) AS n_texts,
        |  CAST(sum(length(text)) AS BIGINT) AS sum_text_len
        |FROM a GROUP BY domain ORDER BY domain""".stripMargin) {
      (s, d) =>
        val id = col("doc_id")
        val html = concat(
          lit("<p><a href=\"https://d"), pmod(id + 1, lit(50)).cast("string"),
          lit(".example.com/p"), (id + 1).cast("string"),
          lit("\">next "), (id + 1).cast("string"), lit("</a>"),
          lit("<img src=\"https://img.example.com/"), id.cast("string"),
          lit(".png\"><a class=\"z\" href=\"https://d"),
          pmod(id * 7 + 3, lit(50)).cast("string"),
          lit(".example.com/q"), id.cast("string"),
          lit("\">ref "), id.cast("string"), lit("</a>"),
          lit("<a href=\"https://x.example.com/n\"><b>nested</b></a></p>"))
        Tables.documents(s, d)
          .select(explode(TextOps.htmlAnchors(html)).as("a"))
          .select(regexp_extract(col("a.target"), "^https?://([^/]*)", 1).as("domain"),
            col("a.text").as("text"))
          .groupBy("domain")
          .agg(count(lit(1)).cast("long").as("n_anchors"),
            countDistinct(col("text")).cast("long").as("n_texts"),
            sum(length(col("text"))).cast("long").as("sum_text_len"))
          .orderBy("domain")
    },
    // ── Incremental recrawl planner — what keeps a 100 TB crawl
    //    incremental instead of full: the sitemap's lastmod (page
    //    changed on day id%28+1) joins the crawl ledger's last-fetch
    //    date (fetched on day id%14+1) on the URL, and only pages
    //    modified AFTER their last fetch re-enter the frontier.
    //    Zero-padded ISO dates compare as strings in both engines. The
    //    oracle replays the day arithmetic and pins the stale set by
    //    id-sum, not just count. ──
    QueryDef.sql(
      "web_recrawl_plan",
      """WITH u AS (SELECT doc_id, doc_id % 50 AS m,
        |    '2026-01-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') AS lastmod,
        |    '2026-01-' || lpad(CAST(doc_id % 14 + 1 AS VARCHAR), 2, '0') AS last_fetch
        |  FROM documents)
        |SELECT 'd' || m || '.example.com' AS domain,
        |  CAST(count(*) AS BIGINT) AS n_urls,
        |  CAST(sum(CASE WHEN lastmod > last_fetch THEN 1 ELSE 0 END) AS BIGINT) AS n_stale,
        |  CAST(sum(CASE WHEN lastmod > last_fetch THEN doc_id ELSE 0 END) AS BIGINT) AS stale_id_sum
        |FROM u GROUP BY m ORDER BY domain""".stripMargin) {
      (s, d) =>
        val id = col("doc_id")
        val url = concat(lit("https://d"), pmod(id, lit(50)).cast("string"),
          lit(".example.com/p"), id.cast("string"))
        val sitemap = Tables.documents(s, d).select(id.as("doc_id"), url.as("url"),
          concat(lit("2026-01-"),
            lpad((pmod(id, lit(28)) + 1).cast("string"), 2, "0")).as("lastmod"))
        val ledger = Tables.documents(s, d).select(url.as("url"),
          concat(lit("2026-01-"),
            lpad((pmod(id, lit(14)) + 1).cast("string"), 2, "0")).as("last_fetch"))
        sitemap.join(ledger, Seq("url"))
          .withColumn("stale", col("lastmod") > col("last_fetch"))
          .groupBy(regexp_extract(col("url"), "^https?://([^/]*)", 1).as("domain"))
          .agg(count(lit(1)).cast("long").as("n_urls"),
            sum(when(col("stale"), 1L).otherwise(0L)).as("n_stale"),
            sum(when(col("stale"), col("doc_id")).otherwise(0L)).as("stale_id_sum"))
          .orderBy("domain")
    },
    // ── Politeness scheduler — the frontier's LAST stage: per-host
    //    fetch slots. Each host serializes its fetches (priority
    //    descending, id ascending as the tiebreak) with its own
    //    crawl-delay (the robots Crawl-delay seed, (1+m%5)·250 ms), so
    //    slot k fires at k·delay. Unlike a per-domain CAP (a bounded
    //    heap — the e9 doctrine), a schedule needs EVERY rank: the rank
    //    IS the output, so the per-host window is the honest shape. The
    //    window partition is one host's frontier slice — bounded in
    //    practice by the upstream per-domain cap (pipeline_web_corpus),
    //    and at 100 TB further sliced by scheduling epoch before
    //    ranking. The oracle replays the same window. ──
    QueryDef.sql(
      "web_fetch_schedule",
      """WITH u AS (SELECT doc_id, doc_id % 50 AS m, doc_id % 9 + 1 AS pri
        |  FROM documents)
        |SELECT doc_id, 'd' || m || '.example.com' AS domain,
        |  CAST(row_number() OVER (PARTITION BY m ORDER BY pri DESC, doc_id) - 1
        |    AS BIGINT) AS slot,
        |  CAST((row_number() OVER (PARTITION BY m ORDER BY pri DESC, doc_id) - 1)
        |    * (1 + m % 5) * 250 AS BIGINT) AS sched_ms
        |FROM u ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("m").orderBy(desc("pri"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), pmod(col("doc_id"), lit(50)).as("m"),
            (pmod(col("doc_id"), lit(9)) + 1).as("pri"))
          .withColumn("slot", (row_number().over(w) - 1).cast("long"))
          .select(col("doc_id"),
            concat(lit("d"), col("m").cast("string"), lit(".example.com")).as("domain"),
            col("slot"),
            (col("slot") * (pmod(col("m"), lit(5)) + 1) * 250).cast("long").as("sched_ms"))
          .orderBy("doc_id")
    },
    // ── Charset front gate — the decode stage between raw HTTP payload
    //    bytes and every text operator: per doc the fixture ENCODES a
    //    known string into one of TWELVE shapes chosen by doc_id % 12
    //    (plain utf-8, BOM'd utf-16le, heuristic-detected windows-1252
    //    via its 0x80-0x9F block, meta-declared iso-8859-1, the
    //    meta-declared legacy-CJK family shift_jis / gb2312 / euc-kr,
    //    and five UNLABELED rows exercising content detection: big5 /
    //    shift_jis / euc-kr / euc-jp bytes each strictly validate and
    //    read script-plausible in exactly ONE family and so RECOVER
    //    their charset and exact text with no declaration at all,
    //    while dense KOI8-R Cyrillic — valid half-width-katakana
    //    shift_jis byte-wise, the measured false-positive channel —
    //    stays quarantined as `unknown`: empty text, raw bytes kept).
    //    The engine's sniff (BOM > declared label > strict UTF-8
    //    validity > content detection > C1 heuristic) + strict decode
    //    must recover BOTH the label and the exact text. Seed-
    //    arithmetic doctrine: the oracle never touches bytes — it
    //    rebuilds the expected decoded string per doc and hashes it,
    //    so one mis-decoded byte anywhere (a cp1252 table cell, a BOM
    //    not stripped, a meta alias missed, a CJK table divergence, a
    //    detection threshold drift) breaks that row's hash. ──
    QueryDef.sql(
      "web_charset_decode",
      """SELECT doc_id,
        |  CASE doc_id % 12 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
        |    WHEN 2 THEN 'windows-1252' WHEN 3 THEN 'iso-8859-1'
        |    WHEN 4 THEN 'shift_jis' WHEN 5 THEN 'gbk' WHEN 6 THEN 'euc-kr'
        |    WHEN 7 THEN 'big5' WHEN 8 THEN 'shift_jis' WHEN 9 THEN 'euc-kr'
        |    WHEN 10 THEN 'koi8-r' ELSE 'euc-jp' END AS charset,
        |  CAST(length(t) AS BIGINT) AS n_chars, md5(t) AS text_md5
        |FROM (SELECT doc_id,
        |  CASE doc_id % 12
        |    WHEN 0 THEN 'Doc ' || doc_id || ' café déjà — €ok'
        |    WHEN 1 THEN 'Doc ' || doc_id || ' unicode ∑ check ✓'
        |    WHEN 2 THEN 'Doc ' || doc_id || ' price €9 – “quoted”'
        |    WHEN 3 THEN '<meta charset="iso-8859-1">Doc ' || doc_id || ' résumé ñandú'
        |    WHEN 4 THEN '<meta charset=shift_jis>Doc ' || doc_id || ' 日本語テスト'
        |    WHEN 5 THEN '<meta charset=gb2312>Doc ' || doc_id || ' 中文测试文档'
        |    WHEN 6 THEN '<meta charset=euc-kr>Doc ' || doc_id || ' 한국어문서'
        |    WHEN 7 THEN 'Doc ' || doc_id || ' 繁體中文測試文件編碼處理'
        |    WHEN 8 THEN 'Doc ' || doc_id || ' 日本語のテスト文書です'
        |    WHEN 9 THEN 'Doc ' || doc_id || ' 한국어문서입니다'
        |    WHEN 10 THEN 'Doc ' || doc_id || ' русский текст без метки'
        |    ELSE 'Doc ' || doc_id || ' これは日本語の文書です'
        |  END AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = Tables.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val (cs, text) = (id % 12) match {
              case 0 => ("utf-8", s"Doc $id café déjà — €ok")
              case 1 => ("utf-16le", s"Doc $id unicode ∑ check ✓")
              case 2 => ("windows-1252", s"Doc $id price €9 – “quoted”")
              case 3 => ("iso-8859-1", s"""<meta charset="iso-8859-1">Doc $id résumé ñandú""")
              case 4 => ("shift_jis", s"<meta charset=shift_jis>Doc $id 日本語テスト")
              case 5 => ("gbk", s"<meta charset=gb2312>Doc $id 中文测试文档")
              case 6 => ("euc-kr", s"<meta charset=euc-kr>Doc $id 한국어문서")
              // UNLABELED rows: 7-9 and 11 content-detect (exactly one
              // plausible family each); 10 is the KOI8-R channel — its
              // bytes are VALID shift_jis kana, which the multi-byte
              // kana gate rejects, and since round 14 the single-byte
              // sweep then attributes the page correctly
              case 7 => ("big5", s"Doc $id 繁體中文測試文件編碼處理")
              case 8 => ("shift_jis", s"Doc $id 日本語のテスト文書です")
              case 9 => ("euc-kr", s"Doc $id 한국어문서입니다")
              case 10 => ("koi8-r", s"Doc $id русский текст без метки")
              case _ => ("euc-jp", s"Doc $id これは日本語の文書です")
            }
            (id, graft.codec.CharsetCodec.encode(text, cs))
          })
          .toDF("doc_id", "payload")
        TextOps.decodeCharset(payloads, "payload", "charset", "t")
          .select(col("doc_id"), col("charset"),
            length(col("t")).cast("long").as("n_chars"),
            md5(col("t").cast("binary")).as("text_md5"))
          .orderBy("doc_id")
    },

    // ── Single-byte legacy charsets beyond Latin-1 — the Cyrillic /
    //    Greek / Turkish / Central-European / Hebrew / Thai slice of
    //    the legacy web (~8% after CJK): meta-declared pages decode
    //    through the JDK tables under the same strict doctrine as the
    //    CJK family — seven-way since round 13 (windows-1255 Hebrew +
    //    Thai via the tis-620 alias of windows-874 join the matrix).
    //    Same seed-arithmetic pin: the oracle rebuilds
    //    the expected decoded text per doc and hashes it — one
    //    drifted table cell or a dropped alias breaks a seventh of the
    //    rows. ──
    QueryDef.sql(
      "web_charset_legacy",
      """SELECT doc_id,
        |  CASE doc_id % 7 WHEN 0 THEN 'windows-1251' WHEN 1 THEN 'koi8-r'
        |    WHEN 2 THEN 'iso-8859-7' WHEN 3 THEN 'windows-1254'
        |    WHEN 4 THEN 'iso-8859-2' WHEN 5 THEN 'windows-1255'
        |    ELSE 'windows-874' END AS charset,
        |  CAST(length(t) AS BIGINT) AS n_chars, md5(t) AS text_md5
        |FROM (SELECT doc_id,
        |  CASE doc_id % 7
        |    WHEN 0 THEN '<meta charset=windows-1251>Док ' || doc_id || ' русский текст'
        |    WHEN 1 THEN '<meta charset=koi8-r>Док ' || doc_id || ' советский стандарт'
        |    WHEN 2 THEN '<meta charset=greek>Σελ ' || doc_id || ' ελληνικό κείμενο'
        |    WHEN 3 THEN '<meta charset=latin5>Sayfa ' || doc_id || ' Türkçe ğüşıöç'
        |    WHEN 4 THEN '<meta charset=latin2>Str ' || doc_id || ' žluťoučký kůň'
        |    WHEN 5 THEN '<meta charset=windows-1255>דף ' || doc_id || ' מסמך בדיקה בעברית כאן'
        |    ELSE '<meta charset=tis-620>หน้า ' || doc_id || ' เอกสารทดสอบภาษาไทย'
        |  END AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = Tables.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val (cs, text) = (id % 7) match {
              case 0 => ("windows-1251", s"<meta charset=windows-1251>Док $id русский текст")
              case 1 => ("koi8-r", s"<meta charset=koi8-r>Док $id советский стандарт")
              case 2 => ("iso-8859-7", s"<meta charset=greek>Σελ $id ελληνικό κείμενο")
              case 3 => ("windows-1254", s"<meta charset=latin5>Sayfa $id Türkçe ğüşıöç")
              case 4 => ("iso-8859-2", s"<meta charset=latin2>Str $id žluťoučký kůň")
              case 5 => ("windows-1255", s"<meta charset=windows-1255>דף $id מסמך בדיקה בעברית כאן")
              // tis-620 is a WHATWG alias of the windows-874 family
              case _ => ("windows-874", s"<meta charset=tis-620>หน้า $id เอกสารทดสอบภาษาไทย")
            }
            (id, graft.codec.CharsetCodec.encode(text, cs))
          })
          .toDF("doc_id", "payload")
        TextOps.decodeCharset(payloads, "payload", "charset", "t")
          .select(col("doc_id"), col("charset"),
            length(col("t")).cast("long").as("n_chars"),
            md5(col("t").cast("binary")).as("text_md5"))
          .orderBy("doc_id")
    },

    // ── UNLABELED single-byte detection — the round-14 recovery pass:
    //    dense non-Latin pages with no BOM, no header, no meta. Strict
    //    decoding cannot disambiguate single-byte maps (nearly every
    //    byte is valid in all of them), so the sweep reads the DECODED
    //    text: allowed-blocks one-strike, case shape, and a language
    //    signal (Russian/Greek bigram heads, letter heads elsewhere,
    //    Thai combining-mark position rules, Hebrew final-form rules),
    //    accept iff exactly one candidate passes — the iso-8859-7 row
    //    lands on windows-1253 because the two Greek maps decode the
    //    whole letter grid IDENTICALLY and equal-text ties collapse to
    //    the canonical candidate (there is no wrong choice to make).
    //    Eight-way matrix, verdict + exact decoded text pinned per
    //    row; the oracle rebuilds both arithmetically from the seed. ──
    QueryDef.sql(
      "web_charset_unlabeled",
      """SELECT doc_id,
        |  CASE doc_id % 8 WHEN 0 THEN 'windows-1251' WHEN 1 THEN 'koi8-r'
        |    WHEN 2 THEN 'iso-8859-5' WHEN 3 THEN 'windows-1253'
        |    WHEN 4 THEN 'windows-1253' WHEN 5 THEN 'windows-1255'
        |    WHEN 6 THEN 'windows-1256' ELSE 'windows-874' END AS charset,
        |  CAST(length(t) AS BIGINT) AS n_chars, md5(t) AS text_md5
        |FROM (SELECT doc_id,
        |  'Doc ' || doc_id || ' ' ||
        |  CASE doc_id % 8
        |    WHEN 0 THEN 'Старые страницы по прежнему стоят на месте и текст статьи знает состав ответа'
        |    WHEN 1 THEN 'Старые страницы по прежнему стоят на месте и текст статьи знает состав ответа'
        |    WHEN 2 THEN 'Старые страницы по прежнему стоят на месте и текст статьи знает состав ответа'
        |    WHEN 3 THEN 'Το ελληνικό κείμενο της σελίδας περιέχει αρκετές λέξεις για τον έλεγχο της γλώσσας'
        |    WHEN 4 THEN 'Το ελληνικό κείμενο της σελίδας περιέχει αρκετές λέξεις για τον έλεγχο της γλώσσας'
        |    WHEN 5 THEN 'הדף הזה מכיל טקסט בעברית עם מספיק מילים כדי לבדוק את הזיהוי של השפה'
        |    WHEN 6 THEN 'هذه الصفحة تحتوي على نص عربي طويل بما يكفي لاختبار التعرف على اللغة'
        |    ELSE 'หน้านี้มีข้อความภาษาไทยยาวพอสำหรับการทดสอบการตรวจจับภาษา'
        |  END AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val ru = "Старые страницы по прежнему стоят на месте и текст статьи знает состав ответа"
        val el = "Το ελληνικό κείμενο της σελίδας περιέχει αρκετές λέξεις για τον έλεγχο της γλώσσας"
        val he = "הדף הזה מכיל טקסט בעברית עם מספיק מילים כדי לבדוק את הזיהוי של השפה"
        val ar = "هذه الصفحة تحتوي على نص عربي طويل بما يكفي لاختبار التعرف على اللغة"
        val th = "หน้านี้มีข้อความภาษาไทยยาวพอสำหรับการทดสอบการตรวจจับภาษา"
        val payloads = Tables.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val (cs, body) = (id % 8) match {
              case 0 => ("windows-1251", ru)
              case 1 => ("koi8-r", ru)
              case 2 => ("iso-8859-5", ru)
              case 3 => ("windows-1253", el)
              case 4 => ("iso-8859-7", el) // same bytes as windows-1253
              case 5 => ("windows-1255", he)
              case 6 => ("windows-1256", ar)
              case _ => ("windows-874", th)
            }
            (id, graft.codec.CharsetCodec.encode(s"Doc $id $body", cs))
          })
          .toDF("doc_id", "payload")
        TextOps.decodeCharset(payloads, "payload", "charset", "t")
          .select(col("doc_id"), col("charset"),
            length(col("t")).cast("long").as("n_chars"),
            md5(col("t").cast("binary")).as("text_md5"))
          .orderBy("doc_id")
    },

    // ── Corpus charset PROFILE — the mix statistic that motivates the
    //    gate (real crawls run 15-25% legacy, ~10-15% of it CJK): per
    //    detected charset, page count, wire-byte mass, and the
    //    normalized-utf-8 byte mass the archive becomes — rolled up
    //    from the same twelve-way fixture by one partial-agg groupBy
    //    (10 output rows at any corpus size: the FIVE unlabeled
    //    content-DETECTED rows fold into their true charsets — the
    //    recovered mass the detector buys; since round 14 that includes
    //    the unlabeled koi8-r row, which the single-byte sweep
    //    attributes instead of quarantining).
    //    Wire sizes are charset geometry the oracle replays: 2 bytes
    //    per CJK char in the double-byte charsets, so wire =
    //    char-length + CJK-char-count. ──
    QueryDef.sql(
      "web_charset_profile",
      """WITH t AS (SELECT doc_id, doc_id % 12 AS m,
        |  CASE doc_id % 12 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
        |    WHEN 2 THEN 'windows-1252' WHEN 3 THEN 'iso-8859-1'
        |    WHEN 4 THEN 'shift_jis' WHEN 5 THEN 'gbk' WHEN 6 THEN 'euc-kr'
        |    WHEN 7 THEN 'big5' WHEN 8 THEN 'shift_jis' WHEN 9 THEN 'euc-kr'
        |    WHEN 10 THEN 'koi8-r' ELSE 'euc-jp' END AS charset,
        |  CASE doc_id % 12
        |    WHEN 0 THEN 'Doc ' || doc_id || ' café déjà — €ok'
        |    WHEN 1 THEN 'Doc ' || doc_id || ' unicode ∑ check ✓'
        |    WHEN 2 THEN 'Doc ' || doc_id || ' price €9 – “quoted”'
        |    WHEN 3 THEN '<meta charset="iso-8859-1">Doc ' || doc_id || ' résumé ñandú'
        |    WHEN 4 THEN '<meta charset=shift_jis>Doc ' || doc_id || ' 日本語テスト'
        |    WHEN 5 THEN '<meta charset=gb2312>Doc ' || doc_id || ' 中文测试文档'
        |    WHEN 6 THEN '<meta charset=euc-kr>Doc ' || doc_id || ' 한국어문서'
        |    WHEN 7 THEN 'Doc ' || doc_id || ' 繁體中文測試文件編碼處理'
        |    WHEN 8 THEN 'Doc ' || doc_id || ' 日本語のテスト文書です'
        |    WHEN 9 THEN 'Doc ' || doc_id || ' 한국어문서입니다'
        |    WHEN 10 THEN 'Doc ' || doc_id || ' русский текст без метки'
        |    ELSE 'Doc ' || doc_id || ' これは日本語の文書です'
        |  END AS txt FROM documents)
        |SELECT charset, CAST(count(*) AS BIGINT) AS n_pages,
        |  CAST(sum(CASE m WHEN 0 THEN strlen(txt)
        |    WHEN 1 THEN 2 + 2 * length(txt)
        |    WHEN 4 THEN length(txt) + 6 WHEN 5 THEN length(txt) + 6
        |    WHEN 6 THEN length(txt) + 5 WHEN 7 THEN length(txt) + 12
        |    WHEN 8 THEN length(txt) + 11 WHEN 9 THEN length(txt) + 8
        |    WHEN 11 THEN length(txt) + 11
        |    ELSE length(txt) END) AS BIGINT) AS wire_bytes,
        |  CAST(sum(strlen(txt)) AS BIGINT) AS utf8_bytes
        |FROM t GROUP BY charset ORDER BY charset""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = Tables.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val (cs, text) = (id % 12) match {
              case 0 => ("utf-8", s"Doc $id café déjà — €ok")
              case 1 => ("utf-16le", s"Doc $id unicode ∑ check ✓")
              case 2 => ("windows-1252", s"Doc $id price €9 – “quoted”")
              case 3 => ("iso-8859-1", s"""<meta charset="iso-8859-1">Doc $id résumé ñandú""")
              case 4 => ("shift_jis", s"<meta charset=shift_jis>Doc $id 日本語テスト")
              case 5 => ("gbk", s"<meta charset=gb2312>Doc $id 中文测试文档")
              case 6 => ("euc-kr", s"<meta charset=euc-kr>Doc $id 한국어문서")
              case 7 => ("big5", s"Doc $id 繁體中文測試文件編碼處理")
              case 8 => ("shift_jis", s"Doc $id 日本語のテスト文書です")
              case 9 => ("euc-kr", s"Doc $id 한국어문서입니다")
              case 10 => ("koi8-r", s"Doc $id русский текст без метки")
              case _ => ("euc-jp", s"Doc $id これは日本語の文書です")
            }
            (id, graft.codec.CharsetCodec.encode(text, cs))
          })
          .toDF("doc_id", "payload")
        TextOps.decodeCharset(payloads, "payload", "charset", "t")
          .groupBy("charset")
          .agg(count(lit(1)).cast("long").as("n_pages"),
            sum(length(col("payload"))).cast("long").as("wire_bytes"),
            sum(length(col("t").cast("binary"))).cast("long").as("utf8_bytes"))
          .orderBy("charset")
    },

    // ── Transcode-to-UTF-8 normalization — what a crawl actually DOES
    //    with the charset gate's output: re-encode every payload as
    //    utf-8 and account the byte delta (the storage planning number
    //    for normalizing a mixed-encoding archive). Every byte count
    //    is arithmetic the oracle replays: the wire size is charset
    //    geometry (1 byte/char for the single-byte pages, 2 + 2·chars
    //    for BOM'd utf-16le BMP text, octet_length for utf-8) and the
    //    normalized size is octet_length of the SAME text — so a
    //    transcoding bug that substitutes or drops one character moves
    //    two integers and a hash. ──
    QueryDef.sql(
      "web_transcode",
      """SELECT doc_id,
        |  CASE doc_id % 4 WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
        |    WHEN 2 THEN 'windows-1252' ELSE 'iso-8859-1' END AS charset,
        |  CAST(CASE doc_id % 4 WHEN 0 THEN strlen(t)
        |    WHEN 1 THEN 2 + 2 * length(t) ELSE length(t) END AS BIGINT) AS n_bytes_wire,
        |  CAST(strlen(t) AS BIGINT) AS n_bytes_utf8,
        |  md5(t) AS utf8_md5
        |FROM (SELECT doc_id,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'Doc ' || doc_id || ' café déjà — €ok'
        |    WHEN 1 THEN 'Doc ' || doc_id || ' unicode ∑ check ✓'
        |    WHEN 2 THEN 'Doc ' || doc_id || ' price €9 – “quoted”'
        |    ELSE '<meta charset="iso-8859-1">Doc ' || doc_id || ' résumé ñandú'
        |  END AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = Tables.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val (cs, text) = (id % 4) match {
              case 0 => ("utf-8", s"Doc $id café déjà — €ok")
              case 1 => ("utf-16le", s"Doc $id unicode ∑ check ✓")
              case 2 => ("windows-1252", s"Doc $id price €9 – “quoted”")
              case _ => ("iso-8859-1", s"""<meta charset="iso-8859-1">Doc $id résumé ñandú""")
            }
            (id, graft.codec.CharsetCodec.encode(text, cs))
          })
          .toDF("doc_id", "payload")
        TextOps.decodeCharset(payloads, "payload", "charset", "t")
          .select(col("doc_id"), col("charset"),
            length(col("payload")).cast("long").as("n_bytes_wire"),
            length(col("t").cast("binary")).cast("long").as("n_bytes_utf8"),
            md5(col("t").cast("binary")).as("utf8_md5"))
          .orderBy("doc_id")
    },

    // ── Crawl-funnel capstone — the acquisition stages COMPOSED: a
    //    4-spellings-per-doc frontier (two path families × two messy
    //    spellings each) canonicalizes, dedups on the canonical form
    //    (4 → 2 per doc), gates through the REAL robots parser (the
    //    web_robots_gate corpus: `*` group with /private + Allow
    //    /private/ok, m%3=0 adds Disallow /Path, m%5=0 domains have a
    //    graftbot group that flips BOTH verdicts: Allow / admits /Path,
    //    Disallow /private blocks /private/ok), and schedules survivors
    //    into per-host politeness slots. The oracle replays everything
    //    ARITHMETICALLY from the seed — frontier/unique counts, the
    //    m%3 × m%5 verdict matrix, makespan = (n_allowed−1)·delay — so
    //    a drift in ANY stage (a canonicalization rule splitting a
    //    group, an agent-selection leak, a slot off-by-one) lands in
    //    some domain's row. ──
    QueryDef.sql(
      "pipeline_crawl",
      """WITH d AS (SELECT doc_id, doc_id % 50 AS m FROM documents),
        |g AS (SELECT m, count(*) AS n_docs FROM d GROUP BY m),
        |verd AS (SELECT m, n_docs,
        |    CASE WHEN m % 3 <> 0 OR m % 5 = 0 THEN 1 ELSE 0 END AS fam0,
        |    CASE WHEN m % 5 <> 0 THEN 1 ELSE 0 END AS fam1
        |  FROM g)
        |SELECT 'd' || m || '.example.com' AS domain,
        |  CAST(n_docs * 4 AS BIGINT) AS n_frontier,
        |  CAST(n_docs * 2 AS BIGINT) AS n_unique,
        |  CAST(n_docs * (fam0 + fam1) AS BIGINT) AS n_allowed,
        |  CAST((n_docs * (fam0 + fam1) - 1) * (1 + m % 5) * 250 AS BIGINT) AS makespan_ms
        |FROM verd ORDER BY domain""".stripMargin) {
      (s, d) =>
        val m = pmod(col("doc_id"), lit(50)).cast("string")
        val id = col("doc_id").cast("string")
        val variants = array(
          concat(lit("HTTP://D"), m, lit(".Example.COM:80/Path/p"), id,
            lit("?b=2&a=1&utm_x=1#f")),
          concat(lit("http://d"), m, lit(".example.com/Path/p"), id, lit("?a=1&b=2")),
          concat(lit("https://D"), m, lit(".example.com:443/private/ok/x"), id),
          concat(lit("https://d"), m, lit(".example.com/private/ok/x"), id))
        val canon = Tables.documents(s, d)
          .select(explode(variants).as("url"))
          .select(TextOps.urlCanonicalize(col("url")).as("canonical"))
          .withColumn("domain",
            regexp_extract(col("canonical"), "^https?://([^/?#]*)", 1))
        val nFrontier = canon.groupBy("domain")
          .agg(count(lit(1)).cast("long").as("n_frontier"))
        val unique = canon.groupBy("domain", "canonical").agg(count(lit(1)).as("_n"))
          .withColumn("path",
            regexp_extract(col("canonical"), "^https?://[^/?#]*([^?#]*)", 1))
        val nUnique = unique.groupBy("domain")
          .agg(count(lit(1)).cast("long").as("n_unique"))
        // the REAL robots corpus: same builder as web_robots_gate
        val mL = pmod(col("doc_id"), lit(50))
        val robots = Tables.documents(s, d)
          .select(mL.cast("long").as("m")).distinct()
          .select(
            concat(lit("d"), col("m").cast("string"), lit(".example.com")).as("domain"),
            concat(
              lit("User-agent: *\nDisallow: /private\nAllow: /private/ok\n"),
              when(col("m") % 3 === 0, lit("Disallow: /Path\n")).otherwise(lit("")),
              when(col("m") % 5 === 0,
                lit("\nUser-agent: graftbot\nAllow: /\nDisallow: /private\n"))
                .otherwise(lit(""))).as("txt"))
        val rules = graft.operators.Robots.rulesFrame(robots, "domain", "txt")
        val gated = graft.operators.Robots
          .evaluate(unique.select("domain", "canonical", "path"), rules, "graftbot")
          .filter(col("allowed"))
        // politeness slots over the admitted frontier; makespan per host
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("domain").orderBy("canonical")
        val sched = gated
          .withColumn("slot", (row_number().over(w) - 1).cast("long"))
          .withColumn("_m", regexp_extract(col("domain"), "^d([0-9]+)\\.", 1).cast("long"))
          .groupBy("domain")
          .agg(count(lit(1)).cast("long").as("n_allowed"),
            max(col("slot") * (pmod(col("_m"), lit(5)) + 1) * 250).as("makespan_ms"))
        nFrontier.join(nUnique, Seq("domain")).join(sched, Seq("domain"))
          .orderBy("domain")
    },
    // ── robots.txt DIRECTIVES wired to their consumers — Crawl-delay
    //    parses per agent group (group-state machine shared with the
    //    rule parser; fractional seconds → exact ms) and feeds the
    //    per-host politeness schedule DIRECTLY, replacing the external
    //    delay seed; Sitemap lines parse file-global and their count
    //    rides each row. Fixture: every domain's `*` group declares an
    //    integer delay, every 4th domain adds a graftbot group with a
    //    FRACTIONAL delay that must win agent selection, and domains
    //    carry 1-3 sitemap URLs. The oracle replays delay selection,
    //    ms arithmetic, sitemap counts, and the schedule window from
    //    the seed — a group leak, a truncated fraction, or a sitemap
    //    attached to the wrong scope lands in some row. ──
    QueryDef.sql(
      "web_robots_directives",
      """WITH u AS (SELECT doc_id, doc_id % 50 AS m, doc_id % 9 + 1 AS pri FROM documents),
        |d AS (SELECT m,
        |        CASE WHEN m % 4 = 0 THEN 500 * (1 + m % 3)
        |             ELSE 1000 * (1 + m % 5) END AS delay_ms,
        |        m % 3 + 1 AS n_sitemaps
        |      FROM (SELECT DISTINCT doc_id % 50 AS m FROM documents))
        |SELECT u.doc_id, 'd' || u.m || '.example.com' AS domain,
        |  CAST(d.delay_ms AS BIGINT) AS delay_ms,
        |  CAST(d.n_sitemaps AS BIGINT) AS n_sitemaps,
        |  CAST(row_number() OVER (PARTITION BY u.m ORDER BY u.pri DESC, u.doc_id) - 1
        |    AS BIGINT) AS slot,
        |  CAST((row_number() OVER (PARTITION BY u.m ORDER BY u.pri DESC, u.doc_id) - 1)
        |    * d.delay_ms AS BIGINT) AS sched_ms
        |FROM u JOIN d ON u.m = d.m
        |ORDER BY u.doc_id""".stripMargin) {
      (s, d) =>
        val mS = col("m").cast("string")
        val frac = when(pmod(col("m"), lit(3)) === 0, lit("0.5"))
          .when(pmod(col("m"), lit(3)) === 1, lit("1.0")).otherwise(lit("1.5"))
        def smLine(j: Int) = concat(lit(s"Sitemap: https://d"), mS,
          lit(s".example.com/sm$j.xml\n"))
        val robots = Tables.documents(s, d)
          .select(pmod(col("doc_id"), lit(50)).cast("long").as("m")).distinct()
          .select(col("m"),
            concat(lit("d"), mS, lit(".example.com")).as("domain"),
            concat(
              lit("User-agent: *\nCrawl-delay: "),
              (pmod(col("m"), lit(5)) + 1).cast("string"),
              lit("\nDisallow: /private\n"),
              when(pmod(col("m"), lit(4)) === 0,
                concat(lit("User-agent: graftbot\nCrawl-delay: "), frac,
                  lit("\nAllow: /\n"))).otherwise(lit("")),
              smLine(0),
              when(pmod(col("m"), lit(3)) >= 1, smLine(1)).otherwise(lit("")),
              when(pmod(col("m"), lit(3)) >= 2, smLine(2)).otherwise(lit("")))
              .as("txt"))
        val delays = graft.operators.Robots
          .selectDelay(graft.operators.Robots.delaysFrame(robots, "domain", "txt"),
            "graftbot", defaultMs = 60000L)
        val nSm = graft.operators.Robots.sitemapsFrame(robots, "domain", "txt")
          .groupBy("domain").agg(count(lit(1)).cast("long").as("n_sitemaps"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("m").orderBy(desc("pri"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), pmod(col("doc_id"), lit(50)).as("m"),
            (pmod(col("doc_id"), lit(9)) + 1).as("pri"))
          .withColumn("slot", (row_number().over(w) - 1).cast("long"))
          .withColumn("domain",
            concat(lit("d"), col("m").cast("string"), lit(".example.com")))
          .join(delays, Seq("domain"))
          .join(nSm, Seq("domain"))
          .select(col("doc_id"), col("domain"),
            col("delay_ms").cast("long").as("delay_ms"), col("n_sitemaps"),
            col("slot"), (col("slot") * col("delay_ms")).cast("long").as("sched_ms"))
          .orderBy("doc_id")
    },

    // ── WARC × HTTP × CHARSET — the full wire stack a crawl decodes
    //    through: each doc's HTTP response (Content-Type charset param
    //    + body encoded in that charset) packs into WARC shards, parses
    //    back (WarcCodec → HttpCodec), and the body decodes with the
    //    TRANSPORT-layer hint at WHATWG precedence (BOM > header > meta
    //    > heuristic). The k=0 rows are the load-bearing case: a pure-
    //    ASCII body the byte heuristic would call utf-8, labeled
    //    windows-1252 by the header — only the hint channel produces
    //    that label, so a precedence bug flips a third of the rows. ──
    QueryDef.sql(
      "web_warc_charset",
      """SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'windows-1252'
        |    WHEN 1 THEN 'iso-8859-1' ELSE 'utf-8' END AS charset,
        |  CAST(200 AS INT) AS status, md5(t) AS text_md5
        |FROM (SELECT doc_id,
        |  CASE doc_id % 3
        |    WHEN 0 THEN 'Doc ' || doc_id || ' plain wire'
        |    WHEN 1 THEN 'Doc ' || doc_id || ' résumé café'
        |    ELSE 'Doc ' || doc_id || ' déjà ✓'
        |  END AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val blobs = Tables.documents(s, d)
          .select(col("doc_id")).as[Long]
          .mapPartitions(_.map { id =>
            val (ct, cs, text) = (id % 3) match {
              case 0 => ("text/html; charset=windows-1252", "windows-1252",
                s"Doc $id plain wire")
              case 1 => ("text/html; charset=ISO-8859-1", "iso-8859-1",
                s"Doc $id résumé café")
              case _ => ("text/html", "utf-8", s"Doc $id déjà ✓")
            }
            val http = graft.codec.HttpCodec.write(200, "OK",
              Seq("Content-Type" -> ct),
              graft.codec.CharsetCodec.encode(text, cs))
            (id, (id % 8).toInt, s"https://d${id % 50}.example.com/p$id", http)
          })
          .toDF("doc_id", "shard", "uri", "blob")
        val members = Sharding.readWarcRecords(
          Sharding.packWarcShards(blobs, "shard", "doc_id", "uri", "blob",
            contentType = "application/http; msgtype=response"),
          "shard", "warc")
        val decoded = members.select(col("member_id"), col("blob"))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, http) =>
            val resp = graft.codec.HttpCodec.parse(http).getOrElse(
              throw new IllegalStateException(s"unparseable HTTP for member $id"))
            // RAW label, not the normalized Option: an unrecognized
            // transport declaration must reach the sniff (→ unknown
            // verdict) instead of silently falling to the heuristic
            val hint = resp.header("Content-Type")
              .flatMap(graft.codec.CharsetCodec.contentTypeLabelRaw)
            val (cs, text) = graft.codec.CharsetCodec.decode(resp.body, hint)
            (id, cs, resp.status, text)
          })
          .toDF("doc_id", "charset", "status", "t")
        decoded.select(col("doc_id"), col("charset"), col("status").cast("int").as("status"),
          md5(col("t").cast("binary")).as("text_md5"))
          .orderBy("doc_id")
    },

    // ── Frontier discovery from ANCHOR LINKS — how most of the web is
    //    actually found (sitemaps and redirects only seed and patch the
    //    link graph): every page's href/src targets resolve against
    //    the page URL (relative paths, dot-segments, messy queries),
    //    canonicalize into frontier identity, dedup across discovering
    //    pages (n_sources is the in-degree signal), and cap at a
    //    per-host BUDGET in md5 order via the bounded heap — the cap
    //    is what keeps a link farm from amplifying itself into the
    //    frontier. The oracle replays every stage arithmetically from
    //    the seed, including the budget cut (row_number over md5(url)
    //    replays the heap's deterministic membership exactly). ──
    QueryDef.sql(
      "web_frontier_links",
      """WITH d AS (SELECT doc_id, doc_id % 20 AS m FROM documents),
        |links AS (
        |  SELECT 'd' || m || '.example.com' AS domain,
        |    'http://d' || m || '.example.com/p' || doc_id || '/a' AS url FROM d
        |  UNION ALL
        |  SELECT 'd' || m || '.example.com',
        |    'http://d' || m || '.example.com/shared' FROM d
        |  UNION ALL
        |  SELECT 'd' || m || '.example.com',
        |    'http://d' || m || '.example.com/q?a=1&b=2' FROM d
        |  UNION ALL
        |  SELECT 'x' || m || '.example.org',
        |    'http://x' || m || '.example.org/ext' FROM d),
        |g AS (SELECT domain, url, CAST(count(*) AS BIGINT) AS n_sources
        |  FROM links GROUP BY 1, 2),
        |r AS (SELECT domain, url, n_sources,
        |  row_number() OVER (PARTITION BY domain ORDER BY md5(url), url) AS rn FROM g)
        |SELECT domain, url, n_sources FROM r WHERE rn <= 5
        |ORDER BY domain, url""".stripMargin) {
      (s, d) =>
        val pages = Tables.documents(s, d)
          .select(col("doc_id"), (col("doc_id") % 20).as("m"))
          .select(col("doc_id"),
            concat(lit("http://d"), col("m"), lit(".example.com/hub"), col("doc_id"))
              .as("url"),
            concat(
              concat(lit("<a href=\"p"), col("doc_id"), lit("/a\">rel</a>")),
              lit("<a href=\"/shared\">s</a>"),
              lit("<a href=\"/q?b=2&a=1\">messy</a>"),
              lit("<a href=\"mailto:x@example.com\">drop</a>"),
              lit("<a href=\"#frag\">drop</a>"),
              concat(lit("<a href=\"http://x"), col("m"),
                lit(".example.org/ext\">e</a>"))).as("html"))
        graft.streaming.StreamingCrawl
          .discoverLinks(pages, "url", "html", perHostBudget = 5)
          .select(col("domain"), col("url"), col("n_sources"))
          .orderBy("domain", "url")
    },

    // ── PRIORITIZED frontier budget — when the crawl cannot afford
    //    every discovered target, spend each host's budget on the
    //    pages many others point at (the indegree crawl-ordering
    //    heuristic) instead of the md5 lottery: /shared is linked by
    //    every page of its domain, /q by every second page, own
    //    p-targets by one — a budget of 2 must pick exactly
    //    {shared, q} per domain, and the oracle replays the ranking
    //    (n_sources DESC, url ASC = the heap's (-n, url) key) with a
    //    window. ──
    QueryDef.sql(
      "web_frontier_priority",
      """WITH d AS (SELECT doc_id, doc_id % 20 AS m FROM documents),
        |links AS (
        |  SELECT 'd' || m || '.example.com' AS domain,
        |    'http://d' || m || '.example.com/p' || doc_id || '/a' AS url FROM d
        |  UNION ALL
        |  SELECT 'd' || m || '.example.com',
        |    'http://d' || m || '.example.com/shared' FROM d
        |  UNION ALL
        |  SELECT 'd' || m || '.example.com',
        |    'http://d' || m || '.example.com/q?a=1&b=2' FROM d WHERE doc_id % 2 = 0),
        |g AS (SELECT domain, url, CAST(count(*) AS BIGINT) AS n_sources
        |  FROM links GROUP BY 1, 2),
        |r AS (SELECT domain, url, n_sources,
        |  row_number() OVER (PARTITION BY domain ORDER BY n_sources DESC, url) AS rn
        |  FROM g)
        |SELECT domain, url, n_sources FROM r WHERE rn <= 2
        |ORDER BY domain, url""".stripMargin) {
      (s, d) =>
        val pages = Tables.documents(s, d)
          .select(col("doc_id"), (col("doc_id") % 20).as("m"))
          .select(col("doc_id"),
            concat(lit("http://d"), col("m"), lit(".example.com/hub"), col("doc_id"))
              .as("url"),
            concat(
              concat(lit("<a href=\"/p"), col("doc_id"), lit("/a\">rel</a>")),
              lit("<a href=\"/shared\">s</a>"),
              when(col("doc_id") % 2 === 0,
                lit("<a href=\"/q?b=2&a=1\">messy</a>")).otherwise(lit(""))).as("html"))
        graft.streaming.StreamingCrawl
          .discoverLinksPrioritized(pages, "url", "html", perHostBudget = 2)
          .select(col("domain"), col("url"), col("n_sources"))
          .orderBy("domain", "url")
    },

    // ── Adaptive RECRAWL schedule, blended with DECLARED sitemap
    //    hints — the two signals a real planner holds: the observed
    //    change history (six fetches, changed on an arithmetic
    //    pattern) sizes the interval inversely to the smoothed change
    //    rate; where the site DECLARED a cadence (docs ≡ 0 mod 3 carry
    //    changefreq by doc%5 — hourly/daily/weekly/always/never — and
    //    priority doc%11 tenths), the declared window BOUNDS it:
    //    lo = c/4, hi = (min(cap, 4c)·10)/(pri+5), observations adapt
    //    within. Every branch is live in the fixture: hourly/daily
    //    floors bind, weekly/never pin at the cap, `always` leaves the
    //    adaptive value under a priority-scaled ceiling, and unhinted
    //    docs keep the pure adaptive interval. Hints are UNTRUSTED:
    //    the fixture's raw pri10 = doc%23 − 6 spans −6..16 and the
    //    operator's [0,10] clamp is what the oracle replays (a raw −5
    //    would divide by zero); docs ≡ 0 mod 4 additionally carry a
    //    DUPLICATE hint row at pri10−1 that the operator's
    //    max-pri dedup must collapse. Integer floor-division
    //    arithmetic end to end — the oracle replays it exactly. ──
    QueryDef.sql(
      "web_recrawl_schedule",
      """WITH h AS (SELECT doc_id,
        |    'http://d' || (doc_id % 50) || '.example.com/p' || doc_id AS url,
        |    unnest(range(6)) AS seq FROM documents),
        |c AS (SELECT doc_id, url, seq * 3600000 AS ts,
        |    CASE WHEN ((seq + 1) * (doc_id % 7 + 2)) % 3 = 0 THEN 1 ELSE 0 END AS ch
        |  FROM h),
        |g AS (SELECT url, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_obs,
        |    CAST(sum(ch) AS BIGINT) AS n_changed,
        |    CAST(max(ts) AS BIGINT) AS last_fetch FROM c GROUP BY url),
        |a AS (SELECT url, doc_id, n_obs, n_changed, last_fetch,
        |    least(86400000, greatest(500,
        |      1000 * n_obs * 2 // (n_changed * 2 + 1))) AS ai,
        |    CASE WHEN doc_id % 3 = 0 THEN
        |      CASE doc_id % 5 WHEN 0 THEN 'hourly' WHEN 1 THEN 'daily'
        |        WHEN 2 THEN 'weekly' WHEN 3 THEN 'always' ELSE 'never' END
        |    END AS changefreq,
        |    greatest(0, least(10, doc_id % 23 - 6)) AS pri FROM g),
        |b AS (SELECT *, CASE changefreq WHEN 'always' THEN 500
        |    WHEN 'hourly' THEN 3600000 WHEN 'daily' THEN 86400000
        |    WHEN 'weekly' THEN 604800000 WHEN 'never' THEN 345600000000 END AS cd
        |  FROM a),
        |w AS (SELECT *,
        |    CASE WHEN cd IS NULL THEN 500
        |      ELSE greatest(500, least(86400000, cd // 4)) END AS lo
        |  FROM b),
        |x AS (SELECT *,
        |    CASE WHEN cd IS NULL THEN 86400000
        |      ELSE greatest(lo, least(86400000, cd * 4) * 10 // (pri + 5)) END AS hi
        |  FROM w),
        |f AS (SELECT url, n_obs, n_changed, last_fetch, changefreq,
        |    greatest(lo, least(hi, ai)) AS iv FROM x)
        |SELECT url, n_obs, n_changed, last_fetch, changefreq,
        |  CAST(iv AS BIGINT) AS interval_ms,
        |  CAST(last_fetch + iv AS BIGINT) AS next_due_ms
        |FROM f ORDER BY url""".stripMargin) {
      (s, d) =>
        val url = concat(lit("http://d"), pmod(col("doc_id"), lit(50)),
          lit(".example.com/p"), col("doc_id"))
        val history = Tables.documents(s, d)
          .select(col("doc_id"), url.as("url"))
          .withColumn("seq", explode(sequence(lit(0), lit(5))))
          .select(col("url"), (col("seq") * 3600000L).as("ts"),
            (((col("seq") + 1) * (pmod(col("doc_id"), lit(7)) + 2)) % 3 === 0)
              .as("changed"))
        val hintBase = Tables.documents(s, d)
          .select(col("doc_id"), url.as("url"),
            when(pmod(col("doc_id"), lit(3)) === 0,
              element_at(
                array(lit("hourly"), lit("daily"), lit("weekly"),
                  lit("always"), lit("never")),
                (pmod(col("doc_id"), lit(5)) + 1).cast("int"))).as("changefreq"),
            (pmod(col("doc_id"), lit(23)) - 6).as("pri10"))
        // untrusted-input branches live: raw pri10 spans −6..16 (the
        // operator clamps), and every fourth doc declares TWICE at a
        // strictly lower priority (the max-pri dedup collapses it)
        val hints = hintBase.drop("doc_id").unionByName(
          hintBase.filter(pmod(col("doc_id"), lit(4)) === 0)
            .select(col("url"), col("changefreq"),
              (col("pri10") - 1).as("pri10")))
        graft.operators.Recrawl
          .scheduleWithHints(history, "url", "ts", "changed", hints)
          .select(col("url"), col("n_obs"), col("n_changed"), col("last_fetch"),
            col("changefreq"), col("interval_ms"), col("next_due_ms"))
          .orderBy("url")
    },

    // ── CONDITIONAL-FETCH request plan — the client half of the 304
    //    machinery, closing the loop the revisit records started: the
    //    revisit schedule's DUE slice joins the validator ledger
    //    (ETag / Last-Modified captured at admission) and emits the
    //    If-None-Match / If-Modified-Since headers per URL — a URL
    //    with either validator plans a `conditional` request the
    //    server can answer 304; one with neither stays
    //    `unconditional`. Fixture: the web_recrawl_schedule history
    //    (so dueness discriminates on the smoothed change rate) plus
    //    arithmetic validators — etag on doc % 3 != 0, last-modified
    //    on even docs — and now = 18003000 ms cuts due at
    //    interval ≤ 3000 (n_changed ≥ 2). The oracle replays history,
    //    clamp arithmetic, due cut, and both validator branches. ──
    QueryDef.sql(
      "web_conditional_fetch",
      """WITH h AS (SELECT doc_id,
        |    'http://d' || (doc_id % 50) || '.example.com/p' || doc_id AS url,
        |    unnest(range(6)) AS seq FROM documents),
        |c AS (SELECT doc_id, url, seq * 3600000 AS ts,
        |    CASE WHEN ((seq + 1) * (doc_id % 7 + 2)) % 3 = 0 THEN 1 ELSE 0 END AS ch
        |  FROM h),
        |g AS (SELECT url, min(doc_id) AS doc_id, count(*) AS n_obs,
        |    sum(ch) AS n_changed, max(ts) AS last_fetch FROM c GROUP BY url),
        |s AS (SELECT url, doc_id, last_fetch,
        |    least(86400000, greatest(500, 1000 * n_obs * 2 // (n_changed * 2 + 1))) AS iv
        |  FROM g)
        |SELECT url, CAST(last_fetch + iv AS BIGINT) AS next_due_ms,
        |  CASE WHEN doc_id % 3 != 0 OR doc_id % 2 = 0
        |       THEN 'conditional' ELSE 'unconditional' END AS mode,
        |  CASE WHEN doc_id % 3 != 0 THEN '"e-' || doc_id || '"' END AS if_none_match,
        |  CASE WHEN doc_id % 2 = 0 THEN 'lm-' || doc_id END AS if_modified_since
        |FROM s WHERE last_fetch + iv <= 18003000
        |ORDER BY url""".stripMargin) {
      (s, d) =>
        val url = concat(lit("http://d"), pmod(col("doc_id"), lit(50)),
          lit(".example.com/p"), col("doc_id"))
        val history = Tables.documents(s, d)
          .select(col("doc_id"), url.as("url"))
          .withColumn("seq", explode(sequence(lit(0), lit(5))))
          .select(col("url"), (col("seq") * 3600000L).as("ts"),
            (((col("seq") + 1) * (pmod(col("doc_id"), lit(7)) + 2)) % 3 === 0)
              .as("changed"))
        val validators = Tables.documents(s, d)
          .select(url.as("url"),
            when(pmod(col("doc_id"), lit(3)) =!= 0,
              concat(lit("\"e-"), col("doc_id"), lit("\""))).as("etag"),
            when(pmod(col("doc_id"), lit(2)) === 0,
              concat(lit("lm-"), col("doc_id"))).as("last_modified"))
        val sched = graft.operators.Recrawl.schedule(history, "url", "ts", "changed")
        graft.operators.Recrawl.conditionalPlan(sched, validators, nowMs = 18003000L)
          .orderBy("url")
    },

    // ── LEDGER-BACKED request plan — the conditional-fetch loop run
    //    end-to-end through the STREAMING machinery and still fully
    //    oracle-checked (the engine_stream family is rows-only because
    //    ledgers aren't SQL — but this fixture's arithmetic is): two
    //    real processBatch steps against a fresh ledger set (batch 0
    //    admits every url at t=1000 storing ETags on doc%3≠0; batch 1
    //    re-fetches the even docs at t=3601000, reading `duplicate` —
    //    an observation of NO change), then requestPlan folds the
    //    observations ledger into the change-rate schedule and joins
    //    the validator ledger into request headers. The oracle replays
    //    the outcome classes, the per-parity observation counts, the
    //    floor-division intervals, and both validator branches. ──
    QueryDef.sql(
      "web_crawl_plan_ledger",
      """SELECT 'http://d' || (doc_id % 50) || '.example.com/u' || doc_id AS url,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 3602333 ELSE 1666 END AS BIGINT)
        |    AS next_due_ms,
        |  CASE WHEN doc_id % 3 != 0 THEN 'conditional'
        |       ELSE 'unconditional' END AS mode,
        |  CASE WHEN doc_id % 3 != 0 THEN '"e-' || doc_id || '"' END AS if_none_match,
        |  CAST(NULL AS VARCHAR) AS if_modified_since
        |FROM documents WHERE doc_id < 2000 ORDER BY url""".stripMargin) {
      (s, d) =>
        val url = concat(lit("http://d"), pmod(col("doc_id"), lit(50)),
          lit(".example.com/u"), col("doc_id"))
        // 2000-doc slice: the fixture's cost is two full processBatch
        // steps; the slice keeps the bench line honest while every
        // ledger stage still fires (the 100 TB path is the operator)
        val docs = Tables.documents(s, d).filter(col("doc_id") < 2000)
          .select(col("doc_id"), url.as("url"))
        val rules = docs
          .select(concat(lit("d"), pmod(col("doc_id"), lit(50)),
            lit(".example.com")).as("domain")).distinct()
          .select(col("domain"), lit("*").as("agent"),
            lit(true).as("allow"), lit("/").as("prefix"))
        val nullS = lit(null).cast("string")
        val blob = lit(Array.emptyByteArray)
        val b0 = docs.select(col("doc_id").as("id"), col("url"),
          blob.as("blob"), lit(200).as("status"), nullS.as("location"),
          when(pmod(col("doc_id"), lit(3)) =!= 0,
            concat(lit("\"e-"), col("doc_id"), lit("\""))).as("etag"),
          nullS.as("lm"), lit(1000L).as("seq"))
        val b1 = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
          .select((col("doc_id") + 10000000L).as("id"), col("url"),
            blob.as("blob"), lit(200).as("status"), nullS.as("location"),
            nullS.as("etag"), nullS.as("lm"), lit(3601000L).as("seq"))
        val ledger = java.nio.file.Files
          .createTempDirectory("graft-planledger").toString
        Seq((b0, 0L), (b1, 1L)).foreach { case (b, i) =>
          val m = graft.streaming.StreamingCrawl.processBatch(
            b, i, "id", "url", "blob", rules, "graftbot", ledger,
            statusCol = Some("status"), locationCol = Some("location"),
            validatorCols = Some(("etag", "lm")), seqCol = Some("seq"))
          m.count(); m.unpersist(blocking = false)
        }
        graft.streaming.StreamingCrawl
          .requestPlan(s, ledger, nowMs = 3602333L)
          .orderBy("url")
    },

    // ── 301-ALIAS ledger, oracled end to end — permanent moves split
    //    from temporary redirects and REWRITE future enqueues: batch 0
    //    fetches every doc's /u page (id%4=1 answers 301 → an alias
    //    records; id%4=2 answers 302 → nothing records, the source
    //    stays live; the rest admit), then batch 1's hub pages link to
    //    an aliased URL (must rewrite to its /m target before the seen
    //    drain — never re-fetching the alias), a 302 source (enqueues
    //    AS-IS: temporary moves keep the source live), and an admitted
    //    URL (drains). The oracle replays the alias arithmetic, the
    //    301/302 asymmetry, and the drain — a missed rewrite, a 302
    //    mis-recorded as permanent, or a drain slip each shifts the
    //    row set. Fixture sized by the id+3 guard so every linked URL
    //    exists at every sf. ──
    QueryDef.sql(
      "web_redirect_alias",
      """WITH mx AS (SELECT max(doc_id) AS m FROM documents WHERE doc_id < 2000),
        |hubs AS (SELECT doc_id FROM documents, mx
        |  WHERE doc_id < 2000 AND doc_id % 4 = 0 AND doc_id + 3 <= m),
        |f AS (
        |  SELECT 'http://d' || ((doc_id + 1) % 50) || '.example.com/m' || (doc_id + 1)
        |    AS url FROM hubs
        |  UNION ALL
        |  SELECT 'http://d' || ((doc_id + 2) % 50) || '.example.com/u' || (doc_id + 2)
        |    AS url FROM hubs)
        |SELECT url, CAST(1 AS INT) AS hop FROM f ORDER BY url""".stripMargin) {
      (s, d) =>
        val m = pmod(col("doc_id"), lit(50))
        val u = concat(lit("http://d"), m, lit(".example.com/u"), col("doc_id"))
        val docs = Tables.documents(s, d).filter(col("doc_id") < 2000)
          .select(col("doc_id"), u.as("url"))
        val maxId = docs.agg(max("doc_id")).head.getLong(0)
        val rules = docs
          .select(concat(lit("d"), m, lit(".example.com")).as("domain")).distinct()
          .select(col("domain"), lit("*").as("agent"),
            lit(true).as("allow"), lit("/").as("prefix"))
        val nullS = lit(null).cast("string")
        val b0 = docs.select(col("doc_id").as("id"), col("url"),
          lit(Array.emptyByteArray).as("blob"),
          when(pmod(col("doc_id"), lit(4)) === 1, 301)
            .when(pmod(col("doc_id"), lit(4)) === 2, 302)
            .otherwise(200).as("status"),
          when(pmod(col("doc_id"), lit(4)) === 1,
            concat(lit("/m"), col("doc_id")))
            .when(pmod(col("doc_id"), lit(4)) === 2,
              concat(lit("/t"), col("doc_id"))).as("location"))
        val ledger = java.nio.file.Files
          .createTempDirectory("graft-aliasledger").toString
        val m0 = graft.streaming.StreamingCrawl.processBatch(
          b0, 0L, "id", "url", "blob", rules, "graftbot", ledger,
          statusCol = Some("status"), locationCol = Some("location"))
        m0.count(); m0.unpersist(blocking = false)
        def absU(off: Int) = concat(lit("http://d"),
          pmod(col("doc_id") + off, lit(50)),
          lit(".example.com/u"), col("doc_id") + off)
        val hubs = docs
          .filter(pmod(col("doc_id"), lit(4)) === 0 &&
            col("doc_id") + 3 <= maxId)
          .select(
            concat(lit("http://d"), m, lit(".example.com/h"), col("doc_id"))
              .as("url"),
            concat(
              lit("<a href=\""), absU(1), lit("\">alias</a>"),
              lit("<a href=\""), absU(2), lit("\">temp</a>"),
              lit("<a href=\""), absU(3), lit("\">seen</a>")).as("html"))
        graft.streaming.StreamingCrawl
          .linkFrontier(hubs, "url", "html", ledger, 1L,
            perHostBudget = 1000000)
          .select(col("url"), col("hop"))
          .orderBy("url")
    },

    // ── Frontier seeding from IN-BAND sitemap discovery — the loop the
    //    directives close: sitemap URLs parsed out of each domain's
    //    robots.txt (the real discovery channel) anti-join the crawl's
    //    seen-ledger, and only the NEW ones enter the frontier. Fixture:
    //    domains carry 1-3 sitemap URLs (m % 3 + 1), the ledger already
    //    holds every domain's sm0 plus sm1 for m % 2 = 0 — so the new
    //    set per domain is exactly the arithmetic the oracle replays
    //    (a scope leak, a canonicalization drift, or an anti-join bug
    //    each shifts some domain's count or id-sum). ──
    QueryDef.sql(
      "web_frontier_seed",
      """WITH m AS (SELECT DISTINCT doc_id % 50 AS m FROM documents),
        |d AS (SELECT m, m % 3 + 1 AS n_disc,
        |        CASE WHEN m % 3 >= 1 AND NOT (m % 2 = 0) THEN 1 ELSE 0 END
        |          + CASE WHEN m % 3 >= 2 THEN 1 ELSE 0 END AS n_new
        |      FROM m)
        |SELECT 'd' || m || '.example.com' AS domain,
        |  CAST(n_disc AS BIGINT) AS n_discovered,
        |  CAST(n_new AS BIGINT) AS n_new
        |FROM d ORDER BY domain""".stripMargin) {
      (s, d) =>
        val mS = col("m").cast("string")
        def smUrl(j: Int) = concat(lit("https://d"), mS, lit(s".example.com/sm$j.xml"))
        def smLine(j: Int) = concat(lit("Sitemap: "), smUrl(j), lit("\n"))
        val doms = Tables.documents(s, d)
          .select(pmod(col("doc_id"), lit(50)).cast("long").as("m")).distinct()
        val robots = doms.select(col("m"),
          concat(lit("d"), mS, lit(".example.com")).as("domain"),
          concat(lit("User-agent: *\nDisallow: /private\n"),
            smLine(0),
            when(pmod(col("m"), lit(3)) >= 1, smLine(1)).otherwise(lit("")),
            when(pmod(col("m"), lit(3)) >= 2, smLine(2)).otherwise(lit("")))
            .as("txt"))
        val discovered = graft.operators.Robots.sitemapsFrame(robots, "domain", "txt")
          .withColumn("canonical", TextOps.urlCanonicalize(col("sitemap")))
        // the crawl's seen-ledger: sm0 everywhere, sm1 for even m
        val seen = doms.select(explode(array(
            smUrl(0),
            when(pmod(col("m"), lit(2)) === 0, smUrl(1)))).as("url"))
          .filter(col("url").isNotNull)
          .select(TextOps.urlCanonicalize(col("url")).as("canonical"))
        val fresh = discovered.join(seen, Seq("canonical"), "left_anti")
        discovered.groupBy("domain")
          .agg(count(lit(1)).cast("long").as("n_discovered"))
          .join(fresh.groupBy("domain")
            .agg(count(lit(1)).cast("long").as("_n")), Seq("domain"), "left_outer")
          .select(col("domain"), col("n_discovered"),
            coalesce(col("_n"), lit(0L)).as("n_new"))
          .orderBy("domain")
    },

    // ── robots.txt WILDCARD rules (RFC 9309 §2.2.3) — the evaluator's
    //    `*`/`$` interpretation proven end-to-end: every domain blocks
    //    `/*.php` but allows the LONGER `/pub/*.php`, and even domains
    //    anchor `Disallow: /dl$` (exactly /dl, nothing beneath it).
    //    The oracle replays the verdict matrix arithmetically from the
    //    seed — a literal-prefix regression (the pre-fix behavior: a
    //    '*' pattern matching nothing), a broken anchor, or a
    //    length-precedence drift each flips a known (k, m) cell. ──
    QueryDef.sql(
      "web_robots_wildcards",
      """WITH urls AS (
        |  SELECT doc_id, doc_id % 50 AS m, k
        |  FROM documents CROSS JOIN (VALUES (0), (1), (2), (3)) t(k))
        |SELECT doc_id, CAST(k AS INT) AS k, 'd' || m || '.example.com' AS domain,
        |  CASE WHEN k = 0 THEN false WHEN k = 1 THEN true
        |       WHEN k = 2 THEN NOT (m % 2 = 0) ELSE true END AS allowed
        |FROM urls ORDER BY doc_id, k""".stripMargin) {
      (s, d) =>
        val mC = pmod(col("doc_id"), lit(50))
        val robots = Tables.documents(s, d)
          .select(mC.cast("long").as("m")).distinct()
          .select(
            concat(lit("d"), col("m").cast("string"), lit(".example.com")).as("domain"),
            concat(
              lit("User-agent: *\nDisallow: /*.php\nAllow: /pub/*.php\n"),
              when(col("m") % 2 === 0, lit("Disallow: /dl$\n")).otherwise(lit("")))
              .as("txt"))
        val rules = graft.operators.Robots.rulesFrame(robots, "domain", "txt")
        val id = col("doc_id").cast("string")
        val urls = Tables.documents(s, d)
          .select(col("doc_id"),
            concat(lit("d"), mC.cast("string"), lit(".example.com")).as("domain"),
            explode(array(
              struct(lit(0).as("k"), concat(lit("/Path/p"), id, lit(".php")).as("path")),
              struct(lit(1).as("k"), concat(lit("/pub/x"), id, lit(".php")).as("path")),
              struct(lit(2).as("k"), lit("/dl").as("path")),
              struct(lit(3).as("k"), concat(lit("/dl/x"), id).as("path")))).as("u"))
          .select(col("doc_id"), col("u.k").as("k"), col("domain"), col("u.path").as("path"))
        graft.operators.Robots.evaluate(urls, rules, "graftbot")
          .select(col("doc_id"), col("k").cast("int").as("k"), col("domain"), col("allowed"))
          .orderBy("doc_id", "k")
    },

    // ── robots.txt admission gate — seed-arithmetic-fixture doctrine:
    //    the engine BUILDS each domain's robots.txt text, runs the
    //    stateful REP parser (group state machine: shared agent lines,
    //    group reset after rules), and evaluates four URL shapes per
    //    doc for agent `graftbot` with longest-prefix / Allow-tie /
    //    default-allow precedence. The oracle never parses: it
    //    reconstructs the rules ARITHMETICALLY from the same seed and
    //    replays evaluation as an integer-rank max — so a parser
    //    mis-parse (a group leak, a comment swallow, an empty-value
    //    rule) changes verdicts and breaks the hash. Domains where the
    //    graftbot group exists flip /private/ok from allowed (the *
    //    group's longest-match Allow) to blocked — the agent-selection
    //    divergence the fixture is built around. ──
    QueryDef.sql(
      "web_robots_gate",
      """WITH m AS (SELECT DISTINCT doc_id % 50 AS m FROM documents),
        |rules AS (
        |  SELECT m, '*' AS agent, false AS al, '/private' AS pfx FROM m
        |  UNION ALL SELECT m, '*', true, '/private/ok' FROM m
        |  UNION ALL SELECT m, '*', false, '/Path' FROM m WHERE m % 3 = 0
        |  UNION ALL SELECT m, 'graftbot', true, '/' FROM m WHERE m % 5 = 0
        |  UNION ALL SELECT m, 'graftbot', false, '/private' FROM m WHERE m % 5 = 0),
        |grp AS (SELECT m, CASE WHEN bool_or(agent = 'graftbot') THEN 'graftbot' ELSE '*' END AS ua
        |        FROM rules GROUP BY m),
        |sel AS (SELECT r.m, r.al, r.pfx FROM rules r JOIN grp g ON r.m = g.m AND r.agent = g.ua),
        |urls AS (
        |  SELECT doc_id, doc_id % 50 AS m, 0 AS k, '/Path/p' || doc_id AS path FROM documents
        |  UNION ALL SELECT doc_id, doc_id % 50, 1, '/private/ok/x' || doc_id FROM documents
        |  UNION ALL SELECT doc_id, doc_id % 50, 2, '/private/x' || doc_id FROM documents
        |  UNION ALL SELECT doc_id, doc_id % 50, 3, '/about' FROM documents),
        |j AS (SELECT u.doc_id, u.k, u.m,
        |        max(CASE WHEN s.al THEN length(s.pfx) * 2 + 1 ELSE length(s.pfx) * 2 END) AS best
        |      FROM urls u LEFT JOIN sel s ON u.m = s.m AND starts_with(u.path, s.pfx)
        |      GROUP BY u.doc_id, u.k, u.m)
        |SELECT doc_id, CAST(k AS INT) AS k, 'd' || m || '.example.com' AS domain,
        |  (best IS NULL OR best % 2 = 1) AS allowed
        |FROM j ORDER BY doc_id, k""".stripMargin) {
      (s, d) =>
        val mC = pmod(col("doc_id"), lit(50))
        val robots = Tables.documents(s, d)
          .select(mC.cast("long").as("m")).distinct()
          .select(
            concat(lit("d"), col("m").cast("string"), lit(".example.com")).as("domain"),
            concat(
              lit("# robots for d"), col("m").cast("string"),
              lit("\nUser-agent: *\nDisallow: /private\nAllow: /private/ok\n"),
              when(col("m") % 3 === 0, lit("Disallow: /Path\n")).otherwise(lit("")),
              when(col("m") % 5 === 0,
                lit("\nUser-agent: graftbot\nAllow: /\nDisallow: /private\n"))
                .otherwise(lit(""))).as("txt"))
        val rules = graft.operators.Robots.rulesFrame(robots, "domain", "txt")
        val id = col("doc_id").cast("string")
        val urls = Tables.documents(s, d)
          .select(col("doc_id"),
            concat(lit("d"), mC.cast("string"), lit(".example.com")).as("domain"),
            explode(array(
              struct(lit(0).as("k"), concat(lit("/Path/p"), id).as("path")),
              struct(lit(1).as("k"), concat(lit("/private/ok/x"), id).as("path")),
              struct(lit(2).as("k"), concat(lit("/private/x"), id).as("path")),
              struct(lit(3).as("k"), lit("/about").as("path")))).as("u"))
          .select(col("doc_id"), col("u.k").as("k"), col("domain"), col("u.path").as("path"))
        graft.operators.Robots.evaluate(urls, rules, "graftbot")
          .select(col("doc_id"), col("k").cast("int").as("k"), col("domain"), col("allowed"))
          .orderBy("doc_id", "k")
    },

    // ── Block-level MAIN-CONTENT extraction (jusText/Boilerpipe core)
    //    — the classifier a bare tag strip cannot be: both engines
    //    build the SAME realistic page (nav bar, heading, article div
    //    with a long body paragraph and a too-short note, related-links
    //    list, mod-keyed blockquote WITH an inline link that must
    //    survive, copyright footer whose link density fails it), split
    //    it into blocks at block-tag boundaries, compute per-block
    //    visible-text and anchor-text lengths, and keep blocks that are
    //    long enough (≥25 chars) AND under the 0.33 link-density bar —
    //    so the nav (density ≈ 1) and footer (0.46) drop while the
    //    linked blockquote (0.08) stays: the gate is the DENSITY, not
    //    the mere presence of a link. md5 over the reassembled article
    //    text pins block order, splitting, and both length computations. ──
    QueryDef.sql(
      "web_main_content",
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>d</title><style>.x{color:red}</style></head><body>' ||
        |  '<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>' ||
        |  '<h1>Doc ' || doc_id || '</h1>' ||
        |  '<div class="post"><p>' || coalesce(text, '') || '</p><p>Short note.</p></div>' ||
        |  '<ul><li><a href="/r/1">Related one</a></li><li><a href="/r/2">Related two</a></li></ul>' ||
        |  CASE WHEN doc_id % 4 = 0 THEN '<blockquote>A quoted passage long enough to pass the chars bar with <a href="/cite">one link</a> inside it stays content.</blockquote>' ELSE '' END ||
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
        |k AS (SELECT doc_id, bs,
        |  list_filter(bs, s -> length(s.txt) >= 25 AND CAST(s.alen AS DOUBLE) <= 0.33 * length(s.txt)) AS keep FROM ne),
        |m AS (SELECT doc_id, bs, keep, coalesce(array_to_string(list_transform(keep, s -> s.txt), chr(10)), '') AS main FROM k)
        |SELECT doc_id, CAST(len(bs) AS BIGINT) AS n_blocks, CAST(len(keep) AS BIGINT) AS n_content,
        |  CAST(length(main) AS BIGINT) AS main_len, md5(main) AS main_md5
        |FROM m ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val page = concat(
          lit("<html><head><title>d</title><style>.x{color:red}</style></head><body>" +
            "<nav><a href=\"/\">Home</a> <a href=\"/about\">About</a> <a href=\"/contact\">Contact</a></nav>" +
            "<h1>Doc "),
          col("doc_id").cast("string"),
          lit("</h1><div class=\"post\"><p>"), coalesce(col("text"), lit("")),
          lit("</p><p>Short note.</p></div>" +
            "<ul><li><a href=\"/r/1\">Related one</a></li><li><a href=\"/r/2\">Related two</a></li></ul>"),
          when(pmod(col("doc_id"), lit(4)) === 0,
            "<blockquote>A quoted passage long enough to pass the chars bar with " +
              "<a href=\"/cite\">one link</a> inside it stays content.</blockquote>").otherwise(""),
          lit("<footer>Copyright 2026 <a href=\"/legal\">legal</a> <a href=\"/privacy\">privacy</a></footer></body></html>"))
        val keepBlock = (s2: org.apache.spark.sql.Column) => TextOps.contentKeep(s2)
        Tables.documents(s, d)
          .select(col("doc_id"), TextOps.contentBlocks(page).as("bs"))
          .withColumn("keep", filter(col("bs"), keepBlock))
          .withColumn("main",
            array_join(transform(col("keep"), _.getField("txt")), "\n"))
          .select(col("doc_id"),
            size(col("bs")).cast("long").as("n_blocks"),
            size(col("keep")).cast("long").as("n_content"),
            length(col("main")).cast("long").as("main_len"),
            md5(col("main").cast("binary")).as("main_md5"))
          .orderBy("doc_id")
    },

    // ── The jusText STOPWORD tier — the third public signal, and the
    //    one the length/density core cannot fake: the fixture's number
    //    table is LONG and LINK-FREE (it passes both base bars) and
    //    only its zero function-word density drops it, while the prose
    //    paragraph clears the 0.05 stopword bar through its own words.
    //    One stopword-poor template text drops its prose too — the
    //    deterministic borderline both engines must agree on. Outputs
    //    the base-vs-lang keep counts so the tier's marginal effect is
    //    pinned per document, not just in aggregate. ──
    QueryDef.sql(
      "web_main_content_lang",
      """WITH h AS (SELECT doc_id,
        |  '<html><body><nav><a href="/">Home</a> <a href="/about">About</a></nav>' ||
        |  '<p>' || coalesce(text, '') || ' and the story goes on to the end.</p>' ||
        |  '<div>' || array_to_string(list_transform(range(0,20), i -> CAST((doc_id*7 + i*13) % 1000 AS VARCHAR)), ' ') || '</div>' ||
        |  '<footer>Copyright <a href="/l">legal</a></footer></body></html>' AS html
        |  FROM documents),
        |b AS (SELECT doc_id, regexp_split_to_array(html,
        |  '(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|header|footer|nav|aside|blockquote|pre|br)(?:\s[^>]*)?/?>') AS blocks FROM h),
        |e AS (SELECT doc_id, list_transform(blocks, x -> struct_pack(
        |    txt := trim(regexp_replace(regexp_replace(x, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')),
        |    alen := CAST(length(trim(regexp_replace(regexp_replace(coalesce(array_to_string(regexp_extract_all(x, '(?is)<a(?:\s[^>]*)?>(.*?)</a>', 1), ' '), ''), '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))) AS BIGINT))) AS bs FROM b),
        |ne AS (SELECT doc_id, list_filter(bs, s -> length(s.txt) > 0) AS bs FROM e),
        |k AS (SELECT doc_id, bs,
        |  list_filter(bs, s -> length(s.txt) >= 25 AND CAST(s.alen AS DOUBLE) <= 0.33 * length(s.txt)) AS base,
        |  list_filter(bs, s -> length(s.txt) >= 25 AND CAST(s.alen AS DOUBLE) <= 0.33 * length(s.txt)
        |    AND CAST(len(list_filter(string_split(lower(s.txt), ' '), w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE)
        |        / len(string_split(lower(s.txt), ' ')) >= 0.05) AS keep FROM ne),
        |m AS (SELECT doc_id, base, keep,
        |  coalesce(array_to_string(list_transform(keep, s -> s.txt), chr(10)), '') AS main FROM k)
        |SELECT doc_id, CAST(len(base) AS BIGINT) AS n_base, CAST(len(keep) AS BIGINT) AS n_lang,
        |  CAST(length(main) AS BIGINT) AS main_len, md5(main) AS main_md5
        |FROM m ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val nums = concat_ws(" ",
          (0 until 20).map(i =>
            pmod(col("doc_id") * 7 + lit(i * 13), lit(1000)).cast("string")): _*)
        val page = concat(
          lit("<html><body><nav><a href=\"/\">Home</a> <a href=\"/about\">About</a></nav><p>"),
          coalesce(col("text"), lit("")),
          lit(" and the story goes on to the end.</p><div>"), nums,
          lit("</div><footer>Copyright <a href=\"/l\">legal</a></footer></body></html>"))
        val stops = Seq("the", "a", "of", "and", "to", "in", "is")
        Tables.documents(s, d)
          .select(col("doc_id"), TextOps.contentBlocks(page).as("bs"))
          .withColumn("base", filter(col("bs"), b => TextOps.contentKeep(b)))
          .withColumn("keep", filter(col("bs"),
            b => TextOps.contentKeep(b, stopwords = stops, minStopFrac = 0.05)))
          .withColumn("main",
            array_join(transform(col("keep"), _.getField("txt")), "\n"))
          .select(col("doc_id"),
            size(col("base")).cast("long").as("n_base"),
            size(col("keep")).cast("long").as("n_lang"),
            length(col("main")).cast("long").as("main_len"),
            md5(col("main").cast("binary")).as("main_md5"))
          .orderBy("doc_id")
    },

    // ── Language-DISPATCHED extraction (full jusText): the stopword
    //    tier is only meaningful with the right language's function
    //    words, so the set is a per-row CASE on the doc's language —
    //    en/fr/es/de each judge their own prose tail, zh (no
    //    space-delimited function words) falls through to length +
    //    density and KEEPS the number table the Latin rows drop: the
    //    per-language n_lang difference IS the dispatch, pinned per
    //    doc. fr/de drop stopword-diluted prose on the longest docs —
    //    the deterministic borderline showing the 0.05 bar needs
    //    per-language calibration, which is the operator's point. ──
    QueryDef.sql(
      "web_main_content_i18n",
      """WITH h AS (SELECT doc_id, coalesce(lang, '') AS lang,
        |  '<html><body><nav><a href="/">Home</a> <a href="/about">About</a></nav>' ||
        |  '<p>' || coalesce(text, '') ||
        |  CASE coalesce(lang, '')
        |    WHEN 'fr' THEN ' et le recit continue de la meme facon jusqu a la fin.'
        |    WHEN 'es' THEN ' y el relato sigue en la misma forma hasta el final de hoy.'
        |    WHEN 'de' THEN ' und die geschichte geht in der gleichen form bis zu dem ende.'
        |    WHEN 'en' THEN ' and the story goes on to the end of it all in time.'
        |    ELSE ' 故事继续到最后一页了吧。' END || '</p>' ||
        |  '<div>' || array_to_string(list_transform(range(0,20), i -> CAST((doc_id*7 + i*13) % 1000 AS VARCHAR)), ' ') || '</div>' ||
        |  '<footer>Copyright <a href="/l">legal</a></footer></body></html>' AS html
        |  FROM documents),
        |b AS (SELECT doc_id, lang, regexp_split_to_array(html,
        |  '(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|tr|td|th|section|article|header|footer|nav|aside|blockquote|pre|br)(?:\s[^>]*)?/?>') AS blocks FROM h),
        |e AS (SELECT doc_id, lang, list_transform(blocks, x -> struct_pack(
        |    txt := trim(regexp_replace(regexp_replace(x, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')),
        |    alen := CAST(length(trim(regexp_replace(regexp_replace(coalesce(array_to_string(regexp_extract_all(x, '(?is)<a(?:\s[^>]*)?>(.*?)</a>', 1), ' '), ''), '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g'))) AS BIGINT))) AS bs FROM b),
        |ne AS (SELECT doc_id, lang, list_filter(bs, s -> length(s.txt) > 0) AS bs FROM e),
        |k AS (SELECT doc_id, lang, bs,
        |  list_filter(bs, s -> length(s.txt) >= 25 AND CAST(s.alen AS DOUBLE) <= 0.33 * length(s.txt)) AS base,
        |  list_filter(bs, s -> length(s.txt) >= 25 AND CAST(s.alen AS DOUBLE) <= 0.33 * length(s.txt)
        |    AND CASE lang
        |      WHEN 'en' THEN CAST(len(list_filter(string_split(lower(s.txt), ' '), w -> w IN ('the','a','of','and','to','in','is'))) AS DOUBLE) / len(string_split(lower(s.txt), ' ')) >= 0.05
        |      WHEN 'fr' THEN CAST(len(list_filter(string_split(lower(s.txt), ' '), w -> w IN ('le','la','les','de','des','et','en','un','une','est'))) AS DOUBLE) / len(string_split(lower(s.txt), ' ')) >= 0.05
        |      WHEN 'es' THEN CAST(len(list_filter(string_split(lower(s.txt), ' '), w -> w IN ('el','la','los','de','y','en','un','una','es','que'))) AS DOUBLE) / len(string_split(lower(s.txt), ' ')) >= 0.05
        |      WHEN 'de' THEN CAST(len(list_filter(string_split(lower(s.txt), ' '), w -> w IN ('der','die','das','und','in','den','von','zu','ist','mit'))) AS DOUBLE) / len(string_split(lower(s.txt), ' ')) >= 0.05
        |      ELSE true END) AS keep FROM ne),
        |m AS (SELECT doc_id, lang, base, keep,
        |  coalesce(array_to_string(list_transform(keep, s -> s.txt), chr(10)), '') AS main FROM k)
        |SELECT doc_id, lang, CAST(len(base) AS BIGINT) AS n_base, CAST(len(keep) AS BIGINT) AS n_lang,
        |  md5(main) AS main_md5
        |FROM m ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val sets: Seq[(String, Seq[String])] = Seq(
          "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
          "fr" -> Seq("le", "la", "les", "de", "des", "et", "en", "un", "une", "est"),
          "es" -> Seq("el", "la", "los", "de", "y", "en", "un", "una", "es", "que"),
          "de" -> Seq("der", "die", "das", "und", "in", "den", "von", "zu", "ist", "mit"))
        val lang = coalesce(col("lang"), lit(""))
        val nums = concat_ws(" ",
          (0 until 20).map(i =>
            pmod(col("doc_id") * 7 + lit(i * 13), lit(1000)).cast("string")): _*)
        val tail = // CASE chain mirrors the oracle
          when(lang === "fr", " et le recit continue de la meme facon jusqu a la fin.")
            .when(lang === "es", " y el relato sigue en la misma forma hasta el final de hoy.")
            .when(lang === "de", " und die geschichte geht in der gleichen form bis zu dem ende.")
            .when(lang === "en", " and the story goes on to the end of it all in time.")
            .otherwise(" 故事继续到最后一页了吧。")
        val page = concat(
          lit("<html><body><nav><a href=\"/\">Home</a> <a href=\"/about\">About</a></nav><p>"),
          coalesce(col("text"), lit("")), tail,
          lit("</p><div>"), nums,
          lit("</div><footer>Copyright <a href=\"/l\">legal</a></footer></body></html>"))
        Tables.documents(s, d)
          .select(col("doc_id"), lang.as("lang"),
            TextOps.contentBlocks(page).as("bs"))
          .withColumn("base", filter(col("bs"), b => TextOps.contentKeep(b)))
          .withColumn("keep", filter(col("bs"),
            b => TextOps.contentKeepByLang(b, col("lang"), sets, minStopFrac = 0.05)))
          .withColumn("main",
            array_join(transform(col("keep"), _.getField("txt")), "\n"))
          .select(col("doc_id"), col("lang"),
            size(col("base")).cast("long").as("n_base"),
            size(col("keep")).cast("long").as("n_lang"),
            md5(col("main").cast("binary")).as("main_md5"))
          .orderBy("doc_id")
    },

    // ── Document-METADATA sidecar — the provenance record kept next to
    //    the extracted text (title, canonical URL for revisit collapse,
    //    og:title for social mirrors, html lang as the langid prior).
    //    The fixture exercises the failure modes that break naive
    //    one-step patterns: mod-3 docs have NO description (must yield
    //    '' not a neighboring attribute), mod-4 docs FLIP the attribute
    //    order (content= before name= — the two-step tag-then-attribute
    //    extraction resolves it; a name=.*content= pattern loses the
    //    whole field), mod-5 docs drop the canonical link, og:title on
    //    even docs only. ──
    QueryDef.sql(
      "web_doc_metadata",
      """WITH h AS (SELECT doc_id,
        |  '<html lang="' || coalesce(lang, '') || '"><head><title>Doc ' || doc_id || ' — site news</title>' ||
        |  CASE WHEN doc_id % 3 = 0 THEN ''
        |       WHEN doc_id % 4 = 0 THEN '<meta content="Summary for doc ' || doc_id || '." name="description">'
        |       ELSE '<meta name="description" content="Summary for doc ' || doc_id || '.">' END ||
        |  CASE WHEN doc_id % 2 = 0 THEN '<meta property="og:title" content="OG Doc ' || doc_id || '">' ELSE '' END ||
        |  CASE WHEN doc_id % 5 = 0 THEN '' ELSE '<link rel="canonical" href="https://example.com/d/' || doc_id || '">' END ||
        |  '</head><body><p>x</p></body></html>' AS html
        |  FROM documents)
        |SELECT doc_id,
        |  trim(regexp_replace(regexp_extract(html, '(?is)<title[^>]*>(.*?)</title>', 1), '\s+', ' ', 'g')) AS title,
        |  regexp_extract(html, '(?is)<html[^>]*\slang="([^"]*)"', 1) AS lang_attr,
        |  regexp_extract(regexp_extract(html, '(?is)<meta[^>]*\sname="description"[^>]*>', 0), '(?is)\scontent="([^"]*)"', 1) AS meta_desc,
        |  regexp_extract(regexp_extract(html, '(?is)<meta[^>]*\sproperty="og:title"[^>]*>', 0), '(?is)\scontent="([^"]*)"', 1) AS og_title,
        |  regexp_extract(regexp_extract(html, '(?is)<link[^>]*\srel="canonical"[^>]*>', 0), '(?is)\shref="([^"]*)"', 1) AS canonical
        |FROM h ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val id = col("doc_id").cast("string")
        val page = concat(
          lit("<html lang=\""), coalesce(col("lang"), lit("")),
          lit("\"><head><title>Doc "), id, lit(" — site news</title>"),
          when(pmod(col("doc_id"), lit(3)) === 0, "")
            .when(pmod(col("doc_id"), lit(4)) === 0,
              concat(lit("<meta content=\"Summary for doc "), id,
                lit(".\" name=\"description\">")))
            .otherwise(concat(lit("<meta name=\"description\" content=\"Summary for doc "),
              id, lit(".\">"))),
          when(pmod(col("doc_id"), lit(2)) === 0,
            concat(lit("<meta property=\"og:title\" content=\"OG Doc "), id, lit("\">")))
            .otherwise(""),
          when(pmod(col("doc_id"), lit(5)) === 0, "")
            .otherwise(concat(lit("<link rel=\"canonical\" href=\"https://example.com/d/"),
              id, lit("\">"))),
          lit("</head><body><p>x</p></body></html>"))
        Tables.documents(s, d)
          .select(col("doc_id"), TextOps.htmlMeta(page).as("m"))
          .select(col("doc_id"), col("m.title").as("title"),
            col("m.lang_attr").as("lang_attr"), col("m.meta_desc").as("meta_desc"),
            col("m.og_title").as("og_title"), col("m.canonical").as("canonical"))
          .orderBy("doc_id")
    },

    // ── Canonical-URL collapse — the metadata sidecar driving revisit
    //    dedup: mirrors/tracking-param variants fetched under DIFFERENT
    //    URLs declare the same <link rel=canonical>, and the collapse
    //    key is canonical-if-declared, else the fetch URL (a missing
    //    declaration must NOT collapse with anything — mod-5 docs pin
    //    that). doc_id%200 keys the shared canonical, so groups grow
    //    with SF (~2.5 members at sf0.001, 25 at sf0.1) while the
    //    fetch URLs stay unique. Keep-min groupBy — one partial-agg
    //    shuffle, the exact-dedup shape. ──
    QueryDef.sql(
      "web_canonical_collapse",
      """WITH h AS (SELECT doc_id,
        |  'https://m' || (doc_id % 7) || '.example.com/fetch/' || doc_id AS fetch_url,
        |  '<html><head><title>d</title>' ||
        |  CASE WHEN doc_id % 5 = 0 THEN ''
        |       ELSE '<link rel="canonical" href="https://example.com/d/' || (doc_id % 200) || '">' END ||
        |  '</head><body><p>x</p></body></html>' AS html
        |  FROM documents),
        |x AS (SELECT doc_id, fetch_url,
        |  regexp_extract(regexp_extract(html, '(?is)<link[^>]*\srel="canonical"[^>]*>', 0), '(?is)\shref="([^"]*)"', 1) AS canonical
        |  FROM h),
        |k AS (SELECT doc_id,
        |  CASE WHEN canonical = '' THEN fetch_url ELSE canonical END AS ckey FROM x)
        |SELECT ckey, CAST(min(doc_id) AS BIGINT) AS keeper_id,
        |  CAST(count(*) AS BIGINT) AS n_dups
        |FROM k GROUP BY ckey ORDER BY ckey""".stripMargin) {
      (s, d) =>
        val id = col("doc_id").cast("string")
        val page = concat(
          lit("<html><head><title>d</title>"),
          when(pmod(col("doc_id"), lit(5)) === 0, "")
            .otherwise(concat(lit("<link rel=\"canonical\" href=\"https://example.com/d/"),
              pmod(col("doc_id"), lit(200)).cast("string"), lit("\">"))),
          lit("</head><body><p>x</p></body></html>"))
        val fetchUrl = concat(lit("https://m"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".example.com/fetch/"), id)
        Tables.documents(s, d)
          .select(col("doc_id"), fetchUrl.as("fetch_url"),
            TextOps.htmlMeta(page).getField("canonical").as("canonical"))
          .select(col("doc_id"),
            when(col("canonical") === "", col("fetch_url"))
              .otherwise(col("canonical")).as("ckey"))
          .groupBy("ckey")
          .agg(min("doc_id").cast("long").as("keeper_id"),
            count(lit(1)).cast("long").as("n_dups"))
          .orderBy("ckey")
    },

    // ── PDF TEXT EXTRACTION — the document-format front gate: a real
    //    crawl's payload mix is full of application/pdf, and until now
    //    those blobs could only quarantine. [[graft.codec.PdfCodec]]
    //    is a bounded ISO 32000-1 extractor (xref tables AND 1.5 xref
    //    streams/ObjStm, FlateDecode via java.util.zip, BT/ET +
    //    Tj/'/TJ text operators, WinAnsi + ToUnicode CMaps,
    //    never-throw on hostile bytes). The fixture
    //    ([[graft.codec.PdfFixtures.docPdf]]) wraps seed-arithmetic
    //    text in four wire shapes — flate+octal escapes; two pages
    //    with /Filter array, indirect /Length, TJ kerning and the '
    //    operator; uncompressed+hex strings+T*; xref stream + object
    //    stream + PNG predictor + Type0/ToUnicode — so the oracle
    //    replays the expected text blind to the compressed bytes: the
    //    PDF wrapping cancels exactly iff the extractor is correct.
    //    Scale: pure per-row CPU on mapPartitions riding the scan
    //    (the adjudicated heavy-decoder shape), no shuffle. ──
    QueryDef.sql(
      "web_pdf_extract",
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 4 = 1 THEN 2 ELSE 1 END AS INT) AS n_pages,
        |  CAST(length(t) AS BIGINT) AS n_chars, md5(t) AS text_md5
        |FROM (SELECT doc_id,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'Doc ' || doc_id || ' café résumé (ok)'
        |    WHEN 1 THEN 'Alpha beta gamma ' || doc_id || chr(10) || 'kerned' ||
        |      chr(10) || 'Second' || chr(10) || 'page ' || doc_id
        |    WHEN 2 THEN 'Hex row ' || doc_id || chr(10) || 'next line'
        |    ELSE 'Кириллица ' || doc_id
        |  END AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = QueryDef.fanOutIfNarrow(
          Tables.documents(s, d).select(col("doc_id")))
          .as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.PdfFixtures.docPdf(id))))
          .toDF("doc_id", "payload")
        graft.operators.Pdf.extractText(payloads, "doc_id", "payload")
          .select(col("doc_id"), col("n_pages"),
            length(col("text")).cast("long").as("n_chars"),
            md5(col("text").cast("binary")).as("text_md5"))
          .orderBy("doc_id")
    },

    // ── PDF DOCUMENT METADATA — the /Info sidecar fields (title,
    //    author) a corpus pipeline keys provenance and dedup
    //    heuristics on: the same four-variant fixture carries a
    //    Latin-1 literal Info, a hex UTF-16BE-with-BOM Info (Cyrillic
    //    — §7.9.2.2's other text-string form), a title-only dict, and
    //    NO Info at all (variant 1 — the absent branch must surface
    //    nulls, not vanish). Oracle replays all four arithmetically. ──
    QueryDef.sql(
      "web_pdf_meta",
      """SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 4 = 1 THEN 2 ELSE 1 END AS INT) AS n_pages,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'Report ' || doc_id || ' café'
        |    WHEN 2 THEN 'Hex sheet ' || doc_id
        |    WHEN 3 THEN 'Документ ' || doc_id
        |  END AS title,
        |  CASE doc_id % 4
        |    WHEN 0 THEN 'Graft Bot'
        |    WHEN 3 THEN 'Автор ' || doc_id
        |  END AS author
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = QueryDef.fanOutIfNarrow(
          Tables.documents(s, d).select(col("doc_id")))
          .as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.PdfFixtures.docPdf(id))))
          .toDF("doc_id", "payload")
        graft.operators.Pdf.extractMeta(payloads, "doc_id", "payload")
          .select(col("doc_id"), col("n_pages"), col("title"), col("author"))
          .orderBy("doc_id")
    },

    // ── PDF + HTML FUNNEL — PDFs entering the text funnel NEXT TO
    //    html, with observable drops per VERDICT class: even docs
    //    carry a PDF payload — every tenth (%10=6) a truncated
    //    header-only stub that must fail extraction (`corrupt`), every
    //    tenth (%10=2) an ENCRYPTED document whose trailer carries
    //    /Encrypt (must classify `encrypted`, never launder into
    //    ok-with-zero-tokens — the streams are ciphertext), every
    //    tenth (%10=8) an LZWDecode-compressed legacy document that
    //    must extract (`ok`, 4 tokens) — odd docs an HTML shell; the
    //    magic-byte router splits the stream, each arm extracts with
    //    its own gate (PdfCodec / htmlExtract), and the funnel reports
    //    per (kind, verdict): arrivals and recovered token mass. The
    //    oracle replays every class arithmetically — even/odd split,
    //    the %10 corrupt/encrypted/lzw classes, and the per-variant
    //    token counts of the recovered text. ──
    QueryDef.sql(
      "web_pdf_funnel",
      """WITH t AS (SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 1 THEN 'html' ELSE 'pdf' END AS kind,
        |  CASE WHEN doc_id % 2 = 1 THEN 'ok'
        |       WHEN doc_id % 10 = 6 THEN 'corrupt'
        |       WHEN doc_id % 10 = 2 THEN 'encrypted'
        |       ELSE 'ok' END AS verdict,
        |  CASE WHEN doc_id % 2 = 1 THEN 6
        |       WHEN doc_id % 10 = 6 THEN 0
        |       WHEN doc_id % 10 = 2 THEN 0
        |       WHEN doc_id % 10 = 8 THEN 4
        |       ELSE 5 END AS toks
        |  FROM documents)
        |SELECT kind, verdict, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS sum_tokens
        |FROM t GROUP BY kind, verdict ORDER BY kind, verdict""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = QueryDef.fanOutIfNarrow(
          Tables.documents(s, d).select(col("doc_id")))
          .as[Long]
          .mapPartitions(_.map { id =>
            val blob =
              if (id % 2 == 1)
                s"<html><body><p>Doc $id html body words here</p></body></html>"
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8)
              else if (id % 10 == 6)
                // truncated header-only stub: classifies as pdf at the
                // router, fails extraction at the gate — the funnel
                // must COUNT it, not vanish it
                "%PDF-1.5\n".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
              else if (id % 10 == 2) graft.codec.PdfFixtures.encryptedPdf(id)
              else if (id % 10 == 8) graft.codec.PdfFixtures.lzwPdf(id)
              else graft.codec.PdfFixtures.docPdf(id)
            (id, blob)
          })
          .toDF("doc_id", "payload")
          .withColumn("kind", graft.operators.Pdf.sniffKind(col("payload")))
        val pdfArm = graft.operators.Pdf.extractText(
          payloads.filter(col("kind") === "pdf"), "doc_id", "payload")
          .select(col("doc_id"), lit("pdf").as("kind"),
            col("verdict"), col("pdf_ok").as("ok"), col("text"))
        val htmlArm = payloads.filter(col("kind") === "html")
          .select(col("doc_id"), lit("html").as("kind"),
            lit("ok").as("verdict"), lit(true).as("ok"),
            TextOps.htmlExtract(col("payload").cast("string")).as("text"))
        pdfArm.unionByName(htmlArm)
          .withColumn("toks",
            when(col("ok") && length(col("text")) > 0,
              size(split(col("text"), "\\s+"))).otherwise(lit(0)).cast("long"))
          .groupBy("kind", "verdict")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("toks")).cast("long").as("sum_tokens"))
          .orderBy("kind", "verdict")
    },

    // ── DOCX TEXT EXTRACTION — the office-format front gate:
    //    `application/vnd…wordprocessingml.document` is a ZIP of XML,
    //    so [[graft.codec.DocxCodec]] composes substrates the repo
    //    already owns (ZipCodec container incl. foreign-DEFLATE
    //    members, a WordprocessingML leaf walk with run concatenation,
    //    tab/br substitution, entity decode) plus the Dublin Core
    //    sidecar. The fixture ([[graft.codec.DocxFixtures.docDocx]])
    //    wraps seed-arithmetic text in three wire shapes — single
    //    run; two paragraphs with <w:tab/>, xml:space and &amp;;
    //    a word split across runs with proofErr noise between — and
    //    DEFLATE-compresses word/document.xml, so the oracle replays
    //    the expected text blind to container AND compression: the
    //    wrapping cancels exactly iff the extractor is right. Variant
    //    keys on (id/3)%3 so it stays coprime with the mixed funnel's
    //    id%3 router. Scale: per-row CPU on mapPartitions riding the
    //    scan (the adjudicated heavy-decoder shape), no shuffle. ──
    QueryDef.sql(
      "web_docx_extract",
      """SELECT doc_id,
        |  CAST(CASE WHEN (doc_id // 3) % 3 = 1 THEN 2 ELSE 1 END AS INT) AS n_paras,
        |  CAST(length(t) AS BIGINT) AS n_chars, md5(t) AS text_md5,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Doc Props ' || doc_id
        |    WHEN 2 THEN 'Split Doc ' || doc_id
        |  END AS title,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Writer ' || (doc_id % 7)
        |    WHEN 2 THEN 'Runs Writer'
        |  END AS creator
        |FROM (SELECT doc_id,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Docx body ' || doc_id || ' alpha'
        |    WHEN 1 THEN 'Para one ' || doc_id || chr(10) || 'Tab' ||
        |      chr(9) || 'here & done'
        |    ELSE 'Split' || doc_id || ' joined'
        |  END AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = QueryDef.fanOutIfNarrow(
          Tables.documents(s, d).select(col("doc_id")))
          .as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.DocxFixtures.docDocx(id))))
          .toDF("doc_id", "payload")
        graft.operators.Docx.extractText(payloads, "doc_id", "payload")
          .select(col("doc_id"), col("n_paras"),
            length(col("text")).cast("long").as("n_chars"),
            md5(col("text").cast("binary")).as("text_md5"),
            col("title"), col("creator"))
          .orderBy("doc_id")
    },

    // ── PPTX TEXT EXTRACTION — the third office face on the same
    //    substrates (ZipCodec container + the shared paragraph walk
    //    under DrawingML's `a:` prefix + Dublin Core sidecar). The
    //    fixture wire shapes: single run; TWO slides whose members are
    //    written WIRE-REVERSED (slide2 before slide1 — the codec must
    //    order slides numerically, not by member position or name
    //    lexicographics); a word split across runs with an <a:br/>
    //    line break. DEFLATE members, so the oracle replays text blind
    //    to container and compression, like web_docx_extract. ──
    QueryDef.sql(
      "web_pptx_extract",
      """SELECT doc_id,
        |  CAST(CASE WHEN (doc_id // 3) % 3 = 1 THEN 2 ELSE 1 END AS INT) AS n_slides,
        |  CAST(CASE WHEN (doc_id // 3) % 3 = 1 THEN 3 ELSE 1 END AS INT) AS n_paras,
        |  CAST(length(t) AS BIGINT) AS n_chars, md5(t) AS text_md5,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Deck Props ' || doc_id
        |    WHEN 2 THEN 'Split Deck ' || doc_id
        |  END AS title
        |FROM (SELECT doc_id,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Deck body ' || doc_id || ' intro'
        |    WHEN 1 THEN 'Deck ' || doc_id || ' one' || chr(10) ||
        |      'Two a ' || doc_id || chr(10) || 'Two b'
        |    ELSE 'Pptx' || doc_id || ' joined' || chr(10) || 'next'
        |  END AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = QueryDef.fanOutIfNarrow(
          Tables.documents(s, d).select(col("doc_id")))
          .as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.DocxFixtures.docPptx(id))))
          .toDF("doc_id", "payload")
        graft.operators.Docx.extractPptxText(payloads, "doc_id", "payload")
          .select(col("doc_id"), col("n_slides"), col("n_paras"),
            length(col("text")).cast("long").as("n_chars"),
            md5(col("text").cast("binary")).as("text_md5"),
            col("title"))
          .orderBy("doc_id")
    },

    // ── XLSX TEXT EXTRACTION — the fourth office face, and the one
    //    with an INDIRECTION the others lack: string cells index into
    //    the workbook's shared-strings table (the format's dedup of
    //    repeated values), so a correct extraction proves container +
    //    inflate + table parse + index resolution all compose. Wire
    //    shapes: shared + raw-numeric + REUSED index; two sheets
    //    wire-reversed with inlineStr, t="str" formula text, and a
    //    rich-run <si> (runs concatenate); an escaped entity, an
    //    empty <c/>, and an OUT-OF-RANGE shared index that must read
    //    empty, never throw. Oracle replays cells/rows/sheets joined
    //    under the pinned '\t'/'\n' rules, blind to compression. ──
    QueryDef.sql(
      "web_xlsx_extract",
      """SELECT doc_id,
        |  CAST(CASE WHEN (doc_id // 3) % 3 = 1 THEN 2 ELSE 1 END AS INT) AS n_sheets,
        |  CAST(CASE WHEN (doc_id // 3) % 3 = 2 THEN 1 ELSE 2 END AS INT) AS n_rows,
        |  CAST(CASE WHEN (doc_id // 3) % 3 = 0 THEN 4 ELSE 3 END AS INT) AS n_cells,
        |  CAST(length(t) AS BIGINT) AS n_chars, md5(t) AS text_md5,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Book Props ' || doc_id
        |    WHEN 2 THEN 'Sheet Props ' || doc_id
        |  END AS title
        |FROM (SELECT doc_id,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Cell ' || doc_id || chr(9) || '42' || chr(10) ||
        |      'shared word' || chr(9) || 'shared word'
        |    WHEN 1 THEN 'Inline ' || doc_id || ' text' || chr(9) || 'S' ||
        |      doc_id || chr(10) || 'Rich run ' || doc_id
        |    ELSE 'A & B ' || doc_id || chr(9) || chr(9)
        |  END AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = QueryDef.fanOutIfNarrow(
          Tables.documents(s, d).select(col("doc_id")))
          .as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.DocxFixtures.docXlsx(id))))
          .toDF("doc_id", "payload")
        graft.operators.Docx.extractXlsxText(payloads, "doc_id", "payload")
          .select(col("doc_id"), col("n_sheets"), col("n_rows"), col("n_cells"),
            length(col("text")).cast("long").as("n_chars"),
            md5(col("text").cast("binary")).as("text_md5"),
            col("title"))
          .orderBy("doc_id")
    },

    // ── MIXED-FORMAT FUNNEL — the document-format router end to end:
    //    one payload stream carrying pdf (id%3=0, all four PdfFixtures
    //    wire variants), html (id%3=1), and docx (id%3=2, every ninth
    //    a PK-magic truncated stub that must classify docx at the
    //    router and fail at the gate); [[graft.operators.Pdf.sniffKind]]
    //    splits on magic bytes, each arm extracts with its own codec,
    //    and the funnel reports (kind, verdict, arrivals, recovered
    //    token mass). The oracle replays every class arithmetically —
    //    the id%3 router, the pdf per-variant token counts, the docx
    //    (id/3)%3 variants, and the %9 corrupt class. ──
    QueryDef.sql(
      "web_doc_mix_funnel",
      """WITH t AS (SELECT doc_id,
        |  CASE doc_id % 3 WHEN 0 THEN 'pdf' WHEN 1 THEN 'html' ELSE 'docx' END AS kind,
        |  CASE WHEN doc_id % 3 = 2 AND doc_id % 9 = 5 THEN 'corrupt'
        |       ELSE 'ok' END AS verdict,
        |  CASE WHEN doc_id % 3 = 0 THEN
        |         CASE doc_id % 4 WHEN 0 THEN 5 WHEN 1 THEN 8 WHEN 2 THEN 5 ELSE 2 END
        |       WHEN doc_id % 3 = 1 THEN 6
        |       WHEN doc_id % 9 = 5 THEN 0
        |       ELSE CASE (doc_id // 3) % 3 WHEN 0 THEN 4 WHEN 1 THEN 7 ELSE 2 END
        |       END AS toks
        |  FROM documents)
        |SELECT kind, verdict, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS sum_tokens
        |FROM t GROUP BY kind, verdict ORDER BY kind, verdict""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = QueryDef.fanOutIfNarrow(
          Tables.documents(s, d).select(col("doc_id")))
          .as[Long]
          .mapPartitions(_.map { id =>
            val blob =
              if (id % 3 == 0) graft.codec.PdfFixtures.docPdf(id)
              else if (id % 3 == 1)
                s"<html><body><p>Doc $id html body words here</p></body></html>"
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8)
              else if (id % 9 == 5) graft.codec.DocxFixtures.corruptDocx(id)
              else graft.codec.DocxFixtures.docDocx(id)
            (id, blob)
          })
          .toDF("doc_id", "payload")
          .withColumn("kind", graft.operators.Pdf.sniffKind(col("payload")))
        val pdfArm = graft.operators.Pdf.extractText(
          payloads.filter(col("kind") === "pdf"), "doc_id", "payload")
          .select(col("doc_id"), lit("pdf").as("kind"), col("verdict"),
            col("pdf_ok").as("ok"), col("text"))
        val docxArm = graft.operators.Docx.extractText(
          payloads.filter(col("kind") === "docx"), "doc_id", "payload")
          .select(col("doc_id"), lit("docx").as("kind"), col("verdict"),
            col("docx_ok").as("ok"), col("text"))
        val htmlArm = payloads.filter(col("kind") === "html")
          .select(col("doc_id"), lit("html").as("kind"),
            lit("ok").as("verdict"), lit(true).as("ok"),
            TextOps.htmlExtract(col("payload").cast("string")).as("text"))
        pdfArm.unionByName(docxArm).unionByName(htmlArm)
          .withColumn("toks",
            when(col("ok") && length(col("text")) > 0,
              size(split(col("text"), "\\s+"))).otherwise(lit(0)).cast("long"))
          .groupBy("kind", "verdict")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("toks")).cast("long").as("sum_tokens"))
          .orderBy("kind", "verdict")
    },

    // ── EPUB CHAPTER EXTRACTION — books are a first-class corpus
    //    source, and an EPUB's reading order lives behind TWO
    //    indirections (container.xml → package document → manifest
    //    join → spine): the codec returns spine chapters in READING
    //    order and the markup→text step runs through the SAME
    //    htmlExtract column every crawled page uses — one extraction
    //    doctrine for the whole corpus. Wire shapes: single chapter;
    //    member AND manifest order REVERSED vs the spine (reading
    //    order is the spine's, nothing else's) with a css item that
    //    must skip; a nested package dir whose chapter href climbs
    //    `../`. Per-CHAPTER output rows, so a reading-order slip is a
    //    hash mismatch, not an averaged-away detail. ──
    QueryDef.sql(
      "web_epub_extract",
      """SELECT doc_id, idx,
        |  CAST(length(t) AS BIGINT) AS n_chars, md5(t) AS text_md5,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Book Props ' || doc_id
        |    WHEN 2 THEN 'Deep Props ' || doc_id
        |  END AS title
        |FROM (
        |  SELECT doc_id, 0 AS idx,
        |    CASE (doc_id // 3) % 3
        |      WHEN 0 THEN 'Book ' || doc_id || ' opening line'
        |      WHEN 1 THEN 'Chapter one ' || doc_id
        |      ELSE 'Deep link ' || doc_id || ' works'
        |    END AS t FROM documents
        |  UNION ALL
        |  SELECT doc_id, 1, 'Chapter two ' || doc_id
        |  FROM documents WHERE (doc_id // 3) % 3 = 1)
        |ORDER BY doc_id, idx""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = QueryDef.fanOutIfNarrow(
          Tables.documents(s, d).select(col("doc_id")))
          .as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.DocxFixtures.docEpub(id))))
          .toDF("doc_id", "payload")
        graft.operators.Epub.chapters(payloads, "doc_id", "payload")
          .select(col("doc_id"), col("chapter_idx").as("idx"),
            TextOps.htmlExtract(col("xhtml")).as("_t"), col("title"))
          .select(col("doc_id"), col("idx"),
            length(col("_t")).cast("long").as("n_chars"),
            md5(col("_t").cast("binary")).as("text_md5"),
            col("title"))
          .orderBy("doc_id", "idx")
    },

    // ── RTF TEXT EXTRACTION — the legacy word-processor face:
    //    [[graft.codec.RtfCodec]] is a from-scratch tokenizer over the
    //    public RTF grammar (groups, control words, destinations, hex
    //    and unicode escapes with fallback skip, the {\info} sidecar).
    //    The fixture ([[graft.codec.RtfFixtures.docRtf]]) wraps
    //    seed-arithmetic text in three wire shapes — font table +
    //    formatting chain; two paragraphs with \tab, a cp1252 hex
    //    escape and a unicode-with-fallback; starred-destination noise
    //    with a word split across a formatting group and an \emdash —
    //    so the oracle replays the expected text blind to the RTF
    //    wrapping: escapes and destination skipping cancel exactly iff
    //    the tokenizer is right. Variant keys on (id/3)%3, coprime
    //    with the mixed funnel's router. Scale: per-row CPU on
    //    mapPartitions riding the scan (the adjudicated heavy-decoder
    //    shape), no shuffle. ──
    QueryDef.sql(
      "web_rtf_extract",
      """SELECT doc_id,
        |  CAST(CASE WHEN (doc_id // 3) % 3 = 1 THEN 2 ELSE 1 END AS INT) AS n_paras,
        |  CAST(length(t) AS BIGINT) AS n_chars, md5(t) AS text_md5,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Rtf Props ' || doc_id
        |    WHEN 2 THEN 'Split Rtf ' || doc_id
        |  END AS title,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Writer ' || (doc_id % 7)
        |    WHEN 2 THEN 'Runs Writer'
        |  END AS author
        |FROM (SELECT doc_id,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Rtf body ' || doc_id || ' alpha'
        |    WHEN 1 THEN 'Para one ' || doc_id || chr(10) || 'Tab' ||
        |      chr(9) || 'caf' || chr(233) || ' plus ' || chr(8364) || 'done'
        |    ELSE 'Split' || doc_id || ' joined' || chr(8212) || 'end'
        |  END AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = QueryDef.fanOutIfNarrow(
          Tables.documents(s, d).select(col("doc_id")))
          .as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.RtfFixtures.docRtf(id))))
          .toDF("doc_id", "payload")
        graft.operators.Rtf.extractText(payloads, "doc_id", "payload")
          .select(col("doc_id"), col("n_paras"),
            length(col("text")).cast("long").as("n_chars"),
            md5(col("text").cast("binary")).as("text_md5"),
            col("title"), col("author"))
          .orderBy("doc_id")
    },

    // ── LEGACY .DOC TEXT EXTRACTION — the Word-binary face:
    //    [[graft.codec.CfbCodec]] parses the OLE2 compound container
    //    from scratch (header/DIFAT/FAT/directory/miniFAT, both the
    //    mini-stream and FAT read paths), and [[graft.codec.DocCodec]]
    //    walks FIB → table-stream Clx → piece table, assembling
    //    cp1252 and UTF-16LE pieces in CP order. The fixture
    //    ([[graft.codec.DocFixtures.docDoc]]) exercises the mini path
    //    with sidecar, the FAT path with a unicode piece, and
    //    reversed-file-order pieces with a Prc to skip and field
    //    markers to drop — the oracle replays the expected text blind
    //    to container, FIB and piece indirection: it cancels exactly
    //    iff the whole chain is right. Variant keys on (id/3)%3.
    //    Scale: per-row CPU on mapPartitions riding the scan. ──
    QueryDef.sql(
      "web_doc_extract",
      """SELECT doc_id,
        |  CAST(CASE WHEN (doc_id // 3) % 3 = 1 THEN 2 ELSE 1 END AS INT) AS n_paras,
        |  CAST(length(t) AS BIGINT) AS n_chars, md5(t) AS text_md5,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Doc Props ' || doc_id
        |    WHEN 2 THEN 'Split Doc ' || doc_id
        |  END AS title,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Writer ' || (doc_id % 7)
        |    WHEN 2 THEN 'Runs Writer'
        |  END AS author
        |FROM (SELECT doc_id,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Doc body ' || doc_id || ' alpha'
        |    WHEN 1 THEN 'Para one ' || doc_id || chr(10) || 'Tab' ||
        |      chr(9) || 'here ' || chr(8364) || ' done'
        |    ELSE 'Split' || doc_id || ' joined'
        |  END AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = QueryDef.fanOutIfNarrow(
          Tables.documents(s, d).select(col("doc_id")))
          .as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.DocFixtures.docDoc(id))))
          .toDF("doc_id", "payload")
        graft.operators.Doc.extractText(payloads, "doc_id", "payload")
          .select(col("doc_id"), col("n_paras"),
            length(col("text")).cast("long").as("n_chars"),
            md5(col("text").cast("binary")).as("text_md5"),
            col("title"), col("author"))
          .orderBy("doc_id")
    },

    // ── ODT TEXT EXTRACTION — the OpenDocument face:
    //    [[graft.codec.OdtCodec]] folds ODF's MIXED-content paragraphs
    //    (raw text interleaved with spans/bookmarks/fields) under
    //    pinned rules — tab/line-break substitution, run-length
    //    `<text:s text:c="N"/>` spaces, entity decode — on the shared
    //    ZipCodec container. Fixture wire shapes: span-wrapped
    //    paragraph; tab + run-length spaces + entity; a word split
    //    across spans with bookmark noise and a line break. The
    //    oracle replays the text blind to container and compression. ──
    QueryDef.sql(
      "web_odt_extract",
      """SELECT doc_id,
        |  CAST(CASE WHEN (doc_id // 3) % 3 = 1 THEN 2 ELSE 1 END AS INT) AS n_paras,
        |  CAST(length(t) AS BIGINT) AS n_chars, md5(t) AS text_md5,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Odt Props ' || doc_id
        |    WHEN 2 THEN 'Split Odt ' || doc_id
        |  END AS title,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Writer ' || (doc_id % 7)
        |    WHEN 2 THEN 'Spans Writer'
        |  END AS creator
        |FROM (SELECT doc_id,
        |  CASE (doc_id // 3) % 3
        |    WHEN 0 THEN 'Odt body ' || doc_id || ' alpha'
        |    WHEN 1 THEN 'Para one ' || doc_id || chr(10) || 'Tab' ||
        |      chr(9) || 'here  & done'
        |    ELSE 'Split' || doc_id || ' joined' || chr(10) || 'next'
        |  END AS t FROM documents)
        |ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = QueryDef.fanOutIfNarrow(
          Tables.documents(s, d).select(col("doc_id")))
          .as[Long]
          .mapPartitions(_.map(id => (id, graft.codec.OdtFixtures.docOdt(id))))
          .toDF("doc_id", "payload")
        graft.operators.Docx.extractOdtText(payloads, "doc_id", "payload")
          .select(col("doc_id"), col("n_paras"),
            length(col("text")).cast("long").as("n_chars"),
            md5(col("text").cast("binary")).as("text_md5"),
            col("title"), col("creator"))
          .orderBy("doc_id")
    },

    // ── OFFICE-FORMAT FUNNEL — the full document router across all
    //    NINE payload classes one corpus stream carries: pdf, html,
    //    docx, pptx, xlsx, a PK-magic stub with no walkable central
    //    directory (a truncated download — must classify
    //    `opc`/`corrupt`, never vanish), rtf, legacy OLE2 .doc, and
    //    ODT (whose STORED mimetype member means first-KB tokens say
    //    only "zip" — the content-aware stage names it).
    //    Routing is two-stage like a real pipeline: magic bytes split
    //    pdf/html/PK/rtf/ole2, then the OPC classifier reads the
    //    central directory's member NAMES (zero payload decompression
    //    — real writers DEFLATE [Content_Types].xml, so first-KB
    //    tokens cannot distinguish the office faces). Every format
    //    variant cycles live under the (id/3)%3 keying; the oracle
    //    replays the id%9 router and each format's per-variant token
    //    arithmetic. ──
    QueryDef.sql(
      "web_office_funnel",
      """WITH t AS (SELECT doc_id,
        |  CASE doc_id % 9 WHEN 0 THEN 'pdf' WHEN 1 THEN 'html'
        |    WHEN 2 THEN 'docx' WHEN 3 THEN 'pptx' WHEN 4 THEN 'xlsx'
        |    WHEN 5 THEN 'opc' WHEN 6 THEN 'rtf' WHEN 7 THEN 'doc'
        |    ELSE 'odt' END AS kind,
        |  CASE WHEN doc_id % 9 = 5 THEN 'corrupt' ELSE 'ok' END AS verdict,
        |  CASE doc_id % 9
        |    WHEN 0 THEN 5
        |    WHEN 1 THEN 6
        |    WHEN 2 THEN CASE (doc_id // 3) % 3 WHEN 0 THEN 4 WHEN 1 THEN 7 ELSE 2 END
        |    WHEN 3 THEN CASE (doc_id // 3) % 3 WHEN 0 THEN 4 WHEN 1 THEN 8 ELSE 3 END
        |    WHEN 4 THEN CASE (doc_id // 3) % 3 WHEN 0 THEN 7 WHEN 1 THEN 7 ELSE 4 END
        |    WHEN 6 THEN CASE (doc_id // 3) % 3 WHEN 0 THEN 4 WHEN 1 THEN 7 ELSE 2 END
        |    WHEN 7 THEN CASE (doc_id // 3) % 3 WHEN 0 THEN 4 WHEN 1 THEN 7 ELSE 2 END
        |    WHEN 8 THEN CASE (doc_id // 3) % 3 WHEN 0 THEN 4 WHEN 1 THEN 7 ELSE 3 END
        |    ELSE 0 END AS toks
        |  FROM documents)
        |SELECT kind, verdict, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(toks) AS BIGINT) AS sum_tokens
        |FROM t GROUP BY kind, verdict ORDER BY kind, verdict""".stripMargin) {
      (s, d) =>
        import s.implicits._
        val payloads = QueryDef.fanOutIfNarrow(
          Tables.documents(s, d).select(col("doc_id")))
          .as[Long]
          .mapPartitions(_.map { id =>
            val fx = graft.codec.DocxFixtures
            val blob = (id % 9) match {
              case 0 => graft.codec.PdfFixtures.docPdf(id)
              case 1 => s"<html><body><p>Doc $id html body words here</p></body></html>"
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
              case 2 => fx.docDocx(id)
              case 3 => fx.docPptx(id)
              case 4 => fx.docXlsx(id)
              case 5 => fx.corruptDocx(id)
              case 6 => graft.codec.RtfFixtures.docRtf(id)
              case 7 => graft.codec.DocFixtures.docDoc(id)
              case _ => graft.codec.OdtFixtures.docOdt(id)
            }
            (id, blob)
          })
          .toDF("doc_id", "payload")
        // stage 1: magic bytes (codegen'd Column ops)
        val routed = payloads
          .withColumn("k1", graft.operators.Pdf.sniffKind(col("payload")))
        // stage 2: OPC content classification by central-directory
        // names, only for the PK-routed slice (docx/zip from sniffKind)
        val isOpc = col("k1").isin("docx", "zip")
        val opcSlice = routed.filter(isOpc)
          .as[(Long, Array[Byte], String)]
          .mapPartitions(_.map { case (id, blob, _) =>
            (id, blob, graft.operators.Docx.sniffOoxml(blob))
          })
          .toDF("doc_id", "payload", "kind")
        val pdfArm = graft.operators.Pdf.extractText(
          routed.filter(col("k1") === "pdf"), "doc_id", "payload")
          .select(col("doc_id"), lit("pdf").as("kind"), col("verdict"), col("text"))
        val htmlArm = routed.filter(col("k1") === "html")
          .select(col("doc_id"), lit("html").as("kind"),
            lit("ok").as("verdict"),
            TextOps.htmlExtract(col("payload").cast("string")).as("text"))
        val docxArm = graft.operators.Docx.extractText(
          opcSlice.filter(col("kind") === "docx"), "doc_id", "payload")
          .select(col("doc_id"), lit("docx").as("kind"), col("verdict"), col("text"))
        val pptxArm = graft.operators.Docx.extractPptxText(
          opcSlice.filter(col("kind") === "pptx"), "doc_id", "payload")
          .select(col("doc_id"), lit("pptx").as("kind"), col("verdict"), col("text"))
        val xlsxArm = graft.operators.Docx.extractXlsxText(
          opcSlice.filter(col("kind") === "xlsx"), "doc_id", "payload")
          .select(col("doc_id"), lit("xlsx").as("kind"), col("verdict"), col("text"))
        val odtArm = graft.operators.Docx.extractOdtText(
          opcSlice.filter(col("kind") === "odt"), "doc_id", "payload")
          .select(col("doc_id"), lit("odt").as("kind"), col("verdict"), col("text"))
        val corruptArm = opcSlice
          .filter(!col("kind").isin("docx", "pptx", "xlsx", "odt"))
          .select(col("doc_id"), lit("opc").as("kind"),
            lit("corrupt").as("verdict"), lit(null).cast("string").as("text"))
        val rtfArm = graft.operators.Rtf.extractText(
          routed.filter(col("k1") === "rtf"), "doc_id", "payload")
          .select(col("doc_id"), lit("rtf").as("kind"), col("verdict"), col("text"))
        val docArm = graft.operators.Doc.extractText(
          routed.filter(col("k1") === "ole2"), "doc_id", "payload")
          .select(col("doc_id"), lit("doc").as("kind"), col("verdict"), col("text"))
        pdfArm.unionByName(htmlArm).unionByName(docxArm)
          .unionByName(pptxArm).unionByName(xlsxArm).unionByName(corruptArm)
          .unionByName(rtfArm).unionByName(docArm).unionByName(odtArm)
          .withColumn("toks",
            // split-then-drop-empties, NOT trim-then-split: Spark's
            // trim strips only spaces, and the xlsx face legitimately
            // ends rows in '\t' (empty trailing cells are layout)
            when(col("verdict") === "ok" && length(col("text")) > 0,
              size(filter(split(col("text"), "\\s+"), _ =!= "")))
              .otherwise(lit(0)).cast("long"))
          .groupBy("kind", "verdict")
          .agg(count(lit(1)).cast("long").as("n_docs"),
            sum(col("toks")).cast("long").as("sum_tokens"))
          .orderBy("kind", "verdict")
    },

    // ── PAGE-level ROBOTS directives — the per-document half of the
    //    robots contract (robots.txt is site-level): <meta
    //    name=robots> and the X-Robots-Tag header fold into one
    //    (noindex, nofollow) verdict under the pinned precedence
    //    doctrine. Every branch is live in the fixture: v0 generic
    //    meta noindex; v1 FLIPPED attribute order (content= before
    //    name=) plus an agent-PREFIXED header line that must apply;
    //    v2 agent-specific meta `all` PREEMPTING a generic `noindex`
    //    (union would read noindex — preemption is observable); v3
    //    header-only, unprefixed applying vs alien `otherbot:` prefix
    //    dropping; v4 two generic metas whose tokens UNION
    //    (index,follow + nofollow). The oracle replays the verdict
    //    table arithmetically. ──
    QueryDef.sql(
      "web_page_robots",
      """SELECT doc_id,
        |  CASE WHEN doc_id % 5 IN (0, 1) THEN true
        |       WHEN doc_id % 5 = 3 AND doc_id % 10 = 3 THEN true
        |       ELSE false END AS noindex,
        |  CASE WHEN doc_id % 5 IN (1, 4) THEN true ELSE false END AS nofollow
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val html = when(pmod(col("doc_id"), lit(5)) === 0,
          lit("<html><head><meta name=\"robots\" content=\"noindex\"></head><body>a</body></html>"))
          .when(pmod(col("doc_id"), lit(5)) === 1,
            lit("<html><head><meta content=\"nofollow\" name=\"robots\"></head><body>b</body></html>"))
          .when(pmod(col("doc_id"), lit(5)) === 2,
            lit("<html><head><meta name=\"graftbot\" content=\"all\">" +
              "<meta name=\"robots\" content=\"noindex\"></head><body>c</body></html>"))
          .when(pmod(col("doc_id"), lit(5)) === 3,
            lit("<html><head></head><body>d</body></html>"))
          .otherwise(
            lit("<html><head><meta name=\"robots\" content=\"index, follow\">" +
              "<meta name=\"robots\" content=\"nofollow\"></head><body>e</body></html>"))
        val header = when(pmod(col("doc_id"), lit(10)) === 3, lit("noindex, noarchive"))
          .when(pmod(col("doc_id"), lit(10)) === 8, lit("otherbot: noindex, nofollow"))
          .when(pmod(col("doc_id"), lit(5)) === 1, lit("graftbot: noindex"))
          .otherwise(lit(null).cast("string"))
        Tables.documents(s, d)
          .select(col("doc_id"), TextOps.pageRobots(html, header, "graftbot").as("_v"))
          .select(col("doc_id"),
            col("_v").getField("noindex").as("noindex"),
            col("_v").getField("nofollow").as("nofollow"))
          .orderBy("doc_id")
    },

    // ── META-REFRESH redirects — the third redirect channel beside
    //    the 3xx Location header and rel=canonical:
    //    [[TextOps.metaRefresh]] under its pinned semantics. Every
    //    branch is live: v0 relative target resolved against the page
    //    URL; v1 FLIPPED attribute order with an absolute target and
    //    uppercase `URL=`; v2 delay-only self-reload (has_refresh but
    //    NO redirect edge); v3 no refresh tag; v4 whitespace +
    //    single-quoted target. `is_redirect` applies the crawl
    //    convention (delay ≤ 5 and a target). The oracle replays the
    //    delay/target table arithmetically — resolution included,
    //    since the fixture URLs are seed arithmetic. ──
    QueryDef.sql(
      "web_meta_refresh",
      """SELECT doc_id,
        |  (doc_id % 5) <> 3 AS has_refresh,
        |  CAST(CASE doc_id % 5 WHEN 0 THEN 0 WHEN 1 THEN 3 WHEN 2 THEN 300
        |    WHEN 4 THEN 1 END AS INT) AS delay_s,
        |  CASE doc_id % 5
        |    WHEN 0 THEN 'http://h' || (doc_id % 50) || '.example/r/' || doc_id
        |    WHEN 1 THEN 'https://other.example/x' || doc_id
        |    WHEN 4 THEN 'http://h' || (doc_id % 50) || '.example/q/' || doc_id
        |  END AS target,
        |  doc_id % 5 IN (0, 1, 4) AS is_redirect
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val idS = col("doc_id").cast("string")
        val hostS = pmod(col("doc_id"), lit(50)).cast("string")
        val pageUrl = concat(lit("http://h"), hostS, lit(".example/p/"), idS)
        val html = when(pmod(col("doc_id"), lit(5)) === 0,
          concat(lit("<html><head><meta http-equiv=\"refresh\" content=\"0; url=/r/"),
            idS, lit("\"></head><body>a</body></html>")))
          .when(pmod(col("doc_id"), lit(5)) === 1,
            concat(lit("<html><head><meta content=\"3;URL=https://other.example/x"),
              idS, lit("\" http-equiv=\"refresh\"></head><body>b</body></html>")))
          .when(pmod(col("doc_id"), lit(5)) === 2,
            lit("<html><head><meta http-equiv=\"refresh\" content=\"300\"></head><body>c</body></html>"))
          .when(pmod(col("doc_id"), lit(5)) === 3,
            lit("<html><head><title>plain</title></head><body>d</body></html>"))
          .otherwise(
            concat(lit("<html><head><meta http-equiv=\"refresh\" content=\"1; url = '/q/"),
              idS, lit("'\"></head><body>e</body></html>")))
        Tables.documents(s, d)
          .select(col("doc_id"), TextOps.metaRefresh(html, pageUrl).as("_v"))
          .select(col("doc_id"),
            col("_v").getField("has_refresh").as("has_refresh"),
            col("_v").getField("delay_s").as("delay_s"),
            col("_v").getField("target").as("target"),
            (col("_v").getField("has_refresh") &&
              col("_v").getField("delay_s") <= 5 &&
              col("_v").getField("target").isNotNull).as("is_redirect"))
          .orderBy("doc_id")
    },

    // ── FEED DISCOVERY — RSS/Atom are the crawl's change-notification
    //    channel: [[TextOps.feedEntries]] under its pinned semantics.
    //    Every branch is live: RSS with RELATIVE links (resolution
    //    against the feed URL) plus a LINKLESS item (null url — never
    //    laundered into a self-link); Atom with rel-first and
    //    href-first link attribute orders and one relative href. The
    //    oracle replays the entry table arithmetically — titles,
    //    resolved urls, raw published strings. ──
    QueryDef.sql(
      "web_feed_discover",
      """WITH ks AS (SELECT * FROM (VALUES (0),(1),(2),(3)) t(k))
        |SELECT doc_id,
        |  CASE WHEN doc_id % 2 = 0 THEN 'rss' ELSE 'atom' END AS kind,
        |  CAST(k AS INT) AS entry_idx,
        |  'Entry ' || doc_id || ' ' || k AS title,
        |  CASE WHEN doc_id % 2 = 0 AND k = 3 THEN NULL
        |    ELSE 'http://h' || (doc_id % 50) || '.example/a/' || doc_id ||
        |      '/' || k END AS entry_url,
        |  CASE WHEN doc_id % 2 = 0 THEN 'Day ' || (k + 1)
        |    ELSE '2026-08-0' || (k + 1) || 'T00:00:00Z' END AS published
        |FROM documents, ks
        |WHERE k <= CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END
        |ORDER BY doc_id, entry_idx""".stripMargin) {
      (s, d) =>
        val idS = col("doc_id").cast("string")
        val hostS = pmod(col("doc_id"), lit(50)).cast("string")
        val base = concat(lit("http://h"), hostS, lit(".example"))
        val feedUrl = concat(base, lit("/feed/"), idS)
        def rssItem(k: Int) = concat(
          lit("<item><title>Entry "), idS, lit(s" $k</title><link>/a/"),
          idS, lit(s"/$k</link><pubDate>Day ${k + 1}</pubDate></item>"))
        val rssXml = concat(
          lit("<rss version=\"2.0\"><channel><title>C</title>"),
          rssItem(0), rssItem(1), rssItem(2),
          lit("<item><title>Entry "), idS,
          lit(" 3</title><pubDate>Day 4</pubDate></item></channel></rss>"))
        val atomXml = concat(
          lit("<feed xmlns=\"http://www.w3.org/2005/Atom\">"),
          lit("<entry><title>Entry "), idS,
          lit(" 0</title><link rel=\"alternate\" href=\""), base,
          lit("/a/"), idS,
          lit("/0\"/><updated>2026-08-01T00:00:00Z</updated></entry>"),
          lit("<entry><title>Entry "), idS,
          lit(" 1</title><link href=\""), base, lit("/a/"), idS,
          lit("/1\" rel=\"alternate\"/><updated>2026-08-02T00:00:00Z</updated></entry>"),
          lit("<entry><title>Entry "), idS,
          lit(" 2</title><link href=\"/a/"), idS,
          lit("/2\"/><updated>2026-08-03T00:00:00Z</updated></entry></feed>"))
        val xml = when(pmod(col("doc_id"), lit(2)) === 0, rssXml)
          .otherwise(atomXml)
        Tables.documents(s, d)
          .select(col("doc_id"), TextOps.feedKind(xml).as("kind"),
            TextOps.feedEntries(xml, feedUrl).as("_es"))
          .select(col("doc_id"), col("kind"),
            posexplode(col("_es")).as(Seq("entry_idx", "_e")))
          .select(col("doc_id"), col("kind"), col("entry_idx"),
            col("_e").getField("title").as("title"),
            col("_e").getField("url").as("entry_url"),
            col("_e").getField("published").as("published"))
          .orderBy("doc_id", "entry_idx")
    },

    // ── FEED → RECRAWL composition — the announcement channel feeds
    //    the planner: each page's feed declares it at position id%2
    //    among (id%4)+2 entries, [[Recrawl.hintsFromFeedEntries]]
    //    maps entry count to cadence (≥4 hourly, 3 daily, else
    //    weekly) and position to priority (10 − 2·idx), and
    //    [[Recrawl.scheduleWithHints]] blends that with the SAME
    //    observed-change history web_recrawl_schedule pins — feed
    //    parsing, hint derivation and the schedule blend verified as
    //    one chain. Side entries announce pages outside the fetch
    //    history and must drop in the blend's left join. The oracle
    //    replays the whole integer arithmetic. ──
    QueryDef.sql(
      "web_feed_recrawl",
      """WITH h AS (SELECT doc_id,
        |    'http://d' || (doc_id % 50) || '.example.com/p' || doc_id AS url,
        |    unnest(range(6)) AS seq FROM documents),
        |c AS (SELECT doc_id, url, seq * 3600000 AS ts,
        |    CASE WHEN ((seq + 1) * (doc_id % 7 + 2)) % 3 = 0 THEN 1 ELSE 0 END AS ch
        |  FROM h),
        |g AS (SELECT url, min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS n_obs,
        |    CAST(sum(ch) AS BIGINT) AS n_changed,
        |    CAST(max(ts) AS BIGINT) AS last_fetch FROM c GROUP BY url),
        |a AS (SELECT url, doc_id, n_obs, n_changed, last_fetch,
        |    least(86400000, greatest(500,
        |      1000 * n_obs * 2 // (n_changed * 2 + 1))) AS ai,
        |    CASE WHEN (doc_id % 4) + 2 >= 4 THEN 'hourly'
        |      WHEN doc_id % 4 = 1 THEN 'daily' ELSE 'weekly' END AS changefreq,
        |    10 - 2 * (doc_id % 2) AS pri FROM g),
        |b AS (SELECT *, CAST(CASE changefreq WHEN 'hourly' THEN 3600000
        |    WHEN 'daily' THEN 86400000 ELSE 604800000 END AS BIGINT) AS cd
        |  FROM a),
        |w AS (SELECT *, greatest(500, least(86400000, cd // 4)) AS lo FROM b),
        |x AS (SELECT *, greatest(lo,
        |    least(86400000, cd * 4) * 10 // (pri + 5)) AS hi FROM w),
        |f AS (SELECT url, n_obs, n_changed, last_fetch, changefreq,
        |    greatest(lo, least(hi, ai)) AS iv FROM x)
        |SELECT url, n_obs, n_changed, changefreq,
        |  CAST(iv AS BIGINT) AS interval_ms,
        |  CAST(last_fetch + iv AS BIGINT) AS next_due_ms
        |FROM f ORDER BY url""".stripMargin) {
      (s, d) =>
        val pageUrl = concat(lit("http://d"), pmod(col("doc_id"), lit(50)),
          lit(".example.com/p"), col("doc_id"))
        val history = Tables.documents(s, d)
          .select(col("doc_id"), pageUrl.as("url"))
          .withColumn("seq", explode(sequence(lit(0), lit(5))))
          .select(col("url"), (col("seq") * 3600000L).as("ts"),
            (((col("seq") + 1) * (pmod(col("doc_id"), lit(7)) + 2)) % 3 === 0)
              .as("changed"))
        // one RSS feed per page: the page at position id%2 among
        // (id%4)+2 entries, the rest side pages outside the history
        val nEntries = (pmod(col("doc_id"), lit(4)) + 2).cast("int")
        val pageIdx = pmod(col("doc_id"), lit(2)).cast("int")
        val feedUrl = concat(lit("http://d"), pmod(col("doc_id"), lit(50)),
          lit(".example.com/feed"), col("doc_id"), lit(".xml"))
        val items = transform(sequence(lit(0), nEntries - 1), k =>
          concat(lit("<item><title>E</title><link>"),
            when(k === pageIdx, pageUrl)
              .otherwise(concat(lit("/side/"), col("doc_id"), lit("/"), k)),
            lit("</link><pubDate>D"), k, lit("</pubDate></item>")))
        val xml = concat(lit("<rss version=\"2.0\"><channel>"),
          array_join(items, ""), lit("</channel></rss>"))
        val entries = Tables.documents(s, d)
          .select(col("doc_id"), TextOps.feedEntries(xml, feedUrl).as("_es"))
          .select(col("doc_id"), size(col("_es")).as("n_entries"),
            posexplode(col("_es")).as(Seq("entry_idx", "_e")))
          .select(col("_e").getField("url").as("url"),
            col("entry_idx"), col("n_entries"))
        val hints = graft.operators.Recrawl.hintsFromFeedEntries(
          entries, "url", "entry_idx", "n_entries")
        graft.operators.Recrawl
          .scheduleWithHints(history, "url", "ts", "changed", hints)
          .select(col("url"), col("n_obs"), col("n_changed"),
            col("changefreq"), col("interval_ms"), col("next_due_ms"))
          .orderBy("url")
    },

    // ── IDN HOSTS — internationalized hostnames reach a crawl in TWO
    //    spellings (raw UTF-8 in hrefs, pre-encoded xn-- in hrefs and
    //    DNS) and both must converge on ONE ledger key:
    //    [[TextOps.hostIdnEncode]] (from-scratch RFC 3492 Punycode,
    //    codegen'd). The fixture alternates spellings by id%2 while
    //    the label cycles by id%6 — the oracle's ACE constant depends
    //    ONLY on id%6, which IS the convergence proof; the constants
    //    themselves are independently pinned in IdnSpec against the
    //    RFC 3492 §7.1 vectors and a second implementation.
    //    `display_host` routes back through [[TextOps.hostIdnDecode]]
    //    (decode is live in-query, not just in the spec). ──
    QueryDef.sql(
      "web_idn_hosts",
      """SELECT doc_id,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'xn--bcher-kva.example'
        |    WHEN 1 THEN 'xn--mnchen-3ya.example'
        |    WHEN 2 THEN 'xn--r8jz45g.example'
        |    WHEN 3 THEN 'xn--80akhbyknj4f.example'
        |    WHEN 4 THEN 'xn--and-6ma2c.example'
        |    ELSE 'plain.example' END AS ace_host,
        |  CASE doc_id % 6
        |    WHEN 0 THEN 'bücher.example'
        |    WHEN 1 THEN 'münchen.example'
        |    WHEN 2 THEN '例え.example'
        |    WHEN 3 THEN 'испытание.example'
        |    WHEN 4 THEN 'ñandú.example'
        |    ELSE 'plain.example' END AS display_host
        |FROM documents ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val k = pmod(col("doc_id"), lit(6))
        val raw = when(k === 0, lit("bücher")).when(k === 1, lit("münchen"))
          .when(k === 2, lit("例え")).when(k === 3, lit("испытание"))
          .when(k === 4, lit("ñandú")).otherwise(lit("plain"))
        val pre = when(k === 0, lit("xn--bcher-kva"))
          .when(k === 1, lit("xn--mnchen-3ya"))
          .when(k === 2, lit("xn--r8jz45g"))
          .when(k === 3, lit("xn--80akhbyknj4f"))
          .when(k === 4, lit("xn--and-6ma2c")).otherwise(lit("plain"))
        val spelled = concat(
          when(pmod(col("doc_id"), lit(2)) === 1, pre).otherwise(raw),
          lit(".example"))
        val ace = TextOps.hostIdnEncode(spelled)
        Tables.documents(s, d)
          .select(col("doc_id"), ace.as("ace_host"),
            TextOps.hostIdnDecode(ace).as("display_host"))
          .orderBy("doc_id")
    },

    // ── DISCOVERY-CHANNEL FUNNEL — the four ways a URL enters a real
    //    frontier, extracted by four different operators and unified
    //    with provenance: page links ([[TextOps.htmlLinks]] resolved
    //    against the page), sitemap `<loc>` entries
    //    ([[TextOps.xmlTagValues]]), feed announcements
    //    ([[TextOps.feedEntries]]), and instant meta-refresh targets
    //    ([[TextOps.metaRefresh]], delay-gated). The fixture makes
    //    overlaps REAL: every page's `/l/…` target is announced by
    //    both links and its feed, `/shared` by both links and the
    //    host sitemap — the `multi` row counts URLs two or more
    //    channels agree on (the corroboration signal frontier
    //    prioritizers use). The oracle replays candidates and
    //    distinct counts arithmetically. ──
    QueryDef.sql(
      "web_discovery_channels",
      """WITH d AS (SELECT doc_id, doc_id % 50 AS h FROM documents),
        |cand AS (
        |  SELECT 'links' AS channel,
        |    'http://h' || h || '.example/l/' || doc_id || '/1' AS url FROM d
        |  UNION ALL SELECT 'links', 'http://h' || h || '.example/shared' FROM d
        |  UNION ALL SELECT 'sitemap',
        |    'http://h' || h || '.example/s/' || doc_id || '/1' FROM d
        |  UNION ALL SELECT 'sitemap', 'http://h' || h || '.example/shared' FROM d
        |  UNION ALL SELECT 'feed',
        |    'http://h' || h || '.example/l/' || doc_id || '/1' FROM d
        |  UNION ALL SELECT 'feed',
        |    'http://h' || h || '.example/f/' || doc_id || '/1' FROM d
        |  UNION ALL SELECT 'refresh',
        |    'http://h' || h || '.example/next/' || doc_id FROM d
        |    WHERE doc_id % 2 = 0),
        |per AS (SELECT channel, CAST(count(*) AS BIGINT) AS n_candidates,
        |    CAST(count(DISTINCT url) AS BIGINT) AS n_unique
        |  FROM cand GROUP BY 1),
        |multi AS (SELECT CAST(count(*) AS BIGINT) AS n FROM (
        |  SELECT url FROM cand GROUP BY url
        |  HAVING count(DISTINCT channel) >= 2))
        |SELECT channel, n_candidates, n_unique FROM per
        |UNION ALL SELECT 'multi', n, n FROM multi
        |ORDER BY channel""".stripMargin) {
      (s, d) =>
        val idS = col("doc_id").cast("string")
        val hS = pmod(col("doc_id"), lit(50)).cast("string")
        val base = concat(lit("http://h"), hS, lit(".example"))
        val pageUrl = concat(base, lit("/p/"), idS)
        val html = concat(
          lit("<html><head>"),
          when(pmod(col("doc_id"), lit(2)) === 0,
            concat(lit("<meta http-equiv=\"refresh\" content=\"0; url=/next/"),
              idS, lit("\">"))).otherwise(lit("")),
          lit("</head><body><a href=\"/l/"), idS,
          lit("/1\">x</a><a href=\"/shared\">s</a></body></html>"))
        val sitemapXml = concat(
          lit("<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">"),
          lit("<url><loc>"), base, lit("/s/"), idS, lit("/1</loc></url>"),
          lit("<url><loc>"), base, lit("/shared</loc></url></urlset>"))
        val feedXml = concat(
          lit("<rss version=\"2.0\"><channel>"),
          lit("<item><title>a</title><link>"), base, lit("/l/"), idS,
          lit("/1</link><pubDate>D1</pubDate></item>"),
          lit("<item><title>b</title><link>"), base, lit("/f/"), idS,
          lit("/1</link><pubDate>D2</pubDate></item></channel></rss>"))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), pageUrl.as("_pu"), html.as("_html"),
            sitemapXml.as("_sm"), feedXml.as("_feed"))
        val linksArm = docs.select(explode(TextOps.htmlLinks(col("_html"))).as("_t"),
          col("_pu"))
          .select(lit("links").as("channel"),
            TextOps.urlResolve(col("_pu"), col("_t")).as("url"))
        val sitemapArm = docs
          .select(explode(TextOps.xmlTagValues(col("_sm"), "loc")).as("url"))
          .select(lit("sitemap").as("channel"), col("url"))
        val feedArm = docs
          .select(explode(TextOps.feedEntries(col("_feed"), col("_pu"))).as("_e"))
          .select(lit("feed").as("channel"), col("_e").getField("url").as("url"))
        val refreshArm = docs
          .select(TextOps.metaRefresh(col("_html"), col("_pu")).as("_r"))
          .filter(col("_r").getField("has_refresh") &&
            col("_r").getField("delay_s") <= 5 &&
            col("_r").getField("target").isNotNull)
          .select(lit("refresh").as("channel"),
            col("_r").getField("target").as("url"))
        val cand = linksArm.unionByName(sitemapArm)
          .unionByName(feedArm).unionByName(refreshArm)
        val per = cand.groupBy("channel")
          .agg(count(lit(1)).cast("long").as("n_candidates"),
            countDistinct(col("url")).cast("long").as("n_unique"))
        val multi = cand.groupBy("url")
          .agg(countDistinct(col("channel")).as("_nc"))
          .filter(col("_nc") >= 2)
          .agg(count(lit(1)).cast("long").as("n"))
          .select(lit("multi").as("channel"), col("n").as("n_candidates"),
            col("n").as("n_unique"))
        per.unionByName(multi).orderBy("channel")
    },

    // ── HTTP 206 RANGE REASSEMBLY — resumed downloads arrive as byte
    //    slices that may be shuffled, torn, or double-fetched:
    //    [[graft.operators.HttpRanges.reassemble]] sorts parts and
    //    walks them once (`aggregate` fold) tracking the expected
    //    offset. Every branch is live: v0 complete in 8-byte chunks;
    //    v1 complete at a DIFFERENT chunking (5) — chunk geometry is
    //    data, not schema; v2 drops chunk 1 (gap — body must stay
    //    null, never a plausible-length corruption); v3 double-fetches
    //    chunk 1 (overlap). The oracle replays chunk-count arithmetic
    //    and the md5 of the seed text for the complete classes. ──
    QueryDef.sql(
      "web_range_reassembly",
      """WITH t AS (SELECT doc_id,
        |  'Range doc ' || doc_id || ' payload body' AS t FROM documents)
        |SELECT doc_id,
        |  CASE doc_id % 4 WHEN 2 THEN 'gap' WHEN 3 THEN 'overlap'
        |    ELSE 'complete' END AS verdict,
        |  CAST(CASE doc_id % 4
        |    WHEN 1 THEN ceil(length(t) / 5.0)
        |    WHEN 2 THEN ceil(length(t) / 8.0) - 1
        |    WHEN 3 THEN ceil(length(t) / 8.0) + 1
        |    ELSE ceil(length(t) / 8.0) END AS INT) AS n_parts,
        |  CAST(length(t) AS BIGINT) AS total_len,
        |  CASE WHEN doc_id % 4 <= 1 THEN md5(t) END AS body_md5
        |FROM t ORDER BY doc_id""".stripMargin) {
      (s, d) =>
        val idS = col("doc_id").cast("string")
        val t = concat(lit("Range doc "), idS, lit(" payload body"))
        val v = pmod(col("doc_id"), lit(4))
        val c = when(v === 1, lit(5)).otherwise(lit(8))
        val len = length(t)
        val lastK = floor((len - lit(1)).cast("double") / c).cast("int")
        val ks0 = sequence(lit(0), lastK)
        val ks = when(v === 2, array_remove(ks0, 1))
          .when(v === 3, concat(ks0, array(lit(1))))
          .otherwise(ks0)
        val parts = Tables.documents(s, d)
          .select(col("doc_id"), t.as("_t"), c.as("_c"), len.as("_len"),
            explode(ks).as("k"))
          .select(col("doc_id"),
            (col("k") * col("_c")).cast("long").as("part_start"),
            least(col("_len"), (col("k") + 1) * col("_c")).cast("long").as("part_end"),
            col("_len").cast("long").as("total_len"),
            col("_t").substr(col("k") * col("_c") + 1, col("_c")).as("part"))
        graft.operators.HttpRanges.reassembleDigest(
          parts, "doc_id", "part_start", "part_end", "total_len", "part")
          .select(col("doc_id"), col("verdict"), col("n_parts"),
            col("total_len"), col("body_md5"))
          .orderBy("doc_id")
    },
  )
}
