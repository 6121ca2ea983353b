package graft.codec

import java.nio.charset.StandardCharsets

/** Deterministic RTF builders for the [[RtfCodec]] oracle and fuzz
  * suites — the [[PdfFixtures]] doctrine: every byte is a pure
  * function of the id, and the TEXT the extractor must recover is
  * seed arithmetic the DuckDB oracle replays blind to the RTF
  * wrapping (groups, control words, hex/unicode escapes), so the
  * wrapping cancels exactly iff the tokenizer is right.
  *
  * Variant v = (id / 3) % 3 (coprime with the mixed funnels' id%N
  * routers so every variant stays live inside each router class):
  *   0: font table + info sidecar, one paragraph through a
  *      formatting word chain → "Rtf body <id> alpha"
  *   1: TWO paragraphs; the second carries `\tab`, a `\'e9` hex
  *      escape and a backslash-u 8364 unicode-with-fallback (the '?'
  *      fallback must be skipped) → "Para one <id>\nTab\tcafé plus
  *      €done";
  *      NO info block (absent-metadata branch)
  *   2: starred destination noise, a word SPLIT across a formatting
  *      group, an `\emdash` symbol word, info present →
  *      "Split<id> joined—end"
  */
object RtfFixtures {

  private def bytes(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)

  def docRtf(id: Long): Array[Byte] = ((id / 3) % 3) match {
    case 0 => bytes(
      "{\\rtf1\\ansi\\deff0{\\fonttbl{\\f0\\fswiss Helvetica;}}" +
        s"{\\info{\\title Rtf Props $id}{\\author Writer ${id % 7}}}" +
        s"\\f0\\fs24 Rtf body $id alpha\\par}")
    case 1 => bytes(
      s"{\\rtf1\\ansi\\uc1 Para one $id\\par " +
        "Tab\\tab caf\\'e9 plus \\u8364 ?done}")
    case _ => bytes(
      "{\\rtf1\\ansi{\\*\\ftnsep noise never seen;}" +
        s"{\\b Spl}it$id joined\\emdash end\\par" +
        s"{\\info{\\title Split Rtf $id}{\\author Runs Writer}}}")
  }

  /** The text [[docRtf]] must extract (paragraphs joined with '\n') —
    * the seed arithmetic the oracle rebuilds in SQL. */
  def docText(id: Long): String = ((id / 3) % 3) match {
    case 0 => s"Rtf body $id alpha"
    case 1 => s"Para one $id\nTab\tcafé plus €done"
    case _ => s"Split$id joined—end"
  }

  /** Unterminated-group stub: PK of the RTF world — opens like a real
    * document, never closes. Must classify corrupt, never ok-empty. */
  def corruptRtf(id: Long): Array[Byte] =
    bytes(s"{\\rtf1\\ansi{\\b torn $id download")
}
