package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import graft.codec.CanonicalJson._
import scala.util.Random

class CodecSpec extends AnyFunSuite {

  // Seeded-random property loops (scalacheck's scalatest bridge is not on
  // the offline classpath; determinism is a feature here anyway).
  private def rnd = new Random(42)

  // ── base32 / address (G3) ───────────────────────────────────────────

  test("base32 round-trips arbitrary bytes") {
    val r = rnd
    for (n <- 0 to 100) {
      val arr = Array.fill(n)(r.nextInt().toByte)
      assert(Codecs.base32Decode(Codecs.base32NoPad(arr)).sameElements(arr))
    }
  }

  test("address encode/decode round-trips and is 58 chars") {
    val r = rnd
    for (_ <- 1 to 200) {
      val pk = Array.fill(32)(r.nextInt().toByte)
      val addr = Codecs.addressEncode(pk)
      assert(addr.length == 58)
      assert(Codecs.addressDecode(addr).sameElements(pk))
    }
  }

  test("address checksum rejects corruption") {
    val addr = Codecs.addressEncode(Array.fill(32)(1.toByte))
    val bad = (if (addr.head == 'A') 'B' else 'A') + addr.tail
    intercept[IllegalArgumentException](Codecs.addressDecode(bad))
  }

  // ── page token (G9; idb.go:56-100 little-endian layout) ────────────

  test("page token round-trips (round, intra)") {
    val r = rnd
    for (_ <- 1 to 200) {
      val round = r.nextLong().abs
      val intra = r.nextInt(Int.MaxValue).toLong * 2 % 0xffffffffL
      assert(Codecs.pageTokenDecode(Codecs.pageTokenEncode(round, intra)) == ((round, intra)))
    }
  }

  test("page token byte layout is little-endian uint64 ‖ uint32") {
    val tok = Codecs.pageTokenEncode(1, 2)
    val bytes = java.util.Base64.getUrlDecoder.decode(tok)
    assert(bytes.length == 12)
    assert(bytes(0) == 1 && bytes.slice(1, 8).forall(_ == 0))
    assert(bytes(8) == 2 && bytes.slice(9, 12).forall(_ == 0))
  }

  test("page token rejects wrong length") {
    intercept[IllegalArgumentException](Codecs.pageTokenDecode(
      java.util.Base64.getUrlEncoder.encodeToString(Array[Byte](1, 2, 3))))
  }

  // ── box keys (G8) ──────────────────────────────────────────────────

  test("box key round-trips") {
    val r = rnd
    for (n <- 0 to 60) {
      val app = r.nextLong().abs
      val name = Array.fill(n)(r.nextInt().toByte)
      val (a2, n2) = Codecs.boxKeySplit(Codecs.boxKeyMake(app, name))
      assert(a2 == app && n2.sameElements(name))
    }
  }

  test("box key requires bx: prefix") {
    intercept[IllegalArgumentException](Codecs.boxKeySplit("nope:1234567890".getBytes))
  }

  // ── canonical JSON (G1) ────────────────────────────────────────────

  test("canonical JSON sorts keys and is parse∘render idempotent") {
    val v = JObj.of("zeta" -> JInt(1), "alpha" -> JStr("x"),
      "mid" -> JArr(Vector(JBool(true), JNull, JInt(BigInt("18446744073709551615")))))
    val rendered = CanonicalJson.render(v)
    assert(rendered == """{"alpha":"x","mid":[true,null,18446744073709551615],"zeta":1}""")
    assert(CanonicalJson.render(CanonicalJson.parse(rendered)) == rendered)
  }

  test("canonical JSON re-sorts unsorted input on parse") {
    assert(CanonicalJson.render(CanonicalJson.parse("""{"b":2,"a":1}""")) == """{"a":1,"b":2}""")
  }

  test("canonical JSON escapes control characters") {
    val raw = "a\nb" + '\u0001' + "c"
    val s = CanonicalJson.render(JStr(raw))
    assert(s == "\"a\\nb\\u0001c\"")
    assert(CanonicalJson.parse(s) == JStr(raw))
  }

  test("uint64 max survives the JSON round-trip without truncation") {
    val max = BigInt("18446744073709551615")
    assert(CanonicalJson.parse(CanonicalJson.render(JInt(max))).bigInt == max)
  }

  test("canonical JSON fuzz: random value trees survive render∘parse∘render") {
    val r = rnd
    def randVal(depth: Int): JVal = {
      val choice = if (depth > 3) r.nextInt(4) else r.nextInt(6)
      choice match {
        case 0 => JNull
        case 1 => JBool(r.nextBoolean())
        case 2 =>
          if (r.nextBoolean()) JInt(BigInt(r.nextLong()).abs + (BigInt(1) << 62))
          else JInt(BigInt(r.nextInt()))
        case 3 => JStr(r.alphanumeric.take(r.nextInt(12)).mkString +
          (if (r.nextInt(4) == 0) "\"\\\n\t√" else ""))
        case 4 => JArr(Vector.fill(r.nextInt(4))(randVal(depth + 1)))
        case 5 => JObj(scala.collection.immutable.TreeMap(
          Seq.fill(r.nextInt(4))(r.alphanumeric.take(5).mkString -> randVal(depth + 1)): _*))
      }
    }
    for (_ <- 1 to 300) {
      val v = randVal(0)
      val rendered = CanonicalJson.render(v)
      val reparsed = CanonicalJson.parse(rendered)
      assert(CanonicalJson.render(reparsed) == rendered)
      assert(reparsed == v)
    }
  }

  // ── canonical msgpack (G4 substrate) ───────────────────────────────

  test("msgpack is deterministic and sorted") {
    import CanonicalMsgpack._
    val a = MMap.of("b" -> MUInt(2), "a" -> MUInt(1))
    val b = MMap.of("a" -> MUInt(1), "b" -> MUInt(2))
    assert(encode(a).sameElements(encode(b)))
  }

  test("msgpack integer encodings use shortest form") {
    import CanonicalMsgpack._
    assert(encode(MUInt(5)).sameElements(Array(0x05.toByte)))
    assert(encode(MUInt(200)).sameElements(Array(0xcc.toByte, 200.toByte)))
    assert(encode(MUInt(0x1234)).sameElements(Array(0xcd.toByte, 0x12.toByte, 0x34.toByte)))
    val u64max = encode(MUInt(BigInt("18446744073709551615")))
    assert(u64max.length == 9 && u64max(0) == 0xcf.toByte && u64max.tail.forall(_ == 0xff.toByte))
  }

  // ── txid (G4) ──────────────────────────────────────────────────────

  test("txid is deterministic, 52 chars, and genesis-aware") {
    val t = graft.model.Txn(txType = "pay", sender = graft.Fixtures.A,
      receiver = graft.Fixtures.B, amount = BigInt(42))
    val id1 = TxnId.compute(t)
    val id2 = TxnId.compute(t)
    assert(id1 == id2)
    assert(id1.length == 52) // base32(32 bytes) no padding
    val withGenesis = t.copy(genesisId = "net-v1",
      genesisHash = Codecs.sha512_256("gh".getBytes))
    assert(TxnId.compute(withGenesis) != id1)
  }

  // ── printable (G5) ─────────────────────────────────────────────────

  test("printableUtf8OrEmpty") {
    assert(Codecs.printableUtf8OrEmpty("Graft Coin") == "Graft Coin")
    assert(Codecs.printableUtf8OrEmpty("bad" + '\u0007' + "name") == "")
    assert(Codecs.printableUtf8OrEmpty("uniéode") == "uniéode")
  }

  test("printableUtf8OrEmpty matches Go IsPrint classes, not just not-a-control") {
    // Format chars (Cf) are NOT printable in Go: ZWSP, bidi override.
    assert(Codecs.printableUtf8OrEmpty("a\u200Bb") == "")
    assert(Codecs.printableUtf8OrEmpty("a\u202Eb") == "")
    // Separators beyond ASCII space (Zl, Zs ideographic space): not printable.
    assert(Codecs.printableUtf8OrEmpty("a\u2028b") == "")
    assert(Codecs.printableUtf8OrEmpty("a\u3000b") == "")
    // ASCII space is the one separator Go accepts.
    assert(Codecs.printableUtf8OrEmpty("a b") == "a b")
    // L/M/N/P/S all pass: letters, digits, punctuation, symbols.
    assert(Codecs.printableUtf8OrEmpty("\u00E9 42 !? $\u20AC \u2211") == "\u00E9 42 !? $\u20AC \u2211")
    // Astral-plane code points (surrogate pairs) pass; an unpaired
    // surrogate is invalid UTF-8 and empties out.
    assert(Codecs.printableUtf8OrEmpty("ok \uD83D\uDE00") == "ok \uD83D\uDE00")
    assert(Codecs.printableUtf8OrEmpty("bad \uD83D.") == "")
  }

  test("truncated JSON fails with a positioned parse error, not an index crash") {
    for (bad <- Seq("{\"a\": 1", "{\"a\": \"un", "[1, 2", "{\"a\": \"x\\", "\"\\u00", "{\"a\"")) {
      val e = intercept[IllegalArgumentException](CanonicalJson.parse(bad))
      assert(e.getMessage != null && e.getMessage.nonEmpty, s"input: $bad")
    }
  }

  // ── block codec round-trip ─────────────────────────────────────────

  test("block JSON round-trips the full domain incl. recursive inners") {
    import graft.Fixtures._
    val b = block(5, Vector(pay(A, B, 1234, note = "hello"), applWithInners(A, 77)),
      delta = graft.model.LedgerDelta(
        accounts = Vector(acctUpsert(A, 999), acctDelete(B)),
        assetResources = Vector(graft.model.AssetResourceRecord(
          addr = A, aidx = 3, paramsJson = Some("""{"an":"X"}"""),
          holding = Some(graft.model.AssetHolding(BigInt("18446744073709551615"), frozen = true)))),
        appResources = Vector(graft.model.AppResourceRecord(
          addr = B, aidx = 9, paramsDeleted = true, stateDeleted = true)),
        kvMods = Vector(graft.model.KvMod(Codecs.boxKeyMake(9, "box1".getBytes), Some("v".getBytes)))))
    val json = BlockCodec.blockToJson(b)
    val back = BlockCodec.blockFromJson(json)
    assert(back.round == 5)
    assert(back.payset.length == 2)
    assert(back.payset(1).applyData.evalDelta.innerTxns.length == 2)
    assert(back.payset(1).applyData.evalDelta.innerTxns(1).applyData.evalDelta.innerTxns.length == 1)
    assert(back.delta.accounts.map(_.addr) == Vector(A, B))
    assert(back.delta.assetResources.head.holding.get.amount == BigInt("18446744073709551615"))
    // canonical: encode∘decode∘encode is byte-stable
    assert(BlockCodec.blockToJson(back) == json)
  }
}
