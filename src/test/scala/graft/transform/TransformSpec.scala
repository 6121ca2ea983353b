package graft.transform

import org.scalatest.funsuite.AnyFunSuite
import graft.Fixtures._
import graft.codec.CanonicalJson
import graft.model._

/** Transcribes the reference's inner-txn flattening golden test family
  * (writer_test.go:1386-1523): intra assignment, typeenum, asset-id
  * resolution, NULL txid for inners, root-intra/root-txid backlink JSON,
  * pruned nested inners, participation rows.
  */
class TransformSpec extends AnyFunSuite {

  test("flatten assigns preorder contiguous intra across roots and inners") {
    // payset: [pay, appl(innerPay, nestedAppl(innerPay2))]
    val b = block(7, Vector(pay(A, B, 100), applWithInners(B, 50)))
    val rows = BlockTransforms.flattenBlock(b)
    assert(rows.map(_.intra) == Vector(0, 1, 2, 3, 4))
    assert(rows.map(_.round).forall(_ == 7))
    // root txids present, inner txids NULL (write_txn.go:93 "inner
    // transactions do not have a txid")
    assert(rows(0).txid.isDefined && rows(1).txid.isDefined)
    assert(rows(2).txid.isEmpty && rows(3).txid.isEmpty && rows(4).txid.isEmpty)
    // typeenums: pay=1, appl=6, pay, appl, pay
    assert(rows.map(_.typeenum) == Vector(1, 6, 1, 6, 1))
  }

  test("inner rows carry the root backlink as strings; roots carry none") {
    val b = block(7, Vector(pay(A, B, 100), applWithInners(B, 50)))
    val rows = BlockTransforms.flattenBlock(b)
    val rootTxid = rows(1).txid.get
    // golden shape pinned by writer_test.go:1430:
    // {"root-intra": "1", "root-txid": "..."}
    assert(rows(2).extra == s"""{"root-intra":"1","root-txid":"$rootTxid"}""")
    assert(rows(3).extra == s"""{"root-intra":"1","root-txid":"$rootTxid"}""")
    assert(rows(4).extra == s"""{"root-intra":"1","root-txid":"$rootTxid"}""")
    assert(rows(0).extra == "{}")
    assert(rows(1).extra == "{}")
  }

  test("inner rows prune their nested inners; root keeps the whole subtree") {
    val b = block(7, Vector(applWithInners(B, 50)))
    val rows = BlockTransforms.flattenBlock(b)
    val rootDoc = CanonicalJson.parse(rows(0).txn)
    val nestedApplRow = CanonicalJson.parse(rows(2).txn) // the inner appl
    import CanonicalJson._
    // root keeps dt.dt.itx (inner txns)
    assert(rootDoc.get("dt").flatMap(_.get("dt")).flatMap(_.get("itx")).isDefined)
    // the inner appl row must NOT contain its own nested inner list
    assert(nestedApplRow.get("dt").flatMap(_.get("dt")).flatMap(_.get("itx")).isEmpty)
  }

  test("asset-id resolution: axfer/afrz/acfg/appl incl. counter fallback") {
    val created = acfg(A, configAsset = 0) // created asset: counter fallback
    val b = block(9, Vector(
      axfer(A, B, asset = 33, amt = BigInt(5)),
      afrz(A, B, asset = 44, frozen = true),
      created,
      applWithInners(B, 50)),
      txnCounter = 2000)
    val rows = BlockTransforms.flattenBlock(b)
    assert(rows(0).asset == 33)
    assert(rows(1).asset == 44)
    // TxnCounter - len(payset) + intra + 1 = 2000 - 4 + 2 + 1 (write_txn.go:40)
    assert(rows(2).asset == 1999)
    assert(rows(3).asset == 50)
  }

  test("asset close amount lands in extra.aca") {
    val b = block(9, Vector(axfer(A, B, asset = 3, amt = BigInt(5),
      closeTo = C, closeAmt = BigInt("18446744073709551615"))))
    val rows = BlockTransforms.flattenBlock(b)
    assert(rows(0).extra == """{"aca":18446744073709551615}""")
  }

  test("participation: roles per type, dedup, root recursion, inner direct-only") {
    val b = block(7, Vector(pay(A, B, 100, closeTo = C), applWithInners(B, 50)))
    val rows = BlockTransforms.participationRows(b)
    val byIntra = rows.groupBy(_.intra).view.mapValues(_.map(_.addr).toSet).toMap
    // pay row: sender + receiver + closeTo
    assert(byIntra(0) == Set(A, B, C))
    // appl root row: sender B, accounts [C], plus ALL inner participants
    // (C,D from inner pay; C,B from nested appl; D,A from its inner pay)
    assert(byIntra(1) == Set(A, B, C, D))
    // inner pay row (intra 2): direct only — C,D
    assert(byIntra(2) == Set(C, D))
    // nested appl (intra 3): sender C + accounts [B]
    assert(byIntra(3) == Set(C, B))
    // its inner pay (intra 4): D,A
    assert(byIntra(4) == Set(D, A))
  }

  test("participation addresses dedup within a txn") {
    val selfPay = pay(A, A, 10, closeTo = A)
    assert(BlockTransforms.participationAddresses(selfPay.txn) == Vector(A))
  }

  test("sigtype classification incl. delegated lsig") {
    assert(BlockTransforms.sigType(pay(A, B, 1)) == "sig")
    assert(BlockTransforms.sigType(SignedTxnWithAD(
      txn = Txn(txType = "pay", sender = A), msigPresent = true)) == "msig")
    assert(BlockTransforms.sigType(SignedTxnWithAD(
      txn = Txn(txType = "pay", sender = A),
      lsig = Some(LogicSig(logic = Array(1))))) == "lsig")
    assert(BlockTransforms.sigType(SignedTxnWithAD(
      txn = Txn(txType = "pay", sender = A),
      lsig = Some(LogicSig(logic = Array(1), delegatedSig = true)))) == "sig")
    assert(BlockTransforms.sigType(SignedTxnWithAD(
      txn = Txn(txType = "pay", sender = A),
      lsig = Some(LogicSig(logic = Array(1), delegatedMsig = true)))) == "msig")
  }

  test("sigtype deltas: last sender wins; rekey/stateproof yield NULL delta") {
    val rekeyed = SignedTxnWithAD(
      txn = Txn(txType = "pay", sender = B, receiver = A, rekeyTo = C),
      sig = Array.fill(64)(1.toByte))
    val deltas = BlockTransforms.sigTypeDeltas(Vector(
      pay(A, B, 1), // A → sig
      SignedTxnWithAD(txn = Txn(txType = "pay", sender = A), msigPresent = true), // A → msig (last wins)
      rekeyed)) // B → present, NULL value
    assert(deltas(A) == Some("msig"))
    assert(deltas(B) == None)
  }

  test("countInner counts the whole subtree (idb.go:46-53)") {
    assert(BlockTransforms.countInner(pay(A, B, 1)) == 0)
    assert(BlockTransforms.countInner(applWithInners(A, 5)) == 3)
  }

  test("header row: unix ts → UTC timestamp, canonical header json") {
    val b = block(3, Vector.empty)
    val h = BlockTransforms.headerRow(b)
    assert(h.round == 3)
    assert(h.realtime.toInstant.getEpochSecond == b.timestamp)
    assert(h.rewardslevel == 30)
    val parsed = CanonicalJson.parse(h.header)
    import CanonicalJson._
    assert(parsed.get("rnd").get.long == 3)
    assert(parsed.get("fees").get.str == FeeSink)
  }

  test("box mods split keys and route delete vs upsert") {
    import graft.codec.Codecs
    val b = block(3, Vector.empty, delta = LedgerDelta(kvMods = Vector(
      KvMod(Codecs.boxKeyMake(42, "alpha".getBytes), Some("v1".getBytes)),
      KvMod(Codecs.boxKeyMake(42, "beta".getBytes), None))))
    val mods = BlockTransforms.boxMods(b)
    assert(mods(0).app == 42 && new String(mods(0).name) == "alpha" && mods(0).value.isDefined)
    assert(mods(1).app == 42 && new String(mods(1).name) == "beta" && mods(1).value.isEmpty)
  }
}
