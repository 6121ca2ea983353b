package graft.codec

import graft.model._
import CanonicalJson._
import scala.collection.immutable.TreeMap

/** Canonical JSON ser/de for the ingest domain. One block = one JSON
  * document (the per-round file the streaming source reads). Field names
  * follow the reference's short canonical-encoding names where they exist
  * (encoding/types.go) so the stored `txn` documents look like the
  * reference's jsonb: type/snd/rcv/amt/fee/note(b64)/grp etc. Omit-empty:
  * zero/empty fields are simply not emitted, which is what makes the
  * encoding canonical (encoding.go:19-42).
  */
object BlockCodec {

  // ── Txn ─────────────────────────────────────────────────────────────

  def txnToJson(t: Txn): JObj = {
    var m = TreeMap.empty[String, JVal]
    def put(k: String, v: JVal): Unit = m = m.updated(k, v)
    put("type", JStr(t.txType))
    if (t.sender.nonEmpty) put("snd", JStr(t.sender))
    if (t.fee != 0) put("fee", JInt(t.fee))
    if (t.firstValid != 0) put("fv", JInt(t.firstValid))
    if (t.lastValid != 0) put("lv", JInt(t.lastValid))
    if (t.note.nonEmpty) put("note", jBytes(t.note))
    if (t.rekeyTo.nonEmpty) put("rekey", JStr(t.rekeyTo))
    if (t.genesisId.nonEmpty) put("gen", JStr(t.genesisId))
    if (t.genesisHash.nonEmpty) put("gh", jBytes(t.genesisHash))
    if (t.receiver.nonEmpty) put("rcv", JStr(t.receiver))
    if (t.amount != 0) put("amt", JInt(t.amount))
    if (t.closeRemainderTo.nonEmpty) put("close", JStr(t.closeRemainderTo))
    if (t.xferAsset != 0) put("xaid", JInt(t.xferAsset))
    if (t.assetAmount != 0) put("aamt", JInt(t.assetAmount))
    if (t.assetSender.nonEmpty) put("asnd", JStr(t.assetSender))
    if (t.assetReceiver.nonEmpty) put("arcv", JStr(t.assetReceiver))
    if (t.assetCloseTo.nonEmpty) put("aclose", JStr(t.assetCloseTo))
    if (t.configAsset != 0) put("caid", JInt(t.configAsset))
    t.assetParams.foreach(p => put("apar", assetParamsToJson(p)))
    if (t.freezeAccount.nonEmpty) put("fadd", JStr(t.freezeAccount))
    if (t.freezeAsset != 0) put("faid", JInt(t.freezeAsset))
    if (t.assetFrozen) put("afrz", JBool(true))
    if (t.applicationId != 0) put("apid", JInt(t.applicationId))
    if (t.accounts.nonEmpty) put("apat", JArr(t.accounts.map(JStr).toVector))
    if (t.appArgs.nonEmpty) put("apaa", JArr(t.appArgs.map(jBytes(_): JVal).toVector))
    JObj(m)
  }

  def txnFromJson(j: JVal): Txn = Txn(
    txType = j.get("type").map(_.str).getOrElse(""),
    sender = j.get("snd").map(_.str).getOrElse(""),
    fee = j.get("fee").map(_.long).getOrElse(0L),
    firstValid = j.get("fv").map(_.long).getOrElse(0L),
    lastValid = j.get("lv").map(_.long).getOrElse(0L),
    note = j.get("note").map(_.bytes).getOrElse(Array.emptyByteArray),
    rekeyTo = j.get("rekey").map(_.str).getOrElse(""),
    genesisId = j.get("gen").map(_.str).getOrElse(""),
    genesisHash = j.get("gh").map(_.bytes).getOrElse(Array.emptyByteArray),
    receiver = j.get("rcv").map(_.str).getOrElse(""),
    amount = j.get("amt").map(_.bigInt).getOrElse(BigInt(0)),
    closeRemainderTo = j.get("close").map(_.str).getOrElse(""),
    xferAsset = j.get("xaid").map(_.long).getOrElse(0L),
    assetAmount = j.get("aamt").map(_.bigInt).getOrElse(BigInt(0)),
    assetSender = j.get("asnd").map(_.str).getOrElse(""),
    assetReceiver = j.get("arcv").map(_.str).getOrElse(""),
    assetCloseTo = j.get("aclose").map(_.str).getOrElse(""),
    configAsset = j.get("caid").map(_.long).getOrElse(0L),
    assetParams = j.get("apar").map(assetParamsFromJson),
    freezeAccount = j.get("fadd").map(_.str).getOrElse(""),
    freezeAsset = j.get("faid").map(_.long).getOrElse(0L),
    assetFrozen = j.get("afrz").exists(_.bool),
    applicationId = j.get("apid").map(_.long).getOrElse(0L),
    accounts = j.get("apat").map(_.arr.map(_.str)).getOrElse(Vector.empty),
    appArgs = j.get("apaa").map(_.arr.map(_.bytes)).getOrElse(Vector.empty))

  def assetParamsToJson(p: AssetParams): JObj = {
    var m = TreeMap.empty[String, JVal]
    if (p.total != 0) m = m.updated("t", JInt(p.total))
    if (p.decimals != 0) m = m.updated("dc", JInt(p.decimals))
    if (p.unitName.nonEmpty) m = m.updated("un", JStr(p.unitName))
    if (p.assetName.nonEmpty) m = m.updated("an", JStr(p.assetName))
    if (p.url.nonEmpty) m = m.updated("au", JStr(p.url))
    if (p.manager.nonEmpty) m = m.updated("m", JStr(p.manager))
    JObj(m)
  }

  def assetParamsFromJson(j: JVal): AssetParams = AssetParams(
    total = j.get("t").map(_.bigInt).getOrElse(BigInt(0)),
    decimals = j.get("dc").map(_.long.toInt).getOrElse(0),
    unitName = j.get("un").map(_.str).getOrElse(""),
    assetName = j.get("an").map(_.str).getOrElse(""),
    url = j.get("au").map(_.str).getOrElse(""),
    manager = j.get("m").map(_.str).getOrElse(""))

  // ── SignedTxnWithAD (recursive via EvalDelta.InnerTxns) ────────────

  /** `pruneInner = true` removes nested inner txns — the on-disk shape of
    * an inner-txn row (write_txn.go:88-89): reconstruction requires
    * fetching the root row. */
  def signedTxnToJson(s: SignedTxnWithAD, pruneInner: Boolean = false): JObj = {
    var m = TreeMap.empty[String, JVal]
    m = m.updated("txn", txnToJson(s.txn))
    if (s.sig.nonEmpty) m = m.updated("sig", jBytes(s.sig))
    if (s.msigPresent) m = m.updated("msig", JObj.of("v" -> JInt(1)))
    s.lsig.foreach { l =>
      var lm = TreeMap.empty[String, JVal]
      if (l.logic.nonEmpty) lm = lm.updated("l", jBytes(l.logic))
      if (l.delegatedSig) lm = lm.updated("sig", JBool(true))
      if (l.delegatedMsig) lm = lm.updated("msig", JBool(true))
      m = m.updated("lsig", JObj(lm))
    }
    val ad = applyDataToJson(s.applyData, pruneInner)
    if (ad.fields.nonEmpty) m = m.updated("dt", ad)
    JObj(m)
  }

  def signedTxnFromJson(j: JVal): SignedTxnWithAD = SignedTxnWithAD(
    txn = txnFromJson(j.get("txn").getOrElse(JObj.of())),
    sig = j.get("sig").map(_.bytes).getOrElse(Array.emptyByteArray),
    msigPresent = j.get("msig").isDefined,
    lsig = j.get("lsig").map { l =>
      LogicSig(
        logic = l.get("l").map(_.bytes).getOrElse(Array.emptyByteArray),
        delegatedSig = l.get("sig").exists(_.bool),
        delegatedMsig = l.get("msig").exists(_.bool))
    },
    applyData = j.get("dt").map(applyDataFromJson).getOrElse(ApplyData()))

  def applyDataToJson(ad: ApplyData, pruneInner: Boolean): JObj = {
    var m = TreeMap.empty[String, JVal]
    if (ad.closeAmount != 0) m = m.updated("ca", JInt(ad.closeAmount))
    if (ad.assetClosingAmount != 0) m = m.updated("aca", JInt(ad.assetClosingAmount))
    if (ad.applicationId != 0) m = m.updated("apid", JInt(ad.applicationId))
    if (ad.configAsset != 0) m = m.updated("caid", JInt(ad.configAsset))
    val ed = ad.evalDelta
    var em = TreeMap.empty[String, JVal]
    if (!pruneInner && ed.innerTxns.nonEmpty)
      em = em.updated("itx", JArr(ed.innerTxns.map(signedTxnToJson(_): JVal).toVector))
    if (ed.globalDelta.nonEmpty)
      em = em.updated("gd", JObj(TreeMap.from(ed.globalDelta.view.mapValues(JStr(_): JVal))))
    if (ed.logs.nonEmpty) em = em.updated("lg", JArr(ed.logs.map(JStr(_): JVal).toVector))
    if (em.nonEmpty) m = m.updated("dt", JObj(em))
    JObj(m)
  }

  def applyDataFromJson(j: JVal): ApplyData = ApplyData(
    closeAmount = j.get("ca").map(_.bigInt).getOrElse(BigInt(0)),
    assetClosingAmount = j.get("aca").map(_.bigInt).getOrElse(BigInt(0)),
    applicationId = j.get("apid").map(_.long).getOrElse(0L),
    configAsset = j.get("caid").map(_.long).getOrElse(0L),
    evalDelta = j.get("dt").map { ed =>
      EvalDelta(
        innerTxns = ed.get("itx").map(_.arr.map(signedTxnFromJson)).getOrElse(Vector.empty),
        globalDelta = ed.get("gd").map(_.asObj.map { case (k, v) => k -> v.str }.toMap).getOrElse(Map.empty),
        logs = ed.get("lg").map(_.arr.map(_.str)).getOrElse(Vector.empty))
    }.getOrElse(EvalDelta()))

  // ── Ledger delta ───────────────────────────────────────────────────

  def deltaToJson(d: LedgerDelta): JObj = JObj.of(
    "accts" -> JArr(d.accounts.map { a =>
      JObj.of(
        "addr" -> JStr(a.addr), "algo" -> JInt(a.microAlgos),
        "rb" -> JInt(a.rewardsBase), "rma" -> JInt(a.rewardedMicroAlgos),
        "data" -> JStr(a.accountDataJson)): JVal
    }.toVector),
    "assets" -> JArr(d.assetResources.map { r =>
      var m = TreeMap.empty[String, JVal]
      m = m.updated("addr", JStr(r.addr)).updated("aidx", JInt(r.aidx))
      if (r.paramsDeleted) m = m.updated("pdel", JBool(true))
      r.paramsJson.foreach(p => m = m.updated("params", JStr(p)))
      if (r.holdingDeleted) m = m.updated("hdel", JBool(true))
      r.holding.foreach(h => m = m.updated("holding",
        JObj.of("amt" -> JInt(h.amount), "f" -> JBool(h.frozen))))
      JObj(m): JVal
    }.toVector),
    "apps" -> JArr(d.appResources.map { r =>
      var m = TreeMap.empty[String, JVal]
      m = m.updated("addr", JStr(r.addr)).updated("aidx", JInt(r.aidx))
      if (r.paramsDeleted) m = m.updated("pdel", JBool(true))
      r.paramsJson.foreach(p => m = m.updated("params", JStr(p)))
      if (r.stateDeleted) m = m.updated("sdel", JBool(true))
      r.localStateJson.foreach(p => m = m.updated("ls", JStr(p)))
      JObj(m): JVal
    }.toVector),
    "kv" -> JArr(d.kvMods.map { kv =>
      var m = TreeMap.empty[String, JVal]
      m = m.updated("k", jBytes(kv.key))
      kv.value.foreach(v => m = m.updated("v", jBytes(v)))
      JObj(m): JVal
    }.toVector))

  def deltaFromJson(j: JVal): LedgerDelta = LedgerDelta(
    accounts = j.get("accts").map(_.arr.map { a =>
      AccountDelta(
        addr = a.get("addr").get.str, microAlgos = a.get("algo").get.long,
        rewardsBase = a.get("rb").map(_.long).getOrElse(0L),
        rewardedMicroAlgos = a.get("rma").map(_.long).getOrElse(0L),
        accountDataJson = a.get("data").map(_.str).getOrElse("{}"))
    }).getOrElse(Vector.empty),
    assetResources = j.get("assets").map(_.arr.map { r =>
      AssetResourceRecord(
        addr = r.get("addr").get.str, aidx = r.get("aidx").get.long,
        paramsDeleted = r.get("pdel").exists(_.bool),
        paramsJson = r.get("params").map(_.str),
        holdingDeleted = r.get("hdel").exists(_.bool),
        holding = r.get("holding").map(h =>
          AssetHolding(h.get("amt").get.bigInt, h.get("f").exists(_.bool))))
    }).getOrElse(Vector.empty),
    appResources = j.get("apps").map(_.arr.map { r =>
      AppResourceRecord(
        addr = r.get("addr").get.str, aidx = r.get("aidx").get.long,
        paramsDeleted = r.get("pdel").exists(_.bool),
        paramsJson = r.get("params").map(_.str),
        stateDeleted = r.get("sdel").exists(_.bool),
        localStateJson = r.get("ls").map(_.str))
    }).getOrElse(Vector.empty),
    kvMods = j.get("kv").map(_.arr.map { kv =>
      KvMod(kv.get("k").get.bytes, kv.get("v").map(_.bytes))
    }).getOrElse(Vector.empty))

  // ── Block ──────────────────────────────────────────────────────────

  def blockToJson(b: Block): String = {
    var m = TreeMap.empty[String, JVal]
    m = m.updated("rnd", JInt(b.round))
      .updated("ts", JInt(b.timestamp))
      .updated("rl", JInt(b.rewardsLevel))
      .updated("tc", JInt(b.txnCounter))
      .updated("txns", JArr(b.payset.map(signedTxnToJson(_): JVal).toVector))
      .updated("delta", deltaToJson(b.delta))
    if (b.genesisId.nonEmpty) m = m.updated("gen", JStr(b.genesisId))
    if (b.genesisHash.nonEmpty) m = m.updated("gh", jBytes(b.genesisHash))
    if (b.feeSink.nonEmpty) m = m.updated("fees", JStr(b.feeSink))
    if (b.rewardsPool.nonEmpty) m = m.updated("rwd", JStr(b.rewardsPool))
    CanonicalJson.render(JObj(m))
  }

  def blockFromJson(s: String): Block = {
    val j = CanonicalJson.parse(s)
    Block(
      round = j.get("rnd").get.long,
      timestamp = j.get("ts").get.long,
      rewardsLevel = j.get("rl").map(_.long).getOrElse(0L),
      genesisId = j.get("gen").map(_.str).getOrElse(""),
      genesisHash = j.get("gh").map(_.bytes).getOrElse(Array.emptyByteArray),
      feeSink = j.get("fees").map(_.str).getOrElse(""),
      rewardsPool = j.get("rwd").map(_.str).getOrElse(""),
      txnCounter = j.get("tc").map(_.long).getOrElse(0L),
      payset = j.get("txns").map(_.arr.map(signedTxnFromJson)).getOrElse(Vector.empty),
      delta = j.get("delta").map(deltaFromJson).getOrElse(LedgerDelta()))
  }

  /** Canonical block-header document (block_header.header jsonb;
    * writer.go:144-149 stores the full header). */
  def headerJson(b: Block): String = {
    var m = TreeMap.empty[String, JVal]
    m = m.updated("rnd", JInt(b.round)).updated("ts", JInt(b.timestamp))
      .updated("rl", JInt(b.rewardsLevel)).updated("tc", JInt(b.txnCounter))
    if (b.genesisId.nonEmpty) m = m.updated("gen", JStr(b.genesisId))
    if (b.genesisHash.nonEmpty) m = m.updated("gh", jBytes(b.genesisHash))
    if (b.feeSink.nonEmpty) m = m.updated("fees", JStr(b.feeSink))
    if (b.rewardsPool.nonEmpty) m = m.updated("rwd", JStr(b.rewardsPool))
    CanonicalJson.render(JObj(m))
  }
}
