package graft.codec

import graft.model.Txn
import CanonicalMsgpack._
import scala.collection.immutable.TreeMap

/** Transaction id: base32(SHA-512/256("TX" ++ canonical-msgpack(txn))) —
  * the same construction the reference delegates to
  * crypto.TransactionIDString (write_txn.go:134): domain-separation prefix,
  * canonical msgpack of the txn fields (sorted keys, omit-empty), SHA-512/256,
  * base32 without padding. Genesis-aware: gen/gh are part of the hashed
  * struct, so the id changes with genesis info (util.DecodeSignedTxn injects
  * it before hashing — write_txn.go:120).
  */
object TxnId {

  private val Prefix = "TX".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  def msgpackFields(t: Txn): MMap = {
    var m = TreeMap.empty[String, MVal]
    def put(k: String, v: MVal): Unit = m = m.updated(k, v)
    put("type", MStr(t.txType))
    if (t.sender.nonEmpty) put("snd", MBytes(Codecs.addressDecode(t.sender)))
    if (t.fee != 0) put("fee", MUInt(t.fee))
    if (t.firstValid != 0) put("fv", MUInt(t.firstValid))
    if (t.lastValid != 0) put("lv", MUInt(t.lastValid))
    if (t.note.nonEmpty) put("note", MBytes(t.note))
    if (t.rekeyTo.nonEmpty) put("rekey", MBytes(Codecs.addressDecode(t.rekeyTo)))
    if (t.genesisId.nonEmpty) put("gen", MStr(t.genesisId))
    if (t.genesisHash.nonEmpty) put("gh", MBytes(t.genesisHash))
    if (t.receiver.nonEmpty) put("rcv", MBytes(Codecs.addressDecode(t.receiver)))
    if (t.amount != 0) put("amt", MUInt(t.amount))
    if (t.closeRemainderTo.nonEmpty) put("close", MBytes(Codecs.addressDecode(t.closeRemainderTo)))
    if (t.xferAsset != 0) put("xaid", MUInt(t.xferAsset))
    if (t.assetAmount != 0) put("aamt", MUInt(t.assetAmount))
    if (t.assetSender.nonEmpty) put("asnd", MBytes(Codecs.addressDecode(t.assetSender)))
    if (t.assetReceiver.nonEmpty) put("arcv", MBytes(Codecs.addressDecode(t.assetReceiver)))
    if (t.assetCloseTo.nonEmpty) put("aclose", MBytes(Codecs.addressDecode(t.assetCloseTo)))
    if (t.configAsset != 0) put("caid", MUInt(t.configAsset))
    if (t.freezeAccount.nonEmpty) put("fadd", MBytes(Codecs.addressDecode(t.freezeAccount)))
    if (t.freezeAsset != 0) put("faid", MUInt(t.freezeAsset))
    if (t.assetFrozen) put("afrz", MBool(true))
    if (t.applicationId != 0) put("apid", MUInt(t.applicationId))
    if (t.accounts.nonEmpty)
      put("apat", MArr(t.accounts.map(a => MBytes(Codecs.addressDecode(a)): MVal).toVector))
    if (t.appArgs.nonEmpty)
      put("apaa", MArr(t.appArgs.map(MBytes(_): MVal).toVector))
    MMap(m)
  }

  def compute(t: Txn): String = {
    val encoded = CanonicalMsgpack.encode(msgpackFields(t))
    Codecs.base32NoPad(Codecs.sha512_256(Prefix ++ encoded))
  }
}
