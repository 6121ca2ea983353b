package graft.model

/** Ingest-side domain model (SURVEY.md §1.1): a validated block = header
  * fields + payset (transaction tree) + ledger state delta. Plain Scala case
  * classes — recursion (inner transactions) is fine here; it is flattened
  * before anything reaches a Spark schema (§1.3: Spark StructType cannot be
  * recursive, so inner txns are stored pre-flattened, as the reference does
  * on disk via write_txn.go:68-110).
  *
  * Addresses travel as their 58-char encoded string form; byte fields as
  * Array[Byte]. Quantities that are uint64 in the reference use BigInt
  * (§7.4 "uint64 throughout").
  */

final case class AssetParams(
    total: BigInt = BigInt(0),
    decimals: Int = 0,
    unitName: String = "",
    assetName: String = "",
    url: String = "",
    manager: String = "")

final case class Txn(
    txType: String, // pay|keyreg|acfg|axfer|afrz|appl|stpf
    sender: String,
    fee: Long = 0,
    firstValid: Long = 0,
    lastValid: Long = 0,
    note: Array[Byte] = Array.emptyByteArray,
    rekeyTo: String = "",
    genesisId: String = "",
    genesisHash: Array[Byte] = Array.emptyByteArray,
    // pay
    receiver: String = "",
    amount: BigInt = BigInt(0),
    closeRemainderTo: String = "",
    // axfer
    xferAsset: Long = 0,
    assetAmount: BigInt = BigInt(0),
    assetSender: String = "",
    assetReceiver: String = "",
    assetCloseTo: String = "",
    // acfg
    configAsset: Long = 0,
    assetParams: Option[AssetParams] = None,
    // afrz
    freezeAccount: String = "",
    freezeAsset: Long = 0,
    assetFrozen: Boolean = false,
    // appl
    applicationId: Long = 0,
    accounts: Vector[String] = Vector.empty,
    appArgs: Vector[Array[Byte]] = Vector.empty)

/** Delegation-aware logic sig: a delegated lsig carries the delegator's
  * sig/msig, which decides the account keytype (sig_type.go:44-63). */
final case class LogicSig(
    logic: Array[Byte] = Array.emptyByteArray,
    delegatedSig: Boolean = false,
    delegatedMsig: Boolean = false)

final case class EvalDelta(
    innerTxns: Vector[SignedTxnWithAD] = Vector.empty,
    globalDelta: Map[String, String] = Map.empty,
    logs: Vector[String] = Vector.empty)

final case class ApplyData(
    closeAmount: BigInt = BigInt(0),
    assetClosingAmount: BigInt = BigInt(0),
    applicationId: Long = 0,
    configAsset: Long = 0,
    evalDelta: EvalDelta = EvalDelta())

final case class SignedTxnWithAD(
    txn: Txn,
    sig: Array[Byte] = Array.emptyByteArray,
    msigPresent: Boolean = false,
    lsig: Option[LogicSig] = None,
    applyData: ApplyData = ApplyData())

// ── Ledger state delta (what accounting maintains; §2.C inputs) ────────

/** microAlgos == 0 ⇒ account closed (writer.go:197-204). */
final case class AccountDelta(
    addr: String,
    microAlgos: Long,
    rewardsBase: Long = 0,
    rewardedMicroAlgos: Long = 0,
    accountDataJson: String = "{}")

final case class AssetHolding(amount: BigInt, frozen: Boolean)

final case class AssetResourceRecord(
    addr: String,
    aidx: Long,
    paramsDeleted: Boolean = false,
    paramsJson: Option[String] = None,
    holdingDeleted: Boolean = false,
    holding: Option[AssetHolding] = None)

final case class AppResourceRecord(
    addr: String,
    aidx: Long,
    paramsDeleted: Boolean = false,
    paramsJson: Option[String] = None,
    stateDeleted: Boolean = false,
    localStateJson: Option[String] = None)

/** value = None ⇒ box delete (writer.go:313-318). */
final case class KvMod(key: Array[Byte], value: Option[Array[Byte]])

final case class LedgerDelta(
    accounts: Vector[AccountDelta] = Vector.empty,
    assetResources: Vector[AssetResourceRecord] = Vector.empty,
    appResources: Vector[AppResourceRecord] = Vector.empty,
    kvMods: Vector[KvMod] = Vector.empty)

final case class Block(
    round: Long,
    timestamp: Long, // unix seconds; block_header.realtime = UTC(ts)
    rewardsLevel: Long = 0,
    genesisId: String = "",
    genesisHash: Array[Byte] = Array.emptyByteArray,
    feeSink: String = "",
    rewardsPool: String = "",
    txnCounter: Long = 0,
    payset: Vector[SignedTxnWithAD] = Vector.empty,
    delta: LedgerDelta = LedgerDelta())

// ── Flattened row shapes (what Spark sees; §1.4 schemas) ───────────────

final case class TxnFlatRow(
    round: Long,
    intra: Int,
    typeenum: Int,
    asset: Long,
    txid: Option[String], // NULL for inner txns
    txn: String, // canonical JSON, nested inners pruned on inner rows
    extra: String) // canonical JSON {aca?, root-intra?, root-txid?}

final case class ParticipationRow(addr: String, round: Long, intra: Int)

final case class BlockHeaderRow(
    round: Long,
    realtime: java.sql.Timestamp,
    rewardslevel: Long,
    header: String)
