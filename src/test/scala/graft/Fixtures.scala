package graft

import graft.codec.Codecs
import graft.model._

/** Deterministic synthetic fixtures — the port of the reference's
  * MakePaymentTxn / MakeAssetConfigTxn / MakeAppCallWithInnerTxn helpers
  * (writer_test.go:24,144,193-204): hand-built blocks that exercise every
  * transform and merge path.
  */
object Fixtures {

  /** Deterministic 32-byte "public key" → encoded address. */
  def addr(i: Int): String = Codecs.addressEncode(Array.fill(32)(i.toByte))

  val A = addr(1)
  val B = addr(2)
  val C = addr(3)
  val D = addr(4)
  val FeeSink = addr(250)
  val RewardsPool = addr(251)

  val GenesisId = "graft-test-v1"
  val GenesisHash: Array[Byte] = Codecs.sha512_256("graft-genesis".getBytes("UTF-8"))

  def pay(from: String, to: String, amt: Long, note: String = "",
          closeTo: String = "", sig: Boolean = true): SignedTxnWithAD =
    SignedTxnWithAD(
      txn = Txn(txType = "pay", sender = from, receiver = to, amount = BigInt(amt),
        fee = 1000, firstValid = 1, lastValid = 1000,
        note = if (note.isEmpty) Array.emptyByteArray else note.getBytes("UTF-8"),
        closeRemainderTo = closeTo),
      sig = if (sig) Array.fill(64)(7.toByte) else Array.emptyByteArray)

  def axfer(from: String, to: String, asset: Long, amt: BigInt,
            closeTo: String = "", closeAmt: BigInt = BigInt(0)): SignedTxnWithAD =
    SignedTxnWithAD(
      txn = Txn(txType = "axfer", sender = from, assetReceiver = to,
        xferAsset = asset, assetAmount = amt, assetCloseTo = closeTo, fee = 1000),
      sig = Array.fill(64)(8.toByte),
      applyData = ApplyData(assetClosingAmount = closeAmt))

  def acfg(from: String, configAsset: Long, createdId: Long = 0): SignedTxnWithAD =
    SignedTxnWithAD(
      txn = Txn(txType = "acfg", sender = from, configAsset = configAsset, fee = 1000,
        assetParams = Some(AssetParams(total = BigInt("18446744073709551615"),
          unitName = "GRF", assetName = "Graft Coin", manager = from))),
      sig = Array.fill(64)(9.toByte),
      applyData = ApplyData(configAsset = createdId))

  def afrz(from: String, target: String, asset: Long, frozen: Boolean): SignedTxnWithAD =
    SignedTxnWithAD(
      txn = Txn(txType = "afrz", sender = from, freezeAccount = target,
        freezeAsset = asset, assetFrozen = frozen, fee = 1000),
      sig = Array.fill(64)(10.toByte))

  /** App call with a pay inner and a nested app call inner that itself has
    * a pay inner — three levels, the shape of the reference's
    * MakeAppCallWithInnerTxn golden test (writer_test.go:1386-1449). */
  def applWithInners(from: String, appId: Long): SignedTxnWithAD = {
    val innerPay = SignedTxnWithAD(
      txn = Txn(txType = "pay", sender = C, receiver = D, amount = BigInt(111)))
    val nestedAppl = SignedTxnWithAD(
      txn = Txn(txType = "appl", sender = C, applicationId = appId + 1,
        accounts = Vector(B)),
      applyData = ApplyData(evalDelta = EvalDelta(innerTxns = Vector(
        SignedTxnWithAD(txn = Txn(txType = "pay", sender = D, receiver = A, amount = BigInt(222)))))))
    SignedTxnWithAD(
      txn = Txn(txType = "appl", sender = from, applicationId = appId,
        accounts = Vector(C), fee = 1000),
      sig = Array.fill(64)(11.toByte),
      applyData = ApplyData(evalDelta = EvalDelta(innerTxns = Vector(innerPay, nestedAppl))))
  }

  def block(round: Long, payset: Vector[SignedTxnWithAD],
            delta: LedgerDelta = LedgerDelta(), txnCounter: Long = 0): Block =
    Block(
      round = round, timestamp = 1700000000L + round * 4, rewardsLevel = round * 10,
      genesisId = GenesisId, genesisHash = GenesisHash,
      feeSink = FeeSink, rewardsPool = RewardsPool,
      txnCounter = if (txnCounter == 0) 1000 + round else txnCounter,
      payset = payset, delta = delta)

  def acctUpsert(a: String, algos: Long): AccountDelta =
    AccountDelta(addr = a, microAlgos = algos, rewardsBase = 1, rewardedMicroAlgos = 2,
      accountDataJson = s"""{"owner":"$a"}""")

  def acctDelete(a: String): AccountDelta = AccountDelta(addr = a, microAlgos = 0)
}
