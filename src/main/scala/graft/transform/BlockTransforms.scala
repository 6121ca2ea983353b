package graft.transform

import graft.codec.{BlockCodec, CanonicalJson, Codecs, TxnId}
import graft.codec.CanonicalJson._
import graft.model._
import scala.collection.immutable.TreeMap

/** The pure accounting core (SURVEY.md §2.B): block → row transforms.
  * All functions here are deterministic Scala with no Spark dependency; the
  * Spark binding is a `Dataset[String].flatMap` over per-round block JSON
  * (see graft.ingest.BlockIngest) — the reference's channel/COPY plumbing
  * (write_txn.go:161-189) disappears because Spark handles the pipelining.
  */
object BlockTransforms {

  // ── B3: creatable-ID resolver (write_txn.go:25-63) ─────────────────
  //
  // appl → ApplicationID, falling back to ApplyData.ApplicationID, then to
  // TxnCounter - len(payset) + intra + 1 for pre-v30 root txns (block
  // context absent ⇒ inner txn ⇒ no counter fallback);
  // acfg → ConfigAsset with the same fallbacks; axfer → XferAsset;
  // afrz → FreezeAsset; else 0.
  def transactionAssetId(stxn: SignedTxnWithAD, intra: Int, block: Option[Block]): Long = {
    val t = stxn.txn
    t.txType match {
      case "appl" =>
        var id = t.applicationId
        if (id == 0) id = stxn.applyData.applicationId
        if (id == 0) id = block match {
          case Some(b) => b.txnCounter - b.payset.length + intra + 1
          case None => throw new IllegalArgumentException(
            s"transactionAssetId(): missing ApplicationID for inner appl txn")
        }
        id
      case "acfg" =>
        var id = t.configAsset
        if (id == 0) id = stxn.applyData.configAsset
        if (id == 0) id = block match {
          case Some(b) => b.txnCounter - b.payset.length + intra + 1
          case None => throw new IllegalArgumentException(
            s"transactionAssetId(): missing ConfigAsset for inner acfg txn")
        }
        id
      case "axfer" => t.xferAsset
      case "afrz" => t.freezeAsset
      case _ => 0L
    }
  }

  // ── Extra document ({aca?, root-intra?, root-txid?}; idb.go:126-143).
  //    root-intra is serialized as a STRING (OptionalUint.MarshalText —
  //    asserted literally in the reference's golden tests). ──────────────
  private def extraJson(assetCloseAmount: BigInt, rootIntra: Option[Int], rootTxid: Option[String]): String = {
    var m = TreeMap.empty[String, JVal]
    if (assetCloseAmount != 0) m = m.updated("aca", JInt(assetCloseAmount))
    rootIntra.foreach(i => m = m.updated("root-intra", JStr(i.toString)))
    rootTxid.foreach(t => m = m.updated("root-txid", JStr(t)))
    CanonicalJson.render(JObj(m))
  }

  // ── B1+B2: inner-txn flattener + txn row builder (write_txn.go:68-157).
  //    Preorder DFS; contiguous intra across roots and inners; inner rows
  //    get NULL txid, pruned nested inners, and the root backlink. ───────
  def flattenBlock(block: Block): Vector[TxnFlatRow] = {
    val out = Vector.newBuilder[TxnFlatRow]
    var intra = 0

    def yieldInner(stxn: SignedTxnWithAD, rootIntra: Int, rootTxid: String): Unit = {
      stxn.applyData.evalDelta.innerTxns.foreach { itxn =>
        val typeenum = Codecs.TypeEnums.getOrElse(itxn.txn.txType,
          throw new IllegalArgumentException(s"unknown txn type '${itxn.txn.txType}'"))
        val assetid = transactionAssetId(itxn, 0, None)
        out += TxnFlatRow(
          round = block.round, intra = intra, typeenum = typeenum, asset = assetid,
          txid = None, // inner transactions do not have a txid
          txn = CanonicalJson.render(BlockCodec.signedTxnToJson(itxn, pruneInner = true)),
          extra = extraJson(itxn.applyData.assetClosingAmount, Some(rootIntra), Some(rootTxid)))
        intra += 1
        yieldInner(itxn, rootIntra, rootTxid) // recurse last: preorder
      }
    }

    block.payset.foreach { stxn =>
      // Genesis info is injected before hashing so the txid is genesis-aware
      // (util.DecodeSignedTxn, write_txn.go:120).
      val txnWithGenesis =
        if (stxn.txn.genesisId.isEmpty && stxn.txn.genesisHash.isEmpty)
          stxn.txn.copy(genesisId = block.genesisId, genesisHash = block.genesisHash)
        else stxn.txn
      val typeenum = Codecs.TypeEnums.getOrElse(stxn.txn.txType,
        throw new IllegalArgumentException(s"unknown txn type '${stxn.txn.txType}'"))
      val rootIntra = intra
      val assetid = transactionAssetId(stxn, rootIntra, Some(block))
      val txid = TxnId.compute(txnWithGenesis)
      out += TxnFlatRow(
        round = block.round, intra = rootIntra, typeenum = typeenum, asset = assetid,
        txid = Some(txid),
        txn = CanonicalJson.render(
          BlockCodec.signedTxnToJson(stxn.copy(txn = txnWithGenesis))),
        extra = extraJson(stxn.applyData.assetClosingAmount, None, None))
      intra += 1
      yieldInner(stxn, rootIntra, txid)
    }
    out.result()
  }

  // ── B4: participation extractor (write_txn_participation.go:14-110).
  //    Sender always; role addresses by type; app Accounts[]; the root row
  //    recurses into inner txns, inner rows take direct addresses only. ──
  def participationAddresses(t: Txn): Vector[String] = {
    val b = Vector.newBuilder[String]
    b += t.sender
    t.txType match {
      case "pay" =>
        b += t.receiver
        if (t.closeRemainderTo.nonEmpty) b += t.closeRemainderTo
      case "axfer" =>
        if (t.assetSender.nonEmpty) b += t.assetSender
        b += t.assetReceiver
        if (t.assetCloseTo.nonEmpty) b += t.assetCloseTo
      case "afrz" =>
        b += t.freezeAccount
      case "appl" =>
        t.accounts.foreach(b += _)
      case _ =>
    }
    b.result().filter(_.nonEmpty).distinct
  }

  private def participationRecursive(stxn: SignedTxnWithAD): Vector[String] = {
    val own = participationAddresses(stxn.txn)
    val inner = stxn.applyData.evalDelta.innerTxns.flatMap(participationRecursive)
    (own ++ inner).distinct
  }

  def participationRows(block: Block): Vector[ParticipationRow] = {
    val out = Vector.newBuilder[ParticipationRow]
    var intra = 0

    def innerRows(stxn: SignedTxnWithAD): Unit = {
      stxn.applyData.evalDelta.innerTxns.foreach { itxn =>
        // Inner rows take DIRECT addresses only (write_txn_participation.go:100).
        participationAddresses(itxn.txn).foreach(a => out += ParticipationRow(a, block.round, intra))
        intra += 1
        innerRows(itxn)
      }
    }

    block.payset.foreach { stxn =>
      val rootIntra = intra
      // The root row participates for every address in its whole subtree.
      participationRecursive(stxn).foreach(a => out += ParticipationRow(a, block.round, rootIntra))
      intra += 1
      innerRows(stxn)
    }
    out.result()
  }

  // ── B5: sigtype classifier + per-sender delta (sig_type.go:44-63,
  //    writer.go:163-179). Rekey or stateproof ⇒ keytype delta present
  //    with NULL value; keyed by sender, last in payset order wins. ──────
  def sigType(stxn: SignedTxnWithAD): String = {
    if (stxn.sig.nonEmpty) "sig"
    else if (stxn.msigPresent) "msig"
    else stxn.lsig match {
      case Some(l) if l.delegatedSig => "sig"
      case Some(l) if l.delegatedMsig => "msig"
      case Some(_) => "lsig"
      case None => throw new IllegalArgumentException("unsigned transaction")
    }
  }

  /** sender → Some(sigtype) | None (⇒ keytype set to NULL). */
  def sigTypeDeltas(payset: Vector[SignedTxnWithAD]): Map[String, Option[String]] = {
    var res = Map.empty[String, Option[String]]
    payset.foreach { stxn =>
      val delta =
        if (stxn.txn.rekeyTo.isEmpty && stxn.txn.txType != "stpf") Some(sigType(stxn))
        else None
      res = res.updated(stxn.txn.sender, delta)
    }
    res
  }

  // ── B8: block-header row (writer.go:144-149) ───────────────────────
  def headerRow(block: Block): BlockHeaderRow = BlockHeaderRow(
    round = block.round,
    realtime = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(block.timestamp)),
    rewardslevel = block.rewardsLevel,
    header = BlockCodec.headerJson(block))

  // ── B7: special accounts → metastate `accounts` (writer.go:151-154) ──
  def specialAccountsJson(block: Block): String =
    CanonicalJson.render(JObj.of(
      "FeeSink" -> JStr(block.feeSink),
      "RewardsPool" -> JStr(block.rewardsPool)))

  // ── F3: recursive inner count (idb.go:46-53) — the ascending-token
  //    subtree skip. ──────────────────────────────────────────────────
  def countInner(stxn: SignedTxnWithAD): Int =
    stxn.applyData.evalDelta.innerTxns.map(i => 1 + countInner(i)).sum

  // ── B9: box-key splitter → upsert/delete routing (writer.go:302-321) ──
  final case class BoxMod(app: Long, name: Array[Byte], value: Option[Array[Byte]])
  def boxMods(block: Block): Vector[BoxMod] =
    block.delta.kvMods.map { kv =>
      val (app, name) = Codecs.boxKeySplit(kv.key)
      BoxMod(app, name, kv.value)
    }
}
