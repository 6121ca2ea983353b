package graft.transform

import graft.model._

/** Ledger-delta → per-table delta rows (the inputs to graft.state
  * .StateMerge), mirroring writeAccount / writeAssetResource /
  * writeAppResource / writeBoxMods (writer.go:181-321).
  *
  * Delete deltas carry the zeroed/nulled payload the reference's delete
  * statements write (balances 0, document column JSON "null"), so the merge
  * applies payload uniformly.
  *
  * Every row carries `seq` = its position in the block's delta vector: the
  * reference executes its statements in that order, so when one block holds
  * two statements for the same key the LAST one must win the merge — seq is
  * the tie-break that makes the round-ordered reduce deterministic.
  */
object DeltaTransforms {

  private val JsonNull = Some("null")

  /** writeAccount (writer.go:181-250): MicroAlgos == 0 ⇒ delete; keytype
    * delta applies only when the sender had a sigtype delta this block
    * (rekey/stateproof ⇒ present with NULL value). */
  def accountDeltaRows(block: Block): Vector[AccountDeltaRow] = {
    val sigDeltas = BlockTransforms.sigTypeDeltas(block.payset)
    block.delta.accounts.zipWithIndex.map { case (a, i) =>
      val kt = sigDeltas.get(a.addr)
      if (a.microAlgos == 0)
        AccountDeltaRow(
          addr = a.addr, round = block.round, isDelete = true,
          microalgos = 0, rewardsbase = 0, rewards_total = 0,
          ktPresent = kt.isDefined, keytype = kt.flatten,
          account_data = JsonNull, seq = i)
      else
        AccountDeltaRow(
          addr = a.addr, round = block.round, isDelete = false,
          microalgos = a.microAlgos, rewardsbase = a.rewardsBase,
          rewards_total = a.rewardedMicroAlgos,
          ktPresent = kt.isDefined, keytype = kt.flatten,
          account_data = Some(a.accountDataJson), seq = i)
    }
  }

  /** writeAssetResource (writer.go:252-272): params side → asset table,
    * holding side → account_asset table; each side independently
    * upsert/delete/skip. */
  def assetDeltaRows(block: Block): Vector[AssetDeltaRow] =
    block.delta.assetResources.zipWithIndex.flatMap { case (r, i) =>
      if (r.paramsDeleted)
        Some(AssetDeltaRow(r.aidx, block.round, isDelete = true, r.addr, JsonNull, seq = i))
      else
        r.paramsJson.map(p =>
          AssetDeltaRow(r.aidx, block.round, isDelete = false, r.addr, Some(p), seq = i))
    }

  def accountAssetDeltaRows(block: Block): Vector[AccountAssetDeltaRow] =
    block.delta.assetResources.zipWithIndex.flatMap { case (r, i) =>
      if (r.holdingDeleted)
        Some(AccountAssetDeltaRow(r.addr, r.aidx, block.round, isDelete = true,
          java.math.BigDecimal.ZERO, frozen = false, seq = i))
      else
        r.holding.map(h => AccountAssetDeltaRow(r.addr, r.aidx, block.round, isDelete = false,
          new java.math.BigDecimal(h.amount.bigInteger), h.frozen, seq = i))
    }

  /** writeAppResource (writer.go:274-299). */
  def appDeltaRows(block: Block): Vector[AppDeltaRow] =
    block.delta.appResources.zipWithIndex.flatMap { case (r, i) =>
      if (r.paramsDeleted)
        Some(AppDeltaRow(r.aidx, block.round, isDelete = true, r.addr, JsonNull, seq = i))
      else
        r.paramsJson.map(p =>
          AppDeltaRow(r.aidx, block.round, isDelete = false, r.addr, Some(p), seq = i))
    }

  def accountAppDeltaRows(block: Block): Vector[AccountAppDeltaRow] =
    block.delta.appResources.zipWithIndex.flatMap { case (r, i) =>
      if (r.stateDeleted)
        Some(AccountAppDeltaRow(r.addr, r.aidx, block.round, isDelete = true, JsonNull, seq = i))
      else
        r.localStateJson.map(ls =>
          AccountAppDeltaRow(r.addr, r.aidx, block.round, isDelete = false, Some(ls), seq = i))
    }

  /** writeBoxMods (writer.go:302-321): value == None ⇒ hard delete. */
  def appBoxDeltaRows(block: Block): Vector[AppBoxDeltaRow] =
    BlockTransforms.boxMods(block).zipWithIndex.map { case (m, i) =>
      AppBoxDeltaRow(m.app, m.name, block.round,
        isDelete = m.value.isEmpty,
        value = m.value, seq = i)
    }
}
