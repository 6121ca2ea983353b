package graft.transform

import graft.model._

/** Ledger-delta → per-table delta rows (the inputs to graft.state
  * .StateMerge), mirroring writeAccount / writeAssetResource /
  * writeAppResource / writeBoxMods (writer.go:181-321).
  *
  * Delete deltas carry the zeroed/nulled payload the reference's delete
  * statements write (balances 0, document column JSON "null"), so the merge
  * applies payload uniformly.
  */
object DeltaTransforms {

  private val JsonNull = Some("null")

  /** writeAccount (writer.go:181-250): MicroAlgos == 0 ⇒ delete; keytype
    * delta applies only when the sender had a sigtype delta this block
    * (rekey/stateproof ⇒ present with NULL value). */
  def accountDeltaRows(block: Block): Vector[AccountDeltaRow] = {
    val sigDeltas = BlockTransforms.sigTypeDeltas(block.payset)
    block.delta.accounts.map { a =>
      val kt = sigDeltas.get(a.addr)
      if (a.microAlgos == 0)
        AccountDeltaRow(
          addr = a.addr, round = block.round, isDelete = true,
          microalgos = 0, rewardsbase = 0, rewards_total = 0,
          ktPresent = kt.isDefined, keytype = kt.flatten,
          account_data = JsonNull)
      else
        AccountDeltaRow(
          addr = a.addr, round = block.round, isDelete = false,
          microalgos = a.microAlgos, rewardsbase = a.rewardsBase,
          rewards_total = a.rewardedMicroAlgos,
          ktPresent = kt.isDefined, keytype = kt.flatten,
          account_data = Some(a.accountDataJson))
    }
  }

  /** writeAssetResource (writer.go:252-272): params side → asset table,
    * holding side → account_asset table; each side independently
    * upsert/delete/skip. */
  def assetDeltaRows(block: Block): Vector[AssetDeltaRow] =
    block.delta.assetResources.flatMap { r =>
      if (r.paramsDeleted)
        Some(AssetDeltaRow(r.aidx, block.round, isDelete = true, r.addr, JsonNull))
      else
        r.paramsJson.map(p => AssetDeltaRow(r.aidx, block.round, isDelete = false, r.addr, Some(p)))
    }

  def accountAssetDeltaRows(block: Block): Vector[AccountAssetDeltaRow] =
    block.delta.assetResources.flatMap { r =>
      if (r.holdingDeleted)
        Some(AccountAssetDeltaRow(r.addr, r.aidx, block.round, isDelete = true,
          java.math.BigDecimal.ZERO, frozen = false))
      else
        r.holding.map(h => AccountAssetDeltaRow(r.addr, r.aidx, block.round, isDelete = false,
          new java.math.BigDecimal(h.amount.bigInteger), h.frozen))
    }

  /** writeAppResource (writer.go:274-299). */
  def appDeltaRows(block: Block): Vector[AppDeltaRow] =
    block.delta.appResources.flatMap { r =>
      if (r.paramsDeleted)
        Some(AppDeltaRow(r.aidx, block.round, isDelete = true, r.addr, JsonNull))
      else
        r.paramsJson.map(p => AppDeltaRow(r.aidx, block.round, isDelete = false, r.addr, Some(p)))
    }

  def accountAppDeltaRows(block: Block): Vector[AccountAppDeltaRow] =
    block.delta.appResources.flatMap { r =>
      if (r.stateDeleted)
        Some(AccountAppDeltaRow(r.addr, r.aidx, block.round, isDelete = true, JsonNull))
      else
        r.localStateJson.map(ls => AccountAppDeltaRow(r.addr, r.aidx, block.round, isDelete = false, Some(ls)))
    }

  /** writeBoxMods (writer.go:302-321): value == None ⇒ hard delete. */
  def appBoxDeltaRows(block: Block): Vector[AppBoxDeltaRow] =
    BlockTransforms.boxMods(block).map { m =>
      AppBoxDeltaRow(m.app, m.name, block.round,
        isDelete = m.value.isEmpty,
        value = m.value)
    }
}
