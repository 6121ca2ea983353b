package graft.model

/** Flat row shapes for the 9 maintained tables (SURVEY.md §1.4) and the
  * per-table delta rows the accounting transform emits (§2.C inputs).
  *
  * Divergences from the reference schema, on purpose:
  *   - addresses are stored in their 58-char string encoding rather than
  *     bytea (same information via graft.codec.Codecs.addressDecode; string
  *     keys join/partition cleanly in Spark);
  *   - `params`/`localstate`/`account_data` hold canonical-JSON strings —
  *     the jsonb escape hatch of schema:57,82,103,116 — with the reference's
  *     convention that a soft-deleted row holds the JSON literal "null".
  *
  * account_asset.amount is DecimalType(20,0): full uint64 range
  * (setup_cockroachdb_sql.go:64 "need the full 18446744073709551615");
  * java.math.BigDecimal encodes to Decimal(38,18) by default, so the table
  * schemas below are applied explicitly when creating empty tables.
  */
final case class AccountRow(
    addr: String,
    microalgos: Long,
    rewardsbase: Long,
    rewards_total: Long,
    deleted: Boolean,
    created_at: Long,
    closed_at: Option[Long],
    keytype: Option[String],
    account_data: Option[String])

final case class AccountAssetRow(
    addr: String,
    assetid: Long,
    amount: java.math.BigDecimal,
    frozen: Boolean,
    deleted: Boolean,
    created_at: Long,
    closed_at: Option[Long])

final case class AssetTableRow(
    id: Long,
    creator_addr: String,
    params: Option[String],
    deleted: Boolean,
    created_at: Long,
    closed_at: Option[Long])

final case class AppRow(
    id: Long,
    creator: String,
    params: Option[String],
    deleted: Boolean,
    created_at: Long,
    closed_at: Option[Long])

final case class AccountAppRow(
    addr: String,
    app: Long,
    localstate: Option[String],
    deleted: Boolean,
    created_at: Long,
    closed_at: Option[Long])

final case class AppBoxRow(app: Long, name: Array[Byte], value: Array[Byte])

// ── Delta rows (one per state statement the reference would queue;
//    writer.go:39-114). Delete deltas carry their zeroed/nulled payload so
//    the merge can treat payload uniformly. `seq` is the statement's
//    position within its block (payset/delta order): the reference applies
//    statements in order, so a same-key same-round tie must resolve to the
//    LAST statement, not an arbitrary row. ─────────────────────────────

final case class AccountDeltaRow(
    addr: String,
    round: Long,
    isDelete: Boolean,
    microalgos: Long,
    rewardsbase: Long,
    rewards_total: Long,
    ktPresent: Boolean,
    keytype: Option[String],
    account_data: Option[String],
    seq: Int = 0)

final case class AssetDeltaRow(
    id: Long,
    round: Long,
    isDelete: Boolean,
    creator_addr: String,
    params: Option[String],
    seq: Int = 0)

final case class AccountAssetDeltaRow(
    addr: String,
    assetid: Long,
    round: Long,
    isDelete: Boolean,
    amount: java.math.BigDecimal,
    frozen: Boolean,
    seq: Int = 0)

final case class AppDeltaRow(
    id: Long,
    round: Long,
    isDelete: Boolean,
    creator: String,
    params: Option[String],
    seq: Int = 0)

final case class AccountAppDeltaRow(
    addr: String,
    app: Long,
    round: Long,
    isDelete: Boolean,
    localstate: Option[String],
    seq: Int = 0)

final case class AppBoxDeltaRow(
    app: Long,
    name: Array[Byte],
    round: Long,
    isDelete: Boolean,
    value: Option[Array[Byte]],
    seq: Int = 0)
