package graft.state

import graft.{Fixtures, SparkSpec}
import graft.model._
import org.apache.spark.sql.DataFrame

/** Transcribes the reference's create-delete-same-round / keytype-retention
  * / box-matrix golden tests (writer_test.go:561-621, 623-691, 788-837,
  * 1684-1857) against the declarative merge.
  */
class StateMergeSpec extends SparkSpec {
  import Fixtures._

  private def accountState(rows: Seq[AccountRow]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }

  private def accountDeltas(rows: Seq[AccountDeltaRow]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows).toDF()
  }

  private val acctPayload = Seq("microalgos", "rewardsbase", "rewards_total", "account_data")

  private def mergeAcct(state: Seq[AccountRow], deltas: Seq[AccountDeltaRow]): Map[String, AccountRow] = {
    import spark.implicits._
    StateMerge.mergeSoftDelete(accountState(state), accountDeltas(deltas),
      Seq("addr"), acctPayload, ktCol = Some(("ktPresent", "keytype")))
      .select("addr", "microalgos", "rewardsbase", "rewards_total", "deleted",
        "created_at", "closed_at", "keytype", "account_data")
      .as[AccountRow].collect().map(r => r.addr -> r).toMap
  }

  private def up(a: String, round: Long, algos: Long, kt: Option[Option[String]] = None) =
    AccountDeltaRow(a, round, isDelete = false, algos, 1, 2,
      ktPresent = kt.isDefined, keytype = kt.flatten, account_data = Some("{}"))

  private def del(a: String, round: Long, kt: Option[Option[String]] = None) =
    AccountDeltaRow(a, round, isDelete = true, 0, 0, 0,
      ktPresent = kt.isDefined, keytype = kt.flatten, account_data = Some("null"))

  test("upsert inserts with created_at = round") {
    val out = mergeAcct(Nil, Seq(up(A, 5, 1000, kt = Some(Some("sig")))))
    val r = out(A)
    assert(r.microalgos == 1000 && !r.deleted)
    assert(r.created_at == 5 && r.closed_at.isEmpty)
    assert(r.keytype.contains("sig"))
  }

  test("update preserves created_at (never in any UPDATE list)") {
    val out = mergeAcct(
      Seq(AccountRow(A, 500, 0, 0, deleted = false, 2, None, Some("sig"), Some("{}"))),
      Seq(up(A, 9, 900)))
    val r = out(A)
    assert(r.microalgos == 900 && r.created_at == 2)
    assert(r.keytype.contains("sig")) // no keytype delta ⇒ preserved
  }

  test("delete for a never-seen key inserts a tombstone with created_at = closed_at = round") {
    val out = mergeAcct(Nil, Seq(del(A, 7)))
    val r = out(A)
    assert(r.deleted && r.microalgos == 0)
    assert(r.created_at == 7 && r.closed_at.contains(7L))
    assert(r.account_data.contains("null"))
  }

  test("create-delete same batch: created_at from first op, closed_at from delete") {
    val out = mergeAcct(Nil, Seq(up(A, 4, 100), del(A, 6)))
    val r = out(A)
    assert(r.deleted && r.created_at == 4 && r.closed_at.contains(6L))
    assert(r.microalgos == 0)
  }

  test("delete-then-recreate keeps stale closed_at (upserts never touch it)") {
    val out = mergeAcct(
      Seq(AccountRow(A, 0, 0, 0, deleted = true, 1, Some(3L), None, Some("null"))),
      Seq(up(A, 8, 777)))
    val r = out(A)
    assert(!r.deleted && r.microalgos == 777)
    assert(r.created_at == 1 && r.closed_at.contains(3L))
  }

  test("keytype preserved across delete without sigtype delta (writer_test.go:623-691)") {
    val out = mergeAcct(
      Seq(AccountRow(A, 500, 0, 0, deleted = false, 2, None, Some("msig"), Some("{}"))),
      Seq(del(A, 9)))
    assert(out(A).keytype.contains("msig"))
  }

  test("keytype updated by delete WITH sigtype delta; rekey nulls it") {
    val out = mergeAcct(
      Seq(AccountRow(A, 500, 0, 0, deleted = false, 2, None, Some("msig"), Some("{}")),
        AccountRow(B, 600, 0, 0, deleted = false, 2, None, Some("sig"), Some("{}"))),
      Seq(del(A, 9, kt = Some(Some("lsig"))),
        up(B, 9, 700, kt = Some(None)))) // rekey ⇒ present with NULL value
    assert(out(A).keytype.contains("lsig"))
    assert(out(B).keytype.isEmpty)
  }

  test("last writer wins across rounds in one batch; lineage aggregates correct") {
    val out = mergeAcct(Nil, Seq(up(A, 1, 10), up(A, 2, 20), del(A, 3), up(A, 4, 40)))
    val r = out(A)
    assert(!r.deleted && r.microalgos == 40)
    assert(r.created_at == 1 && r.closed_at.contains(3L))
  }

  test("untouched state rows pass through unchanged") {
    val out = mergeAcct(
      Seq(AccountRow(A, 500, 1, 2, deleted = false, 2, None, Some("sig"), Some("{}")),
        AccountRow(B, 600, 3, 4, deleted = false, 3, Some(9L), None, Some("{}"))),
      Seq(up(A, 10, 501)))
    assert(out(A).microalgos == 501)
    val b = out(B)
    assert(b.microalgos == 600 && b.created_at == 3 && b.closed_at.contains(9L))
  }

  // ── app_box hard-delete matrix (C7; writer_test.go:1684-1857) ───────

  private def mergeBox(state: Seq[AppBoxRow], deltas: Seq[AppBoxDeltaRow]): Map[String, Array[Byte]] = {
    import spark.implicits._
    StateMerge.mergeHardDelete(
      spark.createDataset(state).toDF(),
      spark.createDataset(deltas).toDF(),
      Seq("app", "name"), Seq("value"))
      .as[AppBoxRow].collect()
      .map(r => s"${r.app}:${new String(r.name)}" -> r.value).toMap
  }

  test("box insert / mutate / delete / reinsert matrix") {
    val insert = mergeBox(Nil, Seq(
      AppBoxDeltaRow(1, "a".getBytes, 1, isDelete = false, Some("v1".getBytes))))
    assert(new String(insert("1:a")) == "v1")

    val mutate = mergeBox(
      Seq(AppBoxRow(1, "a".getBytes, "v1".getBytes)),
      Seq(AppBoxDeltaRow(1, "a".getBytes, 2, isDelete = false, Some("v2".getBytes))))
    assert(new String(mutate("1:a")) == "v2")

    val delete = mergeBox(
      Seq(AppBoxRow(1, "a".getBytes, "v2".getBytes), AppBoxRow(1, "b".getBytes, "keep".getBytes)),
      Seq(AppBoxDeltaRow(1, "a".getBytes, 3, isDelete = true, None)))
    assert(!delete.contains("1:a") && delete.contains("1:b"))

    // delete then reinsert in the SAME batch: last op wins, row exists
    val reinsert = mergeBox(
      Seq(AppBoxRow(1, "a".getBytes, "v2".getBytes)),
      Seq(AppBoxDeltaRow(1, "a".getBytes, 3, isDelete = true, None),
        AppBoxDeltaRow(1, "a".getBytes, 4, isDelete = false, Some("v3".getBytes))))
    assert(new String(reinsert("1:a")) == "v3")

    // delete of an absent box is a no-op
    val noop = mergeBox(Nil, Seq(AppBoxDeltaRow(1, "z".getBytes, 3, isDelete = true, None)))
    assert(noop.isEmpty)
  }

  // ── account_asset uint64 amounts (writer_test.go:838) ──────────────

  test("account_asset holds the full uint64 amount range") {
    import spark.implicits._
    val max = new java.math.BigDecimal("18446744073709551615")
    val merged = StateMerge.mergeSoftDelete(
      spark.createDataset(Seq.empty[AccountAssetRow]).toDF(),
      spark.createDataset(Seq(AccountAssetDeltaRow(A, 5, 3, isDelete = false, max, frozen = true))).toDF(),
      Seq("addr", "assetid"), Seq("amount", "frozen"))
    val r = merged.selectExpr("addr", "CAST(amount AS DECIMAL(20,0)) AS amount", "frozen", "created_at").collect().head
    assert(r.getDecimal(1).toBigInteger.toString == "18446744073709551615")
    assert(r.getBoolean(2) && r.getLong(3) == 3)
  }

  // ── same-key same-round statement order (payset order) ─────────────

  test("two statements for one key in one block: the later seq wins, deterministically") {
    // The reference applies statements in payset order; round alone ties.
    val first = up(A, 5, 111).copy(seq = 0)
    val second = up(A, 5, 222).copy(seq = 1)
    // Both input orders must resolve to the seq=1 payload.
    assert(mergeAcct(Nil, Seq(first, second))(A).microalgos == 222)
    assert(mergeAcct(Nil, Seq(second, first))(A).microalgos == 222)

    // Delete-then-recreate within one block: final face is the recreate,
    // but the delete still stamps closed_at (upserts never clear it).
    val out = mergeAcct(Nil, Seq(del(A, 5).copy(seq = 0), up(A, 5, 333).copy(seq = 1)))
    val r = out(A)
    assert(!r.deleted && r.microalgos == 333)
    assert(r.created_at == 5 && r.closed_at.contains(5L))

    // And the keytype presence-gate resolves by seq too.
    val kt = mergeAcct(Nil, Seq(
      up(A, 5, 1, kt = Some(Some("sig"))).copy(seq = 0),
      up(A, 5, 2, kt = Some(Some("msig"))).copy(seq = 1)))
    assert(kt(A).keytype.contains("msig"))
  }
}
