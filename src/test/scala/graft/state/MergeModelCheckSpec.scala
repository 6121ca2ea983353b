package graft.state

import graft.{Fixtures, SparkSpec}
import graft.model.{AccountDeltaRow, AccountRow, AppBoxDeltaRow, AppBoxRow}
import scala.util.Random

/** Model-based check: random operation sequences applied two ways —
  * (a) sequentially through an in-memory model that implements the
  * reference's prepared statements verbatim (writer.go:39-114, one op at
  * a time, exactly the ON CONFLICT semantics), and (b) through the
  * declarative batched StateMerge, split across random batch boundaries.
  * Any divergence in the batch reduction (first-round/last-delete/keytype
  * aggregation) that the handwritten cases don't cover shows up here.
  */
class MergeModelCheckSpec extends SparkSpec {
  import Fixtures._

  // ── the in-memory model: one reference statement at a time ──────────

  private case class MAcct(
      micro: Long, rb: Long, rt: Long, deleted: Boolean,
      created: Long, closed: Option[Long], kt: Option[String], data: Option[String])

  private def modelApply(state: Map[String, MAcct], op: AccountDeltaRow): Map[String, MAcct] = {
    val existing = state.get(op.addr)
    val next = existing match {
      case None =>
        // INSERT branch: created_at = round; delete also sets closed_at
        MAcct(op.microalgos, op.rewardsbase, op.rewards_total, op.isDelete,
          op.round, if (op.isDelete) Some(op.round) else None,
          if (op.ktPresent) op.keytype else None, op.account_data)
      case Some(cur) =>
        // ON CONFLICT DO UPDATE: payload + deleted; closed_at only on
        // delete; created_at never; keytype only when the stmt carries it
        MAcct(op.microalgos, op.rewardsbase, op.rewards_total, op.isDelete,
          cur.created, if (op.isDelete) Some(op.round) else cur.closed,
          if (op.ktPresent) op.keytype else cur.kt, op.account_data)
    }
    state.updated(op.addr, next)
  }

  private def randomOps(rnd: Random, nRounds: Int, keys: Seq[String]): Seq[AccountDeltaRow] =
    (0 until nRounds).flatMap { r =>
      keys.filter(_ => rnd.nextDouble() < 0.4).map { k =>
        val del = rnd.nextDouble() < 0.3
        val ktPresent = rnd.nextDouble() < 0.4
        val kt = if (ktPresent && rnd.nextDouble() < 0.7)
          Some(Seq("sig", "msig", "lsig")(rnd.nextInt(3))) else None
        if (del)
          AccountDeltaRow(k, r, isDelete = true, 0, 0, 0, ktPresent, kt, Some("null"))
        else
          AccountDeltaRow(k, r, isDelete = false,
            rnd.nextInt(1000000).toLong, rnd.nextInt(100).toLong, rnd.nextInt(100).toLong,
            ktPresent, kt, Some(s"""{"v":${rnd.nextInt(100)}}"""))
      }
    }

  test("random op sequences: batched merge == sequential reference model (accounts)") {
    import spark.implicits._
    val keys = (1 to 8).map(addr)
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val ops = randomOps(rnd, nRounds = 12, keys)

      val expected = ops.foldLeft(Map.empty[String, MAcct])(modelApply)

      // random batch boundaries over rounds
      val cut1 = rnd.nextInt(12)
      val cut2 = cut1 + rnd.nextInt(12 - cut1)
      val batches = Seq(
        ops.filter(_.round < cut1), ops.filter(o => o.round >= cut1 && o.round < cut2),
        ops.filter(_.round >= cut2)).filter(_.nonEmpty)

      var state = spark.createDataset(Seq.empty[AccountRow]).toDF()
      batches.foreach { b =>
        state = StateMerge.mergeSoftDelete(
          state, spark.createDataset(b).toDF(),
          Seq("addr"), Seq("microalgos", "rewardsbase", "rewards_total", "account_data"),
          ktCol = Some(("ktPresent", "keytype")))
          .select("addr", "microalgos", "rewardsbase", "rewards_total", "deleted",
            "created_at", "closed_at", "keytype", "account_data")
          .localCheckpoint(true)
      }

      val actual = state.as[AccountRow].collect().map(r => r.addr ->
        MAcct(r.microalgos, r.rewardsbase, r.rewards_total, r.deleted,
          r.created_at, r.closed_at, r.keytype, r.account_data)).toMap
      assert(actual == expected, s"seed $seed diverged")
    }
  }

  test("random op sequences: batched hard-delete merge == model (boxes)") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rnd = new Random(seed * 100)
      val names = Seq("a", "b", "c", "d")
      val ops = (0 until 10).flatMap { r =>
        names.filter(_ => rnd.nextDouble() < 0.5).map { n =>
          if (rnd.nextDouble() < 0.35)
            AppBoxDeltaRow(1, n.getBytes, r, isDelete = true, None)
          else
            AppBoxDeltaRow(1, n.getBytes, r, isDelete = false, Some(s"v$r-$n".getBytes))
        }
      }
      val expected = ops.foldLeft(Map.empty[String, String]) { (m, op) =>
        if (op.isDelete) m - new String(op.name)
        else m.updated(new String(op.name), new String(op.value.get))
      }

      val cut = rnd.nextInt(10)
      val batches = Seq(ops.filter(_.round < cut), ops.filter(_.round >= cut)).filter(_.nonEmpty)
      var state = spark.createDataset(Seq.empty[AppBoxRow]).toDF()
      batches.foreach { b =>
        state = StateMerge.mergeHardDelete(state, spark.createDataset(b).toDF(),
          Seq("app", "name"), Seq("value")).localCheckpoint(true)
      }
      val actual = state.as[AppBoxRow].collect()
        .map(r => new String(r.name) -> new String(r.value)).toMap
      assert(actual == expected, s"seed $seed diverged")
    }
  }
}
