package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Direct spec for the unified gated ledger-probe discipline
  * ([[BatchLedger.gatedProbe]]/[[BatchLedger.gatedAntiSemi]]/
  * [[BatchLedger.broadcastable]]) — seven streaming sites hand-rolled
  * this shape through rounds 13-14 and two round-14 self-review bugs
  * were that duplication biting. Both gate branches must be
  * result-identical (the gate is a PLAN choice, never a semantics
  * choice), every fold algebra in use (identity, sum, min) must fold
  * the same on the semi'd hit set as on the full ledger, and the
  * byte-aware gate must admit id frames at the row cap while tripping
  * on long-string frames far earlier. */
class GatedProbeSpec extends SparkSpec {
  import spark.implicits._

  private val ledger = Seq(
    ("a", 10L), ("b", 20L), ("b", 5L), ("c", 30L), ("d", 40L))
    .toDF("k", "v")
  private val batch = Seq(
    ("a", 100L), ("b", 200L), ("x", 300L), ("y", 400L))
    .toDF("k", "payload")

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("gatedAntiSemi: both gate branches produce identical anti and semi") {
    for (gate <- Seq(true, false)) {
      val (anti, semi, cps) = BatchLedger.gatedAntiSemi(
        batch, ledger.select("k"), batch.select("k").distinct(), Seq("k"), gate)
      assert(rows(anti) == Set(Seq("x", 300L), Seq("y", 400L)), s"anti, gate=$gate")
      assert(rows(semi) == Set(Seq("a", 100L), Seq("b", 200L)), s"semi, gate=$gate")
      assert(cps.nonEmpty == gate, "only the gated branch checkpoints a hit set")
      cps.foreach(_.unpersist(blocking = true))
    }
  }

  test("gatedProbe fold algebras (sum, min) agree across gate branches") {
    def outer(probe: DataFrame) =
      batch.join(probe, Seq("k"), "left_outer")
        .select(col("k"), coalesce(col("agg"), lit(-1L)).as("agg"))
    for ((foldName, fold) <- Seq[(String, DataFrame => DataFrame)](
      "sum" -> (_.groupBy("k").agg(sum("v").as("agg"))),
      "min" -> (_.groupBy("k").agg(min("v").as("agg"))))) {
      val expect = foldName match {
        case "sum" => Set(Seq("a", 10L), Seq("b", 25L), Seq("x", -1L), Seq("y", -1L))
        case _     => Set(Seq("a", 10L), Seq("b", 5L), Seq("x", -1L), Seq("y", -1L))
      }
      for (gate <- Seq(true, false)) {
        val (probe, cps) = BatchLedger.gatedProbe(
          ledger, batch.select("k").distinct(), Seq("k"), gate, fold)
        assert(rows(outer(probe)) == expect, s"fold=$foldName gate=$gate")
        cps.foreach(_.unpersist(blocking = true))
      }
    }
  }

  test("gatedProbe identity fold carries ledger payload columns through") {
    // the revisit-origs shape: probe the (key, payload) ledger, join back inner
    for (gate <- Seq(true, false)) {
      val (probe, cps) = BatchLedger.gatedProbe(
        ledger.groupBy("k").agg(min("v").as("orig")),
        batch.select("k").distinct(), Seq("k"), gate)
      val joined = batch.join(probe, Seq("k"))
      assert(rows(joined.select("k", "orig")) == Set(Seq("a", 10L), Seq("b", 5L)),
        s"gate=$gate")
      cps.foreach(_.unpersist(blocking = true))
    }
  }

  test("broadcastable: byte-aware — id frames pass where string frames trip") {
    val longUrl = "https://example.com/" + ("x" * 200)
    val urls = (1 to 1000).map(i => s"$longUrl/$i").toDF("u")
      .localCheckpoint()
    // ~205 KB of strings: passes a 1 MiB budget, trips a 64 KiB one
    assert(BatchLedger.broadcastable(urls, Seq("u"), maxBytes = 1L << 20))
    assert(!BatchLedger.broadcastable(urls, Seq("u"), maxBytes = 64L << 10))
    // same ROWS as 8-byte ids: passes the small budget (8 KB)
    val ids = (1 to 1000).map(_.toLong).toDF("id").localCheckpoint()
    assert(BatchLedger.broadcastable(ids, Seq("id"), maxBytes = 64L << 10))
    // the row cap binds independently of bytes
    assert(!BatchLedger.broadcastable(ids, Seq("id"), maxRows = 10L))
    // null strings count zero bytes, not a null-poisoned sum
    val withNulls = Seq(Some("abc"), None, Some("de")).toDF("u")
    assert(BatchLedger.broadcastable(withNulls, Seq("u")))
    // an empty frame is trivially broadcastable (sum is NULL → 0)
    assert(BatchLedger.broadcastable(Seq.empty[String].toDF("u"), Seq("u")))
    urls.unpersist(blocking = true); ids.unpersist(blocking = true)
  }

  test("randomized equivalence: 40 seeded cases, gate on ≡ gate off") {
    // the gate must be a PLAN choice only — sweep random overlap
    // shapes (disjoint, subset, superset, dup ledger rows, empty
    // sides) through both branches and the sum fold
    val rnd = new scala.util.Random(424242L)
    for (i <- 1 to 40) {
      val ledgerRows = Seq.fill(rnd.nextInt(40))(
        (s"k${rnd.nextInt(12)}", rnd.nextInt(100).toLong))
      val batchRows = Seq.fill(rnd.nextInt(20))(
        (s"k${rnd.nextInt(16)}", rnd.nextInt(100).toLong))
      val led = ledgerRows.toDF("k", "v")
      val bat = batchRows.toDF("k", "payload")
      val keys = bat.select("k").distinct()
      def run(gate: Boolean) = {
        val (anti, semi, cps) = BatchLedger.gatedAntiSemi(bat, led.select("k"), keys, Seq("k"), gate)
        val (probe, cps2) = BatchLedger.gatedProbe(led, keys, Seq("k"), gate,
          fold = _.groupBy("k").agg(sum("v").as("agg")))
        val folded = bat.join(probe, Seq("k")).select("k", "agg")
        val r = (rows(anti), rows(semi), rows(folded))
        (cps ++ cps2).foreach(_.unpersist(blocking = true))
        r
      }
      assert(run(gate = true) == run(gate = false), s"case $i diverged")
    }
  }

  test("gated branch plan broadcasts; ungated branch does not") {
    val (probeG, cpsG) = BatchLedger.gatedProbe(
      ledger.select("k"), batch.select("k").distinct(), Seq("k"), gate = true)
    val planG = batch.join(probeG, Seq("k"), "left_anti")
      .queryExecution.executedPlan.toString
    assert(planG.contains("BroadcastHashJoin") || planG.contains("Broadcast"),
      s"gated plan should broadcast:\n$planG")
    val (probeU, _) = BatchLedger.gatedProbe(
      ledger.select("k"), batch.select("k").distinct(), Seq("k"), gate = false)
    val planU = batch.join(probeU.hint("shuffle_merge"), Seq("k"), "left_anti")
      .queryExecution.executedPlan.toString
    assert(planU.contains("SortMergeJoin"),
      s"ungated floor should sort-merge under the hint:\n$planU")
    cpsG.foreach(_.unpersist(blocking = true))
  }
}
