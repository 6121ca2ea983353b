package graft.streaming

import graft.SparkSpec

/** Pins the streaming-budget contract: budgets fill best-first across
  * micro-batches, a filled source admits nothing more, replays are
  * idempotent, and the group-atomic admission rule holds against the
  * REMAINING (not full) budget. */
class StreamingBudgetSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, Long, Long)*) =
    rows.toDF("doc_id", "source", "score", "n_tokens")

  private def admittedIds(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("budget fills across batches best-first; filled source closes; replay idempotent") {
    val state = tmpDir("sbudget")
    val budgets = Map("A" -> 100L)

    // batch 0: A has 100; score-3 group (60) + score-2 group (40) fit exactly
    val b0 = StreamingBudget.processBatch(
      docs((1L, "A", 3L, 60L), (2L, "A", 2L, 40L), (3L, "A", 1L, 10L)),
      0L, "source", "score", "n_tokens", budgets, defaultBudget = 0L, state)
    assert(admittedIds(b0) == Set(1L, 2L), "100-token budget admits the top two groups exactly")

    // batch 1: A's budget is spent — nothing admitted no matter the score
    val b1 = StreamingBudget.processBatch(
      docs((10L, "A", 9L, 5L)),
      1L, "source", "score", "n_tokens", budgets, defaultBudget = 0L, state)
    assert(admittedIds(b1) == Set.empty[Long], "a filled source admits nothing more")

    // replay batch 1: same (empty) answer, ledger not double-charged
    val b1r = StreamingBudget.processBatch(
      docs((10L, "A", 9L, 5L)),
      1L, "source", "score", "n_tokens", budgets, defaultBudget = 0L, state)
    assert(admittedIds(b1r) == Set.empty[Long])

    // unseen source on the default budget: 0 means never admitted
    val b2 = StreamingBudget.processBatch(
      docs((20L, "B", 9L, 1L)),
      2L, "source", "score", "n_tokens", budgets, defaultBudget = 0L, state)
    assert(admittedIds(b2) == Set.empty[Long], "default budget 0 rejects unknown sources")
  }

  test("partial remainder: a later batch admits only groups that fit what is left, atomically") {
    val state = tmpDir("sbudget2")
    val budgets = Map("A" -> 100L)
    // batch 0 spends 70
    val b0 = StreamingBudget.processBatch(
      docs((1L, "A", 5L, 70L)),
      0L, "source", "score", "n_tokens", budgets, 0L, state)
    assert(admittedIds(b0) == Set(1L))
    // batch 1: remaining 30 — the 25-token group fits, the next (20) would
    // overflow and is rejected WHOLE (group-atomic against the remainder)
    val b1 = StreamingBudget.processBatch(
      docs((10L, "A", 9L, 25L), (11L, "A", 8L, 20L)),
      1L, "source", "score", "n_tokens", budgets, 0L, state)
    assert(admittedIds(b1) == Set(10L),
      "admission is group-atomic against the REMAINING budget")
    // replay of batch 0 after batch 1 exists: reads only batch < 0 = full
    // budget, admits the same rows, overwrites its own ledger partition
    val b0r = StreamingBudget.processBatch(
      docs((1L, "A", 5L, 70L)),
      0L, "source", "score", "n_tokens", budgets, 0L, state)
    assert(admittedIds(b0r) == Set(1L), "replay re-derives from batches strictly below")
  }
}
