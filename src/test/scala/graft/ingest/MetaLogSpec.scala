package graft.ingest

import graft.SparkSpec
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Pins the append-only metadata log: set/append record semantics,
  * checkpoint + retention, crash-replay across a checkpoint boundary,
  * pre-log `metastate.json` migration, cross-instance visibility, and the
  * O(batch) commit payload that motivates the design. */
class MetaLogSpec extends SparkSpec {

  private def metaFiles(root: String): Seq[String] =
    scala.util.Using.resource(Files.list(Paths.get(root, "_meta")))(
      _.iterator().asScala.map(_.getFileName.toString).toList).sorted

  test("set replaces, append joins lines; state materializes through both") {
    val root = tmpDir("metalog")
    val log = new MetaLog(root)
    log.append(sets = Seq("watermark" -> "1"), appends = Seq("manifest.t" -> "f1"))
    log.append(sets = Seq("watermark" -> "2"), appends = Seq("manifest.t" -> "f2\nf3"))
    log.append(sets = Seq("manifest.t" -> "f9"))                     // full replace
    log.append(sets = Nil, appends = Seq("manifest.t" -> "f10"))
    assert(log.state() == Map("watermark" -> "2", "manifest.t" -> "f9\nf10"))
    assert(log.version == 3)
  }

  test("a fresh reader instance replays checkpoint + tail to the same state") {
    val root = tmpDir("metalog")
    val log = new MetaLog(root, checkpointInterval = 8)
    (0 until 30).foreach { i =>
      log.append(sets = Seq("wm" -> i.toString), appends = Seq("m" -> s"file-$i"))
    }
    val reader = new MetaLog(root, checkpointInterval = 8)
    assert(reader.state() == log.state())
    assert(reader.state()("wm") == "29")
    assert(reader.state()("m").linesIterator.size == 30)
    // checkpoints exist and old records were retired (interval 8, 30
    // records ⇒ checkpoints at 8,16,24; records ≤ 16 dropped)
    val files = metaFiles(root)
    assert(files.count(_.endsWith(".checkpoint.json")) == 2)
    assert(!files.contains(f"${8L}%020d.json"))
    assert(files.count(f => f.endsWith(".json") && !f.endsWith(".checkpoint.json")) <= 14)
  }

  test("crash replay across a checkpoint boundary: reader state is exact") {
    val root = tmpDir("metalog")
    val writer = new MetaLog(root, checkpointInterval = 4)
    (0 until 6).foreach(i => writer.append(Seq("k" -> s"v$i"), Seq("log" -> s"entry-$i")))
    // "crash": drop the writer; leftover tmp from a mid-write crash is inert
    Files.writeString(Paths.get(root, "_meta", ".tmp-dead"), "{broken")
    val recovered = new MetaLog(root, checkpointInterval = 4)
    assert(recovered.version == 5)
    assert(recovered.state()("k") == "v5")
    assert(recovered.state()("log") == (0 until 6).map(i => s"entry-$i").mkString("\n"))
    // recovered writer continues the sequence and crosses the next boundary
    (6 until 9).foreach(i => recovered.append(Seq("k" -> s"v$i"), Seq("log" -> s"entry-$i")))
    val reader = new MetaLog(root)
    assert(reader.state()("log") == (0 until 9).map(i => s"entry-$i").mkString("\n"))
  }

  test("pre-log metastate.json is honored as the base state") {
    val root = tmpDir("metalog")
    Files.writeString(Paths.get(root, "metastate.json"),
      """{"legacy_key":"legacy_value","wm":"7"}""")
    val log = new MetaLog(root)
    assert(log.state() == Map("legacy_key" -> "legacy_value", "wm" -> "7"))
    log.append(Seq("wm" -> "8"), Seq("m" -> "f1"))
    val reader = new MetaLog(root)
    assert(reader.state() ==
      Map("legacy_key" -> "legacy_value", "wm" -> "8", "m" -> "f1"))
  }

  test("an open instance sees another writer's commits (version-gated refresh)") {
    val root = tmpDir("metalog")
    val a = new MetaLog(root)
    val b = new MetaLog(root)
    a.append(Seq("x" -> "1"))
    assert(b.state()("x") == "1")   // b lists the dir, replays the new tail
    b.append(Seq("x" -> "2"))
    assert(a.state()("x") == "2")
  }

  test("commit payload is O(batch), not O(history)") {
    val root = tmpDir("metalog")
    val log = new MetaLog(root, checkpointInterval = 1000) // no checkpoint interference
    val batchLines = (0 until 4).map(i => s"rbkt=0/part-$i.parquet").mkString("\n")
    var sizes = Vector.empty[Long]
    (0 until 200).foreach { i =>
      log.append(Seq("wm" -> i.toString), Seq("manifest.txn" -> batchLines))
      sizes :+= Files.size(Paths.get(root, "_meta", f"${i.toLong}%020d.json"))
    }
    // every record is the same size: the 200th commit writes no more
    // bytes than the 1st even though state holds 800 manifest lines
    assert(sizes.distinct.size <= 3, s"record sizes should be flat, got ${sizes.distinct}")
    assert(sizes.last <= sizes.head + 8)
  }

  test("TableStore round-trips manifests and index lines through the log") {
    val root = tmpDir("store")
    val store = new TableStore(spark, root)
    store.commitMetastate(
      sets = Seq(TableStore.MetaNextRound -> "5"),
      appends = Seq(
        store.manifestKey("txn") -> "rbkt=0/a.parquet\nrbkt=0/b.parquet",
        TableStore.roundStatsKey("txn") -> "rbkt=0/a.parquet\t0:2\nrbkt=0/b.parquet\t3:4"))
    assert(store.manifest("txn") == Seq("rbkt=0/a.parquet", "rbkt=0/b.parquet"))
    assert(store.fileRoundStatsRaw("txn") ==
      Map("rbkt=0/a.parquet" -> (0L, 2L), "rbkt=0/b.parquet" -> (3L, 4L)))
    assert(store.nextRound == 5)
    // second commit APPENDS manifest + stats lines
    store.commitMetastate(Nil, Seq(
      store.manifestKey("txn") -> "rbkt=1/c.parquet",
      TableStore.roundStatsKey("txn") -> "rbkt=1/c.parquet\t5:9"))
    assert(store.manifest("txn").size == 3)
    assert(store.fileRoundStatsRaw("txn")("rbkt=1/c.parquet") == (5L, 9L))
  }

  test("model check: random op sequences match an in-memory map, any reader, any interval") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 5) {
      val root = tmpDir(s"metalog-model-$trial")
      val interval = Seq(3, 7, 16)(trial % 3)
      val log = new MetaLog(root, checkpointInterval = interval)
      var model = Map.empty[String, String]
      var history = Vector.empty[Map[String, String]] // model AFTER commit v
      val keys = Vector("wm", "m.txn", "m.part", "stats", "acct")
      (0 until 120).foreach { i =>
        val sets = (0 until rnd.nextInt(3)).map(_ => keys(rnd.nextInt(keys.size)) -> s"v$i-${rnd.nextInt(10)}")
        val apps = (0 until rnd.nextInt(3)).map(_ => keys(rnd.nextInt(keys.size)) -> s"line$i")
        log.append(sets, apps)
        model = sets.foldLeft(model) { case (m, (k, v)) => m.updated(k, v) }
        model = apps.foldLeft(model) { case (m, (k, v)) =>
          m.updated(k, m.get(k).filter(_.nonEmpty).map(_ + "\n" + v).getOrElse(v))
        }
        history :+= model
        if (i % 17 == 0) {
          // a FRESH reader (checkpoint + tail replay) sees exactly the model
          assert(new MetaLog(root, checkpointInterval = interval).state() == model,
            s"trial $trial diverged at op $i")
          // time travel: any past version either matches its historical
          // model exactly or throws the retention-horizon error — never a
          // silently wrong state
          (0 to i).foreach { v =>
            try assert(log.stateAt(v) == history(v), s"trial $trial stateAt($v) wrong at op $i")
            catch { case _: IllegalStateException => () /* past the horizon */ }
          }
        }
      }
      assert(log.state() == model)
      assert(new MetaLog(root).state() == model)
      // the head version is always within the horizon
      assert(log.stateAt(log.version) == model)
    }
  }

  test("real ingest across a checkpoint boundary: reopen resumes and replays exactly") {
    import graft.codec.BlockCodec
    import graft.queries.EngineQueries
    import spark.implicits._
    val root = tmpDir("store-ckpt")
    // interval 3: ten 1-block batches cross several checkpoints
    val store = new TableStore(spark, root, nBuckets = 2, metaCheckpointInterval = 3)
    BlockIngest.initGenesis(store,
      (0 until 10).map(i => (EngineQueries.addr(i), 1000000L, "{}")), network = "ckpt-net")
    for (r <- 0 until 10)
      BlockIngest.applyBlocks(store, spark.createDataset(
        EngineQueries.syntheticBlocks(rounds = 1, txnsPerRound = 2, startRound = r)
          .map(BlockCodec.blockToJson)))
    val txnCount = store.read("txn").count()
    assert(store.nextRound == 10 && txnCount > 0)
    assert(metaFiles(root).exists(_.endsWith(".checkpoint.json")),
      "ten commits at interval 3 must have checkpointed")

    // a FRESH store (new JVM in production) materializes checkpoint+tail:
    // same watermark, same manifests, same data — and keeps ingesting
    val reopened = new TableStore(spark, root, nBuckets = 2, metaCheckpointInterval = 3)
    assert(reopened.nextRound == 10)
    assert(reopened.read("txn").count() == txnCount)
    assert(reopened.manifest("txn") == store.manifest("txn"))
    BlockIngest.applyBlocks(reopened, spark.createDataset(
      EngineQueries.syntheticBlocks(rounds = 1, txnsPerRound = 2, startRound = 10)
        .map(BlockCodec.blockToJson)))
    assert(reopened.nextRound == 11)
    assert(reopened.read("txn").count() > txnCount)
  }

  test("readOnly store refuses mutation and does not heal on read") {
    val root = tmpDir("store")
    val rw = new TableStore(spark, root)
    rw.putMetastate("x" -> "1")
    val ro = new TableStore(spark, root, readOnly = true)
    assert(ro.metastate("x") == "1")
    intercept[IllegalStateException](ro.putMetastate("x" -> "2"))
    intercept[IllegalStateException](ro.stageAppend("txn", rw.read("txn")))
    // a crash leftover `_old_bkt=0` stays untouched by a read-only read
    val leftover = Paths.get(root, "account", "_old_bkt=0")
    Files.createDirectories(leftover)
    ro.read("account").count()
    assert(Files.exists(leftover), "read-only read must not move directories")
    // the writer's read path heals it (live dir missing -> restore)
    rw.read("account").count()
    assert(!Files.exists(leftover) || Files.exists(Paths.get(root, "account", "bkt=0")))
  }
}
