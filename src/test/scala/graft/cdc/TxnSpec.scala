package graft.cdc

import graft.SparkSpec

/** Idempotent writer transactions (Delta's txnAppId/txnVersion): the
  * per-app watermark rides the op's own manifest commit (atomic with
  * the data), replayed versions skip, and the watermark carries
  * forward through unrelated commits, compaction, restore, and
  * concurrent-commit rebases.
  */
class TxnSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(name: String): String = {
    val root = s"target/test_tmp/txn_$name"
    MergeTable.drop(root)
    root
  }

  test("txn records the watermark atomically with the data commit") {
    val root = fresh("record")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    assert(t.lastTxn("app") === None)
    val r = t.txn("app", 7L) { t.upsert(Seq((2L, "b")).toDF("id", "v")) }
    assert(r.isDefined)
    assert(t.lastTxn("app") === Some(7L))
    assert(t.read().count() === 2)
  }

  test("replayed and older versions skip; newer versions run") {
    val root = fresh("skip")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    t.txn("app", 5L) { t.upsert(Seq((2L, "b")).toDF("id", "v")) }
    val vAfter = t.versions().last
    // same version: skipped, no commit, data untouched
    assert(t.txn("app", 5L) { t.upsert(Seq((3L, "X")).toDF("id", "v")) } === None)
    // older version: skipped
    assert(t.txn("app", 4L) { t.upsert(Seq((4L, "Y")).toDF("id", "v")) } === None)
    assert(t.versions().last === vAfter)
    assert(t.read().count() === 2)
    // newer version: runs
    assert(t.txn("app", 6L) { t.upsert(Seq((5L, "c")).toDF("id", "v")) }.isDefined)
    assert(t.lastTxn("app") === Some(6L))
    assert(t.read().count() === 3)
  }

  test("the blind-append replay hole is closed") {
    val root = fresh("append")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    val batch = Seq((10L, "x"), (11L, "y")).toDF("id", "v")
    t.txn("ingest", 0L) { t.append(batch) }
    // append is NOT value-idempotent — without the txn a replay would
    // duplicate both rows; with it the replay is skipped
    assert(t.txn("ingest", 0L) { t.append(batch) } === None)
    assert(t.read().count() === 3)
  }

  test("watermarks carry through unrelated commits, compaction, restore") {
    val root = fresh("carry")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")), mode = MergeTable.MergeOnRead)
    t.txn("app", 1L) { t.upsert(Seq((2L, "b")).toDF("id", "v")) }
    t.upsert(Seq((3L, "c")).toDF("id", "v")) // no txn
    assert(t.lastTxn("app") === Some(1L))
    t.compact()
    assert(t.lastTxn("app") === Some(1L), "watermark lost in compaction")
    val v = t.versions().last
    t.upsert(Seq((4L, "d")).toDF("id", "v"))
    t.restore(v)
    assert(t.lastTxn("app") === Some(1L), "watermark lost in restore")
  }

  test("apps are independent; an op that fails before committing records nothing") {
    val root = fresh("apps")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    t.txn("app_a", 3L) { t.upsert(Seq((2L, "b")).toDF("id", "v")) }
    t.txn("app_b", 9L) { t.upsert(Seq((3L, "c")).toDF("id", "v")) }
    assert(t.txns() === Map("app_a" -> 3L, "app_b" -> 9L))
    intercept[RuntimeException] {
      t.txn("app_c", 1L) { throw new RuntimeException("boom") }
    }
    assert(t.lastTxn("app_c") === None)
    // and the pending txn did not leak onto the next untxn'd commit
    t.upsert(Seq((4L, "d")).toDF("id", "v"))
    assert(t.lastTxn("app_c") === None)
  }

  test("a crash AFTER an op's first commit records no watermark (multi-commit safety)") {
    // the sink's changes mode commits upsert-then-delete; a watermark
    // recorded on the first commit would make checkpoint replay skip
    // the unfinished delete forever — the marker-commit design records
    // only on full completion, so the replay re-runs everything
    val root = fresh("partial")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a"), (2L, "b")).toDF("id", "v")))
    intercept[RuntimeException] {
      t.txn("app", 1L) {
        t.upsert(Seq((3L, "c")).toDF("id", "v")) // first commit lands
        throw new RuntimeException("crash before the delete")
      }
    }
    assert(t.lastTxn("app") === None, "partial op recorded a watermark")
    // replay re-runs the WHOLE op; idempotent per batch
    t.txn("app", 1L) {
      t.upsert(Seq((3L, "c")).toDF("id", "v"))
      t.delete(Seq(2L).toDF("id"))
    }
    assert(t.lastTxn("app") === Some(1L))
    assert(t.read().as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 3L -> "c"))
  }

  test("txnAtomic: the watermark rides the append's own commit — one version, no marker") {
    val root = fresh("atomic")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    val before = t.versions().last
    val r = t.txnAtomic("ingest", 0L) { t.append(Seq((2L, "b")).toDF("id", "v")) }
    assert(r.isDefined)
    assert(t.lastTxn("ingest") === Some(0L))
    assert(t.versions().last === before + 1,
      "txnAtomic must not add a separate marker commit")
    // replay skips even though append is not value-idempotent
    assert(t.txnAtomic("ingest", 0L) { t.append(Seq((2L, "b")).toDF("id", "v")) } === None)
    assert(t.read().count() === 2)
  }

  test("txnAtomic: no crash window — the commit either carries the watermark or never lands") {
    val root = fresh("atomic_crash")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    var fired = false
    t.onBeforeCommit = () => {
      if (!fired) { fired = true; throw new RuntimeException("crash at commit") }
    }
    intercept[RuntimeException] {
      t.txnAtomic("ingest", 0L) { t.append(Seq((2L, "b")).toDF("id", "v")) }
    }
    assert(t.lastTxn("ingest") === None, "uncommitted op recorded a watermark")
    assert(t.read().count() === 1)
    // replay runs in full and the single surviving commit carries both
    t.txnAtomic("ingest", 0L) { t.append(Seq((2L, "b")).toDF("id", "v")) }
    assert(t.lastTxn("ingest") === Some(0L))
    assert(t.read().count() === 2)
  }

  test("txnAtomic refuses a multi-commit op loudly") {
    val root = fresh("atomic_multi")
    val t = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")))
    val e = intercept[IllegalArgumentException] {
      t.txnAtomic("app", 1L) {
        t.append(Seq((2L, "b")).toDF("id", "v"))
        t.append(Seq((3L, "c")).toDF("id", "v"))
      }
    }
    assert(e.getMessage.contains("multi-commit ops must use txn()"))
    // the guard fires at the second commit ATTEMPT — before it can
    // land carrying nothing — so only the first append is on disk and
    // replay (which skips on the first commit's watermark) loses nothing
    // it hadn't already lost at the refusal
    assert(t.read().select("id").as[Long].collect().toSet === Set(1L, 2L),
      "second commit must be refused BEFORE landing")
  }

  test("watermarks from both writers survive a concurrent-commit rebase") {
    val root = fresh("rebase")
    val t1 = MergeTable.createIfAbsent(spark, root, Seq("id"),
      initial = Some(Seq((1L, "a")).toDF("id", "v")), mode = MergeTable.MergeOnRead)
    val t2 = MergeTable.open(spark, root)
    var fired = false
    t2.onBeforeCommit = () => {
      if (!fired) { fired = true; t1.txn("w1", 5L) { t1.upsert(Seq((2L, "b")).toDF("id", "v")) } }
    }
    t2.txn("w2", 8L) { t2.upsert(Seq((3L, "c")).toDF("id", "v")) }
    assert(t2.txns() === Map("w1" -> 5L, "w2" -> 8L))
    assert(t2.read().count() === 3)
  }

  test("sink option txnAppId skips a replayed micro-batch") {
    val root = fresh("sink")
    val sink = new graft.sources.MergeTableSink(root, Seq("id"),
      MergeTable.CopyOnWrite, None, "upsert", Nil, Nil, txnAppId = Some("q1"))
    val batch = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    sink.addBatch(0L, batch)
    val t = MergeTable.open(spark, root)
    val v = t.versions().last
    sink.addBatch(0L, batch) // checkpoint replay
    assert(t.versions().last === v, "replayed batch committed again")
    sink.addBatch(1L, Seq((3L, "c")).toDF("id", "v"))
    assert(t.read().count() === 3)
    assert(t.lastTxn("q1") === Some(1L))
  }
}
