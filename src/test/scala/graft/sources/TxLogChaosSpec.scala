package graft.sources

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Concurrent-writer chaos: N real threads race appends and merges against
  * ONE table through the CAS commit protocol, with crashed-writer debris
  * injected — the adversarial form of the single-writer ACID specs.
  *
  * The contract under test (the Delta/Iceberg optimistic-concurrency rule):
  *   - every committed operation occupies exactly one version, versions are
  *     a gapless 0..N chain (the linearization order IS version order);
  *   - replaying the committed operations in version order through an
  *     in-memory model reproduces EVERY version's contents exactly — no
  *     lost updates, no phantom rows, regardless of interleaving;
  *   - a writer that dies after writing data files but before its manifest
  *     commit leaves debris that no read at any version ever surfaces, and
  *     [[TxLog.vacuum]] reclaims it without touching live files.
  */
class TxLogChaosSpec extends SparkSpec {
  import spark.implicits._

  private case class R(id: Long, k: Long, v: Long)

  private def df(rows: Seq[R]) =
    rows.map(r => (r.id, r.k, r.v)).toDF("id", "k", "v")

  private def readAs(path: String, version: Long): Map[R, Int] =
    TxLog.read(spark, path, version).collect()
      .map(r => R(r.getAs[Long]("id"), r.getAs[Long]("k"), r.getAs[Long]("v")))
      .groupBy(identity).view.mapValues(_.length).toMap

  /** Per-version model replay of a mixed append/merge history. */
  private def replay(ops: Seq[(Long, String, Seq[R])],
                     path: String): Unit = {
    var state = Vector.empty[R]
    ops.sortBy(_._1).foreach { case (version, kind, rows) =>
      state = kind match {
        case "append" => state ++ rows
        case "merge" =>
          val touched = rows.map(_.k).toSet
          val ids = rows.map(_.id).toSet
          state.filterNot(r => touched.contains(r.k) && ids.contains(r.id)) ++ rows
      }
      val expected = state.groupBy(identity).view.mapValues(_.size).toMap
      assert(readAs(path, version) == expected,
        s"v$version diverges from the model replay ($kind)")
    }
  }

  test("racing appenders: gapless versions, no lost batch, every version replays") {
    val path = java.nio.file.Files.createTempDirectory("chaos-app").toString + "/t"
    val nThreads = 4
    val perThread = 4
    val pool = Executors.newFixedThreadPool(nThreads)
    val start = new CountDownLatch(1)
    val committed = new ConcurrentLinkedQueue[(Long, String, Seq[R])]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    (0 until nThreads).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          (0 until perThread).foreach { i =>
            val rows = (0 until 3).map(j =>
              R(id = t * 1000 + i * 10 + j, k = j.toLong, v = i.toLong))
            try {
              val v = TxLog.append(df(rows), path, "k")
              committed.add((v, "append", rows))
            } catch { case e: Throwable => failures.add(e) }
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    assert(failures.isEmpty,
      s"appends must retry through contention, got: ${failures.peek()}")
    val ops = committed.toArray(Array.empty[(Long, String, Seq[R])]).toSeq
    assert(ops.size == nThreads * perThread)
    val versions = ops.map(_._1).sorted
    assert(versions == (0L until (nThreads * perThread)).toSeq,
      s"versions must be the gapless CAS chain, got $versions")
    replay(ops, path)
  }

  test("contended CAS liveness: 8 writers x 5 commits all land exactly once within the retry bound") {
    // starvation pin for MaxCommitAttempts: a writer loses an attempt only
    // because another writer committed, so its worst case here is the other
    // writers' total commits (7 x 5 = 39 < 50) — with the jittered backoff
    // decorrelating the herd, every commit must land, exactly once, with
    // zero ConcurrentWriteConflict escapes
    val path = java.nio.file.Files.createTempDirectory("chaos-live").toString + "/t"
    val nThreads = 8
    val perThread = 5
    val pool = Executors.newFixedThreadPool(nThreads)
    val start = new CountDownLatch(1)
    val committed = new ConcurrentLinkedQueue[(Long, String, Seq[R])]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    (0 until nThreads).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          (0 until perThread).foreach { i =>
            val rows = Seq(R(id = t * 100 + i, k = (t % 3).toLong, v = i.toLong))
            try {
              val v = TxLog.append(df(rows), path, "k")
              committed.add((v, "append", rows))
            } catch { case e: Throwable => failures.add(e) }
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(240, TimeUnit.SECONDS))
    assert(failures.isEmpty,
      s"liveness: all contended commits must land, got ${failures.peek()}")
    val ops = committed.toArray(Array.empty[(Long, String, Seq[R])]).toSeq
    assert(ops.size == nThreads * perThread)
    // exactly once: every commit owns one distinct version of a gapless chain
    assert(ops.map(_._1).sorted == (0L until (nThreads * perThread)).toSeq)
    replay(ops, path)
  }

  test("racing merges on overlapping partitions: first-committer-wins, retry linearizes") {
    val path = java.nio.file.Files.createTempDirectory("chaos-mrg").toString + "/t"
    val base = (0 until 30).map(i => R(i.toLong, (i % 3).toLong, -1L))
    TxLog.append(df(base), path, "k")
    val nThreads = 4
    val pool = Executors.newFixedThreadPool(nThreads)
    val start = new CountDownLatch(1)
    val committed = new ConcurrentLinkedQueue[(Long, String, Seq[R])]()
    val failures = new ConcurrentLinkedQueue[Throwable]()
    val conflicts = new java.util.concurrent.atomic.AtomicInteger
    (0 until nThreads).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          (0 until 3).foreach { i =>
            // per-thread disjoint ids but SHARED partitions (k = id % 3): the
            // serializable-merge guard must abort the loser, and the retry
            // (recomputing from the fresh snapshot) must land without
            // clobbering the winner's rows
            val rows = (0 until 2).map(j =>
              R(id = 100 + t * 10 + j, k = ((t + j) % 3).toLong, v = i.toLong))
            var done = false
            var tries = 0
            while (!done && tries < 50) {
              tries += 1
              try {
                val v = TxLog.mergeKeys(df(rows), path, "k", keyCols = Seq("id"))
                committed.add((v, "merge", rows))
                done = true
              } catch {
                case _: TxLog.ConcurrentWriteConflict => conflicts.incrementAndGet()
                case e: Throwable => failures.add(e); done = true
              }
            }
            if (!done) failures.add(new AssertionError("merge starved after 50 tries"))
          }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(180, TimeUnit.SECONDS))
    assert(failures.isEmpty, s"unexpected failure: ${failures.peek()}")
    val ops = committed.toArray(Array.empty[(Long, String, Seq[R])]).toSeq
    assert(ops.size == nThreads * 3)
    val versions = ops.map(_._1).sorted
    assert(versions == (1L to (nThreads * 3)).toSeq,
      s"merge versions must chain gaplessly after the base load, got $versions")
    // the race was real: at least one loser had to retry (4 threads × shared
    // partitions make this overwhelmingly likely; if it ever reads 0 the
    // test still verified linearizability, so only warn via assert message)
    replay((0L, "append", base) +: ops, path)
  }

  test("crashed writer's debris: invisible at every version, reclaimed by vacuum") {
    val path = java.nio.file.Files.createTempDirectory("chaos-orp").toString + "/t"
    TxLog.append(df(Seq(R(1, 0, 10), R(2, 1, 20))), path, "k")
    TxLog.append(df(Seq(R(3, 0, 30))), path, "k")
    // a writer that died post-data-write, pre-commit: its tx dir holds real
    // parquet bytes that no manifest references
    val dead = new java.io.File(s"$path/tx-deadbeef")
    df(Seq(R(99, 0, 999), R(98, 1, 998))).coalesce(1)
      .write.mode("overwrite").parquet(dead.toString)
    def visibleIds(v: Long) = readAs(path, v).keySet.map(_.id)
    assert(visibleIds(0) == Set(1L, 2L))
    assert(visibleIds(1) == Set(1L, 2L, 3L))
    // readMerged walks footers of MANIFEST files only — debris stays dark
    assert(TxLog.readMerged(spark, path).select("id").collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    TxLog.vacuum(spark, path, retainVersions = 2)
    assert(!dead.exists() ||
      dead.listFiles().forall(f => !f.getName.endsWith(".parquet")),
      "vacuum must reclaim the crashed writer's parquet debris")
    // both retained versions still read exactly as before the vacuum
    assert(visibleIds(0) == Set(1L, 2L))
    assert(visibleIds(1) == Set(1L, 2L, 3L))
  }

  test("vacuum vs in-flight reader: pinned-snapshot reads complete exactly or fail cleanly, never partial") {
    // the reader-side half of the retention contract: a reader holding a
    // snapshot OLDER than the retention horizon must either materialize the
    // FULL pinned contents (its files survived this long) or die with a
    // missing-file error — a silent subset (some tasks read files vacuum
    // hadn't reached yet, others skip) would be a wrong answer, not a
    // failure, and is the one outcome nothing may produce
    val path = java.nio.file.Files.createTempDirectory("chaos-vac").toString + "/t"
    val rows0 = (0 until 200).map(i => R(i.toLong, (i % 4).toLong, 0L))
    TxLog.append(df(rows0), path, "k")
    val expected0 = rows0.groupBy(identity).view.mapValues(_.length).toMap
    val pinned = TxLog.read(spark, path, 0) // the in-flight reader's frame
    def materialize(): Map[R, Int] = pinned.collect()
      .map(r => R(r.getAs[Long]("id"), r.getAs[Long]("k"), r.getAs[Long]("v")))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(materialize() == expected0) // sanity: complete before any vacuum
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val wrongAnswers = new ConcurrentLinkedQueue[String]()
    val uncleanFailures = new ConcurrentLinkedQueue[Throwable]()
    val successes = new java.util.concurrent.atomic.AtomicInteger(1)
    val cleanFailures = new java.util.concurrent.atomic.AtomicInteger(0)
    def isMissingFile(e: Throwable): Boolean =
      Iterator.iterate(e)(_.getCause).takeWhile(_ != null).exists {
        c => c.isInstanceOf[java.io.FileNotFoundException] ||
          Option(c.getMessage).exists(_.contains("FileNotFoundException"))
      }
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val got = materialize()
          if (got == expected0) successes.incrementAndGet()
          else wrongAnswers.add(
            s"partial read: ${got.values.sum} rows vs ${expected0.values.sum}")
        } catch {
          case e: Throwable =>
            if (isMissingFile(e)) cleanFailures.incrementAndGet()
            else uncleanFailures.add(e)
        }
      }
    })
    reader.start()
    // writer: each round rewrites every live file (compact) and vacuums to
    // the latest manifest — v0's files leave the retention horizon on the
    // first round and are deleted out from under the pinned reader
    (1 to 4).foreach { _ =>
      TxLog.compact(spark, path, "k")
      TxLog.vacuum(spark, path, retainVersions = 1)
    }
    stop.set(true)
    reader.join(120000)
    assert(!reader.isAlive, "reader thread must terminate")
    assert(wrongAnswers.isEmpty,
      s"a pinned read returned PARTIAL data: ${wrongAnswers.peek()}")
    assert(uncleanFailures.isEmpty,
      s"a pinned read failed without a missing-file cause: ${uncleanFailures.peek()}")
    // deterministic tail: with v0 fully outside retention, re-materializing
    // the pinned frame MUST fail (cleanly) — and the live table must still
    // read exactly its compacted contents from untouched files
    val post = try { Left(materialize()) } catch { case e: Throwable => Right(e) }
    post match {
      case Left(m) => fail(s"v0 files are vacuumed; read returned ${m.values.sum} rows")
      case Right(e) => assert(isMissingFile(e),
        s"post-vacuum pinned read must die on missing files, got $e")
    }
    assert(readAs(path, TxLog.currentVersion(spark, path)) == expected0,
      "the live compacted table must be untouched by vacuum")
  }
}
