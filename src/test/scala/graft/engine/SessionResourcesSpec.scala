package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicInteger
import graft.{SessionResources, SparkSpec}

/** Session-artifact GC lifecycle (VERDICT r3 #5/#7, reshaped by the r4
  * advice): artifacts (scratch dirs, cached KMR result broadcasts) belong
  * to the APPLICATION, not to any one engine — a BYE on an engine that
  * merely borrows the shared SparkSession must NOT delete scratch dirs or
  * destroy broadcasts that sibling engines / lazily-returned DataFrames
  * still reference. The app-wide sweep runs at application end (listener)
  * or at an owning engine's BYE.
  *
  * Release-path mechanics are exercised under SYNTHETIC appIds (the
  * registerAction seam), so this suite can never collect a sibling
  * suite's live artifacts regardless of test execution order or
  * parallelism. */
class SessionResourcesSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.01"

  test("non-owning engine shutdown leaves application artifacts intact") {
    val appId = spark.sparkContext.applicationId
    // materialize the artifact-writing operators
    assert(graft.sources.JsonlExport.jsonlRoundtrip(spark, dir).count() > 0)
    assert(graft.operators.Similarity.annIvfIndexedQuery(spark, dir).count() > 0)
    val mr = graft.queries.KvSurface.mrAllKeys(spark, dir)
    assert(mr.count() == 1)
    val jsonlDir = Paths.get(SessionResources.scratchDir(spark, "jsonl", dir))
    val ivfDir = Paths.get(SessionResources.scratchDir(spark, "ivf_index", dir))
    assert(Files.exists(jsonlDir), "jsonl export dir missing")
    assert(Files.exists(ivfDir), "ivf index dir missing")
    assert(graft.queries.KvSurface.resultBroadcastCount(appId) >= 1,
      "no cached KMR result broadcast")

    val engine = new Engine(spark) // shares the session; does not own it
    engine.shutdown()

    // BYE stopped THIS engine...
    assert(engine.isStopped)
    assert(!engine.register("u", "p").succeeded)
    // ...but the application's artifacts survive: a sibling's lazy
    // DataFrame can still execute against them
    assert(Files.exists(jsonlDir), "non-owning BYE deleted the jsonl dir")
    assert(Files.exists(ivfDir), "non-owning BYE deleted the ivf index")
    assert(graft.queries.KvSurface.resultBroadcastCount(appId) >= 1,
      "non-owning BYE destroyed sibling KMR broadcasts")
    assert(mr.count() == 1, "KMR DataFrame died with a non-owning engine")
    assert(SessionResources.pendingCount(appId) > 0,
      "cleanup actions must stay queued for application end")
  }

  test("release runs every action exactly once and drops the queue") {
    val fake = "graft-spec-app-release"
    val hits = new AtomicInteger(0)
    val tmp = Files.createTempDirectory("graft_spec_release")
    Files.writeString(tmp.resolve("artifact"), "x")
    SessionResources.registerAction(fake)(() => hits.incrementAndGet())
    SessionResources.registerAction(fake) { () =>
      Files.deleteIfExists(tmp.resolve("artifact")); Files.deleteIfExists(tmp)
    }
    assert(SessionResources.pendingCount(fake) == 2)
    SessionResources.release(fake)
    assert(hits.get() == 1)
    assert(!Files.exists(tmp), "registered deletion did not run")
    assert(SessionResources.pendingCount(fake) == 0)
    SessionResources.release(fake) // idempotent: second release is a no-op
    assert(hits.get() == 1)
  }

  test("release isolates applications: one app's sweep never touches another's") {
    val a = "graft-spec-app-a"
    val b = "graft-spec-app-b"
    val hitsA = new AtomicInteger(0)
    val hitsB = new AtomicInteger(0)
    SessionResources.registerAction(a)(() => hitsA.incrementAndGet())
    SessionResources.registerAction(b)(() => hitsB.incrementAndGet())
    SessionResources.release(a)
    assert(hitsA.get() == 1)
    assert(hitsB.get() == 0, "releasing app A drained app B's actions")
    assert(SessionResources.pendingCount(b) == 1)
    SessionResources.release(b)
    assert(hitsB.get() == 1)
  }

  test("a failing cleanup action does not block the rest") {
    val fake = "graft-spec-app-failing"
    val hits = new AtomicInteger(0)
    SessionResources.registerAction(fake)(() => sys.error("boom"))
    SessionResources.registerAction(fake)(() => hits.incrementAndGet())
    SessionResources.release(fake)
    assert(hits.get() == 1, "action after a throwing one never ran")
    assert(SessionResources.pendingCount(fake) == 0)
  }

  test("scratch paths are source- and application-scoped") {
    val a = SessionResources.scratchDir(spark, "jsonl", "/root/testdata/sf0.001")
    val b = SessionResources.scratchDir(spark, "jsonl", "/root/testdata/sf0.01")
    val c = SessionResources.scratchDir(spark, "ivf_index", "/root/testdata/sf0.001")
    assert(a != b, "different sources must never share a scratch path")
    assert(a != c, "different kinds must never share a scratch path")
    assert(a.contains(spark.sparkContext.applicationId),
      "scratch path must carry the applicationId")
  }
}
