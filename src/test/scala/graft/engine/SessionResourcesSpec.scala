package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import graft.{SessionResources, SparkSpec}

/** BYE/shutdown artifact GC (VERDICT r3 #5/#7): scratch dirs and cached
  * KMR result broadcasts are session resources — the reference process
  * exits at BYE, so nothing it wrote to scratch may outlive the engine.
  *
  * Uses sf0.01 so its scratch-path identities are disjoint from the other
  * suites' sf0.001 artifacts (suites share one SparkSession and may run
  * concurrently — shutdown here must not collect a sibling's live dirs;
  * in production the appId component alone isolates sessions, suites
  * share an app by construction). */
class SessionResourcesSpec extends AnyFunSuite with SparkSpec {
  val dir = "/root/testdata/sf0.01"

  test("engine shutdown GCs scratch dirs and KMR result broadcasts; reruns recreate them") {
    val appId = spark.sparkContext.applicationId
    // materialize the artifact-writing operators
    assert(graft.sources.JsonlExport.jsonlRoundtrip(spark, dir).count() > 0)
    assert(graft.operators.Similarity.annIvfIndexedQuery(spark, dir).count() > 0)
    assert(graft.queries.KvSurface.mrAllKeys(spark, dir).count() == 1)
    val jsonlDir = Paths.get(SessionResources.scratchDir(spark, "jsonl", dir))
    val ivfDir = Paths.get(SessionResources.scratchDir(spark, "ivf_index", dir))
    assert(Files.exists(jsonlDir), "jsonl export dir missing before shutdown")
    assert(Files.exists(ivfDir), "ivf index dir missing before shutdown")
    assert(graft.queries.KvSurface.resultBroadcastCount(appId) >= 1,
      "no cached KMR result broadcast before shutdown")

    // NOTE: release is app-wide by design (BYE = process exit). The only
    // sibling suite that creates KMR broadcasts (SparkEntrySpec) never
    // re-executes its DataFrames, so a concurrent destroy cannot fail it;
    // the count==0 assert below runs immediately after release, inside a
    // microseconds-wide window.
    val engine = new Engine(spark) // shares the session; does not own it
    engine.shutdown()

    assert(!Files.exists(jsonlDir), "jsonl scratch dir survived shutdown")
    assert(!Files.exists(ivfDir), "ivf index dir survived shutdown")
    assert(graft.queries.KvSurface.resultBroadcastCount(appId) == 0,
      "KMR result broadcasts survived shutdown")
    assert(SessionResources.pendingCount(appId) == 0,
      "cleanup actions survived release")

    // a later session op on the same app simply recreates its artifacts
    assert(graft.sources.JsonlExport.jsonlRoundtrip(spark, dir).count() > 0)
    assert(graft.queries.KvSurface.mrAllKeys(spark, dir).count() == 1)
    assert(graft.queries.KvSurface.resultBroadcastCount(appId) >= 1)
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
