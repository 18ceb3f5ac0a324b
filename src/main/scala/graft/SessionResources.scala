package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

/** Per-application scratch artifacts and their garbage collection.
  *
  * Operators that persist on-disk side artifacts (the IVF index, the
  * sharded-JSONL export) key their paths here: the directory name carries a
  * SHA-256 of the absolute source path (two DIFFERENT sources can never
  * collide — a 32-bit `hashCode` could) plus the Spark `applicationId`
  * (two concurrent sessions pointed at the SAME source never overwrite
  * each other's artifact mid-read). Every artifact is registered for
  * deletion and every registered action runs exactly once at release:
  * on `Engine.shutdown`/BYE (the reference process-exit analog) or at
  * `SparkContext` stop via a listener — whichever comes first. */
object SessionResources {

  private val actions =
    new ConcurrentHashMap[String, ConcurrentLinkedQueue[() => Unit]]
  // one listener per app EVER (never cleared on release: the listener is
  // already attached to the context and calling addSparkListener again
  // after each engine restart would accumulate listeners on the bus)
  private val listened = ConcurrentHashMap.newKeySet[String]()

  /** Register a cleanup action for this session's application; hooks the
    * application-end listener once per app so artifacts never outlive the
    * SparkContext even when no engine shutdown runs. Synchronized with
    * [[release]]: an action can never land in a queue a concurrent
    * release has already drained (it would silently never run). */
  def onRelease(spark: SparkSession)(action: () => Unit): Unit = {
    val appId = spark.sparkContext.applicationId
    registerAction(appId)(action)
    if (listened.add(appId))
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          release(appId)
      })
  }

  /** Registration seam without the listener hook — lets specs exercise the
    * register/release lifecycle under a synthetic appId that cannot touch
    * any live application's artifacts. */
  private[graft] def registerAction(appId: String)(action: () => Unit): Unit =
    synchronized {
      actions.computeIfAbsent(appId, _ => new ConcurrentLinkedQueue)
        .add(action)
    }

  /** Run (once) and drop every cleanup action registered for `appId`. */
  def release(appId: String): Unit = {
    val q = synchronized { actions.remove(appId) }
    if (q != null) q.forEach(a => try a() catch { case _: Throwable => () })
  }

  /** Outstanding cleanup actions for an app (spec visibility). */
  private[graft] def pendingCount(appId: String): Int = {
    val q = actions.get(appId)
    if (q == null) 0 else q.size
  }

  /** Deterministic scratch directory for (this application, `kind`,
    * `source`), registered for deletion at release. Re-deriving the same
    * path within one app is intentional — reruns overwrite their own
    * artifact, never another session's. */
  def scratchDir(spark: SparkSession, kind: String, source: String): String = {
    val digest = MessageDigest.getInstance("SHA-256")
      .digest(Paths.get(source).toAbsolutePath.toString.getBytes("UTF-8"))
      .take(8).map("%02x".format(_)).mkString
    val appId = spark.sparkContext.applicationId
    val p = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_${kind}_${digest}_$appId")
    onRelease(spark)(() => deleteRecursively(p))
    p.toString
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
}
