package graft.tools

import org.apache.spark.sql.SparkSession
import graft.engine.{Engine, EngineOptions}
import scala.util.Random

/** Reference-analogous point-op microbenchmark (ref: p2/bench/bench.cc —
  * 80% lookup / 10% insert / 10% remove over a bounded uniform key range,
  * 50% pre-populated; defaults -k 1024 -r 80).
  *
  * Usage: runMain graft.tools.KvBench [keys] [ops] [threads]
  * Prints one JSON line {"metric":"kv_ops_per_sec",...}.
  *
  * Quotas are opened wide so the measurement is the storage path, not the
  * rate limiter (the reference bench drives the map directly, below the
  * quota layer).
  */
object KvBench {
  def main(args: Array[String]): Unit = {
    val keys = args.lift(0).map(_.toInt).getOrElse(1024)
    val ops = args.lift(1).map(_.toInt).getOrElse(100000)
    val threads = args.lift(2).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      // see Bench.scala: single-JVM harness disables artifact-isolation
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // this main built the session, so the engine owns its lifecycle: BYE/
    // shutdown stops Spark too (the reachable ownsSession path)
    val e = new Engine(spark, EngineOptions(
      upQuota = Long.MaxValue / 4, downQuota = Long.MaxValue / 4,
      reqQuota = Long.MaxValue / 4, quotaDurSec = 3600.0,
      rng = new Random(42), ownsSession = true))
    // one user per thread (the reference bench fleet is multi-client);
    // quota state is per-user, so admission tracking doesn't serialize the
    // whole workload
    (0 until threads).foreach(t => e.register(s"bench$t", "pw"))
    val rnd = new Random(7)
    // 50% pre-population
    (0 until keys).foreach { k =>
      if (rnd.nextBoolean())
        e.kvInsert("bench0", "pw", s"k$k", s"v$k".getBytes)
    }

    val perThread = ops / threads
    val t0 = System.nanoTime()
    val workers = (0 until threads).map { tid =>
      new Thread(() => {
        val u = s"bench$tid"
        val r = new Random(100 + tid)
        var i = 0
        while (i < perThread) {
          val k = s"k${r.nextInt(keys)}"
          val dice = r.nextInt(100)
          if (dice < 80) e.kvGet(u, "pw", k)
          else if (dice < 90) e.kvInsert(u, "pw", k, "x".getBytes)
          else e.kvDelete(u, "pw", k)
          i += 1
        }
      })
    }
    workers.foreach(_.start()); workers.foreach(_.join())
    val sec = (System.nanoTime() - t0) / 1e9
    val done = perThread * threads
    println(f"""{"metric":"kv_ops_per_sec","value":${done / sec}%.0f,"unit":"ops/sec","ops":$done,"seconds":$sec%.3f,"keys":$keys,"threads":$threads,"mix":"80/10/10"}""")
    e.shutdown() // ownsSession: stops the SparkSession too
  }
}
