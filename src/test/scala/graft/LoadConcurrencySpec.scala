package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftClient

/** Races on the load/release surface. The cache is JVM-global state
  * shared by every client instance of a root, so the races that matter
  * are cross-thread: two loads, load vs commit, release vs an in-flight
  * search, and a loaded reader under a committing writer. The invariant
  * under test everywhere: a search NEVER fails and NEVER returns rows
  * that were not a committed snapshot's rows — the cache may only change
  * WHERE bytes are read from, not WHICH bytes exist. */
class LoadConcurrencySpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .appName("load-concurrency-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newClient(): GraftClient = {
    val root = java.nio.file.Files.createTempDirectory("graft-loadrace").toString
    new GraftClient(spark, root)
  }

  private def seed(client: GraftClient, name: String, n: Int): Unit = {
    import spark.implicits._
    client.createCollection(name, dim = 2, buckets = 8)
    client.upsert(name, (0 until n)
      .map(i => (f"k$i%04d", Seq((i + 1).toFloat, 0f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
  }

  test("two concurrent loads agree and leave one working cache") {
    val client = newClient()
    seed(client, "dl", 200)
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val counts = (0 until 2).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = { gate.await(); client.loadCollection("dl") }
      })
    }
    gate.countDown()
    val loaded = counts.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(loaded == Seq(200L, 200L), s"both loads must see the full snapshot: $loaded")
    assert(client.loadState("dl") == "Loaded")
    assert(client.search("dl", Array(0f, 0f), k = 1).head().getString(0) == "k0000")
    client.releaseCollection("dl")
  }

  test("release while a search plan is in flight: the collected result is still correct") {
    val client = newClient()
    seed(client, "rl", 200)
    client.loadCollection("rl")
    // build the plan against the loaded frame, THEN release, THEN collect:
    // execution must either read surviving cached blocks or recompute from
    // the (still present) files — identical rows either way
    val df = client.search("rl", Array(0f, 0f), k = 5)
    val planned = df.queryExecution.executedPlan.toString
    assert(planned.contains("InMemoryTableScan"))
    client.releaseCollection("rl")
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("k0000", "k0001", "k0002", "k0003", "k0004"),
      "a release mid-query must not change or lose rows")
  }

  test("loaded reader under a committing writer: every read is a committed snapshot") {
    import spark.implicits._
    val client = newClient()
    seed(client, "rw", 100)
    client.loadCollection("rw")
    val pool = Executors.newFixedThreadPool(2)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val writer = pool.submit(new Runnable {
      def run(): Unit = {
        var i = 0
        while (!stop.get() && i < 6) {
          // each commit adds one NEW key and overwrites one existing key
          client.upsert("rw", Seq(
            (f"n$i%04d", Seq(1000f + i, 0f), Map.empty[String, String]),
            ("k0001", Seq(500f + i, 0f), Map.empty[String, String]))
            .toDF("key", "vec", "meta"))
          i += 1
        }
      }
    })
    try {
      var reads = 0
      while (!writer.isDone && reads < 200) {
        // count must be 100 + (commits so far): monotone, never torn —
        // a torn read (partial snapshot) would under- or over-count
        val c = client.count("rw")
        assert(c >= 100 && c <= 106, s"count $c is not a committed snapshot")
        // the overwritten key resolves to exactly one row through the cache
        val k1 = client.queryWhere("rw", org.apache.spark.sql.functions.col("key") === "k0001")
        assert(k1.count() == 1, "an overwritten key must stay single through frame swaps")
        reads += 1
      }
      writer.get(120, TimeUnit.SECONDS)
      assert(client.count("rw") == 106)
      assert(client.loadState("rw") == "Loaded")
    } finally {
      stop.set(true)
      pool.shutdown()
    }
    client.releaseCollection("rw")
  }

  test("load racing a commit: the loaded frame lands on a committed snapshot") {
    import spark.implicits._
    val client = newClient()
    seed(client, "lc", 100)
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val loader = pool.submit(new java.util.concurrent.Callable[Long] {
      def call(): Long = { gate.await(); client.loadCollection("lc") }
    })
    val writer = pool.submit(new Runnable {
      def run(): Unit = {
        gate.await()
        client.upsert("lc", Seq(("extra", Seq(999f, 0f), Map.empty[String, String]))
          .toDF("key", "vec", "meta"))
      }
    })
    gate.countDown()
    val loaded = loader.get(120, TimeUnit.SECONDS)
    writer.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    assert(loaded == 100L || loaded == 101L,
      s"load must materialize a committed snapshot (got $loaded)")
    // whatever the load raced into, the CURRENT read sees the commit
    assert(client.count("lc") == 101)
    client.releaseCollection("lc")
  }
}
