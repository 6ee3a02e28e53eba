package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftClient
import graft.index.KeyBloom

/** The live-key Bloom sidecar that lets partition stores skip delete
  * fan-outs for keys they provably never held. The invariant everything
  * rests on: the file is a SUPERSET of the store's live keys, so
  * [[KeyBloom.narrow]] may only drop keys whose delete would be a no-op
  * — a false negative would silently lose a delete, so the spec's
  * center of gravity is delete/move correctness THROUGH the bloom, not
  * the I/O savings. */
class KeyBloomSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("key-bloom-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def newClient(): GraftClient = {
    val root = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    new GraftClient(spark, root)
  }

  test("unit: narrow keeps present keys, drops provably-absent ones; overflow doubles capacity") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom-unit").toString
    val live = Seq("a", "b", "c").toDF("key")
    // absent file: narrow is identity (unknown = must resolve)
    assert(KeyBloom.narrow(spark, dir, Seq("zz").toDF("key")).count() == 1)
    KeyBloom.addKeys(dir, live, () => live, defaultCapacity = 4)
    assert(KeyBloom.exists(dir))
    val probe = Seq("a", "c", "nope1", "nope2", "nope3").toDF("key")
    val kept = KeyBloom.narrow(spark, dir, probe).collect().map(_.getString(0)).toSet
    assert(Set("a", "c").subsetOf(kept), "present keys must always survive")
    assert(kept.size < 5, "a tiny bloom over 3 keys should rule out most absent probes")
    // overflow: adding past capacity rebuilds from live() at doubled size
    val more = (0 until 20).map(i => s"m$i").toDF("key")
    KeyBloom.addKeys(dir, more, () => live.unionByName(more), defaultCapacity = 4)
    val keptAfter = KeyBloom.narrow(spark, dir,
      live.unionByName(more)).count()
    assert(keptAfter == 23, "every live key must survive the overflow rebuild")
  }

  test("routed collection: foreign-partition fan-outs ride the bloom; moves and deletes stay exact") {
    import spark.implicits._
    val client = newClient()
    client.createCollection("kb", dim = 2, partitionKey = "tenant", numPartitions = 4)
    client.upsert("kb", (0 until 40)
      .map(i => (s"k$i", Seq(i.toFloat, 0f), Map("tenant" -> s"t${i % 5}")))
      .toDF("key", "vec", "meta"))
    assert(client.count("kb") == 40)
    // pk-move THROUGH the bloom: k3 (t3) moves to t0 — the old partition's
    // bloom contains k3, so the fan-out delete must survive narrowing
    client.upsert("kb", Seq(("k3", Seq(99f, 0f), Map("tenant" -> "t0")))
      .toDF("key", "vec", "meta"))
    assert(client.count("kb") == 40, "a move must not duplicate the key")
    assert(client.search("kb", Array(0f, 0f), k = 50, partitionKeyValues = Seq("t3"))
      .collect().map(_.getString(0)).forall(_ != "k3"),
      "the old partition must stop serving the moved key")
    // unscoped delete of existing + ghost keys: the ghosts get narrowed
    // away, the real key must still die
    client.deleteByKeys("kb", Seq("k7", "ghost1", "ghost2"))
    assert(client.count("kb") == 39)
    assert(client.fetch("kb", Seq("k7")).isEmpty)
    // delete of ONLY ghosts commits nothing anywhere (version stability)
    val before = client.flush("kb")
    client.deleteByKeys("kb", Seq("never1", "never2"))
    assert(client.flush("kb") == before,
      "ghost deletes must not bump any partition's version")
  }

  test("named partitions maintain the sidecar too; re-create cannot inherit a stale bloom") {
    import spark.implicits._
    val client = newClient()
    client.createCollection("np", dim = 2, buckets = 4)
    client.createPartition("np", "hot")
    client.upsert("np", Seq(("x", Seq(1f, 0f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"), partition = "hot")
    client.deleteByKeys("np", Seq("x"))
    assert(client.count("np") == 0, "the bloom must not hide a real key from deletion")
    client.dropPartition("np", "hot")
    client.createPartition("np", "hot")
    client.upsert("np", Seq(("y", Seq(1f, 0f), Map.empty[String, String]))
      .toDF("key", "vec", "meta"), partition = "hot")
    client.deleteByKeys("np", Seq("y"))
    assert(client.count("np") == 0,
      "a re-created partition's fresh bloom must still see its own keys")
  }
}
