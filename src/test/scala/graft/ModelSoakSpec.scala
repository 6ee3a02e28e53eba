package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.api.GraftClient

/** Model-based randomized soak (fixed seed, reproducible): a client
  * collection driven by dozens of random mixed batches must track a plain
  * in-memory last-write-wins model exactly — live set, point lookups,
  * exact search order, and pinned time-travel snapshots inside the retain
  * window. The properties are the reference's own put/delete/query
  * semantics (`put_vectors`/`delete_vectors`/`query_vectors`); the value
  * of the randomness is walking commit interleavings (upsert-over-delete,
  * delete-of-moved-key, re-put after delete, pinned reads straddling
  * vacuums) that no hand-written scenario enumerates. */
class ModelSoakSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("model-soak-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("random upsert/delete batches track the model; pinned versions stay frozen") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val root = java.nio.file.Files.createTempDirectory("graft-soak").toString
    val client = new GraftClient(spark, root)
    client.createCollection("soak", dim = 4, buckets = 4, retain = 3)

    def vec(i: Int): Seq[Float] =
      Seq(i.toFloat, (i * 7 % 13).toFloat, (i * 3 % 5).toFloat, 1f)

    // key -> (vec seed, writing step) — the oracle the store must match
    var model = Map.empty[String, (Int, Int)]
    val pinned = scala.collection.mutable.ArrayBuffer.empty[(Long, Map[String, (Int, Int)])]

    def liveAt(version: Long): Map[String, String] =
      client.readVersion("soak", version)
        .select(col("key"), element_at(col("meta"), "s").as("s"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap

    for (step <- 1 to 30) {
      // a scalar index on the churning 's' field joins the soak early:
      // every later random upsert/delete interleaving must roll it
      // forward exactly (single writer — no stale excuse)
      if (step == 2) client.createScalarIndex("soak", "s")
      if (rnd.nextInt(10) < 7 || model.isEmpty) {
        // upsert 1..15 distinct keys from a small hot keyspace (real
        // churn: most steps overwrite keys earlier steps wrote)
        val rows = (0 until rnd.nextInt(15) + 1)
          .map(_ => s"k${rnd.nextInt(40)}").distinct
          .map(k => (k, rnd.nextInt(1000)))
        client.upsert("soak",
          rows.map { case (k, seed) => (k, vec(seed), Map("s" -> step.toString)) }
            .toDF("key", "vec", "meta"))
        model ++= rows.map { case (k, seed) => k -> (seed, step) }
      } else {
        val dels = rnd.shuffle(model.keys.toSeq).take(rnd.nextInt(5) + 1)
        client.deleteByKeys("soak", dels)
        model --= dels
      }

      if (step % 7 == 0) pinned += ((client.versions("soak").last, model))

      // the CURRENT snapshot matches the model (keys + winning step)
      if (step % 5 == 0) {
        val got = liveAt(client.versions("soak").last)
        val want = model.map { case (k, (_, s)) => k -> s.toString }
        assert(got == want, s"step $step: live set diverged from the model")
      }

      // every pinned snapshot still inside the retain window reads FROZEN
      val vs = client.versions("soak")
      pinned.filter(p => vs.contains(p._1)).foreach { case (v, snap) =>
        assert(liveAt(v) == snap.map { case (k, (_, s)) => k -> s.toString },
          s"step $step: pinned version $v drifted after later commits")
      }

      // scalar-index invariants under the same churn: a pruned value
      // read equals the model (including values emptied by overwrites —
      // a step every later upsert superseded must read as gone), an
      // absent value reads empty, and the single-writer index is FRESH
      // after every commit (its maintenance saw every interleaving)
      if (step >= 2 && step % 5 == 0) {
        val probe = (step - rnd.nextInt(3)).toString
        val got = client.queryWhere("soak",
            element_at(col("meta"), lit("s")) === probe)
          .select("key").collect().map(_.getString(0)).toSet
        val want = model.collect {
          case (k, (_, s)) if s.toString == probe => k }.toSet
        assert(got == want, s"step $step: scalar-pruned read of s=$probe diverged")
        assert(client.queryWhere("soak",
          element_at(col("meta"), lit("s")) === "never-a-step").count() == 0)
        assert(client.listIndexes("soak")
          .filter(col("kind") === "SCALAR").collect()
          .forall(_.getAs[Boolean]("fresh")),
          s"step $step: single-writer scalar index went stale")
      }

      // random point lookups: present key exact, absent key empty
      if (model.nonEmpty && step % 4 == 0) {
        val k = model.keys.toSeq(rnd.nextInt(model.size))
        assert(client.get("soak", k).map(_._1) == Some(vec(model(k)._1)),
          s"step $step: get($k) diverged")
        assert(client.get("soak", s"never-written-${rnd.nextInt(100)}").isEmpty)
      }
    }

    // final exact search (FLAT collection) equals the model's l2 order
    val q = vec(7).toArray
    def l2(v: Seq[Float]): Double =
      v.zip(q).map { case (a, b) => val d = a.toDouble - b; d * d }.sum
    val want = model.toSeq.map { case (k, (seed, _)) => (k, l2(vec(seed))) }
      .sortBy { case (k, d) => (d, k) }.take(10).map(_._1)
    val got = client.search("soak", q, k = 10)
      .collect().map(_.getAs[String]("vector_key")).toSeq
    assert(got == want, "exact search after the soak diverged from the model")
  }
}
