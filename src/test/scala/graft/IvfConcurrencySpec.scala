package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.GraftClient

/** Serialized-writers guarantee for the IVF layout (the same contract
  * the scalar and text indexes hold): admin `buildIndex` runs and
  * per-commit incremental refreshes interleaving freely must never
  * produce a GHOST-FRESH index — a stamp claiming the current snapshot
  * over a cell layout that is missing rows — and a build overtaken by a
  * commit must not swallow that commit's refresh (no lost refresh). */
class IvfConcurrencySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def vec(i: Int): Seq[Float] =
    Seq(i.toFloat, (i * 7 % 13).toFloat, (i * 3 % 5).toFloat, 1f)

  test("interleaved buildIndex vs commits: fresh implies complete; no lost refresh") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ivfrace").toString
    val client = new GraftClient(spark, root)
    client.createCollection("race", dim = 4, buckets = 4)
    client.upsert("race", (0 until 80).map(i =>
      (f"k$i%03d", vec(i), Map("s" -> (i % 3).toString)))
      .toDF("key", "vec", "meta"))
    client.buildIndex("race", nlist = 4)

    // two writers racing on one collection: an admin rebuilding the
    // index in a loop, a committer streaming small upsert batches
    @volatile var failure: Option[Throwable] = None
    def guarded(body: => Unit): Runnable = () =>
      try body catch { case t: Throwable => failure = failure.orElse(Some(t)) }
    val admin = new Thread(guarded {
      (0 until 5).foreach(_ => client.buildIndex("race", nlist = 4))
    })
    val writer = new Thread(guarded {
      (0 until 10).foreach { b =>
        client.upsert("race", (0 until 8).map { j =>
          val i = (b * 8 + j) % 80
          (f"k$i%03d", vec(i + b), Map("s" -> (i % 3).toString))
        }.toDF("key", "vec", "meta"))
      }
    })
    admin.start(); writer.start(); admin.join(); writer.join()
    failure.foreach(t => fail(s"concurrent writer threw: $t", t))

    def fresh(): Boolean = client.listIndexes("race")
      .filter(col("kind").startsWith("IVF")).collect()
      .exists(_.getAs[Boolean]("fresh"))
    def searchedKeys(): Set[String] =
      client.search("race", Array(1f, 1f, 1f, 1f), k = 200, nprobe = 4)
        .select("vector_key").collect().map(_.getString(0)).toSet
    val liveKeys = client.queryWhere("race", lit(true)).select("key")
      .collect().map(_.getString(0)).toSet

    // whatever interleaving happened: if the stamp claims freshness the
    // index must be COMPLETE (nprobe = nlist enumerates every live key);
    // if stale, search falls back to the exact scan — also complete
    assert(searchedKeys() == liveKeys,
      s"fresh=${fresh()}: search must cover exactly the live set")

    // no lost refresh: from a (re)built fresh index, one more commit must
    // roll it forward and the new row must be index-visible
    if (!fresh()) client.buildIndex("race", nlist = 4)
    assert(fresh(), "a quiesced build must stamp fresh")
    client.upsert("race", Seq(("kFINAL", vec(999), Map.empty[String, String]))
      .toDF("key", "vec", "meta"))
    assert(fresh(), "the commit after a build must keep the index fresh " +
      "(refresh rolled forward, not swallowed)")
    assert(searchedKeys().contains("kFINAL"),
      "the refreshed index must surface the new row through the cell prune")
  }
}
