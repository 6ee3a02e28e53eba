package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.index.BinIvfIndex
import graft.functions.BinaryVectorFunctions._

/** BIN_IVF_FLAT: k-majority training must be deterministic and recover
  * planted sign-clusters, full probe must equal brute force, the pruned
  * probe must keep recall on clustered codes while actually pruning the
  * directory scan, and degenerate inputs must not wedge the build. */
class BinIvfSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("binivf-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  /** Planted sign-clusters: `clusters` base patterns of `words`×64 bits,
    * each member flipping `noise` deterministic bit positions. */
  private def planted(n: Int, words: Int, clusters: Int,
                      noise: Int): Seq[(Long, Array[Long])] =
    (0 until n).map { i =>
      val c = i % clusters
      val base = Array.tabulate(words) { w =>
        // spread base patterns far apart: distinct mixes per (cluster, word)
        var z = (c * 1000003L + w * 97L) + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z ^ (z >>> 27)
      }
      var f = 0
      while (f < noise) {
        val pos = math.abs((i * 31 + f * 7) % (words * 64))
        base(pos / 64) ^= (1L << (pos % 64))
        f += 1
      }
      (i.toLong, base)
    }

  private def bruteTopK(rows: Seq[(Long, Array[Long])], q: Array[Long],
                        k: Int): Seq[Long] =
    rows.map { case (id, c) =>
      var d = 0; var w = 0
      while (w < q.length) { d += java.lang.Long.bitCount(c(w) ^ q(w)); w += 1 }
      (d, id)
    }.sortBy(identity).take(k).map(_._2)

  test("k-majority training is deterministic and recovers planted clusters") {
    val rows = planted(400, 2, 4, noise = 3)
    val sample = rows.map(_._2).toArray
    val q1 = BinIvfIndex.train(sample, 4)
    val q2 = BinIvfIndex.train(rows.reverse.map(_._2).toArray, 4)
    (0 until 4).foreach { c =>
      assert(q2.centers.exists(_.sameElements(q1.centers(c))),
        "training must be content-determined, not input-order-determined")
    }
    // each planted base pattern should be (close to) some center: every
    // member assigns with its cluster-mates
    val assign = rows.map { case (_, c) => q1.probes(c, 1).head }
    (0 until 4).foreach { c =>
      val members = rows.indices.filter(_ % 4 == c).map(assign)
      assert(members.distinct.size == 1,
        s"cluster $c scattered across cells ${members.distinct}")
    }
  }

  test("full probe equals brute force; pruned probe keeps recall and prunes IO") {
    import spark.implicits._
    val rows = planted(500, 2, 4, noise = 3)
    val df = rows.toDF("id", "codes")
    val (indexed, quant) = BinIvfIndex.build(df, "codes", nlist = 4)
    val dir = java.nio.file.Files.createTempDirectory("binivf").toString
    try {
      BinIvfIndex.writeIndexed(indexed, dir)
      val atRest = BinIvfIndex.loadIndexed(spark, dir)
      val q = rows(17)._2
      val full = BinIvfIndex.searchHamming(atRest, quant, "codes", "id",
        q, k = 10, nprobe = 4).collect().map(_.getLong(0)).toSeq
      assert(full == bruteTopK(rows, q, 10), "full probe must be exact")

      val pruned = BinIvfIndex.searchHamming(atRest, quant, "codes", "id",
        q, k = 10, nprobe = 1)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("centroidId"),
        s"probe must prune cell directories:\n${plan.take(1200)}")
      val prunedIds = pruned.collect().map(_.getLong(0)).toSeq
      assert(prunedIds == full,
        "on tight planted clusters nprobe=1 must recover the exact top-k")
    } finally TestDirs.deleteRec(java.nio.file.Paths.get(dir))
  }

  test("kernel-vs-driver Hamming parity and degenerate builds") {
    import spark.implicits._
    // the distributed assignment (fused kernel arithmetic) must agree
    // with the driver-side quantizer on every row
    val rows = planted(100, 3, 5, noise = 2)
    val df = rows.toDF("id", "codes")
    val (indexed, quant) = BinIvfIndex.build(df, "codes", nlist = 5)
    indexed.collect().foreach { r =>
      val c = r.getSeq[Long](1).toArray
      assert(r.getInt(2) == quant.probes(c, 1).head,
        s"row ${r.getLong(0)}: executor assignment != driver probe")
    }
    // nlist above the distinct-pattern count must clamp, not wedge
    val tiny = Seq((1L, Array(5L)), (2L, Array(5L)), (3L, Array(9L)))
      .toDF("id", "codes")
    val (_, qTiny) = BinIvfIndex.build(tiny, "codes", nlist = 8)
    assert(qTiny.nlist <= 3)
    // all-identical corpus: one effective center, search still exact
    val same = Seq((1L, Array(7L)), (2L, Array(7L))).toDF("id", "codes")
    val (idx2, q2) = BinIvfIndex.build(same, "codes", nlist = 4)
    val got = BinIvfIndex.searchHamming(idx2, q2, "codes", "id",
      Array(7L), k = 2, nprobe = q2.nlist).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(1L, 2L))
  }
}
