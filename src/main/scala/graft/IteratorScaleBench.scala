package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Iterator surfaces at volume — the measured counterpart of
  * IteratorSpec's correctness checks, on the geometry the deep-page
  * cursor prune exists for: clustered vectors, a full distance-ordered
  * drain through `searchIterator`.
  *
  * What the numbers must show (recorded in BASELINE.md):
  *   - the drain's per-page cost FALLS as the cursor advances (cells
  *     whose max possible distance sits below the cursor are skipped —
  *     without the prune every page re-scans all probed cells);
  *   - `queryIterator` drains a filtered export at a steady rows/s with
  *     constant per-page cost (keyset cursor, no offset window).
  *
  *   SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.IteratorScaleBench 200000"
  */
object IteratorScaleBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val dim = 64
    val clusters = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // `clusters` tight blobs spread on a line in dim-space: cluster c
    // centers at x0 = 3c, per-point jitter ±0.1 — cells ≈ clusters after
    // the k-means build, radii ≈ 0.2, inter-cluster gap 3: the prune's
    // home turf (and realistic — embeddings cluster by topic/source).
    val vecs = spark.range(n).mapPartitions { it =>
      it.map { id =>
        val c = (id % clusters).toInt
        val v = new Array[Float](dim)
        var i = 0
        while (i < dim) {
          v(i) = (if (i == 0) 3.0 * c else 0.0).toFloat +
            (math.sin(id * 1.7 + i * 0.91) * 0.1).toFloat
          i += 1
        }
        (id, v)
      }
    }.toDF("vec_id", "vec")

    val root = java.nio.file.Files.createTempDirectory("graft-iter-scale").toString
    val client = new graft.api.GraftClient(spark, root)
    client.createCollection("it", dim = dim, metric = "l2", indexType = "IVF_FLAT")
    val t0 = System.nanoTime()
    client.upsert("it", vecs.select(col("vec_id").cast("string").as("key"),
      col("vec"), map(lit("p"), pmod(col("vec_id"), lit(7)).cast("string")).as("meta")))
    client.buildIndex("it", nlist = clusters)
    val setupSec = (System.nanoTime() - t0) / 1e9

    // full distance-ordered drain; query sits at cluster 0 so the cursor
    // sweeps cluster by cluster and the prune retires them in order
    val q = new Array[Float](dim)
    val batch = math.max(1000, (n / 100).toInt)
    val pageSec = scala.collection.mutable.ArrayBuffer.empty[Double]
    val flatKeys = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = client.searchIterator("it", q, batchSize = batch, nprobe = clusters)
    val tD = System.nanoTime()
    // the iterator PREFETCHES in hasNext — time the full hasNext+next
    // span per page, not just next()
    var lastT = System.nanoTime()
    while (it.hasNext) {
      it.next().foreach(r => flatKeys += r.getString(0))
      val now = System.nanoTime()
      pageSec += (now - lastT) / 1e9
      lastT = now
    }
    val drainSec = (System.nanoTime() - tD) / 1e9
    require(flatKeys.length == n, s"drain lost rows: ${flatKeys.length} of $n")
    val early = pageSec.take(5).sum / math.min(5, pageSec.length)
    val late = pageSec.takeRight(5).sum / math.min(5, pageSec.length)

    // prune engagement at depth: cells provably below a late cursor
    val lateCursor = 3.0 * (clusters - 2) // past all but the last 2 clusters
    val prunedCells = client.cursorPrunedCellCount("it", q, lateCursor)

    // queryIterator: filtered export drain (keyset cursor on key)
    val tQ = System.nanoTime()
    var qRows = 0L
    val qit = client.queryIterator("it",
      element_at(col("meta"), "p") === "3", batchSize = batch)
    while (qit.hasNext) qRows += qit.next().length
    val querySec = (System.nanoTime() - tQ) / 1e9

    // SQ8 unbounded drain (r10): the same corpus under IVF_SQ8, drained
    // in full through the quantized-keyset margin drain — depths far
    // past the former 16384 cap, and the key sequence must equal the
    // FLAT drain's exactly (the margin emits in exact-distance order)
    client.createCollection("itq", dim = dim, metric = "l2", indexType = "IVF_SQ8")
    client.upsert("itq", vecs.select(col("vec_id").cast("string").as("key"),
      col("vec"), map(lit("p"), pmod(col("vec_id"), lit(7)).cast("string")).as("meta")))
    client.buildIndex("itq", nlist = clusters)
    val sq8Keys = scala.collection.mutable.ArrayBuffer.empty[String]
    val sit = client.searchIterator("itq", q, batchSize = batch, nprobe = clusters)
    val tS = System.nanoTime()
    while (sit.hasNext) sit.next().foreach(r => sq8Keys += r.getString(0))
    val sq8Sec = (System.nanoTime() - tS) / 1e9
    val sq8Parity = sq8Keys == flatKeys
    require(sq8Keys.length == n,
      s"SQ8 drain lost rows: ${sq8Keys.length} of $n")
    require(sq8Parity, "SQ8 drain order diverged from the FLAT drain")

    // IVF_PQ full drain (r12): the same corpus under IVF_PQ — the drain
    // now rides the ADC quantized-keyset margin drain (stage 1 pages m
    // bytes/row through the per-cell LUT kernel, held back by the
    // MEASURED per-cell reconstruction bound pq_recon maintains), so it
    // must both beat the r11 float-cell drain cost AND keep exact order.
    // Parity vs the FLAT key sequence is the correctness bar.
    client.createCollection("itpq", dim = dim, metric = "l2", indexType = "IVF_PQ")
    client.upsert("itpq", vecs.select(col("vec_id").cast("string").as("key"),
      col("vec"), map(lit("p"), pmod(col("vec_id"), lit(7)).cast("string")).as("meta")))
    client.buildIndex("itpq", nlist = clusters, sampleFraction = 0.1)
    val pqKeys = scala.collection.mutable.ArrayBuffer.empty[String]
    val pit = client.searchIterator("itpq", q, batchSize = batch, nprobe = clusters)
    val tPq = System.nanoTime()
    while (pit.hasNext) pit.next().foreach(r => pqKeys += r.getString(0))
    val pqDrainSec = (System.nanoTime() - tPq) / 1e9
    val pqParity = pqKeys == flatKeys
    require(pqKeys.length == n, s"PQ drain lost rows: ${pqKeys.length} of $n")
    require(pqParity, "PQ drain order diverged from the FLAT drain")

    // SQ8 distance-PLATEAU drain (r11): n/4 IDENTICAL vectors — the
    // adversarial geometry for the margin drain's hold-back heap. The
    // capped heap must flip the stream to the exact re-rank path and
    // still drain everything in exact (key) order with bounded driver
    // memory; the peak held size is counter-asserted against the cap.
    val nDup = n / 4
    client.createCollection("itdup", dim = dim, metric = "l2",
      indexType = "IVF_SQ8")
    client.upsert("itdup", spark.range(nDup)
      .selectExpr("lpad(cast(id as string), 8, '0') AS key",
        s"array_repeat(1.0f, $dim) AS vec", "map() AS meta"))
    client.buildIndex("itdup", nlist = 2)
    graft.api.GraftClient.resetDrainHeldPeak()
    val dupBatch = 512 // chunk 2048, cap max(8*2048, 4096) = 16384 < nDup
    var dupCount = 0L
    var dupOrdered = true
    var prevKey = ""
    val dit = client.searchIterator("itdup", q, batchSize = dupBatch, nprobe = 2)
    val tP = System.nanoTime()
    while (dit.hasNext) dit.next().foreach { r =>
      val k = r.getString(0)
      if (k <= prevKey && dupCount > 0) dupOrdered = false
      prevKey = k; dupCount += 1
    }
    val plateauSec = (System.nanoTime() - tP) / 1e9
    val heldPeak = graft.api.GraftClient.drainHeldPeakValue
    val heldCap = 8 * dupBatch * 4 + dupBatch * 4
    require(dupCount == nDup,
      s"plateau drain lost rows: $dupCount of $nDup")
    require(dupOrdered, "plateau drain emitted out of key order — " +
      "tie-break parity broken through the degrade switch")
    require(heldPeak <= heldCap,
      s"hold-back heap peaked at $heldPeak > $heldCap — plateau " +
        "accumulated on the driver")

    println(s"""{"bench":"iterator_scale","n":$n,"clusters":$clusters,""" +
      s""""setup_sec":$setupSec,"drain_sec":$drainSec,"pages":${pageSec.length},""" +
      s""""early_page_sec":$early,"late_page_sec":$late,""" +
      s""""late_cursor_pruned_cells":$prunedCells,""" +
      s""""query_drain_rows":$qRows,"query_drain_sec":$querySec,""" +
      s""""sq8_drain_sec":$sq8Sec,"sq8_drained":${sq8Keys.length},""" +
      s""""sq8_parity":$sq8Parity,""" +
      s""""pq_drain_sec":$pqDrainSec,"pq_parity":$pqParity,""" +
      s""""plateau_n":$nDup,"plateau_drain_sec":$plateauSec,""" +
      s""""plateau_held_peak":$heldPeak,"plateau_held_cap":$heldCap}""")
    graft.streaming.BucketedKeyedCollection.deleteTree(
      java.nio.file.Paths.get(root))
    spark.stop()
  }
}
