package graft.index

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BinaryVectorFunctions.hamming_distance

/** BIN_IVF_FLAT — Milvus's index type for `BINARY_VECTOR` fields
  * (`index_type="BIN_IVF_FLAT"`, `metric_type="HAMMING"`): the IVF idea
  * over packed sign bits, extending the engine's binary family (declared
  * `knn_hamming`/`binary_jaccard`, SURVEY B7) from exact-only scans to a
  * partition-pruned at-rest layout.
  *
  * The coarse quantizer is K-MAJORITY over Hamming space: a centroid is
  * a bit pattern, and a cell's centroid is the BIT-WISE MAJORITY of its
  * members — per bit, majority vote minimizes the summed Hamming
  * distance independently, making it the exact Hamming analog of the
  * k-means mean. Training runs on a driver-side SAMPLE (the same
  * bounded-build pattern PQ codebook training uses — the sample caps the
  * iteration cost while assignment of the full corpus stays
  * distributed); assignment evaluates the fused XOR+popcount kernel
  * against the broadcast centers. Layout and search mirror
  * [[IvfIndex]]: cells partitioned by `centroidId` (directory-level
  * probe prune), the query probes the `nprobe` nearest centroids
  * driver-side (O(nlist) tiny Hamming distances), `nprobe = nlist`
  * degrades to the exact scan. Hamming is a true metric (triangle
  * inequality holds), so recall behaves like IVF_FLAT's: clustered
  * sign-patterns keep recall high at small nprobe.
  */
object BinIvfIndex {

  /** Trained centroids: row i = centroid i's packed bit pattern. */
  case class BinQuantizer(centers: Array[Array[Long]]) {
    require(centers.nonEmpty, "empty binary quantizer")
    def nlist: Int = centers.length
    def words: Int = centers(0).length

    /** Hamming distance between two packed patterns — driver-side twin
      * of the codegen'd kernel (same XOR+popcount arithmetic). */
    def hamming(a: Array[Long], b: Array[Long]): Int = {
      var s = 0; var i = 0
      while (i < a.length) { s += java.lang.Long.bitCount(a(i) ^ b(i)); i += 1 }
      s
    }

    /** The `nprobe` centroid ids nearest to `q` — ties to the lowest id,
      * the engine's one tie rule. */
    def probes(q: Array[Long], nprobe: Int): Seq[Int] =
      centers.indices
        .sortBy(i => (hamming(centers(i), q), i))
        .take(math.min(nprobe, nlist))
  }

  /** K-majority training over a driver-side sample. Deterministic: seeds
    * are the first k DISTINCT patterns in xxhash-of-index order, ties in
    * assignment go to the lowest center id, and a bit position with an
    * exact 50/50 split resolves to 0. Empty cells keep their previous
    * center (probes stay total, like [[IvfIndex.refreshCentroids]]). */
  def train(sample: Array[Array[Long]], k: Int, iters: Int = 10): BinQuantizer = {
    require(sample.nonEmpty, "cannot train on an empty sample")
    val words = sample(0).length
    // deterministic seed order: hash of the row index mixes the sample
    // without an RNG stream (same sample ⇒ same seeds)
    val order = sample.indices.sortBy(i =>
      (scala.util.hashing.MurmurHash3.arrayHash(sample(i)), i))
    val seeds = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
    val seen = scala.collection.mutable.Set.empty[Seq[Long]]
    order.iterator.takeWhile(_ => seeds.length < k).foreach { i =>
      val key = sample(i).toSeq
      if (!seen.contains(key)) { seen += key; seeds += sample(i).clone() }
    }
    var centers = seeds.toArray
    val q0 = BinQuantizer(centers)
    var it = 0
    var quant = q0
    while (it < iters) {
      val assign = sample.map(s => quant.probes(s, 1).head)
      val next = Array.tabulate(centers.length) { c =>
        val members = sample.indices.filter(assign(_) == c)
        if (members.isEmpty) centers(c).clone()
        else {
          val out = new Array[Long](words)
          var w = 0
          while (w < words) {
            var bit = 0
            var word = 0L
            while (bit < 64) {
              var ones = 0
              members.foreach { m =>
                if (((sample(m)(w) >>> bit) & 1L) == 1L) ones += 1
              }
              if (ones * 2 > members.length) word |= (1L << bit)
              bit += 1
            }
            out(w) = word
            w += 1
          }
          out
        }
      }
      centers = next
      quant = BinQuantizer(centers)
      it += 1
    }
    quant
  }

  /** Assign every row to its nearest centroid. The argmin runs in a
    * Scala udf over the broadcast centers — a BUILD/maintenance-path
    * kernel only (queries probe driver-side), the same trade
    * PorterStemmer makes: never in a query's hot path, so no codegen
    * Expression is warranted. Ties to the lowest id, matching
    * [[BinQuantizer.probes]] bit-for-bit so a row's cell is always
    * recomputable. */
  def assignCells(df: DataFrame, codesCol: String,
                  centersBc: Broadcast[Array[Array[Long]]]): DataFrame = {
    val nearest = udf { codes: Seq[Long] =>
      val q = codes.toArray
      val cs = centersBc.value
      var best = 0
      var bestD = Int.MaxValue
      var i = 0
      while (i < cs.length) {
        var d = 0; var w = 0
        while (w < q.length) { d += java.lang.Long.bitCount(cs(i)(w) ^ q(w)); w += 1 }
        if (d < bestD) { bestD = d; best = i }
        i += 1
      }
      best
    }
    df.withColumn("centroidId", nearest(col(codesCol)))
  }

  /** Fit on a driver-side sample of ≤ `sampleCap` rows (hash-ordered —
    * reproducible and spread), assign the full frame distributed. */
  def build(df: DataFrame, codesCol: String, nlist: Int,
            sampleCap: Int = 4096, iters: Int = 10): (DataFrame, BinQuantizer) = {
    val sample = df.select(col(codesCol))
      .orderBy(xxhash64(col(codesCol)))
      .limit(sampleCap)
      .collect().map(_.getSeq[Long](0).toArray)
    val quant = train(sample, math.min(nlist, sample.length), iters)
    val centersBc = df.sparkSession.sparkContext.broadcast(quant.centers)
    (assignCells(df, codesCol, centersBc).repartition(col("centroidId")), quant)
  }

  /** Persist clustered by cell — the same directory-prune contract as
    * [[IvfIndex.writeIndexed]]. */
  def writeIndexed(indexed: DataFrame, path: String): Unit =
    indexed.write.mode("overwrite").partitionBy("centroidId").parquet(path)

  def loadIndexed(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Top-k Hamming search probing `nprobe` cells: PartitionFilters →
    * fused XOR+popcount kernel → TakeOrderedAndProject. `nprobe = nlist`
    * is the exact fallback. */
  def searchHamming(indexed: DataFrame, quant: BinQuantizer,
                    codesCol: String, idCol: String, q: Array[Long],
                    k: Int, nprobe: Int): DataFrame = {
    val cells = quant.probes(q, nprobe)
    // parquet read-back types the words as NULLABLE elements, which the
    // fused kernel refuses (a null word would silently read as 0) — the
    // coalesce-transform re-establishes the non-null element type the
    // build wrote (no row ever carries one)
    val codes = transform(col(codesCol), w => coalesce(w, lit(0L)))
    indexed
      .filter(col("centroidId").isin(cells: _*))
      .select(col(idCol),
        hamming_distance(codes, typedLit(q)).as("dist"))
      .orderBy(col("dist"), col(idCol))
      .limit(k)
  }
}
