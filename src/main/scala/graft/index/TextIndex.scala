package graft.index

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** At-rest inverted-index (postings) layout for the BM25 lexical arm —
  * the text-side twin of [[IvfIndex]]'s at-rest treatment of the vector
  * arm. The reference ships lexical `search.py` next to vector
  * `search.py` (`s3vectors-app/search.py`); production retrieval over a
  * 100 TB corpus cannot re-derive postings from raw text per query, so
  * the tokenize→tf pass runs ONCE at build and queries touch only the
  * queried terms' postings.
  *
  * Layout under `path/`:
  *   - `postings/bucket=N/` — parquet (id, term, tf, dlen) partitioned by
  *     `bucket = pmod(xxhash64(term), buckets)`. A query computes its
  *     terms' buckets driver-side, so the scan is a parquet PARTITION
  *     prune to ≤|terms| buckets plus a pushed `term IN (...)` filter
  *     within them — I/O scales with Σ df(term), not the corpus. Term
  *     dirs are hash buckets (bounded count), never raw-term dirs (an
  *     open vocabulary would create millions of directories).
  *   - `stats/` — one row (n_docs, avgdl), broadcast at query time.
  *   - `META` — bucket count + postings schema DDL, read driver-side so
  *     queries skip parquet footer inference (a pure-latency Spark job
  *     per interactive search otherwise).
  *
  * Score parity: [[bm25]] and the raw-text path
  * (`TextQueries.bm25`) share [[scoreExpr]] verbatim — same tf/df/dlen
  * integers, same stats, same round(6) — so riding the index never
  * changes a result hash. Version stamping/staleness is the CLIENT's
  * concern (`GraftClient.buildTextIndex` stamps VERSION last, exactly
  * like the IVF build), keeping this module a pure layout.
  */
object TextIndex {

  /** One shared BM25 per-(doc, term) score term — referenced by NAME
    * (`tf`, `df`, `dlen`, `n_docs`, `avgdl`), so both the raw-text plan
    * and the postings plan bind it to their own columns. Lucene-style
    * BM25 with the +1 idf floor. */
  private[graft] def scoreExpr(k1: Double, b: Double): Column =
    log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
      col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dlen") / col("avgdl")))

  /** The shared score aggregation tail: per-doc sum, round(6) (absorbs
    * engine summation-order ulps), deterministic top-k.
    *
    * `restrictTo` (a 1-column frame of ids) narrows the CANDIDATES via a
    * semi-join while df/n_docs/avgdl — already bound into `scored` —
    * stay whole-corpus: the Lucene/Elasticsearch filtered-query
    * semantic (a metadata filter gates which docs may rank; it never
    * shifts idf). Joining BEFORE the per-doc sum keeps the agg shuffle
    * at Σ df(term ∩ passing) rows, and because each doc's score is
    * independent of the others given corpus stats, restrict-then-sum
    * equals sum-then-restrict.
    *
    * Shape at scale: semi-join is dup-safe with no distinct pass. When
    * the id set is small it broadcasts; when it is a large filtered
    * slice of the corpus, the shuffle moves the TERM-PRUNED postings
    * (Σ df) plus the id keys — never corpus-sized postings. A filtered
    * query at volume already paid a metadata scan to produce the ids,
    * so the key shuffle is the same order as that scan's output. */
  private[graft] def scoreTail(scored: DataFrame, idCol: String, k: Int,
                               k1: Double, b: Double,
                               restrictTo: Option[DataFrame] = None): DataFrame =
    restrictTo.fold(scored)(ids => scored.join(
        ids.toDF(idCol), Seq(idCol), "left_semi"))
      .groupBy(col(idCol))
      .agg(round(sum(scoreExpr(k1, b)), 6).as("bm25"))
      .orderBy(desc("bm25"), col(idCol))
      .limit(k)

  /** `pmod(xxhash64(term), buckets)` evaluated driver-side — MUST match
    * the executor-side partition expression in [[build]] bit-for-bit,
    * so it reuses Catalyst's own XxHash64 (seed 42, like the SQL
    * function) instead of reimplementing the hash. */
  private[graft] def termBucket(term: String, buckets: Int): Int = {
    val h = org.apache.spark.sql.catalyst.expressions.XxHash64(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal.create(
          term, org.apache.spark.sql.types.StringType)), 42L)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Long]
    (((h % buckets) + buckets) % buckets).toInt
  }

  private def metaPath(path: String) = java.nio.file.Paths.get(path, "META")

  // META: line 1 buckets, line 2 postings schema DDL, line 3 the live
  // generation token (postings-<g>/stats-<g> dir suffix)
  private def readMeta(path: String): (Int, StructType, String) = {
    val lines = new String(java.nio.file.Files.readAllBytes(metaPath(path)),
      "UTF-8").split("\n", 3)
    require(lines.length == 3,
      s"$path/META is not a generation-format text index — rebuild it " +
        "(TextIndex.build / GraftClient.buildTextIndex)")
    (lines(0).trim.toInt, StructType.fromDDL(lines(1)), lines(2).trim)
  }

  /** Build (or rebuild) the postings layout for `docs` at `path`.
    * Tokenization is the whitespace split every other C14 operator uses;
    * tf/dlen/n_docs/avgdl are computed EXACTLY as the raw-text BM25 plan
    * computes them, so the two paths score identically. One corpus-sized
    * explode→groupBy shuffle at build time buys Σ df(term) reads per
    * query forever after.
    *
    * Publish protocol: each build writes a fresh GENERATION
    * (`postings-<g>/`, `stats-<g>/`) and then swaps META — which names
    * the live generation — with a temp-file + ATOMIC_MOVE. A reader
    * resolves META first, so it only ever sees a COMPLETE generation;
    * rebuilding in place (mode=overwrite on a shared dir) would let a
    * concurrent query score from half-written postings while the
    * version stamp still reads fresh. A crash mid-build strands an
    * unreferenced generation dir (swept by the next successful build)
    * and leaves the old index serving. */
  def build(docs: DataFrame, idCol: String, textCol: String, path: String,
            buckets: Int = 64): Unit = {
    require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
    // n_docs/avgdl clash at QUERY time (the stats crossJoin), __ws at
    // build time — all three would otherwise produce an expensively-built
    // index that throws AMBIGUOUS_REFERENCE on first use
    val reserved = Seq("term", "tf", "dlen", "bucket", "bm25", "df",
      "n_docs", "avgdl", "__ws")
    require(!reserved.contains(idCol),
      s"idCol '$idCol' collides with a postings/query column " +
        s"(${reserved.mkString(", ")})")
    // builds on one path serialize on the layout's lock (same mechanism
    // as the keyed store's commits): two concurrent builds would
    // otherwise each sweep the OTHER's in-flight generation — the loser
    // could swap META to a directory the winner just deleted, wedging
    // every read until a manual rebuild. Serialized, the last build's
    // generation wins and the sweep only ever removes superseded ones.
    graft.streaming.BucketedKeyedCollection.withCommitLock(
        java.nio.file.Paths.get(path)) {
    val gen = java.util.UUID.randomUUID.toString.take(8)
    // persisted: the stats aggregate and the postings write both consume
    // this frame — uncached, each would re-run the caller's full upstream
    // plan (possibly joins/embedding) plus the tokenize, making the
    // "one corpus-sized pass" promise two. (Stats can't derive from the
    // postings: a null-text doc has no postings row but DOES count in
    // n_docs, and the raw-scoring path counts it — parity requires the
    // same source.)
    val withLen = docs.select(col(idCol), split(col(textCol), " ").as("__ws"))
      .select(col(idCol), size(col("__ws")).cast("long").as("dlen"), col("__ws"))
      .persist()
    try {
      val stats = withLen.agg(count(lit(1)).as("n_docs"), avg(col("dlen")).as("avgdl"))
      val postings = withLen
        .select(col(idCol), col("dlen"), explode(col("__ws")).as("term"))
        .groupBy(col(idCol), col("term"))
        // first(dlen) is deterministic: dlen is functionally dependent on id
        .agg(count(lit(1)).as("tf"), first(col("dlen")).as("dlen"))
        .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int"))
      postings.write.mode("overwrite").partitionBy("bucket")
        .parquet(s"$path/postings-$gen")
      stats.coalesce(1).write.mode("overwrite").parquet(s"$path/stats-$gen")
      val dir = java.nio.file.Paths.get(path)
      val tmp = java.nio.file.Files.createTempFile(dir, ".meta-", "")
      java.nio.file.Files.write(tmp,
        s"$buckets\n${postings.schema.toDDL}\n$gen".getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, metaPath(path),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // sweep superseded/crash-stranded generations (never the live one)
      // plus any crash-stranded .meta- temps — safe here because the
      // whole build holds the path's lock. A reader holding a LAZY frame
      // over a superseded generation loses it here — same
      // reader-validity window as the keyed store's vacuum;
      // resolve-then-collect (what bm25's callers do) is unaffected.
      val listing = java.nio.file.Files.list(dir)
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala.map(_.getFileName.toString)
          .filter(n => ((n.startsWith("postings-") || n.startsWith("stats-")) &&
            !n.endsWith(s"-$gen")) || n.startsWith(".meta-"))
          .toSeq
          .foreach(n => graft.streaming.BucketedKeyedCollection.deleteTree(
            dir.resolve(n)))
      } finally listing.close()
    } finally withLen.unpersist()
    }
  }

  /** Whether a postings layout exists at `path`. */
  def exists(path: String): Boolean = java.nio.file.Files.exists(metaPath(path))

  /** BM25 top-`k` for `terms`, riding the at-rest postings: partition
    * prune to the terms' hash buckets, pushed `term IN` filter, df as a
    * tiny second aggregate over the ALREADY-pruned postings (identical
    * to the global df for those terms), stats broadcast from the 1-row
    * table. Emits (id, bm25) exactly like the raw-text plan.
    *
    * `restrictTo` (1-column frame of ids) gates CANDIDATES only — df and
    * the stats row are resolved from the unrestricted postings first, so
    * a metadata-filtered query scores with corpus idf (see
    * [[scoreTail]]); the semi-join lands on the already term-pruned
    * Σ df(term) rows, never the corpus. */
  def bm25(spark: SparkSession, path: String, terms: Seq[String],
           k: Int = 15, k1: Double = 1.2, b: Double = 0.75,
           restrictTo: Option[DataFrame] = None): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(exists(path), s"no text index at $path — run build first")
    val (buckets, schema, gen) = readMeta(path)
    val idCol = schema.fields.head.name
    val bucketIds = terms.map(termBucket(_, buckets)).distinct
    val matching = spark.read.schema(schema).parquet(s"$path/postings-$gen")
      .filter(col("bucket").isin(bucketIds: _*) && col("term").isin(terms: _*))
    val dfT = matching.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = spark.read.schema("n_docs BIGINT, avgdl DOUBLE")
      .parquet(s"$path/stats-$gen")
    scoreTail(
      matching.join(dfT, Seq("term")).crossJoin(broadcast(stats)),
      idCol, k, k1, b, restrictTo)
  }
}
