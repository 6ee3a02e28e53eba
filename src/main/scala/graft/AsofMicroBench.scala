package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measures the as-of join's union-sort form against the naive relational
  * encoding (inequality join + per-left-row argmax) — the number behind
  * BASELINE.md's as-of row.
  *
  * Synthetic shape chosen to expose the asymptotic gap at a size that
  * still finishes: 500 keys × 500 right rows × 100 left rows. The naive
  * encoding materializes every (left row, earlier right row) pair —
  * ~250 per left row here, ~12.5M intermediate rows — before the window
  * throws all but one away; the union-sort form shuffles exactly
  * |L|+|R| = 300k rows once. The ratio GROWS linearly with right-history
  * length: at a 100 TB event log with million-event keys the naive form
  * is simply not runnable. Both forms are verified equal first. */
object AsofMicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nKeys = 500L
    val left = spark.range(nKeys * 100).select(
      (col("id") % nKeys).as("k"),
      (pmod(xxhash64(col("id"), lit(1)), lit(1000000L))).as("lts"),
      col("id").as("lid"))
    val right = spark.range(nKeys * 500).select(
      (col("id") % nKeys).as("k"),
      (pmod(xxhash64(col("id"), lit(2)), lit(1000000L))).as("rts"),
      col("id").as("rid"))

    def unionSort(): DataFrame =
      graft.operators.AsofJoin.asofBackward(left, right, Seq("k"), "lts", "rts",
        Seq("rts", "rid"), rightTieBreak = Some("rid"))

    def naive(): DataFrame = {
      // inequality join then keep the latest right row per left row —
      // the encoding a SQL engine without ASOF support would run
      val w = Window.partitionBy(col("lid"))
        .orderBy(col("rts").desc, col("rid").desc)
      val matched = left.join(right,
          left("k") === right("k") && col("rts") <= col("lts"))
        .select(col("lid"), col("rts"), col("rid"))
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("lid"), col("rts").as("rts_m"), col("rid").as("rid_m"))
      left.join(matched, Seq("lid"), "left")
    }

    def canon(df: DataFrame, a: String, b: String): Set[(Long, Long, Long, Long, Long)] =
      df.collect().map(r => (
        r.getLong(df.columns.indexOf("k")), r.getLong(df.columns.indexOf("lts")),
        r.getLong(df.columns.indexOf("lid")),
        if (r.isNullAt(df.columns.indexOf(a))) -1L else r.getLong(df.columns.indexOf(a)),
        if (r.isNullAt(df.columns.indexOf(b))) -1L else r.getLong(df.columns.indexOf(b))
      )).toSet

    require(canon(unionSort(), "rts", "rid") == canon(naive(), "rts_m", "rid_m"),
      "both encodings must agree before timing them")

    def time(label: String)(f: => Long): Double = {
      f // warmup
      val t0 = System.nanoTime(); val n = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-12s ${sec}%7.2f s  ($n rows)")
      sec
    }
    val us = time("union-sort") { unionSort().count() }
    val nv = time("naive") { naive().count() }
    println(f"speedup ${nv / us}%.1fx (grows with right-history length)")
    spark.stop()
  }
}
