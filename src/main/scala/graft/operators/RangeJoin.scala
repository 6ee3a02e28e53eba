package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval/tolerance) join — pair rows whose ordering values lie
  * within `tolerance` of each other, the second temporal operator Spark's
  * join family lacks natively (named alongside as-of in every temporal-SQL
  * survey; DuckDB runs it as an IEJoin). Spark's own planner turns the
  * naive encoding (`|l.ts - r.ts| <= tol` as a join condition, possibly
  * under an equi-key) into a nested-loop per key group — quadratic in
  * history length.
  *
  * This is the banded form: bucketize both sides by `band = floor(ts /
  * tolerance)`; any qualifying pair's bands differ by at most 1, so
  * exploding ONE side into (band-1, band, band+1) turns the range
  * predicate into an EQUI-join on (key…, band) plus a cheap exact filter.
  * Cost: one shuffle of |L| + 3|R| rows — linear, skew-bounded by band
  * population, no per-key quadratic blowup. Each true pair is produced
  * exactly once (the left band is a single value; the right expansion
  * hits it at most once).
  */
object RangeJoin {

  /** Inner tolerance join: rows of `left` × `right` with equal `by` keys
    * and `|left.leftTs - right.rightTs| <= tolerance` (numeric columns —
    * for timestamps pass e.g. microseconds). Both inputs' columns pass
    * through; names must not collide. */
  def within(left: DataFrame, right: DataFrame, by: Seq[String],
             leftTs: String, rightTs: String, tolerance: Long): DataFrame = {
    require(tolerance > 0, "tolerance must be positive")
    val collide = left.columns.toSet.intersect(right.columns.toSet) -- by.toSet
    require(collide.isEmpty, s"column names collide across sides: $collide")

    // Integral `div`, NOT `/`: Column./ is double division, and µs-epoch
    // values (~1.7e18) exceed double's 2^53 exact range — a float-shifted
    // band near a boundary could put a qualifying pair 2 bands apart,
    // past the ±1 expansion. Truncating division keeps the ≤1-band
    // property for qualifying pairs: its steps are at multiples of the
    // tolerance (the interval around zero is 2·tol wide, which only
    // merges bands, never splits them).
    def band(name: String): Column = expr(s"CAST(`$name` AS BIGINT) div CAST($tolerance AS BIGINT)")
    val l = left.withColumn("__band", band(leftTs))
    val r = right.withColumn("__band",
      explode(array(band(rightTs) - 1, band(rightTs), band(rightTs) + 1)))
    l.join(r, by :+ "__band")
      .filter(abs(col(leftTs) - col(rightTs)) <= tolerance)
      .drop("__band")
  }
}
