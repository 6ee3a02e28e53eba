package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the temporal operator Spark's join family lacks (native in
  * DuckDB as `ASOF JOIN`, in kdb+, in pandas `merge_asof`): for every left
  * row, attach THE latest right row with `right.ts <= left.ts` in the same
  * key group. The naive relational encoding is an inequality join plus an
  * argmax — a range-explosion (every left row matches its whole right
  * history, then a window throws almost all of it away), quadratic per key
  * group.
  *
  * This implementation is the union-sort trick: tag both sides, union on
  * (key, ts, side), and run ONE window per key ordered by (ts, side) that
  * carries the last-seen right payload forward (`last(_, ignoreNulls)` over
  * a running frame). Left rows then read their as-of match directly.
  *
  * Scale shape: one shuffle of |L| + |R| rows on the key, one
  * sort-within-partition — the same cost as a plain equi-join of the two
  * inputs, with NO intermediate blowup; per-key frames never materialize
  * more than the running payload. This beats the inequality-join encoding
  * by the average right-history length (unbounded at 100 TB).
  *
  * Correctness details:
  *   - right rows sort BEFORE left rows at equal ts (side 0 < 1), giving
  *     the standard `<=` as-of semantics;
  *   - the right payload travels as ONE struct, so a right row whose
  *     payload columns are themselves null still matches (last+ignoreNulls
  *     skips null STRUCTS — absent rows — not null fields);
  *   - ties among right rows on (key, ts) resolve by `rightTieBreak`
  *     (largest wins), making the result deterministic where engines like
  *     DuckDB leave it undefined.
  */
object AsofJoin {

  /** Backward (most common) as-of join.
    *
    * @param left         probe side; all its columns pass through
    * @param right        reference side
    * @param by           equi-key columns present on both sides
    * @param leftTs       left ordering column name
    * @param rightTs      right ordering column name (same orderable type)
    * @param rightPayload right columns to attach (must not collide with
    *                     left column names)
    * @param rightTieBreak deterministic winner among right rows tied on
    *                      (by, ts): the row with the LARGEST value wins
    */
  def asofBackward(left: DataFrame, right: DataFrame, by: Seq[String],
                   leftTs: String, rightTs: String,
                   rightPayload: Seq[String],
                   rightTieBreak: Option[String] = None): DataFrame = {
    require(by.nonEmpty, "as-of join needs at least one key column")
    val collide = rightPayload.toSet.intersect(left.columns.toSet)
    require(collide.isEmpty, s"right payload columns collide with left: $collide")
    // the union-sort bookkeeping columns would silently REPLACE same-named
    // input columns via withColumn — reject, mirroring the payload check
    val reserved = Set("__ts", "__side", "__tie", "__r", "__match")
    val reservedHit = (left.columns ++ right.columns).toSet.intersect(reserved)
    require(reservedHit.isEmpty,
      s"input columns collide with as-of bookkeeping names: $reservedHit")
    val leftCols = left.columns.toSeq

    // tie-break keeps its ORIGINAL type (a string cast would order
    // numerics lexicographically); the left side carries a typed null —
    // left rows never compare ties against right rows, __side decides
    val tieType = rightTieBreak.map(c => right.schema(c).dataType)
      .getOrElse(org.apache.spark.sql.types.StringType)
    val l = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(tieType))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(rightPayload.map(col): _*).schema.fields)))
    // SQL as-of semantics: a null timestamp never satisfies `ts <= ts`
    // (NULL comparison), so null-ts right rows match nothing — without
    // this filter Spark's nulls-first sort would make them a universal
    // fallback match. Null-ts LEFT rows need no handling: they sort
    // before every (filtered) right row and read a null payload.
    val r = right.filter(col(rightTs).isNotNull).select(
      (by.map(col) :+ col(rightTs).as("__ts")) ++ Seq(
        lit(0).as("__side"),
        rightTieBreak.fold(lit(null).cast(tieType))(col).as("__tie"),
        struct(rightPayload.map(col): _*).as("__r")): _*)
    // left rows carry their full row; right rows carry only key + payload —
    // the union schema is the left schema + the bookkeeping columns
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    matched.select(leftCols.map(col) ++
      rightPayload.map(p => col(s"__match.$p").as(p)): _*)
  }
}
