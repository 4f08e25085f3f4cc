package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the reference engine lacks (SURVEY §2.3 notes no
  * theta/range/as-of joins exist there) but every event-sourced training
  * pipeline needs: attach feature state "as of" each example's timestamp,
  * or pair events that fall within a bounded time band.
  *
  * Both operators are composed from Spark's own shuffle/window machinery —
  * no inequality nested-loop join ever materializes:
  *
  *  - [[asOf]] is the union-then-running-window form: tag both inputs,
  *    union, one shuffle on the keys, one in-partition sort, and a running
  *    `last(..., ignoreNulls)` carries the most recent right row onto each
  *    left row. Cost is identical to a sort-merge join of the union —
  *    linear scan after sort, O(|L|+|R|) state, no per-row backward probe.
  *  - [[timeBandJoin]] buckets both sides to `floor(ts / band)` and joins
  *    left bucket b to right buckets {b, b+1} by equi-key, then applies the
  *    exact band predicate. Shuffle volume is 2×|R|, never |L|×|R|; the
  *    bucket width bounds each hash cell so AQE's skew split applies.
  *
  * Scale posture: both shuffle by the join keys, so a single pathological
  * key (one user with a billion events) concentrates in one task — the
  * standard remedy (salting the band join's bucket key, or splitting the
  * as-of window by coarse time range then stitching boundaries) composes on
  * top without changing either contract.
  */
object AsOfJoin {

  /** Backward (default) or forward as-of join.
    *
    * For each left row: the single right row with the greatest
    * `(rightTs, tieBreaker)` such that `rightTs <= leftTs` (backward), or
    * the least such that `rightTs >= leftTs` (forward), matched per
    * equi-`keys`; left rows with no match keep null right columns (left
    * outer semantics). `tolerance` additionally bounds `|leftTs - rightTs|`
    * — a match farther away than `tolerance` is nulled out, matching the
    * pandas/DuckDB as-of tolerance contract.
    *
    * The tie-breaker makes the result total-order deterministic when two
    * right rows share one timestamp (an oracle can replay it exactly);
    * pass the right table's unique id column.
    *
    * Timestamps are compared as the raw column values — pass the same type
    * (timestamp or epoch long) on both sides. `tolerance` is in the
    * timestamp's native unit when numeric, or an interval expression for
    * timestamps.
    *
    * Output: every left column, plus each `rightCols` column renamed with
    * `rightPrefix`.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      tieBreaker: String,
      rightPrefix: String = "right_",
      tolerance: Option[Column] = None,
      forward: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "graft: asOf needs at least one equi-key")
    require(rightCols.nonEmpty, "graft: asOf needs right columns to carry")
    val payloadCols = (rightCols :+ rightTs).distinct
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast("long").as("__tie"),
        struct(left.columns.map(col).toIndexedSeq: _*).as("__l"),
        lit(null).cast(structType(right, payloadCols)).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        col(tieBreaker).cast("long").as("__tie"),
        lit(null).cast(structType(left, left.columns.toIndexedSeq)).as("__l"),
        struct(payloadCols.map(col): _*).as("__r")): _*)
    // Right rows sort before left rows at equal ts (side 0 < 1), so an
    // equal-timestamp right row IS visible to the left row (inclusive
    // boundary, both directions). Among equal-ts right rows the larger
    // tie-breaker wins backward / smaller wins forward — the running
    // last() keeps whichever sorts latest.
    val ord: Seq[Column] =
      if (forward) Seq(col("__ts").desc, col("__side").asc, col("__tie").desc)
      else Seq(col("__ts").asc, col("__side").asc, col("__tie").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val gap =
      if (forward) col("__m").getField(rightTs) - col("__ts")
      else col("__ts") - col("__m").getField(rightTs)
    val matched = tolerance match {
      case Some(tol) => when(col("__m").isNotNull && gap <= tol, col("__m"))
      case None => col("__m")
    }
    val out = carried.withColumn("__m", matched)
    out.select(
      left.columns.map(c => col("__l").getField(c).as(c)).toIndexedSeq ++
        payloadCols.map(c => col("__m").getField(c).as(s"$rightPrefix$c")): _*)
  }

  /** Equi-key time-band join: all (left, right) pairs with
    * `rightTs - leftTs` in `[0, band]` (units of the epoch columns, e.g.
    * seconds for `unix_timestamp`). Both timestamp columns must be numeric
    * epochs — convert timestamps first; integer bucket arithmetic keeps the
    * bucketing exact.
    *
    * The left side fans out to its bucket and the next one (a right match
    * ahead of `leftTs` by at most `band` lands in one of the two), the join
    * is a plain equi-join on `(keys, bucket)`, and the exact predicate
    * filters the residue. Output: left columns prefixed `l_`, right columns
    * prefixed `r_` (keys once, unprefixed).
    */
  def timeBandJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      band: Long): DataFrame = {
    require(band > 0, s"graft: timeBandJoin band must be positive, got $band")
    require(keys.nonEmpty, "graft: timeBandJoin needs at least one equi-key")
    // Exact floor division: (x - pmod(x, band)) is a long multiple of band,
    // so the double division returns the integer bucket exactly (no
    // truncate-toward-zero or large-epoch double-rounding hazards).
    def bucket(ts: Column): Column = {
      val x = ts.cast("long")
      ((x - pmod(x, lit(band))) / band).cast("long")
    }
    val l = left.select(
      keys.map(col) ++ Seq(struct(left.columns.map(col).toIndexedSeq: _*).as("__l")): _*)
      .withColumn("__bucket",
        explode(array(
          bucket(col("__l").getField(leftTs)),
          bucket(col("__l").getField(leftTs)) + 1)))
    val r = right.select(
      keys.map(col) ++ Seq(struct(right.columns.map(col).toIndexedSeq: _*).as("__r")): _*)
      .withColumn("__bucket", bucket(col("__r").getField(rightTs)))
    val joined = l.join(r, keys :+ "__bucket")
      .where(col("__r").getField(rightTs) >= col("__l").getField(leftTs) &&
        col("__r").getField(rightTs) <= col("__l").getField(leftTs) + band)
    val lCols = left.columns.filterNot(keys.contains)
      .map(c => col("__l").getField(c).as(s"l_$c"))
    val rCols = right.columns.filterNot(keys.contains)
      .map(c => col("__r").getField(c).as(s"r_$c"))
    joined.select(keys.map(col) ++ lCols.toIndexedSeq ++ rCols.toIndexedSeq: _*)
  }

  /** The struct type `cols` of `df` would produce — for typed null literals. */
  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      cols.map(c => df.schema(c)))
}
