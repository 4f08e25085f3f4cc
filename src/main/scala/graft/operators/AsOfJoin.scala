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
  * key (one user with a billion events) concentrates in one task. The band
  * join SHIPS the remedy: `salt > 1` splits every (key, bucket) hash cell
  * across `salt` sub-cells by right-row hash (left rows replicate to every
  * sub-cell), flattening hot-cell task time by ~`salt` for identical
  * results — including the identical-timestamp pileup a time-subdivision
  * scheme cannot split. The as-of remedy (coarse time-range split, stitch
  * the boundary row per range) still composes on top without changing the
  * contract.
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
    // a non-numeric tie-breaker would cast to null below and silently break
    // the determinism contract for equal-timestamp matches — fail fast
    val tieType = right.schema(tieBreaker).dataType
    // type MATCH, not typeName strings: IntegerType.typeName is "integer",
    // so a name list with "int" would reject valid int columns
    val tieIntegral = tieType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    require(tieIntegral,
      s"graft: asOf tieBreaker '$tieBreaker' must be an integral column " +
        s"(the equal-ts total order), got ${tieType.catalogString}")
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
    *
    * `salt > 1` splits each (key, bucket) hash cell into `salt` sub-cells:
    * every right row lands in ONE sub-cell (by row hash — deterministic,
    * and effective even when the pileup is a single repeated timestamp),
    * every left row replicates to all of them. Identical result set, left
    * shuffle volume ×`salt`, hot-cell task time ÷~`salt` — turn it on for
    * skewed keys when AQE's skew split isn't enough.
    */
  def timeBandJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      band: Long,
      salt: Int = 1): DataFrame = {
    require(band > 0, s"graft: timeBandJoin band must be positive, got $band")
    require(keys.nonEmpty, "graft: timeBandJoin needs at least one equi-key")
    require(salt >= 1, s"graft: timeBandJoin salt must be >= 1, got $salt")
    // Bucket identity is the bucket START `x - pmod(x, band)` — a long
    // multiple of `band` in pure integer arithmetic. Equal starts ⟺ equal
    // ⌊x/band⌋, with no division anywhere: a double quotient would go
    // inexact past 2^53 (nano-epoch × small band truncates to bucket−1 and
    // silently drops pairs).
    def bucketStart(ts: Column): Column = {
      val x = ts.cast("long")
      x - pmod(x, lit(band))
    }
    val lStart = bucketStart(col("__l").getField(leftTs))
    val l0 = left.select(
      keys.map(col) ++ Seq(struct(left.columns.map(col).toIndexedSeq: _*).as("__l")): _*)
      .withColumn("__bucket", explode(array(lStart, lStart + band)))
    val r0 = right.select(
      keys.map(col) ++ Seq(struct(right.columns.map(col).toIndexedSeq: _*).as("__r")): _*)
      .withColumn("__bucket", bucketStart(col("__r").getField(rightTs)))
    val (l, r, joinKeys) =
      if (salt == 1) (l0, r0, keys :+ "__bucket")
      else (
        l0.withColumn("__salt", explode(array((0 until salt).map(lit): _*))),
        r0.withColumn("__salt", pmod(hash(col("__r")), lit(salt))),
        keys ++ Seq("__bucket", "__salt"))
    val joined = l.join(r, joinKeys)
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
