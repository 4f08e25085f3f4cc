package graft

import org.apache.spark.sql.SparkSession

/** Session-conf parsing that names the offending key: a malformed
  * `spark.graft.*` value must surface as "which conf, what value" at the
  * call site, not as an anonymous NumberFormatException deep inside a
  * query plan (where nothing points back at the conf the user set). */
object Conf {

  /** One engine-wide gate for "is this side small enough to broadcast":
    * shared by the index join paths ([[graft.index.VectorIndex]]) and the
    * FLAT brute-force query batch ([[graft.operators.Knn]]). */
  val MaxBroadcastBytesKey = "spark.graft.maxBroadcastBytes"
  val DefaultMaxBroadcastBytes: Long = 128L * 1024 * 1024

  def long(spark: SparkSession, key: String, default: Long): Long =
    spark.conf.getOption(key).map(parseLong(key, _)).getOrElse(default)

  def int(spark: SparkSession, key: String, default: Int): Int =
    spark.conf.getOption(key).map(parseInt(key, _)).getOrElse(default)

  def longOption(spark: SparkSession, key: String): Option[Long] =
    spark.conf.getOption(key).map(parseLong(key, _))

  def intOption(spark: SparkSession, key: String): Option[Int] =
    spark.conf.getOption(key).map(parseInt(key, _))

  def double(spark: SparkSession, key: String, default: Double): Double =
    spark.conf.getOption(key).map(parseDouble(key, _)).getOrElse(default)

  def bool(spark: SparkSession, key: String, default: Boolean): Boolean =
    spark.conf.getOption(key).map(_.trim.toBooleanOption.getOrElse(
      throw new IllegalArgumentException(
        s"graft: malformed value for $key (expected true/false)")))
      .getOrElse(default)

  def parseDouble(key: String, v: String): Double =
    // toDoubleOption parses 'NaN'/'Infinity'; a non-finite knob must fail
    // loudly here, not collapse silently downstream (ceil(k * NaN).toLong
    // is 0 — a NaN kFactor would quietly disable the re-rank pool)
    v.trim.toDoubleOption.filter(d => !d.isNaN && !d.isInfinity)
      .getOrElse(throw new IllegalArgumentException(
        s"graft: malformed value '$v' for $key (expected a finite number)"))

  def parseLong(key: String, v: String): Long =
    try v.trim.toLong
    catch {
      case e: NumberFormatException =>
        throw new IllegalArgumentException(
          s"graft: malformed value '$v' for $key (expected an integer)", e)
    }

  def parseInt(key: String, v: String): Int =
    try v.trim.toInt
    catch {
      case e: NumberFormatException =>
        throw new IllegalArgumentException(
          s"graft: malformed value '$v' for $key (expected an integer)", e)
    }
}
