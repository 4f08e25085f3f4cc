package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic training-shard materialization with an integrity
  * manifest — the EXPORT end of the curation pipeline (the step after
  * filter → dedup → mix → pack: hand the corpus to dataloaders as N
  * independent streams and be able to PROVE, later, that what the
  * trainer read is what the pipeline wrote).
  *
  * Shard routing is [[TextOps.hashBucket]] over the document id —
  * content-independent and append-stable, so re-exports and incremental
  * corpus versions route every id identically (the same contract
  * [[TextOps.packSequences]] and `hashSplit` build on). `numShards` ≈
  * dataloader/reader parallelism at the target scale; shards are
  * disk-partitioned so a reader opens exactly its own files.
  *
  * The manifest is recomputed FROM THE WRITTEN FILES, never from the
  * input lineage: a write that silently dropped or duplicated rows is
  * visible as a manifest/recount mismatch the moment [[fsck]] runs.
  * `content_sig` is the bit-XOR of each document's FNV-1a text hash —
  * order-independent (shard file order is not meaningful) and
  * overflow-free, recomputable by any engine from the shard files alone.
  *
  * Scale shape (100 TB): the export is one column projection + one
  * disk-partitioned write (shuffle keyed by shard only); the manifest is
  * one map-side-combined aggregate over the written table with one tiny
  * output row per shard; [[fsck]] runs the same bounded aggregates —
  * counts, hashes, min/max — and never collects documents.
  */
object ShardExport {

  /** severity: "error" = the export does not match its manifest; reading
    * it as training data risks silent corpus drift. */
  case class Finding(severity: String, check: String, detail: String)

  /** Write `docs` as `numShards` deterministic shards under
    * `uri/shards` (parquet, disk-partitioned by `shard`), plus
    * `uri/manifest` — one row per non-empty shard:
    * `(shard, n_docs, n_tokens, content_sig, id_lo, id_hi)` — and
    * `uri/meta` (num_shards, salt), which lets [[fsck]] re-derive every
    * document's OWN shard assignment and catch misplaced rows. */
  def write(
      docs: DataFrame,
      uri: String,
      numShards: Int,
      textCol: String = "text",
      idCol: String = "doc_id",
      salt: String = ""): Unit = {
    require(numShards > 0, s"graft: ShardExport numShards must be positive, got $numShards")
    require(!docs.columns.contains("shard"),
      "graft: ShardExport input already has a 'shard' column — the export " +
        "would silently overwrite it with its own routing; rename or drop it first")
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("shard",
        TextOps.hashBucket(col(idCol).cast("string"), numShards, salt).cast("int"))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$uri/shards")
    manifestOf(spark.read.parquet(s"$uri/shards"), textCol, idCol)
      .repartition(1).write.mode("overwrite").parquet(s"$uri/manifest")
    Seq((numShards, salt)).toDF("num_shards", "salt")
      .repartition(1).write.mode("overwrite").parquet(s"$uri/meta")
  }

  /** The persisted manifest, one row per non-empty shard. */
  def manifest(spark: SparkSession, uri: String): DataFrame =
    spark.read.parquet(s"$uri/manifest")

  /** Incrementally export `newDocs` into an existing shard set: the
    * persisted (num_shards, salt) route the batch — so an id added later
    * lands in the same shard a full re-export would put it in — the batch
    * appends as new parquet files inside its shard directories, and the
    * manifest COMBINES the persisted per-shard stats with the batch's
    * (counts add, id ranges min/max, content_sig XORs — every manifest
    * column is associative, the [[graft.text.Bm25.append]] lesson: never
    * re-derive corpus-wide state the persisted record already carries).
    * `write(A); append(B)` therefore serves a manifest IDENTICAL to
    * `write(A ∪ B)` — XOR and the other combines are order-independent —
    * and the byte-level audit of the appended files stays [[fsck]]'s job
    * (run it after an append to prove the written bytes match the
    * combined manifest). A batch repeating an id — within itself or vs
    * the export — is REFUSED up front: duplicate ids double-count docs
    * and XOR-cancel signatures. Empty batch is a no-op. The corpus is
    * never re-read. The batch is `localCheckpoint`ed before anything reads
    * it, so the rows the parquet write persists and the rows the manifest
    * stats aggregate are THE SAME materialization — the written-bytes
    * contract holds even for a non-deterministic batch plan. */
  def append(
      newDocs: DataFrame,
      uri: String,
      textCol: String = "text",
      idCol: String = "doc_id"): Unit = {
    val spark = newDocs.sparkSession
    val meta = spark.read.parquet(s"$uri/meta").select("num_shards", "salt").head()
    val numShards = meta.getInt(0)
    val salt = meta.getString(1)
    // schema guard: parquet append with a different column set OR type
    // would mix schemas inside the shard directories, and a later plain
    // read resolves ONE of them — silently dropping or re-typing the
    // other's columns
    val existingSchema = spark.read.parquet(s"$uri/shards").schema
      .filterNot(_.name == "shard").map(f => f.name -> f.dataType).toMap
    val batchSchema = newDocs.schema.map(f => f.name -> f.dataType).toMap
    require(batchSchema == existingSchema,
      s"graft: ShardExport append batch schema ${batchSchema.toSeq.sortBy(_._1).mkString("[", ",", "]")} " +
        s"differs from the export's ${existingSchema.toSeq.sortBy(_._1).mkString("[", ",", "]")} — " +
        "appending would mix schemas inside the shard files")
    require(!newDocs.columns.contains("shard"),
      "graft: ShardExport append batch already has a 'shard' column — the " +
        "export would silently overwrite it with its own routing; rename or drop it first")
    // Pin ONE materialization of the routed batch before anything reads it:
    // the same rows back the duplicate checks, the parquet write, AND the
    // manifest stats. Without this, a non-deterministic batch plan (or a
    // source mutated mid-append) could write one row set and record stats
    // for another — violating the module's "manifest matches the written
    // bytes" contract until an fsck catches it. localCheckpoint is
    // batch-bounded (appends are incremental by design), not corpus-sized.
    val routed = newDocs.withColumn("shard",
        TextOps.hashBucket(col(idCol).cast("string"), numShards, salt).cast("int"))
      .localCheckpoint()
    val batchIds = routed.select(col(idCol).cast("long").as("__id"))
      .groupBy("__id").agg(count(lit(1)).as("__c"))
    val innerDup = batchIds.where(col("__c") > 1).limit(1).collect()
    require(innerDup.isEmpty,
      s"graft: ShardExport append batch repeats id" +
        s"${if (innerDup.nonEmpty) s"=${innerDup.head.getLong(0)}" else ""} " +
        "within itself — de-duplicate the batch")
    val dup = batchIds.select("__id")
      .join(spark.read.parquet(s"$uri/shards")
          .select(col(idCol).cast("long").as("__id")),
        Seq("__id"), "left_semi")
      .limit(1).collect()
    require(dup.isEmpty,
      s"graft: ShardExport append batch contains ids already exported (e.g. id=" +
        s"${if (dup.nonEmpty) dup.head.getLong(0) else -1L}) — re-export, or " +
        "de-duplicate the batch")
    if (routed.limit(1).isEmpty) return
    routed.write.mode("append").partitionBy("shard").parquet(s"$uri/shards")
    val batchStats = manifestOf(routed, textCol, idCol)
    val combined = manifest(spark, uri).as("o")
      .join(batchStats.as("b"), col("o.shard") === col("b.shard"), "full_outer")
      .select(
        coalesce(col("o.shard"), col("b.shard")).as("shard"),
        (coalesce(col("o.n_docs"), lit(0L)) + coalesce(col("b.n_docs"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("o.n_tokens"), lit(0L)) + coalesce(col("b.n_tokens"), lit(0L)))
          .as("n_tokens"),
        // XOR with 0 is identity, so a one-sided shard passes through
        coalesce(col("o.content_sig"), lit(0L))
          .bitwiseXOR(coalesce(col("b.content_sig"), lit(0L))).as("content_sig"),
        least(col("o.id_lo"), col("b.id_lo")).as("id_lo"),
        greatest(col("o.id_hi"), col("b.id_hi")).as("id_hi"))
      .localCheckpoint() // sever from the manifest files about to be replaced
    combined.repartition(1).write.mode("overwrite").parquet(s"$uri/manifest")
  }

  /** The manifest aggregate both [[write]] and [[fsck]] evaluate — ONE
    * shared plan so they cannot drift. */
  private def manifestOf(shards: DataFrame, textCol: String, idCol: String): DataFrame =
    shards.select(col("shard").cast("int").as("shard"),
        col(idCol).cast("long").as("__id"),
        TextOps.tokenCount(col(textCol)).cast("long").as("__nt"),
        TextOps.fnv64(col(textCol)).as("__sig"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        expr("bit_xor(__sig)").as("content_sig"),
        min(col("__id")).as("id_lo"),
        max(col("__id")).as("id_hi"))

  /** Integrity check of an export: recompute the manifest from the shard
    * files and diff it against the persisted one (any drift — dropped,
    * duplicated, or altered documents — shows up in n_docs / n_tokens /
    * content_sig), then re-derive each document's own shard from
    * (id, num_shards, salt) and count misrouted rows (a corrupted or
    * hand-moved partition directory). Bounded driver aggregates only
    * ([[graft.index.IndexDoctor]]'s contract) — documents never leave
    * the executors. Empty result = healthy. */
  def fsck(
      spark: SparkSession,
      uri: String,
      textCol: String = "text",
      idCol: String = "doc_id"): Seq[Finding] = {
    val out = mutable.Buffer.empty[Finding]
    val meta =
      try spark.read.parquet(s"$uri/meta").select("num_shards", "salt").head()
      catch {
        case e: Exception =>
          return Seq(Finding("error", "meta", s"meta unreadable: ${e.getMessage}"))
      }
    val numShards = meta.getInt(0)
    val salt = meta.getString(1)
    val shards =
      try spark.read.parquet(s"$uri/shards")
      catch {
        case e: Exception =>
          return Seq(Finding("error", "shards", s"shard table unreadable: ${e.getMessage}"))
      }
    val recomputed = manifestOf(shards, textCol, idCol)
    val persisted = manifest(spark, uri)
    val cols = Seq("n_docs", "n_tokens", "content_sig", "id_lo", "id_hi")
    // one row per shard on either side — the join result is bounded by
    // numShards, so the collect is safe at any corpus size
    val diff = recomputed.as("r")
      .join(persisted.as("p"), col("r.shard") === col("p.shard"), "full_outer")
      .where(col("r.shard").isNull || col("p.shard").isNull ||
        cols.map(c => !(col(s"r.$c") <=> col(s"p.$c"))).reduce(_ || _))
      .select(coalesce(col("r.shard"), col("p.shard")).as("shard"),
        col("r.shard").isNull.as("only_manifest"),
        col("p.shard").isNull.as("only_files"))
      .collect()
    diff.foreach { r =>
      val shard = r.getInt(0)
      if (r.getBoolean(1))
        out += Finding("error", s"shard=$shard",
          "manifest row has no shard files (shard lost after export)")
      else if (r.getBoolean(2))
        out += Finding("error", s"shard=$shard",
          "shard files present but absent from the manifest (unrecorded write)")
      else
        out += Finding("error", s"shard=$shard",
          "shard stats drifted from the manifest (docs dropped, duplicated, or altered)")
    }
    val misrouted = shards
      .where(TextOps.hashBucket(col(idCol).cast("string"), numShards, salt)
        .cast("int") =!= col("shard"))
      .count()
    if (misrouted > 0)
      out += Finding("error", "routing",
        s"$misrouted document(s) sit in a shard their id does not hash to " +
          s"(num_shards=$numShards, salt='$salt')")
    out.toSeq
  }
}
