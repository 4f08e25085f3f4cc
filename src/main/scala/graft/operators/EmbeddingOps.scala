package graft.operators

import org.apache.spark.ml.feature.PCA
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Embedding-space preprocessing for the curation pipeline: PCA projection
  * (the dimensionality-reduction step SemDeDup-style semantic dedup and
  * embedding-cluster analyses run before clustering; reference embeddings
  * land here via the object layer's ObjectEmbedding).
  *
  * The decomposition is fitted once with MLlib (covariance eigenvectors,
  * distributed treeAggregate under the hood) and persisted as plain
  * parquet: a singleton mean row and one (comp_idx, comp) row per
  * component. SERVING recomputes nothing: projection is
  * `(x − mean) · c_j` evaluated as one sequential left fold per component
  * — center, multiply elementwise, then fold-add in index order — so an
  * engine reading the same parquet reproduces the doubles bit-for-bit
  * (float32 inputs widen to double exactly; every product and partial sum
  * rounds identically).
  *
  * Scale: fitting aggregates one d×d covariance (d = embedding dim, tiny);
  * projection is a broadcast of k component rows against the corpus — a
  * k-fan-out projection with no shuffle of the embedding table.
  */
object EmbeddingOps {

  /** Fit PCA(k) on `vecCol` and persist `{uri}/mean` (singleton
    * array<double>) + `{uri}/components` (k rows: comp_idx,
    * comp array<double>). */
  def trainPca(
      df: DataFrame,
      uri: String,
      k: Int,
      vecCol: String = "embedding"): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val data = df.select(array_to_vector(col(vecCol).cast("array<double>")).as("fv"))
    val mean = data.select(Summarizer.mean(col("fv")).as("m"))
      .head().getAs[Vector]("m").toArray
    val model = new PCA().setK(k).setInputCol("fv").setOutputCol("pc").fit(data)
    val d = mean.length
    require(model.pc.numRows == d && model.pc.numCols == k,
      s"graft: PCA returned ${model.pc.numRows}x${model.pc.numCols}, expected ${d}x$k")
    val comps = (0 until k).map { j =>
      (j.toLong, (0 until d).map(i => model.pc(i, j)).toArray)
    }
    Seq(Tuple1(mean)).toDF("mean")
      .coalesce(1).write.mode("overwrite").parquet(s"$uri/mean")
    comps.toDF("comp_idx", "comp")
      .coalesce(1).write.mode("overwrite").parquet(s"$uri/components")
  }

  /** Project every row onto the persisted components, long format:
    * `(id, comp_idx, proj)` — k rows per input. The fold order (center →
    * elementwise product → left-fold sum) is the replayable contract,
    * evaluated by the codegen'd [[graft.functions.CenteredDot]] kernel —
    * one static double loop inside the whole-stage span instead of three
    * interpreted HOF lambda passes per row×component (same doubles: the
    * fused loop performs the identical operation sequence). */
  def projectPca(
      df: DataFrame,
      uri: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = df.sparkSession
    val mean = spark.read.parquet(s"$uri/mean")
      .head().getSeq[Double](0)
    val comps = spark.read.parquet(s"$uri/components")
    val meanLit = typedlit(mean)
    df.select(col(idCol), col(vecCol).cast("array<double>").as("__x"))
      .crossJoin(broadcast(comps))
      .select(col(idCol), col("comp_idx"),
        graft.functions.centered_dot(col("__x"), meanLit, col("comp")).as("proj"))
  }

  /** Per-cluster outlier ranking — the "prune the noise before training"
    * signal of embedding-space curation (the farthest members of each
    * SemDeDup-style cluster are mislabeled/off-distribution candidates;
    * SemDeDup's own §3 keeps LOW-similarity examples and prunes the rest —
    * this surfaces the extremes of that same geometry). Each vector is
    * normalized, assigned to its nearest blocking centroid (argmin L2,
    * lower id on ties — [[graft.functions.NearestCentroid]]), and the
    * `topK` FARTHEST members per cluster are ranked.
    *
    * Scale shape: assignment is a broadcast-k argmin projection; the
    * per-cluster top-k goes through the [[MinTopK]] partial→final
    * aggregate on negated distance (only topK rows per cluster per input
    * partition cross the shuffle) — never a per-cluster sort window.
    * Output: `(centroid_id, vec_id, outlier_rank)`. */
  def clusterOutliers(
      emb: DataFrame,
      centroids: Array[Array[Float]],
      topK: Int = 3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(topK > 0, s"graft: clusterOutliers topK must be positive, got $topK")
    val spark = emb.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graftshim.{toColumn, toExpression}
    import graft.functions.{dist_l2, min_topk, vector_normalize}
    val cdf = centroids.zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq.toDF("centroid_id", "__cent")
    val nv = vector_normalize(col(vecCol).cast("array<float>"))
    emb
      .select(col(idCol).cast("long").as("__id"), nv.as("__nv"),
        toColumn(graft.functions.NearestCentroid(toExpression(nv), centroids))
          .as("centroid_id"))
      .join(graft.gatedSmallSide(cdf), Seq("centroid_id"))
      .select(col("centroid_id"), col("__id"),
        negate(dist_l2(col("__nv"), col("__cent"))).as("__score"))
      .groupBy(col("centroid_id"))
      .agg(min_topk(col("__score"), col("__id"), topK).as("__topk"))
      .select(col("centroid_id"), posexplode(col("__topk")).as(Seq("__pos", "__hit")))
      .select(col("centroid_id"),
        col("__hit.id").as("vec_id"),
        (col("__pos") + 1).cast("int").as("outlier_rank"))
  }
}
