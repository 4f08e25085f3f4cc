package graft.objects

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text embedding backed by a REAL trained model's word vectors: documents
  * embed as the mean of their tokens' vectors (exactly
  * `ml.feature.Word2VecModel.transform`'s document embedding — average of
  * in-vocabulary word vectors), evaluated executor-side through the
  * [[ObjectEmbedding]] ABC like every other embedding. This is the
  * in-container counterpart of the reference's model integrations
  * (embeddings/sentence_transformers_embedding.py:1-61 wraps a model whose
  * `encode` maps text → vector; the object layer neither knows nor cares
  * what computes the vector): [[WordVectorTextEmbedding.train]] fits an
  * actual MLlib Word2Vec (skip-gram, seeded) on a corpus, and the learned
  * table travels either as a broadcast-closure map (this class) or as a
  * TSV handed to an external process ([[SubprocessEmbedding]] — spec runs
  * the SAME weights through a live python encoder and asserts parity).
  *
  * The learned vectors persist as parquet `(word, vector)` so later
  * sessions reload the exact floats and the DuckDB oracle replays the
  * averaging + search from the same table — model training stays
  * engine-internal (nondeterministic across Spark versions), model
  * OUTPUTS are the replayable contract, the same split the IVF centroid
  * replay uses.
  */
class WordVectorTextEmbedding(
    private[objects] val vectors: Map[String, Array[Float]],
    val dimensions: Int) extends ObjectEmbedding {

  require(vectors.valuesIterator.forall(_.length == dimensions),
    s"graft: word vector table has entries != $dimensions dims")

  override def embed(objects: Iterator[(Long, String)])
      : Iterator[(Long, Int, Array[Float])] =
    objects.map { case (id, text) =>
      val v = new Array[Float](dimensions)
      var n = 0
      text.trim.toLowerCase.split("\\s+").foreach { tok =>
        vectors.get(tok).foreach { wv =>
          var i = 0
          while (i < dimensions) { v(i) += wv(i); i += 1 }
          n += 1
        }
      }
      if (n > 0) { var i = 0; while (i < dimensions) { v(i) /= n; i += 1 } }
      (id, 0, v)
    }
}

object WordVectorTextEmbedding {

  /** Fit a real Word2Vec (MLlib skip-gram) on `docs` and wrap the learned
    * vectors. `minCount = 1` keeps every corpus token in-vocabulary so no
    * chunk embeds to the zero vector (cosine-undefined). Seeded +
    * single-partition for a stable fit within a session; cross-session
    * determinism comes from persisting the OUTPUT ([[save]]), never from
    * re-training. */
  def train(
      docs: DataFrame,
      dim: Int = 32,
      seed: Long = 42L,
      minCount: Int = 1,
      maxIter: Int = 1,
      textCol: String = "text"): WordVectorTextEmbedding = {
    val tokens = docs
      .select(split(trim(lower(col(textCol))), "\\s+").as("tokens"))
    val model = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("tokens").setOutputCol("emb")
      .setVectorSize(dim).setMinCount(minCount)
      .setSeed(seed).setNumPartitions(1).setMaxIter(maxIter)
      .fit(tokens)
    val vecs = model.getVectors.collect().map { r =>
      r.getString(0) -> r.getAs[org.apache.spark.ml.linalg.Vector](1)
        .toArray.map(_.toFloat)
    }.toMap
    new WordVectorTextEmbedding(vecs, dim)
  }

  /** Persist the learned table as `(word, vector array<float>)` parquet —
    * the replayable artifact the oracle and later sessions read. */
  def save(spark: SparkSession, emb: WordVectorTextEmbedding, path: String): Unit = {
    import spark.implicits._
    emb.vectors.toSeq.toDF("word", "vector")
      .repartition(1).write.mode("overwrite").parquet(path)
  }

  def load(spark: SparkSession, path: String): WordVectorTextEmbedding = {
    val rows = spark.read.parquet(path).collect()
    val vecs = rows.map { r =>
      r.getString(r.fieldIndex("word")) ->
        r.getSeq[Float](r.fieldIndex("vector")).toArray
    }.toMap
    require(vecs.nonEmpty, s"graft: empty word-vector table at $path")
    new WordVectorTextEmbedding(vecs, vecs.head._2.length)
  }

  /** TSV export (`word \t v0 v1 ...`) for handing the same weights to an
    * external encoder process ([[SubprocessEmbedding]] spec). */
  def exportTsv(emb: WordVectorTextEmbedding, file: java.nio.file.Path): Unit = {
    val w = java.nio.file.Files.newBufferedWriter(file)
    try emb.vectors.foreach { case (word, v) =>
      w.write(word); w.write("\t"); w.write(v.mkString(" ")); w.newLine()
    } finally w.close()
  }
}
