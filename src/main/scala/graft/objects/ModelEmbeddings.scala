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

/** Text embedding served by a REAL trained NEURAL NETWORK: an MLlib
  * multilayer perceptron (feed-forward, sigmoid hidden layer, softmax
  * output) fit on an actual supervised task — predicting a document's
  * language from its hashed bag-of-words — whose HIDDEN-LAYER activations
  * become the text embedding. This is the neural counterpart of
  * [[WordVectorTextEmbedding]] and the closest in-container analogue of
  * the reference's transformer integrations
  * (embeddings/sentence_transformers_embedding.py — a trained network's
  * intermediate representation behind the ObjectEmbedding ABC; no
  * ONNX/torch runtime ships in this environment, so the network is one
  * MLlib trains for real rather than one loaded from a zoo).
  *
  * The forward pass runs executor-side from the extracted weight
  * matrices (no model object in the closure); the spec validates the
  * weight-layout parse by matching a full manual forward (hidden sigmoid
  * + output softmax) against `model.predictProbability`, and runs the
  * SAME weights through a live python process for cross-runtime parity —
  * the [[SubprocessEmbedding]] contract on genuine neural weights.
  *
  * @param w1 hidden×input weight rows (w1(o)(i)); @param b1 hidden biases
  */
class MlpTextEmbedding(
    private[objects] val w1: Array[Array[Float]],
    private[objects] val b1: Array[Float],
    private[objects] val featureDim: Int) extends ObjectEmbedding {

  require(w1.length == b1.length && w1.forall(_.length == featureDim),
    "graft: MLP hidden layer shape mismatch")
  override def dimensions: Int = b1.length

  // one stateless hasher per embedding instance, not per row
  private val hasher = new HashTextEmbedding(featureDim)

  private[graft] def features(text: String): Array[Float] =
    // the SAME hashed bag-of-words the training features used
    hasher.embed(Iterator((0L, text))).next()._3

  private[graft] def hidden(x: Array[Float]): Array[Float] = {
    val h = new Array[Float](b1.length)
    var o = 0
    while (o < b1.length) {
      var s = b1(o).toDouble
      val row = w1(o)
      var i = 0
      while (i < featureDim) { s += row(i).toDouble * x(i); i += 1 }
      h(o) = (1.0 / (1.0 + math.exp(-s))).toFloat
      o += 1
    }
    h
  }

  override def embed(objects: Iterator[(Long, String)])
      : Iterator[(Long, Int, Array[Float])] =
    objects.map { case (id, text) => (id, 0, hidden(features(text))) }
}

object MlpTextEmbedding {

  /** The full trained network — the embedding (hidden layer) plus the
    * output layer the spec needs to validate the forward pass against
    * MLlib's own `predictProbability`. */
  case class Trained(
      embedding: MlpTextEmbedding,
      w2: Array[Array[Float]], // labels × hidden
      b2: Array[Float],
      labels: Seq[String],
      model: org.apache.spark.ml.classification.MultilayerPerceptronClassificationModel)

  /** Fit a real MLP (layers featureDim → hidden → |langs|) on the
    * documents' language labels. Seeded l-bfgs for a stable in-session
    * fit; cross-session determinism comes from persisting the extracted
    * weights, never from re-training (the Word2Vec discipline). */
  def train(
      docs: DataFrame,
      featureDim: Int = 64,
      hidden: Int = 32,
      seed: Long = 42L,
      maxIter: Int = 60,
      textCol: String = "text",
      labelCol: String = "lang"): Trained = {
    val spark = docs.sparkSession
    import spark.implicits._
    val labels = docs.select(col(labelCol).cast("string"))
      .distinct().as[String].collect().sorted.toSeq
    val labelIdx = labels.zipWithIndex.toMap
    val fd = featureDim
    val trainDf = docs.select(col(textCol).cast("string"), col(labelCol).cast("string"))
      .as[(String, String)]
      .map { case (text, lang) =>
        val hasher = new HashTextEmbedding(fd)
        val f = hasher.embed(Iterator((0L, text))).next()._3
        (org.apache.spark.ml.linalg.Vectors.dense(f.map(_.toDouble)),
          labelIdx(lang).toDouble)
      }
      .toDF("features", "label")
    val mlp = new org.apache.spark.ml.classification.MultilayerPerceptronClassifier()
      .setLayers(Array(featureDim, hidden, labels.length))
      .setSeed(seed).setMaxIter(maxIter).setSolver("l-bfgs")
    val model = mlp.fit(trainDf)
    // MLlib's FeedForwardTopology packs per-layer [W (column-major,
    // numOut × numIn), b] slices back to back; the spec pins this parse
    // by matching the manual forward against predictProbability
    val w = model.weights.toArray
    def affine(offset: Int, nIn: Int, nOut: Int): (Array[Array[Float]], Array[Float], Int) = {
      val mat = Array.tabulate(nOut, nIn)((o, i) => w(offset + i * nOut + o).toFloat)
      val b = Array.tabulate(nOut)(o => w(offset + nIn * nOut + o).toFloat)
      (mat, b, offset + nIn * nOut + nOut)
    }
    val (w1, b1, off1) = affine(0, featureDim, hidden)
    val (w2, b2, off2) = affine(off1, hidden, labels.length)
    require(off2 == w.length,
      s"graft: MLP weight vector length ${w.length} != parsed $off2 — layout drift")
    Trained(new MlpTextEmbedding(w1, b1, featureDim), w2, b2, labels, model)
  }

  /** TSV export of the hidden layer (`b1` line, then one `w1` row line per
    * hidden unit) for the python cross-runtime parity spec. */
  def exportTsv(emb: MlpTextEmbedding, file: java.nio.file.Path): Unit = {
    val w = java.nio.file.Files.newBufferedWriter(file)
    try {
      w.write(s"${emb.featureDim} ${emb.b1.length}"); w.newLine()
      w.write(emb.b1.mkString(" ")); w.newLine()
      emb.w1.foreach { row => w.write(row.mkString(" ")); w.newLine() }
    } finally w.close()
  }
}
