package object graft {

  import org.apache.spark.sql.DataFrame

  import graft.operators.{DistanceMetric, Knn}

  /** Syntax sugar: `db.knn(queries, k)` for exact k-NN over any DataFrame
    * with (id, vector) columns (SURVEY §7.1's optional implicit). */
  implicit class KnnOps(private val db: DataFrame) extends AnyVal {
    def knn(
        queries: DataFrame,
        k: Int,
        metric: DistanceMetric = DistanceMetric.L2,
        idCol: String = "id",
        vecCol: String = "vector",
        qidCol: String = "qid",
        qvecCol: String = "qvec"): DataFrame =
      Knn.bruteForce(db, queries, k, metric, idCol, vecCol, qidCol, qvecCol)
  }
}
