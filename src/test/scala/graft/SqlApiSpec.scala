package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DistanceMetric

class SqlApiSpec extends AnyFunSuite {
  import SparkTestSession._

  test("registered SQL functions evaluate the kernels") {
    graft.functions.registerAll(spark)
    import spark.implicits._
    Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .createOrReplaceTempView("v")
    val r = spark.sql(
      """SELECT dist_sos(a, b) sos, dist_l2(a, b) l2, dot_product(a, b) dot,
        |       dist_cosine(a, b) cos, vector_norm(vector_normalize(a)) n
        |FROM v""".stripMargin).head()
    assert(r.getFloat(0) === 8.0f)
    assert(math.abs(r.getFloat(1) - math.sqrt(8.0)) < 1e-6)
    assert(r.getFloat(2) === 11.0f)
    // cos_sim = 11 / (sqrt(5) * 5) -> distance 1 - 0.98386991
    assert(math.abs(r.getFloat(3) - 0.01613009f) < 1e-6)
    assert(math.abs(r.getFloat(4) - 1.0f) < 1e-6)
  }

  test("text kernels on the SQL surface: shingle_set, simhash64, winnow_fingerprint") {
    graft.functions.registerAll(spark)
    import spark.implicits._
    Seq(("the quick brown fox jumps over the lazy dog",
         Seq("the", "quick", "brown"))).toDF("t", "toks")
      .createOrReplaceTempView("docs_sql")
    val r = spark.sql(
      """SELECT size(shingle_set(t)) n_sh, simhash64(toks) sig,
        |       size(winnow_fingerprint(t)) n_fp
        |FROM docs_sql""".stripMargin).head()
    assert(r.getInt(0) === 7) // 9 tokens -> 7 distinct 3-shingles
    assert(r.getInt(2) > 0)
    // SQL path evaluates the same expression as the Scala path
    val scalaSig = Seq(Seq("the", "quick", "brown")).toDF("toks")
      .select(org.apache.spark.sql.graftshim.toColumn(
        graft.text.SimHash64(org.apache.spark.sql.graftshim.toExpression(col("toks")))))
      .head().getLong(0)
    assert(r.getLong(1) === scalaSig)
  }

  test("min_topk via SQL groups and bounds per key") {
    graft.functions.registerAll(spark)
    import spark.implicits._
    (1 to 100).map(i => (i % 2, i.toFloat, i.toLong)).toDF("g", "s", "id")
      .createOrReplaceTempView("t")
    val rows = spark.sql(
      "SELECT g, min_topk(s, id, 3) tk FROM t GROUP BY g ORDER BY g").collect()
    assert(rows.length === 2)
    val tk0 = rows(0).getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0))
    assert(tk0 === Seq(2L, 4L, 6L))
  }

  test("index probe rewrite installs via extraOptimizations in a plain session") {
    graft.functions.registerAll(spark)
    val hadRule = spark.experimental.extraOptimizations.contains(graft.plans.IndexProbeRewrite)
    if (!hadRule)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.IndexProbeRewrite
    try {
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
        .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
      val uri = java.nio.file.Files.createTempDirectory("graft_sqlapi_ivf").toString
      graft.index.Ingest.ingest(spark, uri, emb, "IVF_FLAT",
        DistanceMetric.L2, timestamp = 1000L, partitions = Some(16))
      graft.plans.GraftSql.registerIndexTable(spark, "plain_vecs", uri, nprobe = 4)
      val qv = emb.where(col("external_id") === 1).select("vector")
        .head().getSeq[Float](0)
      val qlit = "cast(array(" + qv.map(x => String.format(java.util.Locale.ROOT, "%.9e", Float.box(x))).mkString(",") + ") as array<float>)"
      val df = spark.sql(
        s"SELECT external_id FROM plain_vecs ORDER BY dist_l2(vector, $qlit) LIMIT 5")
      // the nprobe=4 partition filter must reach the physical scan even when
      // the rule runs in the last (User Provided Optimizers) batch
      val physical = df.queryExecution.executedPlan.toString
      val pf = "PartitionFilters: \\[[^\\]]*partition_id[^\\]]*\\]".r
      assert(pf.findFirstIn(physical).isDefined,
        s"expected partition_id PartitionFilters:\n${physical.take(3000)}")
      // self-retrieval survives the probe
      assert(df.collect().map(_.getLong(0)).contains(1L))
    } finally if (!hadRule) {
      // the SHARED session must not leak the rule into later suites'
      // plan-shape assertions
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.IndexProbeRewrite)
    }
  }

  test("an IVF_SQ8 index registers on the SQL surface: pruned scan, sq column skipped") {
    graft.functions.registerAll(spark)
    val hadRule = spark.experimental.extraOptimizations.contains(graft.plans.IndexProbeRewrite)
    if (!hadRule)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.IndexProbeRewrite
    try {
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
        .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
      val uri = java.nio.file.Files.createTempDirectory("graft_sqlapi_sq8").toString
      graft.index.Ingest.ingest(spark, uri, emb, "IVF_SQ8",
        DistanceMetric.L2, timestamp = 1000L, partitions = Some(16))
      graft.plans.GraftSql.registerIndexTable(spark, "plain_vecs_sq8", uri, nprobe = 4)
      val qv = emb.where(col("external_id") === 1).select("vector")
        .head().getSeq[Float](0)
      val qlit = "cast(array(" + qv.map(x => String.format(java.util.Locale.ROOT, "%.9e", Float.box(x))).mkString(",") + ") as array<float>)"
      val df = spark.sql(
        s"SELECT external_id FROM plain_vecs_sq8 ORDER BY dist_l2(vector, $qlit) LIMIT 5")
      val physical = df.queryExecution.executedPlan.toString
      // the quantizer index's coarse centroids drive the same nprobe pruning
      assert("PartitionFilters: \\[[^\\]]*partition_id[^\\]]*\\]".r
        .findFirstIn(physical).isDefined,
        s"expected partition_id PartitionFilters:\n${physical.take(3000)}")
      // a float-distance SQL query must not read the sq codes column —
      // columnar pruning keeps the 1-byte/dim bytes out of the scan
      val readSchemas = "ReadSchema: [^\\n]*".r.findAllIn(physical).toList
      assert(readSchemas.nonEmpty && readSchemas.forall(!_.contains("sq")),
        s"sq column must be pruned from the SQL scan:\n${readSchemas.mkString("\n")}")
      assert(df.collect().map(_.getLong(0)).contains(1L))
    } finally if (!hadRule) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.IndexProbeRewrite)
    }
  }

  test("a BINARY index registers on the SQL surface with exact-scan semantics") {
    graft.functions.registerAll(spark)
    val hadRule = spark.experimental.extraOptimizations.contains(graft.plans.IndexProbeRewrite)
    if (!hadRule)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.IndexProbeRewrite
    try {
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
        .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
      val uri = java.nio.file.Files.createTempDirectory("graft_sqlapi_bin").toString
      graft.index.Ingest.ingest(spark, uri, emb, "BINARY",
        DistanceMetric.L2, timestamp = 1000L)
      graft.plans.GraftSql.registerIndexTable(spark, "bin_vecs", uri, nprobe = 4)
      val qv = emb.where(col("external_id") === 2).select("vector")
        .head().getSeq[Float](0)
      val qlit = "cast(array(" + qv.map(x =>
        String.format(java.util.Locale.ROOT, "%.9e", Float.box(x))).mkString(",") +
        ") as array<float>)"
      val got = spark.sql(
        s"SELECT external_id FROM bin_vecs ORDER BY dist_l2(vector, $qlit) LIMIT 5")
        .collect().map(_.getLong(0)).toSet
      // no probe side for the sketch type -> the SQL path is the exact scan
      val exact = graft.operators.Knn.bruteForce(emb,
          emb.where(col("external_id") === 2)
            .select(col("external_id").as("qid"), col("vector").as("qvec")),
          5, DistanceMetric.L2, idCol = "external_id", vecCol = "vector")
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == exact)
    } finally if (!hadRule) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.IndexProbeRewrite)
    }
  }

  test("probe rewrite composes with a user WHERE: filtered SQL top-k") {
    graft.functions.registerAll(spark)
    val hadRule = spark.experimental.extraOptimizations.contains(graft.plans.IndexProbeRewrite)
    if (!hadRule)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.IndexProbeRewrite
    try {
      val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
        .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
      val uri = java.nio.file.Files.createTempDirectory("graft_sqlapi_filt").toString
      graft.index.Ingest.ingest(spark, uri, emb, "IVF_FLAT",
        DistanceMetric.L2, timestamp = 1000L, partitions = Some(16))
      // probe-all registration: the filtered rewrite stays EXACT (the probe
      // filter admits every partition; the user predicate then restricts
      // candidates before the TakeOrdered — brute force over the allowed set)
      graft.plans.GraftSql.registerIndexTable(spark, "filt_vecs", uri, nprobe = 1 << 30)
      val qv = emb.where(col("external_id") === 1).select("vector")
        .head().getSeq[Float](0)
      val qlit = "cast(array(" + qv.map(x =>
        String.format(java.util.Locale.ROOT, "%.9e", Float.box(x))).mkString(",") +
        ") as array<float>)"
      val df = spark.sql(
        s"""SELECT external_id FROM filt_vecs
           |WHERE external_id % 3 = 0
           |ORDER BY dist_l2(vector, $qlit) LIMIT 5""".stripMargin)
      val got = df.collect().map(_.getLong(0)).toSeq
      // oracle: brute force over the allowed set
      val expected = graft.operators.Knn.bruteForce(
          emb.where(col("external_id") % 3 === 0),
          emb.where(col("external_id") === 1)
            .select(col("external_id").as("qid"), col("vector").as("qvec")),
          5, DistanceMetric.L2, idCol = "external_id", vecCol = "vector")
        .orderBy("rank").collect().map(_.getLong(2)).toSeq
      assert(got === expected)
      assert(got.forall(_ % 3 == 0))
      // the probe still reaches the physical scan as partition pruning at a
      // narrowed registration too (semantics = queryFiltered at that nprobe)
      graft.plans.GraftSql.registerIndexTable(spark, "filt_vecs_np", uri, nprobe = 4)
      val dfNp = spark.sql(
        s"""SELECT external_id FROM filt_vecs_np
           |WHERE external_id % 3 = 0
           |ORDER BY dist_l2(vector, $qlit) LIMIT 5""".stripMargin)
      val physical = dfNp.queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*partition_id[^\\]]*\\]".r
          .findFirstIn(physical).isDefined,
        s"expected partition_id PartitionFilters under the user WHERE:\n${
          physical.take(3000)}")
      assert(dfNp.collect().forall(_.getLong(0) % 3 == 0))
    } finally if (!hadRule) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.IndexProbeRewrite)
    }
  }

  test("query on an empty additions set and k > index size degrade gracefully") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id").as("external_id"), col("embedding").as("vector"))
    val uri = java.nio.file.Files.createTempDirectory("graft_edge").toString
    val idx = graft.index.Ingest.ingest(spark, uri, emb.limit(5), "FLAT",
      DistanceMetric.L2, timestamp = 1000L)
    val q = emb.limit(1).select(lit(0L).as("qid"), col("vector").as("qvec"))
    // k larger than the index: returns all 5, no error (reference clamps)
    assert(idx.query(q, 50).count() === 5)
  }

  test("inner-product reported distance applies the reciprocal flip (index.py:287-296)") {
    import spark.implicits._
    val db = Seq(
      (1L, Array(1.0f, 0.0f)), // dot 2 -> dist 0.5
      (2L, Array(0.0f, 1.0f)), // dot 0 -> dist MAX_FLOAT sentinel
      (3L, Array(-1.0f, 0.0f)) // dot -2 -> dist -0.5
    ).toDF("id", "vector")
    val q = Seq((0L, Array(2.0f, 0.0f))).toDF("qid", "qvec")
    val got = graft.operators.Knn.bruteForce(db, q, 3, DistanceMetric.InnerProduct)
      .orderBy("rank").select("id", "distance")
      .as[(Long, Float)].collect()
    assert(got.map(_._1).toSeq === Seq(1L, 2L, 3L)) // ranked by dot desc
    assert(got(0)._2 === 0.5f)
    assert(got(1)._2 === Float.MaxValue)
    assert(got(2)._2 === -0.5f)
  }
}
