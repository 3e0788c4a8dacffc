package graft

import org.apache.spark.sql.functions._

/** V2 FunctionCatalog surface (GraftCatalog + GraftFunctions): the native
  * scalar kernels resolve under the catalog name with no session
  * extension — `gfn.system.float_dot(...)` — compile through the MAGIC
  * `invoke` path, and agree row-for-row with the session-extension
  * Catalyst expressions (the pin that keeps the two spellings from
  * diverging).
  */
class FunctionCatalogSpec extends SparkSpec {
  import TestSpark._

  private lazy val setup: Unit = {
    val w = tmpDir("gfn_wh")
    spark.conf.set("spark.sql.catalog.gfn", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gfn.warehouse", w)
  }

  test("function catalog: float_dot resolves via catalog, magic-invoke plan, matches the session expression") {
    setup
    val df = spark.read.parquet(s"$sf/embeddings.parquet").limit(200)
    df.createOrReplaceTempView("fn_emb")
    val q = spark.sql(
      "SELECT vec_id, gfn.system.float_dot(embedding, embedding) AS d " +
        "FROM fn_emb")
    // magic-method path: the projection compiles an Invoke on the bound
    // function, not a row-boxing ApplyFunctionExpression
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("invoke"), plan.take(800))
    val viaCatalog = q.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaExpr = df.select(col("vec_id"),
        expr("float_dot(embedding, embedding)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaCatalog == viaExpr)
    assert(viaCatalog.nonEmpty && viaCatalog.values.forall(_ > 0.0))
    // empty-namespace spelling resolves too
    assert(spark.sql("SELECT gfn.float_dot(array(CAST(1.5 AS FLOAT), " +
      "CAST(2 AS FLOAT)), array(CAST(2 AS FLOAT), CAST(0.5 AS FLOAT)))")
      .head().getDouble(0) == 4.0)
  }

  test("function catalog: sorted_overlap and hilbert_index match their session twins") {
    setup
    val rows = spark.sql(
      "SELECT id, gfn.system.sorted_overlap(sequence(CAST(0 AS BIGINT), id), " +
        "sequence(CAST(3 AS BIGINT), CAST(12 AS BIGINT))) AS ov, " +
        "sorted_overlap(sequence(CAST(0 AS BIGINT), id), " +
        "sequence(CAST(3 AS BIGINT), CAST(12 AS BIGINT))) AS ov_expr, " +
        "gfn.system.hilbert_index(array(id % 1024, (id * 7) % 1024)) AS h, " +
        "hilbert_index(array(id % 1024, (id * 7) % 1024)) AS h_expr " +
        "FROM range(0, 300)").collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"sorted_overlap diverged at ${r.getLong(0)}")
      assert(r.getLong(3) == r.getLong(4), s"hilbert_index diverged at ${r.getLong(0)}")
    }
    // overlap values are the expected closed-form intersection size
    rows.foreach { r =>
      val id = r.getLong(0)
      val expect = math.max(0L, math.min(id, 12L) - 3L + 1L)
      assert(r.getLong(1) == expect, s"id=$id got ${r.getLong(1)} want $expect")
    }
  }

  test("function catalog: listFunctions, descriptions, and unknown-function errors") {
    setup
    val listed = spark.sql("SHOW FUNCTIONS IN gfn.system").collect()
      .map(_.getString(0)).toSet
    assert(Seq("float_dot", "sorted_overlap", "hilbert_index")
      .forall(f => listed.exists(_.endsWith(f))), listed.toString)
    // descriptions through the FunctionCatalog API (Spark 4.1's DESCRIBE
    // FUNCTION statement only supports the session catalog — it throws
    // MISSING_CATALOG_ABILITY for any V2 catalog, pinned below so an
    // upstream change shows up as a diff here, not a silent gap)
    val cat = spark.sessionState.catalogManager.catalog("gfn")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.FunctionCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("system"), "float_dot")
    assert(cat.loadFunction(ident).description().contains("dot product"))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("DESCRIBE FUNCTION gfn.system.float_dot").collect()
    }
    assert(e.getMessage.contains("MISSING_CATALOG_ABILITY"), e.getMessage)
    intercept[Exception] {
      spark.sql("SELECT gfn.system.no_such_fn(1)").collect()
    }
    // arity/type misuse fails loudly at analysis, not silently
    intercept[Exception] {
      spark.sql("SELECT gfn.system.float_dot(array(1), array(2), array(3))").collect()
    }
  }
}
