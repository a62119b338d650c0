package graft

import org.apache.spark.sql.graft.ExtensionsBridge

class GraftExtensionsSpec extends SparkSpec {

  test("custom kernels are callable from SQL once extensions register") {
    ExtensionsBridge.register(spark, new GraftExtensions())
    val r = spark.sql(
      """SELECT cosine_f32(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
        |       dot_f32(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d""".stripMargin)
      .head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(r.getDouble(1) - 11.0) < 1e-9)
  }

  test("SQL kernel matches the DataFrame kernel on real embeddings") {
    ExtensionsBridge.register(spark, new GraftExtensions())
    graft.io.Tables.embeddings(spark, Sf).limit(50).createOrReplaceTempView("emb_t")
    val viaSql = spark.sql(
      "SELECT vec_id, cosine_f32(embedding, embedding) AS c FROM emb_t ORDER BY vec_id")
      .collect().map(_.getDouble(1))
    assert(viaSql.forall(c => math.abs(c - 1.0) < 1e-9))
  }
}
