package graft.operators

import graft.Q
import graft.io.Tables
import graft.functions.VectorFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-pattern pack: the physical techniques a 100 TB deployment
  * leans on, expressed as oracle-checkable queries.
  *
  *  - IVF ANN: train coarse centroids → assign every vector to its
  *    nearest cell → probe only the query's cell (the scale path beyond
  *    brute-force kNN; at cluster scale the cell id is the partition
  *    key so a probe reads one partition).
  *  - Salted aggregation: two-stage (salt → partial → final) combine
  *    for skewed keys — result identical to the direct groupBy, but no
  *    single reducer ever sees a hot key's full row set.
  */
object ScalePatterns {

  // -------------------------------------------------------------------
  // IVF: centroids per label cell, squared-distance assignment with a
  // deterministic (rounded dist, label) argmin, then probe = exact
  // cosine top-5 inside the query's cell only.
  private def annIvfProbe(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val centroids = e.select(col("label"), posexplode(col("embedding")))
      .select(col("label"), (col("pos") + 1).cast("long").as("pos"),
        col("col").cast("double").as("x"))
      .groupBy("label", "pos").agg(avg("x").as("c"))
    // Centroids as dense vectors (pos-ordered), broadcast: the distance
    // stage is then vectors × |cells| rows each folding one 64-dim
    // array — not an exploded (vector·dim) ⋈ centroid join whose
    // aggregate would shuffle |vectors|·|cells|·dim rows.
    val cent = centroids.groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x("c")).as("cvec"))
    val dist = e.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cent))
      .select(col("vec_id"), col("label"),
        round(aggregate(
          zip_with(col("embedding"), col("cvec"),
            (a, b) => pow(a.cast("double") - b, lit(2))),
          lit(0.0), (acc, x) => acc + x), 6).as("dist2"))
    val w = Window.partitionBy("vec_id").orderBy(col("dist2"), col("label"))
    val assigned = dist
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("label").as("cell"))
      .localCheckpoint(true) // assignment is read twice (probe cell + candidate filter)
    val qRow = e.filter(col("vec_id") === 0).select("embedding").head()
    val q = qRow.getSeq[Float](0).toArray
    val qCell = assigned.filter(col("vec_id") === 0).select("cell").head().getInt(0)
    e.join(assigned.filter(col("cell") === qCell), Seq("vec_id"))
      .select(col("vec_id"), col("cell"),
        round(VectorFunctions.cosineConst(col("embedding"), q), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(5)
  }

  private val annIvfProbeSql =
    """WITH el AS (
      |  SELECT vec_id, r.range AS pos, embedding[r.range]::DOUBLE AS x
      |  FROM embeddings, range(1, 65) r),
      |cent AS (
      |  SELECT label, r.range AS pos, avg(embedding[r.range]::DOUBLE) AS c
      |  FROM embeddings, range(1, 65) r GROUP BY label, pos),
      |dist AS (
      |  SELECT el.vec_id, cent.label, round(sum(pow(el.x - cent.c, 2)), 6) AS dist2
      |  FROM el JOIN cent USING (pos)
      |  GROUP BY el.vec_id, cent.label),
      |assigned AS (
      |  SELECT vec_id, label AS cell FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY dist2, label) AS rn
      |    FROM dist) t
      |  WHERE rn = 1),
      |q AS (
      |  SELECT e.embedding::DOUBLE[] AS qv, a.cell AS qcell
      |  FROM embeddings e JOIN assigned a USING (vec_id)
      |  WHERE e.vec_id = 0)
      |SELECT e.vec_id, a.cell,
      |  round(list_cosine_similarity(e.embedding::DOUBLE[], (SELECT qv FROM q)), 4) AS sim
      |FROM embeddings e
      |JOIN assigned a USING (vec_id)
      |WHERE a.cell = (SELECT qcell FROM q)
      |ORDER BY sim DESC, e.vec_id LIMIT 5""".stripMargin

  // -------------------------------------------------------------------
  // Salted two-stage aggregation: identical result to a direct groupBy;
  // the salt spreads any hot key across 8 partial groups first.
  private def saltedAgg(s: SparkSession, dir: String): DataFrame = {
    val partial = Tables.events(s, dir)
      .withColumn("salt", pmod(col("event_id"), lit(8)))
      .groupBy("event_type", "salt")
      .agg(sum("value").as("psum"), count(lit(1)).as("pcnt"))
    partial.groupBy("event_type")
      .agg(round(sum("psum"), 2).as("total_value"),
        sum("pcnt").as("cnt"))
      .orderBy("event_type")
  }

  private val saltedAggSql =
    """SELECT event_type, round(sum(value), 2) AS total_value,
      |  count(*)::BIGINT AS cnt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q_ann_ivf_probe", annIvfProbe, Some(annIvfProbeSql)),
    Q("q_salted_agg", saltedAgg, Some(saltedAggSql)))
}
