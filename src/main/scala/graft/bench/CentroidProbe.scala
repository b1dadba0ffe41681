package graft.bench

import graft.model.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool (not driver contract): prints the two seeded centroid fits
  * that the SimQ oracles inline as SQL literals, in `(cell, [..])`
  * DuckDB VALUES form — the SemDeDup spherical k-means centroids
  * (deterministic distributed Lloyd's, `Similarity.semanticCentroids`)
  * and the persisted-index coarse quantizer of the q_ivfpq_append /
  * q_ivfpq_drift store (seeded MLlib KMeans on the fit-40 subset).
  *
  * Session config mirrors `graft.Verify` exactly — the fit is
  * reproducible only for a fixed input layout, so the pins must be
  * generated under the gate's own partitioning (local[4], AQE on).
  * Re-run and re-pin whenever the seeded fit or the gate table changes,
  * same rule as the pinned recall vectors.
  */
object CentroidProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def sqlValues(cents: Seq[Seq[Double]]): String =
      cents.zipWithIndex.map { case (c, i) =>
        s"($i, [${c.mkString(", ")}]::DOUBLE[])"
      }.mkString(",\n")

    val emb = Tables.embeddings(spark, sfDir)
    println("== semantic centroids (nlist=8, seed=42, iters=10, L2-normalized fit) ==")
    println(sqlValues(graft.sim.Similarity.semanticCentroids(
      emb, "embedding", dim = 64, nlist = 8)))

    // the q_ivfpq_append / q_ivfpq_drift store: fit on vec_id < 40 only,
    // identical seeded call to SimQ.appendIndexDir
    val d = graft.util.Tmp.root("graft_centroid_probe").toString
    graft.sim.Similarity.writeIvfPqIndex(
      emb.where(col("vec_id") < 40), "vec_id", "embedding", d,
      dim = 64, nlist = 8, m = 8, codebookSize = 16)
    val stored = spark.read.parquet(s"$d/centroids").orderBy("cell").collect()
      .map(r => r.getSeq[Double](r.fieldIndex("vec")))
    println("== ivfpq append-store coarse centroids (fit-40, nlist=8, seed=42) ==")
    println(sqlValues(stored.toSeq))
    spark.stop()
  }
}
