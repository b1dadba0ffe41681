package graft.sim

import graft.dedup.Dedup
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (builder north-star scope).
  *
  * Baseline: brute-force cosine top-k (exact — also the oracle).
  * Scale path: random-hyperplane LSH bucketing — vectors only meet inside
  * a bucket, so the join is |bucket|² not n², and bucket signatures are
  * deterministic (fixed seed) for reproducible runs.
  */
object Similarity {

  private def asDouble(vecCol: Column): Column = transform(vecCol, _.cast("double"))

  /** Exact top-k neighbors of one query vector (broadcast as a literal) —
    * single scan + top-k, no shuffle of the corpus.
    */
  def topKForVector(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int
  ): DataFrame = {
    val q = typedLit(query)
    df.select(col(idCol), Dedup.cosine(asDouble(col(vecCol)), q).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Exact k-NN join: top-k neighbors for every vector via blocked
    * cross-join + ranking window. O(n²) compare — correct baseline and
    * oracle; use [[lshTopK]] beyond ~10⁵ vectors.
    */
  def knnJoin(df: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("v"))
    val a = v.select(col(idCol).as("id1"), col("v").as("v1"))
    val b = v.select(col(idCol).as("id2"), col("v").as("v2"))
    val sims = a.crossJoin(b).where(col("id1") =!= col("id2"))
      .select(col("id1"), col("id2"),
        Dedup.cosine(col("v1"), col("v2")).as("cosine"))
    val w = Window.partitionBy(col("id1")).orderBy(col("cosine").desc, col("id2"))
    sims.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
    * corpus into `nlist` cells; a query only scans its `nprobe` nearest
    * cells. The standard FAISS-style recall/cost dial, built on MLlib
    * KMeans (seeded → deterministic). Returns top-k per query vector for
    * queries drawn from the same table.
    *
    * Scale shape: centroids are tiny (nlist × dim, broadcast); the
    * candidate join matches each vector only against its probed cells —
    * cost n·(n/nlist)·nprobe instead of n².
    */
  def ivfTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).fit(v)
    val centroids = model.clusterCenters.map(_.toArray.toSeq).zipWithIndex
    // cell assignment for corpus vectors (nearest centroid)
    val assigned = model.transform(v).withColumnRenamed("prediction", "cell")
      .select(col(idCol), col("v"), col("cell"))
    // each query probes its nprobe nearest centroids
    val centDf = centroids.map { case (c, i) => (i, c) }.toSeq
    val probes = assigned.select(col(idCol).as("qid"), col("v").as("qv"))
      .crossJoin(broadcast(
        df.sparkSession.createDataFrame(centDf).toDF("cell", "cv")))
      .withColumn("dist", Dedup.cosine(col("qv"), col("cv")))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("dist").desc, col("cell"))))
      .where(col("r") <= nprobe)
      .select(col("qid"), col("qv"), col("cell"))
    // candidates: query × vectors in probed cells only
    val sims = probes.join(assigned, Seq("cell"))
      .where(col("qid") =!= col(idCol))
      .select(col("qid").as("id1"), col(idCol).as("id2"),
        Dedup.cosine(col("qv"), col("v")).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col("id1")).orderBy(col("cosine").desc, col("id2"))
    sims.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }

  /** The seeded hyperplane family behind [[hyperplaneSignature]] — public so
    * an external checker (the driver's DuckDB oracle) can reproduce the
    * exact same planes and replay the full LSH pipeline independently.
    */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane signatures: bit i = sign(v · h_i) with hyperplanes
    * drawn from a fixed seed. Cosine-similar vectors agree on most bits.
    */
  def hyperplaneSignature(
      vecCol: Column,
      dim: Int,
      bits: Int,
      seed: Long = 42L
  ): Column = {
    hyperplanes(dim, bits, seed).zipWithIndex.map { case (h, i) =>
      val dot = aggregate(zip_with(vecCol, typedLit(h), (x, p) => x * p),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
  }

  /** Embedding near-dup PAIRS above a cosine threshold via hyperplane-LSH
    * bucketing — the scale path for [[graft.dedup.Dedup.embeddingDupPairs]]
    * (whose all-pairs form is the O(n²) oracle baseline). Vectors only meet
    * inside a (band, key) bucket; exact cosine is then computed on those
    * candidates and thresholded, so precision is exact and recall is the
    * band-collision probability (1 − (1 − p^bitsPerBand)^bands with
    * p = 1 − θ/π for angle θ) — raise `bands` / lower `bitsPerBand` to push
    * recall toward 1 at the cost of candidate volume.
    */
  def lshCosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      dim: Int,
      bits: Int = 16,
      bands: Int = 8,
      seed: Long = 42L
  ): DataFrame = {
    val bitsPerBand = bits / bands
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("sig", hyperplaneSignature(col("v"), dim, bits, seed))
    val banded = v.select(col(idCol), col("v"),
      explode(array((0 until bands).map(b => struct(lit(b).as("band"),
        shiftright(col("sig"), b * bitsPerBand)
          .bitwiseAND(lit((1L << bitsPerBand) - 1)).as("key"))): _*)).as("bk"))
      .select(col(idCol), col("v"), col("bk.band"), col("bk.key"))
    val l = banded.select(col(idCol).as("id1"), col("v").as("v1"), col("band"), col("key"))
    val r = banded.select(col(idCol).as("id2"), col("v").as("v2"), col("band"), col("key"))
    l.join(r, Seq("band", "key")).where(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), Dedup.cosine(col("v1"), col("v2")).as("cosine"))
      .distinct()
      .where(col("cosine") >= threshold)
  }

  /** Per-subspace k-means codebooks for product quantization: the
    * embedding is split into `m` contiguous subvectors and each subspace
    * gets its own `codebookSize`-centroid quantizer (seeded → fits are
    * deterministic). Returned as plain Scala arrays — small enough
    * (m·k·dim/m doubles) to inline as literals into every executor's
    * codegen, no broadcast variable needed.
    *
    * Vectors are L2-normalized before fitting so inner product ≡ cosine
    * downstream. At 100 TB the fit runs on a sample; the codebook cost is
    * independent of corpus size.
    */
  def pqCodebooks(
      df: DataFrame,
      vecCol: String,
      dim: Int,
      m: Int,
      codebookSize: Int,
      seed: Long = 42L
  ): Seq[Seq[Seq[Double]]] = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sub = dim / m
    val u = df.select(l2normalize(asDouble(col(vecCol))).as("u"))
    (0 until m).map { j =>
      val sv = u.select(array_to_vector(slice(col("u"), j * sub + 1, sub)).as("features"))
      new KMeans().setK(codebookSize).setSeed(seed + j).setMaxIter(10).fit(sv)
        .clusterCenters.map(_.toArray.toSeq).toSeq
    }
  }

  private def l2normalize(vec: Column): Column = {
    val n = sqrt(aggregate(transform(vec, x => x * x), lit(0.0), _ + _))
    when(n === 0.0, vec).otherwise(transform(vec, _ / n))
  }

  private def dot(a: Column, b: Seq[Double]): Column =
    aggregate(zip_with(a, typedLit(b), (x, y) => x * y), lit(0.0), _ + _)

  /** PQ encoding: `codes[j] = argmin_c ‖u_j − codebook[j][c]‖²` — the
    * embedding compressed to m small ints (4–8 bits each), a 32–64×
    * reduction of what a similarity scan has to read. Pure Column
    * arithmetic over inlined centroids: codegen'd, scan-local, no UDF.
    */
  def pqEncode(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val m = codebooks.size
    val sub = codebooks.head.head.size
    val u = l2normalize(vec)
    array((0 until m).map { j =>
      val uj = slice(u, j * sub + 1, sub)
      val dists = array(codebooks(j).map { c =>
        aggregate(zip_with(uj, typedLit(c), (x, y) => (x - y) * (x - y)),
          lit(0.0), _ + _)
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }: _*)
  }

  /** Product-quantization ANN (asymmetric distance computation): the
    * corpus is stored as PQ codes; each query builds one lookup table per
    * subspace (`lut[j][c] = ⟨q_j, codebook[j][c]⟩`) and a candidate's
    * approximate cosine is `Σ_j lut[j][codes[j]]` — m array lookups per
    * pair instead of a dim-wide dot product.
    *
    * PQ is the COMPRESSION layer of ANN, not the pruning layer: every
    * code is still scanned per query, but the scan reads m bytes/vector
    * instead of 4·dim and the score is m adds. Compose with [[ivfTopK]]
    * (probe cells first, ADC inside probed cells) for the classic IVF-PQ
    * at corpus scale. The query side is broadcast — the big side (codes)
    * never shuffles.
    */
  def pqTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      m: Int = 8,
      codebookSize: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    val books = pqCodebooks(df, vecCol, dim, m, codebookSize, seed)
    val sub = dim / m
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("v"))
    val encoded = v.select(col(idCol).as("cid"),
      pqEncode(col("v"), books).as("codes"))
    val luts = array((0 until m).map { j =>
      val qj = slice(col("u"), j * sub + 1, sub)
      array(books(j).map(c => dot(qj, c)): _*)
    }: _*)
    val queries = v.select(col(idCol).as("qid"), l2normalize(col("v")).as("u"))
      .select(col("qid"), luts.as("luts"))
    val scored = encoded.crossJoin(broadcast(queries))
      .where(col("qid") =!= col("cid"))
      .withColumn("score",
        aggregate(zip_with(col("luts"), col("codes"),
          (l, c) => element_at(l, c + 1)), lit(0.0), _ + _))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid").as("id1"), col("cid").as("id2"),
        col("score"), col("rank"))
  }

  /** IVF-PQ: the classic composition — the coarse quantizer prunes the
    * candidate set to `nprobe` cells ([[ivfTopK]]'s shape) and PQ codes
    * score the survivors by ADC lookups ([[pqTopK]]'s shape). Per query:
    * `(n/nlist)·nprobe` candidates × m byte lookups — both the IO and
    * the compute dial at once, which is what a billion-vector corpus
    * needs. Codes are built on raw vectors (not residuals) — simpler,
    * costs some precision vs FAISS's residual PQ; the recall dial is
    * `nprobe` and `m` as usual.
    */
  def ivfPqTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      m: Int = 8,
      codebookSize: Int = 16,
      seed: Long = 42L
  ): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sub = dim / m
    val books = pqCodebooks(df, vecCol, dim, m, codebookSize, seed)
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(nlist).setSeed(seed).setMaxIter(10).fit(v)
    // corpus side: one cell id + m-byte code vector per row — the only
    // thing the candidate scan ever reads
    val assigned = model.transform(v)
      .select(col(idCol).as("cid"), pqEncode(col("v"), books).as("codes"),
        col("prediction").as("cell"))
    val centDf = model.clusterCenters.map(_.toArray.toSeq).zipWithIndex
      .map { case (c, i) => (i, c) }.toSeq
    val luts = array((0 until m).map { j =>
      val qj = slice(col("u"), j * sub + 1, sub)
      array(books(j).map(c => dot(qj, c)): _*)
    }: _*)
    val probes = v.select(col(idCol).as("qid"), l2normalize(col("v")).as("u"))
      .crossJoin(broadcast(
        df.sparkSession.createDataFrame(centDf).toDF("cell", "cv")))
      .withColumn("sim", graft.dedup.Dedup.cosine(col("u"), col("cv")))
      .withColumn("r", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cell"))))
      .where(col("r") <= nprobe)
      .select(col("qid"), luts.as("luts"), col("cell"))
    // each corpus vector lives in exactly one cell — no pair duplication
    val scored = probes.join(assigned, Seq("cell"))
      .where(col("qid") =!= col("cid"))
      .withColumn("score",
        aggregate(zip_with(col("luts"), col("codes"),
          (l, c) => element_at(l, c + 1)), lit(0.0), _ + _))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col("qid").as("id1"), col("cid").as("id2"),
        col("score"), col("rank"))
  }

  /** ANN top-k via LSH: bucket on signature bands, rank within buckets.
    * Recall < 1 by construction; `bands` trades recall vs. bucket size.
    */
  def lshTopK(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      bits: Int = 16,
      bands: Int = 4,
      seed: Long = 42L
  ): DataFrame = {
    val bitsPerBand = bits / bands
    val v = df.select(col(idCol), asDouble(col(vecCol)).as("v"))
      .withColumn("sig", hyperplaneSignature(col("v"), dim, bits, seed))
    val banded = v.select(col(idCol), col("v"),
      explode(array((0 until bands).map(b => struct(lit(b).as("band"),
        shiftright(col("sig"), b * bitsPerBand)
          .bitwiseAND(lit((1L << bitsPerBand) - 1)).as("key"))): _*)).as("bk"))
      .select(col(idCol), col("v"), col("bk.band"), col("bk.key"))
    val l = banded.select(col(idCol).as("id1"), col("v").as("v1"), col("band"), col("key"))
    val r = banded.select(col(idCol).as("id2"), col("v").as("v2"), col("band"), col("key"))
    val sims = l.join(r, Seq("band", "key")).where(col("id1") =!= col("id2"))
      .select(col("id1"), col("id2"), Dedup.cosine(col("v1"), col("v2")).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col("id1")).orderBy(col("cosine").desc, col("id2"))
    sims.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
