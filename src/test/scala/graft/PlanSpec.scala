package graft

import graft.model.{SeriesSpec, Tables}
import graft.metrics.{Anomalies, Temporal}
import graft.queries.TemporalQ
import org.apache.spark.sql.functions._

/** Physical-plan hygiene: these assertions pin the properties that make the
  * operators scale — broadcast joins for small sides, pushdown into scans,
  * whole-stage codegen coverage, partial aggregation. A regression here is
  * a 100 TB performance bug even when results stay correct.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("anomaly join broadcasts the climatology side") {
    val p = plan(Anomalies.anomaly(Tables.lineitem(spark, sfDir), TemporalQ.liSeries))
    assert(p.contains("BroadcastHashJoin"), "climatology must broadcast, not shuffle")
    assert(!p.contains("SortMergeJoin"))
  }

  test("auto z-score: broadcast for small climatologies, windowed past the threshold") {
    val li = Tables.lineitem(spark, sfDir)
    // monthly × 3 return flags → tiny climatology → the broadcast-join regime
    val pm = plan(Anomalies.standardizedAnomalyAuto(li, TemporalQ.liSeries))
    assert(pm.contains("BroadcastHashJoin") && !pm.contains("Window"),
      s"monthly must pick the broadcast-join form:\n$pm")
    // day-of-year "at scale": shrink the threshold the selector consults —
    // the same knob that flips at real scale when cells × 366 outgrows it
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4096")
      val pd = plan(Anomalies.standardizedAnomalyAuto(li, TemporalQ.liSeries,
        Temporal.ByDayOfYear))
      assert(pd.contains("Window") && !pd.contains("BroadcastHashJoin"),
        s"oversized doy climatology must pick the windowed form:\n$pd")
      // reference-period climatology past the threshold: windowed form is
      // semantically unavailable — must fall back to an UNHINTED equi-join
      val pr = plan(Anomalies.standardizedAnomalyAuto(li, TemporalQ.liSeries,
        Temporal.ByDayOfYear, referencePeriod = Some(("1994-01-01", "1996-12-31"))))
      assert(!pr.contains("BroadcastHashJoin") && !pr.contains("Window") &&
        pr.contains("SortMergeJoin"),
        s"oversized reference-period climatology must shuffle-join:\n$pr")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("star join broadcasts dimension tables") {
    val p = plan(graft.queries.JoinQ.queries("q_region_revenue")(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("monthly mean is a single partial+final hash aggregate inside codegen") {
    val df = Temporal.monthlyMean(Tables.lineitem(spark, sfDir), TemporalQ.liSeries)
    val p = plan(df)
    assert(p.contains("HashAggregate"), "avg must hash-aggregate")
    assert(p.contains("partial_avg"), "needs partial+final (map-side combine)")
    df.collect() // AQE finalizes the plan (with codegen stages) on execution
    val finalPlan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark whole-stage-codegen stages in the final plan
    assert(finalPlan.contains("*("), "plan must run inside whole-stage codegen")
    // exactly one shuffle: the group-key exchange
    assert("Exchange".r.findAllIn(p).size == 1, s"expected 1 shuffle:\n$p")
  }

  test("time filters and projections reach the parquet scan") {
    val df = Tables.lineitem(spark, sfDir)
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
      .select("l_quantity", "l_shipdate")
    val p = plan(df)
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
    assert(p.contains("ReadSchema") && !p.contains("l_extendedprice"))
  }

  test("rolling window plans one shuffle + one sort, no recompute loop") {
    val ev = Tables.events(spark, sfDir)
    val df = Temporal.rollingMean(ev, SeriesSpec("ts", Seq("event_type"), "value"),
      window = 7, orderCols = Seq("event_id"))
    val p = plan(df)
    assert(p.contains("Window"))
    assert("Exchange".r.findAllIn(p).size == 1)
  }

  test("z-ordered store: bbox predicates reach the parquet scan") {
    val g = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"),
        (col("l_partkey") % 180 - 89).cast("double").as("lat"),
        graft.functions.TimeFns.normalizeLon(col("l_extendedprice")).as("lon"))
    val path = tmpDir() + "/zplan"
    graft.ingest.ZOrder.cluster(g, "lat", "lon", numPartitions = 2)
      .write.parquet(path)
    val p = plan(spark.read.parquet(path)
      .where(col("lat").between(-30, 30) && col("lon").between(20, 80)))
    // the clustering only pays off if the lat/lon min-max predicates are
    // pushed to the scan, where row-group stats can skip
    assert(p.contains("PushedFilters") && p.contains("lat") && p.contains("lon"),
      s"bbox must push down:\n$p")
  }

  test("PQ ANN broadcasts the query side; codes never shuffle before scoring") {
    val emb = Tables.embeddings(spark, sfDir).where(col("vec_id") < 20)
    val pq = graft.sim.Similarity.pqTopK(emb, "vec_id", "embedding",
      k = 3, dim = 64, m = 4, codebookSize = 8)
    val p = plan(pq)
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"query LUTs must broadcast over the code scan:\n$p")
    // the only shuffle is the per-query ranking window
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"expected exactly the rank window's shuffle:\n$p")
  }

  test("IVF candidate set feeds the rank window with no extra exchange") {
    val emb = Tables.embeddings(spark, sfDir).where(col("vec_id") < 20)
    val q = graft.sim.Similarity.ivfTopK(emb, "vec_id", "embedding",
      k = 3, dim = 64, nlist = 4, nprobe = 2)
    val p = plan(q)
    // the candidate join's output used to pass through a distinct() —
    // a full shuffle of the IVF path's largest intermediate hashed on
    // (qid, id, cosine). Pairs are unique by construction (one cell per
    // corpus vector, distinct probed cells), so the only exchange keyed
    // on the similarity output is the rank window's id1 partitioning.
    assert(!"Exchange hashpartitioning\\([^)]*cosine".r.findFirstIn(p).isDefined,
      s"no exchange may hash the cosine column (distinct() regression):\n$p")
    assert("""\bWindow\b""".r.findAllIn(p).size == 1,
      s"expected only the final rank Window:\n$p")
  }

  test("IVF-PQ probe ranking is fused: one Window total, no centroid crossJoin") {
    val emb = Tables.embeddings(spark, sfDir)
    val q = graft.sim.Similarity.ivfPqTopK(emb, "vec_id", "embedding",
      k = 3, dim = 64, nlist = 8, nprobe = 2, m = 4, codebookSize = 8)
    val p = plan(q)
    // pre-fusion the probe side ranked cells with its own Window over a
    // centroid crossJoin; the fused NearestCentroids kernel leaves exactly
    // the final per-query rank Window in the whole plan
    assert("""\bWindow\b""".r.findAllIn(p).size == 1,
      s"expected only the final rank Window:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"no centroid crossJoin may survive on the probe side:\n$p")
  }

  test("served index scans are dynamically cell-pruned, base AND stream extension") {
    val emb = Tables.embeddings(spark, sfDir).where(col("vec_id") < 50)
    val d = tmpDir() + "/ivfpq_dpp"
    graft.sim.Similarity.writeIvfPqIndex(emb, "vec_id", "embedding", d,
      dim = 64, nlist = 8, m = 8, codebookSize = 16)
    graft.sim.Similarity.appendStreamBatch(
      Tables.embeddings(spark, sfDir)
        .where(col("vec_id") >= 50 && col("vec_id") < 60),
      "vec_id", "embedding", d, batchId = 0L)
    val idx = graft.sim.Similarity.openIvfPqIndex(spark, d)
    val served = graft.sim.Similarity.ivfPqServe(idx,
      emb.where(col("vec_id") < 3), "vec_id", "embedding", k = 3, nprobe = 2)
    served.collect() // executed plan carries the runtime pruning subqueries
    val p = plan(served)
    // the probe side is tiny and broadcast, so Spark's dynamic partition
    // pruning turns the cell equi-join into partition filters on the
    // codes scans — serving reads ~nprobe/nlist of the store, and the
    // union with the stream-grown extension must not defeat that on
    // EITHER branch (each cell-partitioned scan keeps its own filter)
    assert(p.contains("dynamicpruning"),
      s"served codes scan must be dynamically cell-pruned:\n$p")
    val prunedScans = p.linesIterator.filter(l =>
      l.contains("/codes") && l.contains("PartitionFilters") &&
        l.contains("dynamicpruning")).size
    assert(prunedScans >= 2,
      s"both the base codes and codes_stream scans must carry a dynamic " +
        s"cell PartitionFilter, found $prunedScans:\n$p")
  }

  test("served SQ×IVF scans are dynamically cell-pruned, base AND stream extension") {
    val emb = Tables.embeddings(spark, sfDir).where(col("vec_id") < 50)
    val d = tmpDir() + "/sqivf_dpp"
    graft.sim.Similarity.writeSqIvfIndex(emb, "vec_id", "embedding", d,
      dim = 64, nlist = 8)
    graft.sim.Similarity.appendSqIvfStreamBatch(
      Tables.embeddings(spark, sfDir)
        .where(col("vec_id") >= 50 && col("vec_id") < 60),
      "vec_id", "embedding", d, batchId = 0L)
    val idx = graft.sim.Similarity.openSqIvfIndex(spark, d)
    val served = graft.sim.Similarity.sqIvfServeIndex(idx,
      emb.where(col("vec_id") < 3), "vec_id", "embedding", k = 3, nprobe = 2)
    served.collect() // executed plan carries the runtime pruning subqueries
    val p = plan(served)
    // same property as the IVF-PQ served store: the broadcast probe side
    // turns the cell equi-join into dynamic partition filters, and the
    // union with the stream extension must not defeat that on either
    // branch — at corpus scale the int8 serve reads nprobe/nlist of the
    // store, not all of it
    assert(p.contains("dynamicpruning"),
      s"served SQ×IVF codes scan must be dynamically cell-pruned:\n$p")
    val prunedScans = p.linesIterator.filter(l =>
      l.contains("/codes") && l.contains("PartitionFilters") &&
        l.contains("dynamicpruning")).size
    assert(prunedScans >= 2,
      s"both the base codes and codes_stream scans must carry a dynamic " +
        s"cell PartitionFilter, found $prunedScans:\n$p")
  }

  test("bucketed tables join without a shuffle") {
    import graft.ingest.GridSink
    // clean both the metastore entries and any orphaned warehouse dirs
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val d = new java.io.File(s"spark-warehouse/$t")
      if (d.exists()) org.apache.commons.io.FileUtils.deleteDirectory(d)
    }
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    GridSink.writeBucketed(li, "li_b", Seq("l_orderkey"), buckets = 4,
      sortCols = Seq("l_orderkey"))
    GridSink.writeBucketed(o, "o_b", Seq("o_orderkey"), buckets = 4,
      sortCols = Seq("o_orderkey"))
    // force the sort-merge path: at real scale neither side broadcasts,
    // which is exactly when bucketing pays
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"),
          col("l_orderkey") === col("o_orderkey"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      // co-located buckets: no shuffle Exchange feeds the join
      assert(!p.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$p")
      assert(p.contains("SortMergeJoin"))
      assert(p.contains("Bucketed: true"), s"scan must use buckets:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("exceedance threshold side broadcasts") {
    val p = plan(graft.metrics.Percentiles.exceedanceFrequency(
      Tables.lineitem(spark, sfDir), TemporalQ.liSeries))
    assert(p.contains("BroadcastHashJoin"))
  }

  test("gram-set construction is scan-local: zero exchanges before postings") {
    // a cached gram-sets relation from another suite would splice its own
    // plan text (incl. exchanges) into this plan's rendering — isolate
    spark.catalog.clearCache()
    val docs = Tables.documents(spark, sfDir)
    // the per-doc gram sets themselves must not shuffle (the fused
    // TextGramHashes kernel replaced an explode + groupBy(id) + collect_set)
    val sets = graft.dedup.Dedup.gramHashSets(docs, "doc_id", "text", 3)
    assert("Exchange".r.findAllIn(plan(sets)).isEmpty,
      "gram sets must be pure map-side work")
    // the whole pair query plans exactly two shuffles: postings groupBy(gh)
    // and the pair-count groupBy — anything more is a scale regression
    // (r18 opt note: a scan fan-out here was measured 1.47× SLOWER — the
    // text shuffle costs more than the serial tokenize — so the pair
    // pipeline deliberately keeps the shape this test pins)
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.2, maxDocFreq = 15)
    val p = plan(pairs)
    assert("Exchange".r.findAllIn(p).size == 2, s"expected 2 shuffles:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "pair generation must not plan decorate joins")
  }

  test("resolution is one aggregate with no global sort or single-partition window") {
    val df = graft.ingest.GridSource.resolution(
      Tables.lineitem(spark, sfDir),
      graft.functions.TimeFns.epochSeconds(col("l_shipdate")))
    val p = plan(df)
    assert(!p.contains("Window"), "no window operator (was a partitionless sort+lag)")
    assert(!p.contains("Sort"), "no global sort")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"))
    assert(p.contains("partial"), "needs partial+final (map-side combine)")
  }

  test("grouped top-k gets a partial group limit before the shuffle") {
    val df = graft.queries.TextQ.queries("q_topk_docs")(spark, sfDir)
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    // InferWindowGroupLimit must plan partial+final WindowGroupLimit around
    // the exchange: each input partition ships at most k rows per group —
    // the property that makes rank-filter top-k viable at 100 TB.
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"expected partial+final WindowGroupLimit:\n$p")
    assert(p.contains("Partial"), s"partial mode missing:\n$p")
  }

  test("decontamination broadcasts the benchmark grams; corpus never shuffles on gram") {
    val docs = Tables.documents(spark, sfDir)
    val p = plan(graft.dedup.Dedup.contamination(
      docs.where(col("doc_id") >= 25), "doc_id", "text",
      docs.where(col("doc_id") < 25), "text", width = 8))
    assert(p.contains("BroadcastHashJoin"), s"bench gram side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must not shuffle on gram:\n$p")
  }

  test("tf-idf top-k plans a WindowGroupLimit, not a full per-doc sort ship") {
    val p = plan(graft.text.TextMetrics.tfIdfTopTerms(
      Tables.documents(spark, sfDir), "doc_id", "text", k = 3))
    assert(p.contains("WindowGroupLimit"),
      s"rank filter must push partial group limits:\n$p")
  }

  test("sequence packing: one exchange total, reused from window to manifest agg") {
    val p = plan(graft.operators.Packing.packSummary(
      Tables.documents(spark, sfDir), "doc_id", "text", budget = 512, shards = 4))
    // the shard hash-partitioning that feeds the window ALSO satisfies the
    // (shard, seq) group-by clustering, so the manifest adds no shuffle —
    // the property that keeps packing one-pass at 100 TB
    assert("Exchange".r.findAllIn(p).size == 1, s"expected exactly 1 shuffle:\n$p")
    assert(p.contains("Window"))
  }

  test("AQE skew handling and salting divide the labor: joins to AQE, aggs to salt") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    val helper = new AdaptiveSparkPlanHelper {}
    // one hot key (~90% of rows) + a long tail; build side has every key
    val fact = spark.range(40000).select(
      when(col("id") % 10 < 9, lit(0L)).otherwise(col("id") % 100).as("k"),
      col("id").as("row_id"), (col("id") % 7).cast("double").as("v"))
    val build = spark.range(100).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("label"))
    val restore = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      // force the sort-merge regime (broadcast would dodge skew entirely)
      // and lower AQE's skew thresholds to test-data scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 1. JOIN skew: AQE's OptimizeSkewedJoin splits the hot partition at
      //    runtime — the plain join needs NO salting under AQE...
      val plain = fact.join(build, Seq("k"))
      plain.collect() // finalize AQE on THIS DataFrame's QueryExecution
      val smj = helper.collectWithSubqueries(plain.queryExecution.executedPlan) {
        case s: SortMergeJoinExec if s.isSkewJoin => s
      }
      assert(smj.nonEmpty,
        s"AQE should mark the hot-key join skew-split:\n${plain.queryExecution.executedPlan}")
      // ...and saltedJoin COEXISTS with AQE for the regime AQE can't split
      // (its replicate-by-salt join is equi-keyed on (k, _salt), uniform by
      // construction): same rows, no skew flag needed
      val salted = graft.operators.Salting.saltedJoin(
        fact, build, key = "k", tieBreaker = "row_id", saltBuckets = 8)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
        "salted join must be row-identical to the plain join under AQE")
      // 2. AGGREGATION skew: AQE has no skew rescue for a groupBy — the
      //    executed plan of the direct aggregation hashes the hot key to
      //    ONE reducer partition (no skew-split node exists for aggs).
      //    Salting is the library's answer there: two exchanges (key+salt,
      //    then key), identical results.
      val direct = fact.groupBy(col("k")).agg(
        sum(col("v")).as("sum_value"), count(col("v")).as("n"),
        min(col("v")).as("min_value"), max(col("v")).as("max_value"))
        .withColumn("avg_value", col("sum_value") / col("n"))
      direct.collect()
      val directPlan = direct.queryExecution.executedPlan.toString
      assert(!directPlan.toLowerCase.contains("skew"),
        s"no AQE skew handling exists for aggregations:\n$directPlan")
      val saltedAgg = graft.operators.Salting.saltedStats(
        fact, keys = Seq("k"), valueCol = "v", tieBreaker = "row_id",
        saltBuckets = 8)
      assert(saltedAgg.exceptAll(direct).isEmpty && direct.exceptAll(saltedAgg).isEmpty,
        "salted aggregation must equal the direct aggregation")
      saltedAgg.collect()
      // the adaptive plan string repeats under "== Initial Plan ==" — count
      // exchanges in the final section only
      val saltedPlan = saltedAgg.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert("Exchange hashpartitioning".r.findAllIn(saltedPlan).size == 2,
        s"salted agg must shuffle on (key, salt) then key:\n$saltedPlan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("sq top-k: WindowGroupLimit bounds per-query rows; codes broadcast") {
    val emb = Tables.embeddings(spark, sfDir)
    val df = graft.sim.Similarity.sqTopK(emb,
      emb.where(col("vec_id") % 31 === 0), "vec_id", "embedding", k = 5)
    df.collect()
    val p = plan(df)
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"expected partial+final WindowGroupLimit:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"query codes must broadcast to the corpus scan:\n$p")
  }

  test("web pipeline parses the WARC archive once: both consumers read " +
    "the checkpointed extraction, no parse subtree in the final plan") {
    val df = graft.queries.WebQ.queries("q_web_pipeline")(spark, sfDir)
    df.collect()
    // the extraction frame is localCheckpoint()ed: the dedup branch and
    // the scoring branch must both scan the SAME materialized RDD, and
    // the WARC flatMap-parse (an object pipeline: SerializeFromObject /
    // MapPartitions) must be ABSENT — it ran exactly once, at
    // materialization, not per branch
    val logical = df.queryExecution.optimizedPlan
    val rddIds = logical.collectLeaves().collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }
    assert(rddIds.size == 2, s"expected 2 checkpoint scans, got $rddIds")
    assert(rddIds.distinct.size == 1,
      s"both branches must share ONE materialized RDD: $rddIds")
    val p = plan(df)
    assert(!p.contains("SerializeFromObject") && !p.contains("MapPartitions"),
      s"WARC parse subtree must not appear in the consuming plan:\n$p")
  }

  test("sq×ivf: candidates via broadcast HASH join on cell (not a " +
    "nested-loop corpus×queries), WindowGroupLimit bounds per-query rows") {
    val emb = Tables.embeddings(spark, sfDir).where(col("vec_id") < 200)
    val df = graft.sim.Similarity.sqIvfTopK(emb,
      emb.where(col("vec_id") % 29 === 0), "vec_id", "embedding", k = 5,
      dim = 64, nlist = 8, nprobe = 2)
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"),
      s"probe side must broadcast-hash-join on cell:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"cell pruning must not degrade to a nested loop:\n$p")
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2,
      s"expected partial+final WindowGroupLimit:\n$p")
  }

  test("dedup-index verify join: candidates broadcast to corpus grams " +
    "(the corpus side never shuffles)") {
    val docs = Tables.documents(spark, sfDir)
    val path = java.nio.file.Files.createTempDirectory("graft-planspec-mh").toString
    graft.dedup.DedupIndex.write(docs.where(col("doc_id") % 3 =!= 0),
      "doc_id", "text", path)
    val df = graft.dedup.DedupIndex.query(docs.where(col("doc_id") % 3 === 0),
      "doc_id", "text", path, threshold = 0.5)
    df.collect()
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), s"batch side must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"persisted bands/grams scans must not shuffle:\n$p")
    // size-aware pushdown: at this tiny store the probe must NOT run
    // (its driver round-trip costs more than the scan it would prune)…
    assert(!p.contains("PushedFilters: [In(bucket"),
      s"tiny store must keep the single-job plan, no pushdown probe:\n$p")
    // …but past the store-size threshold (forced here) the batch's bucket
    // set is pushed INTO the postings scan — with the store written
    // bucket-sorted, parquet row-group stats skip what a point-ish batch
    // can't match (the index reads O(candidates), not O(corpus))
    val pushed = graft.dedup.DedupIndex.query(
      docs.where(col("doc_id") % 3 === 0), "doc_id", "text", path,
      threshold = 0.5, pushdownMinStoreBytes = 0L)
    assert(pushed.collect().toSet == df.collect().toSet,
      "pushdown must be result-neutral")
    val pp = plan(pushed)
    assert(pp.contains("PushedFilters: [In(bucket"),
      s"bucket IN-filter must reach the parquet postings scan:\n$pp")
  }
}
