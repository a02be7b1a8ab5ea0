package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe: replicates the sf0.1 tables in-plan (key-shifted
  * copies — no extra storage) and times the core operators at ~10-20×
  * the bench volume, answering "does the plan hold at the next order of
  * magnitude?" with measurements instead of assertions. Not part of the
  * driver contract; results recorded in PERF.md.
  */
object ScaleProbe {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "20").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "64m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def replicate(df: DataFrame, keyCols: Seq[String], shift: Long): DataFrame = {
      val reps = spark.range(copies).select(col("id").as("_rep"))
      val wide = df.crossJoin(reps)
      keyCols.foldLeft(wide) { (d, k) =>
        d.withColumn(k, col(k) + col("_rep") * shift)
      }.drop("_rep")
    }

    // SPARK_GRAFT_PROBE_ONLY=suffix: just the suffix-doubling row
    // (token-salted replicas keep vocabularies disjoint, so repeat
    // classes replicate within copies and every round's distinct-pair
    // domain grows linearly — the property the dense re-rank rides on)
    if (sys.env.get("SPARK_GRAFT_PROBE_ONLY").contains("suffix")) {
      val docsS = graft.core.Tables.t(spark, sfDir, "documents")
        .select("doc_id", "text")
        .crossJoin(spark.range(copies).select(col("id").as("_rep")))
        .select((col("doc_id") + col("_rep") * 100000000L).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), "\\s+"),
            t => concat(col("_rep").cast("string"), lit("_"), t))).as("text"))
        .cache()
      val nDocs = docsS.count()
      val (_, tSpec) = time {
        graft.text.SuffixOps.repeatSpectrum(docsS, rounds = 7)
          .write.format("noop").mode("overwrite").save()
      }
      System.err.println("[probe] done suffix_spectrum")
      docsS.unpersist(); graft.core.FrameMemo.clear()
      println(s"""{"metric":"scale_probe","copies":$copies,"nnz":0,""" +
        s""""timings":{"suffix_spectrum_${nDocs}_docs":$tSpec}}""")
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE_ONLY=shape19: the round-6 tail text shapes
    // (token-salted replicas, disjoint vocab per copy — Gini ranks,
    // bigram pair domain and the W1 value grid all grow linearly)
    if (sys.env.get("SPARK_GRAFT_PROBE_ONLY").contains("shape19")) {
      val docsS = graft.core.Tables.t(spark, sfDir, "documents")
        .select("doc_id", "source", "n_chars", "text")
        .crossJoin(spark.range(copies).select(col("id").as("_rep")))
        .select((col("doc_id") + col("_rep") * 100000000L).as("doc_id"),
          concat(col("source"), col("_rep")).as("source"),
          (col("n_chars") + col("_rep")).as("n_chars"),
          concat_ws(" ", transform(split(col("text"), "\\s+"),
            t => concat(col("_rep").cast("string"), lit("_"), t))).as("text"))
        .cache()
      val nDocs = docsS.count()
      val outS = scala.collection.mutable.LinkedHashMap[String, Double]()
      val (_, tGini) = time {
        graft.text.TextOps.tokenGini(docsS)
          .write.format("noop").mode("overwrite").save()
      }
      outS(s"token_gini_${nDocs}_docs") = tGini
      System.err.println("[probe] done token_gini")
      val (_, tCond) = time {
        graft.text.TextOps.bigramCondEntropy(docsS)
          .write.format("noop").mode("overwrite").save()
      }
      outS(s"cond_entropy_${nDocs}_docs") = tCond
      System.err.println("[probe] done cond_entropy")
      val (_, tW1) = time {
        graft.text.TextOps.w1Drift(docsS, col("source"), col("n_chars"))
          .write.format("noop").mode("overwrite").save()
      }
      outS(s"w1_drift_${nDocs}_docs") = tW1
      System.err.println("[probe] done w1_drift")
      docsS.unpersist(); graft.core.FrameMemo.clear()
      val qsS = outS.map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
      println(s"""{"metric":"scale_probe","copies":$copies,"nnz":0,""" +
        s""""timings":$qsS}""")
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE_ONLY=hotann: ONLY the clustered-latent
    // hot-bucket refinement row — re-measured whenever the hot path
    // changes (round 9: range-partitioned chunk ranks replaced the
    // per-bucket window sort)
    if (sys.env.get("SPARK_GRAFT_PROBE_ONLY").contains("hotann")) {
      val embR = replicate(
          graft.core.Tables.t(spark, sfDir, "embeddings")
            .select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
          Seq("vec_id"), 100000000L).cache()
      val withBlock = embR.withColumn("_b", pmod(col("vec_id"), lit(5)))
      val cent = withBlock
        .select(col("_b"), posexplode(col("v")).as(Seq("_p", "_x")))
        .groupBy("_b", "_p").agg(avg("_x").as("_c"))
        .groupBy("_b").agg(array_sort(collect_list(struct(col("_p"),
          col("_c")))).as("_cs"))
        .select(col("_b"), transform(col("_cs"), s => s.getField("_c")).as("_cv"))
      val clustered = withBlock.join(broadcast(cent), Seq("_b"))
        .select(col("vec_id").as("cell_id"),
          zip_with(col("_cv"), col("v"), (c, x) => c + lit(0.05) * x)
            .as("latent"))
        .cache()
      val nClust = clustered.count()
      val (_, tHot) = time {
        graft.pipeline.Knn.bucketedSelfKnn(clustered, k = 8)
          .write.format("noop").mode("overwrite").save()
      }
      clustered.unpersist(); embR.unpersist(); graft.core.FrameMemo.clear()
      println(s"""{"metric":"scale_probe","copies":$copies,"nnz":0,""" +
        s""""timings":{"clustered_ann_knn_${nClust}_vecs":$tHot}}""")
      spark.stop()
      return
    }

    // SPARK_GRAFT_PROBE_ONLY=r8: slope rows for the round-7 bench-record
    // suspects (q60 lloyd, q64 winnowing, q176 chain contamination, q179
    // IVF+PQ probe sweep). Docs are token-salted (disjoint vocab per
    // copy, like a sharded crawl); embeddings key-shifted.
    if (sys.env.get("SPARK_GRAFT_PROBE_ONLY").contains("r8")) {
      val outR = scala.collection.mutable.LinkedHashMap[String, Double]()
      val docsS = graft.core.Tables.t(spark, sfDir, "documents")
        .select("doc_id", "text")
        .crossJoin(spark.range(copies).select(col("id").as("_rep")))
        .select((col("doc_id") + col("_rep") * 100000000L).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), "\\s+"),
            t => concat(col("_rep").cast("string"), lit("_"), t))).as("text"))
        .cache()
      val nDocs = docsS.count()
      val (_, tWin) = time {
        graft.text.TextOps.winnowFingerprints(docsS, k = 5, w = 4)
          .write.format("noop").mode("overwrite").save()
      }
      outR(s"winnow_fp_${nDocs}_docs") = tWin
      System.err.println("[probe] done winnow_fp")
      val (_, tChain) = time {
        val sh = graft.dedup.Dedup.shingles(docsS, 3).localCheckpoint()
        val prs = graft.dedup.Dedup.lshCandidatePairs(
          graft.dedup.Dedup.minHashSignature(sh, 8), 8, 2)
        graft.dedup.Dedup.chainContamination(sh, prs, jacNum = 4, jacDen = 5)
          .write.format("noop").mode("overwrite").save()
      }
      outR(s"chain_contamination_${nDocs}_docs") = tChain
      System.err.println("[probe] done chain_contamination")
      docsS.unpersist(); graft.core.FrameMemo.clear()
      val embR = replicate(
          graft.core.Tables.t(spark, sfDir, "embeddings")
            .select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
          Seq("vec_id"), 100000000L).cache()
      val nVecR = embR.count()
      val (_, tSweep) = time {
        graft.sim.Pq.ivfPqProbeSweep(embR)
          .write.format("noop").mode("overwrite").save()
      }
      outR(s"ivfpq_probe_sweep_${nVecR}_vecs") = tSweep
      System.err.println("[probe] done ivfpq_probe_sweep")
      val (_, tLl) = time {
        graft.pipeline.Cluster.lloyd(
            embR.withColumnRenamed("vec_id", "cell_id")
              .withColumnRenamed("v", "latent"), k = 3, iters = 25)
          .write.format("noop").mode("overwrite").save()
      }
      outR(s"lloyd_25it_${nVecR}_vecs") = tLl
      System.err.println("[probe] done lloyd")
      // adversarial CLUSTERED latent for the round-8 hot-bucket
      // refinement: collapse every vector toward one of 5 centroids
      // (v' = c_block + 0.05·v) so sign-LSH's origin-plane weakness —
      // a tight off-origin cluster that no plane count can split — is
      // reproduced at probe scale; without the projection-chunk
      // refinement this shape is the measured |b|² non-termination of
      // E2eScaleSpec (PERF.md round-8 notes)
      val dims = embR.select(size(col("v")).as("d")).head.getInt(0)
      val withBlock = embR.withColumn("_b", pmod(col("vec_id"), lit(5)))
      val cent = withBlock
        .select(col("_b"), posexplode(col("v")).as(Seq("_p", "_x")))
        .groupBy("_b", "_p").agg(avg("_x").as("_c"))
        .groupBy("_b").agg(array_sort(collect_list(struct(col("_p"),
          col("_c")))).as("_cs"))
        .select(col("_b"), transform(col("_cs"), s => s.getField("_c")).as("_cv"))
      val clustered = withBlock.join(broadcast(cent), Seq("_b"))
        .select(col("vec_id").as("cell_id"),
          zip_with(col("_cv"), col("v"), (c, x) => c + lit(0.05) * x)
            .as("latent"))
        .cache()
      val nClust = clustered.count()
      val (_, tHot) = time {
        graft.pipeline.Knn.bucketedSelfKnn(clustered, k = 8)
          .write.format("noop").mode("overwrite").save()
      }
      outR(s"clustered_ann_knn_${nClust}_vecs") = tHot
      System.err.println("[probe] done clustered_ann")
      clustered.unpersist()
      embR.unpersist()
      graft.core.FrameMemo.clear()
      val qsR = outR.map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}")
      println(s"""{"metric":"scale_probe","copies":$copies,"nnz":0,""" +
        s""""timings":$qsR}""")
      spark.stop()
      return
    }

    // ~12M-row COO (20 × 600k), cell keys disjoint per copy
    val coo0 = graft.core.Tables.coo(spark, sfDir)
    val coo = replicate(coo0, Seq("cell_id"), 100000000L).cache()
    val nnz = coo.count() // materialize outside the timers
    val out = scala.collection.mutable.LinkedHashMap[String, Double]()

    val (_, tCell) = time {
      graft.stats.MatrixStats.cellProps(coo).write.format("noop").mode("overwrite").save()
    }
    out("cell_props") = tCell
    System.err.println("[probe] done " + ("cell_props"))

    val (_, tHvg) = time {
      val normed = graft.norm.Normalize.libSizeLog(coo).select("cell_id", "feat_id", "normed")
      val nTot = coo.select(countDistinct("cell_id").as("n_total_cells"))
      val stats = graft.stats.MatrixStats.featureStats(normed, nTot)
      graft.stats.MatrixStats.topVariableFeatures(stats, 20, 500, 10)
        .write.format("noop").mode("overwrite").save()
    }
    out("hvg") = tHvg
    System.err.println("[probe] done " + ("hvg"))

    val (_, tMarkers) = time {
      val groups = coo.select("cell_id").distinct()
        .select(col("cell_id"), pmod(col("cell_id"), lit(5)).cast("string").as("group"))
      graft.stats.Markers.findMarkersByRank(coo, groups)
        .write.format("noop").mode("overwrite").save()
    }
    out("markers_12M") = tMarkers
    System.err.println("[probe] done " + ("markers_12M"))

    // ANN at 20× the embedding count: 40k vectors (2000 × 20 copies)
    val emb0 = graft.core.Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("latent"))
    val emb = replicate(emb0.withColumnRenamed("vec_id", "cell_id"),
      Seq("cell_id"), 100000000L).cache()
    val nVec = emb.count()
    // planes default 10 (right for ~40k); override to probe the sizing
    // rule (planes ~ log2(n / target occupancy)) at larger replication
    val annPlanes = sys.env.getOrElse("SPARK_GRAFT_ANN_PLANES", "10").toInt
    val (_, tAnn) = time {
      graft.pipeline.Knn.bucketedSelfKnn(emb, 5, nPlanes = annPlanes, rounds = 6)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"bucketed_knn_${nVec}_p$annPlanes") = tAnn
    System.err.println("[probe] done " + (s"bucketed_knn_${nVec}_p$annPlanes"))

    val (_, tDedup) = time {
      val docs = replicate(
        graft.core.Tables.t(spark, sfDir, "documents").select("doc_id", "text"),
        Seq("doc_id"), 100000000L)
      graft.dedup.Dedup.exactDupGroups(docs).write.format("noop").mode("overwrite").save()
    }
    out("exact_dedup_100k_docs") = tDedup
    System.err.println("[probe] done " + ("exact_dedup_100k_docs"))

    // deterministic Lloyd's at 20× the vector count (the q60 clustering
    // core): per iteration one aggregation; centers-only driver traffic
    val (_, tLloyd) = time {
      graft.pipeline.Cluster.lloyd(emb, k = 3, iters = 25)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"lloyd_25it_${nVec}") = tLloyd
    System.err.println("[probe] done " + (s"lloyd_25it_${nVec}"))

    // sketched Paris at 20×: the driver only ever collects the contracted
    // supergraph — record the contraction ratio alongside the time
    val knnE = graft.pipeline.Knn.bucketedSelfKnn(emb, 5, nPlanes = 10, rounds = 4)
      .select(col("src"), col("dst"), lit(1.0).as("weight")).cache()
    knnE.count()
    val clusters = emb.select(col("cell_id"),
      pmod(col("cell_id"), lit(8)).as("cluster"))
    val ((nAnchors, nCells2), tParis) = time {
      // usePcst = false: the probe measures the never-collect scale path
      val sk = graft.graph.Sketch.topacedo(knnE, clusters, usePcst = false)
        .filter(col("sketched")).count()
      graft.pipeline.Paris.sketchedCut(knnE, clusters, nClusters = 8)
        .write.format("noop").mode("overwrite").save()
      (sk, nVec)
    }
    out(s"sketched_paris_${nAnchors}_of_$nCells2") = tParis
    System.err.println("[probe] done " + (s"sketched_paris_${nAnchors}_of_$nCells2"))

    // metrics path at replication scale: graph silhouette (ANN edges +
    // k-bounded per-cluster samples) and LISI (per-cell kernel over
    // k-bounded neighbor lists, graph build included) — measures the
    // round-4 q61 fix's scaling claim instead of arguing it
    val (_, tSil) = time {
      graft.pipeline.Metrics.silhouetteScores(knnE, clusters, emb, k0 = 11)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"silhouette_$nVec") = tSil
    System.err.println("[probe] done " + (s"silhouette_$nVec"))
    val (_, tLisi) = time {
      val knnD = graft.pipeline.Knn.bucketedSelfKnn(emb, 10, nPlanes = 10, rounds = 4)
        .select(col("src"), col("dst"), col("dist"))
      val labels = emb.select(col("cell_id"),
        pmod(col("cell_id"), lit(5)).cast("string").as("label"))
      graft.pipeline.Metrics.lisi(knnD, labels, perplexity = 5.0)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"lisi_$nVec") = tLisi
    System.err.println("[probe] done " + (s"lisi_$nVec"))
    knnE.unpersist(); graft.core.FrameMemo.clear()

    // distributed connected components on a 2M-node chain forest: 1000-long
    // chains are the diameter worst case where plain label propagation
    // needs 1000 rounds; large/small-star must close them in O(log n)
    val (_, tCc) = time {
      val n = 2000000L
      val edges = spark.range(1L, n).select(col("id").as("src"),
        when(col("id") % 1000 === 0, col("id")).otherwise(col("id") - 1).as("dst"))
        .filter(col("src") =!= col("dst"))
      graft.graph.ConnectedComponents.labels(edges)
        .write.format("noop").mode("overwrite").save()
    }
    out("connected_components_2M_chains") = tCc
    System.err.println("[probe] done " + ("connected_components_2M_chains"))

    // text-pipeline tails at 100k docs (20 × 5k): repetition signals,
    // token packing (range-partitioned running total), decontamination
    val docsRep = replicate(
      graft.core.Tables.t(spark, sfDir, "documents").select("doc_id", "text"),
      Seq("doc_id"), 100000000L).cache()
    val nDocs = docsRep.count()
    val (_, tRep) = time {
      graft.text.TextOps.repetitionStats(docsRep)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"repetition_${nDocs}_docs") = tRep
    System.err.println("[probe] done " + (s"repetition_${nDocs}_docs"))
    val (_, tPack) = time {
      graft.text.Mix.packChunks(docsRep, 2048)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"pack_chunks_${nDocs}_docs") = tPack
    System.err.println("[probe] done " + (s"pack_chunks_${nDocs}_docs"))
    val (_, tDecon) = time {
      val ev = graft.core.Tables.t(spark, sfDir, "documents")
        .filter(col("doc_id") % 100 === 0).select("doc_id", "text")
      graft.dedup.Dedup.decontaminate(docsRep, ev, 5, dfCap = 500)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"decontaminate_${nDocs}_docs") = tDecon
    System.err.println("[probe] done " + (s"decontaminate_${nDocs}_docs"))

    // exact-substring dedup at 100k/200k docs: key-shifted copies make
    // EVERY window corpus-duplicated — the join-back and island pass run
    // over the full window set, the operator's worst case
    val (_, tDupWin) = time {
      graft.dedup.Dedup.dupWindowStats(docsRep, 10)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"dup_substrings_${nDocs}_docs") = tDupWin
    System.err.println("[probe] done " + (s"dup_substrings_${nDocs}_docs"))
    // passage dedup under the same total-duplication worst case: every
    // replicated copy shares every passage with the base doc, so the
    // digest join-back fans out `copies`-wide on every passage — the
    // operator's maximum join volume for a given corpus size
    val (_, tPassage) = time {
      graft.text.TextOps.passageDedup(docsRep, 15)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"passage_dedup_${nDocs}_docs") = tPassage
    System.err.println("[probe] done " + (s"passage_dedup_${nDocs}_docs"))
    // the 5-gram LM is the join-heaviest text-pipeline shape (five count
    // aggregations + nine per-position joins); replicated copies multiply
    // every count by `copies` without changing the type universe — the
    // worst case for the join-back volume, not the aggregation
    val (_, tLm5) = time {
      graft.text.TextOps.lmPerplexity5(docsRep)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"lm5gram_${nDocs}_docs") = tLm5
    System.err.println("[probe] done " + (s"lm5gram_${nDocs}_docs"))
    // round-6 mining shapes at the same 100k-doc volume. skip-gram PMI:
    // the pair fan-out is row-local (3× bigram volume), only (w1, w2)
    // counts shuffle; replication multiplies counts, not the type space
    val (_, tSkip) = time {
      graft.text.TextOps.skipgramPmi(docsRep, window = 3, minCount = 25)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"skipgram_pmi_${nDocs}_docs") = tSkip
    System.err.println("[probe] done " + (s"skipgram_pmi_${nDocs}_docs"))
    // containment decontamination under the decontaminate row's worst
    // case: unsalted replicas make EVERY copy share every eval shingle,
    // so the inverted-index join fans `copies`-wide per eval shingle
    val (_, tCont) = time {
      val ev = graft.core.Tables.t(spark, sfDir, "documents")
        .filter(col("doc_id") % 100 === 0).select("doc_id", "text")
      graft.dedup.Dedup.containmentContamination(docsRep, ev, 5, dfCap = 500)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"containment_${nDocs}_docs") = tCont
    System.err.println("[probe] done " + (s"containment_${nDocs}_docs"))
    // banded fingerprint near-dup at production width (60-bit md5-derived
    // fingerprints — a 16-bit simhash has only 16 buckets per band and
    // stops being a fingerprint at this volume): every doc carries
    // `copies − 1` identical replicas, so each band bucket holds the
    // full replica group — the maximum per-group fan the image-pHash
    // path can see
    val (_, tFp) = time {
      val fps = docsRep.select(col("doc_id"),
        expr("cast(conv(substring(md5(text), 1, 15), 16, 10) as bigint)").as("fp"))
      graft.dedup.Dedup.fingerprintNearDup(fps, 60, 4, 3)
        .groupBy("ham").agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    out(s"fingerprint_neardup_${nDocs}_docs") = tFp
    System.err.println("[probe] done " + (s"fingerprint_neardup_${nDocs}_docs"))
    docsRep.unpersist(); graft.core.FrameMemo.clear()
    // int8-quantized ANN scoring under the same adversarial replica
    // occupancy floor as the bucketed-ANN rows (every vector has
    // copies−1 exact replicas sharing every bucket)
    val (_, tQuant) = time {
      graft.sim.Similarity.quantizedSelfTopK(
          emb.withColumnRenamed("cell_id", "vec_id")
            .withColumnRenamed("latent", "embedding"), 5, rounds = 2)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"quantized_knn_$nVec") = tQuant
    System.err.println("[probe] done " + (s"quantized_knn_$nVec"))
    // hard-negative mining under the same adversarial replica occupancy:
    // pmod labels give every replica a DIFFERENT label from most of its
    // identical copies, so the dist-0 replica pairs survive the label
    // filter — the candidate set is the ANN worst case plus two label
    // joins riding the top-k shuffle
    val (_, tHn) = time {
      graft.pipeline.Knn.hardNegatives(
          emb.withColumn("label", pmod(col("cell_id"), lit(10))),
          3, rounds = 4)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"hard_negatives_$nVec") = tHn
    System.err.println("[probe] done " + (s"hard_negatives_$nVec"))
    emb.unpersist()

    // the q58/q59 shapes at replication scale (round-4 watch items): the
    // seeded pseudo-rep pseudobulk is one md5-gated groupBy over the COO;
    // the LOWESS chain is normalize → featureStats → nBins-bounded
    // driver solve — both should scale with the COO volume, nothing else
    val (_, tBulk) = time {
      val groups = coo.select("cell_id").distinct()
        .select(col("cell_id"), pmod(col("cell_id"), lit(5)).cast("string").as("group"))
      graft.stats.Pseudobulk.makeBulk(coo, groups, pseudoReps = 3, seed = 4466L)
        .write.format("noop").mode("overwrite").save()
    }
    out("make_bulk_reps_12M") = tBulk
    System.err.println("[probe] done " + ("make_bulk_reps_12M"))
    val (_, tLowess) = time {
      val normed = graft.norm.Normalize.libSizeLog(coo)
        .select("cell_id", "feat_id", "normed")
      val stats = graft.stats.MatrixStats.featureStats(
        normed, coo.select(countDistinct("cell_id").as("n_total_cells")))
      graft.stats.Lowess.correctedVar(stats, nBins = 10, frac = 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    out("hvg_lowess_12M") = tLowess
    System.err.println("[probe] done " + ("hvg_lowess_12M"))
    coo.unpersist()

    // temporal joins + event analytics at `copies`× users (key-shifted
    // user_id — more keys at the generator's per-user density, the
    // scale path these single-shuffle-per-key plans are designed for)
    val evRep = replicate(
      graft.core.Tables.events(spark, sfDir)
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .select("event_id", "user_id", "ts_us", "event_type", "value"),
      Seq("user_id", "event_id"), 100000000L).cache()
    val nEv = evRep.count()
    val (_, tAsof) = time {
      graft.ops.AsOf.asofJoin(
          evRep.filter(col("event_type") === "view")
            .select("event_id", "user_id", "ts_us"),
          evRep.filter(col("event_type") === "purchase")
            .select("event_id", "user_id", "ts_us", "value"),
          "user_id", "ts_us", "event_id", "value")
        .write.format("noop").mode("overwrite").save()
    }
    out(s"asof_join_${nEv}_events") = tAsof
    System.err.println("[probe] done " + (s"asof_join_${nEv}_events"))
    val (_, tRange) = time {
      graft.ops.AsOf.rangePairs(evRep.select("user_id", "ts_us", "event_id"),
          "user_id", "ts_us", "event_id", 21600000000L)
        .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
        .write.format("noop").mode("overwrite").save()
    }
    out(s"range_pairs_${nEv}_events") = tRange
    System.err.println("[probe] done " + (s"range_pairs_${nEv}_events"))
    val (_, tFunnel) = time {
      graft.analytics.Analytics.funnel(evRep, Seq("view", "click", "purchase"))
        .write.format("noop").mode("overwrite").save()
    }
    out(s"funnel_${nEv}_events") = tFunnel
    System.err.println("[probe] done " + (s"funnel_${nEv}_events"))
    val (_, tKmv) = time {
      graft.stats.Sketches.kmvDistinct(evRep, "event_type", "user_id", 64)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"kmv_${nEv}_events") = tKmv
    System.err.println("[probe] done " + (s"kmv_${nEv}_events"))
    evRep.unpersist()

    // dedup shapes at `copies`× the document count. Plain replication
    // would collapse under the shingle-level DISTINCTs (copies share
    // every shingle), so each copy's tokens are prefixed with its rep id
    // — genuinely disjoint shingle space, like a sharded crawl.
    val docsSalt = graft.core.Tables.t(spark, sfDir, "documents")
      .select("doc_id", "source", "text")
      .crossJoin(spark.range(copies).select(col("id").as("_rep")))
      .select((col("doc_id") + col("_rep") * 100000000L).as("doc_id"),
        col("source"),
        concat_ws(" ", transform(split(col("text"), "\\s+"),
          t => concat(col("_rep").cast("string"), lit("_"), t))).as("text"))
      .cache()
    val nDocsSalt = docsSalt.count()
    val (_, tInc) = time {
      graft.dedup.Dedup.incrementalDedup(
          docsSalt.filter(col("doc_id") % 2 === 0).select("doc_id", "text"),
          docsSalt.filter(col("doc_id") % 2 === 1).select("doc_id", "text"),
          8, 2, 1, 2)
        .groupBy("verdict").agg(count(lit(1)))
        .write.format("noop").mode("overwrite").save()
    }
    out(s"incremental_dedup_${nDocsSalt}_docs") = tInc
    System.err.println("[probe] done " + (s"incremental_dedup_${nDocsSalt}_docs"))
    val (_, tOv) = time {
      graft.dedup.Dedup.overlapMatrix(docsSalt, col("source"), 3)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"overlap_matrix_${nDocsSalt}_docs") = tOv
    System.err.println("[probe] done " + (s"overlap_matrix_${nDocsSalt}_docs"))
    docsSalt.unpersist()

    // session-5 shapes: the asymmetric eval→corpus radius probe (q157),
    // token-balanced sharding (q159), and greedy k-centers (q161) at
    // `copies`× — the first should scale with corpus bucketing cost,
    // sharding with the sort, k-centers with k scans
    val (_, tProbe) = time {
      val evalSet = emb.filter(col("cell_id") % 25 === 0)
        .select((col("cell_id") + 500000000L).as("cell_id"),
          transform(col("latent"), x => x * 1.2).as("latent"))
      graft.pipeline.Knn.bucketedEpsNeighborsBetween(evalSet, emb, eps = 0.3)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"semantic_probe_${nVec}_vecs") = tProbe
    System.err.println("[probe] done " + (s"semantic_probe_${nVec}_vecs"))
    val docsRep2 = replicate(
      graft.core.Tables.t(spark, sfDir, "documents").select("doc_id", "text"),
      Seq("doc_id"), 100000000L).cache()
    val nDocsRep2 = docsRep2.count()
    val (_, tShard) = time {
      graft.text.Mix.shardAssign(docsRep2, nShards = 64, seed = 7)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"shard_assign_${nDocsRep2}_docs") = tShard
    System.err.println("[probe] done " + (s"shard_assign_${nDocsRep2}_docs"))
    docsRep2.unpersist()
    val (_, tKc) = time {
      graft.sim.Similarity.kCenters(
          emb.select(col("cell_id").as("vec_id"), col("latent").as("embedding")),
          k = 8)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"kcenters_8_${nVec}_vecs") = tKc
    System.err.println("[probe] done " + (s"kcenters_8_${nVec}_vecs"))

    // session-7 shapes: IVF+PQ (two Lloyd stages + routed ADC — should
    // scale with the linear assignment/encode passes at fixed
    // nLists/iters), KMV set algebra (one distinct-agg + k-row pair
    // expansion; the exact validation columns dominate growth), and the
    // detector PR sweep (banded self-join + df-capped truth join).
    val (_, tIvfPq) = time {
      graft.sim.Pq.ivfPqTopK(
          emb.select(col("cell_id").as("vec_id"), col("latent").as("v")),
          queryMod = 500)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"ivfpq_${nVec}_vecs") = tIvfPq
    System.err.println("[probe] done " + (s"ivfpq_${nVec}_vecs"))
    val docsSalt2 = graft.core.Tables.t(spark, sfDir, "documents")
      .select("doc_id", "source", "text")
      .crossJoin(spark.range(copies).select(col("id").as("_rep")))
      .select((col("doc_id") + col("_rep") * 100000000L).as("doc_id"),
        col("source"),
        concat_ws(" ", transform(split(col("text"), "\\s+"),
          t => concat(col("_rep").cast("string"), lit("_"), t))).as("text"))
      .cache()
    docsSalt2.count()
    // sketch-only (withExact = false): the 100 TB plan — the exact
    // validation columns are a pair fan-out of the full hash table and
    // deliberately NOT the path this row measures (their cost is the
    // oracle's price, not the operator's)
    val (_, tKmvSet) = time {
      val sh2 = graft.dedup.Dedup.shingles(
          docsSalt2.select(col("source").as("doc_id"), col("text")), 3)
        .select(col("doc_id").as("source"), col("shingle"))
      graft.stats.Sketches.kmvSetOps(sh2, "source", "shingle", k = 128,
          withExact = false)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"kmv_setops_${copies}x_docs") = tKmvSet
    System.err.println("[probe] done " + (s"kmv_setops_${copies}x_docs"))
    val (_, tDetPr) = time {
      graft.dedup.Dedup.detectorPr(
          graft.dedup.Dedup.shingles(docsSalt2.select("doc_id", "text"), 3),
          numHashes = 8, rowsPerBand = 2, jacNum = 2, jacDen = 5)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"detector_pr_${copies}x_docs") = tDetPr
    System.err.println("[probe] done " + (s"detector_pr_${copies}x_docs"))
    // prefix-blocked edit-distance near-dup: the salted tokens make
    // every replica's blocks disjoint, so candidate pairs grow linearly
    // with copies — the property the prefix key + block cap exist to keep
    val (_, tEdit) = time {
      graft.dedup.Dedup.editDistanceNearDup(
          docsSalt2.select("doc_id", "text"), maxDist = 10)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"edit_neardup_${copies}x_docs") = tEdit
    System.err.println("[probe] done " + (s"edit_neardup_${copies}x_docs"))
    // association rules: the row-local pair flatten dominates; disjoint
    // per-replica vocabularies grow the (a, b) pair domain linearly.
    // supNum = 0 keeps every pair through the unigram joins so the full
    // plan is measured (a real threshold would only shrink it)
    val (_, tAssoc) = time {
      graft.text.TextOps.associationRules(
          docsSalt2.select("doc_id", "text"), supNum = 0, supDen = 1)
        .write.format("noop").mode("overwrite").save()
    }
    out(s"assoc_rules_${copies}x_docs") = tAssoc
    System.err.println("[probe] done " + (s"assoc_rules_${copies}x_docs"))
    docsSalt2.unpersist()

    val qs = out.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_probe","copies":$copies,"nnz":$nnz,"timings":$qs}""")
    spark.stop()
  }
}
