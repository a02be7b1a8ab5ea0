package graft

import org.apache.spark.sql.functions._

/** Plan-shape proofs for the two scale techniques the operator suite
  * relies on implicitly but no query can assert through the oracle:
  *
  *  - **bucketed co-located joins**: two tables bucketed + sorted on the
  *    join key sort-merge-join with NO shuffle exchange on either side —
  *    the persisted-layout answer to "this join runs every day on the
  *    same keys" (pre-shuffling once at write time instead of per query);
  *  - **scan pruning**: predicates and projections reach the parquet
  *    reader (PushedFilters / ReadSchema), so a 2-column query over a
  *    wide 100 TB table reads 2 columns, not the table.
  */
class ScaleShapeSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("bucketed tables sort-merge-join with zero shuffle exchanges") {
    // explicit per-table paths (warehouse.dir is a static conf); the
    // in-memory catalog only holds the bucketing metadata.
    val wh = tmpDir("graft_wh")
    // bucketed SMJ requires matching bucket counts and disabled
    // broadcast (a broadcast join would hide the property being proven)
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
      val b = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "vb")
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .option("path", s"$wh/ta").saveAsTable("graft_bkt_a")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .option("path", s"$wh/tb").saveAsTable("graft_bkt_b")
      val joined = spark.table("graft_bkt_a")
        .join(spark.table("graft_bkt_b"), Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")
      assert(joined.count() == 1000L)
      // the same join on UNBUCKETED parquet shuffles both sides — the
      // control that proves the layout (not the data size) removed it
      val pa = s"$wh/pa"; val pb = s"$wh/pb"
      a.write.mode("overwrite").parquet(pa)
      b.write.mode("overwrite").parquet(pb)
      val control = spark.read.parquet(pa)
        .join(spark.read.parquet(pb), Seq("k"))
      assert(control.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
    }
  }

  test("filters and projections reach the parquet scan") {
    val dir = tmpDir("graft_scan")
    (1L to 500L).map(i => (i, s"t$i", s"s${i % 7}", i * 3))
      .toDF("doc_id", "text", "source", "n_chars")
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .filter(col("doc_id") > 400L)
      .select("doc_id", "source")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(doc_id,400)"),
      scan.take(1200))
    // column pruning: the reader schema carries ONLY the two live columns
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("source")
      && !readSchema.contains("text") && !readSchema.contains("n_chars"),
      readSchema)
    assert(q.count() == 100L)
  }

  test("partitioned layout: filters prune partitions at plan time") {
    val dir = tmpDir("graft_part")
    val ev = (1L to 300L).map(i =>
      (i, Seq("view", "click", "purchase")((i % 3).toInt), i * 1.0))
      .toDF("event_id", "event_type", "value")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "purchase")
      .agg(sum(col("value")))
    // the partition predicate must land in PartitionFilters (pruned at
    // planning), NOT PushedFilters (evaluated per row group)
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(800))
    val pf = scan.split("PartitionFilters: ")(1).split("]")(0)
    assert(pf.contains("event_type"), s"partition filter missing: $pf")
    // and the planned scan selects ONLY the matching partition (1 of 3),
    // with the unfiltered scan as the control
    def selected(df: org.apache.spark.sql.DataFrame) = {
      // AQE wraps the physical plan in an AdaptiveSparkPlanExec leaf —
      // unwrap to reach the actual scan node
      val plan = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      plan.collectLeaves()
        .collectFirst { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          (f.selectedPartitions.partitionCount,
            f.selectedPartitions.totalNumberOfFiles) }.get
    }
    val (nPart, nFiles) = selected(q)
    val (nPartAll, nFilesAll) = selected(
      spark.read.parquet(dir).agg(sum(col("value"))))
    assert(nPart == 1 && nPartAll == 3,
      s"pruning must keep 1 of 3 partitions (got $nPart of $nPartAll)")
    assert(nFiles < nFilesAll)
    assert(q.head().getDouble(0) ==
      (1L to 300L).filter(_ % 3 == 2).map(_ * 1.0).sum)
  }

  test("quantileNormalize plans window-free: broadcast range probe, no Window, no SMJ blowup") {
    // the docstring's scale claim, asserted on the physical plan: the
    // within-group ranks and the pooled order statistic come from
    // bounded distinct-value tables (broadcast), never a Window over
    // the data and never an un-broadcast nested-loop join
    val df = (1L to 500L).map(i => (i, s"s${i % 5}", i % 37))
      .toDF("id", "g", "v")
    val out = graft.text.TextOps.quantileNormalize(df, col("id"),
      col("g"), col("v"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window leaked:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    // the range probe into the global cumulative IS a broadcast NLJ —
    // bounded side broadcast, the allowed shape for inequality joins
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(1200))
    assert(out.count() == 500L)
  }
}
