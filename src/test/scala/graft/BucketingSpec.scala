package graft

import graft.sources.BucketedTables
import org.apache.spark.sql.functions._

/** Proves the co-located join claim the scale docs make: two tables
  * bucketed by the join key plan a sort-merge join with ZERO
  * exchanges — the shuffle is paid once at write time and never
  * again.
  */
class BucketingSpec extends SparkSpec {

  test("join of two same-bucketed tables plans no exchange") {
    val sf = "/root/testdata/sf0.001"
    val prevBroadcast =
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      BucketedTables.writeBucketed(
        Tables.load(spark, sf, "customer"), "cust_bkt", 4,
        Seq("c_custkey"))
      BucketedTables.writeBucketed(
        Tables.load(spark, sf, "orders")
          .withColumnRenamed("o_custkey", "c_custkey"), "ord_bkt", 4,
        Seq("c_custkey"))
      val joined = spark.table("cust_bkt")
        .join(spark.table("ord_bkt"), "c_custkey")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      // the join itself is exchange-free; the only exchange allowed
      // in the whole plan is the groupBy's (4-bucket -> segment keys)
      val exchanges = "Exchange".r.findAllIn(plan).length
      assert(exchanges == 1,
        s"bucketed join must not shuffle its inputs:\n$plan")
      // and the result is the same as the plain (shuffled) join
      val plain = Tables.load(spark, sf, "customer")
        .join(Tables.load(spark, sf, "orders"),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(joined.orderBy("c_mktsegment").collect().toSeq ==
        plain.orderBy("c_mktsegment").collect().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS cust_bkt")
      spark.sql("DROP TABLE IF EXISTS ord_bkt")
    }
  }

  test("maintainBucketed: audit-gated — fresh table no-op, appended table compacted, idempotent") {
    import spark.implicits._
    def rows(a: Int, b: Int) =
      (a until b).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    try {
      BucketedTables.writeBucketed(rows(0, 40), "maint_bkt", 4, Seq("k"))
      // fresh table: exactly one file per bucket -> amplification 1.0
      assert(BucketedTables.fileAmplification(spark, "maint_bkt", 4) == 1.0)
      assert(!BucketedTables.maintainBucketed(spark, "maint_bkt", 4,
        Seq("k")), "fresh table must be a no-op")
      // three appends push files-per-bucket to ~4 > threshold 2.0
      BucketedTables.appendBucketed(rows(40, 80), "maint_bkt", 4, Seq("k"))
      BucketedTables.appendBucketed(rows(80, 120), "maint_bkt", 4, Seq("k"))
      BucketedTables.appendBucketed(rows(120, 160), "maint_bkt", 4, Seq("k"))
      val ampBefore = BucketedTables.fileAmplification(spark, "maint_bkt", 4)
      assert(ampBefore > 2.0, s"appends must amplify files, got $ampBefore")
      val expect = rows(0, 160).as[(Long, String)].collect().toSet
      assert(BucketedTables.maintainBucketed(spark, "maint_bkt", 4,
        Seq("k")), "over-threshold table must compact")
      assert(BucketedTables.fileAmplification(spark, "maint_bkt", 4) == 1.0)
      assert(spark.table("maint_bkt").as[(Long, String)].collect().toSet
        == expect, "compaction must be row-identical")
      // idempotent: the second call finds a healthy layout and does nothing
      assert(!BucketedTables.maintainBucketed(spark, "maint_bkt", 4,
        Seq("k")))
      // a crashed write's _temporary subtree (normally-named part
      // files under a hidden dir) must not count as data or partition
      // slots — the audit walks every segment below the root
      val ident = spark.sessionState.sqlParser
        .parseTableIdentifier("maint_bkt")
      val loc = new java.io.File(java.net.URI.create(
        spark.sessionState.catalog.getTableMetadata(ident)
          .location.toString))
      val junk = new java.io.File(loc, "_temporary/0/task_0")
      assert(junk.mkdirs())
      java.nio.file.Files.write(
        new java.io.File(junk, "part-00000.parquet").toPath,
        Array.fill(16)(0x5a.toByte))
      assert(BucketedTables.fileAmplification(spark, "maint_bkt", 4)
        == 1.0, "hidden-subtree files must not skew the audit")
      assert(!BucketedTables.maintainBucketed(spark, "maint_bkt", 4,
        Seq("k")), "junk under _temporary must not trigger compaction")
    } finally {
      spark.sql("DROP TABLE IF EXISTS maint_bkt")
      spark.sql("DROP TABLE IF EXISTS maint_bkt_compacting")
    }
  }

  test("dropStaleStaging: clears the pre-swap crash orphan, never touches " +
    "a recoverable half-swap (round 16, ADVICE)") {
    import spark.implicits._
    val data = (0 until 10).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    try {
      BucketedTables.writeBucketed(data, "stale_bkt", 2, Seq("k"))
      // no staging at all: no-op
      assert(!BucketedTables.dropStaleStaging(spark, "stale_bkt"))
      // live + staging (crash AFTER the staging write, BEFORE the
      // live drop): the staging copy is garbage — drop it, keep live
      BucketedTables.writeBucketed(spark.table("stale_bkt"),
        "stale_bkt_compacting", 2, Seq("k"))
      assert(BucketedTables.dropStaleStaging(spark, "stale_bkt"))
      assert(!spark.catalog.tableExists("stale_bkt_compacting"))
      assert(spark.table("stale_bkt").count() == 10)
      // staging WITHOUT live (crash after the live drop): that copy
      // is the ONLY copy — dropStaleStaging must refuse, so the
      // rewriteBucketed recovery can still finish the swap
      BucketedTables.writeBucketed(spark.table("stale_bkt"),
        "stale_bkt_compacting", 2, Seq("k"))
      spark.sql("DROP TABLE stale_bkt")
      assert(!BucketedTables.dropStaleStaging(spark, "stale_bkt"))
      assert(spark.catalog.tableExists("stale_bkt_compacting"))
      BucketedTables.compactBucketed(spark, "stale_bkt", 2, Seq("k"))
      assert(spark.table("stale_bkt").count() == 10)
    } finally {
      spark.sql("DROP TABLE IF EXISTS stale_bkt")
      spark.sql("DROP TABLE IF EXISTS stale_bkt_compacting")
    }
  }

  test("dropTableAndDir: removes the catalog entry AND an orphaned " +
    "warehouse directory a previous JVM left behind (round 16)") {
    import spark.implicits._
    val data = (0 until 5).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    try {
      BucketedTables.writeBucketed(data, "orphan_bkt", 2, Seq("k"))
      // registered table: both entry and directory go
      BucketedTables.dropTableAndDir(spark, "orphan_bkt")
      assert(!spark.catalog.tableExists("orphan_bkt"))
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), "orphan_bkt")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      assert(!fs.exists(loc))
      // orphaned DIRECTORY with no catalog entry (the killed-JVM
      // case this helper exists for): a bare CREATE refuses the
      // location, dropTableAndDir clears it, CREATE then succeeds
      fs.mkdirs(loc)
      fs.create(new org.apache.hadoop.fs.Path(loc, "garbage")).close()
      assertThrows[Exception] {
        BucketedTables.writeBucketed(data, "orphan_bkt", 2, Seq("k"))
      }
      BucketedTables.dropTableAndDir(spark, "orphan_bkt")
      assert(!fs.exists(loc))
      BucketedTables.writeBucketed(data, "orphan_bkt", 2, Seq("k"))
      assert(spark.table("orphan_bkt").count() == 5)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orphan_bkt")
    }
  }

  test("compactBucketed crash recovery: half-swapped state resumes, never drops the only copy") {
    import spark.implicits._
    val data = (0 until 30).map(i => (i.toLong, s"p${i % 3}", s"v$i"))
      .toDF("k", "p", "v")
    try {
      // reproduce the crash window exactly: live table dropped, fully
      // written staging left behind (partitioned, to exercise the
      // MSCK path of the resumed swap too)
      BucketedTables.writeBucketed(data, "crash_bkt", 2, Seq("k"),
        partitionCols = Seq("p"))
      val expect = data.select("k", "p", "v")
        .as[(Long, String, String)].collect().toSet
      def tableRows() = spark.table("crash_bkt").select("k", "p", "v")
        .as[(Long, String, String)].collect().toSet
      BucketedTables.writeBucketed(spark.table("crash_bkt"),
        "crash_bkt_compacting", 2, Seq("k"), partitionCols = Seq("p"))
      spark.sql("DROP TABLE crash_bkt") // <- crash here, pre-rename
      // recommended recovery = re-run; it must FINISH the swap, not
      // drop the staging copy (the only copy) first
      BucketedTables.compactBucketed(spark, "crash_bkt", 2, Seq("k"),
        partitionCols = Seq("p"))
      assert(tableRows() == expect, "recovered table must hold all rows")
      assert(!spark.catalog.tableExists("crash_bkt_compacting"))
      // maintainBucketed performs the same recovery unconditionally
      BucketedTables.writeBucketed(spark.table("crash_bkt"),
        "crash_bkt_compacting", 2, Seq("k"), partitionCols = Seq("p"))
      spark.sql("DROP TABLE crash_bkt")
      assert(BucketedTables.maintainBucketed(spark, "crash_bkt", 2,
        Seq("k"), Seq("p")), "maintain must report the recovery ran")
      assert(tableRows() == expect)
      // the LATER crash window: swap renamed but MSCK not yet run.
      // On Hive-style catalogs the partitions then point at the
      // pre-rename paths (empty reads); compactBucketed must repair
      // partitions at entry BEFORE reading the live table, so the
      // re-run can never compact an empty read and drop the real
      // copy. (The in-memory catalog rewrites partition locations on
      // rename, so here the entry repair is exercised as a no-op —
      // the assertion pins the recovery contract: all rows survive
      // a re-run from this state.)
      BucketedTables.writeBucketed(spark.table("crash_bkt"),
        "crash_bkt_compacting", 2, Seq("k"), partitionCols = Seq("p"))
      spark.sql("DROP TABLE crash_bkt")
      spark.sql("ALTER TABLE crash_bkt_compacting RENAME TO crash_bkt")
      // <- crash here, pre-MSCK; recommended recovery = re-run
      BucketedTables.compactBucketed(spark, "crash_bkt", 2, Seq("k"),
        partitionCols = Seq("p"))
      assert(tableRows() == expect,
        "re-run from the renamed-but-unrepaired state must keep all rows")
      // and with neither live nor staging present, fail loudly
      spark.sql("DROP TABLE crash_bkt")
      intercept[IllegalStateException] {
        BucketedTables.compactBucketed(spark, "crash_bkt", 2, Seq("k"),
          partitionCols = Seq("p"))
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS crash_bkt")
      spark.sql("DROP TABLE IF EXISTS crash_bkt_compacting")
    }
  }

  test("maintainBandedIndexTable / maintainDigestIndexTable: one idempotent call, probe layout preserved") {
    import spark.implicits._
    import graft.operators.Dedup
    def docsDf(ids: Range) = ids.map(i =>
      (i.toLong, s"doc number $i body ${(i * 13) % 7}"))
      .toDF("doc_id", "text")
    val fp = (df: org.apache.spark.sql.DataFrame) => df.select(
      col("doc_id"),
      graft.streaming.StreamingOps.doorFingerprint(col("text")).as("fp"))
    try {
      Dedup.createBandedIndexTable(fp(docsDf(0 until 40)), "doc_id",
        "fp", "maint_bands", buckets = 2)
      Dedup.createDigestIndexTable(docsDf(0 until 40), "text",
        "maint_digs", buckets = 2)
      // fresh: audits pass, nothing rewritten
      assert(!Dedup.maintainBandedIndexTable(spark, "maint_bands", 2))
      assert(!Dedup.maintainDigestIndexTable(spark, "maint_digs", 2))
      // a run of appends degrades the layout past the floor
      for (b <- 0 until 3) {
        val batch = docsDf((100 + 40 * b) until (140 + 40 * b))
        Dedup.appendToBandedIndexTable(fp(batch), "doc_id", "fp",
          "maint_bands", buckets = 2)
        Dedup.appendToDigestIndexTable(batch, "text", "maint_digs",
          buckets = 2)
      }
      val bandExpect = spark.table("maint_bands")
        .select("doc", "sim", "band", "bits")
        .as[(Long, Long, Int, Long)].collect().toSet
      assert(Dedup.maintainBandedIndexTable(spark, "maint_bands", 2))
      assert(Dedup.maintainDigestIndexTable(spark, "maint_digs", 2))
      assert(spark.table("maint_bands")
        .select("doc", "sim", "band", "bits")
        .as[(Long, Long, Int, Long)].collect().toSet == bandExpect)
      assert(spark.table("maint_digs").count() ==
        spark.table("maint_digs").select("digest").distinct().count())
      // compacted layout is healthy again: maintain is now a no-op
      assert(!Dedup.maintainBandedIndexTable(spark, "maint_bands", 2))
      assert(!Dedup.maintainDigestIndexTable(spark, "maint_digs", 2))
    } finally {
      Seq("maint_bands", "maint_digs", "maint_bands_compacting",
        "maint_digs_compacting").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
