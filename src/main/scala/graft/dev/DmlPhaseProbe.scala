package graft.dev

import org.apache.spark.sql.SparkSession

/** Dev-only: per-statement timing of the x70-shaped DML lifecycle
  * (CREATE / INSERT / two UPDATEs / final aggregate), run twice in one
  * JVM so the second round's numbers are warm-marginal.
  * Usage: runMain graft.dev.DmlPhaseProbe [sfDir] [cpus]
  */
object DmlPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("ERROR")
    val spark = graft.util.ExtSession(spark0)
    spark.conf.set("spark.sql.catalog.graft_probe",
      classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft_probe.warehouse",
      graft.util.Scratch.dir("graft-probe-wh"))
    graft.SparkEntry.queries("q01_pricing_summary")(spark0, sfDir).count()
    graft.Tables.orders(spark, sfDir).createOrReplaceTempView("probe_src")
    // per-job breakdown inside each phase (same listener shape as
    // JobProfileProbe), so a slow statement decomposes into its jobs
    final case class Job(id: Int, desc: String, start: Long,
                         var end: Long = -1L)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    spark0.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("")
          jobs.put(e.jobId, Job(e.jobId, d, e.time))
          order.add(e.jobId)
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val j = jobs.get(e.jobId); if (j != null) j.end = e.time
        }
      })
    def t(tag: String)(body: => Any): Unit = {
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus drain
      println(f"PHASE $tag%-12s $wall%6.2f s")
      import scala.jdk.CollectionConverters._
      var lastEnd = t0 / 1000000L
      order.asScala.toSeq.flatMap(id => Option(jobs.get(id))).foreach { j =>
        val dur = (if (j.end > 0) j.end else System.currentTimeMillis()) - j.start
        val gap = math.max(0, j.start - lastEnd)
        lastEnd = math.max(lastEnd, if (j.end > 0) j.end else j.start)
        val desc = if (j.desc.length > 60) j.desc.take(60) else j.desc
        println(f"    job ${j.id}%4d ${dur / 1000.0}%6.2f s  gap ${gap / 1000.0}%5.2f s  $desc")
      }
    }
    (1 to 2).foreach { round =>
      println(s"== round $round ==")
      t("drop") { spark.sql("DROP TABLE IF EXISTS graft_probe.ord") }
      t("create") { spark.sql("CREATE TABLE graft_probe.ord (o_orderkey " +
        "BIGINT, o_custkey BIGINT, o_price DECIMAL(18,2), o_nord BIGINT) " +
        "TBLPROPERTIES ('key' = 'o_orderkey')") }
      t("insert") { spark.sql("INSERT INTO graft_probe.ord " +
        "SELECT o_orderkey, o_custkey, " +
        "CAST(o_totalprice AS DECIMAL(18,2)), 0L FROM probe_src") }
      val q1 = graft.Tables.orders(spark, sfDir)
        .agg(org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.col("o_orderkey")))
        .head.getLong(0) / 4
      t("update1") { spark.sql("UPDATE graft_probe.ord SET o_nord = " +
        "(SELECT COUNT(*) FROM (SELECT o_custkey AS ck FROM probe_src) " +
        s"WHERE ck = o_custkey) WHERE o_orderkey % 2 = 0 " +
        s"AND o_orderkey <= $q1") }
      t("update2") { spark.sql("UPDATE graft_probe.ord SET " +
        "o_price = CAST(o_price * 2 AS DECIMAL(18,2)), " +
        "o_nord = o_nord + (SELECT MAX(o_orderkey) FROM " +
        "(SELECT o_custkey AS ck, o_orderkey FROM probe_src) " +
        "WHERE ck = o_custkey) " +
        "WHERE o_custkey IN (SELECT o_custkey FROM probe_src " +
        "GROUP BY o_custkey HAVING COUNT(*) > 12)") }
      t("agg") { spark.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, " +
          "CAST(SUM(o_price) AS DOUBLE) AS sum_price, " +
          "CAST(SUM(o_nord) AS BIGINT) AS sum_nord " +
          "FROM graft_probe.ord").collect() }
    }
    spark0.stop()
  }
}
