package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scale experiment (run manually; not part of the engine
  * surface): amplify the sf0.1 corpus N× under /tmp with decorrelated
  * copies, run the scale-sensitive operators against it, and print
  * wall-seconds per factor — evidence for how each op's cost actually
  * grows with corpus size (the 100 TB question), beyond asymptotic
  * argument.
  *
  * Copies are made DISTINCT on purpose:
  *  - document tokens are salted with the copy index, so no shingle is
  *    shared across copies — near-dup structure per copy is preserved,
  *    cross-copy candidate pollution is zero, and output sizes grow
  *    linearly (clean scaling measurement, not an output-size blowup);
  *  - embeddings get a copy-indexed deterministic offset large enough
  *    to decorrelate copies, while d06's relative variant construction
  *    keeps its planted pairs inside every copy.
  *
  * Usage: runMain graft.ScaleProbe [factor] [ops...]
  */
object ScaleProbe {

  /** amplify the relational/streaming tables: keys offset per copy so
    * joins stay consistent within a copy and copies never join each
    * other; timestamps unchanged (event density grows — the realistic
    * direction for a busier stream) */
  private def amplifyRelational(spark: SparkSession, base: String,
                                out: String, factor: Int): Unit = {
    // events: written with raw int64 nanos (no TIMESTAMP(NANOS) logical
    // type), which Tables.events' ts-div-1000 path reads unchanged
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$base/events.parquet")
    (0 until factor).map { k =>
      ev.select((col("event_id") + k.toLong * 1000000000000L).as("event_id"),
        col("ts"), (col("user_id") + k.toLong * 10000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    val o = Tables.orders(spark, base)
    (0 until factor).map { k =>
      o.select((col("o_orderkey") + k.toLong * 1000000000L).as("o_orderkey"),
        (col("o_custkey") + k.toLong * 10000000L).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/orders.parquet")

    val l = Tables.lineitem(spark, base)
    (0 until factor).map { k =>
      l.withColumn("l_orderkey", col("l_orderkey") + k.toLong * 1000000000L)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")

    val c = Tables.customer(spark, base)
    (0 until factor).map { k =>
      c.withColumn("c_custkey", col("c_custkey") + k.toLong * 10000000L)
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/customer.parquet")

    // dimensions stay as-is
    Seq("region", "nation", "part", "supplier").foreach { t =>
      Tables.load(spark, base, t)
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
  }

  def amplify(spark: SparkSession, base: String, out: String,
              factor: Int): Unit = {
    amplifyRelational(spark, base, out, factor)
    val docs = Tables.documents(spark, base)
    val docsAmp = (0 until factor).map { k =>
      docs.select(
        (col("doc_id") + k.toLong * 1000000000L).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          t => concat(t, lit(s"x$k"))), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    docsAmp.write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = Tables.embeddings(spark, base)
    val embAmp = (0 until factor).map { k =>
      emb.select(
        (col("vec_id") + k.toLong * 10000000L).as("vec_id"),
        // perturbation must be well-mixed per (vector, dim, copy): a
        // dim-only offset adds the SAME bias to every vector (all
        // cosines → 1), and a small-modulus hash gives whole residue
        // classes of vectors identical noise (near-clusters that flood
        // LSH buckets — both measured). Large-modulus multiplicative
        // hash ⇒ quasi-continuous iid noise, ±0.15/dim.
        transform(col("embedding"), (x, i) =>
          (x.cast("double") +
            (pmod(col("vec_id") * lit(2654435761L) + i * lit(1610612741L) +
                  lit(k * 805306457L), lit(997)).cast("double") / 997.0 - 0.5)
              * 0.3)
            .cast("float")).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    embAmp.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(4)
    val ops = if (args.length > 1) args.drop(1).toSeq else Seq(
      "q14_wordcount", "x01_salted_wordcount", "d01_dedup_exact",
      "d02_dedup_ngram_jaccard", "d03_dedup_minhash_lsh",
      "d04_dedup_simhash", "d06_dedup_embedding_lsh", "d07_dup_clusters",
      "d09_substring_dedup", "d11_incremental_ingest",
      "t05_tfidf", "t07_repetition", "t08_lm_score",
      "t12_sequence_packing", "t13_dsir_importance", "t14_filter_verdict",
      "p01_clean_corpus", "p02_embedding_curation", "p03_domain_mixing",
      "s02_knn_lsh", "s04_knn_ivf", "s05_embedding_quantize",
      "s06_kmeans", "s07_knn_pq_adc", "s08_knn_sq8_rerank",
      "d10_semdedup",
      "m03_multimodal_resize",
      "q01_pricing_summary", "q03_join_agg", "q08_window_running",
      "q25_grouping_sets",
      "x02_sessionize", "x05_asof_join", "x06_range_join_bucketed",
      "x09_bucketed_join", "x10_skew_salted_join", "x11_bloom_filtered_join",
      "x13_scd2_history",
      "w02_stream_window_agg", "w08_stream_stream_join")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = s"/tmp/graft-scale-x$factor"
    // amplification is ~minutes at x16 and deterministic — reuse a
    // completed corpus across probe invocations (the marker lands only
    // after every table is written, so a killed run re-amplifies)
    val marker = java.nio.file.Paths.get(s"$out/.complete")
    if (java.nio.file.Files.exists(marker))
      println(s"SCALEPROBE x$factor reusing amplified corpus at $out")
    else {
      amplify(spark, "/root/testdata/sf0.1", out, factor)
      java.nio.file.Files.writeString(marker, "ok")
    }
    // warmup (JVM/codegen)
    SparkEntry.queries("q14_wordcount")(spark, out).count()
    val results = ops.map { name =>
      // measurement hygiene between ops (the Bench settle() lesson, at
      // gate granularity): a heap full of the previous op's freshly-dead
      // shuffle objects turns the next op's small sequential jobs into
      // GC-pause measurements — observed as d07 reading 129 s in-sweep
      // vs 17 s isolated on the same quiet box. The sweep measures how
      // ops SCALE, so each starts from a settled JVM.
      System.gc()
      Thread.sleep(1000)
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, out).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"SCALEPROBE x$factor $name%-26s $sec%7.2f s  $n%9d rows")
      name -> sec
    }
    val total = results.map(_._2).sum
    println(f"SCALEPROBE x$factor TOTAL ${total}%.1f s")
    spark.stop()
  }
}
