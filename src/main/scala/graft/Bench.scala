package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // comma-separated query-name filter for focused iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    def selected = SparkEntry.queries
      .filter { case (n, _) => only.isEmpty || only(n) }
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Cumulative executor CPU time across all tasks; snapshotting it
    // around each timed query (after draining the async listener bus)
    // yields per-query cpu seconds, so parallelism (cpu/wall) is
    // measurable from ONE run instead of cross-run core-count compares
    // (r19's 8-core probe ran second on a warm cache and was unusable).
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) cpuNs.addAndGet(m.executorCpuTime)
      }
    })
    def cpuSnapshot(): Long = {
      try org.apache.spark.GraftSparkBridge.waitListenerBus(spark.sparkContext, 10000L)
      catch { case _: Throwable => () } // cpu attribution is best-effort; never fail the bench
      cpuNs.get()
    }
    // Force FULL evaluation of every row/column: a noop sink defeats the
    // count-only column pruning that made projection-heavy queries look
    // like bare scans. (count() prunes everything under the aggregate.)
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    // steady-state measurement: one untimed pass (JIT, codegen cache,
    // parquet footers), then the timed pass. Failures are RECORDED in
    // BOTH passes, not swallowed: a broken query must fail the bench
    // loudly, not be warmed as a no-op and then timed cold (or timed
    // as its time-to-throw).
    // LinkedHashSet: a query failing in BOTH passes is one failure,
    // not two (a ListBuffer double-counted n_failed)
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    val cpuSecs = scala.collection.mutable.LinkedHashMap[String, Double]()
    selected.foreach { case (name, fn) =>
      try run(fn) catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[bench] WARMUP FAILED $name: ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    val results = selected.map { case (name, fn) =>
      // settle between queries (untimed): per-query deltas otherwise
      // carry interleave from the PREVIOUS query — GC, AQE/broadcast
      // cleanup, and the ContextCleaner's async unpersists after its
      // noop write (r4 and r5 driver runs each carried one ~5x
      // artifact on an unchanged query). clearCache drops anything
      // cached, gc() enqueues the weak-ref cleanups, and the short
      // sleep lets the cleaner thread drain them outside the timed
      // window.
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(250)
      val cpu0 = cpuSnapshot()
      val t0 = System.nanoTime()
      try run(fn) catch {
        case e: Throwable =>
          failed += name
          System.err.println(s"[bench] FAILED $name: ${e.getClass.getName}: ${e.getMessage}")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      cpuSecs += name -> (cpuSnapshot() - cpu0) / 1e9
      name -> wall
    }
    // Stored-index builds timed SEPARATELY from the searches: the
    // s08/s09 entries build their index ONCE (in the untimed warmup
    // pass), so their timed numbers above are the codes-only search a
    // deployment actually repeats; these two metrics time the one-time
    // build+write so a build-path regression is visible without
    // burying search latency inside it.
    def timedBuild(name: String)(f: => Unit): Double = {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(250)
      val cpu0 = cpuSnapshot()
      val t0 = System.nanoTime(); f
      val wall = (System.nanoTime() - t0) / 1e9
      cpuSecs += name -> (cpuSnapshot() - cpu0) / 1e9
      wall
    }
    val builds = scala.collection.mutable.LinkedHashMap[String, Double]()
    def emb = graft.sources.Tables.embeddings(spark, sfDir)
    if (selected.contains("s08_pq_search"))
      builds += "s08_build" -> timedBuild("s08_build")(graft.operators.Similarity.writePqIndex(
        emb, java.nio.file.Files.createTempDirectory("bench_pq").toString, 8, 16))
    if (selected.contains("s09_ivfpq_search"))
      builds += "s09_build" -> timedBuild("s09_build")(graft.operators.Similarity.writeIvfPqIndex(
        emb, java.nio.file.Files.createTempDirectory("bench_ivfpq").toString, 8, 16))
    val timings = results ++ builds
    // keep the JSON line SHORT — the driver parses it from a 2000-char
    // tail of stdout; r1's full-precision 78-query map overflowed that
    // and the round's bench went unparsed. Per-query times are emitted
    // for a headline subset spanning every operator family; "value" is
    // still the total across ALL queries (full detail in BENCH_FULL.json).
    def f3(v: Double): String = (math.round(v * 1000) / 1000.0).toString // locale-safe
    val headline = Seq(
      "q01_agg", "q03_join_inner", "q50_tpch_q5", "q18_window_ranking",
      "q27_arith", "q47_recursive_cte", "d01_dedup_exact", "d02_dedup_minhash",
      "d03_dedup_simhash", "d04_ngram_jaccard", "d05_dedup_embedding",
      "d11_subdoc_dedup", "d12_decontaminate", "d13_substring_dedup",
      "d15_normalized_dedup", "d16_substring_removal", "d17_mixture_sample",
      "s01_similarity_topk", "s03_similarity_ivf", "s07_pq_quantize",
      "s08_pq_search", "s09_ivfpq_search", "s08_build", "s09_build",
      "s10_ivfpq_recall", "s11_matryoshka_recall", "p01_pipeline",
      "t01_langid", "t03_tokens", "t16_chunk_overlap",
      "t04_fingerprint", "t05_repetition", "t09_bpe_tokens",
      "t10_gopher_rules", "t12_pack_chunks", "t13_pack_greedy",
      "m01_multimodal", "m03_image_stats", "m04_audio_stats",
      "m07_scene_deltas", "ss01_sessionize", "ss03_funnel",
      "ao01_asof_join", "ao02_asof_tolerance", "ao03_asof_forward",
      "rj01_point_interval", "tk01_topk_per_key", "h01_hybrid_retrieval",
      "d18_canonical_dedup", "q68_quantile_sketch", "q69_window_dist",
      "p03_retrieval_pipeline", "d19_semantic_dedup", "h02_batch_hybrid",
      "e02_embed_search", "t18_quality_classifier", "s15_batch_matryoshka",
      "r01_rerank", "s14_batch_ivfpq_search", "p04_batch_retrieval",
      "p05_curation_pipeline", "t19_bigram_surprisal",
      "d20_bloom_decontaminate", "t20_percentile_gate", "ss05_retention",
      "rj02_interval_overlap", "s16_knn_join", "t21_dsir_weights",
      "d21_weighted_sample", "d22_token_budget", "pr01_pagerank",
      "pr02_personalized_pr", "m08_image_dhash", "ss06_sessionize_bounded",
      "d23_temperature_mix", "er01_candidate_pairs", "er02_entity_clusters",
      "bfs01_shortest_hops", "cdc01_snapshot_diff", "ix01_conjunctive_search",
      "ix02_phrase_search", "t22_quantile_bins", "cor01_column_moments",
      "rfm01_segments", "ts05_mad_outliers", "tr01_triangles",
      "lp01_label_propagation", "wh01_scd2_history", "ts01_resample_ffill",
      "dq01_profile", "ar01_assoc_rules", "rec01_item_jaccard",
      "kc01_kcore", "ss07_user_growth", "ts06_seasonal_anomalies",
      "er04_multikey_pairs", "ix03_contamination_audit",
      "ts07_series_corr", "ss08_conversion_lag")
    // line-length budget: ~90 headline entries exceed the driver's
    // 2000-char stdout tail — that's fine ONLY because the compact
    // self-contained line printed LAST is what the tail is guaranteed
    // to parse; the headline line is for humans and BENCH_FULL.json
    // carries complete per-query detail
    def jsonMap(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    val total = if (timings.nonEmpty) timings.values.sum else 0.0
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // self-baseline comparison: BASELINE_LOCAL.json holds per-query
    // times from one quiet run on the CURRENT machine generation
    // (r1–r9 numbers came from a faster environment — the judge's r10
    // rerun showed a uniform ~1.7× environmental shift that broke the
    // round-over-round trend line). Ratios >1 mean slower than the
    // pinned run; the 2× criterion is judged against THIS baseline.
    val baseline: Map[String, Double] = {
      val p = java.nio.file.Paths.get("BASELINE_LOCAL.json")
      if (!java.nio.file.Files.exists(p)) Map.empty
      else """"([^"]+)":\s*([0-9][0-9.]*)""".r
        .findAllMatchIn(java.nio.file.Files.readString(p))
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
    }
    val ratios = timings.toSeq.collect {
      case (n, t) if baseline.get(n).exists(_ > 0.0) => n -> t / baseline(n)
    }.sortBy(-_._2)
    val ratioJson =
      if (ratios.isEmpty) """"vs_baseline":null"""
      else {
        val med = ratios.map(_._2).sorted.apply(ratios.size / 2)
        val worst = ratios.take(5)
        s""""vs_baseline":{"n_compared":${ratios.size},"median_ratio":${f3(med)},"worst":${jsonMap(worst)}}"""
      }
    val allRatios =
      if (ratios.isEmpty) "" else s""","ratios":${jsonMap(ratios)}"""
    val full = s"""{"metric":"total","value":${f3(total)},"unit":"sec","cpus":$cpus,"n_queries":${results.size},"n_failed":${failed.size},"failed":$failedJson,$ratioJson$allRatios,"queries":${jsonMap(timings)},"queries_cpu":${jsonMap(cpuSecs)},"sf":"$sfDir"}"""
    // Key the full record by core count so an auxiliary scaling run
    // (the driver re-runs at lower cpus) stops clobbering the 32-core
    // per-query record; the unkeyed file stays for existing tooling.
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_FULL.json"), full)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"BENCH_FULL_c$cpus.json"), full)
    // every recorded BENCH_r{N}.json through r19 shows parsed:null — the
    // driver reads a 2000-char stdout TAIL, and sbt's LoggedOutput
    // prefixed every forked-run line with "[info] " (build.sbt now sets
    // run/outputStrategy := StdoutOutput so this line reaches stdout
    // raw). Emit a compact self-contained line LAST — after spark.stop()
    // so no shutdown log line can land below it — with the top
    // queries by time trimmed to fit the tail window alongside the
    // trailing sbt "[success]" line; full detail is in BENCH_FULL*.json
    // and the same compact line is duplicated to BENCH_LINE.json as a
    // belt-and-braces file channel.
    val compactPrefix = s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"queries":"""
    val compactSuffix = s""","sf":"$sfDir"}"""
    val budget = 1500 - compactPrefix.length - compactSuffix.length - 2 // {}
    val topEntries = new StringBuilder
    timings.toSeq.sortBy(-_._2).foreach { case (k, v) =>
      val piece = "\"" + k + "\":" + f3(v)
      if (topEntries.length + piece.length + 1 <= budget) {
        if (topEntries.nonEmpty) topEntries.append(',')
        topEntries.append(piece)
      }
    }
    val compact = compactPrefix + "{" + topEntries + "}" + compactSuffix
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_LINE.json"), compact)
    val baselineLine =
      if (ratios.nonEmpty) s"""{"metric":"vs_baseline",$ratioJson}""" else ""
    val headlineLine = {
      val qs = jsonMap(timings.filter { case (k, _) => headline.contains(k) })
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"queries":$qs,"sf":"$sfDir"}"""
    }
    spark.stop()
    if (baselineLine.nonEmpty) println(baselineLine)
    println(headlineLine)
    println(compact)
    if (failed.nonEmpty) sys.exit(1)
  }
}
