package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  * Queries warm up once at sf0.001 (JIT + codegen + parquet reader init)
  * so measured times reflect steady-state execution, and run in sorted
  * name order for stable attribution.
  *
  * Contention robustness: each query runs SPARK_GRAFT_BENCH_REPEATS
  * (default 3) times at the measured SF and the reported per-query time
  * is the MIN of those samples — steady-state throughput is the quantity
  * the <=2x gate cares about, and min-of-N is immune to another process
  * stealing the machine for one sample (the round-3 artifact recorded a
  * phantom 9x regression from exactly that). `first_run_total` preserves
  * the old single-shot sum for cross-round continuity.
  *
  * SELF-ATTRIBUTION (round 14): min-of-N protects per-query numbers but
  * not the headline when contention spans all repeats — the r13 driver
  * artifact read +39% on perf-neutral code and only out-of-band reruns
  * could prove it was machine load. The artifact now carries its own
  * evidence: host loadavg at start and end (`/proc/loadavg`), the
  * median total alongside the min total, and `spread` = max/min of the
  * per-repeat totals. A loaded machine shows loadavg >> cores and
  * spread >> 1; a genuine code regression shows neither.
  */
object Bench {

  /** Per-query outcome: Left(error message) or Right(samples in run
    * order — head is the first run; min/median derive from the set).
    */
  type Results = Seq[(String, Either[String, Seq[Double]])]

  // 4-decimal seconds (0.1 ms): keeps the artifact line short — the
  // driver's capture tail-truncated the full-precision form twice.
  private def f(v: Double) =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toString

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  private def okSamples(results: Results): Seq[Seq[Double]] =
    results.collect { case (_, Right(ss)) => ss }

  /** (min total, first-run total, median total). */
  private def totals(results: Results): (String, String, String) = {
    val ok = okSamples(results)
    (f(ok.map(_.min).sum), f(ok.map(_.head).sum), f(ok.map(median).sum))
  }

  /** max/min over the per-repeat totals (total_i = Σ_q samples_q(i)):
    * ≈1 on a quiet machine, >>1 when contention hit some repeats —
    * the one number that separates "loaded host" from "slow code".
    * Repeats are aligned by index; 1.0 when nothing completed or
    * repeats == 1.
    */
  private[graft] def spread(results: Results): Double = {
    val ok = okSamples(results)
    if (ok.isEmpty) return 1.0
    val n = ok.map(_.length).min
    if (n <= 1) return 1.0
    val perRepeat = (0 until n).map(i => ok.map(_(i)).sum)
    if (perRepeat.min <= 0) 1.0 else perRepeat.max / perRepeat.min
  }

  /** First three fields of /proc/loadavg ("1m 5m 15m"), "" off-Linux. */
  private[graft] def loadavg(): String =
    try {
      val s = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).trim
      s.split("\\s+").take(3).mkString(" ")
    } catch { case _: Throwable => "" }

  // The failed list is capped at 20 names on stdout so a catastrophic
  // round (everything failing) still cannot push the headline past the
  // driver's tail window; the file copy always carries the full list.
  private def failedJson(results: Results, cap: Int) = {
    val all = results.collect { case (k, Left(_)) => k }
    (all.take(cap).map("\"" + _ + "\"") ++
      (if (all.size > cap) Seq("\"...+" + (all.size - cap) + "\"") else Nil))
      .mkString("[", ",", "]")
  }

  /** The one stdout line. Carries ONLY the headline: at 148 queries even
    * maximally shortened per-query keys overflow the driver's ~2 KB tail
    * window (BENCH_r09 arrived head-truncated mid-key), so the per-query
    * map lives solely in the file artifact, pointed to by
    * "queries_file". BenchSpec pins the <2 KB bound at adversarial query
    * counts and failure mixes — four rounds of artifacts were lost to
    * this line outgrowing the capture.
    */
  private[graft] def headlineJson(results: Results, sfDir: String,
      repeats: Int, queriesFile: String = "target/bench.json",
      loadStart: String = "", loadEnd: String = ""): String = {
    val (total, firstRun, med) = totals(results)
    s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","repeats":$repeats,"first_run_total":$firstRun,"median_total":$med,"spread":${f(spread(results))},"load_start":"$loadStart","load_end":"$loadEnd","query_count":${results.size},"failed":${failedJson(results, 20)},"queries_file":"$queriesFile"}"""
  }

  /** The file artifact: full per-query map (failures as the string
    * "err"), per-query medians, full failed list, full error messages.
    */
  private[graft] def fullJson(results: Results, sfDir: String,
      repeats: Int, loadStart: String = "", loadEnd: String = ""): String = {
    def qmap(pick: Seq[Double] => Double) = results.map { case (k, r) =>
      val v = r match {
        case Right(ss) => f(pick(ss))
        case Left(_)   => "\"err\""
      }
      "\"" + k + "\":" + v
    }.mkString("{", ",", "}")
    val errsJson = results.collect { case (k, Left(m)) =>
      "\"" + k + "\":\"" + m.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    }.mkString("{", ",", "}")
    val (total, firstRun, med) = totals(results)
    s"""{"metric":"total","value":$total,"unit":"sec","queries":${qmap(_.min)},"queries_median":${qmap(median)},"sf":"$sfDir","repeats":$repeats,"first_run_total":$firstRun,"median_total":$med,"spread":${f(spread(results))},"load_start":"$loadStart","load_end":"$loadEnd","failed":${failedJson(results, Int.MaxValue)},"errors":$errsJson}"""
  }

  /** Per-query ISOLATION mode (`SPARK_GRAFT_BENCH_ISOLATE=q11_…,q33_…`
    * or `all`): each named query runs in a FRESH CHILD JVM — same java
    * binary, module flags, heap, and classpath as this one — via the
    * existing `SPARK_GRAFT_BENCH_ONLY` path, and the parent merges the
    * children's file artifacts. Session-heap artifacts (r14: q11 read
    * 10.8× at the 10× fixture in-bench but 2.3× standalone — old-gen
    * pressure from 100+ earlier queries, not q11's own scaling) become
    * mechanically attributable: the in-bench and isolated numbers now
    * come from the same command instead of a hand-run ProfileQuery.
    * The merged artifact records each query's child min-of-repeats;
    * `spread`/`median_total`/`first_run_total` are therefore child
    * minima too (this is a diagnostic mode, not the driver contract —
    * the artifact carries `"isolated":true` so nothing mistakes one
    * for the other).
    */
  private[graft] def isolateRun(names: Seq[String], sfDir: String,
      repeats: Int, warmupDir: String,
      timeoutSec: Long = 1800L): Results = {
    import scala.jdk.CollectionConverters._
    val javaBin = java.nio.file.Paths.get(
      sys.props("java.home"), "bin", "java").toString
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.toSeq
      .filterNot(a => a.startsWith("-agentlib") || a.startsWith("-Xrunjdwp"))
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    names.map { name =>
      val out = java.nio.file.Files.createTempFile(s"bench_iso_$name", ".json")
      val log = java.nio.file.Paths.get(out.toString + ".log")
      val cmd = (Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", sys.props("java.class.path"), "graft.Bench")).asJava
      val pb = new ProcessBuilder(cmd)
      pb.environment().remove("SPARK_GRAFT_BENCH_ISOLATE") // no recursion
      pb.environment().put("SPARK_GRAFT_BENCH_ONLY", name)
      pb.environment().put("SPARK_GRAFT_BENCH_OUT", out.toString)
      pb.environment().put("SPARK_GRAFT_SF_DIR", sfDir)
      pb.environment().put("SPARK_GRAFT_WARMUP_DIR", warmupDir)
      pb.environment().put("SPARK_GRAFT_BENCH_REPEATS", repeats.toString)
      pb.redirectOutput(log.toFile)
      pb.redirectErrorStream(true)
      val proc = pb.start()
      val result: Either[String, Seq[Double]] =
        if (!proc.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)) {
          proc.destroyForcibly()
          Left(s"isolated child timed out after ${timeoutSec}s (log: $log)")
        } else if (proc.exitValue() != 0) {
          Left(s"isolated child exited ${proc.exitValue()} (log: $log)")
        } else {
          try {
            val node = mapper.readTree(out.toFile)
            val q = node.get("queries").get(name)
            if (q == null) Left(s"child artifact has no entry for $name")
            else if (q.isTextual) Left(Option(node.get("errors"))
              .flatMap(e => Option(e.get(name))).map(_.asText)
              .getOrElse("err (no message in child artifact)"))
            else Right(Seq(q.asDouble()))
          } catch { case e: Throwable =>
            Left(s"unparseable child artifact: ${e.getMessage}")
          }
        }
      // the per-child artifact is merged above and the log only matters
      // on failure (its path rides the error message) — an `all` sweep
      // at ~150 queries would otherwise strand ~300 files per run in
      // the system temp dir
      try {
        java.nio.file.Files.deleteIfExists(out)
        if (result.isRight) java.nio.file.Files.deleteIfExists(log)
      } catch { case _: Throwable => () }
      (name, result)
    }
  }

  private def isolateMain(spec: String): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt.max(1)
    val names =
      if (spec.trim == "all") SparkEntry.queries.keys.toSeq.sorted
      else spec.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"SPARK_GRAFT_BENCH_ISOLATE names not in SparkEntry.queries: ${unknown.mkString(",")}")
    val loadStart = loadavg()
    val results = isolateRun(names, sfDir, repeats, warmupDir)
    val loadEnd = loadavg()
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "target/bench_isolated.json")
    // same artifact pair as the in-bench path, tagged as isolated
    def tag(json: String) = json.patch(1, "\"isolated\":true,", 0)
    val json = tag(headlineJson(results, sfDir, repeats, outPath, loadStart, loadEnd))
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p,
        tag(fullJson(results, sfDir, repeats, loadStart, loadEnd)) + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    println(json)
    System.out.flush()
  }

  def main(args: Array[String]): Unit = {
    sys.env.get("SPARK_GRAFT_BENCH_ISOLATE").filter(_.trim.nonEmpty) match {
      case Some(spec) => isolateMain(spec); return
      case None =>
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmupDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val loadStart = loadavg()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Execute the query's own optimized plan (`toRdd`), NOT `.count()`:
    // a count on top lets Catalyst prune every unreferenced projection,
    // so map-heavy expression pipelines would be measured mostly deleted.
    // toRdd materializes every output column of the query as written.
    //
    // scopedBlocking + clearCache between samples: repeats must start
    // from the same cold-cache state — a non-blocking unpersist lets
    // sample N+1 re-hit still-live blocks and report a partially cached
    // rerun as "steady state" (the r4 tail's "Block rdd_… already
    // exists" warnings were exactly that).
    def run(name: String, dir: String): Unit = {
      Caches.scopedBlocking {
        SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count()
      }
      spark.sharedState.cacheManager.clearCache()
    }

    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      try run(name, warmupDir)
      catch { case _: Throwable => }
    }

    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "3").toInt.max(1)
    // A failed query must surface as an error, never as a (fast)
    // time-to-exception "success": BENCH_r07/r08 reported 11 analysis-
    // failing queries as 0.06-0.26s runs. On the first failing sample we
    // stop sampling that query, record the message, and exclude it from
    // every total.
    val results: Results = names.map { name =>
      var err: Option[String] = None
      val samples = scala.collection.mutable.ArrayBuffer.empty[Double]
      var i = 0
      while (i < repeats && err.isEmpty) {
        val t0 = System.nanoTime()
        try { run(name, sfDir); samples += (System.nanoTime() - t0) / 1e9 }
        catch { case e: Throwable =>
          err = Some(Option(e.getMessage).getOrElse(e.getClass.getName).replaceAll("\\s+", " ").take(200))
        }
        i += 1
      }
      (name, err.toLeft(samples.toSeq))
    }
    val loadEnd = loadavg()
    // The headline must point at the artifact actually written, so the
    // resolved (env-overridable) path feeds both.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench.json")
    val json = headlineJson(results, sfDir, repeats, outPath, loadStart, loadEnd)
    val jsonFull = fullJson(results, sfDir, repeats, loadStart, loadEnd)
    // Also write the artifact to a file: stdout capture has truncated a
    // round's per-query tail before; the file is never capture-limited.
    try {
      val p = java.nio.file.Paths.get(outPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, jsonFull + "\n")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outPath: ${e.getMessage}")
    }
    // The JSON line is printed LAST — after spark.stop()'s shutdown
    // chatter — so a tail-capture of stdout always ends with a parseable
    // artifact (BENCH_r5/r6 recorded "parsed": null from mid-line cuts).
    spark.stop()
    println(json)
    System.out.flush()
  }
}
