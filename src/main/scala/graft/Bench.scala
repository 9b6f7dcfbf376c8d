package graft
import org.apache.spark.sql.SparkSession

/** Driver-contract benchmark main: runs the declared queries on
  * SPARK_GRAFT_SF_DIR and prints one JSON line.
  *
  * Each query runs SPARK_GRAFT_BENCH_REPS times (default 3) and the
  * MINIMUM per-query time is recorded — the minimum measures the plan,
  * not the neighbors, on a machine whose load we don't control. The JSON
  * also carries the 1-minute system load average at start and end so a
  * noisy run is diagnosable from the artifact alone.
  *
  * SPARK_GRAFT_ONLY=name1,name2 restricts the set (local iteration). */
object Bench {
  private def loadAvg: Double =
    java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val load0 = loadAvg
    // warm the engine once (codegen infra, vectorized reader, broadcast
    // machinery) so per-query timings measure the queries
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = selected.map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        // a rep that throws contributes NO timing — otherwise a broken
        // query's fast exception path would enter the min and the artifact
        // would report it as a fast success
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            errors.getOrElseUpdate(name, e.toString.take(300))
            System.err.println(s"[bench] $name FAILED: $e")
            false
          }
        // drop this query's persisted intermediates before the next rep —
        // a long-lived session must not accumulate cached partitions, and
        // each rep must pay its own materialization cost
        graft.operators.CacheScope.releaseAll()
        if (ok) Some((System.nanoTime() - t0) / 1e9) else None
      }
      val dt = if (times.isEmpty) -1.0 else times.min
      System.err.println(
        f"[bench] $name%-28s min $dt%8.2f s  (all: ${times.map(t => f"$t%.2f").mkString(" ")})")
      name -> dt
    }
    // 3-decimal per-query values: millisecond resolution is below this
    // bench's noise floor, and the full-precision doubles made the line
    // ~12 KB — far past the 2000-char stdout tail the driver's artifact
    // keeps, which left PERF with no parsable JSON for two rounds
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) =>
      // JSON-safe: escape backslash/quote, then flatten ALL control chars
      // and any surrogate (take(300) can split a pair, and a lone
      // surrogate is invalid JSON) to spaces
      val safe = v.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\\p{Cc}\\p{Cs}]", " ")
      "\"" + k + "\":\"" + safe + "\""
    }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    // Loaded-run detection: the committed BENCH_LOCAL.json is the round's
    // IDLE ledger, and three rounds running a loaded post-builder run has
    // overwritten the working tree copy (caught each time only by the
    // judge). A run that starts above the load threshold now writes a
    // SIDECAR instead — the idle ledger can only be replaced by a run
    // that was actually idle at start. Threshold overridable via
    // SPARK_GRAFT_BENCH_MAXLOAD; stdout (the driver's artifact) is
    // unaffected either way.
    val maxIdleLoad = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAXLOAD", "2.0").toDouble
    val loaded = load0 > maxIdleLoad
    // total_sec is duplicated at the END of the line: the driver artifact
    // keeps the stdout tail, so the trailing fields survive truncation
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir","reps":$reps,"agg":"min","loadavg_start":$load0,"loadavg_end":$loadAvg,"loaded_run":$loaded,"n_queries":${results.size},"n_errors":${errors.size},"total_sec":$total}"""
    // The driver artifact preserves only the TAIL of stdout, which at 9x
    // queries truncates the per-query map. Persist the full JSON next to
    // build.sbt (walking up from cwd — `sbt runMain` and spark-submit may
    // differ in working directory), overridable via SPARK_GRAFT_BENCH_LOCAL;
    // BENCH_LOCAL.json + the stdout tail together always cover every query.
    try {
      val target0 = sys.env.get("SPARK_GRAFT_BENCH_LOCAL").map(java.nio.file.Paths.get(_))
        .getOrElse {
          val cwd = java.nio.file.Paths.get("").toAbsolutePath
          Iterator.iterate(cwd)(_.getParent).takeWhile(_ != null)
            .find(p => java.nio.file.Files.exists(p.resolve("build.sbt")))
            .getOrElse(cwd).resolve("BENCH_LOCAL.json")
        }
      val target =
        if (loaded) {
          val side = target0.resolveSibling(
            target0.getFileName.toString.stripSuffix(".json") + ".loaded.json")
          System.err.println(f"[bench] loadavg_start $load0%.2f > $maxIdleLoad%.1f — " +
            s"NOT an idle run; writing $side instead of the idle ledger")
          side
        } else target0
      java.nio.file.Files.write(target, (json + "\n").getBytes("UTF-8"))
    } catch { case e: Exception => System.err.println(s"[bench] BENCH_LOCAL.json write failed: $e") }
    println(json)
    // SECOND, compact summary line as the FINAL stdout line: the driver
    // artifact keeps only a ~2000-char stdout TAIL, and at 280 queries the
    // full line above is front-truncated past repair (PERF_r13/r14:
    // `parsed: null`), so a tail-parser always finds this one complete.
    // Summary only — no `queries` map (280 entries cannot fit the tail
    // window, and a partial map could read as dropped queries); the full
    // per-query map lives in the line above and in BENCH_LOCAL.json.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","reps":$reps,"agg":"min","loadavg_start":$load0,"loadavg_end":$loadAvg,"loaded_run":$loaded,"n_queries":${results.size},"n_errors":${errors.size},"total_sec":$total}""")
    spark.stop()
  }
}
