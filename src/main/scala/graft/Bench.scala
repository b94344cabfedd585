package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at
  * `SPARK_GRAFT_SF_DIR`, printing ONE JSON line AND writing the same JSON to
  * `bench_out.json` (override with `SPARK_GRAFT_BENCH_OUT`) — the stdout line
  * is ~8 KB and has been tail-truncated by log capture before (round 5 lost
  * its head 30 queries); the file artifact survives regardless.
  *
  * Per query: the FIRST run is reported as `value`/`queries` (cold —
  * comparable across rounds and to the recorded baseline); `warm_total`/
  * `queries_warm` report the per-query MEDIAN of the next `warmRuns` (3)
  * runs — steady-state numbers with JIT/classloading/scan-setup amortized
  * and single-run scheduler noise medianed out.
  *
  * Failure contract: a failed query is reported as -1, never folded into
  * either total, AND the process exits nonzero with `"valid":false` in the
  * JSON — a consumer can never mistake a partial total for a speedup.
  *
  * `SPARK_GRAFT_BENCH_FILTER` (comma-separated name substrings) restricts
  * the set for local iteration; the driver runs unfiltered.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val warmRuns = sys.env.get("SPARK_GRAFT_BENCH_WARM_RUNS").map(_.toInt).getOrElse(3)
    val nameFilter: String => Boolean = sys.env.get("SPARK_GRAFT_BENCH_FILTER") match {
      case Some(subs) =>
        val pats = subs.split(",").toSeq
        name => pats.exists(name.contains)
      case None => _ => true
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up codegen/classloading/scan machinery so the first timed query
    // doesn't absorb ~4 s of session startup.
    spark.read.parquet(s"$sfDir/region.parquet").count()
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) -1.0
      else if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val queries = SparkEntry.queries.toSeq.filter(kv => nameFilter(kv._1)).sortBy(_._1)
    val results = queries.map { case (name, fn) =>
      val cold = try time(fn)
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1.0 }
      val warm = if (cold < 0) -1.0 else
        try median((1 to warmRuns).map(_ => time(fn)))
        catch { case e: Throwable => System.err.println(s"[bench] $name warm failed: $e"); -1.0 }
      (name, cold, warm)
    }
    def timesJson(sel: ((String, Double, Double)) => Double): String =
      results.map(r => s"\"" + r._1 + "\":" + sel(r)).mkString("{", ",", "}")
    val failed = results.collect { case (k, c, w) if c < 0 || w < 0 => "\"" + k + "\"" }
    val coldTotal = results.map(_._2).filter(_ >= 0).sum
    val warmTotal = results.map(_._3).filter(_ >= 0).sum
    val json =
      s"""{"metric":"total","value":$coldTotal,"unit":"sec","valid":${failed.isEmpty},""" +
        s""""warm_total":$warmTotal,"warm_runs":$warmRuns,"queries":${timesJson(_._2)},""" +
        s""""queries_warm":${timesJson(_._3)},""" +
        s""""failures":[${failed.mkString(",")}],"sf":"$sfDir"}"""
    // File first, stdout second: if log capture truncates the line, the
    // artifact already exists on disk.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + "\n")
    catch { case e: Exception => System.err.println(s"[bench] cannot write $outPath: $e") }
    println(json)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
