package graft.server

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkEntry
import graft.sources.{TempDirs, TextSource}
import org.apache.spark.sql.SparkSession

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.time.Instant
import java.util.concurrent.Executors
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Reference-parity REST control plane (SURVEY §2.1 O13,
  * /root/reference/server.py:19-76): the reference fronts its engine with
  * three Flask routes — POST /mapreduce returns a job id and runs the job
  * asynchronously, GET /getjobstatus?jobid= returns the status string (or
  * the consolidated output file once COMPLETED), GET /getjoblog?jobid=
  * returns the master step log. This is the same surface over the Spark
  * engine: a job is a named inventory query (the engine's job registry —
  * the reference's "job config" names its map/reduce program the same way)
  * plus a data dir; the output is the consolidated TSV
  * ([[TextSource.writeTsv]] single-file mode, the reference's
  * `consolidate_output` shape, master.py:166-173).
  *
  * Scale note: this is a CONTROL plane — the JVM thread pool only tracks
  * job state; each job's execution is a Spark action that runs on the
  * cluster. The reference provisions VMs per job (its O12); here
  * submission cost is one action on the shared session, and the
  * DAGScheduler owns stage barriers.
  *
  * Zero dependencies: JDK `com.sun.net.httpserver` + the fixed two-field
  * JSON contract `{"query": <inventory name>, "sfDir": <dir>}` (parsed
  * with anchored regexes, documented here as the protocol — not a general
  * JSON endpoint). Binds 127.0.0.1 only.
  */
final class JobServer(spark: SparkSession, port: Int = 0) {

  private final case class JobState(seq: Long,
                                    @volatile var status: String,
                                    log: StringBuilder,
                                    @volatile var outFile: Option[Path])

  private val jobs = TrieMap.empty[String, JobState]
  private val seqGen = new java.util.concurrent.atomic.AtomicLong

  /** Retention cap for terminal (COMPLETED/ERROR) jobs: a long-lived
    * control plane must not grow driver memory with job history — without
    * a cap the TrieMap (plus each job's step log and consolidated output
    * file) grows per submit, forever. RUNNING jobs are never evicted; an
    * evicted id answers 404 exactly like an unknown id (the reference makes
    * no retention promise — its registry is an in-memory dict that only
    * lives as long as its Flask process, server.py:19-76).
    */
  private val maxRetainedJobs = 256

  /** 2 job-worker threads is the reference-parity CONCURRENCY choice, not
    * an engine limit: the reference's master drives one job's VM fleet at a
    * time, so job submissions queue while the engine parallelizes WITHIN
    * the running job (here: Spark schedules the job's stages across the
    * whole cluster). Raise this for concurrent multi-tenant jobs — each
    * worker just blocks on a Spark action.
    */
  private val jobWorkers = 2
  // Eviction safety of the family caches (FamilyCache scaladoc): an
  // in-flight job's localCheckpoint frame must never be evicted+released
  // mid-action, which holds when cache cap >= 2 x concurrent consumers.
  // Enforce the coupling HERE, where concurrency is configured — raising
  // jobWorkers without widening FamilyCache.DefaultCap must fail loudly
  // at construction, not surface later as unrecomputable missing blocks.
  require(2 * jobWorkers <= graft.operators.FamilyCache.DefaultCap,
    s"jobWorkers=$jobWorkers needs FamilyCache cap >= ${2 * jobWorkers} " +
      s"(have ${graft.operators.FamilyCache.DefaultCap}) — widen the caches " +
      "before raising server concurrency")
  private val pool = Executors.newFixedThreadPool(jobWorkers)
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort

  /** Test surface for the retention cap (JobServerSpec's 1k-submit loop). */
  private[graft] def retainedJobs: Int = jobs.size

  private def logLine(st: JobState, msg: String): Unit = st.synchronized {
    st.log.append(s"${Instant.now()} INFO $msg\n"); ()
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "text/plain; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def queryParam(ex: HttpExchange, key: String): Option[String] =
    Option(ex.getRequestURI.getRawQuery).flatMap(_.split("&").collectFirst {
      case kv if kv.startsWith(s"$key=") => kv.substring(key.length + 1)
    })

  private val queryRe = """"query"\s*:\s*"([^"]+)"""".r
  private val sfDirRe = """"sfDir"\s*:\s*"([^"]+)"""".r

  /** Evict the oldest terminal jobs beyond [[maxRetainedJobs]], deleting
    * their consolidated output files (they live in a JVM-exit-cleaned temp
    * dir, but a long-lived server should not wait for exit to release
    * them). O(retained) scan per submit — bounded by the cap itself.
    */
  private def evictBeyondCap(): Unit =
    if (jobs.size > maxRetainedJobs) {
      jobs.toSeq
        .filter { case (_, st) => st.status != "RUNNING" }
        .sortBy(_._2.seq)
        .take(jobs.size - maxRetainedJobs)
        .foreach { case (id, st) =>
          jobs.remove(id)
          st.outFile.foreach(p =>
            try { Files.deleteIfExists(p); () } catch { case NonFatal(_) => () })
        }
    }

  private def submit(name: String, sfDir: String): String = {
    val jobId = java.util.UUID.randomUUID().toString
    val st = JobState(seqGen.incrementAndGet(), "RUNNING", new StringBuilder, None)
    evictBeyondCap()
    jobs.put(jobId, st)
    logLine(st, s"Step 1 : Job $jobId accepted: query=$name sfDir=$sfDir")
    pool.submit(new Runnable {
      override def run(): Unit =
        try {
          val fn = SparkEntry.queries.getOrElse(name,
            throw new IllegalArgumentException(s"unknown query '$name'"))
          logLine(st, "Step 2 : Running query plan on the engine")
          val outDir = TempDirs.create(s"graft_job_$jobId")
          // consolidated single-file TSV = the reference's output contract
          TextSource.writeTsv(fn(spark, sfDir), outDir.toString, singleFile = true)
          // Files.list holds an open directory handle until closed — leaked
          // per job, it exhausts fds on a long-lived server
          val listing = Files.list(outDir)
          val part =
            try listing.iterator().asScala
              .filter(_.getFileName.toString.startsWith("part-")).toSeq.headOption
            finally listing.close()
          logLine(st, "Step 3 : Consolidating output file")
          st.outFile = part
          st.status = "COMPLETED"
          logLine(st, "Step 4 : Job COMPLETED")
        } catch {
          case NonFatal(e) =>
            st.status = "ERROR"
            logLine(st, s"ERROR : Job failed : ${e.getMessage}")
        }
    })
    jobId
  }

  server.createContext("/", (ex: HttpExchange) =>
    respond(ex, 200, "Welcome to MapReduce"))

  server.createContext("/mapreduce", (ex: HttpExchange) =>
    try {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      (queryRe.findFirstMatchIn(body), sfDirRe.findFirstMatchIn(body)) match {
        case (Some(q), Some(d)) =>
          respond(ex, 200, s"""{ "job_id" : "${submit(q.group(1), d.group(1))}" }""")
        case _ => respond(ex, 400, "ERROR : Job Initilization failed")
      }
    } catch {
      case NonFatal(_) => respond(ex, 500, "ERROR : Job Initilization failed")
    })

  server.createContext("/getjobstatus", (ex: HttpExchange) =>
    queryParam(ex, "jobid").flatMap(jobs.get) match {
      case Some(st) if st.status == "COMPLETED" =>
        // parity with the reference: a COMPLETED status request returns the
        // consolidated output itself (server.py:45-47)
        respond(ex, 200,
          st.outFile.map(p => Files.readString(p, StandardCharsets.UTF_8)).getOrElse(""))
      case Some(st) => respond(ex, 200, st.status)
      case None => respond(ex, 404, "ERROR : Job status check failed")
    })

  server.createContext("/getjoblog", (ex: HttpExchange) =>
    queryParam(ex, "jobid").flatMap(jobs.get) match {
      case Some(st) => respond(ex, 200, st.synchronized(st.log.toString))
      case None => respond(ex, 404, "ERROR : Job log fetch failed")
    })

  // Observability beyond the reference's three routes: one JSON line a
  // long-lived session's operator reads to see resident-state pressure
  // (the family-cache LRUs whose eviction safety the jobWorkers require
  // above couples to) and job-registry health, without attaching a
  // debugger. Counting statuses is an O(retained) scan, bounded by the
  // retention cap.
  server.createContext("/metrics", (ex: HttpExchange) => {
    // ONE snapshot of the concurrently-mutated registry: jobs_retained and
    // the per-status counts must come from the same instant, or a submit
    // racing the two reads makes the total momentarily disagree with the
    // sum of its parts (an invariant a metrics scraper may alert on).
    val snap = jobs.values.toSeq
    val byStatus = snap.groupBy(_.status).map {
      case (s, v) => s"""\"${s.toLowerCase}\":${v.size}"""
    }.toSeq.sorted.mkString(",")
    // named per-cache entries + hit/miss tallies: misses growing per
    // submit = a cache thrashed past its cap; zero hits = staging work
    // nothing consumes — the observable form of the staging economics
    val stats = graft.operators.PipelineQueries.familyCacheStats :+
      graft.operators.OpsQueries.gramCacheStats
    val cacheJson = stats.map { case (n, sz, h, ms) =>
      s"""{"name":"$n","entries":$sz,"hits":$h,"misses":$ms}"""
    }.mkString(",")
    respond(ex, 200,
      s"""{"jobs_retained":${snap.size},"jobs":{$byStatus},""" +
        s""""family_cache_entries":${stats.map(_._2).sum},""" +
        s""""family_caches":[$cacheJson],""" +
        s""""job_workers":$jobWorkers,"retention_cap":$maxRetainedJobs}""")
  })

  // kept referenced: HttpServer.stop() does NOT terminate a caller-supplied
  // executor, and its 4 non-daemon workers would otherwise pin the JVM
  // after stop()
  private val httpPool = Executors.newFixedThreadPool(4)
  server.setExecutor(httpPool)
  server.start()

  def stop(): Unit = {
    server.stop(0)
    httpPool.shutdownNow()
    pool.shutdownNow()
    ()
  }
}
