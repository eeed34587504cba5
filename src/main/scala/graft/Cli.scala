package graft

import graft.service.{QueryService, QueryStatus}

/** Headless CLI client — the Spark-side replacement for the
  * reference's `client_tui --sql-file=queries.sql` path
  * (/root/reference/src/bin/client_tui.rs:46-59): split a SQL script
  * into statements, run each as its own query via [[QueryService]],
  * wait for completion, and page through results.
  *
  * Usage: runMain graft.Cli <sql-file> [resultsRoot] [pageSize]
  *        runMain graft.Cli --serve [port] [resultsRoot]
  *        runMain graft.Cli --tui <sql-file> [resultsRoot] [pageSize]
  *
  * `--serve` starts the JSON-over-TCP [[graft.service.QueryServer]]
  * (the reference's worker-listener role) and blocks. `--tui` opens
  * the interactive results browser ([[graft.tui.TuiApp]] — the
  * reference's ratatui client). */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--serve")) {
      val port = if (args.length > 1) args(1).toInt else 7777
      val resultsRoot = if (args.length > 2) args(2) else "/tmp/graft_results"
      val spark = Engine.session("graft-server")
      val svc = new QueryService(spark, resultsRoot)
      // prime cold-start machinery BEFORE accepting clients: the first
      // real query should pay plan cost, not JVM/JIT/codegen cost
      // (opt out with SPARK_GRAFT_NO_WARMUP=1 for instant listen)
      if (!sys.env.get("SPARK_GRAFT_NO_WARMUP").contains("1")) {
        val ws = svc.warmup()
        println(f"warmup complete in $ws%.1fs")
      }
      val server = new service.QueryServer(svc, port)
      println(s"graft query server listening on port ${server.boundPort}")
      Thread.currentThread().join()
      return
    }
    if (args.headOption.contains("--tui")) {
      tuiMain(args.drop(1))
      return
    }
    val sqlFile = args(0)
    val resultsRoot = if (args.length > 1) args(1) else "/tmp/graft_results"
    val pageSize = if (args.length > 2) args(2).toInt else 20

    val spark = Engine.session("graft-cli")
    val svc = new QueryService(spark, resultsRoot)
    val script = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(sqlFile)))

    // sequential, like the reference TUI: statement N+1 may read
    // statement N's output (the write-back session shape — INSERT
    // OVERWRITE DIRECTORY then re-read — would race under the
    // concurrent runScript)
    val ids = svc.runScriptSequential(script)
    ids.zipWithIndex.foreach { case (id, i) =>
      svc.awaitComplete(id) match {
        case QueryStatus.Complete =>
          val r = svc.reader(id)
          println(s"-- query $i [$id]: Complete, ${r.totalRows} rows -> ${svc.resultDir(id)}")
          var cursor = Option(service.ResultCursor(0, 0))
          var pageNo = 0
          while (cursor.isDefined) {
            val page = r.read(cursor.get, pageSize)
            println(s"   page $pageNo (${page.rows.size} rows):")
            page.rows.foreach(row => println(s"     $row"))
            cursor = page.next
            pageNo += 1
          }
        case QueryStatus.Error(msg) =>
          println(s"-- query $i [$id]: ERROR: $msg")
        case other =>
          println(s"-- query $i [$id]: still $other (timeout)")
      }
    }
    svc.close()
    spark.stop()
  }

  /** Interactive browser loop. Statements are all SUBMITTED up front
    * (ids and Queued statuses exist immediately, so the query table
    * renders complete) but EXECUTE strictly one at a time on a
    * single-thread executor — the reference TUI's sequential-script
    * semantics, with statuses streaming Queued -> Running -> terminal
    * per query. Keys arrive via a daemon reader thread (a blocking
    * read is the only reliable EOF detection), with split-CSI carry
    * between reads; the UI redraws whenever the frame changes. The
    * terminal is best-effort switched to non-canonical mode via stty
    * on the controlling tty; without one (plain pipe) each key needs
    * an Enter, which Key.decode tolerates. */
  private def tuiMain(args: Array[String]): Unit = {
    val sqlFile = args(0)
    val resultsRoot = if (args.length > 1) args(1) else "/tmp/graft_results"
    val pageSize = if (args.length > 2) args(2).toInt else 10
    val script = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(sqlFile)))
    val statements = graft.sources.ScriptRunner.split(script)
    if (statements.isEmpty) {
      println(s"$sqlFile: no SQL statements")
      return
    }
    val spark = Engine.session("graft-tui")
    // one admission slot = sequential statement execution, the
    // reference TUI's one-at-a-time semantics (client_tui.rs)
    val svc = new QueryService(spark, resultsRoot, maxConcurrentQueries = 1)
    val ids = statements.map(svc.runQuery)
    val app = new graft.tui.TuiApp(svc, statements, ids, pageSize)

    val keys = new java.util.concurrent.LinkedBlockingQueue[graft.tui.Key]()
    val eof = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      val buf = new Array[Byte](64)
      var carry = Array.empty[Byte]
      var n = System.in.read(buf)
      while (n >= 0) {
        val (ks, rest) = graft.tui.Key.decodeChunk(carry ++ buf.take(n))
        carry = rest
        ks.foreach(keys.put)
        n = System.in.read(buf)
      }
      eof.set(true)
    }, "graft-tui-stdin")
    reader.setDaemon(true)
    reader.start()

    def stty(modes: String*): Unit =
      try {
        val pb = new ProcessBuilder(("stty" +: modes): _*)
        pb.redirectInput(new java.io.File("/dev/tty"))
        pb.start().waitFor()
        ()
      } catch { case _: Exception => () }
    stty("-icanon", "-echo")
    try {
      var lastFrame = ""
      while (!app.exited && !(eof.get() && keys.isEmpty)) {
        val frame = app.render()
        if (frame != lastFrame) {
          print("\u001b[2J\u001b[H") // clear + home
          print(frame)
          System.out.flush()
          lastFrame = frame
        }
        val k = keys.poll(50, java.util.concurrent.TimeUnit.MILLISECONDS)
        if (k != null) app.onKey(k)
      }
    } finally {
      stty("sane")
      spark.stop()
    }
  }
}
