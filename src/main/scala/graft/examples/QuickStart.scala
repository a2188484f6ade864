package graft.examples

import org.apache.spark.sql.SparkSession

import graft.core._
import graft.core.RespValue._

/** End-to-end example of the engine's RedisGears-style surface: a
  * library with a stream trigger, a callable function, and a keyspace
  * trigger (the SURVEY §7.3 minimum slice). Run with
  * `sbt "runMain graft.examples.QuickStart"`. */
object QuickStart {
  def main(args: Array[String]): Unit = {
    // reuse an already-running session (so the CI spec can drive the
    // demo inside the shared test session) and only stop what we own
    val existing = SparkSession.getDefaultSession.filterNot(_.sparkContext.isStopped)
    val spark = existing.getOrElse(SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    val engine = new Engine(spark)

    // a "library": the Scala analogue of a RedisGears JS library —
    // registrations are collected at load, swapped atomically, reverted
    // on failure
    engine.load(LibraryDefinition("pipeline", code = { lib =>
      lib.registerStreamTrigger("counter", "events:", (ctx, r) => {
        ctx.incrBy(s"count:${r.fields("event_type")}", 1); ()
      }, description = "count events per type")
      lib.registerFunction("num", (ctx, fnArgs) => {
        val t = fnArgs.head.asInstanceOf[RespString].v
        RespLong(ctx.get(s"count:$t").map(_.toLong).getOrElse(0L))
      }, flags = Set(FunctionFlags.NoWrites), description = "read a count")
      lib.registerKeySpaceTrigger("audit", "count:", (ctx, ev) => {
        ctx.incrBy("audit:writes", 1); ()
      }, description = "audit writes to count:*")
    }))

    // feed the real events table through the trigger engine as stream
    // records (in production: engine.streams.attach(readStream...))
    val recs = graft.operators.Tables.events(spark, "/root/testdata/sf0.001")
      .selectExpr("event_id", "event_type").collect().zipWithIndex
      .map { case (r, i) =>
        StreamRecord("events:main", i.toLong + 1, 0, Map("event_type" -> r.getString(1)))
      }
    engine.streams.processBatch(recs.toSeq)

    println("click count  = " + engine.call("pipeline", "num", Seq(RespString("click"))))
    println("error count  = " + engine.call("pipeline", "num", Seq(RespString("error"))))
    println("audit writes = " + engine.state.get("audit:writes").getOrElse("0"))
    engine.list().foreach { l =>
      println(s"library ${l.name}: functions=${l.functions.map(_.name).mkString(",")}")
      l.streamTriggers.foreach(t => t.streams.foreach { case (s, st) =>
        println(s"  trigger ${t.trigger} stream=$s lastReadId=${st.lastReadId} processed=${st.totalProcessed}")
      })
    }

    // upgrade guard: changing a stream trigger's prefix is refused and
    // the previous version keeps serving
    try {
      engine.load(LibraryDefinition("pipeline", code = { lib =>
        lib.registerStreamTrigger("counter", "CHANGED:", (_, _) => ())
      }), replace = true)
    } catch {
      case e: IllegalArgumentException => println("upgrade refused: " + e.getMessage)
    }
    println("still serving v1: num(view) = " +
      engine.call("pipeline", "num", Seq(RespString("view"))))

    // round-2 surface: a durable GraftLog consumed through the custom
    // DSv2 source, with executeAsync + an atomic block on the way out
    val logDir = java.nio.file.Files.createTempDirectory("quickstart-log").toString + "/log"
    val log = new graft.sources.GraftLog(logDir, spark.sparkContext.hadoopConfiguration)
    log.append(Seq(
      StreamRecord("jobs:q", 1, 0, Map("job" -> "resize")),
      StreamRecord("jobs:q", 2, 0, Map("job" -> "dedup"))))
    engine.load(LibraryDefinition("jobs", code = { lib =>
      lib.registerStreamTrigger("worker", "jobs:", (ctx, r) => {
        ctx.rpush("done", r.fields("job")); ()
      }, isStreamTrimmed = true)
      lib.registerFunction("drain", (ctx, _) =>
        ctx.executeAsync { bg =>
          bg.atomic { txn => txn.set("drained", "true") }
          RespString(s"done=${bg.llen("done")}")
        })
    }))
    import spark.implicits._
    val src = spark.readStream.format("graft-log")
      .option("path", logDir).option("prefix", "jobs:").load().as[StreamRecord]
    val q = engine.streams.attach(src,
      java.nio.file.Files.createTempDirectory("quickstart-ckpt").toString)
    q.processAllAvailable(); q.stop()
    println("drain => " + engine.call("jobs", "drain"))
    println("trimmed " + engine.streams.trimLog(log) + " acked records from the log")

    // round-5 surface: cluster functions with real virtual-shard
    // semantics — runOnShards gathers one shard-local view per shard
    // (Redis-cluster CRC16 slots), runOnKey routes to the key's shard
    engine.load(LibraryDefinition("cluster", code = { lib =>
      lib.registerClusterFunction("local_count", (ctx, _) =>
        RespLong(ctx.scan("count:").size.toLong))
      lib.registerFunction("global_count", (ctx, _) => {
        val parts = ctx.runOnShards("local_count")
        RespLong(parts.map(_.asInstanceOf[RespLong].v).sum)
      })
    }))
    println("count:* keys gathered across " + engine.configGet("shard-count") +
      " shards = " + engine.call("cluster", "global_count"))

    // round-8 surface (1/3): the lock watchdog — a function that wedges
    // the state lock is aborted at the lock-timeout deadline and the
    // lock released (heavy work belongs in executeAsync)
    engine.configSet("lock-timeout", "150")
    engine.load(LibraryDefinition("runaway", code = { lib =>
      lib.registerFunction("spin", (ctx, _) => {
        while (true) { ctx.get("k") }
        RespNull
      })
    }))
    try engine.call("runaway", "spin")
    catch { case e: FunctionAbortedException =>
      println("watchdog: " + e.getMessage) }
    println("lock free again: num(click) = " +
      engine.call("pipeline", "num", Seq(RespString("click"))))
    engine.configSet("lock-timeout", "500")

    // round-8 surface (2/3): an interactive debug session — pause an
    // invocation at entry, inspect its args and live state, resume
    val dbg = engine.attachDebugSession("pipeline")
    dbg.breakOn("num")
    val pending = scala.concurrent.Future {
      engine.call("pipeline", "num", Seq(RespString("click")))
    }(scala.concurrent.ExecutionContext.global)
    dbg.awaitPause().foreach { p =>
      println(s"paused ${p.function}(${p.args.mkString(",")}); " +
        s"state says click=${engine.state.get("count:click").getOrElse("?")}")
      p.resume()
    }
    println("resumed => " + scala.concurrent.Await.result(
      pending, scala.concurrent.duration.Duration("10s")))
    dbg.close()

    // round-8 surface (3/3): the evicted event class — an LRU key cap
    // with a class-masked keyspace trigger
    engine.load(LibraryDefinition("evictions", code = { lib =>
      lib.registerKeySpaceTrigger("watch", "", (_, ev) => {
        println(s"evicted: ${ev.key}"); ()
      }, eventTypes = Set("evicted"))
    }))
    engine.configSet("max-keys", engine.state.size.toString)
    engine.state.set("one-too-many", "x") // evicts the LRU key above
    engine.configSet("max-keys", "0")

    // round-9 surface: save/restore — the state table snapshots to
    // parquet (the RDB analogue) and a FRESH engine restores it; the
    // counters computed by the triggers above survive the restart
    val stateDir = java.nio.file.Files.createTempDirectory("quickstart-state").toString + "/rdb"
    engine.saveState(stateDir)
    val clickBefore = engine.state.get("count:click")
    engine.close()
    val engine2 = new Engine(spark)
    engine2.load(LibraryDefinition("pipeline", code = { lib =>
      lib.registerFunction("num", (ctx, fnArgs) => {
        val t = fnArgs.head.asInstanceOf[RespString].v
        RespLong(ctx.get(s"count:$t").map(_.toLong).getOrElse(0L))
      }, flags = Set(FunctionFlags.NoWrites))
    }))
    engine2.loadState(stateDir)
    val clickAfter = engine2.call("pipeline", "num", Seq(RespString("click")))
    println(s"restored from $stateDir: click=$clickAfter (was ${clickBefore.getOrElse("0")})")
    require(clickBefore.contains(clickAfter.asInstanceOf[RespLong].v.toString),
      "save/restore round-trip lost the counter")

    engine2.close()
    if (existing.isEmpty) spark.stop()
    println("QuickStart OK")
  }
}
