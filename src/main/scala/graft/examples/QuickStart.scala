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
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
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

    engine.close()
    spark.stop()
  }
}
