package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.RespValue._

/** Virtual-shard semantics of the cluster-function surface (C7/C8):
  * Redis-cluster CRC16 key slots, shard-scoped contexts, runOnShards
  * fan-out/gather, and MOVED on foreign-key access. */
class ShardSpec extends AnyFunSuite {

  private def newEngine() = new Engine(TestSpark.spark)

  private def shardLib(name: String = "slib") = LibraryDefinition(name, code = { lib =>
    // per-shard local key count + key list — the canonical gather shape
    lib.registerClusterFunction("local_keys", (ctx, _) =>
      RespArray(ctx.scan("").sorted.map(RespString)))
    lib.registerClusterFunction("read_key", (ctx, args) =>
      ctx.get(args(1).asInstanceOf[RespString].v).map(RespString).getOrElse(RespNull))
    lib.registerFunction("fanout", (ctx, _) =>
      RespArray(ctx.runOnShards("local_keys")))
    lib.registerFunction("routed_read", (ctx, args) => {
      val routing = args.head.asInstanceOf[RespString].v
      val target = args(1).asInstanceOf[RespString].v
      ctx.runOnKey(routing, "read_key", RespString(target))
    })
  })

  test("keySlot matches the Redis cluster spec's CRC16 vector and hashtags") {
    // CRC16-CCITT/XMODEM("123456789") = 0x31C3 = 12739 (cluster spec's
    // published test vector); 12739 < 16384 so the slot equals the crc
    assert(Engine.keySlot("123456789") == 0x31c3)
    // only the first {hashtag} content hashes: co-located by design
    assert(Engine.keySlot("{user1000}.following") == Engine.keySlot("{user1000}.followers"))
    assert(Engine.keySlot("{user1000}.x") == Engine.keySlot("user1000"))
    // an EMPTY tag hashes the whole key (cluster spec), not ""
    assert(Engine.keySlot("{}abc") != Engine.keySlot("abc"))
  }

  test("runOnShards gathers one disjoint partial view per shard") {
    val e = newEngine()
    e.load(shardLib())
    val keys = (0 until 64).map(i => s"k:$i")
    keys.foreach(k => e.state.set(k, "v"))
    val result = e.call("slib", "fanout").asInstanceOf[RespArray].v
    assert(result.size == e.configGet("shard-count").toInt)
    val perShard = result.map(_.asInstanceOf[RespArray].v.map(_.asInstanceOf[RespString].v))
    // every key appears in exactly one shard's view, and the union is complete
    assert(perShard.flatten.sorted == keys.sorted)
    // the slot mapping actually spreads keys (no degenerate single shard)
    assert(perShard.count(_.nonEmpty) > 1)
    // each shard's view contains exactly the keys that hash to it
    val n = e.configGet("shard-count").toInt
    perShard.zipWithIndex.foreach { case (ks, id) =>
      ks.foreach(k => assert(Engine.shardOf(k, n) == id))
    }
    e.close()
  }

  test("runOnKey routes to the key's shard; foreign keys raise MOVED") {
    val e = newEngine()
    e.load(shardLib())
    val n = e.configGet("shard-count").toInt
    val keys = (0 until 64).map(i => s"k:$i")
    keys.foreach(k => e.state.set(k, k))
    val a = keys.head
    val b = keys.find(k => Engine.shardOf(k, n) != Engine.shardOf(a, n)).get
    // same-shard read succeeds through the routed context
    assert(e.call("slib", "routed_read", Seq(RespString(a), RespString(a)))
      == RespString(a))
    // a key on another shard is MOVED, not silently readable
    val thrown = intercept[Exception](
      e.call("slib", "routed_read", Seq(RespString(a), RespString(b))))
    def rootCause(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else rootCause(t.getCause)
    assert(rootCause(thrown).isInstanceOf[ShardMovedException])
    e.close()
  }

  test("shard-count=1 restores the single-gather view") {
    val e = newEngine()
    e.configSet("shard-count", "1")
    try {
      e.load(shardLib())
      (0 until 16).foreach(i => e.state.set(s"k:$i", "v"))
      val result = e.call("slib", "fanout").asInstanceOf[RespArray].v
      assert(result.size == 1)
      assert(result.head.asInstanceOf[RespArray].v.size == 16)
    } finally {
      e.configSet("shard-count", "4")
      e.close()
    }
  }
}
