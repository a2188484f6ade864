package graft.core

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The `evicted` keyspace event class (reference R4,
  * `keys_notifications.rs:191-208`: Redis fires it under maxmemory
  * pressure): the state table's `max-keys` cap evicts
  * least-recently-touched keys, each eviction fires "evicted" through
  * the same subscriber surface as writes/"expired", and keyspace
  * trigger registration accepts an event-class filter. */
class EvictionSpec extends AnyFunSuite {

  test("past the max-keys cap, least-recently-touched keys are evicted with events") {
    val e = new Engine(TestSpark.spark)
    val evicted = ArrayBuffer.empty[String]
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerKeySpaceTrigger("ev", "", (_, ev) => evicted += ev.key,
        eventTypes = Set("evicted"))
    }))
    e.configSet("max-keys", "3")
    e.state.set("a", "1")
    e.state.set("b", "2")
    e.state.set("c", "3")
    assert(evicted.isEmpty)
    // touching `a` (a read) makes `b` the LRU victim of the next write
    e.state.get("a")
    e.state.set("d", "4")
    assert(evicted.toSeq == Seq("b"))
    assert(e.state.get("b").isEmpty)
    assert(e.state.get("a").contains("1"))
    assert(e.state.size == 3)
    e.close()
  }

  test("list keys participate in the cap and can be evicted") {
    val e = new Engine(TestSpark.spark)
    val evicted = ArrayBuffer.empty[String]
    e.state.subscribe(ev => if (ev.event == "evicted") evicted += ev.key)
    e.configSet("max-keys", "2")
    e.state.lpush("l1", "x")
    e.state.set("s1", "v")
    e.state.lpush("l2", "y") // over cap: l1 is least-recently-touched
    assert(evicted.toSeq == Seq("l1"))
    assert(e.state.llen("l1") == 0)
    e.close()
  }

  test("event-class filter: a write-only trigger never sees evictions, and vice versa") {
    val e = new Engine(TestSpark.spark)
    val writes = ArrayBuffer.empty[String]
    val evictions = ArrayBuffer.empty[String]
    val everything = ArrayBuffer.empty[String]
    e.load(LibraryDefinition("lib", code = { b =>
      b.registerKeySpaceTrigger("w", "", (_, ev) => writes += ev.event,
        eventTypes = Set("set", "hset"))
      b.registerKeySpaceTrigger("v", "", (_, ev) => evictions += ev.event,
        eventTypes = Set("evicted"))
      b.registerKeySpaceTrigger("all", "", (_, ev) => everything += ev.event)
    }))
    e.configSet("max-keys", "1")
    e.state.set("k1", "a")
    e.state.set("k2", "b") // evicts k1
    assert(writes.toSeq == Seq("set", "set"))
    assert(evictions.toSeq == Seq("evicted"))
    // the unfiltered trigger (empty mask = all classes, the reference
    // default) sees both classes interleaved in order
    assert(everything.toSeq == Seq("set", "set", "evicted"))
    e.close()
  }

  test("an eviction burst inside one commit evicts in recency order") {
    val e = new Engine(TestSpark.spark)
    val evicted = ArrayBuffer.empty[String]
    e.state.subscribe(ev => if (ev.event == "evicted") evicted += ev.key)
    (1 to 5).foreach(i => e.state.set(s"k$i", i.toString))
    e.configSet("max-keys", "2")
    // one transaction writes a new key: 6 keys -> cap 2 means 4 evictions
    e.state.set("fresh", "x")
    assert(evicted.toSeq == Seq("k1", "k2", "k3", "k4"))
    assert(e.state.get("fresh").contains("x"))
    assert(e.state.get("k5").contains("5"))
    e.close()
  }

  test("max-keys 0 (default) never evicts; negative rejected") {
    val e = new Engine(TestSpark.spark)
    val evicted = ArrayBuffer.empty[String]
    e.state.subscribe(ev => if (ev.event == "evicted") evicted += ev.key)
    (1 to 200).foreach(i => e.state.set(s"k$i", i.toString))
    assert(evicted.isEmpty)
    assert(e.state.size == 200)
    intercept[IllegalArgumentException] { e.configSet("max-keys", "-5") }
    e.close()
  }
}
