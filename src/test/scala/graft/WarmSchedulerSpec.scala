package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bounded-concurrency warm-landing scheduler (r16, VERDICT r15 #1):
  * dependency-aware heaviest-first task draining with a small worker
  * pool, replacing the 7 fixed chains. The contract the Bench warm
  * phase relies on: every task runs exactly once, never before its
  * dependencies, at most `workers` concurrently, and a failure
  * propagates after the in-flight tasks drain. */
class WarmSchedulerSpec extends AnyFunSuite {
  private def task(name: String, deps: Seq[String], prio: Double,
      body: () => Unit) = (name, deps, prio, body)

  test("all tasks run exactly once and dependencies complete first") {
    val log = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val tasks = Seq(
      task("a", Nil, 5.0, () => { Thread.sleep(5); log.add("a"); () }),
      task("b", Seq("a"), 4.0, () => { log.add("b"); () }),
      task("c", Seq("a", "b"), 3.0, () => { log.add("c"); () }),
      task("d", Nil, 2.0, () => { Thread.sleep(3); log.add("d"); () }),
      task("e", Seq("d"), 1.0, () => { log.add("e"); () }))
    val parts = graft.queries.Citations.runWarmTasks(tasks, workers = 3)
    assert(parts.map(_._1).sorted == Seq("a", "b", "c", "d", "e"))
    val order = scala.jdk.CollectionConverters.ListHasAsScala(log).asScala.toSeq
    assert(order.count(_ == "a") == 1)
    assert(order.indexOf("a") < order.indexOf("b"))
    assert(order.indexOf("b") < order.indexOf("c"))
    assert(order.indexOf("d") < order.indexOf("e"))
  }

  test("at most `workers` tasks run concurrently") {
    val running = new java.util.concurrent.atomic.AtomicInteger(0)
    val peak = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = (1 to 8).map { i =>
      task(s"t$i", Nil, i.toDouble, () => {
        val now = running.incrementAndGet()
        peak.accumulateAndGet(now, math.max)
        Thread.sleep(20)
        running.decrementAndGet(); ()
      })
    }
    graft.queries.Citations.runWarmTasks(tasks, workers = 2)
    assert(peak.get() <= 2, s"peak concurrency ${peak.get()} > 2")
  }

  test("a failing task propagates after the drain; later tasks are abandoned") {
    val ran = java.util.Collections.synchronizedSet(
      new java.util.HashSet[String]())
    val tasks = Seq(
      task("boom", Nil, 9.0, () => { Thread.sleep(5)
        throw new RuntimeException("landing failed") }),
      // lower priority AND gated on a dep the failure strands, so it
      // must never run on any interleaving
      task("gated", Seq("boom"), 8.0, () => { ran.add("gated"); () }))
    val e = intercept[RuntimeException] {
      graft.queries.Citations.runWarmTasks(tasks, workers = 2)
    }
    assert(e.getMessage == "landing failed")
    assert(!ran.contains("gated"))
  }

  test("heavier ready tasks start before lighter ones (single worker)") {
    val log = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val tasks = Seq(
      task("light", Nil, 1.0, () => { log.add("light"); () }),
      task("heavy", Nil, 10.0, () => { log.add("heavy"); () }))
    graft.queries.Citations.runWarmTasks(tasks, workers = 1)
    val order = scala.jdk.CollectionConverters.ListHasAsScala(log).asScala.toSeq
    assert(order == Seq("heavy", "light"))
  }
}
