package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The train-once contract: one computation per (kind, dir) key per
  * process, replays afterwards, keys independent. */
class ArtifactStoreSpec extends AnyFunSuite with Matchers {

  test("computes once per key and replays the cached value") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    def make(): Seq[Int] = { calls.incrementAndGet(); Seq(1, 2, 3) }
    val kind = s"spec-${System.nanoTime()}" // unique per test run
    val a = ArtifactStore.cached(kind, "/dir/a")(make())
    val b = ArtifactStore.cached(kind, "/dir/a")(make())
    (a eq b) shouldBe true // the SAME cached instance, not a recompute
    calls.get() shouldBe 1
  }

  test("different dirs and kinds are independent keys") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val kind = s"spec2-${System.nanoTime()}"
    ArtifactStore.cached(kind, "/dir/a") { calls.incrementAndGet(); "a" } shouldBe "a"
    ArtifactStore.cached(kind, "/dir/b") { calls.incrementAndGet(); "b" } shouldBe "b"
    ArtifactStore.cached(s"$kind-other", "/dir/a") { calls.incrementAndGet(); "c" } shouldBe "c"
    calls.get() shouldBe 3
  }

  test("concurrent first access computes exactly once") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val kind = s"spec3-${System.nanoTime()}"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = ArtifactStore.cached(kind, "/dir/c") {
            Thread.sleep(20); calls.incrementAndGet(); "once"
          }
        })
      }
      futures.map(_.get()).toSet shouldBe Set("once")
      calls.get() shouldBe 1
    } finally pool.shutdown()
  }

  test("waiters on a failing winner see the winner's original exception type") {
    val kind = s"spec5-${System.nanoTime()}"
    val started = new java.util.concurrent.CountDownLatch(1)
    val release = new java.util.concurrent.CountDownLatch(1)
    val boom = new RuntimeException("trainer failed")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val winner = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = ArtifactStore.cached(kind, "/dir/e") {
          started.countDown(); release.await(); throw boom
        }
      })
      started.await() // waiter joins only AFTER the winner claimed the key
      val waiter = pool.submit(new java.util.concurrent.Callable[String] {
        def call(): String = ArtifactStore.cached(kind, "/dir/e")("never-computed")
      })
      Thread.sleep(50) // let the waiter block on the winner's future
      release.countDown()
      val we = intercept[java.util.concurrent.ExecutionException] { winner.get() }
      we.getCause shouldBe theSameInstanceAs(boom)
      // the waiter replays the SAME original exception, not a
      // CompletionException wrapper (the documented waiter-replay contract)
      val e = intercept[java.util.concurrent.ExecutionException] { waiter.get() }
      e.getCause shouldBe theSameInstanceAs(boom)
      // the failed compute was evicted — a later call retries cleanly
      ArtifactStore.cached(kind, "/dir/e")("retry") shouldBe "retry"
    } finally pool.shutdown()
  }

  test("keys() reflects exactly the memoized (kind, dir) pairs") {
    val kind = s"spec6-${System.nanoTime()}"
    ArtifactStore.keys() should not contain ((kind, "/dir/f"))
    ArtifactStore.cached(kind, "/dir/f")("v")
    ArtifactStore.keys() should contain((kind, "/dir/f"))
  }

  test("same-key re-entrant compute fails loudly instead of deadlocking") {
    val kind = s"spec4-${System.nanoTime()}"
    val e = intercept[IllegalArgumentException] {
      ArtifactStore.cached(kind, "/dir/d") {
        ArtifactStore.cached(kind, "/dir/d")("inner"): String
      }
    }
    e.getMessage should include("re-entrant")
    // the failed compute was evicted — a later call retries cleanly
    ArtifactStore.cached(kind, "/dir/d")("retry") shouldBe "retry"
    // different-key re-entry stays legal (no lock held during compute)
    ArtifactStore.cached(s"$kind-outer", "/dir/d") {
      ArtifactStore.cached(s"$kind-inner", "/dir/d")("ok")
    } shouldBe "ok"
  }
}
