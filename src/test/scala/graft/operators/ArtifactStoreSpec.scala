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
