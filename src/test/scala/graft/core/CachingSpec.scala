package graft.core

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CachingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("persistTracked registers and releaseAll unpersists") {
    val p = Caching.persistTracked(spark.range(100).toDF("id"))
    p.count()
    assert(p.storageLevel.useMemory || p.storageLevel.useDisk)
    assert(Caching.releaseAll() >= 1)
    assert(p.storageLevel === StorageLevel.NONE)
    // queue drained: a second call releases nothing
    assert(Caching.releaseAll() === 0)
  }

  test("scopedRelease drops only frames tracked inside the scope") {
    val outer = Caching.persistTracked(spark.range(50).toDF("id"))
    outer.count()
    var innerRef: org.apache.spark.sql.DataFrame = null
    val res = Caching.scopedRelease {
      innerRef = Caching.persistTracked(spark.range(10).toDF("x"))
      innerRef.count()
      42
    }
    assert(res === 42, "scopedRelease must pass the body's result through")
    assert(innerRef.storageLevel === StorageLevel.NONE,
      "in-scope persist must be released on exit")
    assert(outer.storageLevel.useMemory || outer.storageLevel.useDisk,
      "pre-existing tracked persist must survive the scope")
    // outer is still tracked for a later releaseAll
    assert(Caching.releaseAll() >= 1)
    assert(outer.storageLevel === StorageLevel.NONE)
  }

  test("scopedRelease is thread-scoped: concurrent tracking survives") {
    // two ingest streams in one session: stream B tracks a frame while
    // stream A's scope is open — A's exit must not release B's cache
    var otherRef: org.apache.spark.sql.DataFrame = null
    Caching.scopedRelease {
      val mine = Caching.persistTracked(spark.range(20).toDF("a"))
      mine.count()
      val t = new Thread(() => {
        otherRef = Caching.persistTracked(spark.range(30).toDF("b"))
        otherRef.count()
      })
      t.start()
      t.join()
      assert(mine.storageLevel.useMemory || mine.storageLevel.useDisk)
    }
    assert(otherRef.storageLevel.useMemory || otherRef.storageLevel.useDisk,
      "a frame tracked by another thread mid-scope must survive the scope")
    assert(Caching.releaseAll() >= 1, "the other thread's frame stays tracked")
    assert(otherRef.storageLevel === StorageLevel.NONE)
  }

  test("operators leave no cached blocks behind after releaseAll") {
    import spark.implicits._
    Caching.releaseAll() // drain anything earlier suites tracked
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = (0L until 30L)
      .map(i => (i, s"some text body number ${i % 7} tail $i"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.minhashNearDup(docs, "doc_id", "text").count()
    assert(Caching.releaseAll() >= 1)
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      "minhashNearDup must not add lasting cached RDDs")
  }
}
