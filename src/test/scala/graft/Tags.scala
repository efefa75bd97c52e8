package graft

import org.scalatest.Tag

/** Tag for the multi-JVM crash sweeps and long end-to-end CLI/streaming
  * tests (each 20 s – 4 min: child JVMs, crash-at-every-promote-step
  * sweeps, full ingest chains). The default `sbt test` EXCLUDES this
  * tag (build.sbt wires `-l graft.Slow`) so the fast suite — unit,
  * property, plan-shape and operator tests — finishes inside a CI/driver
  * test budget; run the full suite with
  * `SPARK_GRAFT_SLOW_TESTS=1 sbt test` or
  * `sbt "testOnly * -- -n graft.Slow"` for only the slow set.
  */
object Slow extends Tag("graft.Slow")
