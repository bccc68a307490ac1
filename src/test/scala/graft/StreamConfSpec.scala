package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StreamConf, StreamingSessions}

/** The stateful streaming operators install the certified RocksDB
  * state store as the session default at plan-build time — the
  * rehearsal-proven configuration must be what a user gets, not a
  * harness-only setting ([[StreamConf]]). */
class StreamConfSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val hdfs =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  test("building a stateful transform installs RocksDB on a fresh session") {
    val s = spark.newSession()
    assert(s.conf.get(StreamConf.ProviderKey).endsWith("HDFSBackedStateStoreProvider"),
      "precondition: Spark's built-in default")
    val events = s.range(3).select(
      current_timestamp().as("ts"), lit("k").as("key"), lit(1.0).as("v"))
    StreamingSessions.sessionSummaries(events, "ts", "key", "v", "10 minutes")
    assert(s.conf.get(StreamConf.ProviderKey) == StreamConf.RocksDb)
  }

  test("the graft override wins, even to force the HDFS provider back") {
    val s = spark.newSession()
    s.conf.set(StreamConf.OverrideKey, hdfs)
    StreamConf.ensureStateStore(s)
    assert(s.conf.get(StreamConf.ProviderKey) == hdfs)
  }

  test("an explicitly configured custom provider is left untouched") {
    val s = spark.newSession()
    s.conf.set(StreamConf.ProviderKey, "com.example.CustomStateStoreProvider")
    StreamConf.ensureStateStore(s)
    assert(s.conf.get(StreamConf.ProviderKey)
      == "com.example.CustomStateStoreProvider")
  }
}
