package graft

import java.nio.file.Files

import graft.core.FactStore
import graft.store.SparkFactStore

/** Contract suite against the Spark engine (fresh root dir per test). */
class SparkFactStoreSpec extends AbstractFactStoreSpec {
  override def newFactStore(): FactStore =
    new SparkFactStore(SparkTestSession.spark, Files.createTempDirectory("graft-store-"))
}
