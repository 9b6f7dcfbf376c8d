package graft

import java.nio.file.Files

import graft.core.FactStore
import graft.store.SparkFactStore

/** The full 51-behavior contract suite against a `file:`-scheme
  * Hadoop-FileSystem-backed store: every byte of store IO — catalog,
  * commit log, checkpoints, parquet data, stream aliases — runs through
  * the Hadoop client via [[graft.store.HadoopVfs]], with the commit CAS
  * published by [[graft.store.HadoopFsPublisher]] (rename-if-absent, the
  * HDFS mapping of the seam). The sandbox has no namenode, so the `file:`
  * scheme is the emulation substrate — the same discipline the
  * conditional-put profile uses to stand in for S3. */
class HadoopFsFactStoreSpec extends AbstractFactStoreSpec {
  override def newFactStore(): FactStore =
    SparkFactStore.at(SparkTestSession.spark,
      Files.createTempDirectory("graft-hfs-").toUri.toString)
}
