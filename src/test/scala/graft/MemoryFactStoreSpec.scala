package graft

import graft.core.FactStore
import graft.memory.MemoryFactStore

/** Contract suite against the in-memory semantic oracle. */
class MemoryFactStoreSpec extends AbstractFactStoreSpec {
  override def newFactStore(): FactStore = new MemoryFactStore
}
