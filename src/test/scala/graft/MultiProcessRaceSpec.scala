package graft

import java.nio.file.Files
import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

import graft.core._
import graft.store.SparkFactStore

/** TRUE multi-process store race: a child JVM (StoreRaceChild, spawned
  * with this fork's own classpath) and the parent drive the SAME store
  * root concurrently — plain appends on per-writer subjects plus
  * interleaved self-chained ExpectedLastFact loops on a shared subject.
  * CrossInstanceSpec already bypasses the in-JVM lock with two handles;
  * the process boundary additionally exercises cross-process rename
  * atomicity and directory-listing visibility, which the commit-file CAS
  * protocol ultimately rests on. Matches the reference's concurrency
  * contract (AbstractFactStoreTest.kt:385-420) across real processes.
  *
  * Verification is from the committed log alone: contiguous positions, no
  * loss, and a conditional-generation chain (each GEN fact's tags("exp")
  * must equal the id of the PREVIOUS shared-subject fact) that makes a
  * double-winner or lost update visible as a broken link. */
class MultiProcessRaceSpec extends AnyFunSuite {

  private val NPlain = 12
  private val NCond = 6

  // Every deployment profile of the commit CAS must uphold the contract:
  // the POSIX hard-link publisher, the object-store conditional-put
  // publisher (no links, no protocol-visible rename), and the Hadoop
  // FileSystem profile (URI store root, rename-if-absent CAS — every byte
  // through the Hadoop client in BOTH processes). The child JVM is pointed
  // at the same publisher via -Dgraft.commit.publisher; for hadoop the
  // root is handed to both sides as a file: URI.
  private case class Profile(name: String,
      rootArg: java.nio.file.Path => String,
      mk: java.nio.file.Path => SparkFactStore)
  private val profiles = Seq(
    Profile(graft.store.PosixLinkPublisher.name, _.toString,
      r => new SparkFactStore(SparkTestSession.spark, r,
        publisher = graft.store.PosixLinkPublisher)),
    Profile(graft.store.ConditionalPutPublisher.name, _.toString,
      r => new SparkFactStore(SparkTestSession.spark, r,
        publisher = graft.store.ConditionalPutPublisher)),
    Profile(graft.store.HadoopFsPublisher.name, _.toUri.toString,
      r => SparkFactStore.at(SparkTestSession.spark, r.toUri.toString)))

  for (profile <- profiles)
  test(s"[${profile.name}] parent + child JVM race the same root: contiguous " +
      "positions, exactly one winner per ExpectedLastFact generation") {
    val root = Files.createTempDirectory("graft-mproc-")
    val fs = profile.mk(root)
    assert(fs.createStore("race").isInstanceOf[CreateStoreResult.Created])
    fs.append("race", FactInput("BASE", "shared", Array[Byte](1))) match {
      case _: AppendResult.Appended => ()
      case other => fail(s"$other")
    }

    // child JVM: same classpath + JDK17 add-opens as this forked test JVM
    val java = System.getProperty("java.home") + "/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar",
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = (Seq(java) ++ addOpens ++ Seq("-Xmx2g",
      s"-Dgraft.commit.publisher=${profile.name}",
      "-cp", System.getProperty("java.class.path"),
      "graft.StoreRaceChild", profile.rootArg(root), "race",
      NPlain.toString, NCond.toString)).toArray
    val child = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val childOut = new StringBuilder
    val reader = new Thread(() => {
      val src = scala.io.Source.fromInputStream(child.getInputStream, "UTF-8")
      try src.getLines().foreach(l => childOut.synchronized(childOut.append(l).append('\n')))
      finally src.close()
    })
    reader.setDaemon(true)
    reader.start()

    // parent runs the SAME protocol concurrently (in-thread, this JVM)
    var parentErr: Option[String] = None
    val parent = new Thread(() => {
      try {
        (1 to NPlain).foreach { i =>
          fs.append("race", FactInput(s"PARENT-$i", "parent", Array[Byte](1))) match {
            case _: AppendResult.Appended => ()
            case other => sys.error(s"plain append failed: $other")
          }
        }
        var won = 0
        while (won < NCond) {
          val lastId = fs.findBySubject("race", "shared", Limit.Of(1),
              ReadDirection.Backward) match {
            case FindResult.Found(fcts) if fcts.nonEmpty => fcts.head.id
            case other => sys.error(s"head read failed: $other")
          }
          fs.append(AppendRequest("race",
            Seq(FactInput("GEN", "shared", Array[Byte](1),
              tags = Map("exp" -> lastId, "by" -> "parent"))),
            condition = AppendCondition.ExpectedLastFact("shared", Some(lastId)))) match {
            case _: AppendResult.Appended => won += 1
            case AppendResult.AppendConditionViolated => ()
            case other => sys.error(s"conditional append failed: $other")
          }
        }
      } catch { case e: Throwable => parentErr = Some(e.toString) }
    })
    parent.start()
    assert(child.waitFor(300, TimeUnit.SECONDS),
      { child.destroyForcibly(); "child JVM did not finish" })
    parent.join(300000)
    assert(!parent.isAlive, "parent writer did not finish")
    parentErr.foreach(e => fail(s"parent writer failed: $e"))
    assert(child.exitValue() == 0,
      s"child exited ${child.exitValue()}:\n${childOut.synchronized(childOut.toString)}")
    assert(childOut.synchronized(childOut.toString).contains("CHILD-DONE"))

    // --- verify from the committed log ------------------------------------
    val FindResult.Found(all) = fs.findInTimeRange("race", TimeRange.unbounded): @unchecked
    val expectTotal = 1 + 2 * NPlain + 2 * NCond
    assert(all.size == expectTotal, s"lost or duplicated facts: ${all.size} vs $expectTotal")
    assert(all.map(_.position).sorted == (1L to expectTotal.toLong),
      "positions are not contiguous")
    assert(all.map(_.id).distinct.size == expectTotal)

    // the shared-subject chain: every GEN's exp tag is the id of the
    // previous shared fact — a double winner would break a link
    val shared = all.filter(_.subject == "shared").sortBy(_.position)
    assert(shared.size == 1 + 2 * NCond)
    shared.sliding(2).foreach {
      case Seq(prev, next) =>
        assert(next.tags("exp") == prev.id,
          s"generation chain broken at position ${next.position}: " +
            s"expected-on ${next.tags("exp")} but predecessor is ${prev.id} " +
            s"(by ${next.tags.get("by")})")
      case _ => ()
    }
    // both processes actually won generations (the race was real)
    val winners = shared.drop(1).map(_.tags("by")).toSet
    assert(winners == Set("parent", "child"), s"one-sided race: $winners")
  }
}
