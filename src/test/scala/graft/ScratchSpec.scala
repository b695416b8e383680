package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The exit-sweep utility's immediate-delete path (the hook itself runs
  * the same deleteTree per registered dir at JVM exit). */
class ScratchSpec extends AnyFunSuite {

  test("dir creates a real directory and deleteTree removes a full tree") {
    val d = util.Scratch.dir("graft-scratch-spec")
    assert(Files.isDirectory(Paths.get(d)))
    val sub = Paths.get(d, "a", "b")
    Files.createDirectories(sub)
    Files.writeString(sub.resolve("f.txt"), "x")
    util.Scratch.deleteTree(Paths.get(d))
    assert(!Files.exists(Paths.get(d)))
  }

  test("deleteTree on a missing path is a no-op, not an error") {
    util.Scratch.deleteTree(Paths.get("/tmp/graft-scratch-never-existed"))
  }
}
