package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MediaFunctions
import graft.functions.MediaFunctions.MediaBlob

/** Batch-decode plumbing invariants for the multimodal layer. */
class MultimodalSpec extends AnyFunSuite {

  private def blob(n: Int) = Array.tabulate(n)(i => (i * 37 % 256).toByte)

  test("decodeBatches preserves order, count, and row identity across batch boundaries") {
    val rows = (0 until 200).map(i => MediaBlob(i.toLong, "img", blob(16)))
    val out = MediaFunctions.decodeBatches(rows.iterator, batchSize = 7).toSeq
    assert(out.map(_.docId) == rows.map(_.docId))
    assert(out.forall(_.nBytes == 16))
    assert(out.forall(_.pixels.length == 16))
  }

  test("stub decode is deterministic and bounded [0,1]") {
    val px = MediaFunctions.decodePixels(blob(64))
    assert(px.forall(p => p >= 0.0 && p <= 1.0))
    assert(px.sameElements(MediaFunctions.decodePixels(blob(64))))
  }

  test("resize truncates; frame sampling takes every k-th byte") {
    val d = MediaFunctions.decodeBatches(Iterator(MediaBlob(1, "img", blob(16)))).next()
    assert(MediaFunctions.resize(d, 4).pixels.length == 4)
    val frames = MediaFunctions.sampleFrames(blob(16), 4)
    assert(frames.length == 4 && frames(1) == blob(16)(4))
  }
}
