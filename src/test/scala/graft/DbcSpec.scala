package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Blast, Dbc, Dbf}

/** Decoder-level tests for the DBF reader and PKWare DCL (blast) codec —
  * SURVEY §5's property-test plan for the one hard custom piece (§7 risk 1).
  * Property cases use a fixed-seed generator (no scalatestplus bridge in
  * the offline cache). */
class DbcSpec extends AnyFunSuite {

  private def rng = new scala.util.Random(42)

  test("blast round-trips arbitrary bytes through the stored-literal imploder") {
    val r = rng
    (0 until 50).foreach { _ =>
      val data = Array.fill(r.nextInt(2000))(r.nextInt(256).toByte)
      assert(Blast.explode(Blast.implodeStored(data)).sameElements(data))
    }
  }

  private def canonical(rep: Array[Int], nsym: Int): Map[Int, (Int, Int)] = {
    val lengths = new Array[Int](nsym)
    var sym = 0
    rep.foreach { rb =>
      val len = rb & 15
      (0 to (rb >> 4)).foreach { _ => lengths(sym) = len; sym += 1 }
    }
    val count = new Array[Int](16)
    lengths.foreach(l => count(l) += 1)
    val enc = scala.collection.mutable.Map[Int, (Int, Int)]()
    var code = 0
    (1 to 15).foreach { len =>
      var i = 0
      (0 until nsym).filter(lengths(_) == len).foreach { s =>
        enc(s) = (code + i, len); i += 1
      }
      code = (code + count(len)) << 1
    }
    enc.toMap
  }

  test("blast decodes a hand-built length/distance stream (copy semantics)") {
    // Raw-literal mode, dict log 4: emit "AB", then a match of length 4 at
    // distance 2 -> "ABABAB". Length 4 = symbol 2 (base 4, no extra bits).
    val bw = new java.io.ByteArrayOutputStream()
    var bitbuf = 0
    var bitcnt = 0
    def put(v: Int, n: Int): Unit = {
      bitbuf |= (v & ((1 << n) - 1)) << bitcnt; bitcnt += n
      while (bitcnt >= 8) { bw.write(bitbuf & 0xFF); bitbuf >>>= 8; bitcnt -= 8 }
    }
    def putInvMsb(code: Int, len: Int): Unit =
      (len - 1) to 0 by -1 foreach { i => put(((code >> i) & 1) ^ 1, 1) }
    val lenCanon = canonical(Array(2, 35, 36, 53, 38, 23), 16)
    val distCanon = canonical(Array(2, 20, 53, 230, 247, 151, 248), 64)
    put(0, 1); put('A'.toInt, 8)
    put(0, 1); put('B'.toInt, 8)
    put(1, 1)
    val (c2, l2) = lenCanon(2)
    putInvMsb(c2, l2)
    val (d0, dl0) = distCanon(0) // distance high bits = 0
    putInvMsb(d0, dl0)
    put(1, 4) // low 4 bits = 1 -> distance = 0*16 + 1 + 1 = 2
    val (c15, l15) = lenCanon(15)
    put(1, 1); putInvMsb(c15, l15); put(255, 8) // 264 + 255 = 519 = end
    if (bitcnt > 0) bw.write(bitbuf & 0xFF)
    val stream = Array[Byte](0, 4) ++ bw.toByteArray
    assert(new String(Blast.explode(stream), "ISO-8859-1") == "ABABAB")
  }

  test("coded-literal mode round-trips (decoder's Huffman-literal branch)") {
    val r = rng
    (0 until 30).foreach { _ =>
      val data = Array.fill(r.nextInt(3000))(r.nextInt(256).toByte)
      assert(Blast.explode(Blast.implodeCodedLiterals(data)).sameElements(data))
    }
    // static table favors text: ASCII English should beat 8 bits/byte
    val text = ("The quick brown fox jumps over the lazy dog. " * 100).getBytes("ISO-8859-1")
    val packed = Blast.implodeCodedLiterals(text)
    assert(Blast.explode(packed).sameElements(text))
  }

  test("matches + coded literals (real PKWare mode) round-trips both branches at once") {
    val r = rng
    val corpora = Seq(
      ("the quick brown fox " * 400).getBytes("ISO-8859-1"),
      Array.fill(5000)(0.toByte),
      Array.fill(2000)(r.nextInt(256).toByte), // incompressible
      Array.tabulate(8000)(i => ((i % 7) + (i / 100)).toByte),
      Array.emptyByteArray)
    corpora.foreach { data =>
      val packed = Blast.implode(data, codedLiterals = true)
      assert(packed(0) == 1, "coded-literal mode flag")
      assert(Blast.explode(packed).sameElements(data), s"len ${data.length}")
    }
    // coded literals + matches beats raw-literal matches on text
    val text = ("RDPE2501 competencia registro " * 500).getBytes("ISO-8859-1")
    assert(Blast.implode(text, codedLiterals = true).length <
           Blast.implode(text, codedLiterals = false).length)
  }

  test("match-emitting implode round-trips and actually compresses") {
    val r = rng
    // repetitive corpora exercise the length/distance machinery hard
    val corpora = Seq(
      Array.fill(5000)(0.toByte),
      ("the quick brown fox " * 400).getBytes("ISO-8859-1"),
      Array.tabulate(8000)(i => ((i % 7) + (i / 100)).toByte),
      Array.fill(3000)(r.nextInt(4).toByte),
      Array.fill(2000)(r.nextInt(256).toByte), // incompressible
      Array.emptyByteArray)
    corpora.foreach { data =>
      val packed = Blast.implode(data)
      assert(Blast.explode(packed).sameElements(data), s"len ${data.length}")
    }
    val repetitive = ("abcabcabc" * 1000).getBytes("ISO-8859-1")
    val ratio = Blast.implode(repetitive).length.toDouble / repetitive.length
    assert(ratio < 0.2, s"compression ratio $ratio")
  }

  test("dbf write/read round-trip with nulls, padding, and latin1") {
    val cols = Seq("NOME", "VALOR", "OBS")
    val rows = Seq(
      Seq("São Paulo", "0123", null),
      Seq("X", null, "café com açúcar"),
      Seq(null, "99", ""))
    val got = Dbf.records(Dbf.write(cols, rows)).toSeq.map(_.toSeq)
    // "" and null both decode to null (blank-trim semantics, P5)
    assert(got == Seq(
      Seq("São Paulo", "0123", null),
      Seq("X", null, "café com açúcar"),
      Seq(null, "99", null)))
  }

  test("dbf skips records flagged deleted") {
    val bytes = Dbf.write(Seq("A"), Seq(Seq("1"), Seq("2"), Seq("3")))
    val h = Dbf.parseHeader(bytes)
    bytes(h.headerSize + h.recordSize) = 0x2A // delete record 2
    assert(Dbf.records(bytes).map(_(0)).toSeq == Seq("1", "3"))
  }

  test("dbc wraps and unwraps a dbf byte-for-byte (both literal modes)") {
    val r = rng
    (0 until 20).foreach { _ =>
      val n = r.nextInt(40)
      val rows = (0 until n).map(i => Seq(s"r$i", (i * 7).toString))
      val dbf = Dbf.write(Seq("ID", "VAL"), rows)
      assert(Dbc.toDbf(Dbc.fromDbf(dbf)).sameElements(dbf)) // coded (default)
      assert(Dbc.toDbf(Dbc.fromDbf(dbf, coded = false)).sameElements(dbf))
    }
  }

  test("streaming decode equals materialized decode, bounded-buffer, both modes") {
    val r = rng
    // byte-identical streams through the 64 KB window, including outputs
    // far larger than the buffer (match-heavy 8 MB expansion)
    val corpora = Seq(
      ("abcabcabc" * (8 * 1024 * 1024 / 9)).getBytes("ISO-8859-1"),
      Array.fill(100000)(r.nextInt(256).toByte),
      Array.emptyByteArray)
    corpora.foreach { data =>
      Seq(true, false).foreach { coded =>
        val packed = graft.sources.Blast.implode(data, codedLiterals = coded)
        val in = new graft.sources.Blast.ExplodeInputStream(packed, 0)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf, 0, buf.length)
        while (n > 0) { out.write(buf, 0, n); n = in.read(buf, 0, buf.length) }
        assert(out.toByteArray.sameElements(data), s"coded=$coded len=${data.length}")
      }
    }
    // record-level: streamed pruned records == materialized records
    val rows = (0 until 200).map(i => Seq(s"v$i", (i * 31).toString, s"x${i % 7}"))
    val dbf = Dbf.write(Seq("A", "B", "C"), rows)
    val dbc = Dbc.fromDbf(dbf)
    val (h, body) = Dbc.stream(dbc)
    val streamed = Dbf.recordsPrunedStream(h, body, Array(0, 2)).toSeq.map(_.toSeq)
    val direct = Dbf.recordsPruned(dbf, Dbf.parseHeader(dbf), Array(0, 2)).toSeq.map(_.toSeq)
    assert(streamed == direct)
  }

  test("property: streaming decode is byte-exact under arbitrary data and read chunking") {
    val r = rng
    (0 until 25).foreach { trial =>
      // corpora mixing runs (match-heavy) and noise (literal-heavy)
      val n = r.nextInt(200000)
      val data = new Array[Byte](n)
      var i = 0
      while (i < n) {
        if (r.nextInt(3) == 0) {
          val runLen = math.min(n - i, 1 + r.nextInt(600))
          val b = r.nextInt(256).toByte
          java.util.Arrays.fill(data, i, i + runLen, b)
          i += runLen
        } else { data(i) = r.nextInt(256).toByte; i += 1 }
      }
      val coded = trial % 2 == 0
      val packed = graft.sources.Blast.implode(data, codedLiterals = coded)
      val in = new graft.sources.Blast.ExplodeInputStream(packed, 0)
      val out = new java.io.ByteArrayOutputStream()
      // adversarial read pattern: random chunk sizes incl. single-byte read()
      var done = false
      while (!done) {
        if (r.nextInt(4) == 0) {
          val b = in.read()
          if (b < 0) done = true else out.write(b)
        } else {
          val buf = new Array[Byte](1 + r.nextInt(7000))
          val m = in.read(buf, 0, buf.length)
          if (m < 0) done = true else out.write(buf, 0, m)
        }
      }
      assert(out.toByteArray.sameElements(data), s"trial $trial len $n coded=$coded")
    }
  }

  test("dbf round-trips arbitrary printable latin1 tables") {
    val r = rng
    (0 until 40).foreach { _ =>
      val nCols = 1 + r.nextInt(5)
      val nRows = r.nextInt(20)
      val rows = (0 until nRows).map { _ =>
        (0 until nCols).map { _ =>
          if (r.nextInt(4) == 0) null
          else new String(Array.fill(r.nextInt(6))((' ' + r.nextInt('þ' - ' ')).toChar))
        }
      }
      val cols = (0 until nCols).map(i => s"C$i")
      val got = Dbf.records(Dbf.write(cols, rows)).toSeq.map(_.toSeq)
      val expect = rows.map(_.map(v => Option(v).map(_.trim).filter(_.nonEmpty).orNull))
      assert(got == expect)
    }
  }
}
