package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Blast, Dbf, Dbc}

/** Mutation-fuzz contract for the ETL-core binary decoders — the same
  * decode-or-named-IAE discipline CodecFuzzSpec pins for the media
  * tier, applied where it matters most: Blast (PKWare DCL), the dBASE
  * reader, and the .dbc container walk sit on the reference's primary
  * ingest path and face every byte an upstream mirror serves.
  * Deterministic seed; both the materializing and the streaming decode
  * paths are driven, and iteration is FORCED (the record iterators are
  * lazy — an escape inside field slicing only fires on next()).
  */
class DbcFuzzSpec extends AnyFunSuite {

  // Unified fuzz budget (round-12): same committed budget as
  // CodecFuzzSpec, same GRAFT_FUZZ_SCALE validation knob — the zip walk
  // and the record decoders run the full 7200-case tier when scaled,
  // not a private smaller one.
  private val Scale = FuzzBudget.scale
  private val Mutations = 600 * Scale
  private val Truncations = 150 * Scale
  private val Garbage = 150 * Scale

  private def fuzz(name: String, valid: Array[Byte], decode: Array[Byte] => Any): Unit = {
    decode(valid)
    val rnd = new scala.util.Random(0xDBC + name.hashCode)
    var ok = 0L
    var rejected = 0L
    def one(b: Array[Byte], what: => String): Unit =
      try { decode(b); ok += 1 }
      catch {
        case _: IllegalArgumentException => rejected += 1
        case t: Throwable =>
          fail(s"$name/$what escaped the checked-failure contract: " +
            s"${t.getClass.getName}: ${t.getMessage}")
      }
    (1 to Mutations).foreach { i =>
      val b = valid.clone()
      (0 until 1 + rnd.nextInt(4)).foreach { _ =>
        b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      }
      one(b, s"mutate#$i")
    }
    (1 to Truncations).foreach { i =>
      one(valid.take(rnd.nextInt(valid.length)), s"trunc#$i")
    }
    (1 to Garbage).foreach { i =>
      val b = new Array[Byte](1 + rnd.nextInt(256))
      rnd.nextBytes(b)
      one(b, s"garbage#$i")
    }
    info(s"$name: $ok decoded, $rejected rejected by name, 0 escapes")
  }

  private val fieldNames = Seq("UF", "COMPET", "VALOR", "NOME")
  private val rows: Seq[Seq[String]] = (0 until 40).map { i =>
    Seq(f"U${i % 9}%s", f"2024${1 + i % 12}%02d", (i * 137).toString, s"nome-$i")
  }
  private val dbf = Dbf.write(fieldNames, rows)
  private val dbc = Dbc.fromDbf(dbf)
  private val dbcRaw = Dbc.fromDbf(dbf, coded = false)

  test("DBF reader: decode-or-IAE under mutation, truncation, and garbage") {
    fuzz("dbf", dbf, b => Dbf.records(b).foreach(_ => ()))
  }

  test("DBF pruned reader: decode-or-IAE with a column projection") {
    fuzz("dbf-pruned", dbf, { b =>
      val h = Dbf.parseHeader(b)
      val idx = h.fields.indices.take(2).toArray
      Dbf.recordsPruned(b, h, idx).foreach(_ => ())
    })
  }

  test("Blast explode: decode-or-IAE on the imploded body") {
    // body starts after the DBF header + 4-byte CRC slot in the .dbc
    val headerSize = Dbf.parseHeader(dbf).headerSize
    val body = dbc.drop(headerSize + 4)
    fuzz("blast", body, b => Blast.explode(b, 0, maxOut = 1 << 24))
    val bodyRaw = dbcRaw.drop(headerSize + 4)
    fuzz("blast-raw", bodyRaw, b => Blast.explode(b, 0, maxOut = 1 << 24))
  }

  test("DBC materializing path: decode-or-IAE end to end") {
    fuzz("dbc", dbc, { b =>
      val out = Dbc.toDbf(b)
      Dbf.records(out).foreach(_ => ())
    })
  }

  test("DBC streaming path: decode-or-IAE end to end") {
    fuzz("dbc-stream", dbc, { b =>
      val (h, in) = Dbc.stream(b)
      try Dbf.recordsPrunedStream(h, in, h.fields.indices.toArray).foreach(_ => ())
      finally in.close()
    })
  }

  test("ZIP member walk: extract-or-IAE under mutation, truncation, and garbage") {
    // a valid two-member archive (one .dbc, one ignored .txt)
    val zipBytes = {
      val bos = new java.io.ByteArrayOutputStream()
      val zos = new java.util.zip.ZipOutputStream(bos)
      zos.putNextEntry(new java.util.zip.ZipEntry("ufmg2401.dbc"))
      zos.write(dbc); zos.closeEntry()
      zos.putNextEntry(new java.util.zip.ZipEntry("leia-me.txt"))
      zos.write("dados abertos".getBytes("UTF-8")); zos.closeEntry()
      zos.close()
      bos.toByteArray
    }
    fuzz("zip", zipBytes,
      b => graft.sources.DatasusEtl.explodeZipMembers("/lake/a.zip", b))
  }

  test("crafted header: recordSize below the field layout is rejected by name") {
    val b = dbf.clone()
    b(10) = 2; b(11) = 0 // recordSize 2 << 1 + field widths
    val e = intercept[IllegalArgumentException](Dbf.records(b).foreach(_ => ()))
    assert(e.getMessage.contains("recordSize"))
  }

  test("crafted header: recordSize zero cannot spin the record loop") {
    val b = dbf.clone()
    b(10) = 0; b(11) = 0
    intercept[IllegalArgumentException](Dbf.records(b).foreach(_ => ()))
  }
}
