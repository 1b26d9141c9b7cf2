package graft

import graft.sources.Hyfs

/** S5 DFS verbs: create/get/append/ls/multiappend/merge over the
  * block-directory model (reference: dht/dht.go:773-931). The contracts
  * the reference's test plan exercises: roundtrip, concurrent appends
  * all land with one deterministic observed order, merge preserves
  * content, appends keep working after merge.
  */
class HyfsSpec extends GraftSpec {

  test("create + get roundtrip") {
    val f = tmpDir("hyfs") + "/file1"
    Hyfs.create(spark, f, "hello\n")
    assert(Hyfs.get(spark, f) === "hello\n")
    intercept[IllegalArgumentException](Hyfs.create(spark, f, "again"))
  }

  test("append accumulates in canonical order") {
    val f = tmpDir("hyfs") + "/file2"
    Hyfs.create(spark, f, "a")
    Hyfs.append(spark, f, "b")
    Hyfs.append(spark, f, "c")
    assert(Hyfs.get(spark, f) === "abc")
    assert(Hyfs.ls(spark, f).length === 3)
  }

  test("multiappend: concurrent appends all land; every reader sees the same order") {
    val f = tmpDir("hyfs") + "/file3"
    Hyfs.create(spark, f, "")
    val parts = (1 to 16).map(i => s"[$i]")
    Hyfs.multiappend(spark, f, parts)
    val got = Hyfs.get(spark, f)
    // all data landed, none interleaved mid-block
    parts.foreach(p => assert(got.contains(p), s"$p missing"))
    assert(got.length === parts.map(_.length).sum)
    // deterministic: repeated reads agree (canonical name order)
    assert(Hyfs.get(spark, f) === got)
  }

  test("block order is clock-free: logical sequence, no timestamp in names") {
    // A writer with a regressed/skewed clock cannot reorder content,
    // because block names carry NO wall-clock component at all: the
    // sequence is derived from the file's current max block seq + 1, so
    // ANY writer — whatever its clock says — orders strictly after
    // every block it can observe.
    val f = tmpDir("hyfs") + "/file5"
    Hyfs.create(spark, f, "a")
    Hyfs.append(spark, f, "b")
    def seqs() = Hyfs.ls(spark, f).map(_.split("-")(1).toLong)
    assert(seqs() === Seq(1L, 2L))
    Hyfs.append(spark, f, "c") // the "regressed-clock" writer
    assert(seqs() === Seq(1L, 2L, 3L))
    assert(Hyfs.get(spark, f) === "abc")
    // name shape: zero-padded logical seq + uuid — nothing time-derived
    Hyfs.ls(spark, f).foreach(n =>
      assert(n.matches("block-\\d{16}-[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")))
    // merge compacts to seq max+1; later appends keep ordering after it
    Hyfs.merge(spark, f)
    Hyfs.append(spark, f, "d")
    assert(Hyfs.get(spark, f) === "abcd")
    assert(seqs() === seqs().sorted)
  }

  test("merge compacts to one block and preserves content; appends continue") {
    val f = tmpDir("hyfs") + "/file4"
    Hyfs.create(spark, f, "x")
    Hyfs.multiappend(spark, f, Seq("y", "z", "w"))
    val before = Hyfs.get(spark, f)
    Hyfs.merge(spark, f)
    assert(Hyfs.ls(spark, f).length === 1)
    assert(Hyfs.get(spark, f) === before)
    Hyfs.append(spark, f, "!")
    assert(Hyfs.get(spark, f) === before + "!")
  }
}
