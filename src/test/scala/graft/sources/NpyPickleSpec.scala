package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Direct byte-level contract tests for [[NpyPickle]] — the
  * non-executing unpickler behind the `|O` npz members. The happy
  * path is pinned end-to-end by NpzSpec's numpy-generated golden
  * fixtures (protocols 2/3/4/5); this spec handcrafts streams to pin
  * the FAIL-LOUD contract on malformed or adversarial input, which
  * fixtures can't express. */
class NpyPickleSpec extends AnyFunSuite {

  private def bytes(parts: Any*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    parts.foreach {
      case i: Int => bos.write(i)
      case c: Char => bos.write(c.toInt)
      case s: String =>
        bos.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      case b: Array[Byte] => bos.write(b)
      case other => sys.error(s"bad part $other")
    }
    bos.toByteArray
  }

  /** Minimal protocol-2 stream for a 1-element object ndarray ['x'] —
    * the exact graph numpy's write_array pickles, reduced to one
    * element: _reconstruct REDUCE, then BUILD with state
    * (1, (1,), dtype('O8'), False, ['x']). */
  private def minimalStream(elem: Any = "x"): Array[Byte] = bytes(
    0x80, 2, // PROTO 2
    'c', "numpy.core.multiarray\n_reconstruct\n", // GLOBAL
    'c', "numpy\nndarray\n",
    'K', 0, 0x85, // BININT1 0, TUPLE1
    'C', 1, 'b', // SHORT_BINBYTES b'b'
    0x87, 'R', // TUPLE3, REDUCE -> inert Call
    '(', // MARK (the state tuple)
    'K', 1, // version 1
    'K', 1, 0x85, // shape (1,)
    'c', "numpy\ndtype\n",
    'X', bytes(2, 0, 0, 0), "O8", // BINUNICODE 'O8'
    0x89, 0x88, 0x87, 'R', // (.., False, True) TUPLE3, REDUCE
    0x89, // fortran_order False
    ']', '(', // EMPTY_LIST, MARK
    elem match {
      case s: String => bytes('X', bytes(s.length, 0, 0, 0), s)
      case i: Int => bytes('K', i) // a non-str element for the type test
      case _ => sys.error("bad elem")
    },
    'e', // APPENDS
    't', // TUPLE (the 5-element state)
    'b', '.') // BUILD, STOP

  test("minimal numpy object-ndarray stream decodes") {
    assert(NpyPickle.stringArray(minimalStream(), 1) === Array("x"))
  }

  test("element-count mismatch with the npy header fails loudly") {
    val e = intercept[IllegalArgumentException](
      NpyPickle.stringArray(minimalStream(), 2))
    assert(e.getMessage.contains("1 elements") &&
      e.getMessage.contains("says 2"))
  }

  test("non-string element fails loudly, not a silent toString") {
    val e = intercept[IllegalArgumentException](
      NpyPickle.stringArray(minimalStream(elem = 7), 1))
    assert(e.getMessage.contains("not str/bytes"))
  }

  test("truncated stream (no STOP) fails loudly") {
    val full = minimalStream()
    val e = intercept[Exception](
      NpyPickle.stringArray(full.dropRight(1), 1))
    assert(e.getMessage != null)
  }

  test("unsupported opcode names the byte and offset") {
    val e = intercept[IllegalArgumentException](
      NpyPickle.stringArray(bytes(0x80, 2, 0x99, '.'), 1))
    assert(e.getMessage.contains("unsupported pickle opcode 0x99"))
  }

  test("LONG1 wider than 8 bytes fails instead of wrapping") {
    // PROTO 2, LONG1 k=9 ... — must fail before touching the 9 bytes
    val e = intercept[IllegalArgumentException](
      NpyPickle.stringArray(
        bytes(0x80, 2, 0x8a, 9, Array.fill[Byte](9)(1), '.'), 1))
    assert(e.getMessage.contains("LONG1 of 9 bytes"))
  }

  test("BINGET on an undefined memo key raises the contextual " +
      "diagnostic, not LongMap's bare NoSuchElementException") {
    // PROTO 2, BINGET 5 with an empty memo — a truncated/garbled
    // stream shape (r18 advice)
    val e = intercept[IllegalArgumentException](
      NpyPickle.stringArray(bytes(0x80, 2, 'h', 5, '.'), 1))
    assert(e.getMessage.contains("npz pickled member") &&
      e.getMessage.contains("memo key 5 undefined"))
    val e2 = intercept[IllegalArgumentException](
      NpyPickle.stringArray(bytes(0x80, 2, 'j', 7, 0, 0, 0, '.'), 1))
    assert(e2.getMessage.contains("memo key 7 undefined"))
  }

  test("py2 BINSTRING bytes that are not valid UTF-8 fail loudly " +
      "instead of silently substituting U+FFFD into labels") {
    // same minimal graph but the element is SHORT_BINSTRING with a
    // lone latin-1 0xE9 ('é') — an invalid UTF-8 sequence. The old
    // lenient decode produced "�"; the contract is a contextual
    // error naming the element (r18 advice).
    val latin1 = bytes(
      0x80, 2,
      'c', "numpy.core.multiarray\n_reconstruct\n",
      'c', "numpy\nndarray\n",
      'K', 0, 0x85,
      'C', 1, 'b',
      0x87, 'R',
      '(', 'K', 1, 'K', 1, 0x85,
      'c', "numpy\ndtype\n",
      'X', bytes(2, 0, 0, 0), "O8",
      0x89, 0x88, 0x87, 'R',
      0x89,
      ']', '(', 'U', 1, 0xE9, 'e',
      't', 'b', '.')
    val e = intercept[IllegalArgumentException](
      NpyPickle.stringArray(latin1, 1))
    assert(e.getMessage.contains("not valid UTF-8") &&
      e.getMessage.contains("element 0"))
    // valid UTF-8 py2 bytes still decode (the common py2 ASCII label)
    val ascii = bytes(
      0x80, 2,
      'c', "numpy.core.multiarray\n_reconstruct\n",
      'c', "numpy\nndarray\n",
      'K', 0, 0x85,
      'C', 1, 'b',
      0x87, 'R',
      '(', 'K', 1, 'K', 1, 0x85,
      'c', "numpy\ndtype\n",
      'X', bytes(2, 0, 0, 0), "O8",
      0x89, 0x88, 0x87, 'R',
      0x89,
      ']', '(', 'U', 2, "ok", 'e',
      't', 'b', '.')
    assert(NpyPickle.stringArray(ascii, 1) === Array("ok"))
  }

  test("REDUCE is inert: a GLOBAL naming any callable never executes") {
    // same stream but the constructor global points at an arbitrary
    // name — the decoder must treat it as an opaque node, not resolve
    // or invoke anything, and still read the element list out of BUILD
    val hostile = bytes(
      0x80, 2,
      'c', "os\nsystem\n",
      'c', "builtins\neval\n",
      'K', 0, 0x85,
      'C', 1, 'b',
      0x87, 'R',
      '(', 'K', 1, 'K', 1, 0x85,
      'c', "numpy\ndtype\n",
      'X', bytes(2, 0, 0, 0), "O8",
      0x89, 0x88, 0x87, 'R',
      0x89,
      ']', '(', 'X', bytes(2, 0, 0, 0), "ok", 'e',
      't', 'b', '.')
    assert(NpyPickle.stringArray(hostile, 1) === Array("ok"))
  }
}
