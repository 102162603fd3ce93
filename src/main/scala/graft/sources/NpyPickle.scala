package graft.sources

import scala.collection.mutable

/** Minimal unpickler for the ONE pickle shape numpy's `.npy` format
  * ever embeds: a flat 1-d object ndarray whose elements are strings
  * or bytes — what `np.savez` writes for a pandas STRING index or
  * columns (`Index.values` of str is dtype=object, reference
  * io.py:28-30 stores exactly that), i.e. the most common sparsity
  * archive member shape (one-hot category names,
  * sparse_frame.py:567-579). r17 made `|O` members fail loudly; this
  * closes the gap by actually decoding them.
  *
  * The stream is `pickle.dump(ndarray, protocol)` out of
  * `numpy.lib.format.write_array` — a `numpy.core.multiarray
  * ._reconstruct` REDUCE followed by one `BUILD` whose state tuple
  * ends in the Python list of elements. We run a small stack-machine
  * over the opcode subset pickle protocols 0's binary successors
  * (2–5) emit for that object graph, modelling foreign constructors
  * (`_reconstruct`, `numpy.dtype`) as opaque call nodes, then read
  * the element list out of the final BUILD state. Anything outside
  * the supported opcode set fails loudly with the opcode byte — this
  * is a format shim, not a Python VM: no object instantiation, no
  * imports, no code execution of any kind.
  *
  * SECURITY NOTE kept deliberate: REDUCE never calls anything — it
  * allocates an inert `Call` node. A malicious pickle cannot make
  * this decoder do more than return strings or raise.
  */
private[sources] object NpyPickle {

  private sealed trait V
  private final case class S(s: String) extends V // str
  private final case class B(b: Array[Byte]) extends V // bytes
  private final case class I(l: Long) extends V
  private final case class F(d: Double) extends V
  private case object PNone extends V
  private final case class Bool(v: Boolean) extends V
  private final case class Tup(vs: Vector[V]) extends V
  private final case class L(buf: mutable.ArrayBuffer[V]) extends V
  private final case class D(m: mutable.LinkedHashMap[V, V]) extends V
  private final case class Global(mod: String, name: String) extends V
  /** Inert REDUCE result; BUILD attaches `state`. Never invoked. */
  private final class Call(val callee: V, val args: V) extends V {
    var state: V = PNone
  }
  private case object Mark extends V

  /** Decode a pickled flat object ndarray of str/bytes into strings
    * (bytes decode as UTF-8 — py2-era archives store labels as str).
    * `n` is the element count the npy header promised. */
  def stringArray(payload: Array[Byte], n: Long): Array[String] = {
    val root = run(payload)
    val elems: Seq[V] = root match {
      case c: Call => c.state match {
        case Tup(vs) => vs.lastOption match {
          case Some(L(buf)) => buf.toSeq
          case other => fail(s"ndarray BUILD state does not end in the " +
            s"element list (got ${other.map(_.getClass.getSimpleName)})")
        }
        case other => fail("ndarray BUILD state is not a tuple: " +
          other.getClass.getSimpleName)
      }
      case other => fail("pickle root is not a reconstructed object: " +
        other.getClass.getSimpleName)
    }
    require(elems.length == n,
      s"pickled object array has ${elems.length} elements, npy header says $n")
    elems.zipWithIndex.map {
      case (S(s), _) => s
      case (B(b), i) => decodeUtf8Strict(b, i)
      case (other, _) => fail("object array element is not str/bytes: " +
        other.getClass.getSimpleName +
        " — only string index/columns members are supported")
    }.toArray
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"npz pickled member: $msg")

  /** py2-era BINSTRING bytes → String, STRICTLY: a py2 archive whose
    * labels were latin-1 (not UTF-8) must fail loudly naming the
    * element, not silently substitute U+FFFD into column/index labels
    * (the file's fail-loud contract; r18 advice). */
  private def decodeUtf8Strict(b: Array[Byte], elem: Int): String = {
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch {
      case _: java.nio.charset.CharacterCodingException =>
        fail(s"object array element $elem is a py2 str whose bytes are " +
          "not valid UTF-8 (latin-1 archive?) — refusing to corrupt labels")
    }
  }

  private def run(p: Array[Byte]): V = {
    val stack = mutable.ArrayBuffer.empty[V]
    val memo = mutable.LongMap.empty[V]
    var pos = 0
    def u8(): Int = { val v = p(pos) & 0xFF; pos += 1; v }
    def u16(): Int = u8() | (u8() << 8)
    def i32(): Int = u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)
    def u64(): Long = {
      var v = 0L; var i = 0
      while (i < 8) { v |= (u8().toLong << (8 * i)); i += 1 }
      v
    }
    def bytes(k: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(p, pos, pos + k); pos += k; out
    }
    def utf8(k: Int): String =
      new String(bytes(k), java.nio.charset.StandardCharsets.UTF_8)
    def line(): String = {
      val nl = p.indexOf('\n'.toByte, pos)
      require(nl >= 0, "unterminated pickle text line")
      val s = new String(p, pos, nl - pos,
        java.nio.charset.StandardCharsets.US_ASCII)
      pos = nl + 1
      s
    }
    def pop(): V = { val v = stack.remove(stack.length - 1); v }
    def popToMark(): Vector[V] = {
      val at = stack.lastIndexOf(Mark)
      require(at >= 0, "pickle MARK underflow")
      val vs = stack.slice(at + 1, stack.length).toVector
      stack.remove(at, stack.length - at)
      vs
    }
    def memoPut(k: Long): Unit = memo(k) = stack.last

    while (pos < p.length) {
      val op = u8()
      (op: @annotation.switch) match {
        case 0x80 => u8(): Unit // PROTO
        case 0x95 => u64(): Unit // FRAME (protocol 4+): length hint only
        case '.' => // STOP
          require(stack.length == 1, s"pickle STOP with ${stack.length} items")
          return stack.head
        case 'c' => stack += Global(line(), line()) // GLOBAL
        case 0x93 => // STACK_GLOBAL
          val name = pop(); val mod = pop()
          (mod, name) match {
            case (S(m), S(nm)) => stack += Global(m, nm)
            case _ => fail("STACK_GLOBAL on non-strings")
          }
        case 'q' => memoPut(u8().toLong) // BINPUT
        case 'r' => memoPut(i32().toLong & 0xFFFFFFFFL) // LONG_BINPUT
        case 0x94 => memoPut(memo.size.toLong) // MEMOIZE
        // a missing memo key is a truncated/garbled stream — raise the
        // contextual diagnostic, not LongMap's bare NoSuchElementException
        case 'h' => // BINGET
          val k = u8().toLong
          stack += memo.getOrElse(k, fail(s"pickle memo key $k undefined"))
        case 'j' => // LONG_BINGET
          val k = i32().toLong & 0xFFFFFFFFL
          stack += memo.getOrElse(k, fail(s"pickle memo key $k undefined"))
        case 'K' => stack += I(u8().toLong) // BININT1
        case 'M' => stack += I(u16().toLong) // BININT2
        case 'J' => stack += I(i32().toLong) // BININT (signed)
        case 0x8a => // LONG1
          val k = u8()
          // a >8-byte int cannot fit a Long; the JVM's shift would wrap
          // mod 64 and silently corrupt the value — fail loudly instead
          require(k <= 8, s"pickle LONG1 of $k bytes exceeds 64-bit range")
          var v = 0L; var i = 0
          val bs = bytes(k)
          while (i < k) { v |= (bs(i).toLong & 0xFF) << (8 * i); i += 1 }
          if (k > 0 && k < 8 && (bs(k - 1) & 0x80) != 0)
            v -= (1L << (8 * k)) // sign-extend
          stack += I(v)
        case 'G' => // BINFLOAT (big-endian double)
          var v = 0L; var i = 0
          while (i < 8) { v = (v << 8) | u8().toLong; i += 1 }
          stack += F(java.lang.Double.longBitsToDouble(v))
        case 'X' => stack += S(utf8(i32())) // BINUNICODE
        case 0x8c => stack += S(utf8(u8())) // SHORT_BINUNICODE
        case 0x8d => stack += S(utf8(toInt(u64()))) // BINUNICODE8
        case 'U' => stack += B(bytes(u8())) // SHORT_BINSTRING (py2 str)
        case 'T' => stack += B(bytes(i32())) // BINSTRING (py2 str)
        case 'C' => stack += B(bytes(u8())) // SHORT_BINBYTES
        case 'B' => stack += B(bytes(i32())) // BINBYTES
        case 0x8e => stack += B(bytes(toInt(u64()))) // BINBYTES8
        case 'N' => stack += PNone // NONE
        case 0x88 => stack += Bool(true) // NEWTRUE
        case 0x89 => stack += Bool(false) // NEWFALSE
        case '(' => stack += Mark // MARK
        case ')' => stack += Tup(Vector.empty) // EMPTY_TUPLE
        case 0x85 => stack += Tup(Vector(pop())) // TUPLE1
        case 0x86 => // TUPLE2
          val b2 = pop(); val a = pop(); stack += Tup(Vector(a, b2))
        case 0x87 => // TUPLE3
          val c3 = pop(); val b2 = pop(); val a = pop()
          stack += Tup(Vector(a, b2, c3))
        case 't' => stack += Tup(popToMark()) // TUPLE
        case ']' => stack += L(mutable.ArrayBuffer.empty) // EMPTY_LIST
        case 'a' => // APPEND
          val v = pop()
          stack.last match {
            case L(buf) => buf += v
            case _ => fail("APPEND to non-list")
          }
        case 'e' => // APPENDS
          val vs = popToMark()
          stack.last match {
            case L(buf) => buf ++= vs
            case _ => fail("APPENDS to non-list")
          }
        case '}' => stack += D(mutable.LinkedHashMap.empty) // EMPTY_DICT
        case 's' => // SETITEM
          val v = pop(); val k = pop()
          stack.last match {
            case D(m) => m(k) = v
            case _ => fail("SETITEM on non-dict")
          }
        case 'u' => // SETITEMS
          val vs = popToMark()
          stack.last match {
            case D(m) => vs.grouped(2).foreach {
              case Seq(k, v) => m(k) = v
              case _ => fail("odd SETITEMS payload")
            }
            case _ => fail("SETITEMS on non-dict")
          }
        case 'R' => // REDUCE — inert: record, never call
          val args = pop(); val callee = pop()
          stack += new Call(callee, args)
        case 'b' => // BUILD — attach state to the object under it
          val state = pop()
          stack.last match {
            case c: Call => c.state = state
            case other => fail("BUILD on non-object: " +
              other.getClass.getSimpleName)
          }
        case 0x81 => // NEWOBJ (protocol 2 class(*args)) — inert like REDUCE
          val args = pop(); val cls = pop()
          stack += new Call(cls, args)
        case other => fail(f"unsupported pickle opcode 0x$other%02x at " +
          s"offset ${pos - 1} — not a flat str/bytes object array?")
      }
    }
    fail("pickle stream ended without STOP")
  }

  private def toInt(l: Long): Int = {
    require(l >= 0 && l <= Int.MaxValue, s"pickle length $l out of range")
    l.toInt
  }
}
