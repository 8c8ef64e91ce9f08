package graft.sources

import org.scalacheck.{Gen, Prop, Properties}

/** Property: for ANY file content and ANY split size, reading every range
  * `[i·s, (i+1)·s)` with [[LineRangeReader]] yields each line exactly once,
  * in file order — the Hadoop boundary convention (a range discards its
  * first line unless it starts at 0; a line starting at pos <= end belongs
  * to the range) must tile the file with no loss and no duplication, even
  * when multi-byte UTF-8 makes byte offsets disagree with char offsets. */
object LineRangeProps extends Properties("LineRangeReader") {

  private val lineGen: Gen[String] = for {
    n <- Gen.chooseNum(0, 12)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("é", "ß", "中", "🙂", "Ω"), // incl. a surrogate pair
      1 -> Gen.const(" ")))
  } yield cs.mkString

  private def readAll(file: java.io.File, splitBytes: Long): Seq[String] = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    conf.set("fs.defaultFS", "file:///")
    val path = new org.apache.hadoop.fs.Path(file.getAbsolutePath)
    val fs = path.getFileSystem(conf)
    val len = fs.getFileStatus(path).getLen
    val out = Seq.newBuilder[String]
    var off = 0L
    while (off < len) {
      val in = fs.open(path)
      try {
        val r = new LineRangeReader(in, off, math.min(splitBytes, len - off))
        var line = r.readLine()
        while (line != null) { out += line; line = r.readLine() }
      } finally in.close()
      off += splitBytes
    }
    out.result()
  }

  property("ranges tile a file: every line once, in order, any split size") =
    Prop.forAll(Gen.listOf(lineGen), Gen.chooseNum(1, 64), Gen.oneOf(true, false)) {
      (lines: List[String], splitBytes: Int, trailingNl: Boolean) =>
        val content = lines.mkString("\n") + (if (trailingNl && lines.nonEmpty) "\n" else "")
        val f = java.io.File.createTempFile("graft-lrr-", ".txt")
        try {
          java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
          val got = readAll(f, splitBytes.toLong)
          // a trailing newline does not create a phantom empty final line;
          // otherwise the reader must reproduce the file's lines exactly
          val want = if (content.isEmpty) Nil else content.split("\n", -1).toSeq match {
            case init :+ "" => init
            case all => all
          }
          got == want
        } finally f.delete()
    }

  property("CRLF input: trailing \\r stripped, byte offsets stay aligned") =
    Prop.forAll(Gen.chooseNum(1, 40)) { splitBytes =>
      val lines = Seq("a", "längère", "", "中文🙂", "end")
      val content = lines.mkString("\r\n") + "\r\n"
      val f = java.io.File.createTempFile("graft-lrr-crlf-", ".txt")
      try {
        java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
        readAll(f, splitBytes.toLong) == lines
      } finally f.delete()
    }
}
