package graft

/** Shared JSON string escaping for the driver-contract mains (Verify's
  * oracle dump and Bench's failure map read the same json.load). */
object JsonText {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

/** Shared JVM-exit cleanup for temp trees Spark writes into:
  * `File.deleteOnExit` can't remove non-empty directories (and the part
  * files inside are written by Spark, not us), so a shutdown hook walks
  * the tree depth-first. */
object TempTrees {
  def deleteOnExit(root: java.nio.file.Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      if (Files.exists(root)) {
        val stream = Files.walk(root)
        try stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => { Files.deleteIfExists(p); () })
        finally stream.close()
      }
    }))
}
