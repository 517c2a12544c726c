// temp probe — driver-contract smoke: entry() rows>0 at sf0.001
package graft
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get("smoke")
    val n = SparkEntry.entry(s).count()
    println(s"ENTRY_ROWS=$n")
    s.stop()
  }
}
