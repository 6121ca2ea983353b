package graft.tools
object ListQ {
  def main(args: Array[String]): Unit = {
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach(println)
  }
}
