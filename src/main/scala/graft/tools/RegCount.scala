package graft.tools
object RegCount { def main(a: Array[String]): Unit = {
  val names = graft.Registry.all.map(_.name)
  println("COUNT=" + names.size)
  println("DUPES=" + names.diff(names.distinct).mkString(","))
  val oracles = graft.Registry.all.count(_.oracle.isDefined)
  println("ORACLES=" + oracles)
  if (a.contains("--names")) names.foreach(n => println("KEY " + n))
} }
