package graft.tools
object RegNames { def main(a: Array[String]): Unit =
  graft.Registry.all.foreach(q => println("KEY " + q.name)) }
