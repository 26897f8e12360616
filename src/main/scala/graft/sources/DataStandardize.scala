package graft.sources

import scala.jdk.CollectionConverters._

/** Ingest value standardization — the analog of the reference's
  * `DataTypeTransformerUtils.standardize` (contract pinned by
  * `DataTypeTransformerTest.java:45-230`): a semi-structured value
  * (nested java Map/List/Array wrappers around scalars, as record
  * readers produce for unconfigured complex fields) collapses to its
  * scalar LEAVES — empty collections are ignored at any depth; zero
  * leaves → null; one leaf → the scalar itself; several leaves →
  * an error for a single-value destination, the flattened array for a
  * multi-value one. Used when conforming a dynamic ingest value to an
  * SV/MV field without an explicit complex-type config. */
object DataStandardize {

  private def leaves(v: Any, out: java.util.ArrayList[Any]): Unit = v match {
    case null => ()
    case m: java.util.Map[_, _] => m.values().asScala.foreach(leaves(_, out))
    case l: java.util.List[_] => l.asScala.foreach(leaves(_, out))
    case a: Array[_] => a.foreach(leaves(_, out))
    case s: scala.collection.Iterable[_] => s.foreach(leaves(_, out))
    case x => out.add(x)
  }

  /** Null for no leaves, the scalar for one, an Array[Any] for many
    * (IllegalStateException for many into a single-value column). */
  def standardize(column: String, value: Any, isSingleValue: Boolean): Any = {
    val out = new java.util.ArrayList[Any]()
    leaves(value, out)
    out.size() match {
      case 0 => null
      case 1 => out.get(0)
      case n =>
        if (isSingleValue) throw new IllegalStateException(
          s"Cannot standardize $n values into the single-value column '$column'")
        out.toArray
    }
  }
}
