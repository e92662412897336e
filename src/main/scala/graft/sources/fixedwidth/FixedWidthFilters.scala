package graft.sources.fixedwidth

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pushed-filter compilation for the fixedwidth reader: each supported
  * `sources.Filter` becomes a predicate over the reader's reused row,
  * evaluated right after the referenced fields decode so non-matching
  * records skip the rest of the decode work. Unsupported shapes are simply
  * not pushed (Spark evaluates them post-scan as usual).
  */
object FixedWidthFilters {

  /** Field types we can compare (timestamps/dates are stored as epoch
    * micros/days, so comparisons reduce to long/int compares once the
    * literal is converted through Catalyst's own DateTimeUtils). */
  private def comparableField(name: String, opts: FixedWidthOptions): Boolean =
    name.equalsIgnoreCase(FixedWidthOptions.OffsetCol) ||
      opts.fields.exists(f => f.name.equalsIgnoreCase(name) &&
        Set("int", "long", "double", "string", "timestamp", "date").contains(f.ftype))

  def supported(f: Filter, opts: FixedWidthOptions): Boolean = f match {
    case EqualTo(a, _)            => comparableField(a, opts)
    case GreaterThan(a, _)        => comparableField(a, opts)
    case GreaterThanOrEqual(a, _) => comparableField(a, opts)
    case LessThan(a, _)           => comparableField(a, opts)
    case LessThanOrEqual(a, _)    => comparableField(a, opts)
    case IsNotNull(a)             => comparableField(a, opts)
    case IsNull(a)                => comparableField(a, opts)
    case In(a, vs)                => vs.nonEmpty && vs.forall(_ != null) && comparableField(a, opts)
    case And(l, r)                => supported(l, opts) && supported(r, opts)
    case _                        => false
  }

  /** Compile to (referencedOrdinals, predicate-over-row). Returns None if the
    * attribute is not in the read schema (cannot happen for filters Spark
    * pushes, but stay safe). */
  def compile(
      f: Filter,
      schema: StructType,
      row: GenericInternalRow): Option[(Set[Int], () => Boolean)] = {

    def ord(name: String): Option[Int] = {
      val i = schema.fieldNames.indexWhere(_.equalsIgnoreCase(name))
      if (i < 0) None else Some(i)
    }

    /** Comparator returning sign of (row value - literal), null-aware. */
    def cmp(name: String, value: Any): Option[(Set[Int], () => java.lang.Integer)] =
      ord(name).map { i =>
        val dt = schema.fields(i).dataType
        val f: () => java.lang.Integer = dt match {
          case IntegerType =>
            val v = value.asInstanceOf[Number].intValue()
            () => if (row.isNullAt(i)) null else Integer.valueOf(java.lang.Integer.compare(row.getInt(i), v))
          case LongType =>
            val v = value.asInstanceOf[Number].longValue()
            () => if (row.isNullAt(i)) null else Integer.valueOf(java.lang.Long.compare(row.getLong(i), v))
          case DoubleType =>
            // Normalize -0.0 to 0.0 on both sides: Double.compare orders
            // -0.0 < 0.0 while Catalyst's primitive comparison treats them
            // equal — a pushed EqualTo(0.0) must not drop -0.0 records at the
            // source (the post-scan re-filter cannot restore them). NaN
            // ordering via Double.compare already matches Spark (NaN ==
            // greatest).
            val raw = value.asInstanceOf[Number].doubleValue()
            val v = if (raw == 0.0d) 0.0d else raw
            () => if (row.isNullAt(i)) null else {
              val rv0 = row.getDouble(i)
              val rv = if (rv0 == 0.0d) 0.0d else rv0
              Integer.valueOf(java.lang.Double.compare(rv, v))
            }
          case StringType =>
            val v = UTF8String.fromString(value.toString)
            () => if (row.isNullAt(i)) null else Integer.valueOf(row.getUTF8String(i).compareTo(v))
          case TimestampType | TimestampNTZType =>
            import org.apache.spark.sql.catalyst.util.DateTimeUtils
            val v: Long = value match {
              case t: java.sql.Timestamp      => DateTimeUtils.fromJavaTimestamp(t)
              case inst: java.time.Instant    => DateTimeUtils.instantToMicros(inst)
              case ldt: java.time.LocalDateTime => DateTimeUtils.localDateTimeToMicros(ldt)
              case n: Number                  => n.longValue()
              case _                          => return None
            }
            () => if (row.isNullAt(i)) null else Integer.valueOf(java.lang.Long.compare(row.getLong(i), v))
          case DateType =>
            import org.apache.spark.sql.catalyst.util.DateTimeUtils
            val v: Int = value match {
              case d: java.sql.Date        => DateTimeUtils.fromJavaDate(d)
              case ld: java.time.LocalDate => DateTimeUtils.localDateToDays(ld)
              case n: Number               => n.intValue()
              case _                       => return None
            }
            () => if (row.isNullAt(i)) null else Integer.valueOf(java.lang.Integer.compare(row.getInt(i), v))
          case _ => null
        }
        (Set(i), f)
      }.filter(_._2 != null)

    def fromCmp(name: String, value: Any)(test: Int => Boolean): Option[(Set[Int], () => Boolean)] =
      cmp(name, value).map { case (refs, c) =>
        (refs, () => { val r = c(); r != null && test(r.intValue()) })
      }

    f match {
      case EqualTo(a, v)            => fromCmp(a, v)(_ == 0)
      case GreaterThan(a, v)        => fromCmp(a, v)(_ > 0)
      case GreaterThanOrEqual(a, v) => fromCmp(a, v)(_ >= 0)
      case LessThan(a, v)           => fromCmp(a, v)(_ < 0)
      case LessThanOrEqual(a, v)    => fromCmp(a, v)(_ <= 0)
      case IsNotNull(a)             => ord(a).map(i => (Set(i), () => !row.isNullAt(i)))
      case IsNull(a)                => ord(a).map(i => (Set(i), () => row.isNullAt(i)))
      case In(a, vs) =>
        val compiled = vs.toSeq.map(v => fromCmp(a, v)(_ == 0))
        if (compiled.exists(_.isEmpty)) None
        else Some((compiled.flatMap(_.get._1).toSet, () => compiled.exists(_.get._2())))
      case And(l, r) =>
        for {
          (lr, lp) <- compile(l, schema, row)
          (rr, rp) <- compile(r, schema, row)
        } yield (lr ++ rr, () => lp() && rp())
      case _ => None
    }
  }
}
