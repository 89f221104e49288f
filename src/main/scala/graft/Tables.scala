package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the harness fixture tables (/root/repo/FIXTURES.md §B).
  *
  * All tables are single parquet files per scale factor; schemas travel in the
  * parquet footers, so no explicit StructType is imposed here. Column pruning
  * and predicate pushdown reach the scan because every query selects/filters
  * on the DataFrame before any wide transform.
  */
object Tables {
  /** Footer schema per (dir, table), memoized for the process (round 12):
    * `spark.read.parquet` re-infers the schema on EVERY call (file listing
    * + footer decode + DataSource resolution — measured 60–100 ms warm per
    * read), and a bench/verify process builds thousands of scans over ten
    * IMMUTABLE fixture files. The cached value IS the file's real inferred
    * footer schema, captured under the same session confs the first read
    * ran with (e.g. the events nanosAsLong dispatch, which its loader sets
    * before any events read), so every downstream plan — type dispatch,
    * pruning, pushdown — is identical; only the re-inference is skipped.
    * This is the metastore posture at 100 TB: a table's schema is catalog
    * metadata read once, not re-derived per query. */
  private val schemaCache = scala.collection.concurrent.TrieMap
    .empty[String, org.apache.spark.sql.types.StructType]
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val schema = schemaCache.getOrElseUpdate(path,
      spark.read.parquet(path).schema)
    spark.read.schema(schema).parquet(path)
  }

  /** Every fixture table, in FIXTURES.md order. */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Loader by name, routing through the special-cased readers. */
  def apply(s: SparkSession, d: String, name: String): DataFrame = name match {
    case "events"     => events(s, d)
    case "documents"  => documents(s, d)
    case "embeddings" => embeddings(s, d)
    case other        => table(s, d, other)
  }

  /** The fixture files are single-row-group parquet, so a scan is ONE task
    * and all narrow compute before the first shuffle runs single-threaded.
    * For the compute-dense tables (per-row hashing / vector math) a cheap
    * hash repartition up to the session's parallelism fixes that. On real
    * multi-row-group/multi-file inputs (the 100 TB case) the scan is already
    * parallel and this is a no-op.
    *
    * The scan-partition probe (`df.rdd.getNumPartitions`) forces an RDD
    * conversion, so its result is memoized per (path, parallelism) — each
    * query build reuses the first probe instead of re-planning the scan. */
  private val scanParts = scala.collection.concurrent.TrieMap.empty[String, Int]
  private def parallelized(df: DataFrame, key: Column, cacheKey: String): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val n = scanParts.getOrElseUpdate(s"$cacheKey@$target", df.rdd.getNumPartitions)
    if (n < target) df.repartition(target, key) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The fixture contract says `events.ts: TIMESTAMP` (FIXTURES.md §B), but
    * generator vintages have shipped it as either parquet TIMESTAMP(MICROS)
    * (readable directly) or TIMESTAMP(NANOS) (which Spark's vectorized reader
    * rejects unless read as raw INT64 under the legacy conf). Setting the
    * legacy conf is a no-op for micros files, so: set it, scan, and dispatch
    * on the type that actually came back — LongType means a nanos file, so
    * truncate to micros with integer division (the same truncation DuckDB
    * applies reading ns into its default µs TIMESTAMP, keeping oracle
    * parity); TimestampType is used as-is. Any other type is a generator
    * contract break and fails fast with one clear message instead of 16
    * downstream AnalysisExceptions. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType    => df
      // parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) scans as NTZ; the
      // session zone is UTC everywhere (Bench/Verify/specs), so casting to
      // the instant type is wall-clock identity and keeps every downstream
      // consumer on the same type the nanos path produced.
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"fixture schema mismatch: events.ts expected TIMESTAMP or INT64-nanos, found $other in $d/events.parquet")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame =
    parallelized(table(s, d, "documents"), col("doc_id"), s"$d/documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    parallelized(table(s, d, "embeddings"), col("vec_id"), s"$d/embeddings")

  /** Expected fixture schemas (FIXTURES.md §B), as loose type families so a
    * generator swapping int32↔int64 or micros↔nanos timestamps still
    * validates — those vintages are handled by the loaders. */
  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region"     -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation"     -> Seq("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer"   -> Seq("c_custkey" -> "int", "c_name" -> "string", "c_nationkey" -> "int",
                        "c_acctbal" -> "float", "c_mktsegment" -> "string"),
    "supplier"   -> Seq("s_suppkey" -> "int", "s_name" -> "string", "s_nationkey" -> "int",
                        "s_acctbal" -> "float"),
    "part"       -> Seq("p_partkey" -> "int", "p_name" -> "string", "p_brand" -> "string",
                        "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "float"),
    "orders"     -> Seq("o_orderkey" -> "int", "o_custkey" -> "int", "o_orderstatus" -> "string",
                        "o_totalprice" -> "float", "o_orderdate" -> "timestamp",
                        "o_orderpriority" -> "string"),
    "lineitem"   -> Seq("l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
                        "l_linenumber" -> "int", "l_quantity" -> "float",
                        "l_extendedprice" -> "float", "l_discount" -> "float", "l_tax" -> "float",
                        "l_returnflag" -> "string", "l_linestatus" -> "string",
                        "l_shipdate" -> "timestamp"),
    "events"     -> Seq("event_id" -> "int", "ts" -> "timestamp", "user_id" -> "int",
                        "event_type" -> "string", "value" -> "float", "props" -> "string"),
    "documents"  -> Seq("doc_id" -> "int", "text" -> "string", "lang" -> "string",
                        "source" -> "string", "n_chars" -> "int"),
    "embeddings" -> Seq("vec_id" -> "int", "embedding" -> "array<float>", "label" -> "int"))

  private def family(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => "int"
      case _: FloatType | _: DoubleType | _: DecimalType             => "float"
      case _: StringType                                             => "string"
      case _: TimestampType | _: TimestampNTZType                    => "timestamp"
      case ArrayType(e, _)                                           => s"array<${family(e)}>"
      case other                                                     => other.simpleString
    }
  }

  /** Footer-only schema audit of every fixture table under `dir`. Returns one
    * human-readable line per mismatch ("events.ts: expected timestamp, found
    * string") — empty means the fixtures honor the FIXTURES.md §B contract.
    * `events.ts` read as INT64 under the legacy-nanos conf counts as a
    * timestamp, since the loader restores it (see [[events]]). */
  def validate(s: SparkSession, dir: String): Seq[String] =
    names.flatMap { t =>
      val spec = expected(t)
      scala.util.Try(apply(s, dir, t).schema) match {
        case scala.util.Failure(e) => Seq(s"$t: unreadable (${e.getMessage})")
        case scala.util.Success(schema) =>
          val have = schema.fields.map(f => f.name -> family(f.dataType)).toMap
          spec.flatMap { case (c, fam) =>
            have.get(c) match {
              case None           => Some(s"$t.$c: expected $fam, column absent")
              case Some(`fam`)    => None
              case Some(actual)   => Some(s"$t.$c: expected $fam, found $actual")
            }
          }
      }
    }
}
