package graft
object DriveMain { def main(args: Array[String]): Unit = {
import graft.catalog._, graft.meta._, graft.types._, graft.table._
import org.apache.spark.sql.SparkSession
val spark = SparkSession.builder().master("local[4]").config("spark.sql.shuffle.partitions","4").config("spark.sql.session.timeZone","UTC").config("spark.ui.enabled","false").config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

// ---- 1. HadoopCatalog on a fresh warehouse, hour-partitioned table (the fixed NTZ bug path)
val wh = java.nio.file.Files.createTempDirectory("verify-wh").toString
val cat = new HadoopCatalog(wh)
val schema = Schema(0, Seq(NestedField(1,"event_id",ILong), NestedField(2,"ts",ITimestamp), NestedField(3,"event_type",IString), NestedField(4,"value",IDouble)))
val spec = PartitionSpec(0, Seq(PartitionField(2, 1000, "ts_hour", "hour")))
val t = cat.createTable("events", schema, partitionSpec = spec)
// events.ts has been INT64 TIMESTAMP(NANOS) in some testdata generations
// (readable only via nanosAsLong) and plain timestamp[us] in others —
// adapt by the schema actually read, like SparkEntry.t()
val rawEvents = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
val tsExpr =
  if (rawEvents.schema("ts").dataType == org.apache.spark.sql.types.LongType)
    "cast(timestamp_micros(cast(ts/1000 as long)) as timestamp_ntz) as ts"
  else "cast(ts as timestamp_ntz) as ts"
val src = rawEvents.selectExpr("event_id", tsExpr, "event_type", "value").limit(500)
t.append(src)
println("HOUR-PARTITIONED APPEND OK; files=" + t.scan().planFiles().size + " rows=" + t.toDF(spark).count())
println("partitions sample=" + t.scan().planFiles().take(3).map(_.file.partition).mkString(","))

// ---- 2. reload from disk (persistence), time travel
val t2 = cat.loadTable("events")
t2.append(src.limit(10))
println("RELOAD+SECOND APPEND OK; snapshots=" + t2.snapshots.size + " total=" + t2.toDF(spark).count())
val firstSnap = t2.snapshots.head.snapshotId
println("TIME TRAVEL rows=" + t2.toDF(spark, Some(firstSnap)).count())

// ---- 3. concurrent commit conflict: two handles to same table, both append
val a = cat.loadTable("events"); val b = cat.loadTable("events")
a.append(src.limit(5)); b.append(src.limit(5))
println("CONCURRENT APPENDS OK (retry path); snapshots=" + cat.loadTable("events").snapshots.size + " seq=" + cat.loadTable("events").lastSequenceNumber)

// ---- 4. probe: read-only StaticTable write rejection
val mp = wh + "/static-meta.json"
java.nio.file.Files.writeString(java.nio.file.Paths.get(mp), MetadataJson.write(t2.metadata))
val st = StaticTable.load(mp)
try { st.append(src.limit(1)); println("BUG: static append allowed") } catch { case e: GraftError => println("STATIC WRITE REJECTED: " + e.getMessage) }

// ---- 5. probe: hour pruning actually prunes + correct results
val allFiles = t2.scan().planFiles().size
val hrs = t2.toDF(spark).selectExpr("min(ts)","max(ts)").collect()(0)
val someTs = t2.toDF(spark).selectExpr("ts").limit(1).collect()(0).getAs[java.time.LocalDateTime](0)
val pruned = t2.scan(predicates = Seq(EqPred("ts", someTs))).planFiles().size
println(s"PRUNING: all=$allFiles pruned=$pruned (expect pruned<all)")
val got = t2.scan(predicates = Seq(EqPred("ts", someTs))).collect(spark).rows.size
val want = t2.toDF(spark).where(org.apache.spark.sql.functions.col("ts") === someTs).count()
println(s"PRUNED SCAN CORRECT: got=$got want=$want")

// ---- 6. probe: double-create, missing table, bad namespace errors
try { cat.createTable("events", schema) } catch { case e: TableAlreadyExistsError => println("DUP CREATE: " + e.getMessage) }
try { cat.loadTable("nope") } catch { case e: NoSuchTableError => println("MISSING LOAD: " + e.getMessage) }
try { cat.createTable("bad.ns.deep.t", schema) } catch { case e: NoSuchNamespaceError => println("BAD NS: " + e.getMessage) }
// ---- 7. SQL surface through catalog.sql
val mem = new MemoryCatalog()
mem.sql(spark, "CREATE TABLE ev (a int, b string)")
mem.sql(spark, "INSERT INTO ev VALUES (1, 'one'), (2, 'two'), (3, 'three')")
val res = mem.sql(spark, "SELECT * FROM ev WHERE a >= $1 ORDER BY a", Seq(2))
println("SQL SURFACE OK: cols=" + res.columns.mkString(",") + " rows=" + res.rows.map(_.mkString(":")).mkString("|"))

// ---- 8. LLM ops over real testdata through public API
val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
val nd = graft.ops.DedupOps.minhashLshPairs(docs.unionAll(docs.selectExpr("doc_id + 100000 as doc_id","text","lang","source","n_chars")), "doc_id", "text", threshold = 0.9)
println("MINHASH PAIRS (self-dup corpus): " + nd.count() + " pairs (expect >= " + docs.count() + ")")
val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
val topk = graft.ops.SimilarityOps.topKBruteForce(emb, "vec_id", "embedding", emb.limit(2).selectExpr("vec_id as qid","embedding as qvec"), "qid", "qvec", 3)
println("ANN TOPK: " + topk.count() + " rows (expect 6)")
println("ALL DRIVE STEPS DONE")
}}
